package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Reader/writer for the reference's `.fbin`/`.ibin` vector files
  * (io_utils.py:7-68): little-endian header [nvecs:int32, dim:int32]
  * followed by nvecs·dim row-major float32 (or int32) values.
  *
  * Read path is distributed: Spark's binaryFile source ships each file
  * to one task and `flatMap` parses it into (row_idx, vector) rows —
  * parallelism is per-file, matching how the reference shards large
  * corpora into chunked files (io_utils read_fbin start_idx/chunk_size).
  * Write is a single-stream driver write (the format has one global
  * header, so it is inherently single-writer); at cluster scale vectors
  * live in parquet and fbin is the exchange format with native tools.
  */
object Fbin {

  /** Read every `*.fbin`/`*.ibin` matched by `path` (glob ok). Returns
    * (file: String, idx: Long, vec: array<float|int>). */
  def readFloat(spark: SparkSession, path: String): DataFrame =
    read(spark, path, isFloat = true)

  def readInt(spark: SparkSession, path: String): DataFrame =
    read(spark, path, isFloat = false)

  private def read(spark: SparkSession, path: String, isFloat: Boolean): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    if (isFloat) {
      bin.as[(String, Array[Byte])].flatMap { case (p, bytes) =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val n = bb.getInt(); val d = bb.getInt()
        Iterator.tabulate(n) { i =>
          val v = new Array[Float](d)
          var j = 0
          while (j < d) { v(j) = bb.getFloat(8 + (i.toLong * d + j).toInt * 4); j += 1 }
          (p, i.toLong, v)
        }
      }.toDF("file", "idx", "vec")
    } else {
      bin.as[(String, Array[Byte])].flatMap { case (p, bytes) =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val n = bb.getInt(); val d = bb.getInt()
        Iterator.tabulate(n) { i =>
          val v = new Array[Int](d)
          var j = 0
          while (j < d) { v(j) = bb.getInt(8 + (i.toLong * d + j).toInt * 4); j += 1 }
          (p, i.toLong, v)
        }
      }.toDF("file", "idx", "vec")
    }
  }

  /** Write (idx-ordered) float vectors to one .fbin file. `df` must
    * have (idx: long, vec: array<float>); streamed, never collected. */
  def writeFloat(df: DataFrame, outPath: String): Unit =
    writeStream(df, outPath) { (out, row) =>
      val v = row.getSeq[Float](1)
      var j = 0
      while (j < v.length) {
        out.writeInt(Integer.reverseBytes(java.lang.Float.floatToIntBits(v(j))))
        j += 1
      }
    }

  /** Write (idx-ordered) int32 vectors to one .ibin file (io_utils.py:
    * 57-68 write_ibin) — the groundtruth-exchange format native tools
    * consume (README_RoarGraph.md:19 --gt_file). `df` must have
    * (idx: long, vec: array<int>). */
  def writeInt(df: DataFrame, outPath: String): Unit =
    writeStream(df, outPath) { (out, row) =>
      val v = row.getSeq[Int](1)
      var j = 0
      while (j < v.length) {
        out.writeInt(Integer.reverseBytes(v(j)))
        j += 1
      }
    }

  private def writeStream(df: DataFrame, outPath: String)(
      writeRow: (DataOutputStream, Row) => Unit): Unit = {
    val ordered = df.select(col("idx"), col("vec")).orderBy(col("idx"))
    val dim = ordered.select(size(col("vec"))).head().getInt(0)
    val n = ordered.count()
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(outPath), 1 << 20))
    try {
      out.writeInt(Integer.reverseBytes(n.toInt))
      out.writeInt(Integer.reverseBytes(dim))
      val it = ordered.toLocalIterator()
      while (it.hasNext) writeRow(out, it.next().asInstanceOf[Row])
    } finally out.close()
  }
}
