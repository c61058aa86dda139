package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Reader/writer for the RoarGraph binary index format the reference
  * loads layer-0 graphs from (hnsw_with_bridges_optimized.py:379-430
  * load_layer0_from_roargraph): little-endian
  *
  *   [metadata: u32][num_nodes: u32]
  *   then per node, in id order 0..num_nodes-1:
  *   [degree: u32][neighbor_id: u32 × degree]
  *
  * Node ids are implicit file positions, so the caller's graph must be
  * on a dense 0..n-1 id space (the reference's own convention — its
  * vectors array is position-indexed). A node absent from the edge
  * table is a 0-degree entry, which the reference accepts.
  *
  * Read is per-file parallel (binaryFile → one parse task per file):
  * degree-prefixed lists make the format unsplittable, and sharding
  * by file is how the reference distributes large indexes. Write is a
  * single-stream driver write like Fbin (one global header), streamed
  * via toLocalIterator — never collected.
  */
object RoarIndex {

  /** Read every index file matched by `path` (glob ok). Returns
    * (file: string, src: long, rnk: int, dst: long) — rnk is the
    * 0-based position in the node's stored adjacency list. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        bb.getInt() // metadata (the reference skips it too)
        val n = bb.getInt()
        Iterator.range(0, n).flatMap { src =>
          val deg = bb.getInt()
          Iterator.tabulate(deg) { r => (p, src.toLong, r, bb.getInt().toLong) }
        }
      }
      .toDF("file", "src", "rnk", "dst")
  }

  /** Write an adjacency table to one index file. `edges` must have
    * (src: long, rnk: int, dst: long) with src in [0, numNodes);
    * neighbors are stored in ascending rnk order. `metadata` fills the
    * header word the reference skips (we record the edge count). */
  def write(edges: DataFrame, numNodes: Int, outPath: String): Unit = {
    val ordered = edges.select(col("src"), col("rnk"), col("dst"))
      .orderBy(col("src"), col("rnk"))
    val nEdges = ordered.count()
    // the metadata word is 32-bit in the format; refuse to write a
    // silently-wrapped count rather than record a wrong edge total
    require(nEdges <= 0xffffffffL,
      s"RoarIndex metadata word is uint32; got $nEdges edges")
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(outPath), 1 << 20))
    try {
      out.writeInt(Integer.reverseBytes(nEdges.toInt))
      out.writeInt(Integer.reverseBytes(numNodes))
      val it = ordered.toLocalIterator()
      var cur = 0L
      var pending = scala.collection.mutable.ArrayBuffer.empty[Long]
      def flushThrough(upto: Long): Unit = {
        // emit `cur`'s list, then 0-degree entries for any id gap
        while (cur < upto) {
          out.writeInt(Integer.reverseBytes(pending.length))
          pending.foreach(d => out.writeInt(Integer.reverseBytes(d.toInt)))
          pending.clear()
          cur += 1
        }
      }
      while (it.hasNext) {
        val row = it.next()
        val (src, dst) = (row.getLong(0), row.getLong(2))
        require(src >= cur && src < numNodes,
          s"src $src out of [0, $numNodes) or out of order")
        flushThrough(src)
        pending += dst
      }
      flushThrough(numNodes.toLong)
    } finally out.close()
  }
}
