package graft

import graft.operators.Multimodal
import graft.sources.Fbin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SourcesSpec extends AnyFunSuite with SharedSpark {

  test("fbin roundtrip preserves vectors, header, and order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fbin").toFile
    val path = s"${dir.getAbsolutePath}/test.fbin"
    val vecs = (0L until 37L).map(i =>
      (i, Array.tabulate(8)(j => (i * 31 + j).toFloat / 7f)))
    Fbin.writeFloat(vecs.toDF("idx", "vec"), path)

    // header check against the reference layout (io_utils.py:43-54)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt() == 37 && bb.getInt() == 8)
    assert(bytes.length == 8 + 37 * 8 * 4)

    val back = Fbin.readFloat(spark, path)
      .select(col("idx"), col("vec")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    assert(back.length == 37)
    assert(back.zip(vecs).forall { case ((i1, v1), (i2, v2)) =>
      i1 == i2 && v1.sameElements(v2) })
  }

  test("ibin roundtrip preserves int vectors, header, and order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ibin").toFile
    val path = s"${dir.getAbsolutePath}/gt.ibin"
    // groundtruth-shaped payload: per query the top-5 neighbor ids
    val vecs = (0L until 23L).map(i =>
      (i, Array.tabulate(5)(j => (i * 17 + j * 3).toInt)))
    Fbin.writeInt(vecs.toDF("idx", "vec"), path)

    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt() == 23 && bb.getInt() == 5)
    assert(bytes.length == 8 + 23 * 5 * 4)

    val back = Fbin.readInt(spark, path)
      .select(col("idx"), col("vec")).as[(Long, Array[Int])]
      .collect().sortBy(_._1)
    assert(back.length == 23)
    assert(back.zip(vecs).forall { case ((i1, v1), (i2, v2)) =>
      i1 == i2 && v1.sameElements(v2) })
  }

  test("multimodal features are deterministic with stable schema") {
    val docs = Tables.t(spark, sf, "documents").limit(100)
    val a = Multimodal.extractFeatures(Multimodal.manifest(docs))
      .orderBy(col("doc_id")).collect()
    val b = Multimodal.extractFeatures(Multimodal.manifest(docs))
      .orderBy(col("doc_id")).collect()
    assert(a.sameElements(b))
    assert(a.length == 100)
    val r = a.head
    assert(r.schema.fieldNames.toSeq ==
      Seq("doc_id", "codec", "width", "height", "payload_len", "mean_byte", "phash"))
    assert(r.getAs[Int]("payload_len") == 16) // md5-derived stub payload
    assert(Set("jpeg", "png", "wav").contains(r.getAs[String]("codec")))
  }

  test("roargraph index file roundtrip, including 0-degree gap nodes") {
    import spark.implicits._
    // node 2 has no edges; neighbor order matters (rnk)
    val edges = Seq(
      (0L, 0, 3L), (0L, 1, 1L),
      (1L, 0, 0L),
      (3L, 0, 0L), (3L, 1, 1L), (3L, 2, 2L))
      .toDF("src", "rnk", "dst")
    val path = java.nio.file.Files.createTempDirectory("roaridx").toString + "/g.index"
    sources.RoarIndex.write(edges, numNodes = 4, path)
    // header: metadata = edge count, then per-node degree-prefixed lists
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt() == 6 && bb.getInt() == 4)
    val got = sources.RoarIndex.read(spark, path)
      .select(col("src"), col("rnk"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = edges.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
    assert(!got.exists(_._1 == 2L)) // the gap node reads back edgeless
  }

  test("the rich projection graph survives a RoarIndex export/import roundtrip") {
    import org.apache.spark.sql.expressions.Window
    val rich = queries.HnswQs.richGraph(spark, sf).filter(col("erk") <= 8)
      .select(col("src"), (col("erk") - 1).as("rnk"), col("dst")).localCheckpoint()
    // the format's node space is dense 0..n-1 (reference convention);
    // densify over every id the graph touches — tiny at spec scale, so
    // a global Window is fine here
    val ids = rich.select(col("src").as("id"))
      .union(rich.select(col("dst").as("id"))).distinct()
    val idMap = ids.withColumn("nid",
      (row_number().over(Window.orderBy(col("id"))) - 1).cast("long")).localCheckpoint()
    val n = idMap.count().toInt
    val dense = rich
      .join(idMap.select(col("id").as("src"), col("nid").as("s")), Seq("src"))
      .join(idMap.select(col("id").as("dst"), col("nid").as("d")), Seq("dst"))
      .select(col("s").as("src"), col("rnk").cast("int").as("rnk"), col("d").as("dst"))
    val path = java.nio.file.Files.createTempDirectory("roarexp").toString + "/rich.index"
    sources.RoarIndex.write(dense, n, path)
    val back = sources.RoarIndex.read(spark, path)
      .select(col("src"), col("rnk"), col("dst"))
    assert(back.count() === dense.count())
    assert(back.join(dense, Seq("src", "rnk", "dst"), "left_anti").count() === 0,
      "an imported edge does not exist in the exported graph")
  }
}
