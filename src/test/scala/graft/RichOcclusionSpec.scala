package graft

import graft.operators.BruteForce
import graft.queries.HnswQs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dense-gated occlusion selection (round 11): when training lists
  * cover each base node ~4+ times, richGraphFrom switches its
  * per-source cap from weight-rank to the reference's M_pjbp RNG rule
  * (candidate c rejected when an already-kept k has d(c,k) <= d(c,src);
  * roargraph_python.py:177-294). Oracle here = a full plain-Scala
  * driver-side re-selection from the raw lists: same pool (min-w
  * dedupe, (w,dst)-ranked, top-RichOccPool), same scan order, same
  * float-widened folds — compared bit for bit. */
class RichOcclusionSpec extends AnyFunSuite with SharedSpark {

  private def corpus = {
    // queries = base (self-training, the densest shape): 600 nodes ×
    // k=16 lists / 600 base = 16 lists per node >> the gate's 4
    val emb = Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") % 50 =!= 0).limit(600)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val base = emb.select(col("vec_id").as("bid"), col("embedding").as("bv"))
    val queries = emb.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    (base, queries)
  }

  test("gate: dense corpora occlude, sparse corpora keep the weight-rank cap") {
    assert(HnswQs.richDense(600, 16, 600))
    assert(!HnswQs.richDense(640, 48, 31360)) // sf0.01 shape
    assert(!HnswQs.richDense(1000, 48, 1000000)) // m1
    assert(!HnswQs.richDense(10000, 96, 10000000)) // m3
    assert(HnswQs.richDense(500000, 48, 1000000)) // m6
  }

  test("dense selection == driver-side plain-Scala occlusion re-selection") {
    val (base, queries) = corpus
    val kk = 16
    val got = HnswQs.richGraphFrom(base, queries, "l2", kk)
      .orderBy(col("src"), col("erk")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

    // ---- independent reimplementation, all on the driver ----
    val vecs: Map[Long, Array[Float]] = base.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val lists: Map[Long, Seq[Long]] = BruteForce.topk(base, queries, "l2", kk)
      .select(col("qid"), col("rnk"), col("bid")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      math.sqrt(s)
    }
    // per-list member kNN (top-16 by (d, id)), both directions, min-w
    val pool = scala.collection.mutable.HashMap.empty[(Long, Long), Double]
    for ((_, mem) <- lists; i <- mem.indices) {
      val cands = mem.zipWithIndex.filter(_._2 != i)
        .map { case (b, _) => (l2(vecs(mem(i)), vecs(b)), b) }
        .sortBy(identity).take(16)
      for ((d, b) <- cands; key <- Seq((mem(i), b), (b, mem(i)))) {
        val old = pool.get(key)
        if (old.isEmpty || d < old.get) pool(key) = d
      }
    }
    val expected = pool.toSeq.map { case ((s2, d2), w) => (s2, d2, w) }
      .groupBy(_._1).toSeq.flatMap { case (src, cs) =>
        val ranked = cs.sortWith { (x, y) =>
          val c = java.lang.Double.compare(x._3, y._3)
          if (c != 0) c < 0 else x._2 < y._2
        }.take(HnswQs.RichOccPool)
        val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
        for ((_, dst, w) <- ranked if kept.length < 48) {
          val occ = kept.exists { case (k, _) => l2(vecs(dst), vecs(k)) <= w }
          if (!occ) kept += ((dst, w))
        }
        kept.zipWithIndex.map { case ((dst, w), i) => (src, i + 1, dst, w) }
      }.sortBy(t => (t._1, t._2))

    assert(got.length == expected.length,
      s"edge counts ${got.length} vs ${expected.length}")
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g vs $e") }
    assert(got.nonEmpty)
  }

  test("dense selection is partitioning-invariant and bounded by RichDeg") {
    val (base, queries) = corpus
    val a = HnswQs.richGraphFrom(base, queries, "l2", 16)
      .orderBy(col("src"), col("erk")).collect().map(_.toSeq)
    val b = HnswQs.richGraphFrom(base.repartition(7), queries.repartition(5), "l2", 16)
      .orderBy(col("src"), col("erk")).collect().map(_.toSeq)
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    val maxDeg = HnswQs.richGraphFrom(base, queries, "l2", 16)
      .groupBy(col("src")).count().agg(max(col("count"))).head().getLong(0)
    assert(maxDeg <= 48)
  }
}
