package graft

import graft.functions.Vec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cell-kNN substrate is a per-cell mapPartitions kernel (the SMJ +
  * TopKAgg formulation it replaced streamed ~|cell|²·cells pair rows
  * into a per-node aggregation — the sort-based fallback filled the
  * disk at 10M). Contract: bit-identical to the join + TopK.perGroup
  * form — same pools, same (dist, id) tie-break, same float-widened
  * left-fold distances — at any partition count. */
class CellKnnSpec extends AnyFunSuite {

  private lazy val spark = SharedSpark.session
  private val dir = "/root/testdata/sf0.01"

  test("kernel == join + perGroup form, bit-for-bit") {
    val (_, assigned) = queries.HnswQs.sweepIvf(spark, dir)
    val k = 8
    val a = assigned.select(col("cid"), col("vec_id").as("src"), col("embedding").as("sv"))
    val b = assigned.select(col("cid"), col("vec_id").as("dst"), col("embedding").as("dv"))
    val scored = a.join(b, Seq("cid"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), Vec.l2Fast(col("sv"), col("dv")).as("dist"))
    val ref = graft.operators.TopK.perGroup(scored, "src", "dst", "dist", k, asc = true)
      .select(col("src"), col("rnk").cast("int").as("rnk"), col("dst"), col("dist"))
      .orderBy(col("src"), col("rnk"))
      .collect().map(_.toSeq)
    val got = queries.HnswQs3.cellKnnKernel(assigned, k)
      .orderBy(col("src"), col("rnk"))
      .collect().map(_.toSeq)
    assert(got.length == ref.length)
    got.zip(ref).foreach { case (g, r) => assert(g == r) }
  }

  test("block-pair split == single pass on a skewed corpus (one giant cell)") {
    // one cell holds 80% of the corpus — the 100×-scale straggler
    // shape (VERDICT r10 item 2). splitPop=200 forces the giant cell
    // through the block-pair path (ceil(2000/200) = 10 blocks, ≤ 200²
    // evals per task); the small cells stay single-pass. Output must
    // be bit-identical to the unsplit kernel.
    val emb = Tables.t(spark, dir, "embeddings")
      .filter(col("vec_id") % 50 =!= 0).limit(2500)
      .select(col("vec_id"), col("embedding"))
    val skewed = emb.select(
      when(col("vec_id") % 5 =!= 0, lit(0L))
        .otherwise(col("vec_id") % 7 + 1).cast("long").as("cid"),
      col("vec_id"), col("embedding"))
    val unsplit = queries.HnswQs3.cellKnnKernel(skewed, 8, splitPop = Int.MaxValue)
      .orderBy(col("src"), col("rnk")).collect().map(_.toSeq)
    val split = queries.HnswQs3.cellKnnKernel(skewed, 8, splitPop = 200)
      .orderBy(col("src"), col("rnk")).collect().map(_.toSeq)
    assert(split.length == unsplit.length && split.nonEmpty)
    split.zip(unsplit).foreach { case (x, y) => assert(x == y) }
    // and the split path is partition-invariant too
    val split2 = queries.HnswQs3.cellKnnKernel(skewed.repartition(11), 8, splitPop = 200)
      .orderBy(col("src"), col("rnk")).collect().map(_.toSeq)
    assert(split2.length == split.length)
    split2.zip(split).foreach { case (x, y) => assert(x == y) }
  }

  test("kernel output is partition-count invariant") {
    val (_, assigned) = queries.HnswQs.sweepIvf(spark, dir)
    val one = queries.HnswQs3.cellKnnKernel(assigned.repartition(1), 8)
      .orderBy(col("src"), col("rnk")).collect().map(_.toSeq)
    val many = queries.HnswQs3.cellKnnKernel(assigned.repartition(7), 8)
      .orderBy(col("src"), col("rnk")).collect().map(_.toSeq)
    assert(one.length == many.length)
    one.zip(many).foreach { case (x, y) => assert(x == y) }
  }
}
