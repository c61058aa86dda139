package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationQsSpec extends AnyFunSuite with SharedSpark {

  test("sample_per_cluster: full cells yield dense prototype pools of true members") {
    val res = queries.CurationQs.samplePerCluster.fn(spark, sf).localCheckpoint()
    // every cell emits a pool (corpus >> cells), ranks dense from 1
    val perCell = res.groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), min(col("rnk")).as("lo"), max(col("rnk")).as("hi"))
    assert(perCell.count() === 16)
    assert(perCell.filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("n") > 4).count() === 0)
    // sampled ids really belong to the cell they were sampled from
    val e = Tables.t(spark, sf, "embeddings")
    val cents = operators.Ivf.centroids(e, 16, 3)
    val truth = operators.Ivf.assign(e, cents).select(col("vec_id"), col("cid"))
    assert(res.join(truth, Seq("vec_id", "cid"), "left_anti").count() === 0,
      "a sampled vector is not a member of its claimed cell")
  }

  test("pack_contexts: offsets chain within shards and window ids are consistent") {
    val res = queries.CurationQs.packContexts.fn(spark, sf).localCheckpoint()
    assert(res.count() === Tables.t(spark, sf, "documents").count())
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    val chained = res.withColumn("prev_end",
      lag(col("start_tok") + col("n_tok"), 1, 0L).over(w))
    assert(chained.filter(col("start_tok") =!= col("prev_end")).count() === 0,
      "a doc's start offset is not the previous doc's end — the concat chain is broken")
    assert(res.filter(col("ctx_id") =!= expr("start_tok DIV 256")).count() === 0)
    assert(res.filter(col("crosses") =!=
      (expr("(start_tok + n_tok - 1) DIV 256") > col("ctx_id"))).count() === 0)
  }

  test("source_mixture: shares sum to 1 and weights invert the shares") {
    val res = queries.CurationQs.sourceMixture.fn(spark, sf).localCheckpoint()
    val nSrc = res.count()
    assert(nSrc > 1, "single-source corpus makes the mixture vacuous")
    val shareSum = res.agg(sum(col("token_share"))).head().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-12)
    // weight * share * n_src == 1 exactly up to float round-trip
    val bad = res.filter(
      abs(col("weight") * col("token_share") * lit(nSrc.toDouble) - 1.0) > lit(1e-12))
    assert(bad.count() === 0, "a weight does not invert its token share")
  }
}
