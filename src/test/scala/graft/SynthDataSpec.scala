package graft

import graft.functions.Vec
import graft.sources.SynthData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The synthetic generator must be deterministic (pure function of
  * seed+id, partitioning-independent) and actually clustered: vectors
  * sharing a modality center cohere, different modalities do not
  * (data_loader.py:68-97 semantics). */
class SynthDataSpec extends AnyFunSuite with SharedSpark {

  test("deterministic across runs and partitionings; unit norms") {
    val a = SynthData.clustered(spark, 300, 16, 4, seed = 7L)
      .orderBy(col("vec_id")).collect()
    val b = SynthData.clustered(spark, 300, 16, 4, seed = 7L)
      .repartition(13).orderBy(col("vec_id")).collect()
    assert(a.sameElements(b))
    val norms = SynthData.clustered(spark, 300, 16, 4, seed = 7L)
      .select(sqrt(Vec.norm2(col("embedding"))).as("n"))
      .agg(min(col("n")), max(col("n"))).head()
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-5)
    assert(math.abs(norms.getDouble(1) - 1.0) < 1e-5)
  }

  test("hostile generator: deterministic, unit-norm, mixed sizes, heteroscedastic, correlated") {
    val a = SynthData.clusteredHostile(spark, 600, 16, 8, seed = 7L)
      .orderBy(col("vec_id")).collect()
    val b = SynthData.clusteredHostile(spark, 600, 16, 8, seed = 7L)
      .repartition(13).orderBy(col("vec_id")).collect()
    assert(a.sameElements(b))
    val df = SynthData.clusteredHostile(spark, 2000, 16, 8, seed = 7L).cache()
    val norms = df.select(sqrt(Vec.norm2(col("embedding"))).as("n"))
      .agg(min(col("n")), max(col("n"))).head()
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-5)
    assert(math.abs(norms.getDouble(1) - 1.0) < 1e-5)
    // mixed sizes: the u² assignment makes cluster 0 hold several times
    // the uniform share and the top id a fraction of it
    val sizes = df.groupBy(col("modality")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes(0) > 2 * 2000 / 8, s"head cluster not dominant: $sizes")
    assert(sizes.getOrElse(7, 0L) < sizes(0) / 3, s"tail cluster not small: $sizes")
    // heteroscedastic + correlated: per-cluster mean pairwise cosine
    // SPREADS (tight vs diffuse clusters) — under the clean generator
    // every cluster reads the same within-cosine by construction
    val x = df.select(col("vec_id").as("a"), col("modality").as("ma"), col("embedding").as("va"))
    val y = df.select(col("vec_id").as("b"), col("modality").as("mb"), col("embedding").as("vb"))
    val within = x.join(y, col("a") < col("b") && col("ma") === col("mb"))
      .groupBy(col("ma")).agg(avg(Vec.cosineFast(col("va"), col("vb"))).as("m"))
      .collect().map(_.getDouble(1))
    info(s"per-cluster within-cosine: ${within.sorted.mkString(", ")}")
    assert(within.max - within.min > 0.15,
      s"clusters not heteroscedastic: spread=${within.max - within.min}")
  }

  test("per-modality cluster structure: within-cosine >> across-cosine") {
    val df = SynthData.clustered(spark, 400, 16, 4, seed = 11L).cache()
    val x = df.select(col("vec_id").as("a"), col("modality").as("ma"), col("embedding").as("va"))
    val y = df.select(col("vec_id").as("b"), col("modality").as("mb"), col("embedding").as("vb"))
    val pairs = x.join(y, col("a") < col("b"))
      .select((col("ma") === col("mb")).as("same"),
        Vec.cosineFast(col("va"), col("vb")).as("cos"))
    val stats = pairs.groupBy(col("same")).agg(avg(col("cos")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    info(s"within=${stats(true)} across=${stats(false)}")
    assert(stats(true) > 0.8, s"within-modality cosine too low: ${stats(true)}")
    assert(stats(true) > stats(false) + 0.3)
    // every modality is populated
    assert(df.select(col("modality")).distinct().count() == 4)
  }
}
