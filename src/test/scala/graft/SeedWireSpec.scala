package graft

import graft.operators.{Ivf, ProjIndex, SeedSelect}
import graft.sources.SynthData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exports the APPROXIMATE branch (tl < cc) of the round-13 two-level
  * seed wiring for cross-engine replay (tools/check_seed_branch.py —
  * the check_scale_branch.py convention, lesson 29): at every driver
  * test SF the anchor bank is ≤ 256 nodes, so cc = 16 = tl and the
  * wired catalog sits on the two-level pick's BITWISE-exact endpoint
  * (SeedSelectSpec pins that equality) — the coarse-probe pruning in
  * `SqlIvf.seedCtes` would ship unexercised cross-engine without a
  * corpus whose bank is big enough that tl < cc actually prunes.
  *
  * The planted corpus: many tight clusters at small n, so the entry
  * ladder resolves deep (the same trained-quantizer term that lets
  * sf0.001 resolve 256 cells of n = 490 — lesson 44) and the resolved
  * anchor bank exceeds 256 nodes → cc ≥ 32 > tl = 16. The spec runs
  * the UNMODIFIED catalog query, asserts the branch genuinely fires
  * (tl < cc AND the probe pruned candidates), and writes (corpus,
  * result) for the tool to replay the static oracle SQL in DuckDB. */
class SeedWireSpec extends AnyFunSuite {

  private lazy val spark = SharedSpark.session
  private val OutDir = "/tmp/graft_seed_branch"
  private val N = 2560L

  test("planted deep-bank corpus fires tl < cc and exports the replay bundle") {
    // artifacts for this dir are corpus-content-keyed only by tag —
    // clear the store so a prior round's build can never alias this one
    val store = new java.io.File(ProjIndex.tablePath(OutDir, "x")).getParentFile
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (store.exists()) rm(store)

    val corpus = SynthData.clustered(spark, N, 32, nModalities = 640, seed = 17L)
      .select(col("vec_id"), col("embedding"))
    corpus.coalesce(1).write.mode("overwrite")
      .parquet(s"$OutDir/embeddings.parquet")

    // the wired seeding's own knobs, resolved exactly as the catalog
    // resolves them — the branch-fires proof
    val base = Tables.t(spark, OutDir, "embeddings")
      .filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id").as("bid"), col("embedding").as("bv"))
    val aq = queries.HnswQs3.resolvedEntryCells(spark, OutDir)
    val c0 = Ivf.cellsFor(base.count())
    assert(aq > 256, s"corpus must resolve a deep entry bank (got aq=$aq, base=$c0)")
    val bankN = queries.HnswQs3.routedAnchors(spark, OutDir).count()
    val cc = SeedSelect.coarseCellsFor(bankN)
    val tl = SeedSelect.tlFor(cc)
    assert(bankN > 256 && tl < cc,
      s"approximate branch must fire: bank=$bankN cc=$cc tl=$tl")

    // the probe must genuinely prune (strictly fewer candidate evals
    // than the exact full-bank scan) — tl < cc alone could still cover
    // the whole bank if the unprobed cells were empty
    val queriesDf = Tables.t(spark, OutDir, "embeddings")
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val nQ = queriesDf.count()
    val (coarse, aCells, _, tlW) = queries.HnswQs3.seedLevels(spark, OutDir, base)
    assert(tlW == tl)
    val candN = SeedSelect.twoLevelScored(queriesDf, coarse, aCells, tl).count()
    assert(candN < nQ * bankN,
      s"probe did not prune: cand=$candN = nq=$nQ x bank=$bankN")

    // the catalog query end-to-end on the planted dir
    val res = Catalog.queriesMap("graph_routed_search")(spark, OutDir)
      .localCheckpoint()
    assert(res.count() > 0)
    res.coalesce(1).write.mode("overwrite").parquet(s"$OutDir/result.parquet")

    val meta = s"""{"aq": $aq, "bank": $bankN, "cc": $cc, "tl": $tl}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$OutDir/meta.json"), meta)
  }
}
