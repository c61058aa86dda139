package graft

import graft.operators.Ivf
import graft.sources.SynthData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Entry-quantizer auto-resolution (round 11, lesson 42): the
  * error-ladder rule must deepen on a corpus whose cluster count
  * exceeds `Ivf.cellsFor(n)` (m7's regime — the catalog quantizer
  * left the routed beam component-starved there) and must NOT deepen
  * on unstructured data (m6's isotropic control, where every doubling
  * buys only the high-dimensional ~0.9+ rate), and the decision must
  * be partitioning-invariant (quantized-integer inertia sums +
  * deterministic k-means). */
class EntryResolveSpec extends AnyFunSuite with SharedSpark {

  private val n = 8000L

  private def emb(nModalities: Int, seed: Long) =
    SynthData.clustered(spark, n, 32, nModalities, seed)
      .select(col("vec_id"), col("embedding"))

  test("clustered corpus past cellsFor resolution deepens the entry quantizer") {
    val c0 = Ivf.cellsFor(n)
    val lad = Ivf.entryLadder(emb(512, seed = 77L), n)
    val resolved = Ivf.entryCellsFor(lad)
    assert(lad.head._1 == c0)
    assert(resolved > c0,
      s"512-cluster corpus should deepen past cellsFor=$c0; ladder=$lad")
    assert(resolved >= 256,
      s"resolution should approach the cluster count; got $resolved, ladder=$lad")
  }

  test("isotropic corpus does not deepen") {
    val lad = Ivf.entryLadder(emb(1, seed = 78L), n)
    assert(Ivf.entryCellsFor(lad) == Ivf.cellsFor(n),
      s"single-cluster corpus must stay at cellsFor; ladder=$lad")
  }

  test("resolution is partitioning-invariant") {
    val e = emb(512, seed = 77L)
    val a = Ivf.entryLadder(e.repartition(3), n)
    val b = Ivf.entryLadder(e.repartition(11), n)
    assert(a == b, s"ladders differ across partitionings:\n$a\n$b")
  }

  // ---- catalog wiring (round 11): the routed search's anchors come
  // from the resolver, not raw cellsFor ----

  test("catalog resolver deepens on the clustered testdata corpus") {
    // the driver's synthetic embeddings are clustered: the measured
    // ladder at sf0.001 reads ratios 0.93/0.89/0.79/0.58 → resolves
    // 256 of base 16 (EntryProbe). Pins both the persisted-ladder
    // round-trip and the resolve; the DuckDB oracle re-derives the
    // same ladder inside graph_routed_search's SQL (SqlIvf.entryCtes),
    // so a drift here would also fail the correctness gate.
    val c0 = Ivf.cellsFor(Tables.baseCount(spark, sf))
    val aq = queries.HnswQs3.resolvedEntryCells(spark, sf)
    assert(c0 == 16, s"sf0.001 base depth moved: $c0")
    assert(aq == 256, s"sf0.001 should resolve 256 (measured); got $aq")
  }

  test("routed anchors use the resolved entry quantizer") {
    val anchors = queries.HnswQs3.routedAnchors(spark, sf)
    val nAnchors = anchors.count()
    val c0 = Ivf.cellsFor(Tables.baseCount(spark, sf))
    // one candidate anchor per ENTRY cell (distinct members): far more
    // than cellsFor could yield, bounded by the resolved depth
    assert(nAnchors > c0,
      s"anchors should outnumber the base depth $c0; got $nAnchors")
    assert(nAnchors <= 256, s"anchors bounded by resolved cells; got $nAnchors")
    // every anchor is a base-side member
    val base = Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") % 50 =!= 0).select(col("vec_id").as("bid"))
    assert(anchors.join(base, Seq("bid"), "left_anti").count() == 0L)
  }
}
