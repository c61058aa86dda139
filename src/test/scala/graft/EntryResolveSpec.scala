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
    val resolved = Ivf.entryCellsFor(lad, 32)
    assert(lad.head._1 == c0)
    assert(resolved > c0,
      s"512-cluster corpus should deepen past cellsFor=$c0; ladder=$lad")
    assert(resolved >= 256,
      s"resolution should approach the cluster count; got $resolved, ladder=$lad")
  }

  test("isotropic corpus does not deepen") {
    val lad = Ivf.entryLadder(emb(1, seed = 78L), n)
    assert(Ivf.entryCellsFor(lad, 32) == Ivf.cellsFor(n),
      s"single-cluster corpus must stay at cellsFor; ladder=$lad")
  }

  test("low-dimensional isotropic corpus does not deepen (dimension-aware threshold)") {
    // at d = 8 the isotropic per-doubling rate is 2^(-2/8) ≈ 0.84 —
    // BELOW the flat 0.85 bar, so the r11 rule read an unstructured
    // 8d corpus as structured at every doubling and resolved to the
    // cap (VERDICT r11 "what's wrong" 2); the dimension-aware
    // threshold (2^(-2/d) − margin = 0.8108 at d = 8) must hold at
    // base. Measured on this corpus (full-cap ladder, n = 8000):
    // ratios 0.832, 0.819, 0.793, 0.768, 0.710 — the first steps sit
    // at the SPHERE rate 2^(-2/(d−1)) ≈ 0.820 (unit-normalized
    // vectors have intrinsic dim d−1; invisible at 64d, a 0.02 shift
    // at 8d), and the later steps accelerate below any fixed margin
    // because cells/n reaches 0.13 and a trained quantizer starts
    // memorizing points (the same finite-sample term that makes the
    // clustered sf0.001 corpus resolve 256 cells of n = 490 — a
    // correction that held THIS corpus at full depth would un-resolve
    // that pinned behavior, measured r12). So the ladder here stops
    // at maxMult = 4 (cells/n ≤ 0.016, the asymptotic regime the
    // rule targets — at catalog scale cap/n = 8/√n puts every corpus
    // ≥ 260k entirely inside it); the r11 flat bar deepens on the
    // same prefix, which is asserted too so a regression to the
    // constant fails loudly. */
    val e8 = SynthData.clustered(spark, n, 8, nModalities = 1, seed = 79L)
      .select(col("vec_id"), col("embedding"))
    val lad = Ivf.entryLadder(e8, n, maxMult = 4)
    assert(Ivf.entryStructureRatioFor(8) < 0.82,
      s"d=8 threshold must sit below the isotropic rate; got ${Ivf.entryStructureRatioFor(8)}")
    assert(Ivf.entryCellsFor(lad, 8) == Ivf.cellsFor(n),
      s"8d isotropic corpus must hold at cellsFor; ladder=$lad")
    // the flat 0.85 bar would have deepened on the identical ladder
    val flatDeepens = lad.zip(lad.tail).exists {
      case ((_, p), (_, c)) => c < p * Ivf.EntryStructureRatio
    }
    assert(flatDeepens,
      s"ladder no longer discriminates the rules — rebuild the fixture; ladder=$lad")
  }

  // ---- data-sized ladder cap (round 15 — m15 measured EntryMaxMult
  // binding a still-structural resolution at 4M; the n/64 extension
  // must bind ONLY past ~262k rows so every test-SF ladder, artifact
  // name and driver hash stays bit-identical) ----

  test("entryCapCells: legacy cap at every sub-262k corpus, extension at scale") {
    // spec/test corpora: extension term far below the mult cap
    assert(Ivf.entryCapCells(8000L) == 1024L)          // c0=32 → 32·32; n/64=125
    assert(Ivf.entryCapCells(490L) == 489L)            // n−1 binds (sf0.001)
    assert(Ivf.entryCapCells(50000L) == 2048L)         // c0=64 → 64·32; n/64=781
    // boundary: at n = 2048·c0 the terms coincide — still the legacy name
    assert(Ivf.entryCapCells(262144L) == 4096L)
    // m15's regime: the extension reaches the measured-structural 32,768
    assert(Ivf.entryCapCells(4000000L) == 62500L)
    assert(Iterator.iterate(Ivf.cellsFor(4000000L))(_ * 2)
      .takeWhile(_.toLong <= Ivf.entryCapCells(4000000L)).toSeq.lastOption
      .contains(32768), "4M ladder must include the 32,768 step")
    // 10M: MaxCells clamps (n/64 = 156,250)
    assert(Ivf.entryCapCells(10000000L) == Ivf.MaxCells.toLong)
    // the probe's maxMult knob still extends past the data-sized cap
    assert(Ivf.entryCapCells(4000000L, 256) == Ivf.MaxCells.toLong)
  }

  test("persisted-ladder artifact name changes only when the extension binds") {
    assert(queries.HnswQs3.entryLadderName(8000L) == "entry_ladder")
    assert(queries.HnswQs3.entryLadderName(490L) == "entry_ladder")
    assert(queries.HnswQs3.entryLadderName(262144L) == "entry_ladder")
    assert(queries.HnswQs3.entryLadderName(4000000L) == "entry_ladder_c62500")
    assert(queries.HnswQs3.entryLadderName(10000000L) == "entry_ladder_c65536")
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
