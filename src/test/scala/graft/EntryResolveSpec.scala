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
}
