package graft

import graft.operators.Ivf
import graft.sources.SynthData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exports the HOLD-AT-BASE branch of the entry-resolution rule for
  * the cross-engine replay tool (tools/check_entry_ladder.py — the
  * check_scale_branch.py convention, lesson 29): the driver's
  * clustered testdata only ever exercises the DEEPEN branch of
  * `SqlIvf.entryCtes`, so the branch where the ladder stays flat and
  * the resolver holds at `cellsFor` needs a corpus where it actually
  * fires. An isotropic corpus (single modality — every doubling buys
  * only the high-dimensional ~2^(-2/d) rate) is that corpus; this
  * spec writes it plus the Spark-side ladder/resolve to
  * /tmp/graft_entry_branch for the tool to replay in DuckDB. */
class EntryBranchSpec extends AnyFunSuite with SharedSpark {

  private val OutDir = "/tmp/graft_entry_branch"
  private val N = 8000L

  test("isotropic corpus holds at base and exports the replay bundle") {
    val corpus = SynthData.clustered(spark, N, 32, nModalities = 1, seed = 91L)
      .select(col("vec_id"), col("embedding"))
    corpus.coalesce(1).write.mode("overwrite")
      .parquet(s"$OutDir/embeddings.parquet")

    // the catalog's exact resolve path: base side, baseCount-derived
    val base = corpus.filter(col("vec_id") % 50 =!= 0)
    val n = base.count()
    val c0 = Ivf.cellsFor(n)
    val lad = Ivf.entryLadder(base, n)
    val resolved = if (lad.isEmpty) c0 else Ivf.entryCellsFor(lad, 32)
    assert(resolved == c0,
      s"isotropic corpus must hold at base $c0; got $resolved, ladder=$lad")
    assert(lad.nonEmpty && lad.head._1 == c0)

    // shortest-round-trip double strings survive the JSON hop exactly
    val rows = lad.map { case (c, d) => s"[$c, $d]" }.mkString("[", ", ", "]")
    val json = s"""{"ladder": $rows, "resolved": $resolved}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$OutDir/ladder.json"), json)
  }
}
