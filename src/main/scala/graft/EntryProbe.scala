package graft

import graft.operators.Ivf
import org.apache.spark.sql.functions._

/** Entry-quantizer resolution probe (round 11, lesson 42) — prints
  * `Ivf.entryLadder`'s quantization-error ladder for a corpus dir and
  * the depth `Ivf.entryCellsFor` resolves from it. The pre-flight to
  * run before building routed-search entries at a new scale, the way
  * ProfBuckets gates banded joins (measured calibration: m7's
  * 4,096-cluster corpus reads ratios 0.90/0.83/0.65/0.41 — the
  * structural drop is back-loaded; m6's isotropic control stays at the
  * high-dimensional ~0.9+ rate and never deepens).
  *
  * Usage: runMain graft.EntryProbe <dir> [maxMult]
  */
object EntryProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EntryProbe <dir> [maxMult]")
    val dir = args(0)
    val maxMult = if (args.length > 1) args(1).toInt else Ivf.EntryMaxMult
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.session("graft-entry-probe", cpus)
    val n = Tables.baseCount(spark, dir)
    val emb = Tables.t(spark, dir, "embeddings")
      .filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id"), col("embedding"))
    // incremental extension (round 14 — lesson 43's measure-past-the-
    // cap runs as ONE marginal k-means, not a full re-measurement):
    // when the dir already carries the persisted entry_ladder artifact
    // (the catalog's resolvedEntryCells built it), start from its rows
    // and compute only the deeper steps. The eval sample derives from
    // c0 alone, so the merged ladder is bit-identical to a full run.
    val ladPath = new org.apache.hadoop.fs.Path(
      graft.operators.ProjIndex.tablePath(dir,
        queries.HnswQs3.entryLadderName(n)), "_SUCCESS")
    val fs = ladPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a persisted ladder may be DEEPER than this probe's maxMult
    // (ADVICE r14): truncate the loaded rows to the same bound
    // entryLadder itself enforces, so `EntryProbe <dir> <smallMult>`
    // actually probes at smallMult instead of silently reporting the
    // deeper persisted depths
    val capCells = Ivf.entryCapCells(n, maxMult)
    val have: Seq[(Int, Double)] =
      (if (fs.exists(ladPath)) queries.HnswQs3.entryLadderTable(spark, dir)
       else Seq.empty).filter(_._1 <= capCells)
    if (have.nonEmpty)
      println(s"ENTRY_PROBE loaded ${have.length} persisted rows (to ${have.last._1})")
    val rows = have ++ Ivf.entryLadder(emb, n, maxMult,
      startAfterCells = have.lastOption.map(_._1).getOrElse(0))
    rows.foldLeft(Option.empty[Double]) { (prev, cd) =>
      val (cells, meanD2) = cd
      val ratio = prev.map(p => meanD2 / p)
      println(f"ENTRY_PROBE cells=$cells%d mean_d2=$meanD2%.6f" +
        ratio.fold("")(r => f" ratio_vs_prev=$r%.4f"))
      Some(meanD2)
    }
    println(s"ENTRY_PROBE resolved=${Ivf.entryCellsFor(rows, Ivf.dimOf(emb))} base=${Ivf.cellsFor(n)}")
    spark.stop()
  }
}
