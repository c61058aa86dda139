package graft

import graft.operators.{BeamSearch, BruteForce}
import graft.sources.{Fbin, RoarIndex, SynthData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The real-data interop loop (VERDICT r6 item 6 / r7 item 5): a 200d
  * corpus — the reference's t2i benchmark shape (README_RoarGraph.md:
  * 9-15: 200d vectors, groundtruth computed at --K 100) — travels the
  * full exchange surface:
  *
  *   SynthData 200d → .fbin (io_utils.py write_fbin layout)
  *   → Fbin.read → the standard embeddings table → richGraph (IP after
  *   normalization, the reference's headline metric, k=100 lists)
  *   → RoarIndex.write → byte-level header/degree checks
  *   → RoarIndex.read → beam search over the IMPORTED edges
  *   → recall@100 vs exact IP groundtruth.
  *
  * The exported pair (base.fbin, rich.index) is exactly what a
  * reference loader consumes (hnsw_with_bridges_optimized.py:379-430
  * reads the index positionally against the base vector file), so the
  * spec proves a reference user could take this engine's index and
  * search it — and that the engine can search an index it re-imported. */
class InteropSpec extends AnyFunSuite with SharedSpark {

  test("fbin -> rich graph -> RoarIndex loop at the reference's 200d / K=100 conventions") {
    val dim = 200
    val n = 2500L
    val K = 100
    val tmp = java.nio.file.Files.createTempDirectory("graft_interop").toString
    // 1. 200d clustered unit vectors (the reference generators' shape)
    val synth = SynthData.clustered(spark, n, dim, 8, seed = 1234L).localCheckpoint()
    Fbin.writeFloat(synth.select(col("vec_id").as("idx"), col("embedding").as("vec")),
      s"$tmp/corpus.fbin")
    // 2. ingest through the reference's exchange format, losslessly
    val ing = Fbin.readFloat(spark, s"$tmp/corpus.fbin")
      .select(col("idx").as("vec_id"), col("vec").as("embedding"))
    assert(ing.count() == n)
    assert(ing.join(synth.select(col("vec_id"), col("embedding").as("e2")), Seq("vec_id"))
      .filter(col("embedding") =!= col("e2")).count() == 0,
      "fbin roundtrip altered vectors")
    ing.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    // 3. rich graph at the reference's conventions: IP over unit
    // vectors, k=100 training lists so every K=100 groundtruth target
    // is a graph member
    val rich = queries.HnswQs.richGraph(spark, tmp, "ip", k = K).localCheckpoint()

    // 4. densify to the position-indexed node space of the exported
    // base vector file and write the (base.fbin, rich.index) pair
    val base = Tables.t(spark, tmp, "embeddings").filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val idMap = base.select(col("vec_id"))
      .withColumn("nid", (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("long"))
      .localCheckpoint()
    val nb = idMap.count().toInt
    Fbin.writeFloat(base.join(idMap, Seq("vec_id"))
      .select(col("nid").as("idx"), col("embedding").as("vec")), s"$tmp/base.fbin")
    val dense = rich
      .join(idMap.select(col("vec_id").as("src"), col("nid").as("s")), Seq("src"))
      .join(idMap.select(col("vec_id").as("dst"), col("nid").as("d")), Seq("dst"))
      .select(col("s").as("src"), (col("erk") - 1).cast("int").as("rnk"), col("d").as("dst"))
      .localCheckpoint()
    RoarIndex.write(dense, nb, s"$tmp/rich.index")

    // 5. header + degree conventions the reference loader relies on
    val bb = java.nio.ByteBuffer
      .wrap(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/rich.index")))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val meta = bb.getInt()
    val nn = bb.getInt()
    val nEdges = dense.count()
    assert(meta == nEdges, "metadata word must record the edge count")
    assert(nn == nb, "num_nodes word must equal the base count")
    val back = RoarIndex.read(spark, s"$tmp/rich.index").localCheckpoint()
    assert(back.count() == nEdges)
    val maxDeg = back.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .agg(max(col("deg"))).head().getLong(0)
    assert(maxDeg <= queries.HnswQs.RichDeg, s"stored degree $maxDeg over the cap")
    assert(back.filter(col("dst") < 0 || col("dst") >= nb).count() == 0,
      "neighbor id outside the position-indexed node space")

    // 6. search the IMPORTED index at the reference's evaluation K:
    // base.fbin + rich.index alone reconstruct the search surface
    val baseDense = Fbin.readFloat(spark, s"$tmp/base.fbin")
      .select(col("idx").as("bid"), col("vec").as("bv")).localCheckpoint()
    val qs = Tables.t(spark, tmp, "embeddings").filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv")).localCheckpoint()
    val gt = BruteForce.topk(baseDense, qs, "ip", K)
      .select(col("qid"), col("bid")).localCheckpoint()
    val edges = back.select(col("src"), col("dst")).localCheckpoint()
    val entry = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("src")).head().getLong(0)
    // entry seeding, the 1M scale-run lesson: a single hub strands the
    // beam in the hub's cluster — seed each query with its 3 nearest
    // GRAPH MEMBERS from a deterministic member sample (a non-member
    // would score but never expand), plus the hub
    val memberSample = baseDense
      .join(edges.select(col("src")).distinct(), col("bid") === col("src"), "left_semi")
      .filter(col("bid") % 37 === 0)
    val near = graft.operators.TopK.perGroup(
      qs.crossJoin(broadcast(memberSample))
        .select(col("qid"), col("bid"),
          graft.functions.Vec.metricDist("ip")(col("qv"), col("bv")).as("d")),
      "qid", "bid", "d", 3, asc = true)
      .select(col("qid"), col("bid"))
    val seeds = qs.select(col("qid")).withColumn("bid", lit(entry))
      .union(near).distinct()
    val res = BeamSearch.runFromSeeds(edges, qs, baseDense, seeds,
      ef = 128, rounds = 8, metric = "ip")
      .filter(col("rnk") <= K)
    val recall = res.select(col("qid"), col("bid")).join(gt, Seq("qid", "bid")).count()
      .toDouble / gt.count()
    info(f"interop recall@$K = $recall%.3f over the re-imported index")
    assert(recall >= 0.9, f"recall@100 $recall%.3f below 0.9 on the imported index")
  }
}
