package graft.queries

import graft.functions.Vec
import graft.operators.{Lsh, TopK}
import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Family A continued: SimHash LSH over embeddings, the LC-CMD
  * calibrated distance (Idea-1023.md), and the RoarGraph projection
  * graph (roargraph_python.py:233-294). All ✓oracle. */
object VectorQs2 {

  // ---- SimHash buckets (simple_sim_hash.py:12-18) ----

  /** 16 sign bits against the deterministic plane bank → bucket int. */
  private def bucketCol(v: Column): Column =
    (0 until Lsh.NBits).map { j =>
      val p = typedlit(Lsh.planes(j))
      when(Vec.dotFast(v, p) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce((a: Column, b: Column) => a + b).cast("int")

  private def sqlDotPlane(v: String, j: Int): String =
    s"list_reduce(list_transform(range(1, ${Lsh.Dim} + 1), i -> $v[i] * (${Lsh.sqlPlane(j)})[i]), (x, y) -> x + y)"

  private def sqlBucket(v: String): String =
    (0 until Lsh.NBits)
      .map(j => s"CASE WHEN ${sqlDotPlane(v, j)} > 0 THEN ${1 << j} ELSE 0 END")
      .mkString("(", " + ", ")")

  val simhashBuckets = Q(
    "simhash_buckets",
    (s, dir) => {
      Tables.t(s, dir, "embeddings")
        .select(col("vec_id"), bucketCol(col("embedding")).as("bucket"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      SELECT vec_id, ${sqlBucket("v")} AS bucket
      FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      ORDER BY vec_id
    """))

  /** Radius-1 multiprobe ANN: query probes its bucket plus all 16
    * single-bit flips (simple_sim_hash.py:26-32), candidates rerank by
    * exact cosine, top-10. Scale shape: equi-join on bucket keys —
    * |Q|·17 probe rows against the bucketed base, never N². */
  val simhashAnn = Q(
    "simhash_ann",
    (s, dir) => {
      val emb = Tables.t(s, dir, "embeddings")
      // per-bucket ceiling (reference caps buckets at 20k,
      // simple_sim_hash.py:23): deterministic first-by-id keep so one
      // hot bucket can't blow up the candidate join at scale
      val base = emb.filter(col("vec_id") % 50 =!= 0)
        .select(col("vec_id").as("bid"), col("embedding").as("bv"),
          bucketCol(col("embedding")).as("bucket"))
        .withColumn("brn", row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("bid"))))
        .filter(col("brn") <= 20000)
        .drop("brn")
      val probes = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          bucketCol(col("embedding")).as("qb"))
        .select(col("qid"), col("qv"), explode(array(
          (col("qb") +: (0 until Lsh.NBits).map(i =>
            col("qb").bitwiseXOR(lit(1 << i)))): _*)).as("bucket"))
      val cand = base.join(broadcast(probes), Seq("bucket"))
      val scoredC = cand.select(col("qid"), col("bid"),
        Vec.cosineFast(col("qv"), col("bv")).as("score"))
      TopK.perGroup(scoredC, "qid", "bid", "score", 10, asc = false)
        .orderBy(col("qid"), col("rnk"))
    },
    Some(s"""
      WITH base0 AS (
        SELECT vec_id AS bid, v AS bv, ${sqlBucket("v")} AS bucket
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 50 <> 0)),
      base AS (
        SELECT bid, bv, bucket FROM (
          SELECT bid, bv, bucket,
                 ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY bid) AS brn
          FROM base0) WHERE brn <= 20000),
      qq AS (
        SELECT vec_id AS qid, v AS qv, ${sqlBucket("v")} AS qb
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 50 = 0)),
      probes AS (
        SELECT qid, qv, unnest([qb] || list_transform(range(0, ${Lsh.NBits}), i -> xor(qb, 1 << i))) AS bucket
        FROM qq),
      cand AS (
        SELECT p.qid, b.bid, ${Vec.sqlCosine("p.qv", "b.bv")} AS score
        FROM base b JOIN probes p ON b.bucket = p.bucket),
      r AS (SELECT qid, bid, score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, bid) AS INT) AS rnk
            FROM cand)
      SELECT qid, rnk, bid, score FROM r WHERE rnk <= 10
      ORDER BY qid, rnk
    """))

  // ---- LC-CMD calibrated top-k (Idea-1023.md §Rerank) ----

  /** Per-label variance arrays (quantized-exact, see modality_stats) —
    * one-pass typed moments, variances assembled by array transform
    * (no explode, no re-collection). */
  private def varArrays(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "embeddings")
      .groupBy(col("label"))
      .agg(graft.operators.Moments.moments(64)(col("embedding")).as("m"))
      .select(col("label"),
        zip_with(col("m.sums"), col("m.sumsqs"), (sq, sqq) =>
          (sqq.cast("double")
            - sq.cast("double") * sq.cast("double") / col("m.n"))
            / col("m.n") / lit(1.0e12)).as("varr"))

  private val sqlVarArrays = s"""
    vx AS (
      SELECT label, u.i AS dim, floor(u.x * 1000000.0 + 0.5) AS xq
      FROM (SELECT label,
                   unnest(list_transform(range(1, len(v)+1), i -> {'i': i - 1, 'x': v[i]})) AS u
            FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings))),
    vm AS (
      SELECT label, dim,
             (CAST(SUM(CAST(xq * xq AS DECIMAL(38,0))) AS DOUBLE)
              - CAST(SUM(CAST(xq AS DECIMAL(38,0))) AS DOUBLE)
                * CAST(SUM(CAST(xq AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)) / COUNT(*) / 1.0e12 AS variance
      FROM vx GROUP BY label, dim),
    varr AS (SELECT label, list(variance ORDER BY dim) AS varr FROM vm GROUP BY label)"""

  /** Locally-calibrated cross-modal distance top-5: per-dimension
    * squared diff scaled by the fused per-label variances
    * (α=0.5, ε=1e-6): D² = Σ (q_k−x_k)²/(0.5σ²_q,k+0.5σ²_x,k+ε). */
  val calibratedTopk = Q(
    "calibrated_topk",
    (s, dir) => {
      val varr = varArrays(s, dir).cache()
      // fused denominators precomputed once per (query-label,
      // base-label) pair — |labels|² tiny rows — so the per-pair hot
      // loop (VecScaledL2) does zero allocation and no variance math
      val lp = varr.select(col("label").as("ql"), col("varr").as("qvar"))
        .crossJoin(varr.select(col("label").as("bl"), col("varr").as("bvar")))
        .select(col("ql"), col("bl"),
          zip_with(col("qvar"), col("bvar"),
            (a, bb) => lit(0.5) * a + lit(0.5) * bb + lit(1.0e-6)).as("den"))
      val emb = Tables.t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("label").as("ql"))
      val b = emb.filter(col("vec_id") % 50 =!= 0)
        .select(col("vec_id").as("bid"), col("embedding").as("bv"), col("label").as("bl"))
      val scoredP = b.crossJoin(broadcast(q))
        .join(broadcast(lp), Seq("ql", "bl"))
        .select(col("qid"), col("bid"),
          Vec.scaledL2Fast(col("qv"), col("bv"), col("den")).as("dist2"))
      TopK.perGroup(scoredP, "qid", "bid", "dist2", 5, asc = true)
        .orderBy(col("qid"), col("rnk"))
    },
    Some(s"""
      WITH $sqlVarArrays,
      q AS (SELECT e.vec_id AS qid, e.embedding::DOUBLE[] AS qv, w.varr AS qvar
            FROM embeddings e JOIN varr w ON e.label = w.label
            WHERE e.vec_id % 50 = 0),
      b AS (SELECT e.vec_id AS bid, e.embedding::DOUBLE[] AS bv, w.varr AS bvar
            FROM embeddings e JOIN varr w ON e.label = w.label
            WHERE e.vec_id % 50 <> 0),
      sc AS (
        SELECT qid, bid,
               list_reduce(list_transform(range(1, ${Lsh.Dim} + 1),
                 i -> ((qv[i] - bv[i]) * (qv[i] - bv[i])) / (0.5 * qvar[i] + 0.5 * bvar[i] + 1.0e-6)),
                 (x, y) -> x + y) AS dist2
        FROM b CROSS JOIN q),
      r AS (SELECT qid, bid, dist2,
                   CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2 ASC, bid) AS INT) AS rnk
            FROM sc)
      SELECT qid, rnk, bid, dist2 FROM r WHERE rnk <= 5
      ORDER BY qid, rnk
    """))

  // ---- RoarGraph projection graph (roargraph_python.py:233-294) ----

  /** Bipartite query→base top-10 lists projected to base↔base edges:
    * each query's nearest base (pivot) connects to the query's other
    * neighbors (weight = neighbor rank), reverse edges added
    * (_add_reverse_edges), degree capped at 8 per source (M_pjbp). */
  val roarProjectionGraph = Q(
    "roar_projection_graph",
    (s, dir) => {
      // localCheckpoint: pivot and rest self-join this table, and
      // DeduplicateRelations cannot re-instance the custom
      // VectorTopKJoin node appearing on both sides
      val top10 = VectorQs.gtTopk(s, dir, "cosine").localCheckpoint()
      val pivot = top10.filter(col("rnk") === 1).select(col("qid"), col("bid").as("pivot"))
      val rest = top10.filter(col("rnk") >= 2).select(col("qid"), col("bid"), col("rnk"))
      val joined = rest.join(pivot, Seq("qid"))
      val fwd = joined.select(col("pivot").as("src"), col("bid").as("dst"), col("rnk").as("w"))
      val rev = joined.select(col("bid").as("src"), col("pivot").as("dst"), col("rnk").as("w"))
      fwd.union(rev)
        .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("src")).orderBy(col("w"), col("dst"))))
        .filter(col("r") <= 8)
        .select(col("src"), col("dst"), col("w"))
        .orderBy(col("src"), col("w"), col("dst"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id % 50 = 0),
      b AS (SELECT vec_id AS bid, embedding::DOUBLE[] AS bv FROM embeddings WHERE vec_id % 50 <> 0),
      sc AS (SELECT qid, bid, ${Vec.sqlCosine("qv", "bv")} AS score FROM b CROSS JOIN q),
      rr AS (SELECT qid, bid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, bid) AS rnk FROM sc),
      top10 AS (SELECT qid, bid, rnk FROM rr WHERE rnk <= 10),
      pvt AS (SELECT qid, bid AS pv FROM top10 WHERE rnk = 1),
      rest AS (SELECT qid, bid, rnk FROM top10 WHERE rnk >= 2),
      ed AS (
        SELECT p.pv AS src, r.bid AS dst, r.rnk AS w FROM rest r JOIN pvt p ON r.qid = p.qid
        UNION ALL
        SELECT r.bid AS src, p.pv AS dst, r.rnk AS w FROM rest r JOIN pvt p ON r.qid = p.qid),
      eg AS (SELECT src, dst, MIN(w) AS w FROM ed GROUP BY src, dst),
      cp AS (SELECT src, dst, w,
                    ROW_NUMBER() OVER (PARTITION BY src ORDER BY w, dst) AS r
             FROM eg)
      SELECT src, dst, w FROM cp WHERE r <= 8
      ORDER BY src, w, dst
    """))

  val qs: Seq[Q] = Seq(simhashBuckets, simhashAnn, calibratedTopk, roarProjectionGraph)
}
