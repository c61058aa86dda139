package graft.queries

import graft.functions.Vec
import graft.operators.{Ivf, TopK}
import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Family D continued: corpus-curation operators downstream of
  * filtering/dedup — cluster-prototype sampling (the "pick
  * representative examples per region of embedding space" step) and
  * context-window packing (the concat-and-chunk step that turns a
  * document stream into fixed-size training sequences).
  *
  * Scale design: sampling shuffles once on cell id with a bounded
  * top-k pool per cell; packing is a per-shard running sum where the
  * SHARD COUNT is the parallelism knob — real packing pipelines shard
  * exactly this way because token offsets are sequential within a
  * shard by construction. Nothing here is all-pairs or driver-side.
  */
object CurationQs {

  private[graft] val SampleIters = 3
  private val SamplePerCell = 4

  /** The all-corpus quantizer dedup_semantic and sample_per_cluster
    * share — persisted build-once/load-many like every other index
    * (the clustering is these operators' INPUT, not their work; the
    * oracles re-derive it via SqlIvf, staleness-guarding the
    * artifact). DATA-SIZED cells (Ivf.cellsFor): SemDeDup's pairwise
    * cost is Σ n_cell², so k must ride N exactly as the paper sizes
    * it (50k clusters at LAION scale) — 16 at test SF, 256 at 1M. */
  private[graft] def allIvf(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val emb = Tables.t(s, dir, "embeddings")
    val k = Ivf.cellsFor(emb.count())
    graft.operators.ProjIndex.ensureIvf(s, dir, "all", k, SampleIters) {
      val (c, a, _) = Ivf.sizedBuild(emb, SampleIters)
      (c, a)
    }
  }

  /** Cluster-prototype sample: the SamplePerCell vectors nearest their
    * own k-means centroid, per cell — a diversity-preserving subset
    * (one small pool per region of the space, not the global densest
    * blob). Same deterministic Lloyd build as dedup_semantic/ivf_build;
    * ranking ties break by vec_id (determinism rule). */
  val samplePerCluster = Q(
    "sample_per_cluster",
    (s, dir) => {
      val (cents, assigned) = allIvf(s, dir)
      // cid back to BIGINT: partition-column inference narrows it on load
      val scored = assigned
        .join(broadcast(cents), Seq("cid"))
        .select(col("cid").cast("long").as("cid"), col("vec_id"),
          Vec.l2Fast(col("embedding"), col("cv")).as("dist"))
      TopK.perGroup(scored, "cid", "vec_id", "dist", SamplePerCell, asc = true)
        .select(col("cid"), col("rnk"), col("vec_id"), col("dist"))
        .orderBy(col("cid"), col("rnk"))
    },
    Some(s"""
      WITH ${SqlIvf.sizedCtes("true", SampleIters, "sp")},
      sc AS (SELECT a.cid, a.vec_id,
                    sqrt(${Vec.sqlL2sq("e.v", "c.cv")}) AS dist
             FROM spassign a
             JOIN spe e ON e.vec_id = a.vec_id
             JOIN spcents c ON c.cid = a.cid)
      SELECT cid, rnk, vec_id, dist FROM (
        SELECT cid, vec_id, dist,
               CAST(ROW_NUMBER() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS INT) AS rnk
        FROM sc) WHERE rnk <= $SamplePerCell
      ORDER BY cid, rnk
    """))

  private val CtxTokens = 256L
  private val PackShards = 8L

  /** Context-window packing (concat-and-chunk): documents concatenate
    * in doc_id order within a shard and split into CtxTokens-sized
    * windows; each doc reports the window its first token lands in and
    * whether it straddles a boundary. Token counts use token_count's
    * BPE-ish regex. All-integer math — hash-exact across engines. */
  val packContexts = Q(
    "pack_contexts",
    (s, dir) => {
      val n = size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")
      val shard = pmod(col("doc_id"), lit(PackShards))
      val before = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.t(s, dir, "documents")
        .select(shard.as("shard"), col("doc_id"), n.as("n_tok"))
        .withColumn("start_tok", coalesce(sum(col("n_tok")).over(before), lit(0L)))
        .select(col("shard"), col("doc_id"), col("n_tok"), col("start_tok"),
          expr(s"start_tok DIV $CtxTokens").as("ctx_id"),
          (expr(s"(start_tok + n_tok - 1) DIV $CtxTokens") >
            expr(s"start_tok DIV $CtxTokens")).as("crosses"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id % $PackShards AS shard, doc_id,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        -- DuckDB 1.0.0 windowed SUM(BIGINT) returns HUGEINT (int128);
        -- uncast it would hash-mismatch Spark's int64 (r6's one red).
        SELECT shard, doc_id, n_tok,
               CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        FROM t)
      SELECT shard, doc_id, n_tok, start_tok,
             CAST(start_tok // $CtxTokens AS BIGINT) AS ctx_id,
             ((start_tok + n_tok - 1) // $CtxTokens) > (start_tok // $CtxTokens) AS crosses
      FROM c
      ORDER BY doc_id
    """))

  /** Domain-mixture reweighting: per `source`, doc/token counts, the
    * corpus token share, and the sampling weight that would flatten
    * the mixture to uniform-over-sources (weight = target share /
    * actual share). The static single-pass form of domain
    * reweighting — one groupBy, two scalar divisions per source, so
    * the 100 TB cost is the token-count scan. */
  val sourceMixture = Q(
    "source_mixture",
    (s, dir) => {
      val n = size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")
      val per = Tables.t(s, dir, "documents")
        .select(col("source"), n.as("n"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
        .localCheckpoint() // total + share both read it (lesson 8)
      val tot = per.agg(sum(col("n_tokens")).cast("long"), count(lit(1)).cast("long")).head()
      val (total, nSrc) = (tot.getLong(0), tot.getLong(1))
      per.select(col("source"), col("n_docs"), col("n_tokens"),
          (col("n_tokens").cast("double") / lit(total).cast("double")).as("token_share"),
          (lit(total).cast("double") / (lit(nSrc) * col("n_tokens")).cast("double")).as("weight"))
        .orderBy(col("source"))
    },
    Some("""
      WITH per AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n_src FROM per)
      SELECT source, n_docs, n_tokens,
             CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) AS token_share,
             CAST(total AS DOUBLE) / CAST(n_src * n_tokens AS DOUBLE) AS weight
      FROM per CROSS JOIN tot
      ORDER BY source
    """))

  /** Cluster-quality monitor over the persisted quantizer: per-cell
    * population, inertia (Σ d² to own centroid) and mean/max d² — the
    * numbers that tell an operator when k has fallen behind corpus
    * growth (cells bloat, inertia climbs) or a cell went degenerate.
    * Inertia sums quantize per-row d² to integers first (determinism
    * rule: float sums are merge-order-dependent; integer sums are
    * exact under any partitioning). */
  val clusterQuality = Q(
    "cluster_quality",
    (s, dir) => {
      val (cents, assigned) = allIvf(s, dir)
      val d2q = assigned.join(broadcast(cents), Seq("cid"))
        .select(col("cid").cast("long").as("cid"),
          floor(Vec.l2sqFast(col("embedding"), col("cv")) * lit(1000000.0) + lit(0.5))
            .cast("long").as("d2q"))
      d2q.groupBy(col("cid"))
        .agg(count(lit(1)).as("n_vecs"),
          (sum(col("d2q")).cast("double") / lit(1000000.0)).as("inertia"),
          ((sum(col("d2q")).cast("double") / count(lit(1))) / lit(1000000.0)).as("mean_d2"),
          (max(col("d2q")).cast("double") / lit(1000000.0)).as("max_d2"))
        .orderBy(col("cid"))
    },
    Some(s"""
      WITH ${SqlIvf.sizedCtes("true", SampleIters, "cq")},
      d AS (SELECT a.cid,
                   CAST(floor(${Vec.sqlL2sq("e.v", "c.cv")} * 1000000.0 + 0.5) AS BIGINT) AS d2q
            FROM cqassign a
            JOIN cqe e ON e.vec_id = a.vec_id
            JOIN cqcents c ON c.cid = a.cid)
      SELECT cid, COUNT(*) AS n_vecs,
             CAST(SUM(d2q) AS DOUBLE) / 1000000.0 AS inertia,
             (CAST(SUM(d2q) AS DOUBLE) / COUNT(*)) / 1000000.0 AS mean_d2,
             CAST(MAX(d2q) AS DOUBLE) / 1000000.0 AS max_d2
      FROM d
      GROUP BY cid
      ORDER BY cid
    """))

  /** text_quality score floor for curate_corpus' quality gate —
    * formula range is [0, 1], 0.55 splits the synthetic corpus
    * meaningfully (~44% below at sf0.01). */
  private val QualityMin = 0.55

  /** The composed end-to-end curation verdict — the C4/Gopher-shaped
    * pipeline a training-data team actually runs, assembled from this
    * repo's proven stage operators. Per document, the FIRST failing
    * stage in pipeline order:
    *   benchmark_doc — doc_id % 100 = 0 rows are the held-out
    *     benchmark set (contamination_check's convention), never
    *     training data;
    *   lang — stopword-profile prediction (lang_id's dominance fold)
    *     is not the target language ('en');
    *   quality — text_quality's score below QualityMin;
    *   exact_dup — not the min-doc_id canonical of its
    *     normalized-md5 group (dedup_exact's keep rule);
    *   near_dup — a non-survivor member of a MinHash duplicate group
    *     (dedup_minhash_groups / dedup_apply's removal set);
    *   contaminated — shares a distinct 5-word shingle with the
    *     benchmark set (contamination_check);
    *   kept — survives every gate (the cleaned corpus).
    * One row per document: (doc_id, keep, reason).
    *
    * Scale shape: language ratios, the quality score and the exact-dup
    * digest ride ONE cached corpus pass (langScored's extra columns);
    * the exact-dup canonical is a groupBy on 16-byte digests; the
    * near-dup removal set reuses the persisted minhashPairs artifact +
    * the bounded label propagation; contamination is the gram-hash
    * equi-join. Final assembly joins the corpus against the two flag
    * sets (typically tiny — AQE broadcasts them when they fit, with no
    * forced hint so a pathological all-dup corpus degrades to a
    * shuffle join, never an OOM) and its own digest groups — the
    * corpus streams through a constant number of passes, nothing
    * all-pairs. The oracle re-derives every stage from scratch. */
  val curateCorpus = Q(
    "curate_corpus",
    (s, dir) => {
      val base = TextQs.langScored(s, dir, Seq(
        TextQs.qualityScore(col("text")).as("q"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("nm")))
      val canon = base.groupBy(col("nm")).agg(min(col("doc_id")).as("keep_id"))
      // round 15 (guide §2.6): the near-dup verdict chain (minhash
      // pairs → iterative label propagation, with its own internal
      // actions) and the contamination chain (shingle overlap scan)
      // are independent of each other and of the base/canon scoring —
      // forked and materialized concurrently; the verdict join and
      // every flag value are unchanged.
      val (nearRemoved, contam) = graft.operators.Par.withPool { pp =>
        val nearF = pp.fork {
          DedupQs.dedupMinhashGroups.fn(s, dir)
            .filter(col("member") =!= col("survivor_id"))
            .select(col("member").as("doc_id"), lit(true).as("near_dup"))
            .localCheckpoint()
        }
        val contamF = pp.fork {
          TextQs2.contaminationHits(s, dir)
            .select(col("doc_id"), lit(true).as("contam"))
            .localCheckpoint()
        }
        (nearF(), contamF())
      }
      val reason = when(col("doc_id") % 100 === 0, "benchmark_doc")
        .when(TextQs.langPredCol =!= "en", "lang")
        .when(col("q") < lit(QualityMin), "quality")
        .when(col("doc_id") =!= col("keep_id"), "exact_dup")
        .when(coalesce(col("near_dup"), lit(false)), "near_dup")
        .when(coalesce(col("contam"), lit(false)), "contaminated")
        .otherwise("kept")
      // no broadcast hints on the flag sets: they are usually small,
      // but a pathological corpus can make either arbitrarily large
      // (every doc a non-survivor dup / every doc contaminated) — AQE
      // broadcasts them when they fit, exactly like dedup_apply's
      // removal anti-join
      base
        .join(canon, Seq("nm"))
        .join(nearRemoved, Seq("doc_id"), "left")
        .join(contam, Seq("doc_id"), "left")
        .select(col("doc_id"), reason.as("reason"))
        .select(col("doc_id"), (col("reason") === "kept").as("keep"), col("reason"))
        .orderBy(col("doc_id"))
    },
    Some {
      import graft.functions.TextFns._
      val w = sqlWords("text")
      val punct = "(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) * 1.0 / length(text)"
      val stop = sqlRatioIn(w, stopwords("en"))
      s"""
      WITH RECURSIVE ${DedupQs.sqlGroupCtes},
      qv AS (SELECT doc_id,
                    ${TextQs.sqlLangCase} AS pred,
                    least(1.0, len($w) * 1.0 / 64.0) * 0.3 + (1.0 - $punct) * 0.3 + $stop * 0.4 AS q,
                    md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nm
             FROM documents),
      canon AS (SELECT nm, MIN(doc_id) AS keep_id FROM qv GROUP BY nm),
      nearrem AS (SELECT node AS doc_id FROM comp WHERE node <> survivor_id),
      cd AS (SELECT doc_id, ${sqlWordShingles(sqlWords("lower(text)"), 5)} AS sh5 FROM documents),
      bench5 AS (SELECT DISTINCT md5(unnest(sh5)) AS gh FROM cd WHERE doc_id % 100 = 0),
      tr5 AS (SELECT doc_id, md5(unnest(sh5)) AS gh FROM cd WHERE doc_id % 100 <> 0),
      contam AS (SELECT DISTINCT tr5.doc_id FROM tr5 JOIN bench5 USING (gh)),
      verdict AS (
        SELECT qv.doc_id,
               CASE WHEN qv.doc_id % 100 = 0 THEN 'benchmark_doc'
                    WHEN qv.pred <> 'en' THEN 'lang'
                    WHEN qv.q < CAST($QualityMin AS DOUBLE) THEN 'quality'
                    WHEN qv.doc_id <> c.keep_id THEN 'exact_dup'
                    WHEN qv.doc_id IN (SELECT doc_id FROM nearrem) THEN 'near_dup'
                    WHEN qv.doc_id IN (SELECT doc_id FROM contam) THEN 'contaminated'
                    ELSE 'kept' END AS reason
        FROM qv JOIN canon c USING (nm))
      SELECT doc_id, reason = 'kept' AS keep, reason FROM verdict ORDER BY doc_id
      """
    })

  val qs: Seq[Q] = Seq(samplePerCluster, packContexts, sourceMixture, clusterQuality,
    curateCorpus)
}
