package graft.queries

import graft.functions.TextFns._
import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Family D widened (round 3): retrieval scoring, train/test
  * decontamination, and repetition quality signals — the text-pipeline
  * steps between raw dedup and training-data export.
  *
  * Determinism: every score is built from integer counts with a fixed
  * multiply/divide order (no transcendental functions — ln() is not
  * bit-portable across engines, so BM25 uses the raw odds ratio, a
  * monotone transform of the classic idf that preserves every
  * ranking). Ties break by doc_id everywhere.
  */
object TextQs2 {

  /** Fixed query terms for bm25_rank — drawn from the corpus
    * vocabulary; literal so both engines see identical inputs. */
  private val Bm25Terms = Seq("join", "vector", "hash", "stream", "window")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  private val Bm25TopK = 10

  /** BM25 top-10 documents per query term. idf is the raw Robertson
    * odds ratio (N − df + 0.5)/(df + 0.5) — the classic formula applies
    * ln(1 + ·), a monotone map, so ranks are identical and the score
    * stays engine-exact (no transcendentals; SURVEY §6).
    *
    * Scale shape: one token explode + (term, doc) tf aggregation
    * shuffled on the term — df and avg-length are tiny broadcast
    * aggregates; the per-(term, doc) score is a map; top-10 per term
    * is a bounded pool. At 100 TB this is the standard inverted-index
    * build read pattern. */
  val bm25Rank = Q(
    "bm25_rank",
    (s, dir) => {
      val docs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), words(lower(col("text"))).as("w"))
        .select(col("doc_id"), size(col("w")).as("dl"), explode(col("w")).as("tok"))
        .filter(col("tok").isin(Bm25Terms: _*))
      val stats = Tables.t(s, dir, "documents")
        .select(col("doc_id"), size(words(lower(col("text")))).as("dl"))
      val nAndAvg = stats.agg(
        count(lit(1)).as("n_docs"),
        (sum(col("dl")) * lit(1.0) / count(lit(1))).as("avgdl"))
      val tf = docs.groupBy(col("tok"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(df), Seq("tok")).crossJoin(broadcast(nAndAvg))
        .select(col("tok").as("term"), col("doc_id"),
          (((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            ((col("tf") * lit(Bm25K1 + 1.0)) /
              (col("tf") + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl")))))
            .as("score"))
      graft.operators.TopK.perGroup(scored, "term", "doc_id", "score", Bm25TopK, asc = false)
        .orderBy(col("term"), col("rnk"))
    },
    Some {
      val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""
      WITH d AS (SELECT doc_id, ${sqlWords("lower(text)")} AS w FROM documents),
      dl AS (SELECT doc_id, len(w) AS dl FROM d),
      ${/* CAST-to-DOUBLE at every leaf: DuckDB parses 1.0/0.5/0.75 as
            DECIMAL and would run parts of the score in decimal
            arithmetic — off by 1 ulp from Spark's all-double chain */ ""}
      st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      tok AS (SELECT doc_id, unnest(w) AS tok FROM d),
      tf AS (SELECT tok, t.doc_id, dl.dl, COUNT(*) AS tf
             FROM tok t JOIN dl ON dl.doc_id = t.doc_id
             WHERE tok IN ($terms)
             GROUP BY tok, t.doc_id, dl.dl),
      df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      sc AS (SELECT tf.tok AS term, tf.doc_id,
                    ((CAST(st.n_docs - df.df + 0.5 AS DOUBLE) / CAST(df.df + 0.5 AS DOUBLE)) *
                     ((CAST(tf.tf AS DOUBLE) * ${Bm25K1 + 1.0}) /
                      (CAST(tf.tf AS DOUBLE) + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B * CAST(tf.dl AS DOUBLE) / st.avgdl)))) AS score
             FROM tf JOIN df ON df.tok = tf.tok CROSS JOIN st),
      r AS (SELECT term, doc_id, score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS INT) AS rnk
            FROM sc)
      SELECT term, rnk, doc_id, score FROM r WHERE rnk <= $Bm25TopK
      ORDER BY term, rnk
      """
    })

  /** (doc_id, n_shared ≥ 1) for every TRAIN doc sharing at least one
    * distinct 5-word shingle with the benchmark set — the join core of
    * contamination_check, shared with curate_corpus. */
  private[queries] def contaminationHits(s: SparkSession, dir: String): DataFrame = {
    val ShingleN = 5
    // localCheckpoint: BOTH branches explode `sh`, and a generator's
    // input expression runs interpreted per OUTPUT row (lesson 2) —
    // without the boundary the whole words→shingles chain re-ran per
    // emitted shingle (measured 19.5s vs ~2s at sf0.1)
    val bc = org.apache.spark.sql.graftbridge.Bridge
    val docs = Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        bc.column(graft.functions.WordShinglesExpr(
          bc.expr(words(lower(col("text")))), ShingleN)).as("sh"))
      .localCheckpoint()
    val bench = docs.filter(col("doc_id") % 100 === 0)
      .select(explode(col("sh")).as("g")).distinct()
      .select(md5(col("g")).as("gh"))
    docs.filter(col("doc_id") % 100 =!= 0)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .select(col("doc_id"), md5(col("g")).as("gh"))
      .join(broadcast(bench), Seq("gh"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
  }

  /** Train/test decontamination (the GPT-3-style n-gram containment
    * check): docs with doc_id % 100 = 0 stand in for the benchmark
    * set; a training doc is contaminated when it shares at least one
    * distinct 5-word shingle with ANY benchmark doc. Emits the count
    * of distinct shared shingles per training doc (0 = clean).
    *
    * Scale shape: shingles explode to (md5(gram), doc) rows — the join
    * is an equi-join on the 16-byte gram hash against the (small)
    * benchmark shingle set, broadcast when it fits; training docs
    * stream through once. No N² anywhere. */
  val contaminationCheck = Q(
    "contamination_check",
    (s, dir) => {
      val hits = contaminationHits(s, dir)
      Tables.t(s, dir, "documents")
        .filter(col("doc_id") % 100 =!= 0)
        .select(col("doc_id"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH d AS (SELECT doc_id, ${sqlWordShingles(sqlWords("lower(text)"), 5)} AS sh FROM documents),
      bench AS (SELECT DISTINCT md5(unnest(sh)) AS gh FROM d WHERE doc_id % 100 = 0),
      tr AS (SELECT doc_id, md5(unnest(sh)) AS gh FROM d WHERE doc_id % 100 <> 0),
      hits AS (SELECT doc_id, COUNT(*) AS n_shared
               FROM tr JOIN bench USING (gh) GROUP BY doc_id)
      SELECT d.doc_id,
             COALESCE(hits.n_shared, 0) AS n_shared,
             COALESCE(hits.n_shared, 0) > 0 AS contaminated
      FROM d LEFT JOIN hits ON hits.doc_id = d.doc_id
      WHERE d.doc_id % 100 <> 0
      ORDER BY d.doc_id
    """))

  /** Repetition quality signals (the Gopher/C4 repetition filters):
    * per document, the share of word-bigram occurrences taken by the
    * most frequent bigram, and the type-token ratio. High rep_ratio /
    * low ttr flags boilerplate and degenerate generations. Integer
    * counts + one division each, ties on the max bigram are count-only
    * (no string tie-break needed for the ratio). Pure per-row map at
    * any scale. */
  val repetitionScore = Q(
    "repetition_score",
    (s, dir) => {
      // explode + two-level aggregation, not a per-row count-each-
      // distinct-bigram fold: the fold is O(|bg|²) interpreted per row,
      // and its oracle mirror needs a lambda nested in list_transform,
      // which DuckDB 1.0 miscompiles (lesson 9). The exploded form is
      // also the scale shape: bigram counts shuffle on (doc, bigram).
      val w = words(lower(col("text")))
      val wt = Tables.t(s, dir, "documents")
        .select(col("doc_id"), w.as("w")).cache()
      val tok = wt.select(
        col("doc_id"),
        size(col("w")).as("n_tokens"),
        size(array_distinct(col("w"))).as("n_types"),
        (size(array_distinct(col("w"))) * lit(1.0) / size(col("w"))).as("ttr"))
      val bg = wt
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), greatest(size(col("w")) - 1, lit(0))),
          i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1)))).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bigram_n"))
      tok.join(bg, Seq("doc_id"))
        .withColumn("rep_ratio", col("top_bigram_n") * lit(1.0) / col("n_bigrams"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"), col("ttr"),
          col("n_bigrams"), col("top_bigram_n"), col("rep_ratio"))
        .orderBy(col("doc_id"))
    },
    Some {
      val w = sqlWords("lower(text)")
      s"""
      WITH d AS (SELECT doc_id, $w AS w FROM documents),
      tok AS (SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_types,
                     len(list_distinct(w)) * 1.0 / len(w) AS ttr
              FROM d),
      bgx AS (SELECT doc_id,
                     unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                            i -> w[i] || ' ' || w[i + 1])) AS g
              FROM d),
      bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bgx GROUP BY doc_id, g),
      bg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, MAX(c) AS top_bigram_n
             FROM bc GROUP BY doc_id)
      SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, CAST(n_types AS INTEGER) AS n_types, ttr, n_bigrams, top_bigram_n,
             top_bigram_n * 1.0 / n_bigrams AS rep_ratio
      FROM tok JOIN bg USING (doc_id)
      ORDER BY doc_id
      """
    })

  val qs: Seq[Q] = Seq(bm25Rank, contaminationCheck, repetitionScore)
}
