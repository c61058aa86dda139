package graft.queries

import graft.functions.TextFns._
import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Family D (SURVEY §2D): text analysis over `documents`.
  *
  * All pure per-row map operators — at 100 TB these are embarrassingly
  * parallel scans with full column pruning; no shuffles except the
  * final presentation sort (which real pipelines would skip).
  */
object TextQs {

  /** Composite quality score of a text column — the exact expression
    * text_quality reports, shared so the streaming filter
    * (streaming.Docs) applies identical batch semantics. */
  def qualityScore(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val w = words(text)
    val n = size(w)
    val punct = (length(text) -
      length(regexp_replace(text, "[^a-z0-9 ]", ""))) * lit(1.0) / length(text)
    val stop = ratioIn(w, stopwords("en"))
    least(lit(1.0), n * lit(1.0) / lit(64.0)) * lit(0.3) +
      (lit(1.0) - punct) * lit(0.3) + stop * lit(0.4)
  }

  /** sample_stratified's deterministic keep-coin (md5 prefix vs
    * integer threshold), shared with the streaming filter. */
  def sampleKeep(id: org.apache.spark.sql.Column, lang: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long") <
      when(lang === "en", lit(1L << 59)).otherwise(lit(1L << 58))

  /** Whitespace + BPE-ish regex token counts. */
  val tokenCount = Q(
    "token_count",
    (s, dir) => {
      Tables.t(s, dir, "documents")
        .select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          size(words(col("text"))).as("n_ws_tokens"),
          size(regexp_extract_all(lower(col("text")),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("n_bpe_tokens"))
        // round 15: same pre-sort boundary as text_quality (the regex
        // token pass is the query's whole cost — don't run it twice)
        .localCheckpoint()
        .orderBy(col("doc_id"))
    },
    Some(s"""
      SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
             CAST(len(${sqlWords("text")}) AS INTEGER) AS n_ws_tokens,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpe_tokens
      FROM documents
      ORDER BY doc_id
    """))

  /** Length / punctuation / stopword quality score. */
  val textQuality = Q(
    "text_quality",
    (s, dir) => {
      val w = words(col("text"))
      val n = size(w)
      val punct = (length(col("text")) -
        length(regexp_replace(col("text"), "[^a-z0-9 ]", ""))) * lit(1.0) / length(col("text"))
      val stop = ratioIn(w, stopwords("en"))
      val meanLen = aggregate(w, lit(0L), (acc, x) => acc + length(x)) * lit(1.0) / n
      Tables.t(s, dir, "documents")
        .select(
          col("doc_id"),
          n.as("n_tokens"),
          punct.as("punct_ratio"),
          stop.as("stop_ratio"),
          meanLen.as("mean_word_len"),
          // the SHARED score expression (also the streaming filter's
          // predicate) — single source of truth for the formula
          qualityScore(col("text")).as("quality"))
        // round 15: materialize before the sort — orderBy's range-
        // partition SAMPLING pass otherwise re-runs the whole
        // interpreted word-stats chain a second time (two ~0.39 s
        // single-task stages measured at sf0.1; map-only plans have no
        // shuffle stage for AQE to reuse). Narrow output rows only.
        .localCheckpoint()
        .orderBy(col("doc_id"))
    },
    Some {
      val w = sqlWords("text")
      val punct = s"(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) * 1.0 / length(text)"
      val stop = sqlRatioIn(w, stopwords("en"))
      s"""
      SELECT doc_id,
             CAST(len($w) AS INTEGER) AS n_tokens,
             $punct AS punct_ratio,
             $stop AS stop_ratio,
             list_sum(list_transform($w, x -> length(x))) * 1.0 / len($w) AS mean_word_len,
             least(1.0, len($w) * 1.0 / 64.0) * 0.3 + (1.0 - $punct) * 0.3 + $stop * 0.4 AS quality
      FROM documents
      ORDER BY doc_id
      """
    })

  /** Cached (doc_id, lang, extra*, r_<lang>*) stopword-ratio table —
    * the substrate lang_id's dominance fold runs on, shared with the
    * composed curation pipeline (curate_corpus). The cache boundary
    * matters (lesson 8): the fold references each language ratio up to
    * |langs|-1 times and consumers reference the prediction again — on
    * raw expressions that would re-run the word-array filter ~25x per
    * row; on cached ratio ATTRIBUTES each ratio is computed once.
    * `extra` lets a caller fold additional per-row columns into the
    * same corpus pass instead of scanning documents twice. */
  private[queries] def langScored(
      s: SparkSession, dir: String,
      extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val langs = stopwords.keys.toSeq.sorted
    // round 15: ONE LangRatiosExpr kernel pass instead of 5 interpreted
    // ratioIn filters over the word array (bit-identical per language —
    // LangRatiosSpec). The kernel lands behind the cache; the r_*
    // columns are O(1) element_at extractions of the cached array, so
    // the fold's ~25 references per row stay cheap (lesson 8's boundary
    // in the same place).
    val bc = org.apache.spark.sql.graftbridge.Bridge
    val rr = bc.column(graft.functions.LangRatiosExpr(bc.expr(lower(col("text")))))
    Tables.t(s, dir, "documents")
      .select(Seq(col("doc_id"), col("lang")) ++ extra :+ rr.as("rr"): _*)
      .cache()
      .select(col("*") +: langs.zipWithIndex.map { case (l, i) =>
        element_at(col("rr"), i + 1).as(s"r_$l") }: _*)
      .drop("rr")
  }

  /** The dominance-fold prediction over langScored's r_* columns; ties
    * break to the alphabetically first language. */
  private[queries] def langPredCol: org.apache.spark.sql.Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scores = langs.map(l => l -> col(s"r_$l")).toMap
    langs.foldRight(lit(langs.last): org.apache.spark.sql.Column) { (l, acc) =>
      val dominates = langs.filter(_ > l)
        .map(o => scores(l) >= scores(o))
        .reduceOption(_ && _).getOrElse(lit(true))
      when(dominates, lit(l)).otherwise(acc)
    }
  }

  /** DuckDB CASE expression mirroring langPredCol over a `text`
    * column in scope — same tie-break, same ratio arithmetic. */
  private[queries] def sqlLangCase: String = {
    val w = sqlWords("lower(text)")
    val langs = stopwords.keys.toSeq.sorted
    def sc(l: String) = sqlRatioIn(w, stopwords(l))
    val cases = langs.dropRight(1).map { l =>
      val conds = langs.filter(_ > l).map(o => s"(${sc(l)}) >= (${sc(o)})").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n             ")
    s"CASE $cases ELSE '${langs.last}' END"
  }

  /** Stopword-profile language ID; ties break to the alphabetically
    * first language. Compared against the labeled `lang` column. */
  val langId = Q(
    "lang_id",
    (s, dir) => {
      val pred = langPredCol
      langScored(s, dir)
        .select(
          col("doc_id"), col("lang").as("labeled"),
          pred.as("pred"),
          (pred === col("lang")).as("hit"))
        .orderBy(col("doc_id"))
    },
    Some {
      s"""
      SELECT doc_id, lang AS labeled,
             $sqlLangCase AS pred,
             ($sqlLangCase) = lang AS hit
      FROM documents
      ORDER BY doc_id
      """
    })

  /** Winnowing fingerprints: positional char-8-grams → MD5 → min per
    * 4-window → distinct. (Rolling-hash fingerprinting in the MD5-
    * portable formulation; SURVEY §2D.) */
  val docFingerprint = Q(
    "doc_fingerprint",
    (s, dir) => {
      // one-pass kernel (WinnowFingerprint): hashes, min, window mins
      // and the distinct count in a single eval — no ~300-element hash
      // array materialized per row, no interpreted per-element HOFs
      // (measured 6.0s → 0.6s at sf0.1). The struct lands behind a
      // cache boundary so the three field extractions don't re-run the
      // kernel (lesson 8).
      val bc = org.apache.spark.sql.graftbridge.Bridge
      val wf = bc.column(graft.functions.WinnowFingerprint(bc.expr(col("text"))))
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), wf.as("w")).cache()
        .select(
          col("doc_id"),
          col("w").getField("n_grams").as("n_grams"),
          col("w").getField("min_fp").as("min_fp"),
          col("w").getField("n_fp").as("n_fp"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH h AS (
        SELECT doc_id,
               list_transform(range(1, greatest(length(text) - 7, 0) + 1),
                              i -> md5(substr(text, i, 8))) AS h
        FROM documents)
      SELECT doc_id, CAST(len(h) AS INTEGER) AS n_grams,
             list_aggregate(h, 'min') AS min_fp,
             CAST(len(list_distinct(list_transform(range(1, greatest(len(h) - 3, 0) + 1),
                                              j -> list_aggregate(h[j:j+3], 'min')))) AS INTEGER) AS n_fp
      FROM h
      ORDER BY doc_id
    """))

  /** Canonical text normalization — the cleanup pass ahead of any
    * dedup/training-data pipeline: lowercase, strip non-printable
    * ASCII, collapse whitespace runs, trim. Emits the normalized text
    * digest + before/after lengths (portable regex subset only). */
  val textNormalize = Q(
    "text_normalize",
    (s, dir) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^\\x20-\\x7e]", " "),
        " +", " "))
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).as("len_raw"),
          length(norm).as("len_norm"),
          md5(norm).as("norm_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, CAST(length(text) AS INTEGER) AS len_raw,
             CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^\x20-\x7e]', ' ', 'g'), ' +', ' ', 'g'))) AS INTEGER) AS len_norm,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^\x20-\x7e]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5
      FROM documents
      ORDER BY doc_id
    """))

  /** Deterministic stratified sampling — the language-rebalancing step
    * of a training-data pipeline (downsample the dominant language):
    * keep an 'en' doc with probability 1/2, any other language with
    * probability 1/4. The coin is the doc_id's md5 prefix compared to
    * an INTEGER threshold (rate × 2⁶⁰), so both engines decide with
    * pure integer ops — no float thresholds, no RNG, rerun-stable, and
    * the sample of a 100 TB corpus is reproducible per row with no
    * coordination. */
  val sampleStratified = Q(
    "sample_stratified",
    (s, dir) => {
      Tables.t(s, dir, "documents")
        .filter(sampleKeep(col("doc_id"), col("lang")))
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      SELECT doc_id, lang, CAST(length(text) AS INTEGER) AS text_len
      FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            < CASE WHEN lang = 'en' THEN ${1L << 59} ELSE ${1L << 58} END
      ORDER BY doc_id
    """))

  val qs: Seq[Q] = Seq(tokenCount, textQuality, langId, docFingerprint, textNormalize,
    sampleStratified)
}
