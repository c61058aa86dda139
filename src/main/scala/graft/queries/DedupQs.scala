package graft.queries

import graft.functions.TextFns._
import graft.functions.Vec
import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Family B (SURVEY §2B): deduplication for LLM training-data
  * pipelines, over `documents` (text) and `embeddings` (vectors).
  *
  * Scale design (SURVEY §5): MinHash/SimHash signatures are pure maps;
  * candidate generation is an equi-join on short band keys (shuffle =
  * |docs|·bands small rows); exact verification touches only candidate
  * pairs, never the N² space. The reference's SimHash bucketing is
  * simple_sim_hash.py:1-33.
  */
object DedupQs {

  private val NumHashes = 9
  private val Bands = 3 // 3 rows per band
  private val MinhashThreshold = 0.5
  private val SimhashMaxHamming = 4
  private val EmbCosThreshold = 0.45

  // ---- dedup_exact ----

  val dedupExact = Q(
    "dedup_exact",
    (s, dir) => {
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm_md5"))
        .groupBy(col("norm_md5"))
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
        .orderBy(col("norm_md5"))
    },
    Some("""
      SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_md5,
             COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
      FROM documents
      GROUP BY 1
      ORDER BY norm_md5
    """))

  // ---- MinHash LSH ----

  /** doc_id + 3-word-shingle 31-bit hashes (one MD5 pass; every
    * MinHash derives from `hs` with integer ops). No array_distinct:
    * min over the shingle multiset equals min over the set, so the
    * dedup pass skips that allocation (the oracle keeps the distinct
    * form — identical signatures). */
  private def shingled(s: SparkSession, dir: String): DataFrame = {
    // cache boundary materializes the word array: referencing the
    // `words(text)` EXPRESSION from inside the shingle lambda would
    // inline (duplicate) it into every element_at call — O(words²)
    // re-splitting per row, measured 4.7s vs 0.7s at sf0.1
    val wt = Tables.t(s, dir, "documents")
      .select(col("doc_id"), words(col("text")).as("w")).cache()
    val rawShingles = transform(
      sequence(lit(1), greatest(size(col("w")) - 2, lit(0))),
      i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1),
        element_at(col("w"), i + 2)))
    wt.select(col("doc_id"), shingleHashes(rawShingles).as("hs"))
  }

  private val sqlShingled =
    s"""sh AS (SELECT doc_id, sh, ${sqlShingleHashes("sh")} AS hs
         FROM (SELECT doc_id, ${sqlWordShingles(sqlWords("text"), 3)} AS sh FROM documents))"""

  /** (band_idx, band_key, doc_id) from a signatures table — band key =
    * md5 of 3 concatenated MinHash values, built as a union of plain
    * projections (NOT posexplode: expressions inside a Generate run
    * interpreted per output row).
    *
    * Catalyst inlines derived columns (CollapseProject), so without
    * materialization the shingle→md5 chain re-executes once per sig
    * per branch per join side (≈18×). The caller caches `sigTable`
    * once; everything downstream reads 9 longs per doc. */
  private def sigTable(s: SparkSession, dir: String): DataFrame = {
    val sigCols = (0 until NumHashes).map(j => minhash(col("hs"), j).as(s"s$j"))
    // cache the hash arrays first: CollapseProject would otherwise
    // inline the whole words→shingles→md5 chain into EACH of the 9
    // signature expressions (9× the corpus hashing cost, measured 6s
    // vs 1.2s at sf0.1)
    shingled(s, dir).cache().select(col("doc_id") +: sigCols: _*)
  }

  /** per-(band, key) ceiling — the same 20k cap simhash_ann applies
    * (reference bucket cap, simple_sim_hash.py:23): one degenerate
    * band key (boilerplate-heavy corpus) must not turn the candidate
    * self-join quadratic. Deterministic first-by-doc_id keep; no-op
    * below the cap, mirrored in the oracle. */
  private val BandBucketCap = 20000

  private def bandsOf(sigs: DataFrame, cap: Int = BandBucketCap): DataFrame =
    (0 until Bands).map { b =>
      sigs.select(col("doc_id"), lit(b).as("band_idx"),
        md5(concat_ws(",", col(s"s${3 * b}"), col(s"s${3 * b + 1}"), col(s"s${3 * b + 2}")))
          .as("bkey"))
    }.reduce(_.union(_))
      .withColumn("brn", row_number().over(
        Window.partitionBy(col("band_idx"), col("bkey")).orderBy(col("doc_id"))))
      .filter(col("brn") <= cap)
      .drop("brn")

  private def banded(s: SparkSession, dir: String): DataFrame =
    bandsOf(sigTable(s, dir))

  private val sqlBanded = {
    def sig(j: Int) = sqlMinhash("hs", j)
    val bandKeys = (0 until Bands)
      .map(b => s"md5(CAST(${sig(3 * b)} AS VARCHAR) || ',' || CAST(${sig(3 * b + 1)} AS VARCHAR) || ',' || CAST(${sig(3 * b + 2)} AS VARCHAR))")
      .mkString(", ")
    s"""banded0 AS (
      SELECT doc_id, u.i AS band_idx, u.k AS bkey
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, ${Bands + 1}),
                          i -> {'i': i - 1, 'k': bands[i]})) AS u
            FROM (SELECT doc_id, [$bandKeys] AS bands FROM sh))),
    banded AS (
      SELECT doc_id, band_idx, bkey FROM (
        SELECT doc_id, band_idx, bkey,
               ROW_NUMBER() OVER (PARTITION BY band_idx, bkey ORDER BY doc_id) AS brn
        FROM banded0) WHERE brn <= $BandBucketCap)"""
  }

  /** dev-profiling access (ProfileMinhashSpec). */
  def bandedPublic(s: SparkSession, dir: String): DataFrame = banded(s, dir)
  def sigTablePublic(s: SparkSession, dir: String): DataFrame = sigTable(s, dir)
  def bandsOfPublic(sigs: DataFrame, cap: Int = BandBucketCap): DataFrame = bandsOf(sigs, cap)

  /** The verified duplicate-pair table, materialized ONCE per corpus
    * (ProjIndex.ensureTable): dedup_minhash reports it, the groups and
    * apply stages build on it — a real pipeline mines candidates a
    * single time, downstream stages read the artifact. */
  def minhashPairs(s: SparkSession, dir: String): DataFrame =
    graft.operators.ProjIndex.ensureTable(s, dir, "minhash_pairs") {
      // ONE pass hashes the corpus into 9 longs/doc (cached tiny);
      // bands and both self-join sides read that. Shingle arrays are
      // re-materialized ONLY for candidate docs at verify time — at
      // 100 TB the full-corpus pass carries signatures, never arrays.
      val sigs = sigTable(s, dir).cache()
      val bands = bandsOf(sigs)
      val cand = bands.as("x")
        .join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
        .localCheckpoint()
      val candIds = cand.select(col("a").as("doc_id"))
        .union(cand.select(col("b").as("doc_id"))).distinct()
      val sh = Tables.t(s, dir, "documents")
        .join(broadcast(candIds), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), wordShingles(words(col("text")), 3).as("sh"))
      cand
        .join(sh.select(col("doc_id").as("a"), col("sh").as("sa")), Seq("a"))
        .join(sh.select(col("doc_id").as("b"), col("sh").as("sb")), Seq("b"))
        .select(col("a"), col("b"), jaccard(col("sa"), col("sb")).as("jaccard"))
        .filter(col("jaccard") >= MinhashThreshold)
    }

  /** LSH candidates verified by exact shingle Jaccard. */
  val dedupMinhash = Q(
    "dedup_minhash",
    (s, dir) => minhashPairs(s, dir).orderBy(col("a"), col("b")),
    Some(s"""
      WITH $sqlShingled,
      $sqlBanded,
      cand AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM banded x JOIN banded y
          ON x.band_idx = y.band_idx AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
      SELECT a, b, ${sqlJaccard("sa.sh", "sb.sh")} AS jaccard
      FROM cand
      JOIN sh sa ON sa.doc_id = a
      JOIN sh sb ON sb.doc_id = b
      WHERE ${sqlJaccard("sa.sh", "sb.sh")} >= $MinhashThreshold
      ORDER BY a, b
    """))

  /** Connected components over verified duplicate pairs → canonical
    * survivor (min doc_id) per component, one output row per member
    * (array-free: the driver comparer can't hash array cells).
    * Iterative min-label propagation, run to convergence: labels only
    * decrease, so sum(label) is a strictly-decreasing convergence
    * witness (one tiny agg per round — no silent fixed-round cap that
    * would mislabel a long-chain component). Oracle = recursive-CTE
    * reachability (min reachable node per member). */
  val dedupMinhashGroups = Q(
    "dedup_minhash_groups",
    (s, dir) => {
      val pairs = minhashPairs(s, dir).select(col("a"), col("b")).cache()
      val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))
        .cache()
      var labels = edges.select(col("a").as("node")).distinct()
        .withColumn("label", col("node"))
        .localCheckpoint()
      def labelSum(df: DataFrame): Long =
        df.agg(coalesce(sum(col("label")), lit(0L))).head.getLong(0)
      var prevSum = labelSum(labels)
      var converged = false
      var round = 0
      // 64 rounds handles any component of diameter < 64; beyond that
      // FAIL LOUDLY (require below) rather than silently mislabel —
      // the oracle computes exact reachability and would go red anyway
      while (!converged && round < 64) {
        round += 1
        val nbrMin = edges
          .join(labels, edges("b") === labels("node"))
          .groupBy(col("a").as("node2"))
          .agg(min(col("label")).as("nbr_label"))
        // localCheckpoint truncates the per-round lineage — without it
        // round r's plan nests all rounds < r and stage count explodes
        labels = labels.join(nbrMin, col("node") === col("node2"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
          .localCheckpoint()
        val sumNow = labelSum(labels)
        converged = sumNow == prevSum
        prevSum = sumNow
      }
      require(converged,
        "dedup_minhash_groups: label propagation did not converge in 64 rounds " +
          "(duplicate-chain diameter >= 64) — refusing to emit mislabeled components")
      val sizes = labels.groupBy(col("label"))
        .agg(count(lit(1)).as("group_size"))
      labels.join(sizes, "label")
        .select(col("label").as("survivor_id"), col("group_size"),
          col("node").as("member"))
        .orderBy(col("survivor_id"), col("member"))
    },
    Some(s"""
      WITH RECURSIVE $sqlGroupCtes,
      gs AS (SELECT survivor_id, COUNT(*) AS group_size FROM comp GROUP BY survivor_id)
      SELECT c.survivor_id AS survivor_id, gs.group_size AS group_size,
             c.node AS member
      FROM comp c JOIN gs USING (survivor_id)
      ORDER BY survivor_id, member
    """))

  /** Shared oracle CTE chain ending in `comp(node, survivor_id)` — the
    * connected components of the verified duplicate pairs. */
  private[queries] lazy val sqlGroupCtes = s"""$sqlShingled,
      $sqlBanded,
      cand AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM banded x JOIN banded y
          ON x.band_idx = y.band_idx AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      pairs AS (
        SELECT a, b
        FROM cand
        JOIN sh sa ON sa.doc_id = a
        JOIN sh sb ON sb.doc_id = b
        WHERE ${sqlJaccard("sa.sh", "sb.sh")} >= $MinhashThreshold),
      edges AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
      reach(node, r) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node),
      comp AS (SELECT node, MIN(r) AS survivor_id FROM reach GROUP BY node)"""

  /** Apply the dedup verdict: the cleaned corpus = every document that
    * is not a non-survivor member of a duplicate group — the
    * materialization step every dedup pipeline ends with (keep one
    * canonical doc per near-dup cluster, drop the rest). Anti-join on
    * the (small) removal set, so the 100 TB corpus streams through
    * once. */
  val dedupApply = Q(
    "dedup_apply",
    (s, dir) => {
      val removed = dedupMinhashGroups.fn(s, dir)
        .filter(col("member") =!= col("survivor_id"))
        .select(col("member").as("doc_id"))
      Tables.t(s, dir, "documents")
        .join(removed, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE $sqlGroupCtes
      SELECT doc_id, lang, CAST(length(text) AS INTEGER) AS text_len
      FROM documents
      WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> survivor_id)
      ORDER BY doc_id
    """))

  // ---- SimHash ----

  /** 32-bit SimHash over distinct word BIGRAMS: bit i set iff the sum
    * over tokens of ±1 (sign = bit i of the token's md5-prefix) is > 0.
    * Bigrams (not single words) keep signatures discriminative when a
    * corpus shares a small vocabulary — with unigram features every
    * doc collided into every band and the candidate join degenerated
    * to N². */
  private def simhashDoc(s: SparkSession, dir: String): DataFrame = {
    // same cache-boundary trick as shingled(): keep the word array an
    // attribute so the bigram lambda can't inline the split per element
    val wt = Tables.t(s, dir, "documents")
      .select(col("doc_id"), words(lower(col("text"))).as("w")).cache()
    val bigrams = array_distinct(transform(
      sequence(lit(1), greatest(size(col("w")) - 1, lit(0))),
      i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
    val tok = wt
      .select(col("doc_id"), explode(bigrams).as("tok"))
      .select(col("doc_id"), conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("v"))
    val sums = (0 until 32).map(i =>
      sum(shiftright(col("v"), i).bitwiseAND(lit(1L)) * 2L - 1L).as(s"s$i"))
    val sim = (0 until 32)
      .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a + b)
    tok.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), sim.as("simhash"))
  }

  private val sqlSimhashDoc = {
    val sums = (0 until 32)
      .map(i => s"SUM(((v >> $i) & 1) * 2 - 1) AS s$i").mkString(", ")
    val sim = (0 until 32)
      .map(i => s"CASE WHEN s$i > 0 THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    s"""tok AS (
      SELECT doc_id, ('0x' || substr(md5(t.tok), 1, 8))::BIGINT AS v
      FROM (SELECT doc_id, unnest(${sqlWordShingles(sqlWords("lower(text)"), 2)}) AS tok
            FROM documents) t),
    sums AS (SELECT doc_id, $sums FROM tok GROUP BY doc_id),
    simdoc AS (SELECT doc_id, CAST($sim AS BIGINT) AS simhash FROM sums)"""
  }

  /** Banded SimHash near-dup pairs (4 bands of 8 bits, Hamming ≤ 6
    * verified via bit_count(xor)). */
  val dedupSimhash = Q(
    "dedup_simhash",
    (s, dir) => {
      val sim = simhashDoc(s, dir).cache()
      val bandKeys = (0 until 4).map(b =>
        shiftright(col("simhash"), 8 * b).bitwiseAND(lit(255L)))
      val bands = sim.select(col("doc_id"), col("simhash"),
        posexplode(array(bandKeys: _*)).as(Seq("band_idx", "bkey")))
      bands.as("x")
        .join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= SimhashMaxHamming)
        .orderBy(col("a"), col("b"))
    },
    Some(s"""
      WITH $sqlSimhashDoc,
      bands AS (
        SELECT doc_id, simhash, u.i AS band_idx, u.k AS bkey
        FROM (SELECT doc_id, simhash,
                     unnest(list_transform(range(1, 5),
                            i -> {'i': i - 1, 'k': (simhash >> ((i - 1) * 8)) & 255})) AS u
              FROM simdoc)),
      pairs AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
               CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
        FROM bands x JOIN bands y
          ON x.band_idx = y.band_idx AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
      SELECT a, b, hamming FROM pairs
      WHERE hamming <= $SimhashMaxHamming
      ORDER BY a, b
    """))

  // ---- n-gram Jaccard + embedding near-dup ----

  /** Exact char-3-gram Jaccard for adjacent doc pairs. */
  val ngramJaccard = Q(
    "ngram_jaccard",
    (s, dir) => {
      // localCheckpoint: the gram table feeds BOTH join sides — without
      // the boundary each side re-runs the per-char gram build and the
      // join doubles it again (measured 14.3s vs 5.1s at sf0.1).
      // CharGramsExpr kernel: same distinct grams, tight loop instead
      // of interpreted per-element HOFs (3.8s → <1s gram build)
      val bc = org.apache.spark.sql.graftbridge.Bridge
      val g = Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          bc.column(graft.functions.CharGramsExpr(bc.expr(lower(col("text"))), 3)).as("g"))
        .localCheckpoint()
      g.select(col("doc_id").as("a"), col("g").as("ga"))
        .join(g.select(col("doc_id").as("b"), col("g").as("gb")),
          col("a") + 1 === col("b"))
        .select(col("a"), col("b"), jaccard(col("ga"), col("gb")).as("jaccard"))
        .orderBy(col("a"))
    },
    Some(s"""
      WITH g AS (SELECT doc_id, ${sqlCharGrams("lower(text)", 3)} AS g FROM documents)
      SELECT x.doc_id AS a, y.doc_id AS b, ${sqlJaccard("x.g", "y.g")} AS jaccard
      FROM g x JOIN g y ON x.doc_id + 1 = y.doc_id
      ORDER BY a
    """))

  /** Embedding-cosine near-duplicate pairs at scale: banded hyperplane
    * LSH candidates (simple_sim_hash.py's hyperplane signature applied
    * pairwise like dedup_minhash's band join) verified by exact cosine
    * ≥ threshold. No all-pairs scan, no full-table broadcast: the
    * corpus is hashed ONCE into the 64-plane signature, candidates
    * come from an equi-join on (band_idx, band_key) with a 20k
    * per-bucket ceiling (skew guard), and only candidate pairs are
    * ever scored.
    *
    * The band LAYOUT is DATA-SIZED (r7 item 1, both engines branch on
    * the corpus count — Lsh.PairScaleCutover): small corpora run 16
    * bands × 4 sign bits over raw vectors (boundary recall
    * P(capture) = 1−(1−p^4)^16, p = 1−θ/π —
    * DedupEmbeddingRecallSpec's floor), large corpora regroup the SAME
    * 64-plane signature into 2 bands × 32 bits over CENTERED vectors
    * (quantized-exact global mean subtracted) — the configuration the
    * 1M scale run proved out after the uncentered short-band layouts
    * went quadratic on clustered data (docs/scale_run.md lesson 3:
    * a cluster's offset freezes short keys cluster-wide; centering
    * un-freezes them and 32-bit keys leave buckets near-singleton
    * while exact dups still collide in every band).
    *
    * The cutover is overridable so the spec can force the scale branch
    * on the small test corpus (the catalog entry always passes
    * Lsh.PairScaleCutover).
    *
    * A THIRD tier (≥ Lsh.PairWideCutover, measured at 10M where the
    * 2×32 layout's candidate-pair shuffle filled the disk: clustered
    * buckets grow linearly with n, pairs quadratically) widens to 4
    * bands × 48-bit keys from the extended 192-plane bank — buckets
    * re-collapse to near-singletons, exact dups still collide in every
    * band, band count doubles to hold boundary capture. */
  private[graft] def embeddingPairs(
      s: SparkSession, dir: String, cutover: Long,
      wideCutover: Long = graft.operators.Lsh.PairWideCutover): DataFrame = {
      import graft.operators.{Lsh, Moments}
      val e = Tables.t(s, dir, "embeddings")
      val n = e.count()
      // plane-bank width follows the corpus dimensionality (64 on every
      // test table — bank and hashes unchanged there; a 200d corpus
      // hashes all 200 components, Lsh.bandPlanesFor). The oracle SQL
      // keeps the 64d literals: the driver and every planted-corpus
      // replay only ever run it against 64d tables.
      val dim = Tables.embDim(s, dir)
      // ONE hashing pass → a 16-int signature array per vector via the
      // compact LshBandKeys kernel. The inline form (64 VecDot columns
      // over 64 literal plane arrays) generated so much Java that
      // janino compilation dominated the query — ~1s per stage
      // carrying the expression (lesson: plan-size cost is real even
      // when the data is small). Built in a Project so the generator
      // explodes an ATTRIBUTE (lesson 2).
      val bc = org.apache.spark.sql.graftbridge.Bridge
      // first-match-band dedup: a pair colliding in several bands is
      // emitted ONLY from its lowest matching band (rows carry both
      // signature arrays, so "an earlier band also matched" is a local
      // int-compare predicate). Same candidate SET as
      // join-then-distinct, but the multiply-matched pair stream never
      // shuffles into a distinct — at 100 TB that shuffle carries every
      // duplicate. Under a binding bucket cap the earlier-band test
      // sees the uncapped key match, so a capped-out earlier band
      // suppresses its pairs — candidates were probabilistic under the
      // cap already; the test corpus never binds it (max bucket <<
      // 20k, oracle unaffected).
      val (bands, firstMatchBand) =
        if (n < cutover) {
          val sigs = e.select(col("vec_id"),
            bc.column(graft.functions.LshBandKeys(bc.expr(col("embedding")),
              dim = dim)).as("ks"))
          val b = sigs.select(col("vec_id"), col("ks"),
            posexplode(col("ks")).as(Seq("band_idx", "bkey")))
          val sup = !((0 until Lsh.PairBands - 1).map { bnd =>
            col("x.band_idx") > bnd &&
              element_at(col("x.ks"), bnd + 1) === element_at(col("y.ks"), bnd + 1)
          }.reduce((p, q) => p || q))
          (b, sup)
        } else {
          if (n < wideCutover) {
          // quantized-exact global mean (Moments — partitioning-exact
          // integer sums, SURVEY §6), inlined as literals
          val m = e.agg(Moments.moments(dim)(col("embedding")).as("m"))
            .select(col("m.sums").as("sums"), col("m.n").as("cnt")).head()
          val sums = m.getSeq[Long](0)
          val cnt = m.getLong(1)
          val meanArr = array((0 until dim).map(d =>
            lit((sums(d).toDouble / cnt) / 1000000.0)): _*)
          val centered = e.select(col("vec_id"),
            zip_with(col("embedding").cast("array<double>"), meanArr,
              (x, mm) => x - mm).as("cv"))
            val sigs = centered.select(col("vec_id"),
              bc.column(graft.functions.LshBandKeys(bc.expr(col("cv")),
                dim = dim)).as("ks"))
              .localCheckpoint()
            // regroup 8 consecutive 4-bit keys into one 32-bit band key
            val b = sigs.select(col("vec_id"), col("ks"),
              explode(expr(
                s"transform(sequence(0, ${Lsh.PairScaleBands - 1}), b -> named_struct(" +
                  "'band_idx', b, " +
                  "'bkey', CAST(ks[b*8] AS BIGINT)*268435456 + ks[b*8+1]*16777216 + " +
                  "ks[b*8+2]*1048576 + ks[b*8+3]*65536 + ks[b*8+4]*4096 + " +
                  "ks[b*8+5]*256 + ks[b*8+6]*16 + ks[b*8+7]))")).as("w"))
              .select(col("vec_id"), col("ks"),
                col("w.band_idx").as("band_idx"), col("w.bkey").as("bkey"))
            val sup = !(col("x.band_idx") > 0 &&
              (0 until Lsh.PairScaleNibbles).map(j =>
                element_at(col("x.ks"), j + 1) === element_at(col("y.ks"), j + 1))
                .reduce((p, q) => p && q))
            (b, sup)
          } else {
            // WIDE tier (≥ PairWideCutover): QUANTIZER-RESIDUAL keys
            // (see Lsh.PairWideCutover — measured at 10M, where wider
            // GLOBAL bands still held 110k-row buckets because a tight
            // cluster freezes sign bits no matter the band width).
            // Route each vector to its data-sized k-means cell (the
            // shared persisted allIvf artifact — the dedup_semantic
            // convention), hash the residual's 176-plane signature
            // into 4 bands × 44 bits, and pack the cell id into the
            // bucket key (cid·2⁴⁴ + bandKey < 2⁶³): residuals are
            // near-isotropic so the bits are genuinely noisy, and
            // exact dups share cell → residual → every band key.
            //
            // Rows carry ONLY the 4 packed keys (array<bigint>): the
            // first 10M attempt carried the nibble signature through
            // explode → window → self-join and the ~200 B/row tax
            // across the twice-computed subplan was most of the spill.
            // Packing is injective (cid, nibble-seq) → key, so
            // earlier-band suppression compares bks[bnd] directly.
            val (cents, assigned) = CurationQs.allIvf(s, dir)
            val nib = Lsh.PairWideNibbles
            val horner = (b0: Int) =>
              (1 until nib).foldLeft(s"CAST(ks[${b0 * nib}] AS BIGINT)") {
                (acc, k) => s"($acc) * 16 + ks[${b0 * nib + k}]"
              }
            val hornerArr = (0 until Lsh.PairWideBands)
              .map(b0 => s"CAST(cid AS BIGINT) * 17592186044416 + (${horner(b0)})")
              .mkString("array(", ", ", ")")
            val rv = assigned
              .select(col("vec_id"), col("embedding"), col("cid").cast("long").as("cid"))
              .join(broadcast(cents.select(col("cid").cast("long").as("cid"), col("cv"))),
                Seq("cid"))
              .select(col("vec_id"), col("cid"),
                zip_with(col("embedding").cast("array<double>"), col("cv"),
                  (x, c) => x - c).as("rv"))
            val sigs = rv.select(col("vec_id"), col("cid"),
              bc.column(graft.functions.LshBandKeys(bc.expr(col("rv")),
                Lsh.PairWidePlanes, dim = dim)).as("ks"))
              .select(col("vec_id"), expr(hornerArr).as("bks"))
              .localCheckpoint()
            val b = sigs.select(col("vec_id"), col("bks"),
              posexplode(col("bks")).as(Seq("band_idx", "bkey")))
            val sup = !((0 until Lsh.PairWideBands - 1).map { bnd =>
              col("x.band_idx") > bnd &&
                element_at(col("x.bks"), bnd + 1) === element_at(col("y.bks"), bnd + 1)
            }.reduce((p, q) => p || q))
            (b, sup)
          }
        }
      // per-bucket ceiling (same 20k cap as simhash_ann): one hot
      // bucket must not turn the candidate self-join quadratic on a
      // skewed corpus
      val capped = bands
        .withColumn("brn", row_number().over(
          Window.partitionBy(col("band_idx"), col("bkey")).orderBy(col("vec_id"))))
        .filter(col("brn") <= BandBucketCap)
        .drop("brn")
      val cand = capped.as("x")
        .join(capped.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.bkey") === col("y.bkey") &&
          col("x.vec_id") < col("y.vec_id"))
        .filter(firstMatchBand)
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      cand
        .join(e.select(col("vec_id").as("a"), col("embedding").as("va")), Seq("a"))
        .join(e.select(col("vec_id").as("b"), col("embedding").as("vb")), Seq("b"))
        .select(col("a"), col("b"), Vec.cosineFast(col("va"), col("vb")).as("cos"))
        .filter(col("cos") >= EmbCosThreshold)
        .orderBy(col("a"), col("b"))
  }

  val dedupEmbedding = Q(
    "dedup_embedding",
    (s, dir) => embeddingPairs(s, dir, graft.operators.Lsh.PairScaleCutover),
    Some {
      import graft.operators.Lsh
      def sqlDotB(j: Int, vc: String): String =
        s"list_reduce(list_transform(range(1, ${Lsh.Dim} + 1), i -> $vc[i] * (${Lsh.sqlBandPlane(j)})[i]), (x, y) -> x + y)"
      def sqlBkey(b: Int, vc: String): String =
        (0 until Lsh.PairBandBits)
          .map(bit => s"CASE WHEN ${sqlDotB(Lsh.PairBandBits * b + bit, vc)} > 0 THEN ${1 << bit} ELSE 0 END")
          .mkString("(", " + ", ")")
      val keyList = (0 until Lsh.PairBands).map(sqlBkey(_, "v")).mkString("[", ", ", "]")
      val keyListC = (0 until Lsh.PairBands).map(sqlBkey(_, "cv")).mkString("[", ", ", "]")
      val keyListW = (0 until Lsh.PairWideBands * Lsh.PairWideNibbles)
        .map(sqlBkey(_, "rv")).mkString("[", ", ", "]")
      val hornerW = (1 until Lsh.PairWideNibbles)
        .foldLeft(s"CAST(ks[u.b*${Lsh.PairWideNibbles}+1] AS BIGINT)") {
          (acc, k) => s"($acc) * 16 + ks[u.b*${Lsh.PairWideNibbles}+${k + 1}]"
        }
      // same corpus-count branch as the Spark side: small = 16×4-bit
      // over raw v; scale = 2×32-bit over centered v (quantized-exact
      // mean, the SqlIvf moment form). Exactly one branch is non-empty.
      s"""
      WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      prm AS MATERIALIZED (SELECT COUNT(*) AS n FROM e),
      sg AS (SELECT vec_id, $keyList AS ks FROM e, prm WHERE n < ${Lsh.PairScaleCutover}),
      sbands AS (
        SELECT vec_id, u.i AS band_idx, CAST(u.k AS BIGINT) AS bkey
        FROM (SELECT vec_id,
                     unnest(list_transform(range(1, ${Lsh.PairBands + 1}),
                            i -> {'i': i - 1, 'k': ks[i]})) AS u
              FROM sg)),
      mx AS (SELECT u.i AS dim,
                    SUM(CAST(floor(u.x * 1000000.0 + 0.5) AS BIGINT)) AS s,
                    COUNT(*) AS cnt
             FROM (SELECT unnest(list_transform(range(1, ${Lsh.Dim + 1}),
                          i -> {'i': i, 'x': v[i]})) AS u FROM e)
             GROUP BY u.i),
      mn AS MATERIALIZED (SELECT list((CAST(s AS DOUBLE) / cnt) / 1000000.0 ORDER BY dim) AS m FROM mx),
      ce AS MATERIALIZED (SELECT vec_id, list_transform(range(1, ${Lsh.Dim + 1}), i -> v[i] - m[i]) AS cv
             FROM e, mn, prm
             WHERE n >= ${Lsh.PairScaleCutover} AND n < ${Lsh.PairWideCutover}),
      csg AS (SELECT vec_id, $keyListC AS ks FROM ce),
      cbands AS (
        SELECT vec_id, u.b AS band_idx,
               CAST(ks[u.b*8+1] AS BIGINT)*268435456 + ks[u.b*8+2]*16777216 +
               ks[u.b*8+3]*1048576 + ks[u.b*8+4]*65536 + ks[u.b*8+5]*4096 +
               ks[u.b*8+6]*256 + ks[u.b*8+7]*16 + ks[u.b*8+8] AS bkey
        FROM (SELECT vec_id, ks,
                     unnest(list_transform(range(0, ${Lsh.PairScaleBands}), b -> {'b': b})) AS u
              FROM csg)),
      ${graft.queries.SqlIvf.sizedCtes("true", CurationQs.SampleIters, "dq")},
      wrv AS (SELECT a.vec_id, a.cid,
                     list_transform(range(1, ${Lsh.Dim + 1}), i -> e2.v[i] - c.cv[i]) AS rv
              FROM dqassign a
              JOIN dqe e2 ON e2.vec_id = a.vec_id
              JOIN dqcents c ON c.cid = a.cid, prm
              WHERE n >= ${Lsh.PairWideCutover}),
      wsg AS (SELECT vec_id, cid, $keyListW AS ks FROM wrv),
      wbands AS (
        SELECT vec_id, u.b AS band_idx,
               CAST(cid AS BIGINT)*17592186044416 + ($hornerW) AS bkey
        FROM (SELECT vec_id, cid, ks,
                     unnest(list_transform(range(0, ${Lsh.PairWideBands}), b -> {'b': b})) AS u
              FROM wsg)),
      bands AS (SELECT vec_id, band_idx, bkey FROM sbands
                UNION ALL SELECT vec_id, band_idx, bkey FROM cbands
                UNION ALL SELECT vec_id, band_idx, bkey FROM wbands),
      capped AS MATERIALIZED (
        SELECT vec_id, band_idx, bkey FROM (
          SELECT vec_id, band_idx, bkey,
                 ROW_NUMBER() OVER (PARTITION BY band_idx, bkey ORDER BY vec_id) AS brn
          FROM bands) WHERE brn <= $BandBucketCap),
      cand AS (
        SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
        FROM capped x JOIN capped y
          ON x.band_idx = y.band_idx AND x.bkey = y.bkey AND x.vec_id < y.vec_id)
      SELECT a, b, ${Vec.sqlCosine("ea.v", "eb.v")} AS cos
      FROM cand JOIN e ea ON ea.vec_id = a JOIN e eb ON eb.vec_id = b
      WHERE ${Vec.sqlCosine("ea.v", "eb.v")} >= $EmbCosThreshold
      ORDER BY a, b
    """
    })

  val qs: Seq[Q] = Seq(
    dedupExact, dedupMinhash, dedupMinhashGroups, dedupSimhash,
    ngramJaccard, dedupEmbedding, dedupApply)
}
