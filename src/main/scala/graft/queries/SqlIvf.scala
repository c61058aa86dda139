package graft.queries

import graft.functions.Vec

/** DuckDB mirror of the deterministic IVF build (operators.Ivf): the
  * Lloyd iterations UNROLLED as chained CTEs — init = k lowest
  * vec_ids ranked, assignment = argmin (d², cid) via ROW_NUMBER,
  * update = the quantized-exact mean (floor(x·10⁶ + 0.5) integer sums
  * → (CAST(sum AS DOUBLE)/n)/10⁶, exactly operators.Moments). Proven
  * bit-identical to the Spark build (ivf_build hash-matches), which
  * turns every IVF-routed search query into an oracle'd one — round 2
  * marked these rows-only because the k-means is iterative; unrolling
  * a FIXED iteration count is plain SQL.
  *
  * Emits CTEs `{p}e` (vec_id, v), `{p}cents` (cid, cv) and `{p}assign`
  * (vec_id, cid) under the caller's WITH. Lambdas stay single-level
  * (lesson 9). */
object SqlIvf {

  def l2sq(a: String, b: String): String = Vec.sqlL2sq(a, b)

  /** @param where   SQL predicate over `embeddings` rows (e.g.
    *                "vec_id % 50 <> 0") — "true" for all
    * @param k       number of centroids
    * @param iters   Lloyd iterations (unrolled)
    * @param p       CTE name prefix (several quantizers can coexist)
    * @param vexpr   vector expression over an `embeddings` row —
    *                defaults to the full embedding; PQ passes subspace
    *                slices */
  def ctes(where: String, k: Int, iters: Int, p: String,
      vexpr: String = "embedding::DOUBLE[]"): String = {
    val init =
      s"""${p}e AS MATERIALIZED (SELECT vec_id, $vexpr AS v FROM embeddings WHERE $where),
      ${p}c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v AS cv
        FROM (SELECT vec_id, v FROM ${p}e ORDER BY vec_id LIMIT $k))"""
    val rounds = (1 to iters).map { t =>
      s"""${p}a$t AS (SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ${l2sq("e.v", "c.cv")}, c.cid) AS rn
        FROM ${p}e e CROSS JOIN ${p}c${t - 1} c) WHERE rn = 1),
      ${p}x$t AS (SELECT cid, u.i AS dim, CAST(floor(u.x * 1000000.0 + 0.5) AS BIGINT) AS xq
        FROM (SELECT cid, unnest(list_transform(range(1, len(v) + 1), i -> {'i': i, 'x': v[i]})) AS u
              FROM ${p}a$t)),
      ${p}c$t AS MATERIALIZED (SELECT cid, list((CAST(s AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
        FROM (SELECT cid, dim, SUM(xq) AS s, COUNT(*) AS n FROM ${p}x$t GROUP BY cid, dim)
        GROUP BY cid)"""
    }.mkString(",\n      ")
    s"""$init,
      $rounds,
      ${p}cents AS MATERIALIZED (SELECT cid, cv FROM ${p}c$iters),
      ${p}assign AS MATERIALIZED (SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ${l2sq("e.v", "c.cv")}, c.cid) AS rn
        FROM ${p}e e CROSS JOIN ${p}cents c) WHERE rn = 1)"""
  }

  /** DATA-SIZED mirror of Ivf.sizedBuild: k and the training stride
    * are computed FROM the corpus inside the query, with the exact
    * integer formulas of Ivf.cellsFor / Ivf.trainStrideFor (smallest
    * power of two p with 16·p² ≥ n, clamped to [16, kCap]; stride =
    * max(1, n / (128·k))). Lloyd iterations run over the strided
    * TRAINING set `${p}t`; only the final `${p}assign` touches the
    * full `${p}e` — identical to the Spark build at every scale, and
    * byte-identical to the unsized `ctes` whenever n is small enough
    * that k = 16 and stride = 1 (all test SFs).
    *
    * @param kCap cells ceiling (65536 for coarse quantizers, 256 for
    *             PQ sub-quantizers) */
  def sizedCtes(where: String, iters: Int, p: String,
      vexpr: String = "embedding::DOUBLE[]", kCap: Int = 65536): String = {
    val powers = Iterator.iterate(16)(_ * 2).takeWhile(_ <= kCap).toSeq
    val init =
      s"""${p}e AS MATERIALIZED (SELECT vec_id, $vexpr AS v FROM embeddings WHERE $where),
      ${p}prm AS MATERIALIZED (SELECT COUNT(*) AS n FROM ${p}e),
      ${p}kk AS MATERIALIZED (SELECT COALESCE(
          (SELECT MIN(pw) FROM (SELECT UNNEST(${powers.map(_.toString + "::BIGINT").mkString("[", ", ", "]")}) AS pw), ${p}prm
           WHERE 16 * pw * pw >= n), $kCap) AS k FROM ${p}prm),
      ${p}st AS MATERIALIZED (SELECT GREATEST(1, n // (128 * k)) AS stride FROM ${p}prm, ${p}kk),
      ${p}t AS MATERIALIZED (SELECT vec_id, v FROM ${p}e
        WHERE vec_id % (SELECT stride FROM ${p}st) = 0),
      ${p}c0 AS (SELECT CAST(rn0 - 1 AS BIGINT) AS cid, v AS cv
        FROM (SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn0 FROM ${p}t)
        WHERE rn0 <= (SELECT k FROM ${p}kk))"""
    val rounds = (1 to iters).map { t =>
      s"""${p}a$t AS (SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ${l2sq("e.v", "c.cv")}, c.cid) AS rn
        FROM ${p}t e CROSS JOIN ${p}c${t - 1} c) WHERE rn = 1),
      ${p}x$t AS (SELECT cid, u.i AS dim, CAST(floor(u.x * 1000000.0 + 0.5) AS BIGINT) AS xq
        FROM (SELECT cid, unnest(list_transform(range(1, len(v) + 1), i -> {'i': i, 'x': v[i]})) AS u
              FROM ${p}a$t)),
      ${p}c$t AS MATERIALIZED (SELECT cid, list((CAST(s AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
        FROM (SELECT cid, dim, SUM(xq) AS s, COUNT(*) AS n FROM ${p}x$t GROUP BY cid, dim)
        GROUP BY cid)"""
    }.mkString(",\n      ")
    s"""$init,
      $rounds,
      ${p}cents AS MATERIALIZED (SELECT cid, cv FROM ${p}c$iters),
      ${p}assign AS MATERIALIZED (SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ${l2sq("e.v", "c.cv")}, c.cid) AS rn
        FROM ${p}e e CROSS JOIN ${p}cents c) WHERE rn = 1)"""
  }

  /** One entry-ladder Lloyd chain at `mult`× the sized base depth
    * (Ivf.entryLadder's per-doubling quantizer): k = base k · mult,
    * training stride re-derived for THAT k (max(1, n // (128·k))),
    * same init / iteration / quantized-mean shape as `sizedCtes`.
    * Requires `${bp}e`, `${bp}prm`, `${bp}kk` in scope; emits
    * `${p}cents`. */
  private def ladderChain(bp: String, p: String, mult: Int, iters: Int): String = {
    val init =
      s"""${p}kk AS MATERIALIZED (SELECT k * $mult AS k FROM ${bp}kk),
      ${p}st AS MATERIALIZED (SELECT GREATEST(1, n // (128 * k)) AS stride FROM ${bp}prm, ${p}kk),
      ${p}t AS MATERIALIZED (SELECT vec_id, v FROM ${bp}e
        WHERE vec_id % (SELECT stride FROM ${p}st) = 0),
      ${p}c0 AS (SELECT CAST(rn0 - 1 AS BIGINT) AS cid, v AS cv
        FROM (SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn0 FROM ${p}t)
        WHERE rn0 <= (SELECT k FROM ${p}kk))"""
    val rounds = (1 to iters).map { t =>
      s"""${p}a$t AS (SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ${l2sq("e.v", "c.cv")}, c.cid) AS rn
        FROM ${p}t e CROSS JOIN ${p}c${t - 1} c) WHERE rn = 1),
      ${p}x$t AS (SELECT cid, u.i AS dim, CAST(floor(u.x * 1000000.0 + 0.5) AS BIGINT) AS xq
        FROM (SELECT cid, unnest(list_transform(range(1, len(v) + 1), i -> {'i': i, 'x': v[i]})) AS u
              FROM ${p}a$t)),
      ${p}c$t AS MATERIALIZED (SELECT cid, list((CAST(s AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
        FROM (SELECT cid, dim, SUM(xq) AS s, COUNT(*) AS n FROM ${p}x$t GROUP BY cid, dim)
        GROUP BY cid)"""
    }.mkString(",\n      ")
    s"""$init,
      $rounds,
      ${p}cents AS MATERIALIZED (SELECT cid, cv FROM ${p}c$iters)"""
  }

  /** DuckDB mirror of the ENTRY-RESOLUTION rule (Ivf.entryLadder +
    * Ivf.entryCellsFor, lesson 42): quantized mean-d² on the fixed
    * eval sample at base-depth doublings k·{2,4,…,EntryMaxMult},
    * deepest doubling whose improvement ratio is still structural
    * (< entryStructureRatioFor(d)) wins, base k when none is. The
    * doubling chains are a STATIC unroll whose count derives from
    * log2(Ivf.EntryMaxMult) — a rule constant, not data — and the
    * validity bounds interpolate Ivf.EntryMaxMult / Ivf.MaxCells, so
    * a constant change in the Scala rule regenerates the mirror
    * rather than desynchronizing from it (r11 ADVICE 1); per-depth
    * VALIDITY (cells ≤ Ivf.entryCapCells's max(maxMult·k, n/64)
    * data-sized cap, ≤ MaxCells, < n) is data-computed exactly like
    * the Scala takeWhile, so corpora whose ladder cuts short gate
    * rows off instead of changing the unroll. The n/64 extension term
    * (round 15 — m15) can exceed maxMult·k only past n ≈ 2048·k ≈
    * 262k rows, far above any oracle corpus, so the static
    * log2(maxMult)-chain unroll covers every corpus the oracle runs
    * on; adding deeper always-materialized chains for corpora DuckDB
    * never sees would execute them on every gate run (lesson 54). The
    * structural threshold is DIMENSION-AWARE (round 12):
    * min(EntryStructureRatio, floor((2^(-2/d) − margin)·10⁴)/10⁴)
    * computed from len(v) — the 1e-4 quantization makes the pow term
    * bit-identical across JVM and libm for every d ≤ 4096
    * (Ivf.entryStructureRatioFor is the Scala side). Emits `${p}aq`
    * (resolved depth) and `${p}ecen` (cid, cv of the resolved entry
    * quantizer — base `${bp}cents` itself when the resolver holds at
    * base). Requires `sizedCtes(bp)` in scope. */
  def entryCtes(bp: String, iters: Int, p: String): String = {
    val maxMult = graft.operators.Ivf.EntryMaxMult
    val maxCells = graft.operators.Ivf.MaxCells
    // the static unroll below derives its depth count from log2 of
    // EntryMaxMult, which is only the ladder's step count when the
    // constant is a power of two — a non-pow2 value (e.g. 48) would
    // silently drop steps the Scala takeWhile still includes (r12
    // ADVICE 1): fail loudly at oracle-generation time instead
    require(Integer.bitCount(maxMult) == 1,
      s"Ivf.EntryMaxMult must be a power of two for the oracle unroll, got $maxMult")
    val nDepths = Integer.numberOfTrailingZeros(maxMult) // 2^nDepths = maxMult
    val depths = 1 to nDepths
    val chains = depths.map(j => ladderChain(bp, s"$p$j", 1 << j, iters))
      .mkString(",\n      ")
    def meanD2(j: Int): String = {
      val cents = if (j == 0) s"${bp}cents" else s"$p${j}cents"
      s"""${p}d$j AS (SELECT (SELECT k * ${1 << j} FROM ${bp}kk) AS cells,
          (CAST(SUM(CAST(floor(d2 * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)
            / (SELECT en FROM ${p}en) AS md
        FROM (SELECT d2, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
              FROM (SELECT e.vec_id, c.cid, ${l2sq("e.v", "c.cv")} AS d2
                    FROM ${p}ev e CROSS JOIN $cents c))
        WHERE rn = 1)"""
    }
    val dRows = (0 to nDepths).map(meanD2).mkString(",\n      ")
    val dUnion = (0 to nDepths).map(j => s"SELECT * FROM ${p}d$j")
      .mkString("\n          UNION ALL ")
    val ecal = (s"SELECT (SELECT k FROM ${bp}kk) AS cells, cid, cv FROM ${bp}cents" +:
      depths.map(j =>
        s"SELECT (SELECT k * ${1 << j} FROM ${bp}kk), cid, cv FROM $p${j}cents"))
      .mkString("\n          UNION ALL ")
    val ratio = graft.operators.Ivf.EntryStructureRatio
    val margin = graft.operators.Ivf.EntryRatioMargin
    s"""${p}ev AS MATERIALIZED (SELECT vec_id, v FROM ${bp}e
        WHERE vec_id % (SELECT GREATEST(1, n // (128 * k)) FROM ${bp}prm, ${bp}kk) = 0),
      ${p}en AS MATERIALIZED (SELECT COUNT(*) AS en FROM ${p}ev),
      ${p}thr AS MATERIALIZED (SELECT LEAST(CAST($ratio AS DOUBLE),
          floor((pow(2.0, -2.0 / len(v)) - CAST($margin AS DOUBLE)) * 10000.0) / 10000.0) AS thr
        FROM ${bp}e LIMIT 1),
      $chains,
      $dRows,
      ${p}lv AS (SELECT cells, md FROM (
          $dUnion), ${bp}prm, ${bp}kk
        WHERE cells <= GREATEST($maxMult * k, n // ${graft.operators.Ivf.EntryMemFracDen})
          AND cells <= $maxCells AND cells < n),
      ${p}stp AS (SELECT cells, md, LAG(md) OVER (ORDER BY cells) AS pmd FROM ${p}lv),
      ${p}aq AS MATERIALIZED (SELECT COALESCE(
          MAX(CASE WHEN pmd IS NOT NULL AND md < pmd * (SELECT thr FROM ${p}thr) THEN cells END),
          (SELECT k FROM ${bp}kk)) AS aq FROM ${p}stp),
      ${p}ecal AS ($ecal),
      ${p}ecen AS MATERIALIZED (SELECT cid, cv FROM ${p}ecal WHERE cells = (SELECT aq FROM ${p}aq))"""
  }

  /** DuckDB mirror of the TWO-LEVEL seed selection
    * (operators.SeedSelect, wired round 13): k-means the anchor bank
    * itself into cc = smallest power of two ≥ √|bank| (floor 16)
    * coarse cells — same init (lowest bids ranked), Lloyd count and
    * quantized-exact means as every other quantizer mirror — then
    * each query probes its top-`tl` coarse cells (L2 against the
    * REAL[]-cast centroids, ties by cid: the quantizer's geometry,
    * metric-independent like the cell→member map) and ranks only
    * those cells' anchors in the query metric. tl = GREATEST(16,
    * cc // 8) mirrors SeedSelect.tlFor. cc/tl are DATA-computed, so
    * the one static text serves the exact endpoint (tl ≥ cc — every
    * test SF) and the approximate branch (sf0.1, scale corpora,
    * SeedWireSpec's planted corpus) alike.
    *
    * Requires `anch` (bid), `bb` (bid, v), `qq` (qid, qv) and
    * `rknobs` (ents) in scope; emits `sd3` (qid, bid) — the seed set
    * the routed beam unions with the hub. */
  def seedCtes(metric: String, iters: Int = 2): String = {
    // the bank is ≤ Ivf.MaxCells anchors by construction, so cc never
    // exceeds the first power of two whose square reaches MaxCells
    val powers = Iterator.iterate(16)(_ * 2)
      .takeWhile(p => p.toLong * p <= graft.operators.Ivf.MaxCells).toSeq
    val init =
      s"""slb AS MATERIALIZED (SELECT a.bid AS vec_id, b.v FROM anch a JOIN bb b ON b.bid = a.bid),
      sln AS MATERIALIZED (SELECT COUNT(*) AS bn FROM slb),
      slcc AS MATERIALIZED (SELECT COALESCE(
          (SELECT MIN(pw) FROM (SELECT UNNEST(${powers.map(_.toString + "::BIGINT").mkString("[", ", ", "]")}) AS pw), sln
           WHERE pw * pw >= bn), ${powers.last}) AS cc FROM sln),
      sltl AS MATERIALIZED (SELECT GREATEST(16, cc // 8) AS tl FROM slcc),
      slc0 AS (SELECT CAST(rn0 - 1 AS BIGINT) AS cid, v AS cv
        FROM (SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn0 FROM slb)
        WHERE rn0 <= (SELECT cc FROM slcc))"""
    val rounds = (1 to iters).map { t =>
      s"""sla$t AS (SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ${l2sq("e.v", "c.cv")}, c.cid) AS rn
        FROM slb e CROSS JOIN slc${t - 1} c) WHERE rn = 1),
      slx$t AS (SELECT cid, u.i AS dim, CAST(floor(u.x * 1000000.0 + 0.5) AS BIGINT) AS xq
        FROM (SELECT cid, unnest(list_transform(range(1, len(v) + 1), i -> {'i': i, 'x': v[i]})) AS u
              FROM sla$t)),
      slc$t AS MATERIALIZED (SELECT cid, list((CAST(s AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
        FROM (SELECT cid, dim, SUM(xq) AS s, COUNT(*) AS n FROM slx$t GROUP BY cid, dim)
        GROUP BY cid)"""
    }.mkString(",\n      ")
    s"""$init,
      $rounds,
      slasn AS MATERIALIZED (SELECT vec_id AS bid, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ${l2sq("e.v", "c.cv")}, c.cid) AS rn
        FROM slb e CROSS JOIN slc$iters c) WHERE rn = 1),
      slcf AS MATERIALIZED (SELECT cid, (cv::REAL[])::DOUBLE[] AS cvf FROM slc$iters),
      slqc AS MATERIALIZED (SELECT qid, cid FROM (
        SELECT q.qid, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY sqrt(${l2sq("q.qv", "c.cvf")}), c.cid) AS rn
        FROM qq q CROSS JOIN slcf c) WHERE rn <= (SELECT tl FROM sltl)),
      sd3 AS MATERIALIZED (SELECT qid, bid FROM (
        SELECT s.qid, a.bid,
               ROW_NUMBER() OVER (PARTITION BY s.qid
                 ORDER BY ${Vec.sqlMetricDist(metric, "q.qv", "b.v")}, a.bid) AS rn
        FROM slqc s JOIN slasn a ON a.cid = s.cid
             JOIN qq q ON q.qid = s.qid JOIN bb b ON b.bid = a.bid)
        WHERE rn <= (SELECT ents FROM rknobs))"""
  }
}
