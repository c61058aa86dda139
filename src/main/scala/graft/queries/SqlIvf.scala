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
      s"""${p}e AS (SELECT vec_id, $vexpr AS v FROM embeddings WHERE $where),
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
      ${p}c$t AS (SELECT cid, list((CAST(s AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
        FROM (SELECT cid, dim, SUM(xq) AS s, COUNT(*) AS n FROM ${p}x$t GROUP BY cid, dim)
        GROUP BY cid)"""
    }.mkString(",\n      ")
    s"""$init,
      $rounds,
      ${p}cents AS (SELECT cid, cv FROM ${p}c$iters),
      ${p}assign AS (SELECT vec_id, cid FROM (
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
      s"""${p}e AS (SELECT vec_id, $vexpr AS v FROM embeddings WHERE $where),
      ${p}prm AS (SELECT COUNT(*) AS n FROM ${p}e),
      ${p}kk AS (SELECT COALESCE(
          (SELECT MIN(pw) FROM (SELECT UNNEST(${powers.map(_.toString + "::BIGINT").mkString("[", ", ", "]")}) AS pw), ${p}prm
           WHERE 16 * pw * pw >= n), $kCap) AS k FROM ${p}prm),
      ${p}st AS (SELECT GREATEST(1, n // (128 * k)) AS stride FROM ${p}prm, ${p}kk),
      ${p}t AS (SELECT vec_id, v FROM ${p}e
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
      ${p}c$t AS (SELECT cid, list((CAST(s AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
        FROM (SELECT cid, dim, SUM(xq) AS s, COUNT(*) AS n FROM ${p}x$t GROUP BY cid, dim)
        GROUP BY cid)"""
    }.mkString(",\n      ")
    s"""$init,
      $rounds,
      ${p}cents AS (SELECT cid, cv FROM ${p}c$iters),
      ${p}assign AS (SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ${l2sq("e.v", "c.cv")}, c.cid) AS rn
        FROM ${p}e e CROSS JOIN ${p}cents c) WHERE rn = 1)"""
  }
}
