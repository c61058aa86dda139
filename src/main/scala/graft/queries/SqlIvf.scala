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
}
