package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector algebra as Catalyst higher-order functions — no UDFs, fully
  * codegen-eligible, and bit-for-bit reproducible in the DuckDB oracle.
  *
  * Determinism contract: every reduction is a LEFT FOLD in element
  * order over doubles (`aggregate(zip_with(...))`), mirrored in the
  * oracle by `list_reduce(list_transform(...))`. IEEE double addition
  * applied in the same order on the same values gives identical bits in
  * both engines, so downstream top-k ranks agree exactly.
  *
  * Reference semantics: l2/cosine/inner-product distance & batch forms,
  * /root/reference/hnsw_cosine_status_high.py:26-45 and
  * /root/reference/roargraph_python.py:99-127.
  */
object Vec {

  /** Cast array<float> → array<double> (exact) so all math is in f64. */
  def asD(c: Column): Column = c.cast("array<double>")

  /** Left-fold sum of an array<double> column, seed 0.0. */
  def fsum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x * y))

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  def l2sq(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => (x - y) * (x - y)))

  def l2(a: Column, b: Column): Column = sqrt(l2sq(a, b))

  /** Cosine similarity, written exactly as dot/sqrt(n2a*n2b) — the
    * oracle must use the same association. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Inner-product "distance" as the reference uses for MIPS ranking
    * (larger = closer): roargraph_python.py:106-116 negates; we rank
    * descending instead. */
  def ip(a: Column, b: Column): Column = dot(a, b)

  /** L2-normalize: divide each element by the vector norm. `norm` must
    * be precomputed in a prior projection to avoid re-evaluating the
    * fold per element. */
  def normalized(a: Column, norm: Column): Column =
    transform(a, x => x / norm)

  // ---- codegen'd kernels (VecExprs): same folds, zero allocation ----
  // These accept raw array<float> or array<double> columns — use them
  // in hot paths so parquet float vectors never materialize as new
  // double arrays per pair.

  private def bc = org.apache.spark.sql.graftbridge.Bridge

  def dotFast(a: Column, b: Column): Column =
    bc.column(VecDot(bc.expr(a), bc.expr(b)))

  def l2sqFast(a: Column, b: Column): Column =
    bc.column(VecL2Sq(bc.expr(a), bc.expr(b)))

  def l2Fast(a: Column, b: Column): Column = sqrt(l2sqFast(a, b))

  def cosineFast(a: Column, b: Column): Column =
    bc.column(VecCosine(bc.expr(a), bc.expr(b)))

  /** Σ (a_k−b_k)²/scale_k, one pass, no allocation. */
  def scaledL2Fast(a: Column, b: Column, scale: Column): Column =
    bc.column(VecScaledL2(bc.expr(a), bc.expr(b), bc.expr(scale)))

  // ---- DuckDB oracle fragments (same fold order) ----

  /** DuckDB SQL for the left-fold dot product of two DOUBLE[] exprs. */
  def sqlDot(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i]), (x,y) -> x+y)"

  def sqlNorm2(a: String): String = sqlDot(a, a)

  def sqlL2sq(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> ($a[i]-$b[i])*($a[i]-$b[i])), (x,y) -> x+y)"

  def sqlCosine(a: String, b: String): String =
    s"(${sqlDot(a, b)} / sqrt(${sqlNorm2(a)} * ${sqlNorm2(b)}))"

  // ---- metric-general distance (r7 item 3) ----

  /** Metric DISTANCE (smaller = closer) for the graph build/search
    * operators: l2 → Euclidean; cosine/ip → NEGATED similarity. The
    * negation (instead of 1−x) keeps the ordering identical to the
    * similarity form with no extra float op — and no decimal literal
    * for the oracle mirror to mis-type (lesson 15). */
  def metricDist(metric: String)(a: Column, b: Column): Column = metric match {
    case "l2" => l2Fast(a, b)
    case "cosine" => -cosineFast(a, b)
    case "ip" => -dotFast(a, b)
    case other => throw new IllegalArgumentException(s"unknown metric $other")
  }

  /** DuckDB mirror of metricDist — same folds, same negation. */
  def sqlMetricDist(metric: String, a: String, b: String): String = metric match {
    case "l2" => s"sqrt(${sqlL2sq(a, b)})"
    case "cosine" => s"(-${sqlCosine(a, b)})"
    case "ip" => s"(-${sqlDot(a, b)})"
    case other => throw new IllegalArgumentException(s"unknown metric $other")
  }
}
