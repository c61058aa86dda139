package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Family F continued: as-of enrichment and the salted (skew-proof)
  * aggregation pattern. */
object Relational2 {

  /** As-of join (same-table form): each purchase event picks up the
    * timestamp of the latest prior signup by the same user — one
    * window pass, no range-join explosion. At scale this is the
    * standard "latest dimension state as of event time" enrichment. */
  val qAsofEnrich = Q(
    "q_asof_enrich",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("signup_us",
          max(when(col("event_type") === "signup", col("us"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          ((col("us") - col("signup_us")).cast("double") / lit(1000000.0)).as("sec_since_signup"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts::TIMESTAMP) AS us
        FROM events),
      w AS (
        SELECT user_id, event_id, event_type, us,
               MAX(CASE WHEN event_type = 'signup' THEN us END)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_us
        FROM e)
      SELECT user_id, event_id,
             CAST(us - signup_us AS DOUBLE) / 1000000.0 AS sec_since_signup
      FROM w
      WHERE event_type = 'purchase'
      ORDER BY user_id, event_id
    """))

  /** Two-phase salted aggregation: pre-aggregate on (key, salt) then
    * merge per key — the skew pattern for heavy-hitter keys (one hot
    * key spreads over 8 reducers before the tiny final merge). Exact
    * DECIMAL partials make the result identical to the direct GROUP BY
    * the oracle runs. */
  val qSkewSalted = Q(
    "q_skew_salted",
    (s, dir) => {
      Tables.events(s, dir)
        .withColumn("salt", pmod(col("event_id"), lit(8)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("n_part"),
          sum(col("value").cast(DecimalType(25, 6))).as("sum_part"))
        .groupBy(col("event_type"))
        .agg(sum(col("n_part")).as("n"),
          sum(col("sum_part")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """))

  val qs: Seq[Q] = Seq(qAsofEnrich, qSkewSalted)
}
