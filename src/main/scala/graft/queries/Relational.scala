package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Family F (SURVEY §2F): the relational/analytics substrate.
  *
  * Determinism: double measures are summed exactly as DECIMAL(25,s)
  * then cast once to double — identical in DuckDB — so hash-compare
  * holds despite shuffle-order-dependent float addition (SURVEY §6).
  * Scale: filters sit directly on the parquet scan (pushdown), the
  * small sides of joins are broadcast, aggregates are partial (map-side
  * combine) by construction of groupBy+sum.
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column, scale: Int) =
    c.cast(DecimalType(25, scale))

  /** TPC-H Q1-flavored pricing summary. */
  val q1Agg = Q(
    "q1_agg",
    (s, dir) => {
      val li = Tables.t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"), 4)).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"), 4)).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6))
            .cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6))
            .cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"), 4)).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_discount"), 6)).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """))

  /** TPC-H Q3-flavored: unshipped-revenue top-10. customer is broadcast
    * (small dim); lineitem⨝orders shuffles on orderkey. */
  val q3Join = Q(
    "q3_join",
    (s, dir) => {
      val cust = Tables.t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val li = Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10
    """))

  /** Rank-per-group window: top-3 customers by balance per segment.
    * No arithmetic on doubles → raw values hash-match. */
  val qTopnWindow = Q(
    "q_topn_window",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.t(s, dir, "customer")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("c_mktsegment"), col("rnk"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rnk"))
    },
    Some("""
      SELECT c_mktsegment, CAST(rnk AS INTEGER) AS rnk, c_custkey, c_acctbal FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rnk
        FROM customer) t
      WHERE rnk <= 3
      ORDER BY c_mktsegment, rnk
    """))

  /** Event-time tumbling 1h window aggregation (batch form of the
    * streaming query in graft.streaming). Window start emitted as text
    * to avoid cross-engine timestamp representation drift. */
  val qEventsWindow = Q(
    "q_events_window",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec(col("value"), 6)).cast("double").as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    },
    Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour, event_type
    """))

  /** Gap-based sessionization (30-min inactivity) via lag + running
    * sum — the batch twin of mapGroupsWithState sessions. Works at
    * 100 TB because state is a per-user window, shuffled once on
    * user_id. */
  val qEventsSessions = Q(
    "q_events_sessions",
    (s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("prev_us", lag(unix_micros(col("ts").cast("timestamp")), 1).over(byUser))
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("new_sess",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 30L * 60 * 1000000, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          ((max(col("us")) - min(col("us"))).cast("double") / lit(1000000.0)).as("dur_sec"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS us,
               LAG(epoch_us(ts::TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events),
      s AS (
        SELECT user_id, us,
               -- CAST: DuckDB windowed SUM yields HUGEINT; Spark emits
               -- BIGINT and the driver hashes dtype-sensitively
               CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 30*60*1000000 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM e)
      SELECT user_id, session_id, COUNT(*) AS n_events,
             CAST(MAX(us) - MIN(us) AS DOUBLE) / 1000000.0 AS dur_sec
      FROM s
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id
    """))

  val qs: Seq[Q] = Seq(q1Agg, q3Join, qTopnWindow, qEventsWindow, qEventsSessions)
}
