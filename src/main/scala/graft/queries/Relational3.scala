package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Family F widened (round 3): the rest of the TPC-H-shaped analytics
  * surface expressible over the driver's tables, plus rollup and
  * semi-structured (JSON) extraction — the query shapes a 100 TB
  * warehouse actually runs daily.
  *
  * Scale notes per query are inline; the common rules: every filter
  * sits on the parquet scan (pushdown), every dimension join is
  * broadcast, every aggregate is partial (map-side combine), and no
  * window runs unpartitioned. Money math is DECIMAL-exact then one
  * cast to double (SURVEY §6 determinism contract).
  */
object Relational3 {

  private def dec(c: org.apache.spark.sql.Column, scale: Int) =
    c.cast(DecimalType(25, scale))

  /** TPC-H Q6-flavored forecast-revenue: pure scan+filter+agg — the
    * pushdown showcase. At 100 TB this reads only the 4 referenced
    * columns and the date filter prunes row groups. */
  val q6Forecast = Q(
    "q6_forecast",
    (s, dir) => {
      Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          sum(dec(col("l_extendedprice") * col("l_discount"), 6))
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
             COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24
    """))

  /** TPC-H Q4-flavored order-priority check: orders from one quarter
    * with at least one late line (shipped >60 days after the order
    * date), counted per priority. The EXISTS compiles to a LEFT SEMI
    * join on orderkey — at scale the semi join shuffles each side once
    * and never duplicates orders. */
  val q4Priority = Q(
    "q4_priority",
    (s, dir) => {
      val ord = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      val li = Tables.t(s, dir, "lineitem")
      ord.join(li,
          ord("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """))

  /** TPC-H Q5-flavored local-supplier volume: revenue per nation for
    * one region and year, with the local-supplier constraint
    * (c_nationkey = s_nationkey). lineitem⨝orders shuffles on
    * orderkey; customer, supplier, nation, region are all broadcast
    * dims — ONE big-table shuffle total. */
  val q5Region = Q(
    "q5_region",
    (s, dir) => {
      val cust = Tables.t(s, dir, "customer")
      val ord = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      val li = Tables.t(s, dir, "lineitem")
      val supp = Tables.t(s, dir, "supplier")
      val nat = Tables.t(s, dir, "nation")
      val reg = Tables.t(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name
    """))

  /** TPC-H Q10-flavored returned-item report: top-20 customers by
    * revenue lost to returns in one quarter. The only shuffle of big
    * data is lineitem⨝orders; customer/nation broadcast; the top-20
    * plans as TakeOrderedAndProject (no global sort). */
  val q10Returns = Q(
    "q10_returns",
    (s, dir) => {
      val ord = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      val li = Tables.t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val cust = Tables.t(s, dir, "customer")
      val nat = Tables.t(s, dir, "nation")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""
      SELECT c_custkey, c_name, n_name,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20
    """))

  /** TPC-H Q14-flavored promo revenue share: percentage of one month's
    * revenue from PROMO parts. part is broadcast; the conditional
    * numerator and the total come out of ONE aggregation pass. */
  val q14Promo = Q(
    "q14_promo",
    (s, dir) => {
      val li = Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      val part = Tables.t(s, dir, "part")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO",
            dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6))
            .otherwise(dec(lit(0.0), 6))).cast("double").as("promo_revenue"),
          sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6))
            .cast("double").as("total_revenue"))
        .select(
          (col("promo_revenue") * lit(100.0) / col("total_revenue")).as("promo_pct"),
          col("promo_revenue"), col("total_revenue"))
    },
    Some("""
      WITH a AS (
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))
                             ELSE CAST(0.0 AS DECIMAL(25,6)) END) AS DOUBLE) AS promo_revenue,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00')
      SELECT promo_revenue * 100.0 / total_revenue AS promo_pct,
             promo_revenue, total_revenue
      FROM a
    """))

  /** TPC-H Q18-flavored large-volume orders: orders whose total
    * quantity exceeds 140, with customer detail. The HAVING prunes on
    * the pre-join aggregate, so the expensive join sees only the few
    * qualifying orderkeys (at 100 TB: aggregate first, join the
    * survivors — never join-then-filter). */
  val q18BigOrders = Q(
    "q18_big_orders",
    (s, dir) => {
      val big = Tables.t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"), 4)).cast("double").as("total_qty"))
        .filter(col("total_qty") > 140)
      val ord = Tables.t(s, dir, "orders")
      val cust = Tables.t(s, dir, "customer")
      big.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("date").cast("string").as("orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""
      WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) > 140)
      SELECT c_custkey, c_name, o_orderkey,
             CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
             o_totalprice, total_qty
      FROM big
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100
    """))

  /** Multi-dimensional ROLLUP: (returnflag, linestatus) hierarchy with
    * subtotals and a grand total in one pass — Spark and DuckDB both
    * expand the rollup to grouping sets over ONE shuffle. NULL group
    * keys are coalesced to 'ALL' so ordering is engine-portable. */
  val qRollup = Q(
    "q_rollup",
    (s, dir) => {
      Tables.t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"), 4)).cast("double").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))
    },
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             COALESCE(l_linestatus, 'ALL') AS ls,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY rf, ls
    """))

  /** Semi-structured extraction: events.props is a JSON string; pull a
    * typed field out and aggregate it per event type. Pure per-row map
    * + one groupBy — the standard "parse the JSON sidecar" pipeline
    * step, exact because the extracted field is integer. */
  val qEventsJson = Q(
    "q_events_json",
    (s, dir) => {
      Tables.t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          count(when(col("k") >= 50, lit(1))).as("n_hi"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
                        THEN 1 END) AS n_hi
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """))

  val qs: Seq[Q] = Seq(q6Forecast, q4Priority, q5Region, q10Returns, q14Promo,
    q18BigOrders, qRollup, qEventsJson)
}
