package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-3 relational family (the oracle
  * proves value-exactness; these pin the shapes that survive rescale). */
class Relational3Spec extends AnyFunSuite with SharedSpark {

  test("q_rollup grand total row equals the table count") {
    val df = queries.Relational3.qRollup.fn(spark, sf)
    val total = df.filter(col("rf") === "ALL" && col("ls") === "ALL")
      .select(col("n")).head().getLong(0)
    val n = Tables.t(spark, sf, "lineitem").count()
    assert(total === n)
    // subtotals per returnflag sum to the grand total
    val sub = df.filter(col("rf") =!= "ALL" && col("ls") === "ALL")
      .agg(sum(col("n"))).head().getLong(0)
    assert(sub === n)
  }

  test("q14_promo percentage is a true share of total revenue") {
    val r = queries.Relational3.q14Promo.fn(spark, sf).head()
    val pct = r.getDouble(0); val promo = r.getDouble(1); val tot = r.getDouble(2)
    assert(pct >= 0.0 && pct <= 100.0)
    assert(math.abs(pct - promo * 100.0 / tot) < 1e-9)
  }

  test("q18_big_orders only emits orders above the quantity threshold") {
    val df = queries.Relational3.q18BigOrders.fn(spark, sf)
    assert(df.filter(col("total_qty") <= 140).count() === 0)
  }

  test("q4_priority counts distinct orders, not lateness events") {
    // semi-join semantics: per-priority counts sum to at most the
    // quarter's order count (each order counted once however many
    // late lines it has)
    val perPriority = queries.Relational3.q4Priority.fn(spark, sf)
      .agg(sum(col("order_count"))).head().getLong(0)
    val quarter = Tables.t(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01 00:00:00").cast("timestamp")).count()
    assert(perPriority <= quarter)
  }

  test("q_events_json extracts every row's k field") {
    val df = queries.Relational3.qEventsJson.fn(spark, sf)
    val n = df.agg(sum(col("n"))).head().getLong(0)
    assert(n === Tables.t(spark, sf, "events").count())
  }
}
