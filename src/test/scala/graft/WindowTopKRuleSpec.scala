package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WindowTopKRule: must (a) fire on the row_number-top-k idiom and
  * remove the WindowExec, (b) preserve results exactly, (c) bail out
  * on non-matching windows. */
class WindowTopKRuleSpec extends AnyFunSuite {

  // Rule activated on an isolated session via the public
  // experimental.extraOptimizations hook — the spark.sql.extensions
  // config route only applies when the session owns context creation
  // (exercised by ExtensionsSpec / real deployments); a shared-context
  // test JVM can't rely on it.
  private lazy val spark: SparkSession = {
    val s = SharedSpark.session.newSession()
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ graft.plans.WindowTopKRule
    s
  }

  private def topnDf(s: SparkSession): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.t(s, "/root/testdata/sf0.001", "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
  }

  test("rule fires: no Window in optimized plan, results identical") {
    val df = topnDf(spark)
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert(!optimized.contains("Window"), s"rule did not fire:\n$optimized")
    assert(optimized.contains("topk_pairs"), optimized)

    // reference result from a rule-free session on the same data
    val plain = SharedSpark.session
    val expected = topnDf(plain).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("rule fires on unpartitioned global top-1 (rn = 1)") {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    val df = Tables.t(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    assert(!df.queryExecution.optimizedPlan.toString().contains("Window"))
    val r = df.head()
    val expected = Tables.t(spark, "/root/testdata/sf0.001", "customer")
      .orderBy(col("c_acctbal"), col("c_custkey")).select(col("c_custkey")).head().getLong(0)
    assert(r.getLong(0) == expected)
  }

  test("rule bails out when extra columns would be lost") {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val df = Tables.t(spark, "/root/testdata/sf0.001", "customer")
      // c_name is neither part, score, nor id → must NOT rewrite
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"), col("c_name"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
    assert(df.queryExecution.optimizedPlan.toString().contains("Window"))
    assert(df.count() == 15)
  }

  test("NULL ordering keys rank identically to the window form") {
    // ASC NULLS FIRST so the NULL-scored rows land IN the top-k and the
    // pool's carried-NULL path (not a sentinel) is what the output shows
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey"))
    def run(s: SparkSession) = {
      val b = Tables.t(s, "/root/testdata/sf0.001", "customer")
        .select(col("c_mktsegment"), col("c_custkey"),
          when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_acctbal"))
            .as("c_acctbal"))
      b.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 4)
        .collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(2)), r.getInt(3))).toSet
    }
    val withRule = run(spark)
    val without = run(SharedSpark.session)
    assert(withRule == without && withRule.nonEmpty)
    // NULL scores must come back as NULL, not a sentinel
    assert(withRule.exists(_._3.isEmpty))
  }

  test("rule bails out on non-row_number windows") {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val df = Tables.t(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
    assert(df.queryExecution.optimizedPlan.toString().contains("Window"))
  }
}
