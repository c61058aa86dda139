package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every catalog query runs at sf0.001 and yields rows; entry smoke. */
class CatalogSmokeSpec extends AnyFunSuite with SharedSpark {

  test("SparkEntry.entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for (q <- Catalog.all) {
    test(s"${q.name} yields rows at sf0.001") {
      assert(q.fn(spark, sf).count() > 0, q.name)
    }
  }
}
