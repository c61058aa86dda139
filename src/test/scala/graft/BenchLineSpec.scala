package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses the bench metric line out of the LAST ~2000 chars
  * of stdout (BENCH_r03..r05 recorded parsed:null whenever the line was
  * pushed past that window). This spec pins the contract against the
  * REAL catalog: sbt's "[info] " prefix (7 chars) plus the line plus
  * sbt's trailing "[success] Total time ..." line (~70 chars) must fit
  * with margin — so the line itself stays under 1900. */
class BenchLineSpec extends AnyFunSuite {

  test("metric line fits the driver's 2000-char stdout tail with margin") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst-case realistic magnitudes: three-digit seconds everywhere
    val results = names.map(n => (n, 123.456, true))
    val line = Bench.metricLine(results, 3, "/root/testdata/sf0.1")
    assert(line.length < 1900, s"metric line is ${line.length} chars for ${names.size} queries")
    assert(line.startsWith("{\"metric\":\"total\""))
    assert(line.endsWith("}"))
    assert(!line.contains("\n"))
  }

  test("failed queries are listed and excluded from the total") {
    val line = Bench.metricLine(Seq(("a", 1.0, true), ("b", -1.0, false)), 3, "sf")
    assert(line.contains("\"failed\":[\"b\"]"))
    assert(line.contains("\"value\":1.00"))
    assert(line.contains("\"b\":-1"))
  }
}
