package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dev-profiling spec (fast at sf0.001; run manually against sf0.1 to
  * localize cost): times each stage of the minhash pipeline. */
class ProfileMinhashSpec extends AnyFunSuite with SharedSpark {

  test("minhash pipeline stages complete and report times") {
    val dir = sys.env.getOrElse("PROFILE_SF", sf)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    import graft.functions.TextFns._
    val docs = Tables.t(spark, dir, "documents")
    time("0 count")(docs.count())
    val sh = docs.select(col("doc_id"), wordShingles(words(col("text")), 3).as("sh"))
    time("1 shingles")(sh.count())
    val hs = sh.withColumn("hs", shingleHashes(col("sh")))
    time("2 md5-hashes")(hs.select(col("doc_id"), col("hs")).count())
    val sigCols = col("doc_id") +: (0 until 9).map(j => minhash(col("hs"), j).as(s"s$j"))
    val sigs = hs.select(sigCols: _*)
    time("3 signatures")(sigs.count())
    spark.catalog.clearCache()
  }
}
