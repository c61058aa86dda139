package graft

import graft.functions.TextFns._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round 15: langScored's stopword ratios run through the one-pass
  * LangRatiosExpr kernel. Contract: per-language values BIT-IDENTICAL
  * to the ratioIn HOF chain (`size(filter(words(lower(text)), x ∈
  * set)) * 1.0 / size(words)`, 0.0 when empty) — on real corpus text
  * and on the edge rows (empty string, whitespace-only, multi-space
  * runs, NULL text, shared stopwords across languages, zh unicode). */
class LangRatiosSpec extends AnyFunSuite {

  private lazy val spark = SharedSpark.session

  private def ratios(df: org.apache.spark.sql.DataFrame) = {
    val langs = stopwords.keys.toSeq.sorted
    val bc = org.apache.spark.sql.graftbridge.Bridge
    val rr = bc.column(graft.functions.LangRatiosExpr(bc.expr(lower(col("text")))))
    val kernel = df.select(Seq(col("doc_id"), rr.as("rr")): _*)
      .select(col("doc_id") +: langs.zipWithIndex.map { case (l, i) =>
        element_at(col("rr"), i + 1).as(s"r_$l") }: _*)
    val w = words(lower(col("text")))
    val hof = df.select(col("doc_id") +:
      langs.map(l => ratioIn(w, stopwords(l)).as(s"r_$l")): _*)
    (kernel.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq,
      hof.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq)
  }

  test("kernel == ratioIn HOFs on the sf0.001 corpus") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val (k, h) = ratios(docs)
    assert(k.nonEmpty && k == h)
  }

  test("kernel == ratioIn HOFs on edge rows") {
    import spark.implicits._
    val rows = Seq(
      (1L, "the la de und 的 the"),        // shared stopwords hit several languages
      (2L, ""),                            // no tokens
      (3L, "    "),                        // whitespace only
      (4L, null.asInstanceOf[String]),     // NULL text
      (5L, "THE  A   OF"),                 // case fold + multi-space runs
      (6L, "的 是 xyz"),                    // zh multi-byte
      (7L, "word"),                        // no stopword at all
      (8L, " leading and trailing "))      // boundary spaces
    val docs = rows.toDF("doc_id", "text")
    val (k, h) = ratios(docs)
    assert(k == h)
    // NULL row mirrors when(size>0,..).otherwise(0.0): all-0.0
    val nullRow = k.find(_.head == 4L).get
    assert(nullRow.tail.forall(_ == 0.0))
  }
}
