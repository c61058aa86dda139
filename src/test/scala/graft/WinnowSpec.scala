package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** WinnowFingerprint kernel == the HOF md5-chain form, bit for bit. */
class WinnowSpec extends AnyFunSuite with SharedSpark {

  private def hofForm(df: org.apache.spark.sql.DataFrame) = {
    val hashes = transform(
      sequence(lit(1), greatest(length(col("text")) - 7, lit(0))),
      i => md5(col("text").substr(i, lit(8))))
    df.select(col("doc_id"), hashes.as("h")).cache()
      .select(col("doc_id"),
        size(col("h")).as("n_grams"),
        array_min(col("h")).as("min_fp"),
        size(array_distinct(transform(
          sequence(lit(1), greatest(size(col("h")) - 3, lit(0))),
          j => array_min(slice(col("h"), j, lit(4)))))).as("n_fp"))
  }

  private def kernelForm(df: org.apache.spark.sql.DataFrame) = {
    val wf = Bridge.column(functions.WinnowFingerprint(Bridge.expr(col("text"))))
    df.select(col("doc_id"), wf.as("w"))
      .select(col("doc_id"),
        col("w").getField("n_grams").as("n_grams"),
        col("w").getField("min_fp").as("min_fp"),
        col("w").getField("n_fp").as("n_fp"))
  }

  test("kernel matches the HOF form on the corpus") {
    val docs = Tables.t(spark, sf, "documents")
    assert(kernelForm(docs).exceptAll(hofForm(docs)).isEmpty)
    assert(hofForm(docs).exceptAll(kernelForm(docs)).isEmpty)
  }

  test("kernel matches the HOF form on multi-byte (code-point) text") {
    import spark.implicits._
    // ≥11 chars keeps the HOF form inside its defined region
    // (sequence(1,0) descends below that — lesson 10)
    val docs = Seq(
      (1L, "这是一个中文测试句子，包含标点。"),
      (2L, "mixed ascii 和中文 characters here"),
      (3L, "aaaaaaaaaaaaaaaaaaaaaa"),
      (4L, "0123456789abcdef0123456789abcdef")).toDF("doc_id", "text")
    assert(kernelForm(docs).exceptAll(hofForm(docs)).isEmpty)
    assert(hofForm(docs).exceptAll(kernelForm(docs)).isEmpty)
  }

  test("CharGramsExpr matches the HOF charGrams form, order included") {
    import spark.implicits._
    // ≥3 chars: below that the HOF's sequence(1, 0) descends (lesson
    // 10) — kernel-only edge semantics are pinned separately below
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text")).as("t"))
      .union(Seq((9000001L, "中文字符混合 abc 中文"),
        (9000003L, "aaaa")).toDF("doc_id", "t"))
    val hof = docs.select(col("doc_id"), functions.TextFns.charGrams(col("t"), 3).as("g"))
    val kernel = docs.select(col("doc_id"),
      Bridge.column(functions.CharGramsExpr(Bridge.expr(col("t")), 3)).as("g"))
    // order-sensitive compare: first-occurrence order must match too
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty)
    // short/empty strings: no grams (DuckDB range semantics)
    val short = Seq((1L, ""), (2L, "ab")).toDF("doc_id", "t")
      .select(Bridge.column(functions.CharGramsExpr(Bridge.expr(col("t")), 3)).as("g"))
      .collect()
    assert(short.forall(_.getSeq[String](0).isEmpty))
  }

  test("WordShinglesExpr matches the HOF wordShingles form, order included") {
    import spark.implicits._
    // ≥5 words: below that the HOF's sequence(1, 0) descends into an
    // element_at(w, 0) error (lesson 10) — kernel edges pinned below
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text")).as("t"))
      .union(Seq((9000001L, "a b c d e f g"),
        (9000003L, "многоязычный текст с пробелами здесь да")).toDF("doc_id", "t"))
    val w = functions.TextFns.words(col("t"))
    val hof = docs.select(col("doc_id"), functions.TextFns.wordShingles(w, 5).as("sh"))
    val kernel = docs.select(col("doc_id"),
      Bridge.column(functions.WordShinglesExpr(Bridge.expr(w), 5)).as("sh"))
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty)
    // short/empty inputs: no shingles (DuckDB range semantics)
    val short = Seq((1L, ""), (2L, "x y")).toDF("doc_id", "t")
      .select(Bridge.column(functions.WordShinglesExpr(
        Bridge.expr(functions.TextFns.words(col("t"))), 5)).as("sh"))
      .collect()
    assert(short.forall(_.getSeq[String](0).isEmpty))
  }

  test("short-text edges: clean oracle semantics") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "short"), (3L, "12345678"), (4L, "1234567890"))
      .toDF("doc_id", "text")
    val r = kernelForm(docs).orderBy(col("doc_id")).collect()
    // no grams at all
    assert(r(0).getInt(1) === 0 && r(0).isNullAt(2) && r(0).getInt(3) === 0)
    assert(r(1).getInt(1) === 0 && r(1).isNullAt(2) && r(1).getInt(3) === 0)
    // grams but fewer than a window
    assert(r(2).getInt(1) === 1 && !r(2).isNullAt(2) && r(2).getInt(3) === 0)
    assert(r(3).getInt(1) === 3 && r(3).getInt(3) === 0)
    // null text propagates
    val n = kernelForm(Seq((1L, Option.empty[String])).toDF("doc_id", "text")).collect()
    assert(n(0).isNullAt(1) || n(0).getInt(1) === 0) // struct null when text null
  }
}
