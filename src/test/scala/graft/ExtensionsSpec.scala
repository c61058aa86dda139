package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: kernels registered through GraftExtensions /
  * GraftFunctions must work from spark.sql and agree with the
  * DataFrame API. (Config-based injection only applies at session
  * creation; the suite shares one session, so register live.) */
class ExtensionsSpec extends AnyFunSuite with SharedSpark {

  test("vec_* functions are callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
               vec_l2sq(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS l,
               vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
               vec_scaled_l2(array(1.0D, 2.0D), array(3.0D, 4.0D), array(2.0D, 2.0D)) AS s
      """).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 8.0)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 4.0)
  }

  test("text kernels are callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT winnow_fingerprint('abcdefghijkl').n_grams AS ng,
               char_grams('abab', 2) AS cg,
               word_shingles(array('a', 'b', 'c'), 2) AS ws,
               size(lsh_band_keys(array(1.0D, -1.0D))) AS nk
      """).head()
    assert(r.getInt(0) == 5)
    assert(r.getSeq[String](1) == Seq("ab", "ba"))
    assert(r.getSeq[String](2) == Seq("a b", "b c"))
    assert(r.getInt(3) == graft.operators.Lsh.PairBands)
  }

  test("extensions class registers the same functions at session build") {
    // the injection list is shared — config path exercises the same builders
    assert(GraftFunctions.all.map(_._1.funcName) ==
      Seq("vec_dot", "vec_l2sq", "vec_cosine", "vec_scaled_l2",
        "winnow_fingerprint", "char_grams", "word_shingles", "lsh_band_keys"))
    val ext = new GraftExtensions
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    ext(holder) // must not throw; builders validated via the SQL test above
  }
}
