package graft

import graft.functions.Vec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecSpec extends AnyFunSuite with SharedSpark {

  test("dot / l2 / cosine match hand computation") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
      .select(Vec.asD(col("a")).as("a"), Vec.asD(col("b")).as("b"))
    val r = df.select(
      Vec.dot(col("a"), col("b")),
      Vec.l2(col("a"), col("b")),
      Vec.cosine(col("a"), col("b"))).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(27.0)) < 1e-12)
    val cos = 32.0 / math.sqrt(14.0 * 77.0)
    assert(math.abs(r.getDouble(2) - cos) < 1e-12)
  }

  test("normalized vectors have unit norm") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(3.0f, 4.0f))).toDF("v")
      .select(Vec.asD(col("v")).as("v"))
      .withColumn("n2", Vec.norm2(col("v")))
      .select(Vec.normalized(col("v"), sqrt(col("n2"))).as("u"))
      .select(Vec.norm2(col("u")))
    assert(math.abs(df.head().getDouble(0) - 1.0) < 1e-12)
  }
}
