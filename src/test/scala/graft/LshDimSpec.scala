package graft

import graft.operators.Lsh
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The plane bank is dim-parametrized (r9 verdict item 7 — the
  * reference's t2i corpus is 200d). Contract: (a) bandPlanesFor(64)
  * IS the historical bank value-for-value, so every test-SF hash and
  * oracle literal is untouched; (b) at any other dim the bank spans
  * the full width and LshBandKeys hashes every component — exact
  * duplicates still collide in every band, and a vector pair differing
  * ONLY past component 64 gets distinguishable keys (the 64-prefix
  * clipping this replaces could not see the difference). */
class LshDimSpec extends AnyFunSuite {

  private lazy val spark = SharedSpark.session

  test("bandPlanesFor(64) reproduces the historical bank exactly") {
    assert(Lsh.bandPlanesFor(64) == Lsh.bandPlanes)
    // memoized: same instance back
    assert(Lsh.bandPlanesFor(200) eq Lsh.bandPlanesFor(200))
    assert(Lsh.bandPlanesFor(200).forall(_.length == 200))
    // same stream, different depth: plane 0 of the 200d bank starts
    // with the same draws as plane 0 of the 64d bank
    assert(Lsh.bandPlanesFor(200).head.take(64) == Lsh.bandPlanes.head)
  }

  test("200d keys: exact dups collide, tail-only differences are seen") {
    val bc = org.apache.spark.sql.graftbridge.Bridge
    import spark.implicits._
    // v0 == v1 exactly; v2 differs from v0 only in components 65..200
    val v0 = Array.tabulate(200)(i => math.sin(i * 0.7).toFloat)
    val v2 = v0.clone()
    (64 until 200).foreach(i => v2(i) = -v0(i))
    val df = Seq((0L, v0.toSeq), (1L, v0.toSeq), (2L, v2.toSeq))
      .toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>").as("embedding"))
    def keys(dim: Int) = df.select(col("id"),
        bc.column(graft.functions.LshBandKeys(bc.expr(col("embedding")),
          Lsh.PairWidePlanes, dim = dim)).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val k200 = keys(200)
    assert(k200(0L) == k200(1L), "exact duplicates must share every band key")
    assert(k200(0L) != k200(2L), "a tail-only difference must be visible at dim=200")
    // the clipped 64-prefix hash (dim=64 bank on 200d input) cannot
    // distinguish them — the failure mode the parametrization removes
    val k64 = keys(64)
    assert(k64(0L) == k64(2L))
  }
}
