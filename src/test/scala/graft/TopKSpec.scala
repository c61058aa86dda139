package graft

import graft.operators.{Scored, TopK, TopKAgg}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class TopKSpec extends AnyFunSuite with SharedSpark {

  /** Reference implementation: full sort then take k. */
  private def bySort(xs: Seq[Scored], k: Int, asc: Boolean): Seq[Scored] = {
    val ord = if (asc) xs.sortBy(s => (s.score, s.id))
              else xs.sortBy(s => (-s.score, s.id))
    ord.take(k)
  }

  test("TopKAgg matches sort-based top-k under any merge split (ties included)") {
    val rnd = new Random(7)
    for (trial <- 1 to 50) {
      val n = 1 + rnd.nextInt(60)
      val k = 1 + rnd.nextInt(12)
      val asc = rnd.nextBoolean()
      // duplicate scores on purpose → tie-break by id must hold
      val xs = Seq.fill(n)(Scored(rnd.nextInt(8).toDouble, rnd.nextInt(1000).toLong))
        .distinctBy(_.id)
      val agg = new TopKAgg(k, asc)
      // random split + merge order
      val (l, r) = xs.splitAt(rnd.nextInt(xs.length + 1))
      val bufL = l.foldLeft(agg.zero)(agg.reduce)
      val bufR = r.foldLeft(agg.zero)(agg.reduce)
      val merged = if (rnd.nextBoolean()) agg.merge(bufL, bufR) else agg.merge(bufR, bufL)
      assert(agg.finish(merged) == bySort(xs, k, asc), s"trial $trial asc=$asc k=$k")
    }
  }

  test("exact-duplicate (score, id) candidates collapse to one entry") {
    val agg = new TopKAgg(5, false)
    val xs = Seq(Scored(2.0, 7L), Scored(2.0, 7L), Scored(1.0, 3L), Scored(2.0, 7L))
    val out = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    assert(out == Seq(Scored(2.0, 7L), Scored(1.0, 3L)))
    // also across a merge boundary
    val a = Seq(Scored(2.0, 7L)).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(Scored(2.0, 7L), Scored(0.5, 1L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(a, b)) == Seq(Scored(2.0, 7L), Scored(0.5, 1L)))
  }

  test("perGroup produces dense 1-based ranks per group") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.9), (2L, 10L, 0.1))
      .toDF("g", "id", "score")
    val out = TopK.perGroup(df, "g", "id", "score", 2, asc = false)
      .orderBy("g", "rnk").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq((1L, 1, 11L), (1L, 2, 12L), (2L, 1, 10L)))
  }
}
