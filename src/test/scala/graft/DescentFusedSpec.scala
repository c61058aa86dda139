package graft

import graft.operators.Rescore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round 15b: the fully-fused NN-Descent round (Rescore.fusedRound —
  * one map-only job off a broadcast CSR, complete per-node pools, no
  * und⋈und shuffle) must be bit-identical to the keepK join/kernel
  * forms it replaces in knn_descent and approxLayers:
  *  - direct mode == keepK over the given directed pairs (duplicates
  *    collapse, src==dst and absent endpoints dropped);
  *  - NoN mode == keepK(fwd ∪ rev ∪ non) with non = und ⋈ und built
  *    exactly as the operators build it;
  *  - the fused convergence LOOP reproduces the join-form loop's
  *    witness sequence, round count, and final graph exactly.
  */
class DescentFusedSpec extends AnyFunSuite {

  private lazy val spark = SharedSpark.session

  private val dim = 8

  /** Deterministic corpus with exact-duplicate vectors (50/51 copy
    * 10/11) so equal distances force the id tie-break, and NON-
    * contiguous ids (×3 + 1) so idx != id. */
  private def corpus(n: Int = 60) = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val base = if (i == 50) 10 else if (i == 51) 11 else i
      (i.toLong * 3 + 1, Array.tabulate(dim)(d =>
        (math.sin(base * 31 + d * 7) * 100).toFloat))
    }
    rows.toDF("bid", "bv")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("src"), col("rnk").cast("int"), col("dst"), col("dist"))
      .orderBy(col("src"), col("rnk")).collect().map(_.toSeq).toSeq

  /** Map id pairs to idx arrays the way the operators do (drop absent
    * endpoints and src==dst). */
  private def toIdx(ids: Array[Long], ps: Seq[(Long, Long)]): (Array[Int], Array[Int]) = {
    val isrc = Array.newBuilder[Int]; val idst = Array.newBuilder[Int]
    ps.foreach { case (a, b) =>
      val ai = java.util.Arrays.binarySearch(ids, a)
      val bi = java.util.Arrays.binarySearch(ids, b)
      if (ai >= 0 && bi >= 0 && ai != bi) { isrc += ai; idst += bi }
    }
    (isrc.result(), idst.result())
  }

  /** fusedRound output → the keepK result shape (src, rnk, dst, dist). */
  private def fusedCanon(ids: Array[Long], g: Rescore.IdxEdges): Seq[Seq[Any]] = {
    val out = Seq.newBuilder[Seq[Any]]
    var i = 0; var prevSrc = -1; var r0 = 0
    while (i < g.src.length) {
      val sI = g.src(i)
      if (sI != prevSrc) { prevSrc = sI; r0 = 0 }
      r0 += 1
      out += Seq(ids(sI), r0, ids(g.dst(i)), g.dist(i))
      i += 1
    }
    out.result()
  }

  test("direct mode == keepK over the given pairs (dups, self, ties)") {
    import spark.implicits._
    val vecs = corpus()
    val k = 5
    // pairs with triplicates, a self pair, pairs into the duplicate
    // vectors (ties), and an absent endpoint
    val ps = (for (i <- 0 until 60; j <- 0 until 9) yield {
      val dst = (i * 13 + j * 29) % 60
      (i.toLong * 3 + 1, dst.toLong * 3 + 1)
    }) ++ Seq((10L, 10L), (22L, 999L), (22L, 133L), (22L, 133L), (22L, 133L))
    val joinForm = canon(Rescore.keepK(ps.toDF("src", "dst"), vecs,
      n = 1L << 40, dim = dim, k = k))
    val bank = Rescore.broadcastBank(vecs)
    val ids = bank.value.ids
    val (isrc, idst) = toIdx(ids, ps)
    val fused = Rescore.fusedRound(spark, bank,
      Rescore.csrOf(ids.length, isrc, idst), null, k)
    assert(fusedCanon(ids, fused) == joinForm)
  }

  test("NoN mode == keepK(fwd ∪ rev ∪ non) join form") {
    import spark.implicits._
    val vecs = corpus()
    val k = 6
    // a directed, self-loop-free starting graph (knn_descent round
    // input shape): ~4 pseudo-random out-edges per node
    val ps = (for (i <- 0 until 60; j <- 0 until 4) yield {
      val dst = (i * 17 + j * 23 + 5) % 60
      (i.toLong * 3 + 1, dst.toLong * 3 + 1)
    }).filter { case (a, b) => a != b }
    val graph = ps.toDF("src", "dst")
    val fwd = graph.select(col("src"), col("dst"))
    val rev = graph.select(col("dst").as("src"), col("src").as("dst"))
    val und = fwd.union(rev)
    val non = und.select(col("src"), col("dst").as("mid"))
      .join(und.select(col("src").as("mid"), col("dst").as("dst")), Seq("mid"))
      .select(col("src"), col("dst"))
    val joinForm = canon(Rescore.keepK(fwd.union(rev).union(non), vecs,
      n = 1L << 40, dim = dim, k = k))
    val bank = Rescore.broadcastBank(vecs)
    val ids = bank.value.ids
    val (isrc, idst) = toIdx(ids, ps)
    val fused = Rescore.fusedRound(spark, bank,
      Rescore.csrOf(ids.length, isrc, idst),
      Rescore.csrOf(ids.length, idst, isrc), k)
    assert(fusedCanon(ids, fused) == joinForm)
  }

  test("fused convergence loop == join-form loop (witnesses, rounds, final graph)") {
    import spark.implicits._
    val vecs = corpus(80)
    val k = 4
    val maxRounds = 15
    val n = 80L
    // knn_descent's exact pseudo-random init (md5 pmod), in id space
    val emb = vecs
    val init = emb.select(col("bid"))
      .select(col("bid"), explode(sequence(lit(1), lit(k))).as("j"))
      .select(col("bid").as("src"),
        (pmod(conv(substring(md5(concat_ws("-", col("bid"), col("j"))), 1, 15), 16, 10)
          .cast("long"), lit(n)) * 3 + 1).as("dst"))
      .filter(col("src") =!= col("dst"))
      .join(emb.select(col("bid").as("dst")), Seq("dst"), "left_semi")

    // ---- join-form reference loop (knn_descent's, verbatim) ----
    def keepK(cand: org.apache.spark.sql.DataFrame) =
      Rescore.keepK(cand, emb, n = 1L << 40, dim = dim, k = k)
        .select(col("src"), col("dst"), col("dist"))
    def witness(g: org.apache.spark.sql.DataFrame): Long =
      g.agg(sum(floor(col("dist") * 1e6).cast("long"))).head().getLong(0)
    var graph = keepK(init).localCheckpoint()
    val refWitness = Seq.newBuilder[Long]
    var prev = witness(graph)
    refWitness += prev
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val fwd = graph.select(col("src"), col("dst"))
      val rev = graph.select(col("dst").as("src"), col("src").as("dst"))
      val und = fwd.union(rev)
      val non = und.select(col("src"), col("dst").as("mid"))
        .join(und.select(col("src").as("mid"), col("dst").as("dst")), Seq("mid"))
        .select(col("src"), col("dst"))
      graph = keepK(fwd.union(rev).union(non)).localCheckpoint()
      val now = witness(graph)
      refWitness += now
      converged = prev - now < prev / 20000
      prev = now
    }
    val refFinal = graph.orderBy(col("src"), col("dist"), col("dst"))
      .collect().map(_.toSeq).toSeq

    // ---- fused loop (knn_descent's 15b branch, same rules) ----
    val bank = Rescore.broadcastBank(emb)
    val ids = bank.value.ids
    val initP = init.select(col("src"), col("dst")).as[(Long, Long)].collect().toSeq
    val (isrc, idst) = toIdx(ids, initP)
    def wit(e: Rescore.IdxEdges): Long = {
      var acc = 0L; var i = 0
      while (i < e.dist.length) { acc += math.floor(e.dist(i) * 1e6).toLong; i += 1 }
      acc
    }
    var g = Rescore.fusedRound(spark, bank,
      Rescore.csrOf(ids.length, isrc, idst), null, k)
    val gotWitness = Seq.newBuilder[Long]
    var prevF = wit(g)
    gotWitness += prevF
    var convergedF = false
    var roundsF = 0
    while (!convergedF && roundsF < maxRounds) {
      roundsF += 1
      g = Rescore.fusedRound(spark, bank,
        Rescore.csrOf(ids.length, g.src, g.dst),
        Rescore.csrOf(ids.length, g.dst, g.src), k)
      val now = wit(g)
      gotWitness += now
      convergedF = prevF - now < prevF / 20000
      prevF = now
    }
    assert(roundsF == rounds, "fused loop took a different number of rounds")
    assert(gotWitness.result() == refWitness.result(), "witness sequences diverged")
    val gotFinal = (0 until g.src.length)
      .map(i => Seq[Any](ids(g.src(i)), ids(g.dst(i)), g.dist(i)))
      .sortBy(r => (r(0).asInstanceOf[Long], r(2).asInstanceOf[Double],
        r(1).asInstanceOf[Long]))
    assert(gotFinal == refFinal, "final graphs diverged")
  }
}
