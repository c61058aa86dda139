package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 data-sized rule invariants (pure integer functions — the
  * oracle CTEs compute the same CASE ladders, so the values pinned
  * here are the cross-engine contract):
  *  - every rule returns its r9-validated value at test SF / 1M so no
  *    oracle hash can move;
  *  - the 10M values are the round-10 operating point (richK 96,
  *    traversal degree 48, nprobe 32 at 1024 cells).
  */
class DataSizedRulesSpec extends AnyFunSuite {

  test("pqMFor targets subspace width: 8 dims through 1M, 4 beyond") {
    assert(queries.VectorQs3.pqMFor(10000L, 64) === 8)
    assert(queries.VectorQs3.pqMFor(1000000L, 64) === 8)
    assert(queries.VectorQs3.pqMFor(1000001L, 64) === 16)
    assert(queries.VectorQs3.pqMFor(10000000L, 64) === 16)
    // 200d (the reference's t2i dimensionality): the count-targeted
    // rule's m=10 handed each codebook a 20-dim subspace (measured
    // recall 0.207 at 2M); width-targeted → 50 subspaces of 4d
    assert(queries.VectorQs3.pqMFor(2000000L, 200) === 50)
    assert(queries.VectorQs3.pqMFor(500000L, 200) === 25)
    // non-divisor dims snap DOWN to the nearest divisor
    assert(queries.VectorQs3.pqMFor(2000000L, 100) === 25)
    assert(queries.VectorQs3.pqMFor(10000L, 6) === 1)
  }

  test("pqRerankFor: n/500 in [50, 2000] - a memory contract, not a tuning") {
    assert(queries.VectorQs3.pqRerankFor(10000L) === 50)
    assert(queries.VectorQs3.pqRerankFor(1000000L) === 2000)
    assert(queries.VectorQs3.pqRerankFor(10000000L) === 2000)
  }

  test("richKFor: 48 through 1M, 96 beyond (oracle rkn CASE)") {
    assert(queries.HnswQs.richKFor(1000L) === 48)
    assert(queries.HnswQs.richKFor(1000000L) === 48)
    assert(queries.HnswQs.richKFor(1000001L) === 96)
    assert(queries.HnswQs.richKFor(10000000L) === 96)
  }

  test("routedEfFor: 16 through 10.24M (r11 union-graph sweep), oracle rknobs.ef CASE") {
    assert(queries.HnswQs3.routedEfFor(1000L) === 16)
    assert(queries.HnswQs3.routedEfFor(1000000L) === 16)
    assert(queries.HnswQs3.routedEfFor(10000000L) === 16)
    assert(queries.HnswQs3.routedEfFor(10240000L) === 16)
    assert(queries.HnswQs3.routedEfFor(10240001L) === 32)
    assert(queries.HnswQs3.routedEfFor(40960000L) === 32)
    assert(queries.HnswQs3.routedEfFor(100000000L) === 64)
    assert(queries.HnswQs3.routedEfFor(655360000L) === 128)
    assert(queries.HnswQs3.routedEfFor(1000000000L) === 256)
  }

  test("routedRoundsFor: 5 through 10M, +2/decade (r11 union-graph sweep), oracle rknobs.rr CASE") {
    assert(queries.HnswQs3.routedRoundsFor(1000L) === 5)
    assert(queries.HnswQs3.routedRoundsFor(1000000L) === 5)
    assert(queries.HnswQs3.routedRoundsFor(10000000L) === 5)
    assert(queries.HnswQs3.routedRoundsFor(10000001L) === 7)
    assert(queries.HnswQs3.routedRoundsFor(100000000L) === 7)
    assert(queries.HnswQs3.routedRoundsFor(1000000000L) === 9)
    assert(queries.HnswQs3.routedRoundsFor(100000000000L) === 13)
  }

  test("nprobeFor: smallest power of two with p*p >= cells, floor 4 (oracle bnp/snp)") {
    assert(graft.operators.Ivf.nprobeFor(16) === 4)
    assert(graft.operators.Ivf.nprobeFor(64) === 8)
    assert(graft.operators.Ivf.nprobeFor(256) === 16)
    assert(graft.operators.Ivf.nprobeFor(1024) === 32)
    assert(graft.operators.Ivf.nprobeFor(65536) === 256)
    // nprobe never exceeds the cell count (tiny quantizers)
    (Seq(16, 32, 64) ++ Seq(128)).foreach { c =>
      assert(graft.operators.Ivf.nprobeFor(c) <= c)
    }
  }

  test("cells/nprobe composition at the measured scale points") {
    // test SF (~4k base): 16 cells, nprobe 4 — every sf hash unchanged
    assert(graft.operators.Ivf.cellsFor(4000L) === 16)
    assert(graft.operators.Ivf.nprobeFor(16) === 4)
    // 1M: 256 cells, nprobe 16 (the measured 0.859-recall 1M point)
    assert(graft.operators.Ivf.cellsFor(1000000L) === 256)
    assert(graft.operators.Ivf.nprobeFor(256) === 16)
    // 10M: 1024 cells, nprobe 32
    assert(graft.operators.Ivf.cellsFor(10000000L) === 1024)
    assert(graft.operators.Ivf.nprobeFor(1024) === 32)
  }
}
