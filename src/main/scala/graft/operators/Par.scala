package graft.operators

import java.util.concurrent.{Callable, ExecutionException, Executors, ExecutorService, Future}

/** Driver-side concurrency for INDEPENDENT Spark job chains inside one
  * catalog query (optimization guide §2.6: actions are only sequential
  * because driver code calls them sequentially; overlapping independent
  * chains lets the scheduler back-fill idle cores while another chain
  * sits in its driver-side planning/collect gaps).
  *
  * Correctness contract: forked chains must be mutually independent —
  * every value a fork reads that another fork produces must be joined
  * (the returned thunk called) before use, and shared DataFrames must
  * be materialized (localCheckpoint / persisted artifact) BEFORE the
  * fork so no two chains race to compute one lazy plan (lesson 16).
  * Under that contract results are bit-identical to sequential
  * execution: each chain's computation is deterministic and Spark
  * schedules concurrent jobs' tasks without affecting their results.
  * Only measured wall-clocks (the sweep's wall_ms/qps — the catalog's
  * two documented nondeterministic columns) observe the overlap.
  *
  * Pool width bounds concurrent memory (beams/pools in flight):
  * SPARK_GRAFT_QPAR, default 6 — measured on the sweep at 32 cores:
  * 4 → 7.7-8.2 s, 6 → 6.6-7.0 s, 8 → 8.6 s (contention inflates job
  * times past ~6). Scale-independent: chains are |Q|-bounded searches
  * and artifact loads, and the width applies on a cluster exactly as
  * in local mode (the guide's few-jobs-in-flight band).
  */
final class Par {
  private val pool: ExecutorService = Executors.newFixedThreadPool(Par.width)

  /** Submit `body`; returns a join-thunk that rethrows any failure. */
  def fork[T](body: => T): () => T = {
    val f: Future[T] = pool.submit(new Callable[T] { override def call(): T = body })
    () =>
      try f.get()
      catch { case e: ExecutionException => throw e.getCause }
  }

  def shutdown(): Unit = pool.shutdown()
}

object Par {
  def width: Int =
    math.max(1, sys.env.getOrElse("SPARK_GRAFT_QPAR", "6").toInt)

  /** Run a block with a Par instance, always shutting the pool down. */
  def withPool[T](body: Par => T): T = {
    val p = new Par
    try body(p)
    finally p.shutdown()
  }
}
