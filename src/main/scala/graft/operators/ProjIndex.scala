package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once / load-many lifecycle for the projection-graph artifact:
  * search queries must measure SEARCH, not an index rebuild (the
  * reference builds its index once and benchmarks QPS against the
  * saved artifact, README_RoarGraph.md:19-56; round-1 bench times were
  * dominated by rebuilding the graph inside every search query).
  *
  * The artifact is IndexStore parquet keyed by (algorithm version,
  * source dir) under SPARK_GRAFT_INDEX_DIR (default /tmp/graft_index).
  * Version is bumped whenever the build algorithm changes so a stale
  * on-disk graph can never serve a newer search. At cluster scale the
  * root points at shared storage and the existence check is the same
  * FileSystem call.
  */
object ProjIndex {

  /** bump on any change to ANY artifact build semantics — v3: the r8
    * data-sized quantizer builds train on a stride-sampled subset
    * (Ivf.sizedBuild), and the ivf/pq paths encode only (tag, k,
    * iters), so a pre-stride artifact at the same (k, iters) would
    * silently alias the new build at corpus sizes where the derived k
    * matches but stride > 1. */
  private val Version = "v3"

  /** In-JVM per-path build locks (round 15): catalog queries now run
    * independent sub-chains from a driver thread pool (guide §2.6), so
    * two threads can miss the same cold artifact simultaneously;
    * without a lock both would run the build and race the parquet
    * write. Same-path builds serialize (the second thread re-checks
    * _SUCCESS and loads); distinct paths stay concurrent. Cross-JVM
    * behavior is unchanged (the _SUCCESS guard, as before). */
  private val buildLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def locked[T](p: String)(body: => T): T =
    buildLocks.computeIfAbsent(p, _ => new Object).synchronized(body)

  def graphPath(dir: String): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", "/tmp/graft_index")
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"$root/$Version/$tag/proj_graph"
  }

  /** Load the persisted projection graph, building and saving it first
    * if absent. `build` is only evaluated on a miss. */
  def ensureGraph(s: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    val p = graphPath(dir)
    val hp = new Path(p)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    // _SUCCESS guards against a partially-written artifact being loaded
    locked(p) {
      if (!fs.exists(new Path(hp, "_SUCCESS"))) IndexStore.saveGraph(build, p)
    }
    IndexStore.loadGraph(s, p)
  }

  def ivfPath(dir: String, tag: String, k: Int, iters: Int): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", "/tmp/graft_index")
    val dtag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"$root/$Version/$dtag/ivf_${tag}_k${k}_i$iters"
  }

  /** Load a persisted IVF index (centroids, assigned cells), running
    * the deterministic k-means build only on a miss. Keyed by
    * (scope tag, k, iters) — different query scopes use different
    * quantizers. */
  def ensureIvf(s: SparkSession, dir: String, tag: String, k: Int, iters: Int)(
      build: => (DataFrame, DataFrame)): (DataFrame, DataFrame) = {
    val p = ivfPath(dir, tag, k, iters)
    val hp = new Path(p)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    // guard on the LAST artifact saveIvf writes (cells after centroids):
    // a crash between the two writes must re-trigger the build, not
    // wedge every later run on a half-saved index
    locked(p) {
      if (!fs.exists(new Path(hp, "cells/_SUCCESS"))) {
        val (cents, assigned) = build
        IndexStore.saveIvf(cents, assigned, p)
      }
    }
    IndexStore.loadIvf(s, p)
  }

  /** Versioned artifact path for ensureTable's (dir, tag) under the
    * CURRENT Version. Spec staleness cleanups must resolve paths
    * through this (advice r9): a hardcoded version segment becomes a
    * silent no-op delete the day Version is bumped, and an edited
    * fixture could then replay against a stale same-tag artifact. */
  def tablePath(dir: String, tag: String): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", "/tmp/graft_index")
    val dtag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"$root/$Version/$dtag/$tag"
  }

  /** Generic build-once/load-many parquet table (e.g. the verified
    * dedup pair set — a real pipeline materializes it once and the
    * groups/apply stages read it, they don't re-mine the corpus). */
  def ensureTable(s: SparkSession, dir: String, tag: String)(build: => DataFrame): DataFrame = {
    val p = tablePath(dir, tag)
    val hp = new Path(p)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    locked(p) {
      if (!fs.exists(new Path(hp, "_SUCCESS")))
        build.write.mode("overwrite").parquet(p)
    }
    s.read.parquet(p)
  }

  def pqPath(dir: String, m: Int, ksub: Int, iters: Int): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", "/tmp/graft_index")
    val dtag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"$root/$Version/$dtag/pq_m${m}_k${ksub}_i$iters"
  }

  /** Load a persisted PQ index (codebooks, codes), training/encoding
    * only on a miss. */
  def ensurePq(s: SparkSession, dir: String, m: Int, ksub: Int, iters: Int)(
      build: => (DataFrame, DataFrame)): (DataFrame, DataFrame) = {
    val p = pqPath(dir, m, ksub, iters)
    val hp = new Path(p)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    // guard on codes/_SUCCESS — the LAST write (see ensureIvf)
    locked(p) {
      if (!fs.exists(new Path(hp, "codes/_SUCCESS"))) {
        val (cents, codes) = build
        cents.coalesce(1).write.mode("overwrite").parquet(s"$p/cents")
        codes.write.mode("overwrite").parquet(s"$p/codes")
      }
    }
    (s.read.parquet(s"$p/cents"), s.read.parquet(s"$p/codes"))
  }
}
