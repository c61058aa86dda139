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

  /** bump on any change to the projection build semantics */
  private val Version = "v2"

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
    if (!fs.exists(new Path(hp, "_SUCCESS"))) IndexStore.saveGraph(build, p)
    IndexStore.loadGraph(s, p)
  }
}
