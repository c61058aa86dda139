package graft.streaming

import graft.functions.Vec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Streaming vector ingestion: a stream of (vec_id, embedding) rows is
  * routed to IVF cells by a stream-static broadcast join against the
  * (small) centroid table — the continuous-ingestion half of the
  * reference's add_item/insert path, with the batch engine owning
  * periodic centroid refresh/compaction.
  *
  * Scale shape: the static side is k centroids (broadcast); assignment
  * is a stateless per-row map (VecL2Sq kernel + min-struct argmin), so
  * the stream needs no shuffle and no state store — cell files append
  * partitioned by cid, probes prune partitions (IndexStore layout).
  */
object VectorIngest {

  /** @param stream streaming DataFrame (vec_id: long, embedding: array<float>)
    * @param cents  static centroid table (cid: long, cv: array<double>)
    * @return streaming DataFrame (vec_id, embedding, cid)
    */
  def assignCells(stream: DataFrame, cents: DataFrame): DataFrame = {
    // stateless per-row argmin: streaming append mode forbids the
    // groupBy a join-then-min would need, so the k centroids pre-pivot
    // into ONE struct-array row (static side) and the argmin runs
    // inside a single projection per streamed row — no shuffle, no
    // state store.
    val centArr = cents
      .agg(collect_list(struct(col("cid").as("cid"), col("cv").as("cv"))).as("cs"))
    stream.crossJoin(broadcast(centArr))
      .select(col("vec_id"), col("embedding"),
        array_min(transform(col("cs"), c =>
          struct(Vec.l2sqFast(col("embedding"), c.getField("cv")).as("d2"),
            c.getField("cid").as("cid")))).getField("cid").as("cid"))
  }
}
