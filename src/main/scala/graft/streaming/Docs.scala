package graft.streaming

import graft.queries.TextQs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The training-data filter pipeline as a STREAM: quality-gate +
  * deterministic language-rebalance over a document stream
  * (doc_id, lang, text). Both predicates are the exact batch
  * expressions (TextQs.qualityScore / TextQs.sampleKeep), so a corpus
  * filtered incrementally is row-for-row identical to one filtered in
  * batch — and the operator is STATELESS: no watermark, no state
  * store, any ingest volume (the 100 TB shape is a pure map over
  * micro-batches). */
object Docs {

  def filterStream(stream: DataFrame, minQuality: Double): DataFrame =
    stream
      .withColumn("quality", TextQs.qualityScore(col("text")))
      .filter(col("quality") >= minQuality &&
        TextQs.sampleKeep(col("doc_id"), col("lang")))
}
