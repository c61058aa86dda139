package graft.queries

import graft.operators.Multimodal
import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Family E (SURVEY §2E): multimodal manifest + batched feature
  * extraction (decode stubbed — see Multimodal). Rows-only oracle:
  * the mapPartitions decode stage is not ANSI-SQL; determinism and
  * schema are spec-enforced (MultimodalSpec). */
object MultimodalQs {

  val mmManifest = Q(
    "mm_manifest",
    (s, dir) => {
      val man = Multimodal.manifest(Tables.t(s, dir, "documents"))
      Multimodal.extractFeatures(man).orderBy(col("doc_id"))
    },
    None)

  /** Frame sampling + per-frame stats (video path of family E). */
  val mmFrames = Q(
    "mm_frames",
    (s, dir) => {
      val man = Multimodal.manifest(Tables.t(s, dir, "documents"))
      Multimodal.sampleFrames(man, stride = 2)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(length(col("frame"))).as("bytes_sampled"))
        .orderBy(col("doc_id"))
    },
    None)

  val qs: Seq[Q] = Seq(mmManifest, mmFrames)
}
