package graft.queries

import graft.operators.Multimodal
import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Family E (SURVEY §2E): multimodal manifest + batched feature
  * extraction (decode stubbed — see Multimodal). The mapPartitions
  * decode stage runs the real pipeline plumbing on the Spark side;
  * because the stub decode is DETERMINISTIC arithmetic over the
  * payload bytes, the oracle can re-derive every output from the md5
  * hex string — so even the "pandas-UDF-shaped" stage is value-checked
  * by the driver (round 3: these were rows-only before). */
object MultimodalQs {

  val mmManifest = Q(
    "mm_manifest",
    (s, dir) => {
      val man = Multimodal.manifest(Tables.t(s, dir, "documents"))
      Multimodal.extractFeatures(man).orderBy(col("doc_id"))
    },
    // payload = unhex(md5(text)): byte i of the payload IS hex pair i,
    // so mean_byte (unsigned sum / 16) and the stub phash — Java's
    // Arrays.hashCode fold h = 31h + signed_byte in wrapping int32,
    // masked to unsigned and hex'd WITHOUT padding — are exact SQL
    Some("""
      WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
      b AS (SELECT doc_id,
              list_transform(range(1, 17),
                i -> ('0x' || substr(h, CAST(2*i-1 AS INT), 2))::BIGINT) AS ub
            FROM m),
      f AS (SELECT doc_id,
              CAST(list_sum(ub) AS DOUBLE) / 16.0 AS mean_byte,
              list_reduce(
                list_prepend(1::BIGINT,
                  list_transform(ub, x -> CASE WHEN x > 127 THEN x - 256 ELSE x END)),
                (hh, bb) -> ((31 * hh + bb) % 4294967296 + 4294967296) % 4294967296) AS ph
            FROM b)
      SELECT doc_id,
             ['jpeg', 'png', 'wav'][CAST(doc_id % 3 + 1 AS INT)] AS codec,
             CAST((doc_id % 4) * 16 + 16 AS INT) AS width,
             CAST((doc_id % 3) * 16 + 16 AS INT) AS height,
             16 AS payload_len,
             mean_byte,
             printf('%x', ph) AS phash
      FROM f
      ORDER BY doc_id
    """))

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
    // frames = sequence(0, nFrames-1, 2) over nFrames = doc_id%16 + 1;
    // every stub frame is a 4-byte payload window (start <= 13 of 16)
    Some("""
      SELECT doc_id,
             (doc_id % 16) // 2 + 1 AS n_sampled,
             ((doc_id % 16) // 2 + 1) * 4 AS bytes_sampled
      FROM documents
      ORDER BY doc_id
    """))

  val qs: Seq[Q] = Seq(mmManifest, mmFrames)
}
