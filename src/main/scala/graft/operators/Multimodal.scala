package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal-column plumbing (SURVEY §2E): media as opaque `binary`
  * payloads + typed metadata, decoded/feature-extracted in batched
  * partition-local passes — the Scala shape of a Pandas-UDF
  * `mapInPandas` pipeline.
  *
  * The DECODE STEP IS A STUB: real image/audio codecs are not in this
  * environment by design, so `decodeBatch` derives deterministic fake
  * features from the payload bytes. Everything around it — manifest
  * schema, binary column, metadata struct, per-partition decoder init,
  * fixed-size batching, output schema — is the real production
  * plumbing a codec drop-in would use unchanged.
  */
object Multimodal {

  val BatchSize = 64

  private val featSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("payload_len", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("phash", StringType)))

  /** Manifest: opaque payload (deterministic fake media bytes derived
    * from the text) + metadata struct, as a real pipeline would carry
    * (payload from object storage, metadata from the container head). */
  def manifest(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      to_binary(md5(col("text")), lit("hex")).as("payload"),
      struct(
        element_at(array(lit("jpeg"), lit("png"), lit("wav")),
          (col("doc_id") % 3 + 1).cast("int")).as("codec"),
        (pmod(col("doc_id"), lit(4)) * 16 + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(3)) * 16 + 16).cast("int").as("height"))
        .as("meta"))

  /** STUB decoder: one "decoder" init per partition, inputs consumed in
    * BatchSize groups (the mapInPandas batch shape), deterministic fake
    * features per payload. Swap `fakeDecode` for a real codec call. */
  def extractFeatures(man: DataFrame): DataFrame = {
    val spark = man.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featSchema)
    man.select(col("doc_id"), col("payload"), col("meta.codec"),
        col("meta.width"), col("meta.height"))
      .mapPartitions { rows =>
        // per-partition init point: a real decoder would load native
        // codec libraries / models ONCE here, then reuse across batches
        rows.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val payload = r.getAs[Array[Byte]]("payload")
            val (mean, phash) = fakeDecode(payload)
            Row(r.getAs[Long]("doc_id"), r.getAs[String]("codec"),
              r.getAs[Int]("width"), r.getAs[Int]("height"),
              payload.length, mean, phash)
          }
        }
      }(enc)
  }

  /** Frame sampling for video-like payloads: every `stride`-th frame
    * of the declared frame count becomes a row (doc_id, frame_idx,
    * frame binary). The FRAME DECODE IS A STUB (deterministic slice of
    * the payload); the explode shape, per-frame binary column, and
    * downstream per-frame feature extraction are the real pipeline. */
  def sampleFrames(man: DataFrame, stride: Int): DataFrame = {
    val nFrames = (pmod(col("doc_id"), lit(16)) + 1).cast("int")
    man.select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), nFrames - 1, lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        // stub "frame": rotating 4-byte window of the payload
        expr("substring(payload, pmod(frame_idx * 4, 13) + 1, 4)").as("frame"))
  }

  /** Deterministic stand-in for image decode + feature extraction. */
  private def fakeDecode(payload: Array[Byte]): (Double, String) = {
    var s = 0L
    var i = 0
    while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
    val mean = if (payload.length == 0) 0.0 else s.toDouble / payload.length
    val phash = java.lang.Long.toHexString(
      java.util.Arrays.hashCode(payload).toLong & 0xffffffffL)
    (mean, phash)
  }
}
