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

  private val PhashMaxHamming = 4
  // same 20k per-(band, key) ceiling as dedup_minhash/dedup_simhash
  // (reference bucket cap, simple_sim_hash.py:23): with only 256
  // possible 8-bit band keys the self-join is ~N²/256 per band on a
  // degenerate corpus unless a cap bounds the bucket
  private val PhashBucketCap = 20000

  /** Perceptual-hash near-dup pairs over the binary payloads — the
    * image-dedup pass of a multimodal pipeline (identical payloads
    * hash identically; near-identical ones differ in a few bits).
    * Same banded shape as dedup_simhash: the 32-bit phash splits into
    * 4 byte-bands, candidates collide on one equal band, and only
    * candidates pay the exact Hamming verify (bit_count of xor ≤ 4).
    * At scale the candidate join shuffles 4 tiny keys per asset and
    * the per-(band, key) row_number ceiling bounds every bucket —
    * never all-pairs (deterministic first-by-doc_id keep, mirrored in
    * the oracle; no-op below the cap). The stub phash is deterministic
    * over the payload md5, so the whole chain is oracle-exact. */
  val mmPhashDedup = Q(
    "mm_phash_dedup",
    (s, dir) => {
      val man = Multimodal.extractFeatures(
        Multimodal.manifest(Tables.t(s, dir, "documents")))
      val ph = man.select(col("doc_id"),
        conv(col("phash"), 16, 10).cast("long").as("ph")).localCheckpoint()
      val bands = ph.select(col("doc_id"), col("ph"),
          posexplode(array((0 until 4).map(b =>
            shiftright(col("ph"), 8 * b).bitwiseAND(lit(255L))): _*))
            .as(Seq("band", "bkey")))
        .withColumn("brn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("band"), col("bkey")).orderBy(col("doc_id"))))
        .filter(col("brn") <= PhashBucketCap)
        .drop("brn")
        // referenced on BOTH sides of the self-join: without a
        // boundary the explode + window shuffle recompute per side
        // (lesson 8)
        .localCheckpoint()
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("x.ph").as("pa"), col("y.ph").as("pb"))
        .distinct()
      cand.select(col("a"), col("b"),
          bit_count(col("pa").bitwiseXOR(col("pb"))).as("hamming"))
        .filter(col("hamming") <= PhashMaxHamming)
        .orderBy(col("a"), col("b"))
    },
    Some(s"""
      WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
      b0 AS (SELECT doc_id,
              list_transform(range(1, 17),
                i -> ('0x' || substr(h, CAST(2*i-1 AS INT), 2))::BIGINT) AS ub
            FROM m),
      p AS (SELECT doc_id,
              list_reduce(
                list_prepend(1::BIGINT,
                  list_transform(ub, x -> CASE WHEN x > 127 THEN x - 256 ELSE x END)),
                (hh, bb) -> ((31 * hh + bb) % 4294967296 + 4294967296) % 4294967296) AS ph
            FROM b0),
      bands0 AS (SELECT doc_id, ph, u.b AS band, (ph >> (8 * u.b)) & 255 AS bkey
                FROM (SELECT doc_id, ph, unnest(list_transform(range(0, 4), b -> {'b': b})) AS u
                      FROM p)),
      bands AS (SELECT doc_id, ph, band, bkey FROM (
                  SELECT doc_id, ph, band, bkey,
                         ROW_NUMBER() OVER (PARTITION BY band, bkey ORDER BY doc_id) AS brn
                  FROM bands0) WHERE brn <= $PhashBucketCap),
      cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.ph AS pa, y.ph AS pb
               FROM bands x JOIN bands y
                 ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
      SELECT a, b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
      FROM cand
      WHERE bit_count(xor(pa, pb)) <= $PhashMaxHamming
      ORDER BY a, b
    """))

  val qs: Seq[Q] = Seq(mmManifest, mmFrames, mmPhashDedup)
}
