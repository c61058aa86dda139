package graft.streaming

import graft.functions.TextFns
import graft.queries.TextQs
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}
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

  // ---- streaming MinHash-LSH near-dup candidate mining ----

  /** One doc's residence in one LSH bucket (ts = the doc's event time,
    * driving the bucket's retention timeout). */
  case class BandRow(band: Int, k0: Long, k1: Long, k2: Long,
      doc_id: Long, sig: Seq[Long], ts: java.sql.Timestamp)
  case class BucketDoc(doc_id: Long, sig: Seq[Long])
  case class BucketState(docs: List[BucketDoc])
  case class CandPair(a: Long, b: Long, band: Int)

  // ---- streaming context packing ----

  case class PackState(startTok: Long)
  case class PackedDoc(shard: Long, doc_id: Long, n_tok: Long,
      start_tok: Long, ctx_id: Long, crosses: Boolean)

  /** pack_contexts as a STREAM: per-shard keyed state holds the
    * running token offset, so documents ingest continuously and each
    * micro-batch extends the concat-and-chunk packing where the last
    * one stopped — the natural shape for a pipeline that packs while
    * it crawls. Token counts are the batch operator's exact regex.
    * With ids arriving in order per shard, output equals batch
    * pack_contexts row-for-row (spec-proven); state is ONE long per
    * shard, the cheapest state store in the repo. */
  def packStream(stream: DataFrame, ctxTokens: Long = 256L, shards: Long = 8L): Dataset[PackedDoc] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(
        pmod(col("doc_id"), lit(shards)).as("shard"),
        col("doc_id"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("n_tok"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, rows, state) =>
          var off = state.getOption.map(_.startTok).getOrElse(0L)
          val out = rows.toSeq.sortBy(_._2).map { case (_, id, n) =>
            val start = off
            off += n
            PackedDoc(shard, id, n, start, start / ctxTokens,
              n > 0 && (start + n - 1) / ctxTokens > start / ctxTokens)
          }
          state.update(PackState(off))
          out.iterator
      }
  }

  /** The batch dedup_minhash candidate miner as a STREAM: per doc the
    * same 9 MinHash values (3-word shingles → 31-bit md5 hashes →
    * (a·h+b) mod 2³¹−1 mins), grouped by (band, sig-triple) — the
    * band key itself, minus the batch side's md5 shortening, which
    * exists only to shrink a shuffle key — with per-bucket member
    * lists in keyed state. A new arrival pairs against every earlier
    * resident of its bucket; a pair colliding in several bands is
    * emitted only from its LOWEST matching band (triple-compare on
    * the sigs both sides already carry), so the emitted set equals
    * the batch join+distinct set, incrementally.
    *
    * Scale contract: state per bucket is a capped member list (the
    * batch 20k bucket ceiling, same deterministic first-by-doc_id
    * keep); docs with no shingles (< 3 words) never band. Retention is
    * BOUNDED by an event-time timeout (r6/r7 item: unbounded state on
    * an unbounded stream): the input must carry an event-time `ts`
    * column; a bucket idle past `retentionMs` (no arrival advancing
    * its max event time) is evicted when the watermark passes, so
    * candidates mean "near-dup within the retention window" — the
    * streaming dedup contract (dropDuplicatesWithinWatermark's form).
    * StreamingStateTimeoutSpec proves both eviction and the
    * within-window pairing.
    * The sig projection crosses an encoder boundary BEFORE banding:
    * with no cache in a stream, CollapseProject would otherwise
    * inline the whole shingle→md5→min chain into every band
    * expression (the batch lesson, DedupQs.sigTable). */
  def minhashCandidates(stream: DataFrame, bucketCap: Int = 20000,
      retentionMs: Long = 30L * 60 * 1000,
      lateness: String = "0 seconds"): Dataset[CandPair] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val nH = 9
    val bands = 3
    val aLit = array(TextFns.minhashCoef.take(nH).map(c => lit(c._1)): _*)
    val bLit = array(TextFns.minhashCoef.take(nH).map(c => lit(c._2)): _*)
    val hs = TextFns.shingleHashes(
      TextFns.wordShingles(TextFns.words(col("text")), 3))
    // hs appears ONCE inside the one sig expression: 9 mins in a
    // single nested transform instead of 9 top-level columns
    val sig = transform(sequence(lit(0), lit(nH - 1)), j =>
      array_min(transform(col("hs"), h =>
        (element_at(aLit, j + 1) * h + element_at(bLit, j + 1)) % lit(TextFns.MinhashP))))
    val sigDs = stream
      .select(col("doc_id"), col("ts"), hs.as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), sig.as("sig"), col("ts"))
      .as[(Long, Seq[Long], java.sql.Timestamp)]
    // the watermark is declared AFTER the encoder boundary: a typed
    // flatMap re-serializes ts as a fresh attribute without the
    // event-time tag, and the stateful operator's timeout check needs
    // the tagged column on ITS child
    val banded = sigDs.flatMap { case (id, s, t) =>
      (0 until bands).map(b => BandRow(b, s(3 * b), s(3 * b + 1), s(3 * b + 2), id, s, t))
    }.withWatermark("ts", lateness)
    banded
      .groupByKey(r => (r.band, r.k0, r.k1, r.k2))
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, _, _, _), rows, state) =>
          if (state.hasTimedOut) {
            // bucket idle past retention: evict. Later arrivals restart
            // the bucket empty — pairs span only the retention window.
            state.remove()
            Iterator.empty
          } else {
          var members = state.getOption.map(_.docs).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
          var maxEventMs = Long.MinValue
          // deterministic arrival order within the micro-batch
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            maxEventMs = math.max(maxEventMs, r.ts.getTime)
            if (!members.exists(_.doc_id == r.doc_id) && members.size < bucketCap) {
              val rd = BucketDoc(r.doc_id, r.sig)
              members.foreach { m =>
                val (lo, hi) = if (m.doc_id < rd.doc_id) (m, rd) else (rd, m)
                // lowest-matching-band suppression: an earlier band
                // whose triple matches on both docs will emit this pair.
                // Cap-binding caveat (same as batch DedupQs first-match
                // emission): if one doc was capped OUT of the earlier
                // band's bucket, that band never paired them yet still
                // suppresses here — under a binding bucketCap the
                // candidate set was probabilistic already, and the spec
                // corpus never binds the cap
                val earlier = (0 until band).exists { b2 =>
                  (0 until 3).forall(i => lo.sig(3 * b2 + i) == hi.sig(3 * b2 + i))
                }
                if (!earlier) out += CandPair(lo.doc_id, hi.doc_id, band)
              }
              members = members :+ rd
            }
          }
          state.update(BucketState(members))
          // evict when the watermark passes the bucket's last arrival +
          // retention; clamp above the current watermark (Spark rejects
          // a timeout at-or-before it — e.g. a fully-late micro-batch)
          state.setTimeoutTimestamp(
            math.max(maxEventMs + retentionMs, state.getCurrentWatermarkMs() + 1))
          out.iterator
          }
      }
  }
}
