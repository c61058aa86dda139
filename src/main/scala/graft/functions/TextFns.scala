package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the text-analysis and dedup families.
  *
  * Engine-portability rule (SURVEY §6): all hashing is MD5 hex strings
  * (identical in Spark and DuckDB); all "minimum hash" logic uses
  * lexicographic MIN over those hex strings, which any total order
  * satisfies — so MinHash/winnowing semantics hold without
  * engine-specific 64-bit hashes. The scale path can swap xxhash64 in
  * (same shapes), but oracle'd queries stay on MD5.
  */
object TextFns {

  /** Whitespace words, empties dropped (mirror: list_filter(string_split(...))) */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  def sqlWords(text: String): String =
    s"list_filter(string_split($text, ' '), w -> w <> '')"

  /** Distinct n-word shingles joined by single spaces, 1-based
    * element_at to mirror DuckDB list indexing. Empty-safe. */
  def wordShingles(w: Column, n: Int): Column = {
    val joined = transform(
      sequence(lit(1), greatest(size(w) - (n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(o => element_at(w, i + o)): _*))
    array_distinct(joined)
  }

  def sqlWordShingles(w: String, n: Int): String = {
    val parts = (0 until n).map(o => s"$w[i + $o]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, greatest(len($w) - ${n - 1}, 0) + 1), i -> $parts))"
  }

  /** Distinct character k-grams of a string. */
  def charGrams(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(0))),
      i => text.substr(i, lit(k))))

  def sqlCharGrams(text: String, k: Int): String =
    s"list_distinct(list_transform(range(1, greatest(length($text) - ${k - 1}, 0) + 1), i -> substr($text, i, $k)))"

  /** Jaccard of two pre-distinct string arrays, as double. ONE set
    * build: |A∪B| = |A|+|B|−|A∩B| for distinct arrays, and the
    * single-element-array lambda binds the intersection once (naming
    * it twice would re-evaluate it — lesson 8). Numerator and
    * denominator are the same integers as the intersect+distinct-
    * concat form, so values are bit-identical. */
  def jaccard(a: Column, b: Column): Column =
    element_at(
      transform(array(array_intersect(a, b)),
        x => (size(x) * lit(1.0)) / (size(a) + size(b) - size(x))),
      1)

  def sqlJaccard(a: String, b: String): String =
    s"(list_transform([list_intersect($a, $b)], x -> len(x) * 1.0 / (len($a) + len($b) - len(x))))[1]"

  // ---- MinHash (one MD5 per shingle + universal integer hashes) ----
  //
  // h = low-31-bits of the shingle's md5 prefix (computed ONCE);
  // h_j(s) = (a_j·h + b_j) mod (2³¹−1) gives 9 independent orderings
  // with pure integer ops — 9× fewer MD5 calls than hashing per seed,
  // and products stay < 2⁶² so Spark and DuckDB both compute exactly.

  val MinhashP = 2147483647L // 2^31 - 1

  /** (a_j, b_j) pairs, deterministic, 1 ≤ a < p, 0 ≤ b < p. */
  val minhashCoef: IndexedSeq[(Long, Long)] = {
    var x = 0x5DEECE66DL
    def next(): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33) % (MinhashP - 1)
    }
    IndexedSeq.fill(16)((next() + 1, next()))
  }

  /** One 31-bit hash per shingle (single MD5 pass). */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, sh =>
      conv(substring(md5(sh), 1, 15), 16, 10).cast("long").bitwiseAND(lit(0x7fffffffL)))

  def sqlShingleHashes(shingles: String): String =
    s"list_transform($shingles, sh -> ('0x' || substr(md5(sh), 1, 15))::BIGINT & 2147483647)"

  /** j-th MinHash from the precomputed hash array. */
  def minhash(hs: Column, j: Int): Column = {
    val (a, b) = minhashCoef(j)
    array_min(transform(hs, h => (lit(a) * h + lit(b)) % lit(MinhashP)))
  }

  def sqlMinhash(hs: String, j: Int): String = {
    val (a, b) = minhashCoef(j)
    s"list_aggregate(list_transform($hs, h -> ($a * h + $b) % $MinhashP), 'min')"
  }

  // ---- stopword profiles for lang-id / quality ----

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "du", "est", "pour"),
    "es" -> Seq("el", "la", "de", "los", "las", "y", "un", "una", "es", "por"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "人", "这"))

  /** Fraction of words that belong to `set` (0 when no words). */
  def ratioIn(w: Column, set: Seq[String]): Column =
    when(size(w) > 0,
      size(filter(w, x => x.isin(set: _*))) * lit(1.0) / size(w))
      .otherwise(lit(0.0))

  def sqlRatioIn(w: String, set: Seq[String]): String = {
    val lst = set.map(s => s"'$s'").mkString(", ")
    s"CASE WHEN len($w) > 0 THEN len(list_filter($w, x -> x IN ($lst))) * 1.0 / len($w) ELSE 0.0 END"
  }
}
