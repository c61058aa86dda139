package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing fingerprint kernel.
  *
  * Computes, for a text column, the full doc_fingerprint triple in a
  * single tight loop over the UTF-8 bytes:
  *
  *   h_i    = md5hex(substr(text, i, 8))      i = 1 .. max(chars-7, 0)
  *   n_grams = |h|
  *   min_fp  = lexicographic min of h (null when no grams)
  *   n_fp    = |distinct{ min(h[j..j+3]) : j = 1 .. max(|h|-3, 0) }|
  *
  * Identical values to the HOF chain `transform(sequence(...), i ->
  * md5(substr(text, i, 8)))` + array_min + slice-window mins (and to
  * the DuckDB oracle), but ~10x cheaper: higher-order functions run
  * interpreted per element and materialize a ~300-element string array
  * per row, which then gets re-sliced per window position. Here the
  * MD5 instance is reused, substrings are byte ranges (no per-element
  * Column evaluation), and the window minimum is a bounded scan over
  * the last 4 hashes. Substring positions are CODE POINTS (what both
  * Spark's substr and DuckDB's substr count), found by scanning UTF-8
  * lead bytes.
  *
  * Short-text edges follow the oracle's clean semantics: no grams →
  * (0, null, 0); fewer than 4 grams → n_fp = 0. (The HOF form is
  * undefined below 11 chars because Spark's `sequence(1, 0)` descends —
  * CLAUDE.md lesson 10; corpus minimum is 44 chars so both forms agree
  * on real data, and WinnowSpec pins equality.)
  *
  * Reference semantics: rolling-hash document fingerprinting
  * (winnowing), SURVEY §2D doc_fingerprint.
  */
case class WinnowFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val Gram = 8
  private val WinW = 4

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("min_fp", StringType, nullable = true),
    StructField("n_fp", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprint needs a string column, got $other")
    }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, bytes: Array[Byte], off: Int, len: Int): String = {
    md.update(bytes, off, len)
    val d = md.digest() // resets the digest for the next window
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // code-point start offsets (UTF-8 lead bytes), + end sentinel
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) nChars += 1
      i += 1
    }
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nChars) = bytes.length

    val nGrams = math.max(nChars - (Gram - 1), 0)
    if (nGrams == 0)
      return InternalRow(0, null, 0)

    val md = MessageDigest.getInstance("MD5")
    val hashes = new Array[String](nGrams)
    var minFp: String = null
    i = 0
    while (i < nGrams) {
      val off = starts(i)
      val h = md5Hex(md, bytes, off, starts(i + Gram) - off)
      hashes(i) = h
      if (minFp == null || h.compareTo(minFp) < 0) minFp = h
      i += 1
    }

    val nWin = math.max(nGrams - (WinW - 1), 0)
    val distinct = new java.util.HashSet[String]()
    var j = 0
    while (j < nWin) {
      var m = hashes(j)
      var k = j + 1
      while (k < j + WinW) {
        if (hashes(k).compareTo(m) < 0) m = hashes(k)
        k += 1
      }
      distinct.add(m)
      j += 1
    }
    InternalRow(nGrams, UTF8String.fromString(minFp), distinct.size)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The SET the WinnowFingerprint counter summarizes: sorted distinct
  * window-min fingerprints of a text column (char-8-grams → MD5 → min
  * per 4-window → distinct, ascending). Same gram/window semantics and
  * edge cases as WinnowFingerprint (no grams or fewer than 4 grams →
  * empty array); the sort makes the array value deterministic.
  * Feeds fingerprint_overlap, which explodes it — evaluate behind a
  * cache/Project boundary (lesson 2/8). */
case class WinnowFpSet(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val Gram = 8
  private val WinW = 4

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fp_set needs a string column, got $other")
    }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, bytes: Array[Byte], off: Int, len: Int): String = {
    md.update(bytes, off, len)
    val d = md.digest()
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) nChars += 1
      i += 1
    }
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nChars) = bytes.length

    val nGrams = math.max(nChars - (Gram - 1), 0)
    val nWin = math.max(nGrams - (WinW - 1), 0)
    if (nWin == 0)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[UTF8String])

    val md = MessageDigest.getInstance("MD5")
    val hashes = new Array[String](nGrams)
    i = 0
    while (i < nGrams) {
      val off = starts(i)
      hashes(i) = md5Hex(md, bytes, off, starts(i + Gram) - off)
      i += 1
    }
    val distinct = new java.util.TreeSet[String]()
    var j = 0
    while (j < nWin) {
      var m = hashes(j)
      var k = j + 1
      while (k < j + WinW) {
        if (hashes(k).compareTo(m) < 0) m = hashes(k)
        k += 1
      }
      distinct.add(m)
      j += 1
    }
    val out = new Array[UTF8String](distinct.size)
    val it = distinct.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct n-word shingles of a word array, first-occurrence order —
  * the tight-loop twin of TextFns.wordShingles (`array_distinct(
  * transform(sequence(...), i -> concat_ws(" ", w[i], ..., w[i+n-1])))`).
  * The HOF form evaluates n element_ats + a concat per position
  * interpreted (measured 9.7s on the sf0.1 contamination shingle
  * build; this kernel is sub-second). Byte-identical output:
  * UTF8String.concatWs with a single-space separator is exactly
  * concat_ws(" ", ...). */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles needs array<string>, got $other")
    }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = arr.numElements()
    val nSh = math.max(m - (n - 1), 0)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < nSh) {
      var j = 0
      while (j < n) { window(j) = arr.getUTF8String(i + j); j += 1 }
      // concatWs copies into a fresh buffer, so the shingle owns its
      // bytes even if the input array aliases a reused row buffer
      seen.add(UTF8String.concatWs(space, window: _*))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All 16 hyperplane-LSH band keys of an embedding in ONE compact
  * expression. The inline form — 64 `when(VecDot(v, typedlit(plane))
  * > 0, ...)` columns — embeds 64 literal 64-dim arrays into the plan
  * and generates so much Java that janino compilation dominates the
  * query (~1s per stage carrying the expression, re-paid at every
  * stage boundary). Here the plane bank lives in the expression object
  * and the whole signature is one tight loop.
  *
  * Bit-exact with the inline form and the DuckDB oracle: each dot is a
  * LEFT FOLD in element order, the float element widened to double per
  * element; key bit = dot > 0 (SURVEY §6 determinism contract;
  * reference: simple_sim_hash.py hyperplane signatures).
  *
  * `nPlanes` selects a PREFIX of the extended bank (Lsh.PairAllPlanes
  * planes in one deterministic stream): 64 for the 16×4 / 2×32 tiers
  * (the default — byte-identical to the pre-round-9 expression), 192
  * for the wide 4×48 tier a multi-million-row corpus needs.
  *
  * `dim` sizes the plane bank to the corpus dimensionality
  * (Lsh.bandPlanesFor — 64 reproduces the historical bank exactly; a
  * 200d corpus hashes all 200 components instead of a 64-prefix).
  */
case class LshBandKeys(child: Expression,
    nPlanes: Int = graft.operators.Lsh.PairBands * graft.operators.Lsh.PairBandBits,
    dim: Int = graft.operators.Lsh.Dim)
    extends UnaryExpression with CodegenFallback {

  import graft.operators.Lsh
  require(nPlanes % Lsh.PairBandBits == 0 && nPlanes <= Lsh.PairAllPlanes,
    s"nPlanes $nPlanes must be a nibble multiple within the ${Lsh.PairAllPlanes}-plane bank")
  require(dim > 0, s"dim must be positive, got $dim")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lsh_band_keys needs array<float|double>, got $other")
    }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  // flat plane bank: planes(j)(d) at j * dim + d
  @transient private lazy val flatPlanes: Array[Double] = {
    val bank = Lsh.bandPlanesFor(dim)
    val out = new Array[Double](nPlanes * dim)
    var j = 0
    while (j < nPlanes) {
      var d = 0
      while (d < dim) { out(j * dim + d) = bank(j)(d); d += 1 }
      j += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(v.numElements(), dim)
    val nNibbles = nPlanes / Lsh.PairBandBits
    val keys = new Array[Int](nNibbles)
    var band = 0
    while (band < nNibbles) {
      var key = 0
      var bit = 0
      while (bit < Lsh.PairBandBits) {
        val j = band * Lsh.PairBandBits + bit
        var dot = 0.0
        var d = 0
        while (d < n) {
          val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
          dot += x * flatPlanes(j * dim + d)
          d += 1
        }
        if (dot > 0) key |= 1 << bit
        bit += 1
      }
      keys(band) = key
      band += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct character k-grams in first-occurrence order — the tight-
  * loop twin of `array_distinct(transform(sequence(...), i ->
  * substr(text, i, k)))` (TextFns.charGrams). Identical output order
  * (first occurrence, like array_distinct) and identical code-point
  * substring semantics; skips the interpreted per-element HOF evals
  * and the pre-distinct ~|text|-element array (measured 3.8s → <1s on
  * the sf0.1 gram build). */
case class CharGramsExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_grams needs a string column, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    // copy: the emitted gram UTF8Strings are zero-copy views into this
    // buffer, and getBytes may alias the scan's reused row buffer
    val raw = input.asInstanceOf[UTF8String].getBytes
    val bytes = java.util.Arrays.copyOf(raw, raw.length)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) nChars += 1
      i += 1
    }
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nChars) = bytes.length

    val n = math.max(nChars - (k - 1), 0)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i < n) {
      val off = starts(i)
      seen.add(UTF8String.fromBytes(bytes, off, starts(i + k) - off))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All five stopword-profile ratios in ONE pass over the text — the
  * lang_id / curate_corpus substrate (langScored). Tokens = split on
  * single spaces with empties dropped (TextFns.words semantics);
  * ratio_l = (#tokens ∈ stopwords(l)) · 1.0 / #tokens, 0.0 when there
  * are no tokens — exactly ratioIn's arithmetic per language. The HOF
  * form re-filtered the interpreted word array once per language
  * (5 passes/row plus the split); this is one byte scan with a single
  * hash lookup per token (languages may share stopwords — "la"/"de" —
  * so the lookup yields a membership BITMASK, not one set hit).
  * NULL text yields the all-0.0 row that `when(size(w) > 0, …)
  * .otherwise(0.0)` produced on a null word array. Element order =
  * sorted language keys (LangRatiosExpr.Langs). Evaluated once per
  * row behind langScored's cache boundary, so CodegenFallback is fine
  * (lesson 14). LangRatiosSpec pins bit-equality with the ratioIn HOF
  * chain per language, edge cases included.
  */
case class LangRatiosExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import LangRatiosExpr._

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lang_ratios needs a string column, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val counts = new Array[Int](NLangs)
    var total = 0
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var i = 0
      var start = 0
      while (i <= bytes.length) {
        if (i == bytes.length || bytes(i) == 0x20) {
          if (i > start) {
            total += 1
            // transient zero-copy view: used only for the map lookup
            val m = Mask.get(UTF8String.fromBytes(bytes, start, i - start))
            if (m != null) {
              var mm = m.intValue
              var l = 0
              while (mm != 0) {
                if ((mm & 1) != 0) counts(l) += 1
                mm >>>= 1; l += 1
              }
            }
          }
          start = i + 1
        }
        i += 1
      }
    }
    val out = new Array[Any](NLangs)
    var l = 0
    while (l < NLangs) {
      out(l) = if (total > 0) counts(l) * 1.0 / total else 0.0
      l += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangRatiosExpr {
  /** Sorted language keys — the array's element order. */
  val Langs: IndexedSeq[String] = TextFns.stopwords.keys.toIndexedSeq.sorted
  private val NLangs = Langs.length
  /** token → bitmask of languages whose stopword set contains it. */
  private val Mask: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    Langs.zipWithIndex.foreach { case (l, li) =>
      TextFns.stopwords(l).foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue) | (1 << li)))
      }
    }
    m
  }
}
