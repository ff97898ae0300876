package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop text-hashing kernels shared by the codegen expressions below.
  *
  * Semantics are EXACTLY the portable column compositions in
  * [[graft.functions.TextFunctions]] (tokens → shingles → md5 → 60-bit
  * prefix → affine permutations / nibble-bit voting), which is what the
  * DuckDB oracle runs — these kernels only collapse the interpreted
  * higher-order-function trees into one JVM loop per row (one md5 per
  * shingle/token instead of one lambda frame per element per permutation).
  */
object TextHashKernels {
  final val P = 2147483647L // 2^31 - 1, the affine-permutation modulus

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Whitespace tokens with empties dropped — mirrors
    * `filter(split(text, " "), w -> length(w) > 0)`. */
  def tokens(text: String): Array[String] = {
    val parts = text.split(" ", -1)
    var n = 0
    var i = 0
    while (i < parts.length) { if (parts(i).nonEmpty) n += 1; i += 1 }
    if (n == parts.length) parts
    else {
      val out = new Array[String](n)
      var j = 0
      i = 0
      while (i < parts.length) {
        if (parts(i).nonEmpty) { out(j) = parts(i); j += 1 }
        i += 1
      }
      out
    }
  }

  /** First 60 bits of md5(s) — the value of
    * `conv(substring(md5(s), 1, 15), 16, 10)`: 7 full bytes + the high
    * nibble of byte 7. */
  def md5Prefix60(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xffL) >>> 4)
  }

  /** Banded minhash signature: one md5 per word-`shingleN`-gram, then
    * `numBands × rowsPerBand` affine permutations; band key = the band's
    * two minhashes packed base-P (rowsPerBand is fixed at 2 here, matching
    * TextFunctions.bandHashInt). Returns null-free long array; EMPTY when
    * the doc has fewer than `shingleN` words (caller drops). */
  def minhashBands(text: UTF8String, shingleN: Int, numBands: Int): ArrayData = {
    val ws = tokens(text.toString)
    val nSh = ws.length - shingleN + 1
    if (nSh <= 0) return new GenericArrayData(Array.empty[Any])
    val numPerm = numBands * 2
    val mins = Array.fill(numPerm)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      var k = 0
      while (k < shingleN) {
        if (k > 0) sb.append(' ')
        sb.append(ws(i + k))
        k += 1
      }
      val hp = md5Prefix60(sb.toString) % P
      var s = 0
      while (s < numPerm) {
        val v = (hp * (37L + 61L * s) + (101L + 31L * s)) % P
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    val out = new Array[Any](numBands)
    var b = 0
    while (b < numBands) {
      out(b) = mins(2 * b) * P + mins(2 * b + 1)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word-n-gram shingles in first-occurrence order — mirrors
    * `array_distinct(shingles(tokens(text), n))`. */
  def distinctShingles(text: UTF8String, n: Int): ArrayData = {
    val ws = tokens(text.toString)
    val nSh = ws.length - n + 1
    if (nSh <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(ws(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** ALL word n-grams in positional order (index i = gram starting at
    * token i) — the positional sibling of [[distinctShingles]], for
    * operators that need gram POSITIONS (duplicate-span reconstruction).
    * One tokenize pass per row; the `transform`-based column form
    * re-evaluates the tokenization per element_at under Spark's
    * higher-order-function interpreter (measured 100 µs/gram vs <1 µs
    * here). */
  def orderedShingles(text: UTF8String, n: Int): ArrayData = {
    val ws = tokens(text.toString)
    val nSh = ws.length - n + 1
    if (nSh <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nSh)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(ws(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Token-stream span cut: drops every token whose index falls in
    * ∪[p, p+L) over the sorted cut-start positions `cuts` (0-based
    * gram starts, as [[orderedShingles]] numbers them) and rejoins the
    * survivors with single spaces (the corpus reassembly convention —
    * output is whitespace-normalized even when nothing is cut). One
    * two-pointer pass, O(tokens + cuts) — the HOF `filter(tokens,
    * (t, i) -> !exists(cuts, …))` form is O(tokens × cuts) under the
    * interpreted lambda evaluator. */
  def cutSpans(text: UTF8String, cuts: ArrayData, spanTokens: Int): UTF8String = {
    val ws = tokens(text.toString)
    val nc = cuts.numElements()
    val sb = new java.lang.StringBuilder(text.numBytes())
    var ci = 0
    var coverEnd = -1L
    var first = true
    var j = 0
    while (j < ws.length) {
      while (ci < nc && cuts.getInt(ci) <= j) {
        val e = cuts.getInt(ci).toLong + spanTokens
        if (e > coverEnd) coverEnd = e
        ci += 1
      }
      if (j >= coverEnd) {
        if (!first) sb.append(' ')
        sb.append(ws(j))
        first = false
      }
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Bounded (Ukkonen-banded) Levenshtein distance: the exact edit
    * distance when it is ≤ k, else -1. O(k·min(n,m)) cells instead of
    * O(n·m), with an early bail-out once every band cell exceeds k.
    * Operates on CODE POINTS (one int[] conversion per string, then
    * O(1) indexing), matching both Spark's built-in `levenshtein` and
    * the DuckDB oracle — a supplementary character (emoji, astral CJK)
    * counts as ONE unit, not its two UTF-16 surrogates. Spark's
    * built-in walks UTF8String offsets per DP cell and measured
    * ~1 ms/pair on 300-char documents; this kernel is the fuzzy-join
    * verify form (q117). Semantics pinned against the built-in in
    * BoundedLevenshteinSpec (incl. non-BMP cases). */
  private def codePoints(s: String): Array[Int] = s.codePoints().toArray

  def boundedLevenshtein(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    val a = codePoints(ua.toString); val b = codePoints(ub.toString)
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length; val m = t.length
    if (m - n > k) return -1
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      if (i <= k) cur(0) = i
      val lo = math.max(1, i - k); val hi = math.min(m, i + k)
      var best = inf
      var jj = lo
      while (jj <= hi) {
        val sub =
          if (s(i - 1) == t(jj - 1)) prev(jj - 1)
          else prev(jj - 1) + 1
        val del = prev(jj) + 1
        val ins = cur(jj - 1) + 1
        var v = math.min(sub, math.min(del, ins))
        if (v > inf) v = inf
        cur(jj) = v
        if (v < best) best = v
        jj += 1
      }
      if (best >= inf && (i > k || cur(0) >= inf)) return -1 // band dead
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(m) > k) -1 else prev(m)
  }

  /** Character histogram over the a-z + space alphabet in ONE scan of
    * the UTF-8 bytes (ASCII targets never match UTF-8 continuation
    * bytes, so byte-wise counting is code-point-correct): 27 counts in
    * alphabet order. The q104 entropy used to recount via 27 separate
    * translate+length passes (81 string scans/row) — this kernel is the
    * single-pass replacement. */
  def charHist27(text: UTF8String): ArrayData = {
    val counts = new Array[Long](27)
    val b = text.getBytes
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') counts(c - 'a') += 1
      else if (c == ' ') counts(26) += 1
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Per-doc n-gram repetition stats in one pass: [total gram instances,
    * count of the most frequent gram, instances beyond first occurrence].
    * Empty array when the doc has fewer than n words. The per-row hash
    * map stays small (≤ grams per doc) and dies with the row — no
    * shuffle, no state. */
  def ngramRepStats(text: UTF8String, n: Int): ArrayData = {
    val ws = tokens(text.toString)
    val nGr = ws.length - n + 1
    if (nGr <= 0) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.HashMap[String, Int](nGr * 2)
    val sb = new java.lang.StringBuilder(64)
    var top = 0
    var i = 0
    while (i < nGr) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(ws(i + k))
        k += 1
      }
      val c = counts.merge(sb.toString, 1, Integer.sum)
      if (c > top) top = c
      i += 1
    }
    new GenericArrayData(Array[Any](
      nGr.toLong, top.toLong, (nGr - counts.size).toLong))
  }

  /** 64-bit SimHash as a long: one md5 per token, bit b votes with bit b
    * of the 128-bit digest (first 8 bytes); sign of the vote count sets
    * the fingerprint bit. Engine-fast variant of [[simhashBits]] (not
    * oracle-portable — covered by property tests on hamming distance). */
  def simhash64(text: UTF8String): Long = {
    val ws = tokens(text.toString)
    val counts = new Array[Int](64)
    val d = md5Local.get()
    var i = 0
    while (i < ws.length) {
      d.reset()
      val h = d.digest(ws(i).getBytes("UTF-8"))
      var b = 0
      while (b < 64) {
        val bit = (h(b >> 3) >>> (7 - (b & 7))) & 1
        counts(b) += 2 * bit - 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) fp |= 1L << b
      b += 1
    }
    fp
  }


  /** Winnowing fingerprints: k-gram md5-prefix hashes, min per w-window,
    * distinct, sorted. Empty when the text is shorter than k+w-1. */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val nGrams = s.length - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) { hs(i) = md5Prefix60(s.substring(i, i + k)); i += 1 }
    val fps = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j <= nGrams - w) {
      var m = hs(j)
      var x = j + 1
      while (x < j + w) { if (hs(x) < m) m = hs(x); x += 1 }
      fps.add(m)
      j += 1
    }
    val out = new Array[Any](fps.size)
    val it = fps.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  /** `bits`-length '0'/'1' SimHash string: one md5 per token; bit b reads
    * hex-nibble b/4, weight 8>>(b%4) — mirrors TextFunctions.simhashBits
    * (which re-hashes every token once PER BIT). */
  def simhashBits(text: UTF8String, bits: Int): UTF8String = {
    val ws = tokens(text.toString)
    val counts = new Array[Int](bits)
    val d = md5Local.get()
    var i = 0
    while (i < ws.length) {
      d.reset()
      val h = d.digest(ws(i).getBytes("UTF-8"))
      var b = 0
      while (b < bits) {
        val nib =
          if ((b & 4) == 0) (h(b >> 3) & 0xff) >>> 4
          else h(b >> 3) & 0x0f
        val bit = (nib >>> (3 - (b & 3))) & 1
        counts(b) += 2 * bit - 1
        b += 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(bits)
    var b = 0
    while (b < bits) { sb.append(if (counts(b) >= 0) '1' else '0'); b += 1 }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen wrapper for [[TextHashKernels.ngramRepStats]]: per-doc
  * n-gram repetition statistics in ONE string pass with a per-row hash
  * map — returns [n_grams, top_cnt, dup_cnt] so the repetition filters
  * (q70) need no shuffle at all (the exploded (doc, gram) aggregation
  * form shuffled every bigram instance: 41 s at sf1 vs ~4 s map-only). */
case class NgramRepExpr(child: Expression, n: Int)
    extends UnaryExpression with TextStringInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_rep_stats"

  override def nullSafeEval(t: Any): Any =
    TextHashKernels.ngramRepStats(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.ngramRepStats($c, $n)")

  override protected def withNewChildInternal(c: Expression): NgramRepExpr =
    copy(child = c)
}

private[expressions] trait TextStringInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.simpleString}")
}

/** Codegen wrapper for [[TextHashKernels.boundedLevenshtein]]. */
case class BoundedLevenshteinExpr(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(k >= 0, s"threshold must be >= 0, got $k")
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string columns, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "bounded_levenshtein"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashKernels.boundedLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.TextHashKernels.boundedLevenshtein($a, $b, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedLevenshteinExpr =
    copy(left = newLeft, right = newRight)
}

/** Codegen wrapper for [[TextHashKernels.charHist27]]. */
case class CharHist27Expr(child: Expression)
    extends UnaryExpression with TextStringInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_hist27"

  override def nullSafeEval(t: Any): Any =
    TextHashKernels.charHist27(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.charHist27($c)")

  override protected def withNewChildInternal(c: Expression): CharHist27Expr =
    copy(child = c)
}

/** Codegen wrapper for [[TextHashKernels.minhashBands]] (rowsPerBand = 2). */
case class MinhashBandsExpr(child: Expression, shingleN: Int, numBands: Int)
    extends UnaryExpression with TextStringInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(t: Any): Any =
    TextHashKernels.minhashBands(t.asInstanceOf[UTF8String], shingleN, numBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.minhashBands($c, $shingleN, $numBands)")

  override protected def withNewChildInternal(c: Expression): MinhashBandsExpr =
    copy(child = c)
}

/** Codegen wrapper for [[TextHashKernels.distinctShingles]]. */
case class DistinctShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with TextStringInput {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_shingles"

  override def nullSafeEval(t: Any): Any =
    TextHashKernels.distinctShingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.distinctShingles($c, $n)")

  override protected def withNewChildInternal(c: Expression): DistinctShinglesExpr =
    copy(child = c)
}

/** Codegen wrapper for [[TextHashKernels.orderedShingles]]. */
case class OrderedShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with TextStringInput {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ordered_shingles"

  override def nullSafeEval(t: Any): Any =
    TextHashKernels.orderedShingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.orderedShingles($c, $n)")

  override protected def withNewChildInternal(c: Expression): OrderedShinglesExpr =
    copy(child = c)
}

/** Codegen wrapper for [[TextHashKernels.simhashBits]]. */
case class SimhashBitsExpr(child: Expression, bits: Int)
    extends UnaryExpression with TextStringInput {

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(t: Any): Any =
    TextHashKernels.simhashBits(t.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashKernels.simhashBits($c, $bits)")

  override protected def withNewChildInternal(c: Expression): SimhashBitsExpr =
    copy(child = c)
}

/** Codegen wrapper for [[TextHashKernels.simhash64]]. */
case class Simhash64Expr(child: Expression)
    extends UnaryExpression with TextStringInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(t: Any): Any =
    TextHashKernels.simhash64(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashKernels.simhash64($c)")

  override protected def withNewChildInternal(c: Expression): Simhash64Expr =
    copy(child = c)
}

/** Codegen wrapper for [[TextHashKernels.winnow]]: winnowing document
  * fingerprints (Schleimer/Wilkerson/Aiken '03): md5-prefix rolling hashes
  * of character `k`-grams, minimum per sliding window of `w`, distinct.
  * Guarantees any shared substring of length ≥ w+k-1 yields a shared
  * fingerprint — the plagiarism/near-dup detection primitive. Output is
  * sorted ascending (set semantics; order-free hash comparison). */
case class WinnowingExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with TextStringInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(t: Any): Any =
    TextHashKernels.winnow(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashKernels.winnow($c, $k, $w)")

  override protected def withNewChildInternal(c: Expression): WinnowingExpr =
    copy(child = c)
}

/** Codegen wrapper for [[TextHashKernels.cutSpans]]: remove the token
  * ranges ∪[p, p+spanTokens) named by a sorted cut-start array from a
  * document and reassemble the survivors in order — the cut half of the
  * Lee et al. 2021 substring dedup (detection half:
  * [[graft.operators.Dedup.duplicateSpans]]). */
case class CutSpansExpr(left: Expression, right: Expression, spanTokens: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cut_spans expects (string, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "cut_spans"

  override def nullSafeEval(t: Any, c: Any): Any =
    TextHashKernels.cutSpans(t.asInstanceOf[UTF8String],
      c.asInstanceOf[ArrayData], spanTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) =>
      s"graft.expressions.TextHashKernels.cutSpans($t, $c, $spanTokens)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CutSpansExpr = copy(left = l, right = r)
}
