package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash over a token array (document fingerprinting for near-dup
  * detection, SURVEY.md §2.11).
  *
  * Per token: take the first 15 hex chars of md5(token) as a 60-bit hash;
  * each of bits 0..31 votes +1/-1; the signature sets the bits with a
  * positive vote. Order-independent, so distinct-token sets hash equally
  * regardless of array order — and the same arithmetic is expressible in
  * the DuckDB oracle (md5 + bit ops), keeping this oracle-checkable.
  *
  * Near-dup pairs then come from a banded self-join on the signature
  * (4 bands x 8 bits): hamming distance <= 3 guarantees at least one equal
  * band (pigeonhole), so the banded join is exact, not approximate — and at
  * scale it replaces the O(n^2) pairwise scan with an equi-shuffle.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires ARRAY<STRING>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashExpressions.simhash(input.asInstanceOf[ArrayData], 32))

  // one static call per row keeps the signature stage inside
  // WholeStageCodegen (this was a CodegenFallback, which splits the
  // stage and routes every row through interpreted eval)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashExpressions.simhash($c, 32)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit SimHash — the wide-signature variant of [[SimHash32]] for corpora
  * whose (small) vocabulary saturates a 32-bit signature with incidental
  * collisions (NOTES.md: sf0.01 documents keep ~1.2k candidate pairs at
  * hamming ≤ 3 under 32 bits). 60 bits is the full md5-prefix width that
  * still fits a signed BIGINT, so the DuckDB oracle replays it with the
  * same `('0x' || substr(md5(tok), 1, 15))::BIGINT` arithmetic — a true
  * 64-bit signature would overflow the oracle's integer type.
  *
  * Banding: 60 = 4 × 15 bits, so `Dedup.simhashPairs(sigBits = 60,
  * nBands = 4, maxHamming = 3)` keeps the exact-by-pigeonhole property.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires ARRAY<STRING>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashExpressions.simhash(input.asInstanceOf[ArrayData], 60))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashExpressions.simhash($c, 60)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of common elements between two SORTED ARRAY<BIGINT> inputs (the
  * caller guarantees ascending order and distinctness, e.g.
  * `sort_array(collect_set(...))`). A single codegen'd linear merge — no
  * per-call hash set, no boxing — replacing
  * `size(array_intersect(a, b))`, whose interpreted evaluation (an
  * OpenHashSet built per row) dominated the blocked-Jaccard verify stage
  * (Dedup.ngramJaccardPairs) at sf0.1. Null inputs yield null; elements
  * are compared as primitive longs.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0L
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(n)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val n = ctx.freshName("n")
      s"""
        int $i = 0, $j = 0;
        long $n = 0L;
        while ($i < $a.numElements() && $j < $b.numElements()) {
          long $xv = $a.getLong($i);
          long $yv = $b.getLong($j);
          if ($xv == $yv) { $n++; $i++; $j++; }
          else if ($xv < $yv) { $i++; }
          else { $j++; }
        }
        ${ev.value} = $n;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Shannon entropy (nats) of a string's character distribution — low
  * entropy flags repetitive/degenerate text (`aaaa…`, template spam), high
  * entropy flags binary-ish noise; a standard corpus quality signal.
  * Empty/whitespace-only strings are legal; the empty string yields 0.0.
  *
  * ONE pass over the string builds the per-character counts (dense array
  * for ASCII — virtually all corpus text — HashMap spill for the rest),
  * then one pass over the ≤|alphabet| counts sums -p·ln(p): O(length),
  * replacing the interpreted higher-order-function formulation whose inner
  * `filter` re-scanned the char array per DISTINCT character
  * (O(distinct × length), interpreted eval — the NOTES.md q76 lesson, on
  * a 100 TB scan's hottest loop). Characters are Unicode code points (the
  * same unit `split(text, '')` produced). The count sum runs ascending by
  * code point for ASCII — a fixed, partitioning-independent order.
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires STRING, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(
      HashExpressions.charEntropy(input.asInstanceOf[UTF8String]))

  // one static call per row keeps the expression inside WholeStageCodegen
  // (the counting loop itself is plain JVM code either way)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashExpressions.charEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rabin–Karp-style rolling hash fingerprint of a string: fold chars with
  * h = (h * 31 + c) mod 1e9+7, seeded with the first char (matches DuckDB's
  * `list_reduce` over `ord()` so the oracle can replay it; for non-ASCII
  * the engines differ — UTF-16 unit here vs codepoint there — documented,
  * test data is ASCII). Codegen'd: the loop runs inside WholeStageCodegen.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires STRING, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    java.lang.Long.valueOf(HashExpressions.rollingHash(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
        java.lang.String $str = $c.toString();
        long $h = 0L;
        if ($str.length() > 0) {
          $h = (long) $str.charAt(0);
          for (int $i = 1; $i < $str.length(); $i++) {
            $h = ($h * 31L + (long) $str.charAt($i)) % 1000000007L;
          }
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd content-defined chunk boundaries — see
  * [[HashExpressions.cdcBounds]]. Returns ARRAY<BIGINT> of 1-based chunk
  * END positions (possibly empty; the caller appends the text end as the
  * tail chunk). `window`/`modulus`/`minLen` are plan-time constants.
  */
case class CdcBounds(child: Expression, window: Int, modulus: Int, minLen: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if window > 0 && modulus > 0 && minLen >= 0 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"cdc_bounds requires window > 0, modulus > 0, minLen >= 0")
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_bounds requires STRING, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_bounds"

  override def nullSafeEval(input: Any): Any =
    HashExpressions.cdcBounds(input.asInstanceOf[UTF8String], window, modulus, minLen)

  // one static call per row keeps the rolling scan inside WholeStageCodegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashExpressions.cdcBounds($c, $window, $modulus, $minLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** IEEE-754 double → order-preserving signed long (an involution with
  * [[SortableBitsDouble]]): non-negative doubles keep their raw bits
  * (already ascending); negative doubles map to `Long.MinValue - bits`,
  * which is negative, ascends with the double, and wraps -0.0 onto
  * +0.0's image. Lets integer order-statistic machinery
  * ([[graft.operators.Selection.kthSmallestByGroup]]) select EXACT
  * order statistics over double columns — bit-level binary search
  * instead of buffering values. NaN is rejected by contract (its bits
  * would sort above +∞ in an arbitrary payload order, poisoning the
  * selection silently): callers filter NaN first, as the top-k family
  * does.
  */
case class DoubleSortableBits(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"double_sortable_bits requires DOUBLE, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "double_sortable_bits"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      HashExpressions.doubleSortableBits(input.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashExpressions.doubleSortableBits($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Inverse of [[DoubleSortableBits]] (the same involution formula). */
case class SortableBitsDouble(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sortable_bits_double requires BIGINT, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sortable_bits_double"

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(
      HashExpressions.sortableBitsDouble(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashExpressions.sortableBitsDouble($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {

  /** See [[DoubleSortableBits]]. NaN is a contract violation, surfaced
    * loudly — a silent arbitrary-payload ordering would corrupt order
    * statistics downstream.
    */
  def doubleSortableBits(d: Double): Long = {
    if (java.lang.Double.isNaN(d))
      throw new IllegalArgumentException(
        "double_sortable_bits: NaN has no place in a value ordering — " +
          "filter NaN upstream")
    val b = java.lang.Double.doubleToLongBits(d)
    if (b >= 0L) b else java.lang.Long.MIN_VALUE - b
  }

  /** Inverse of [[doubleSortableBits]] — the identical involution. */
  def sortableBitsDouble(s: Long): Double = {
    val b = if (s >= 0L) s else java.lang.Long.MIN_VALUE - s
    java.lang.Double.longBitsToDouble(b)
  }

  /** Plan-time literal-int extraction for SQL registration of
    * parameterized expressions: a clear analysis-time message instead of
    * an opaque eval failure when a column lands in a constant slot.
    */
  def litInt(e: Expression, fn: String, arg: String): Int =
    if (e.foldable) e.eval() match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    } else throw new IllegalArgumentException(
      s"$fn: $arg must be a literal, got ${e.sql}")

  /** First 15 hex chars of md5(s) as a 60-bit non-negative long — the shared
    * hashing primitive of SimHash/MinHash, chosen because both Spark and
    * DuckDB expose md5-as-hex so oracles can reproduce it exactly.
    */
  def md5Prefix60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    // 15 hex chars = 7.5 bytes: take 8 bytes, drop the low nibble
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** First 10 hex chars of md5(s) as a 40-bit non-negative long — the
    * MinHash base-hash width: narrow enough that (b1 + seed * b2) stays
    * clear of long overflow for any practical seed count.
    */
  def md5Prefix40(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 5) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Shared SimHash vote loop: per token, bits 0..(bits-1) of the 60-bit
    * md5-prefix hash vote +1/-1; the signature sets positively-voted bits.
    * Order-independent over the token array.
    */
  def simhash(arr: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < arr.numElements()) {
      val tok = arr.getUTF8String(i)
      if (tok != null) {
        val h = md5Prefix60(md, tok.toString)
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** One-pass char-distribution Shannon entropy in nats (see [[CharEntropy]]).
    * Static forwarder — called from generated code.
    */
  def charEntropy(u: UTF8String): Double = {
    val s = u.toString
    if (s.isEmpty) return 0.0
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Array[Int]] = null
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Int]]()
        val slot = other.get(cp)
        if (slot == null) other.put(cp, Array(1)) else slot(0) += 1
      }
    }
    val nd = n.toDouble
    var h = 0.0
    var c = 0
    while (c < 128) {
      if (ascii(c) > 0) { val p = ascii(c) / nd; h -= p * math.log(p) }
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) { val p = it.next()(0) / nd; h -= p * math.log(p) }
    }
    h
  }

  def rollingHash(s: String): Long = {
    if (s.isEmpty) 0L
    else {
      var h = s.charAt(0).toLong
      var i = 1
      while (i < s.length) { h = (h * 31L + s.charAt(i).toLong) % 1000000007L; i += 1 }
      h
    }
  }

  /** Content-defined chunk boundaries (Rabin-style): slide a `window`-char
    * hash over the text in ONE pass (rolling update, not per-position
    * rehash) and accept position i (1-based end) as a boundary when the
    * window hash ≡ 0 mod `modulus` AND the chunk since the last accepted
    * boundary is at least `minLen` chars. The window polynomial is the
    * same 31-base/1e9+7 scheme as [[rollingHash]], so a brute-force
    * engine (the DuckDB oracle) can recompute every window hash
    * independently and replay the acceptance fold — any rolling-update
    * bug (pop term, mod sign) diverges immediately. Positions and hash
    * inputs are CODE POINTS — the index space Spark's `length`/`substr`
    * and DuckDB's `ord`/`substr` share; UTF-16 units would silently
    * shift every boundary after the first astral character. Static
    * forwarder — called from generated code.
    */
  def cdcBounds(s: UTF8String, window: Int, modulus: Int, minLen: Int): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val cps = new Array[Int](n)
    var ci = 0
    var ck = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(ck) = cp
      ck += 1
      ci += Character.charCount(cp)
    }
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    if (n >= window && window > 0 && modulus > 0) {
      val P = 1000000007L
      var pow = 1L
      var k = 1
      while (k < window) { pow = pow * 31L % P; k += 1 }
      var h = 0L
      var prev = 0L
      var i = 0
      while (i < n) {
        val c = cps(i).toLong
        if (i < window) h = if (i == 0) c % P else (h * 31L + c) % P
        else h = (((h - cps(i - window).toLong * pow % P + P) % P) * 31L + c) % P
        if (i >= window - 1 && h % modulus == 0 && (i + 1).toLong - prev >= minLen) {
          prev = (i + 1).toLong
          out += prev
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result())
  }

  /** One-pass symmetric int8 quantization stats over a float vector (see
    * [[Int8QuantStats]]): scale = 127/max|x|, checksum = Σ q_i with
    * q_i = floor(x_i·scale + 0.5). floor(+0.5) — NOT Math.round-style
    * half-up vs the oracle's round-half-away — is chosen because the same
    * IEEE op sequence is expressible verbatim in DuckDB (`floor(x*s+0.5)`),
    * so halves break identically on both engines. Returns null for empty,
    * all-zero, or non-finite-max vectors (no sampling mass to scale).
    * Static forwarder — called from generated code.
    */
  def int8QuantStats(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    if (n == 0) return null
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      // null element poisons the vector to null output (the documented
      // contract, matching the DuckDB oracle) — without this check a null
      // slot reads as 0.0f and yields silently-wrong stats
      if (arr.isNullAt(i)) return null
      val a = math.abs(arr.getFloat(i).toDouble)
      // NaN fails every > compare, so it must be caught here, not on the
      // final max; one non-finite element poisons the vector by contract
      if (java.lang.Double.isNaN(a) || java.lang.Double.isInfinite(a)) return null
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    if (maxAbs == 0.0) return null
    val scale = 127.0 / maxAbs
    var checksum = 0L
    i = 0
    while (i < n) {
      checksum += math.floor(arr.getFloat(i).toDouble * scale + 0.5).toLong
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, checksum))
  }
}
