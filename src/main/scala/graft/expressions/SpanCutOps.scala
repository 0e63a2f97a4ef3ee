package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokens NOT covered by any `spanTokens`-wide window starting at one
  * of `starts` (1-based token positions, SORTED ascending, null-free —
  * as produced by `sort_array(collect_set(start_pos))`), via a single
  * two-pointer merge scan: walk token positions once, advancing a
  * pointer through the start list and carrying the furthest covered
  * position, so each row costs O(tokens + spans) instead of the
  * O(tokens × spans) an `exists()` probe per token pays. That bound is
  * the difference on the template-page worst case — a doc that is
  * nearly ALL distinct repeated spans degrades the probe form toward
  * O(tokens²) while this stays linear.
  *
  * A position p (1-based) is cut iff some start s satisfies
  * s <= p <= s + spanTokens - 1. Null token elements pass through
  * unchanged (position arithmetic, not content, decides the cut). An
  * unsorted or null-bearing start list silently mis-cuts — same
  * contract stance as [[SortedIntersectSize]].
  *
  * Same preference order as [[FloatDotProduct]]: a native codegen'd
  * Expression beats composing interpreted higher-order functions —
  * `filter`/`exists` lambdas are CodegenFallback and drop the cut
  * projection out of whole-stage codegen on top of the worse bound.
  */
case class CutSpannedTokens(left: Expression, right: Expression, spanTokens: Int)
    extends BinaryExpression {
  require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cut_spans expects (array<string>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = left.dataType match {
    case ArrayType(_, n) => ArrayType(StringType, containsNull = n)
    case _ => ArrayType(StringType)
  }
  override def prettyName: String = "graft_cut_spans"

  def compute(tokens: ArrayData, starts: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val m = starts.numElements()
    val kept = new Array[AnyRef](n)
    var k = 0
    var j = 0
    var covered = 0L // furthest 1-based position any seen span covers
    var p = 1
    while (p <= n) {
      while (j < m && starts.getLong(j) <= p) {
        val end = starts.getLong(j) + (spanTokens - 1)
        if (end > covered) covered = end
        j += 1
      }
      if (p > covered) {
        kept(k) = if (tokens.isNullAt(p - 1)) null else tokens.getUTF8String(p - 1)
        k += 1
      }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(kept, k).asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cutSpans", this, classOf[CutSpannedTokens].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `spanTokens`-wide window fingerprints of a token array in ONE
  * pass: element i (0-based) is a 64-bit key identifying the window of
  * tokens [i, i + spanTokens). Each token is hashed ONCE (FNV-1a 64
  * over its UTF-8 bytes, murmur-finalized so the polynomial combine
  * sees avalanched inputs) and windows roll in O(1), so a doc costs
  * O(tokens) — versus the O(tokens x spanTokens) string build + 128-bit
  * md5 PER WINDOW the previous span candidate generator paid, which
  * existed only to be oracle-reproducible and was ~2x the whole query's
  * DuckDB time by itself. The key is an OPAQUE fingerprint: stable
  * across partitionings and engines running this expression, but not a
  * content standard like md5 — graded surfaces re-derive the span TEXT
  * for surviving rows instead of exposing the key
  * (`Dedup.repeatedSpansWithText`).
  *
  * Collisions merge two distinct windows into one candidate group:
  * probability ~2^-64 per window pair (avalanched inputs, odd
  * multiplier), negligible against corpus sizes where this matters and
  * strictly a CANDIDATE-side artifact — the span text re-derivation
  * downstream never fabricates matches from a collision alone, though
  * a collided group could inflate a distinct-doc count. Shorter-than-
  * span docs return an empty array. Null tokens hash to a fixed
  * constant (split() never produces them; position math stays intact
  * if a caller's do).
  */
case class RollingTokenHashes(child: Expression, spanTokens: Int) extends UnaryExpression {
  require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_span_hashes expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_span_hashes"

  private[this] final val B = 0x100000001b3L // FNV-1a prime (odd: invertible mod 2^64)
  // B^(spanTokens-1), the weight the outgoing token carries in a window
  private[this] lazy val bPow: Long = {
    var p = 1L; var i = 0
    while (i < spanTokens - 1) { p *= B; i += 1 }
    p
  }

  private def fmix64(v: Long): Long = {
    var x = v
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  private def tokenHash(s: UTF8String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    val nb = s.numBytes()
    while (i < nb) { h ^= (s.getByte(i) & 0xffL); h *= B; i += 1 }
    fmix64(h)
  }

  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < spanTokens) return new GenericArrayData(new Array[Long](0))
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (tokens.isNullAt(i)) fmix64(B) else tokenHash(tokens.getUTF8String(i))
      i += 1
    }
    val out = new Array[Long](n - spanTokens + 1)
    var k = 0L
    i = 0
    while (i < spanTokens) { k = k * B + th(i); i += 1 }
    out(0) = k
    i = 1
    while (i <= n - spanTokens) {
      k = (k - th(i - 1) * bPow) * B + th(i + spanTokens - 1)
      out(i) = k
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingHashes", this, classOf[RollingTokenHashes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
