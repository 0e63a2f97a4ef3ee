package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

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
