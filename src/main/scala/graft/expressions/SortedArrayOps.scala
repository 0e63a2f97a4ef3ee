package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Intersection SIZE of two SORTED, DISTINCT, null-free string arrays
  * via a single two-pointer merge scan — O(n+m), no hash set, no
  * result-array allocation.
  *
  * Exists for the Jaccard verify hot path: `array_intersect` +
  * `array_union` each build and materialize a full result array per
  * row just to take its size; over tens of millions of candidate pairs
  * that allocation dominates. With sorted distinct inputs,
  * |union| = |a| + |b| - |intersect|, so this one expression replaces
  * both. Inputs MUST be sorted ascending and distinct (as produced by
  * `array_sort(array_distinct(...))`) with no null elements — the
  * merge scan silently under-counts otherwise.
  *
  * Same preference order as [[FloatDotProduct]]: a native codegen'd
  * Expression beats composing allocation-heavy built-ins.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_intersect_size expects (array<string>, array<string>), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_size"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: several instances of this expression can share one
      // generated function
      val na = ctx.freshName("gisNa")
      val nb = ctx.freshName("gisNb")
      val i = ctx.freshName("gisI")
      val j = ctx.freshName("gisJ")
      val n = ctx.freshName("gisN")
      val c = ctx.freshName("gisC")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0, $j = 0, $n = 0;
         |while ($i < $na && $j < $nb) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
