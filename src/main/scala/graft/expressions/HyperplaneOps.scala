package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Signed-random-hyperplane LSH bucket of a float/double vector,
  * computed natively in one pass per row.
  *
  * Bit p of the bucket string is '1' iff the projection of the vector
  * onto pseudo-plane p is >= 0, where plane p's weight for dimension i
  * is +1.0 / -1.0 according to the parity bit of md5("<p>|<i>") (first
  * hex digit >= 8). This is bit-for-bit the semantics of the composed
  * zip_with/aggregate/md5 form it replaces (and of the DuckDB oracle
  * for `dedup_embedding`): double widening of each element,
  * left-to-right accumulation from 0.0, a null element poisoning the
  * sum to null and thus the bit to '0', and a null vector yielding the
  * all-'0' bucket (`when(null >= 0, ...).otherwise("0")` semantics) —
  * so the expression is never null.
  *
  * Exists because the composed form is interpreted (HOFs are
  * CodegenFallback) and re-derives the plane signs with one md5 per
  * (plane, dim) PER ROW. Here the ±1 plane matrix is computed once per
  * expression instance (grown lazily to the widest row seen) and the
  * hot path is a fused multiply-add loop inside whole-stage codegen —
  * the same recipe that took MinHash/SimHash from tens of seconds to
  * sub-second ([[MinHashSignatures]]).
  *
  * Reference behavior: hyperplane-LSH candidate bucketing for embedding
  * near-dup detection (SURVEY §2 pipeline tier; reference similarity
  * pipeline in src/helpers/dedup.rs).
  */
case class HyperplaneBuckets(child: Expression, numPlanes: Int)
    extends UnaryExpression {
  require(numPlanes >= 1 && numPlanes <= 64, s"numPlanes must be in 1..64, got $numPlanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_bucket expects array<float> or array<double>, got $t")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hyperplane_bucket"

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** signs(i)(p) = ±1.0 for dimension i, plane p; grown atomically to
    * the widest vector seen (one md5 per (plane, dim) per executor,
    * not per row).
    */
  @transient private lazy val signsRef =
    new java.util.concurrent.atomic.AtomicReference[Array[Array[Double]]](Array.empty)

  private def signsFor(dim: Int): Array[Array[Double]] = {
    var cur = signsRef.get()
    while (cur.length < dim) {
      val next = Array.tabulate(dim) { i =>
        if (i < cur.length) cur(i)
        else Array.tabulate(numPlanes) { p =>
          val d = TextHash.md5()
          d.update(s"$p|$i".getBytes("UTF-8"))
          if ((d.digest()(0) & 0x80) != 0) 1.0 else -1.0
        }
      }
      signsRef.compareAndSet(cur, next)
      cur = signsRef.get()
    }
    cur
  }

  /** The all-'0' bucket a null vector maps to. */
  def zeros(): UTF8String = {
    val out = new Array[Byte](numPlanes)
    java.util.Arrays.fill(out, '0'.toByte)
    UTF8String.fromBytes(out)
  }

  def compute(input: ArrayData): UTF8String = {
    val n = input.numElements()
    // empty vector: the composed form's sequence(0, size-1) descends to
    // [0,-1], zip_with pads with nulls and the sum nulls out -> all '0'
    if (n == 0) return zeros()
    var i = 0
    while (i < n) {
      if (input.isNullAt(i)) return zeros() // null element -> null sums -> all bits '0'
      i += 1
    }
    val signs = signsFor(n)
    val out = new Array[Byte](numPlanes)
    var p = 0
    while (p < numPlanes) {
      var sum = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) input.getFloat(j).toDouble else input.getDouble(j)
        sum += x * signs(j)(p)
        j += 1
      }
      out(p) = if (sum >= 0) '1'.toByte else '0'.toByte
      p += 1
    }
    UTF8String.fromBytes(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) zeros() else compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplanes", this, classOf[HyperplaneBuckets].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        UTF8String ${ev.value} = ${childGen.isNull} ? $ref.zeros() : $ref.compute(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
