package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Product-quantization codes for an `array<float>` vector: the vector
  * is split into `codebooks.length` contiguous subvectors and each is
  * replaced by the index of its nearest (L2) centroid in that
  * subspace's codebook — the FAISS-style compressed representation.
  * `codebooks(m)(j)` is subspace m's centroid j; every codebook must
  * hold at most 256 centroids so a code fits one byte (stored as the
  * raw low byte, decoded with `& 0xFF`). Output is
  * `array<tinyint>` of length M — for a 64-dim float vector and M=8
  * that is 8 bytes in the candidate relation instead of 256, which is
  * the entire point at 100 TB: the ANN probe side shuffles and scans
  * codes, not vectors.
  *
  * Ties break to the lower centroid index. Dirty inputs NULL-poison
  * (the [[FloatDotProduct]] stance): a vector whose length differs
  * from M x subDim, or one carrying a null element, yields NULL rather
  * than a silently truncated encoding.
  */
case class PQEncodeCodes(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebooks")
  require(codebooks.forall(_.length <= 256), "a PQ codebook holds at most 256 centroids")
  private val subDim = codebooks(0)(0).length
  require(codebooks.forall(_.forall(_.length == subDim)), "ragged codebook centroids")

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_pq_encode expects array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  def compute(vecRaw: Any): Any = {
    val vec = vecRaw.asInstanceOf[ArrayData]
    val m = codebooks.length
    if (vec.numElements() != m * subDim) return null
    val codes = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val base = s * subDim
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        val cent = cb(j)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          if (vec.isNullAt(base + i)) return null
          val diff = vec.getFloat(base + i).toDouble - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best.toByte
      s += 1
    }
    new GenericArrayData(codes.map(b => b: Any))
  }

  override protected def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PQEncodeCodes].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
       |Object r = $ref.compute($v);
       |if (r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
     """.stripMargin)
  }

  // case-class equality on an Array field is reference equality, which
  // would make two semantically identical encodes never canonicalize
  // equal — defeating subexpression elimination and exchange reuse.
  // Compare codebook CONTENT instead.
  override def equals(other: Any): Boolean = other match {
    case that: PQEncodeCodes => child == that.child &&
      java.util.Arrays.deepEquals(
        codebooks.asInstanceOf[Array[AnyRef]], that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode + java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Orthogonal rotation of a float vector: `y = R x` with `R` a dim x
  * dim matrix (rows dotted against the input). The OPQ pre-transform
  * ([[graft.operators.Similarity.trainOpqRotation]]): rotating before
  * product quantization re-distributes variance across the subspaces so
  * the per-subspace codebooks spend their centroids where the data
  * actually varies, and because R is orthogonal every dot product and
  * norm is preserved — ADC scores computed in the rotated space rank
  * candidates for the ORIGINAL vectors. A narrow per-row projection;
  * NULL-poisons on a dimension mismatch or null element like the other
  * PQ expressions.
  */
case class RotateVector(child: Expression, matrix: Array[Array[Float]])
    extends UnaryExpression {
  require(matrix.nonEmpty && matrix.forall(_.length == matrix.length),
    "rotation matrix must be square")

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_rotate expects array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_rotate"

  def compute(vecRaw: Any): Any = {
    val vec = vecRaw.asInstanceOf[ArrayData]
    val d = matrix.length
    if (vec.numElements() != d) return null
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (vec.isNullAt(i)) return null
      x(i) = vec.getFloat(i).toDouble
      i += 1
    }
    val y = new Array[Float](d)
    i = 0
    while (i < d) {
      val row = matrix(i)
      var acc = 0.0
      var j = 0
      while (j < d) { acc += row(j) * x(j); j += 1 }
      y(i) = acc.toFloat
      i += 1
    }
    new GenericArrayData(y.map(f => f: Any))
  }

  override protected def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rotate", this, classOf[RotateVector].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
       |Object r = $ref.compute($v);
       |if (r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
     """.stripMargin)
  }

  // content-based equality for the Array matrix — see PQEncodeCodes
  override def equals(other: Any): Boolean = other match {
    case that: RotateVector => child == that.child &&
      java.util.Arrays.deepEquals(
        matrix.asInstanceOf[Array[AnyRef]], that.matrix.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode + java.util.Arrays.deepHashCode(matrix.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Residual PQ codes (FAISS `by_residual=true`): the vector's OFFSET
  * from its coarse centroid is what gets product-quantized, not the
  * vector itself — `codes = encode(v - coarseCents[cell])`. Residuals
  * concentrate near zero once the coarse quantizer has absorbed the
  * cell's mean, so the same code budget spends its centroids on a
  * tighter distribution and the quantization error drops. The residual
  * is never materialized as a column: this expression fuses the
  * subtraction into the subspace argmin scan, so the index build stays
  * one narrow projection.
  *
  * Under the dot-product metric the decomposition is additive —
  * `dot(q, v) ~ dot(q, cent_cell) + adc(lut, codes)` with the SAME
  * global-codebook LUT ([[PQQueryLut]] over the residual codebooks);
  * the per-cell-LUT cost FAISS pays for L2 residuals never arises, so
  * the query path stays M lookups plus one precomputed scalar.
  *
  * NULL-poisons like [[PQEncodeCodes]], plus when the cell is null or
  * out of range of the coarse centroid table.
  */
case class PQEncodeResidualCodes(
    left: Expression,
    right: Expression,
    coarseCents: Array[Array[Float]],
    codebooks: Array[Array[Array[Float]]]
) extends BinaryExpression {
  require(coarseCents.nonEmpty, "empty coarse centroids")
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebooks")
  require(codebooks.forall(_.length <= 256), "a PQ codebook holds at most 256 centroids")
  private val subDim = codebooks(0)(0).length
  require(codebooks.forall(_.forall(_.length == subDim)), "ragged codebook centroids")
  require(coarseCents.forall(_.length == codebooks.length * subDim),
    "coarse centroid dimension must equal numSub x subDim")

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode_residual expects (array<float>, int cell), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "graft_pq_encode_residual"

  def compute(vecRaw: Any, cellRaw: Any): Any = {
    val vec = vecRaw.asInstanceOf[ArrayData]
    val cell = cellRaw.asInstanceOf[Int]
    val m = codebooks.length
    if (vec.numElements() != m * subDim) return null
    if (cell < 0 || cell >= coarseCents.length) return null
    val cent = coarseCents(cell)
    val codes = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val base = s * subDim
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          if (vec.isNullAt(base + i)) return null
          val r = vec.getFloat(base + i).toDouble - cent(base + i)
          val diff = r - c(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best.toByte
      s += 1
    }
    new GenericArrayData(codes.map(b => b: Any))
  }

  override protected def nullSafeEval(v: Any, c: Any): Any = compute(v, c)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncodeRes", this, classOf[PQEncodeResidualCodes].getName)
    nullSafeCodeGen(ctx, ev, (v, c) => s"""
       |Object r = $ref.compute($v, $c);
       |if (r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
     """.stripMargin)
  }

  // content-based equality for both Array model fields — see PQEncodeCodes
  override def equals(other: Any): Boolean = other match {
    case that: PQEncodeResidualCodes => left == that.left && right == that.right &&
      java.util.Arrays.deepEquals(
        coarseCents.asInstanceOf[Array[AnyRef]], that.coarseCents.asInstanceOf[Array[AnyRef]]) &&
      java.util.Arrays.deepEquals(
        codebooks.asInstanceOf[Array[AnyRef]], that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * (31 * left.hashCode + right.hashCode)
      + java.util.Arrays.deepHashCode(coarseCents.asInstanceOf[Array[AnyRef]])) +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-query asymmetric-distance lookup table: for query vector q,
  * `lut[m * K + j] = dot(q_sub_m, codebooks(m)(j))` flattened over all
  * M subspaces (K = the uniform codebook size). Computed ONCE per
  * query row — a 256-dot projection on the tiny broadcast query side —
  * so scoring a candidate against the query costs M array lookups
  * ([[PQAdcDot]]) instead of a d-element dot product. This is the
  * classic ADC split: the per-pair inner loop touches only codes and
  * the table, never a float vector.
  *
  * NULL-poisons on a dimension mismatch or null element, like
  * [[PQEncodeCodes]].
  */
case class PQQueryLut(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebooks")
  private val subDim = codebooks(0)(0).length
  private val kCents = codebooks(0).length
  require(codebooks.forall(_.length == kCents),
    "PQ codebooks must be uniform-size for the flattened LUT layout")
  require(codebooks.forall(_.forall(_.length == subDim)), "ragged codebook centroids")

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_pq_lut expects array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  def compute(vecRaw: Any): Any = {
    val vec = vecRaw.asInstanceOf[ArrayData]
    val m = codebooks.length
    if (vec.numElements() != m * subDim) return null
    val lut = new Array[Float](m * kCents)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val base = s * subDim
      var j = 0
      while (j < kCents) {
        val cent = cb(j)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          if (vec.isNullAt(base + i)) return null
          acc += vec.getFloat(base + i).toDouble * cent(i)
          i += 1
        }
        lut(s * kCents + j) = acc.toFloat
        j += 1
      }
      s += 1
    }
    new GenericArrayData(lut.map(f => f: Any))
  }

  override protected def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, classOf[PQQueryLut].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
       |Object r = $ref.compute($v);
       |if (r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
     """.stripMargin)
  }

  // content-based equality for the Array codebooks — see PQEncodeCodes
  override def equals(other: Any): Boolean = other match {
    case that: PQQueryLut => child == that.child &&
      java.util.Arrays.deepEquals(
        codebooks.asInstanceOf[Array[AnyRef]], that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode + java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Approximate dot product of a query and a PQ-encoded candidate: sum
  * over subspaces of `lut[m * nCentroids + code_m]` — M float lookups
  * accumulated in double, the ADC hot loop. Generates a tight primitive
  * loop inside whole-stage codegen; no reference object needed since
  * both inputs are columns.
  *
  * NULL-poisons when the LUT length is not a multiple of the code
  * length (mismatched codebooks) or a code indexes past the LUT.
  */
case class PQAdcDot(left: Expression, right: Expression, nCentroids: Int)
    extends BinaryExpression {
  require(nCentroids >= 1 && nCentroids <= 256, s"nCentroids must be in [1,256], got $nCentroids")

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ByteType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc expects (array<float> lut, array<tinyint> codes), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (lut.numElements() != m * nCentroids) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val j = codes.getByte(s) & 0xFF
      if (j >= nCentroids) return null
      acc += lut.getFloat(s * nCentroids + j).toDouble
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val m = ctx.freshName("pqM")
      val acc = ctx.freshName("pqAcc")
      val s = ctx.freshName("pqS")
      val j = ctx.freshName("pqJ")
      s"""
         |int $m = $codes.numElements();
         |if ($lut.numElements() != $m * $nCentroids) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $s = 0; $s < $m; $s++) {
         |    if ($codes.isNullAt($s)) { ${ev.isNull} = true; break; }
         |    int $j = $codes.getByte($s) & 0xFF;
         |    if ($j >= $nCentroids) { ${ev.isNull} = true; break; }
         |    $acc += (double) $lut.getFloat($s * $nCentroids + $j);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
