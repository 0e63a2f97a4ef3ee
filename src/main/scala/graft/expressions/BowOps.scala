package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared hashed-bag-of-words feature hashing — ONE function used by
  * both the driver-side trainer ([[graft.operators.QualityClassifier]])
  * and the distributed scorer ([[HashedBowScore]]), so train-time and
  * serve-time features cannot diverge. FNV-1a 64 over the token's
  * UTF-8 bytes, murmur-finalized, folded into [0, numFeatures).
  */
object BowHashing {
  private final val B = 0x100000001b3L

  private def fmix64(v: Long): Long = {
    var x = v
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  def tokenIndex(s: UTF8String, numFeatures: Int): Int = {
    var h = 0xcbf29ce484222325L
    var i = 0
    val nb = s.numBytes()
    while (i < nb) { h ^= (s.getByte(i) & 0xffL); h *= B; i += 1 }
    (((fmix64(h) >>> 1) % numFeatures)).toInt
  }

  def tokenIndex(s: String, numFeatures: Int): Int =
    tokenIndex(UTF8String.fromString(s), numFeatures)
}

/** Linear hashed-bag-of-words score for a token array:
  * `sigmoid(bias + sum over tokens of weights[hash(token)])` — the
  * serve path of a fastText-style text classifier. The weight table
  * ships with the plan (numFeatures floats); scoring is a narrow
  * per-row projection, no shuffle, no vector column, no UDF. Null
  * token arrays yield null; null ELEMENTS cannot occur from split().
  */
case class HashedBowScore(child: Expression, weights: Array[Float], bias: Double)
    extends UnaryExpression {
  require(weights.nonEmpty, "empty weight table")

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bow_score expects array<string>, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_bow_score"

  def compute(raw: Any): Any = {
    val toks = raw.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var acc = bias
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        // skip empty tokens (split() emits them around doubled or
        // trailing spaces) exactly as the trainer does — the "" feature
        // must not exist on either side of the train/serve contract
        if (t.numBytes() > 0)
          acc += weights(BowHashing.tokenIndex(t, weights.length))
      }
      i += 1
    }
    1.0 / (1.0 + math.exp(-acc))
  }

  override protected def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bowScore", this, classOf[HashedBowScore].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = (double) (Double) $ref.compute($v);")
  }

  // content-based equality for the Array weight table — same stance as
  // the PQ expressions' codebooks
  override def equals(other: Any): Boolean = other match {
    case that: HashedBowScore => child == that.child && bias == that.bias &&
      java.util.Arrays.equals(weights, that.weights)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + java.lang.Double.hashCode(bias)) +
      java.util.Arrays.hashCode(weights)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
