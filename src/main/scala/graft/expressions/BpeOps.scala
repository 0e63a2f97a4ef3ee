package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a trained BPE merge list to a text column: each whitespace
  * word becomes its character symbols plus the `</w>` end-of-word
  * marker, then merges apply GREEDILY BY RANK (always the lowest-rank
  * applicable merge next — the standard encoder, which reproduces
  * exactly the segmentation the training procedure would have reached
  * on that word). Output is the flat token stream across words,
  * `array<string>`.
  *
  * Scale shape: a narrow per-row projection — the merge-rank map is
  * built once per expression instance and shipped with the plan, the
  * corpus side never shuffles, and application is embarrassingly
  * parallel. Per word the encoder does one rank scan per applied merge
  * (O(len) each, at most len merges), the same bound the reference BPE
  * encoders have. Null text yields null; characters never seen in
  * training simply stay single-character symbols (BPE's open-vocabulary
  * property — no OOV).
  */
case class BpeEncodeTokens(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression {

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_encode expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      // a space cannot appear inside a symbol (words are space-split
      // and the </w> sentinel has none), so it is a safe pair-key
      // separator
      m.put(merges(i)._1 + " " + merges(i)._2, i)
      i += 1
    }
    m
  }

  private def encodeWord(w: String, out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    var syms = new java.util.ArrayList[String](w.length + 1)
    var i = 0
    while (i < w.length) {
      // keep surrogate pairs whole: a supplementary-plane char is one
      // symbol, not two broken halves
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(w.substring(i, i + n))
      i += n
    }
    syms.add(graft.operators.BpeTokenizer.EndOfWord)
    var continue = syms.size > 1
    while (continue) {
      // lowest-rank applicable merge in this word
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = rank.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) continue = false
      else {
        syms.set(bestAt, syms.get(bestAt) + syms.get(bestAt + 1))
        syms.remove(bestAt + 1)
      }
    }
    var k = 0
    while (k < syms.size) { out += UTF8String.fromString(syms.get(k)); k += 1 }
  }

  def compute(raw: Any): Any = {
    val text = raw.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) encodeWord(text.substring(start, i), out)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncodeTokens].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($v);")
  }

  // content-based equality for the Array merge list — same stance as
  // the PQ expressions' codebooks
  override def equals(other: Any): Boolean = other match {
    case that: BpeEncodeTokens => child == that.child && merges.sameElements(that.merges)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode + java.util.Arrays.hashCode(merges.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
