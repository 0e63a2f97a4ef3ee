package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrences of `phrase` (a pre-split token sequence) as CONSECUTIVE
  * non-empty elements of a token array, overlapping matches included —
  * one pass per row with byte-level UTF8String equality, no gram
  * strings ever materialized. Empty and null elements are skipped
  * WITHOUT breaking adjacency (exactly the `filter(split(...), len>0)`
  * tokenization every text operator here shares), so the raw split()
  * output feeds in directly and the whole projection stays in codegen.
  *
  * Exists because the compositional form (`transform(sequence(...), i
  * -> concat_ws(...))` + `filter(g = phrase)`) runs the lambda
  * interpreter per element AND allocates every n-gram string — on a
  * corpus scan the window walk IS the scan, and the HOF form measured
  * ~8x slower than this expression at sf0.1.
  */
case class TokenPhraseCount(child: Expression, phrase: Seq[String])
    extends UnaryExpression {
  require(phrase.nonEmpty && phrase.forall(_.nonEmpty),
    s"phrase must be non-empty tokens, got $phrase")

  // precomputed once per plan; UTF8String equality is a byte compare
  private val phraseUtf8: Array[UTF8String] =
    phrase.map(UTF8String.fromString).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_phrase_count expects array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phrase_count"

  def compute(input: ArrayData): Long = {
    val n = input.numElements()
    // positions of non-empty tokens: the phrase walks the FILTERED
    // sequence, so split() artifacts never break adjacency
    val idx = new Array[Int](n)
    var k = 0
    var t = 0
    while (t < n) {
      if (!input.isNullAt(t) && input.getUTF8String(t).numBytes() > 0) {
        idx(k) = t; k += 1
      }
      t += 1
    }
    val m = phraseUtf8.length
    var hits = 0L
    var i = 0
    while (i + m <= k) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        if (!phraseUtf8(j).equals(input.getUTF8String(idx(i + j)))) ok = false
        j += 1
      }
      if (ok) hits += 1
      i += 1
    }
    hits
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseCount", this, classOf[TokenPhraseCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  // the phrase is semantic state: equal CONTENT must canonicalize equal
  // (the PQOps stance) — Seq equality is structural, so the default
  // case-class semantics are already correct; nothing to override.

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
