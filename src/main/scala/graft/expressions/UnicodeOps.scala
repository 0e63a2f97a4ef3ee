package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) as a native codegen'd
  * expression — the first pass of every text-dedup pipeline: the SAME
  * visible string can arrive precomposed (U+00E9) or decomposed
  * (U+0065 U+0301) depending on the source OS/editor/OCR stack, and
  * every downstream content hash, shingle, and exact-collapse treats
  * the two as different documents unless the corpus normalizes first.
  * NFC is the Unicode-standard canonical composition (UAX #15) — a
  * deterministic, engine-independent mapping, which is what lets the
  * oracle replay it (DuckDB `nfc_normalize`) value for value.
  *
  * Same preference order as the rest of the expression tier: a native
  * Expression keeps the projection inside whole-stage codegen, where a
  * UDF would box every row. The common case (already-NFC ASCII) hits
  * `Normalizer.isNormalized`'s quick check and returns the INPUT
  * UTF8String without copying.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NormalizeNfc].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Accent stripping: canonical decomposition (NFD) with every combining
  * mark (Unicode category Mn) removed — the normalization a fuzzy-
  * matching or search pipeline applies so 'café' and 'cafe' block to
  * the same deletion keys. Spec-graded against crafted values (not the
  * DuckDB oracle: utf8proc's `strip_accents` and this NFD-based form
  * agree on Latin scripts but are not contractually the same mapping
  * for every codepoint, and a silent divergence would be a flaky
  * oracle, not a bug).
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_strip_accents expects string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  private[this] val combiningMarks = java.util.regex.Pattern.compile("\\p{Mn}+")

  def compute(s: UTF8String): UTF8String = {
    val decomposed =
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    val stripped = combiningMarks.matcher(decomposed).replaceAll("")
    UTF8String.fromString(stripped)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stripAccents", this, classOf[StripAccents].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
