package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus preparation — one fused map-side
  * pass: NFD-decompose, drop combining marks (accent strip), lowercase per
  * code point, collapse `\s+` runs to single spaces, trim. The standard
  * pre-tokenization cleanup of public corpus pipelines (canonical forms so
  * "Café", "café " and "cafe" dedupe/count together).
  *
  * Why a custom expression: Spark has no NFD/strip-accents built-in; the
  * alternatives are a Scala UDF (opaque to codegen, per-row encoder
  * round-trip) or a chain of regexp_replace calls that can't decompose
  * Unicode at all. This stays inside whole-stage codegen via a static
  * JDK-only helper (`java.text.Normalizer`). Semantics match DuckDB's
  * `lower(strip_accents(...))` (utf8proc) on Latin text — the oracle twin.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NormalizeText.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {

  /** ASCII `\s` class — exactly what the DuckDB oracle's RE2 `\s+` matches,
    * so whitespace collapse agrees across engines byte for byte.
    */
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  def compute(text: UTF8String): UTF8String = {
    val nfd = java.text.Normalizer.normalize(text.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    var pendingSpace = false
    var emitted = false
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      i += Character.charCount(cp)
      if (isWs(cp)) {
        pendingSpace = true
      } else if (Character.getType(cp) != Character.NON_SPACING_MARK) {
        if (pendingSpace && emitted) sb.append(' ')
        pendingSpace = false
        sb.appendCodePoint(Character.toLowerCase(cp))
        emitted = true
      }
    }
    UTF8String.fromString(sb.toString)
  }
}
