package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text form for exact dedup / fingerprinting:
  * Unicode NFC composition + trim + collapse whitespace runs to single
  * spaces + lowercase, in one pass — semantically identical to
  * `lower(regexp_replace(trim(normalize_nfc(text)), "\\s+", " "))` but
  * without running a regex engine over every byte (this IS the hot loop
  * of exact dedup at corpus scale: the md5 that follows consumes the
  * canonical form, and the groupBy shuffles only digests).
  *
  * NFC FIRST: canonically-equivalent strings ("café" composed vs
  * "cafe" + U+0301) byte-differ, so a canonical form that skips
  * composition hands the SAME logical document different fingerprints
  * and the exact-dedup gate waves the duplicate through — precisely the
  * failure [[NormalizeNfc]]'s rationale names. All-ASCII rows skip the
  * normalizer via [[NfcKernel.isAscii]] (ASCII is closed under NFC).
  * Stored fingerprint indexes built before NFC landed are invalidated by
  * the layout-cache version keys (`fpv=nfc`) — pre-NFC digests must not
  * be compared against post-NFC ones.
  *
  * Whitespace class matches Java regex `\s` exactly
  * (`[ \t\n\x0B\f\r]`) so results are bit-identical to the expression
  * formulation and to the DuckDB oracle's
  * `regexp_replace(trim(nfc_normalize(..)), '\s+', ..)` (utf8proc and
  * `java.text.Normalizer` both implement Unicode canonical composition).
  */
object CanonicalizeKernel {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String): UTF8String = {
    // step 0: canonical composition — ASCII fast path pays one byte scan,
    // already-NFC text pays one isNormalized scan, only decomposed rows
    // allocate a recomposed String
    val s0 = text.toString
    val s =
      if (NfcKernel.isAscii(text) ||
          java.text.Normalizer.isNormalized(s0, java.text.Normalizer.Form.NFC)) s0
      else java.text.Normalizer.normalize(s0, java.text.Normalizer.Form.NFC)
    // step 1: strip leading/trailing SPACES only — Spark's trim() (and
    // DuckDB's) does not touch \t\r\n etc., so a non-space whitespace run
    // at either end must survive into step 2 and collapse to one space
    var i0 = 0
    var i1 = s.length - 1
    while (i0 <= i1 && s.charAt(i0) == ' ') i0 += 1
    while (i1 >= i0 && s.charAt(i1) == ' ') i1 -= 1
    // step 2: collapse every \s+ run (anywhere, ends included) to ' '
    val sb = new java.lang.StringBuilder(i1 - i0 + 1)
    var i = i0
    while (i <= i1) {
      val c = s.charAt(i)
      if (isWs(c)) {
        while (i < i1 && isWs(s.charAt(i + 1))) i += 1
        sb.append(' ')
      } else sb.append(c)
      i += 1
    }
    // lowercase via UTF8String for parity with Spark's lower()
    UTF8String.fromString(sb.toString).toLowerCase
  }
}

case class CanonicalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "canonicalize_text"

  override def nullSafeEval(input: Any): Any =
    CanonicalizeKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.CanonicalizeKernel.compute($text);")

  override protected def withNewChildInternal(newChild: Expression): CanonicalizeText =
    copy(child = newChild)
}

object CanonicalizeText {
  def apply(text: Column): Column =
    ColumnBridge.column(CanonicalizeText(ColumnBridge.expression(text)))
}
