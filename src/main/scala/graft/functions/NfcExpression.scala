package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression — the text-cleanup
  * step a web corpus runs BEFORE fingerprinting/shingling: canonically
  * equivalent strings ("café" composed vs "cafe" + U+0301) byte-differ, so
  * un-normalized text defeats exact dedup, splits n-gram statistics, and
  * double-counts vocabulary. Spark ships no normalizer function; this
  * wraps `java.text.Normalizer` (Form.NFC) with an `isNormalized` fast
  * path, so the common all-ASCII row pays one scan and ZERO allocation.
  * The DuckDB oracle replays it as `nfc_normalize` (utf8proc) — both
  * implement Unicode canonical composition, so outputs agree byte-for-byte.
  */
object NfcKernel {
  /** Pure-ASCII byte scan on the raw UTF8String: ASCII is closed under
    * NFC, so an all-ASCII row returns its input with ZERO allocation —
    * no toString, no Normalizer. Only rows carrying a non-ASCII byte pay
    * the String materialization + isNormalized check.
    */
  def isAscii(text: UTF8String): Boolean = {
    val n = text.numBytes
    var i = 0
    while (i < n) {
      if ((text.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def compute(text: UTF8String): UTF8String = {
    if (isAscii(text)) return text
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.NfcKernel.compute($text);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {
  def apply(text: Column): Column =
    ColumnBridge.column(NormalizeNfc(ColumnBridge.expression(text)))
}
