package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary scan as ONE fused pass: for text of
  * n code points, emit every position i (1-based, i >= 8) where the
  * 8-term base-31 polynomial over code points [i-7..i] satisfies
  * h % 64 == 0 — exactly the
  * [[graft.operators.TextAnalysis]] CDC rule and its DuckDB list-lambda
  * twin (`ord` per `string_split` element = code point per character).
  *
  * The HOF spelling (split → transform(ascii) → filter(sequence)) walks
  * the text once per STAGE and materializes a per-char string array;
  * this kernel is a single rolling loop over code points with O(1)
  * state — the same results, a fraction of the work, and it keeps the
  * whole chunking pipeline inside whole-stage codegen.
  */
object CdcKernel {
  private val P = Array(27512614111L, 887503681L, 28629151L, 923521L,
    29791L, 961L, 31L, 1L)

  def boundaries(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n < 8) return new GenericArrayData(Array.empty[Int])
    // rolling window of the last 8 code points; recompute h by the same
    // 8-term sum as the twin (exact integers, no modular rolling update
    // needed: 31^7·maxCp·8 < 2^63)
    val win = new Array[Long](8)
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var ci = 0 // char (UTF-16) index
    var i = 0  // code-point ordinal, 0-based
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      win(i % 8) = cp.toLong
      if (i >= 7) {
        var h = 0L
        var j = 0
        while (j < 8) {
          h += win((i - 7 + j) % 8) * P(j)
          j += 1
        }
        if (h % 64 == 0) out += (i + 1) // 1-based boundary position
      }
      ci += Character.charCount(cp)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class CdcBoundaries(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    CdcKernel.boundaries(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.CdcKernel.boundaries($text);")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  def apply(text: Column): Column =
    ColumnBridge.column(CdcBoundaries(ColumnBridge.expression(text)))
}
