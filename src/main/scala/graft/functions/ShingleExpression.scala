package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling as one compiled kernel (tokenize + window + join
  * in a single pass), replacing the interpreted higher-order chain
  * `filter(split(...)) → transform(sequence, i → array_join(slice(...)))`,
  * which pays per-element lambda dispatch for every token of every doc —
  * the dominant cost of the whole MinHash pipeline when measured at sf0.1.
  *
  * Semantics match the expression formulation exactly: whitespace
  * tokenization of the trimmed text (Java `\s+`), empty text → empty
  * array, fewer than n tokens → ONE shingle of all tokens, otherwise
  * len−n+1 shingles of n space-joined consecutive tokens.
  */
object ShingleKernel {
  def compute(text: UTF8String, n: Int): ArrayData = {
    // trim SPACES only — Spark's trim()/DuckDB's trim() don't touch
    // control chars or \t\r\n, and Java String.trim (which strips
    // everything <= U+0020) would silently change tokens on scraped text
    val s = text.toString
    var i0 = 0
    var i1 = s.length - 1
    while (i0 <= i1 && s.charAt(i0) == ' ') i0 += 1
    while (i1 >= i0 && s.charAt(i1) == ' ') i1 -= 1
    if (i0 > i1) return new GenericArrayData(Array.empty[Any])
    // leading non-space whitespace leaves an empty first token after the
    // regex split — filtered, matching filter(split(...), len > 0)
    val toks = s.substring(i0, i1 + 1).split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return new GenericArrayData(Array.empty[Any])
    val m = math.max(toks.length - n, 0) + 1
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle length must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.ShingleKernel.compute($text, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
