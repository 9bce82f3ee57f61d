package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass fused token statistics: token count, summed token length,
  * BPE-ish subword count, stopword hits, and per-language marker-token
  * hits — everything the quality/langid family derives per document — in
  * a SINGLE walk over the text with no intermediate token array.
  *
  * Why a kernel: the expression spelling (`size(filter(tk, ...))` per
  * stopword/marker list + `aggregate(tk, ...)` for lengths) pays
  * interpreted per-element lambda dispatch — higher-order functions do not
  * participate in whole-stage codegen — and materializes the token array
  * once per row even when tokenization itself is hoisted. At ~200 tokens ×
  * 8 derived columns that is ~1600 boxed lambda calls per document; this
  * kernel is one compiled loop, dispatching each token against O(1) hash
  * sets.
  *
  * Token semantics match [[ShingleKernel]] with n=1 exactly (maximal runs
  * of non-`\s` chars of the space-trimmed text); lengths are code-point
  * counts (Spark `length()`), matching `aggregate(tk, 0L, acc+length(t))`;
  * the stopword/marker membership test lowercases with `Locale.ROOT`,
  * matching `lower(t).isInCollection(...)` for the ASCII word lists used
  * here. Subwords = Σ ceil(len/4), matching `ceil(length(t)/4.0)`.
  */
object TokenStatsKernel {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String, stop: java.util.HashSet[String],
              markers: Array[java.util.HashSet[String]]): InternalRow = {
    val s = text.toString
    val len = s.length
    var nTokens = 0
    var sumLen = 0L
    var nSub = 0L
    var stopHits = 0
    val hits = new Array[Int](markers.length)
    var i = 0
    while (i < len) {
      if (isWs(s.charAt(i))) i += 1
      else {
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        nTokens += 1
        // code points, not UTF-16 units — matches Spark length()
        val chars = s.codePointCount(start, i)
        sumLen += chars
        nSub += (chars + 3) / 4
        val lower = s.substring(start, i).toLowerCase(java.util.Locale.ROOT)
        if (stop.contains(lower)) stopHits += 1
        var k = 0
        while (k < markers.length) {
          if (markers(k).contains(lower)) hits(k) += 1
          k += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](nTokens, sumLen, nSub, stopHits,
      UnsafeArrayData.fromPrimitiveArray(hits)))
  }
}

case class TokenStats(child: Expression, stopwords: Seq[String],
                      markerSets: Seq[Seq[String]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_subwords", LongType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("marker_hits", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def prettyName: String = "token_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }
  @transient private lazy val markerArr: Array[java.util.HashSet[String]] =
    markerSets.map { ms =>
      val s = new java.util.HashSet[String]()
      ms.foreach(s.add)
      s
    }.toArray

  override def nullSafeEval(input: Any): Any =
    TokenStatsKernel.compute(input.asInstanceOf[UTF8String], stopSet, markerArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hashSet = "java.util.HashSet<String>"
    val stopRef = ctx.addReferenceObj("tokenStatsStop", stopSet, hashSet)
    val markersRef = ctx.addReferenceObj("tokenStatsMarkers", markerArr,
      s"java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.TokenStatsKernel.compute($text, $stopRef, $markersRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  def apply(text: Column, stopwords: Seq[String],
            markerSets: Seq[Seq[String]]): Column =
    ColumnBridge.column(
      TokenStats(ColumnBridge.expression(text), stopwords, markerSets))
}
