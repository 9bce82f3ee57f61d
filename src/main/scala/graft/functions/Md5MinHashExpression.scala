package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Map-side kernel for the ENGINE-PORTABLE md5 MinHash signature:
  * `sig_p = MIN over shingles of slice p%4 of md5("<p/4>:<shingle>")`,
  * where a slice is 8 hex chars read as an unsigned 32-bit integer —
  * BIT-IDENTICAL to the relational spelling
  * `min(conv(substr(md5(concat('<j>:', sh)), 1+8*(p%4), 8), 16, 10))`
  * that the DuckDB oracles run ([[graft.operators.Dedup.portableMinhash]]).
  *
  * Why a kernel: the relational spelling must EXPLODE the shingle stream
  * and groupBy doc to take the k mins — at 100 TB that shuffles the
  * entire corpus's shingle stream once per audit run. The same k values
  * computed per row in one compiled pass make the portable signature
  * stage shuffle-free (exactly like the production xxhash64
  * [[MinHashSignature]] path), while every output bit stays reproducible
  * by any SQL engine. md5 here IS md5 (`java.security.MessageDigest`,
  * thread-local instance), so equality with the oracle is by definition
  * of the digest, not by luck.
  */
object Md5MinHashKernel {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[functions] def digestInstance(): java.security.MessageDigest = md5.get()

  // "<j>:" prefixes for j in [0, 16) — covers k up to 64 (k/4 digests)
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(16)(j => (j.toString + ":").getBytes("US-ASCII"))

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val digests = k / 4
    val mins = Array.fill(k)(Long.MaxValue)
    val d = md5.get()
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i).getBytes
        var j = 0
        while (j < digests) {
          d.reset()
          d.update(prefixes(j))
          d.update(s)
          val h = d.digest() // 16 bytes
          var p = 0
          while (p < 4) {
            // 8 hex chars = 4 digest bytes, big-endian, unsigned
            val o = p * 4
            val v = ((h(o) & 0xFFL) << 24) | ((h(o + 1) & 0xFFL) << 16) |
              ((h(o + 2) & 0xFFL) << 8) | (h(o + 3) & 0xFFL)
            val idx = j * 4 + p
            if (v < mins(idx)) mins(idx) = v
            p += 1
          }
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

case class PortableMinHash(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0 && k % 4 == 0 && k <= 64,
    s"k must be a positive multiple of 4 up to 64, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_minhash"

  override def nullSafeEval(input: Any): Any =
    Md5MinHashKernel.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.Md5MinHashKernel.compute($arr, $k);")

  override protected def withNewChildInternal(newChild: Expression): PortableMinHash =
    copy(child = newChild)
}

object PortableMinHash {
  def apply(shingles: Column, k: Int): Column =
    ColumnBridge.column(PortableMinHash(ColumnBridge.expression(shingles), k))
}

/** Map-side kernel for the engine-portable 16-bit SimHash
  * ([[graft.operators.Dedup.portableSimhash]]): bit p of the fingerprint
  * is the sign of the ±1 vote sum over the doc's DISTINCT shingles, where
  * a shingle votes +1 on bit p iff hex digit p of `md5(shingle)` has its
  * high nibble bit set (digit in '8'..'f') — bit-identical to the
  * relational explode + 16-vote-column groupBy the DuckDB oracle runs,
  * computed in one compiled pass with ONE md5 per shingle and no shuffle.
  * Pass DISTINCT shingles (`array_distinct` upstream): votes, unlike
  * mins, are multiplicity-sensitive.
  */
object Md5SimHash16Kernel {
  def compute(shingles: ArrayData): Long = {
    val votes = new Array[Int](16)
    val d = Md5MinHashKernel.digestInstance()
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        d.reset()
        d.update(shingles.getUTF8String(i).getBytes)
        val h = d.digest()
        var p = 0
        while (p < 16) {
          // hex digit p+1 = byte p/2, high nibble for even p (1st, 3rd, …
          // hex chars), low nibble for odd p; '8'..'f' ⇔ nibble >= 8
          val nib =
            if ((p & 1) == 0) (h(p / 2) >> 4) & 0xF else h(p / 2) & 0xF
          votes(p) += (if (nib >= 8) 1 else -1)
          p += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var p = 0
    while (p < 16) {
      if (votes(p) > 0) fp |= 1L << p
      p += 1
    }
    fp
  }
}

case class PortableSimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_simhash16"

  override def nullSafeEval(input: Any): Any =
    Md5SimHash16Kernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.Md5SimHash16Kernel.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): PortableSimHash16 =
    copy(child = newChild)
}

object PortableSimHash16 {
  def apply(shingles: Column): Column =
    ColumnBridge.column(PortableSimHash16(ColumnBridge.expression(shingles)))
}

/** Map-side kernel for the sliced CMS bucket family
  * ([[graft.operators.HeavyHitters.cmsCells]]): the 16 md5 bytes of
  * ONE digest of the term split into four 4-byte big-endian unsigned
  * windows, each mod `width` — bit-identical to the relational spelling
  * `conv(substr(md5(term), 8d+1, 8), 16, 10) % width` the DuckDB oracles
  * run, computed without materializing the hex string or paying four
  * `conv` base conversions per row (the join-cardinality estimator spent
  * most of its time in that chain).
  */
object Md5SlicesKernel {
  /** width > 0: each slice mod width (the CMS bucket id); width <= 0:
    * the RAW unsigned 32-bit slice value (callers derive bucket AND sign
    * bits from independent bit ranges — the AGMS spelling).
    */
  def compute(term: org.apache.spark.unsafe.types.UTF8String,
              width: Int): ArrayData = {
    val d = Md5MinHashKernel.digestInstance()
    d.reset()
    d.update(term.getBytes)
    val h = d.digest()
    val out = new Array[Long](4)
    var p = 0
    while (p < 4) {
      val o = p * 4
      val v = ((h(o) & 0xFFL) << 24) | ((h(o + 1) & 0xFFL) << 16) |
        ((h(o + 2) & 0xFFL) << 8) | (h(o + 3) & 0xFFL)
      out(p) = if (width > 0) v % width else v
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class Md5Slices(child: Expression, width: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_slices"

  override def nullSafeEval(input: Any): Any =
    Md5SlicesKernel.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5SlicesKernel.compute($s, $width);")

  override protected def withNewChildInternal(newChild: Expression): Md5Slices =
    copy(child = newChild)
}

object Md5Slices {
  def apply(term: Column, width: Int): Column =
    ColumnBridge.column(Md5Slices(ColumnBridge.expression(term), width))
}
