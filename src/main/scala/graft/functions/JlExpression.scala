package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused Johnson–Lindenstrauss projection kernel — the CdcBoundaries
  * lesson applied to the JL sketch: the relational spelling is a
  * P×D-term expression tree (16×64 = 1024 multiply-adds inlined into
  * whole-stage codegen, which mostly costs JIT/compile time), while this
  * kernel is one compiled double loop over the same arithmetic.
  *
  * Semantics are BIT-IDENTICAL to the relational spelling the DuckDB
  * oracle runs (spec-pinned against the HOF formulation):
  *   q_d   = round(x_d · 10000) half-AWAY-FROM-ZERO (Spark `round` /
  *           DuckDB `round` double semantics), as a long
  *   out_p = Σ_d q_d · s(p,d), with s(p,d) = +1 iff the first 32 bits of
  *           md5("jl:p:d") are even — the engine-portable Rademacher
  *           matrix, derived once per (P,D) and cached.
  * Integer sums are order-independent, so the kernel, the expression
  * tree, and the SQL twin cannot disagree by summation order.
  */
object JlKernel {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Long]]()

  def signs(p: Int, d: Int): Array[Long] =
    cache.computeIfAbsent((p, d), { key =>
      val (np, nd) = key
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Long](np * nd)
      var i = 0
      while (i < np) {
        var j = 0
        while (j < nd) {
          val h = md.digest(s"jl:$i:$j".getBytes("UTF-8"))
          md.reset()
          val v = ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
            ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
          out(i * nd + j) = if (v % 2 == 0) 1L else -1L
          j += 1
        }
        i += 1
      }
      out
    })

  /** round-half-away-from-zero of x·10000 — Spark/DuckDB `round` on
    * doubles, NOT java.lang.Math.round (which rounds -2.5 toward +∞).
    */
  private def fx(x: Double): Long = {
    val s = x * 10000.0
    if (s >= 0) math.floor(s + 0.5).toLong else math.ceil(s - 0.5).toLong
  }

  /** Returns null when ANY element is null: parquet embedding schemas
    * carry containsNull=true, and `getDouble` on a null slot would
    * silently read 0.0 (UnsafeArrayData) — a corrupt vector projected as
    * if real. The relational twin propagates the null through every
    * `round`/`aggregate` term (16 null projections); the kernel collapses
    * that to one NULL sketch, which downstream distance math treats the
    * same way (any arithmetic against it is null).
    */
  def project(arr: ArrayData, p: Int): ArrayData = {
    val d = arr.numElements()
    val sg = signs(p, d)
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i)) return null
      q(i) = fx(arr.getDouble(i)); i += 1
    }
    val out = new Array[Long](p)
    var pp = 0
    while (pp < p) {
      var acc = 0L
      var dd = 0
      val off = pp * d
      while (dd < d) { acc += q(dd) * sg(off + dd); dd += 1 }
      out(pp) = acc
      pp += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class JlProject(child: Expression, p: Int) extends UnaryExpression {

  require(p > 0, s"projection count must be positive, got $p")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "jl_project"

  // a non-null array with a null ELEMENT projects to null (JlKernel.project
  // contract), so the result is nullable whenever elements can be null
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override def nullSafeEval(input: Any): Any =
    JlKernel.project(input.asInstanceOf[ArrayData], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      if (nullable)
        s"""${ev.value} = graft.functions.JlKernel.project($v, $p);
           |${ev.isNull} = ${ev.value} == null;""".stripMargin
      else
        s"${ev.value} = graft.functions.JlKernel.project($v, $p);")

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

object JlProject {
  def apply(vec: Column, p: Int): Column =
    ColumnBridge.column(JlProject(ColumnBridge.expression(vec), p))
}
