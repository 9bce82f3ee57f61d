package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Native Catalyst kernels for vector math over `array<double>`.
  *
  * Spark's higher-order array functions (`zip_with` + `aggregate`) express
  * cosine similarity correctly but evaluate interpreted (lambda dispatch per
  * element, no whole-stage codegen). For brute-force similarity scans the
  * dot product IS the workload, so this is the one place the engine drops to
  * a custom `Expression` with `doGenCode`: a fused dot/norm/cosine loop that
  * codegens to a tight primitive-double `for` loop inside the stage.
  *
  * Null or length-mismatched inputs yield null (same as zip_with padding
  * semantics would yield garbage — we reject instead).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.checkDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xv = $x.getDouble($i);
         |    final double $yv = $y.getDouble($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  final double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |  if ($denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance — the IVF centroid-assignment kernel. */
case class L2Squared(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.checkDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_squared"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $d = $x.getDouble($i) - $y.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}

/** Plain dot product — pair with precomputed [[VectorNorm]]s when many
  * pairs share a row (brute-force top-k recomputing norms per pair wastes
  * |Q|× the norm work on every corpus row).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.checkDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $acc += $x.getDouble($i) * $y.getDouble($i); }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Euclidean norm of one vector. */
case class VectorNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    java.lang.Double.valueOf(math.sqrt(acc))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { final double $v = $x.getDouble($i); $acc += $v * $v; }
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

object VectorFunctions {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graftbridge.ColumnBridge

  private[functions] def checkDoubleArrays(
      name: String, left: Expression, right: Expression): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Column wrappers over the native kernels. */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2_squared(a: Column, b: Column): Column =
    ColumnBridge.column(L2Squared(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vector_norm(a: Column): Column =
    ColumnBridge.column(VectorNorm(ColumnBridge.expression(a)))
  /** Two-level IVF probe list (see [[TwoLevelProbes]]); with
    * nprobeTop=1, nprobe=1 element 1 is the hierarchical ASSIGNMENT. */
  def two_level_probes(v: Column, tops: Seq[Seq[Double]],
                       children: Seq[Seq[Seq[Double]]],
                       nprobeTop: Int, nprobe: Int,
                       childIds: Seq[Seq[Int]] = Nil): Column =
    ColumnBridge.column(TwoLevelProbes(ColumnBridge.expression(v),
      tops, children, nprobeTop, nprobe, childIds))

  /** Register every graft kernel for SQL + expr() use on a live session
    * (temp functions; `GraftExtensions` is the build-time equivalent).
    */
  def register(spark: SparkSession): Unit = {
    def lit2int(e: Expression): Int = e.eval(null).toString.toInt
    val fr = spark.sessionState.functionRegistry
    fr.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    fr.createOrReplaceTempFunction(
      "l2_squared", exprs => L2Squared(exprs(0), exprs(1)), "built-in")
    fr.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    fr.createOrReplaceTempFunction(
      "vector_norm", exprs => VectorNorm(exprs(0)), "built-in")
    fr.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0), lit2int(exprs(1))), "built-in")
    fr.createOrReplaceTempFunction(
      "minhash_signature", exprs => MinHashSignature(exprs(0), lit2int(exprs(1))), "built-in")
    fr.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs(0)), "built-in")
    fr.createOrReplaceTempFunction(
      "canonicalize_text", exprs => CanonicalizeText(exprs(0)), "built-in")
    fr.createOrReplaceTempFunction(
      "token_stats", exprs => TokenStats(exprs(0),
        graft.operators.TextAnalysis.defaultStopwords,
        graft.operators.TextAnalysis.sortedMarkerSets),
      "built-in")
    fr.createOrReplaceTempFunction(
      "misra_gries", exprs =>
        MisraGries(exprs(0), lit2int(exprs(1))).toAggregateExpression(),
      "built-in")
    fr.createOrReplaceTempFunction(
      "cdc_boundaries", exprs => CdcBoundaries(exprs(0)), "built-in")
    fr.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
    fr.createOrReplaceTempFunction(
      "normalize_nfc", exprs => NormalizeNfc(exprs(0)), "built-in")
    fr.createOrReplaceTempFunction(
      "jl_project", exprs => JlProject(exprs(0), lit2int(exprs(1))), "built-in")
  }
}
