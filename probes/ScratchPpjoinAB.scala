package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import graft.operators.Dedup

/** Round 16 O2 probe: d_setjoin_ppjoin's candidate verify as-is
  * (size(array_intersect) per pair — hash-set build + intersection ARRAY
  * materialization, then size) vs a sorted-merge intersection COUNT
  * kernel over arrays sorted once per doc (per-pair cost O(|a|+|b|)
  * comparisons, zero allocation). Equality + alternating timed reps.
  */
object ProbeSortedOverlapKernel {
  /** Count of common elements of two ASC-sorted string arrays with
    * distinct elements (binary UTF8 order — sort_array's order). */
  def overlap(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1L; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

case class ProbeSortedOverlap(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<string>, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_overlap_count"
  override def nullSafeEval(l: Any, r: Any): Any =
    ProbeSortedOverlapKernel.overlap(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.tools.ProbeSortedOverlapKernel.overlap($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ProbeSortedOverlap =
    copy(left = newLeft, right = newRight)
}

object ScratchPpjoinAB {
  private def checksum(df: DataFrame): (Long, Long) = {
    val hashed = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
    val row = hashed.agg(expr("bit_xor(h)"), count(lit(1))).head()
    (if (row.isNullAt(0)) 0L else row.getLong(0), row.getLong(1))
  }

  private def sortedOverlap(a: Column, b: Column): Column =
    ColumnBridge.column(ProbeSortedOverlap(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** prefixFilterJoin with tk sorted once per doc and the merge kernel in
    * the verify (same rows: inter is the same integer). */
  private def ppjoinB(df: DataFrame, idCol: String, textCol: String,
                      tauNum: Int, tauDen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("sid"),
      Dedup.portableTokens(col(textCol)).as("tk0"))
      .select(col("sid"),
        sort_array(array_distinct(
          Dedup.portableShingleWindows(col("tk0")))).as("tk"))
      .localCheckpoint()
    val tok = toks.select(col("sid"), explode(col("tk")).as("token"))
    val rk = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .withColumn("r", row_number().over(Window.orderBy(col("df"), col("token"))))
      .select(col("token"), col("r"))
    val wLen = Window.partitionBy(col("sid"))
    val wPos = Window.partitionBy(col("sid")).orderBy(col("r"))
    val pref = tok.join(broadcast(rk), Seq("token"))
      .withColumn("len", count(lit(1)).over(wLen))
      .withColumn("pos", row_number().over(wPos))
      .filter(col("pos") <= col("len") -
        expr(s"(($tauNum * len) + ${tauDen - 1}) div $tauDen") + 1)
      .select(col("token"), col("sid"))
    val cand = pref.select(col("token"), col("sid").as("id1"))
      .join(pref.select(col("token"), col("sid").as("id2")), Seq("token"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val ta = toks.select(col("sid").as("id1"), col("tk").as("tk1"))
    val tb = toks.select(col("sid").as("id2"), col("tk").as("tk2"))
    cand.join(ta, Seq("id1")).join(tb, Seq("id2"))
      .withColumn("inter", sortedOverlap(col("tk1"), col("tk2")))
      .withColumn("uni",
        size(col("tk1")).cast("long") + size(col("tk2")).cast("long") - col("inter"))
      .filter(col("inter") * tauDen >= col("uni") * tauNum)
      .select(col("id1"), col("id2"),
        expr("inter * 1000000 div uni").as("jaccard_ppm"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    def docs(d: String) = graft.Tables(spark, d, "documents")
    val variants: Seq[(String, String => DataFrame)] = Seq(
      "ppjoin_A" -> (d => graft.SparkEntry.queries("d_setjoin_ppjoin")(spark, d)),
      "ppjoin_B" -> (d => ppjoinB(docs(d), "doc_id", "text", 3, 5)
        .orderBy(col("id1"), col("id2")))
    )
    val h = scala.collection.mutable.Map.empty[String, (Long, Long)]
    variants.foreach { case (n, f) =>
      h(n + "@small") = checksum(f("/root/testdata/sf0.001")); drop()
      h(n) = checksum(f(sfDir)); drop()
    }
    println(s"[ab] ppjoin equal@small=${h("ppjoin_A@small") == h("ppjoin_B@small")} " +
      s"equal@sf=${h("ppjoin_A") == h("ppjoin_B")} A=${h("ppjoin_A")} B=${h("ppjoin_B")}")
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      variants.foreach { case (n, f) =>
        System.gc()
        val t0 = System.nanoTime()
        checksum(f(sfDir))
        val s = (System.nanoTime() - t0) / 1e9
        drop()
        times(n) = s :: times(n)
      }
    }
    variants.foreach { case (n, _) =>
      val ts = times(n)
      println(f"[ab] $n%-10s min=${ts.min}%.3f  all=${ts.reverse.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
