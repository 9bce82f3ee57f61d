package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Evidence re-dump for round 15's E2/E6 (scan-spread) adoptions, whose
  * committed before/after plan files came out byte-identical (VERDICT r15
  * issue #2): d_span_clean / d_dup_spans localCheckpoint right above the
  * spread exchange, so PlanDump's final-frame explain truncates at the
  * checkpoint under EVERY conf. This probe dumps, under
  * spark.graft.scan.spread = off vs auto,
  *   - the FULL query plan for s_mutual_knn and d_char_entropy (no
  *     internal checkpoint — the toggle is visible in the final plan),
  *   - the PRE-CHECKPOINT frame for d_span_clean (Dedup.duplicatedSpanClean's
  *     `toks`) and d_dup_spans (Dedup.duplicatedSpanStats' `perDocGram`),
  *     replicated expression-for-expression from the operator source so
  *     the RoundRobinPartitioning exchange above the scan is visible.
  * Usage: SpreadPlanDump <sfDir> <outDir>
  */
object SpreadPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))

    // the spread frame d_span_clean checkpoints first
    // (Dedup.duplicatedSpanClean `toks`, Dedup.scala)
    def spanCleanToks(): DataFrame =
      graft.Tables(spark, sfDir, "documents", spreadScan = true)
        .select(col("doc_id"),
          filter(split(trim(col("text")), "\\s+"), x => length(x) > 0).as("ot"))

    // the spread frame d_dup_spans checkpoints first
    // (Dedup.duplicatedSpanStats `perDocGram`, Dedup.scala)
    def dupSpansPerDocGram(): DataFrame =
      graft.Tables(spark, sfDir, "documents", spreadScan = true)
        .select(col("doc_id"), Dedup.portableTokens(col("text")).as("tk"))
        .select(col("doc_id"),
          explode(Dedup.portableShingleWindows(col("tk"))).as("sh"))
        .select(col("doc_id"), md5(col("sh")).as("gh"))
        .groupBy(col("gh"), col("doc_id")).agg(count(lit(1)).as("n"))

    val frames: Seq[(String, () => DataFrame)] = Seq(
      "s_mutual_knn" ->
        (() => graft.SparkEntry.queries("s_mutual_knn")(spark, sfDir)),
      "d_char_entropy" ->
        (() => graft.SparkEntry.queries("d_char_entropy")(spark, sfDir)),
      "d_span_clean_precheckpoint" -> (() => spanCleanToks()),
      "d_dup_spans_precheckpoint" -> (() => dupSpansPerDocGram())
    )
    for (mode <- Seq("off", "auto"); (name, mk) <- frames) {
      spark.conf.set("spark.graft.scan.spread", mode)
      val txt = mk().queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_spread_$mode.txt"), txt)
      println(s"[spreaddump] wrote $outDir/${name}_spread_$mode.txt")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
