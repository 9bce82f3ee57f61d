package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Scratch runtime profiler — not part of the graded surface.
  *
  * For each named query: warm at sf0.001, then run `reps` timed checksum
  * actions at the target SF. After the LAST rep, dump
  *   (a) per-stage aggregates from a SparkListener (executor run/cpu/GC
  *       time, input bytes, shuffle read/write bytes) sorted by run time,
  *   (b) the AQE-final physical plan with per-node key SQLMetric values,
  * so seconds can be attributed to scan vs shuffle vs compute per operator.
  *
  * Usage: ProfQuery <sfDir> <query1,query2,...> [reps]
  */
object ProfQuery {

  final case class StageAgg(var name: String = "", var tasks: Int = 0,
      var runMs: Long = 0, var cpuNs: Long = 0, var gcMs: Long = 0,
      var inBytes: Long = 0, var inRecs: Long = 0,
      var srBytes: Long = 0, var swBytes: Long = 0)

  class Agg extends SparkListener {
    val stages = scala.collection.mutable.LinkedHashMap.empty[Int, StageAgg]
    var enabled = false
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      if (!enabled) return
      val si = sc.stageInfo
      val m = si.taskMetrics
      val a = stages.getOrElseUpdate(si.stageId, StageAgg())
      a.name = si.name.takeWhile(_ != '\n').take(90)
      a.tasks += si.numTasks
      a.runMs += m.executorRunTime
      a.cpuNs += m.executorCpuTime
      a.gcMs += m.jvmGCTime
      a.inBytes += m.inputMetrics.bytesRead
      a.inRecs += m.inputMetrics.recordsRead
      a.srBytes += m.shuffleReadMetrics.totalBytesRead
      a.swBytes += m.shuffleWriteMetrics.bytesWritten
    }
  }

  def dumpPlan(p: SparkPlan, depth: Int, sb: StringBuilder): Unit = {
    val keys = Seq("numOutputRows", "shuffleBytesWritten", "dataSize",
      "scanTime", "time in aggregation build", "sort time", "spill size",
      "fetchWaitTime", "shuffle write time", "numFiles", "buildTime",
      "collectTime", "broadcastTime")
    val ms = p.metrics.collect {
      case (k, v) if v.value > 0 &&
        (keys.exists(t => k.toLowerCase.contains(t.toLowerCase)) ||
         k == "numOutputRows") => s"$k=${v.value}"
    }.toSeq.sorted.mkString(" ")
    sb.append("  " * depth).append(p.nodeName)
    if (ms.nonEmpty) sb.append("  [").append(ms).append("]")
    sb.append('\n')
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    kids.foreach(dumpPlan(_, depth + 1, sb))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val hashed = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
      val row = hashed.agg(expr("bit_xor(h)"), count(lit(1))).head()
      (if (row.isNullAt(0)) 0L else row.getLong(0), row.getLong(1))
    }
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm codegen
      try checksum(fn(spark, "/root/testdata/sf0.001")) catch { case e: Throwable =>
        println(s"[prof] WARM FAIL $name: $e") }
      drop()
      System.gc()
      var lastDf: org.apache.spark.sql.DataFrame = null
      val times = (1 to reps).map { i =>
        val collectStages = i == reps
        if (collectStages) { agg.stages.clear(); agg.enabled = true }
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val planned = (System.nanoTime() - t0) / 1e9
        val hashed = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)"), count(lit(1)))
        hashed.head()
        val total = (System.nanoTime() - t0) / 1e9
        agg.enabled = false
        if (collectStages) lastDf = hashed
        drop()
        println(f"[prof] $name rep$i  total=$total%.3f s  (df-construct=$planned%.3f s)")
        total
      }
      println(f"[prof] $name MIN=${times.min}%.3f s")
      // stage table from last rep
      Thread.sleep(400) // let the async listener bus drain
      println(s"[prof] --- stages (last rep), by executorRunTime ---")
      val rows = agg.stages.toSeq.sortBy(-_._2.runMs)
      rows.take(25).foreach { case (id, a) =>
        println(f"[prof] stage$id%-5d run=${a.runMs}%6d ms cpu=${a.cpuNs / 1000000}%6d ms gc=${a.gcMs}%4d ms tasks=${a.tasks}%3d in=${a.inBytes / 1024}%8d KiB sr=${a.srBytes / 1024}%7d KiB sw=${a.swBytes / 1024}%7d KiB  ${a.name}")
      }
      val totRun = agg.stages.values.map(_.runMs).sum
      println(s"[prof] total executorRunTime across stages: $totRun ms over ${agg.stages.size} stages")
      // final plan with metrics
      val sb = new StringBuilder
      dumpPlan(lastDf.queryExecution.executedPlan, 0, sb)
      println("[prof] --- AQE-final plan with metrics (checksum wrapper) ---")
      println(sb.toString)
    }
    spark.stop()
  }
}
