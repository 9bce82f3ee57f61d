package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-surface same-JVM A/B of the Tables scan-spread: for EVERY graded
  * query, alternate spark.graft.scan.spread=off/auto timed reps (min of
  * `reps` each) and report per-query deltas plus checksum equality.
  * Failures are caught and reported per query. Not part of the graded
  * surface.
  *
  * Usage: ScratchSpreadAll <sfDir> [reps] [onlyCsv]
  */
object ScratchSpreadAll {
  private def checksum(df: DataFrame): (Long, Long) = {
    val hashed = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
    val row = hashed.agg(expr("bit_xor(h)"), count(lit(1))).head()
    (if (row.isNullAt(0)) 0L else row.getLong(0), row.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val only = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "64")
      .config("spark.ui.retainedStages", "64")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    def setMode(m: String): Unit = spark.conf.set("spark.graft.scan.spread", m)

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      try {
        // warm both modes at the small SF (codegen + layout caches)
        setMode("off"); checksum(fn(spark, "/root/testdata/sf0.001")); drop()
        setMode("auto"); checksum(fn(spark, "/root/testdata/sf0.001")); drop()
        var hOff: (Long, Long) = null
        var hAuto: (Long, Long) = null
        val t = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
        (1 to reps).foreach { _ =>
          Seq("off", "auto").foreach { m =>
            setMode(m); System.gc()
            val t0 = System.nanoTime()
            val h = checksum(fn(spark, sfDir))
            val s = (System.nanoTime() - t0) / 1e9
            drop()
            if (m == "off") hOff = h else hAuto = h
            t(m) = s :: t(m)
          }
        }
        val off = t("off").min; val auto = t("auto").min
        println(f"[all] $n%-34s off=$off%7.3f auto=$auto%7.3f delta=${auto - off}%+7.3f eq=${hOff == hAuto}%-5s rows=${hOff._2}")
      } catch {
        case e: Throwable =>
          println(s"[all] $n FAILED ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
          drop()
      }
      System.out.flush()
    }
    spark.stop()
  }
}
