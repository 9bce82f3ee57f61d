package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the Tables scan-spread: times each named query with
  * spark.graft.scan.spread=off (A) vs auto (B), alternating reps, and
  * checks checksum equality between modes. Not part of the graded surface.
  *
  * Usage: ScratchSpreadAB <sfDir> <queries-csv> [reps]
  */
object ScratchSpreadAB {
  private def checksum(df: DataFrame): (Long, Long) = {
    val hashed = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
    val row = hashed.agg(expr("bit_xor(h)"), count(lit(1))).head()
    (if (row.isNullAt(0)) 0L else row.getLong(0), row.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    def setMode(m: String): Unit = spark.conf.set("spark.graft.scan.spread", m)

    // warm (both modes, small SF) + equality check at target SF
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      setMode("off"); val a0 = checksum(fn(spark, "/root/testdata/sf0.001")); drop()
      setMode("auto"); val b0 = checksum(fn(spark, "/root/testdata/sf0.001")); drop()
      setMode("off"); val a = checksum(fn(spark, sfDir)); drop()
      setMode("auto"); val b = checksum(fn(spark, sfDir)); drop()
      println(s"[ab] $n equal@small=${a0 == b0} equal@sf=${a == b} off=$a auto=$b")
    }
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      names.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        Seq("off", "auto").foreach { m =>
          setMode(m); System.gc()
          val t0 = System.nanoTime()
          checksum(fn(spark, sfDir))
          val s = (System.nanoTime() - t0) / 1e9
          drop()
          times(s"$n/$m") = s :: times(s"$n/$m")
        }
      }
    }
    names.foreach { n =>
      val off = times(s"$n/off"); val auto = times(s"$n/auto")
      println(f"[ab] $n%-26s off_min=${off.min}%.3f auto_min=${auto.min}%.3f  delta=${auto.min - off.min}%+.3f  off=${off.reverse.map(t => f"$t%.2f").mkString(",")} auto=${auto.reverse.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
