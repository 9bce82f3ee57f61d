package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, sum, xxhash64}

object Bench {
  /** Projection-forcing action: every output column feeds a hash that is
    * summed to one row. Unlike `.count()` (under which Catalyst prunes
    * unreferenced projections and drops final sorts), this executes every
    * kernel in the query — map-side-only queries time their compute, not
    * just the parquet scan.
    */
  private def checksum(df: DataFrame): Long = {
    val row = df.agg(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*))).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // steady-state warmup: run EVERY query once at the smallest SF so the
    // timed runs measure engine cost, not first-use classloading and
    // whole-stage-codegen (janino) compilation — the generated code is
    // SF-independent, so the codegen cache carries over to the target SF
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try checksum(fn(spark, warmDir)) catch { case _: Throwable => () }
    }
    // deterministic name order so per-query timings compare across rounds
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try checksum(fn(spark, sfDir)) catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
