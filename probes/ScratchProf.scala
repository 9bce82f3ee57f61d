package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._


/** Scratch stage-level profiling main — not part of the graded surface.
  * Times labeled sub-pipelines of the stored-PRF row in one session.
  */
object ScratchProf {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.SparkEntry.{queries => qs}
    // warm codegen at the small SF
    Seq("d_bm25_topk_stored", "d_bm25_prf_stored").foreach { n =>
      qs(n)(spark, "/root/testdata/sf0.001").count()
    }
    println(s"[prof] AQE = ${spark.conf.get("spark.sql.adaptive.enabled")}")
    (1 to 3).foreach { i =>
      time(s"topk_stored#$i") { qs("d_bm25_topk_stored")(spark, dir).count() }
      time(s"prf_stored#$i") { qs("d_bm25_prf_stored")(spark, dir).count() }
      time(s"prf_inline#$i") { qs("d_bm25_prf")(spark, dir).count() }
    }
  }
}
