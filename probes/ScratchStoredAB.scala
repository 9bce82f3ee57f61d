package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, TextAnalysis}

/** Same-JVM A/B of the stored-BM25 scoring tail: current shape (A — three
  * separate broadcasts: bucketed query terms, semi-restricted dfreq, 1-row
  * stats) vs ONE fused broadcast carrying (q_id, term, bucket, df, n_docs,
  * tot) (B). Row/hash equality checked, reps alternated. Not graded.
  */
object ScratchStoredAB {
  private def checksum(df: DataFrame): (Long, Long) = {
    val hashed = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
    val row = hashed.agg(expr("bit_xor(h)"), count(lit(1))).head()
    (if (row.isNullAt(0)) 0L else row.getLong(0), row.getLong(1))
  }

  private def contribExpr(k1: Double, b: Double): Column = {
    val avgdl = col("tot").cast("double") / col("n_docs")
    val idf = log(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val sat = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / avgdl)))
    round(lit(1e6) * (idf * sat)).cast("bigint")
  }

  /** Fused-broadcast stored top-k (variant B). */
  private def fusedTopK(spark: SparkSession, path: String, queries: DataFrame,
                        k1: Double = 1.2, b: Double = 0.75,
                        topK: Int = 10): DataFrame = {
    val store = Retrieval.readBm25Store(spark, path)
    val qt = queries.select(col("doc_id").as("q_id"),
        explode(TextAnalysis.tokens(lower(trim(col("text"))))).as("term"))
      .distinct()
    val nb = store.buckets.get
    val qmeta = qt
      .join(store.dfreq, Seq("term"))
      .crossJoin(store.stats)
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(nb)).cast("int"))
    val contrib = store.bucketed.get
      .join(broadcast(qmeta), Seq("bucket", "term"))
      .withColumn("c", contribExpr(k1, b))
    val scored = contrib.groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("c")).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(desc("score"), asc("doc_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("doc_id"), col("score"))
      .orderBy(col("q_id"), col("rnk"))
  }

  def main(args: Array[String]): Unit = {
    val reps = args.lift(0).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    // locate the cached bm25 store for a dir by running the stored query
    // once (builds the layout if missing), then scanning the layout root
    def storePath(dir: String): String = {
      checksum(graft.SparkEntry.queries("d_bm25_topk_stored")(spark, dir)); drop()
      val root = new java.io.File(
        sys.env.getOrElse("SPARK_GRAFT_LAYOUT_DIR", System.getProperty("java.io.tmpdir")))
      root.listFiles().filter(_.getName.startsWith("graft_bm25_"))
        .filter(f => new java.io.File(f, "stats/_SUCCESS").exists())
        .maxBy(_.lastModified()).getPath
    }
    def docs(d: String) = graft.Tables(spark, d, "documents")

    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1").foreach { d =>
      val p = storePath(d)
      val a = checksum(graft.SparkEntry.queries("d_bm25_topk_stored")(spark, d)); drop()
      val bv = checksum(fusedTopK(spark, p, docs(d).filter(col("doc_id") < 5))); drop()
      println(s"[ab] stored@$d equal=${a == bv} A=$a B=$bv path=$p")
    }
    val sfDir = "/root/testdata/sf0.1"
    val p = storePath(sfDir)
    val t = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      Seq("A", "B").foreach { v =>
        System.gc()
        val t0 = System.nanoTime()
        if (v == "A") checksum(graft.SparkEntry.queries("d_bm25_topk_stored")(spark, sfDir))
        else checksum(fusedTopK(spark, p, docs(sfDir).filter(col("doc_id") < 5)))
        val s = (System.nanoTime() - t0) / 1e9
        drop()
        t(v) = s :: t(v)
      }
    }
    Seq("A", "B").foreach { v =>
      println(f"[ab] stored_$v min=${t(v).min}%.3f all=${t(v).reverse.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
