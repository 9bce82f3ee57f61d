package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, TextAnalysis}

/** Round 16 O3 probe: bm25fTopKStored's hit stream is consumed TWICE —
  * once by the whole-doc dfreq aggregate (inside the qmeta broadcast
  * build) and once by the field-normalized part/tft stream — and the two
  * passes each re-run the union + semi-join + per-row math (the two
  * ~4.4 s stages in d_bm25f_incremental's r16 profile). But df(t) over
  * the hits IS the tft row count per term (tft's groupBy(id, term) grain
  * is exactly the distinct (id, term) pairs dfreq counts), so
  * materializing tft once feeds both. A = current tail, B = tft
  * checkpointed + dfreq derived from it. Equality + alternating reps.
  */
object ScratchTftAB {
  private def checksum(df: DataFrame): (Long, Long) = {
    val hashed = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
    val row = hashed.agg(expr("bit_xor(h)"), count(lit(1))).head()
    (if (row.isNullAt(0)) 0L else row.getLong(0), row.getLong(1))
  }

  /** bm25fTopKStored with tft materialized and dfreq derived from it. */
  private def tailB(store: Retrieval.Bm25fStore, queries: DataFrame,
                    wTitle: Double = 2.0, wBody: Double = 1.0,
                    k1: Double = 1.2, b: Double = 0.75,
                    topK: Int = 10): DataFrame = {
    val qt = queries.select(col("doc_id").as("q_id"),
        explode(TextAnalysis.tokens(lower(trim(col("text"))))).as("term"))
      .distinct()
    val qterms = qt.select(col("term")).distinct()
    val hits = (store.bucketed, store.buckets) match {
      case (Some(bp), Some(nb)) =>
        bp.join(broadcast(qterms.withColumn("bucket",
            pmod(xxhash64(col("term")), lit(nb)).cast("int"))),
          Seq("bucket", "term"), "left_semi").drop("bucket")
      case _ =>
        store.postings.join(broadcast(qterms), Seq("term"), "left_semi")
    }
    val avg = store.stats.select(col("f"),
      (col("tot_f").cast("double") / col("n_docs")).as("avgdl_f"))
    val nDocs = store.stats.agg(max(col("n_docs")).as("n_docs"))
    val part = hits
      .join(broadcast(avg), Seq("f"))
      .select(col("doc_id"), col("term"),
        (when(col("f") === "t", lit(wTitle)).otherwise(lit(wBody)) *
          col("tf") /
          (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl_f"))))
          .as("part"))
    val tft = part.groupBy(col("doc_id"), col("term"))
      .agg(sum(col("part")).as("tft"))
      .localCheckpoint()
    // df(t) = |{id : (id, t) in hits}| = tft's row count per term
    val dfreq = tft.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val qmeta = qt.join(dfreq, Seq("term")).crossJoin(broadcast(nDocs))
    val contrib = tft
      .join(broadcast(qmeta), Seq("term"))
      .withColumn("c", round(lit(1e6) *
        (idf * (col("tft") / (lit(k1) + col("tft"))))).cast("bigint"))
    val scored = contrib.groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("c")).as("score"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("score"), asc("doc_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("doc_id"), col("score"))
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
    def q(d: String) = docs(d).filter(col("doc_id") < 5)

    // probe-local stores (written once per SF, outside reps)
    def ensure(p: String)(mk: => Unit): String = {
      val marker = new org.apache.hadoop.fs.Path(s"$p/stats/_SUCCESS")
      if (!marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(marker)) mk
      p
    }
    def fullStore(d: String): String =
      ensure(s"/tmp/probe_bm25f_full_${d.split('/').last}") {
        Retrieval.writeBm25fStore(docs(d), "doc_id", "text",
          s"/tmp/probe_bm25f_full_${d.split('/').last}", titleTokens = 8)
      }
    def cutStore(d: String): String =
      ensure(s"/tmp/probe_bm25f250_${d.split('/').last}") {
        Retrieval.writeBm25fStore(docs(d).filter(col("doc_id") < 250),
          "doc_id", "text", s"/tmp/probe_bm25f250_${d.split('/').last}",
          titleTokens = 8)
      }
    def mergedOf(d: String): Retrieval.Bm25fStore = {
      val st = Retrieval.readBm25fStore(spark, cutStore(d))
      Retrieval.bm25fApplyDelta(st, docs(d).filter(col("doc_id") >= 250),
        "doc_id", "text", titleTokens = 8)
    }

    val variants: Seq[(String, String => DataFrame)] = Seq(
      "fstored_A" -> (d => Retrieval.bm25fTopKStored(
        Retrieval.readBm25fStore(spark, fullStore(d)), q(d),
        "doc_id", "doc_id", "text").orderBy(col("q_id"), col("rnk"))),
      "fstored_B" -> (d => tailB(
        Retrieval.readBm25fStore(spark, fullStore(d)), q(d))
        .orderBy(col("q_id"), col("rnk"))),
      "finc_A" -> (d => Retrieval.bm25fTopKStored(mergedOf(d), q(d),
        "doc_id", "doc_id", "text").orderBy(col("q_id"), col("rnk"))),
      "finc_B" -> (d => tailB(mergedOf(d), q(d))
        .orderBy(col("q_id"), col("rnk")))
    )
    val fams = Seq("fstored", "finc")
    val h = scala.collection.mutable.Map.empty[String, (Long, Long)]
    variants.foreach { case (n, f) =>
      h(n + "@small") = checksum(f("/root/testdata/sf0.001")); drop()
      h(n) = checksum(f(sfDir)); drop()
    }
    fams.foreach { fam =>
      println(s"[ab] $fam equal@small=${h(fam + "_A@small") == h(fam + "_B@small")} " +
        s"equal@sf=${h(fam + "_A") == h(fam + "_B")} A=${h(fam + "_A")} B=${h(fam + "_B")}")
    }
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
