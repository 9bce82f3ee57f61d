package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, TextAnalysis}

/** Same-JVM A/B: inline BM25/BM25F as-is (A) vs. postings materialized
  * once via localCheckpoint then scored through the SAME stored-path
  * expressions (B). Checks row/hash equality, then alternates timed reps.
  * Not part of the graded surface.
  */
object ScratchBm25AB {
  private def checksum(df: DataFrame): (Long, Long) = {
    val hashed = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
    val row = hashed.agg(expr("bit_xor(h)"), count(lit(1))).head()
    (if (row.isNullAt(0)) 0L else row.getLong(0), row.getLong(1))
  }

  // ---- variant B bodies -------------------------------------------------

  /** bm25fComponents with ONE tokenize pass (posexplode + field-by-position
    * instead of two sliced union branches) and postings checkpointed. */
  private def bm25fInlineCkpt(corpus0: DataFrame, queries: DataFrame,
                              titleTokens: Int = 8): DataFrame = {
    val corpus = corpus0.repartition(32)
    val tk = corpus.select(col("doc_id"),
      TextAnalysis.tokens(lower(trim(col("text")))).as("__tk"))
    val tf = tk.select(col("doc_id"), posexplode(col("__tk")).as(Seq("__p", "term")))
      .select(col("doc_id"),
        when(col("__p") < titleTokens, lit("t")).otherwise(lit("b")).as("f"),
        col("term"))
      .groupBy(col("doc_id"), col("f"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dlf = tf.groupBy(col("doc_id"), col("f")).agg(sum(col("tf")).as("dl"))
    val postings = tf.join(dlf, Seq("doc_id", "f"))
      .select(col("doc_id"), col("f"), col("term"), col("tf"), col("dl"))
      .localCheckpoint()
    val nDocs = corpus.agg(count(lit(1)).as("n_docs"))
    val stats = postings.groupBy(col("doc_id"), col("f")).agg(first(col("dl")).as("dl"))
      .groupBy(col("f")).agg(sum(col("dl")).as("tot_f"))
      .crossJoin(broadcast(nDocs))
      .select(col("f"), col("n_docs"), col("tot_f"))
      .localCheckpoint()
    Retrieval.bm25fTopKStored(Retrieval.Bm25fStore(postings, stats),
      queries, "doc_id", "doc_id", "text")
      .orderBy(col("q_id"), col("rnk"))
  }

  /** inline plain bm25TopK with postings checkpointed once. */
  private def bm25InlineCkpt(corpus0: DataFrame, queries: DataFrame): DataFrame = {
    val corpus = corpus0.repartition(32)
    val post = Retrieval.postingsRaw(corpus, "doc_id", "text").localCheckpoint()
    val dfreq = Retrieval.dfreqOf(post).localCheckpoint()
    val stats = Retrieval.corpusStats(corpus, post).localCheckpoint()
    Retrieval.bm25TopKStored(Retrieval.Bm25Store(post, dfreq, stats),
      queries, "doc_id", "doc_id", "text")
      .orderBy(col("q_id"), col("rnk"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
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

    val variants: Seq[(String, String => DataFrame)] = Seq(
      "bm25f_A" -> (d => graft.SparkEntry.queries("d_bm25f_topk")(spark, d)),
      "bm25f_B" -> (d => bm25fInlineCkpt(docs(d), docs(d).filter(col("doc_id") < 5))),
      "bm25_A" -> (d => graft.SparkEntry.queries("d_bm25_topk")(spark, d)),
      "bm25_B" -> (d => bm25InlineCkpt(docs(d), docs(d).filter(col("doc_id") < 5)))
    )
    // warm + equality check at sf0.001 and sfDir
    val h = scala.collection.mutable.Map.empty[String, (Long, Long)]
    variants.foreach { case (n, f) =>
      h(n + "@small") = checksum(f("/root/testdata/sf0.001")); drop()
      h(n) = checksum(f(sfDir)); drop()
    }
    Seq("bm25f", "bm25").foreach { fam =>
      println(s"[ab] $fam equal@small=${h(fam + "_A@small") == h(fam + "_B@small")} " +
        s"equal@sf=${h(fam + "_A") == h(fam + "_B")} A=${h(fam + "_A")} B=${h(fam + "_B")}")
    }
    // alternate timed reps
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
