package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Dedup, Retrieval, TextAnalysis}

/** Same-JVM A/B probes for three candidate optimizations. Not graded.
  *  1. bpe: Bpe.train as-is vs no per-round localCheckpoint (replay the
  *     cheap merge folds instead of materializing each round).
  *  2. bm25f: inline bm25fTopK as-is vs ONE-pass field split (posexplode
  *     + field-by-position instead of union of two slices).
  * Equality checked via checksum; reps alternated.
  */
object ScratchMiscAB {
  private def checksum(df: DataFrame): (Long, Long) = {
    val hashed = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
    val row = hashed.agg(expr("bit_xor(h)"), count(lit(1))).head()
    (if (row.isNullAt(0)) 0L else row.getLong(0), row.getLong(1))
  }

  /** Bpe.train without the per-round dict checkpoint. */
  private def bpeTrainNoCkpt(docs: DataFrame, textCol: String,
                             rounds: Int): DataFrame = {
    import docs.sparkSession.implicits._
    var dict = docs
      .select(explode(Dedup.portableTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .withColumn("syms",
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Bpe.Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = Bpe.pairCounts(dict)
        .orderBy(desc("c"), asc("a"), asc("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Bpe.Merge(r, a, b, c)
        dict = dict.withColumn("syms", Bpe.applyMerge(col("syms"), a, b))
        r += 1
      }
    }
    merges.toSeq.toDF().orderBy(col("rnk"))
  }

  /** inline bm25f with one-pass posexplode field split, NO checkpoint. */
  private def bm25fOnePass(corpus: DataFrame, queries: DataFrame,
                           titleTokens: Int = 8): DataFrame = {
    val tf = corpus.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(lower(trim(col("text")))))
          .as(Seq("__p", "term")))
      .select(col("doc_id"),
        when(col("__p") < titleTokens, lit("t")).otherwise(lit("b")).as("f"),
        col("term"))
      .groupBy(col("doc_id"), col("f"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dlf = tf.groupBy(col("doc_id"), col("f")).agg(sum(col("tf")).as("dl"))
    val postings = tf.join(dlf, Seq("doc_id", "f"))
      .select(col("doc_id"), col("f"), col("term"), col("tf"), col("dl"))
    val nDocs = corpus.agg(count(lit(1)).as("n_docs"))
    val stats = dlf.groupBy(col("f")).agg(sum(col("dl")).as("tot_f"))
      .crossJoin(broadcast(nDocs))
      .select(col("f"), col("n_docs"), col("tot_f"))
    Retrieval.bm25fTopKStored(Retrieval.Bm25fStore(postings, stats),
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
      "bpe_A" -> (d => graft.SparkEntry.queries("d_bpe_train")(spark, d)),
      "bpe_B" -> (d => bpeTrainNoCkpt(docs(d), "text", rounds = 6)),
      "bm25f_A" -> (d => graft.SparkEntry.queries("d_bm25f_topk")(spark, d)),
      "bm25f_C" -> (d => bm25fOnePass(docs(d), docs(d).filter(col("doc_id") < 5)))
    )
    val h = scala.collection.mutable.Map.empty[String, (Long, Long)]
    variants.foreach { case (n, f) =>
      h(n + "@small") = checksum(f("/root/testdata/sf0.001")); drop()
      h(n) = checksum(f(sfDir)); drop()
    }
    println(s"[ab] bpe equal@small=${h("bpe_A@small") == h("bpe_B@small")} equal@sf=${h("bpe_A") == h("bpe_B")}")
    println(s"[ab] bm25f equal@small=${h("bm25f_A@small") == h("bm25f_C@small")} equal@sf=${h("bm25f_A") == h("bm25f_C")}")
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
