package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval — Okapi BM25 top-k, the term-match sibling of
  * the dense ANN family in [[Similarity]].
  *
  * Bit-exactness contract: every per-(doc, term) BM25 contribution
  *   idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  * is computed pointwise from exact integer corpus statistics (tf, df, dl,
  * N, total tokens) and rounded ONCE to a 1e6 fixed-point BIGINT; a
  * (query, doc) score is then an integer SUM of those contributions, so it
  * is order-independent and oracle-checkable — the same fixed-point rule as
  * [[Classify]] and the gopher kernels. Because the stored path scores
  * from the SAME integer statistics through the SAME expressions, inline
  * and stored spellings are row-identical by construction.
  *
  * Scale: corpus statistics are one explode + partially-aggregated groupBys
  * (tf reused for dl and df via ReusedExchange, the tf-idf shape); the
  * query term set is broadcast, so only (doc, term) rows matching some
  * query term ever reach the scoring join, and the final top-k is a
  * row_number window that plans as WindowGroupLimit — the corpus text is
  * read once and never re-shuffled. With a WRITTEN postings store
  * ([[writeBm25Store]]) even that single read disappears from the query
  * path: the index build (tokenize + three aggregates over 100 TB of
  * text) is paid once at ingest, and every later query touches only the
  * postings parquet — integer columns, term-dictionary-encoded, a
  * fraction of the corpus bytes.
  */
object Retrieval {

  /** Denormalized postings for a corpus: one row per (doc, term) carrying
    * every per-row integer BM25 needs — term frequency `tf`, document
    * length `dl` (posting-list convenience: the doc-length join is paid
    * once here, not per query), and document frequency `df`. Exact
    * integers only; no floats are frozen into the store, so k1/b stay
    * query-time knobs.
    */
  def buildPostings(corpus: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val tf = corpus.select(col(idCol),
        explode(TextAnalysis.tokens(lower(trim(col(textCol))))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dl, Seq(idCol)).join(dfreq, Seq("term"))
      .select(col(idCol), col("term"), col("tf"), col("dl"), col("df"))
  }

  /** One-row global statistics: document count (INCLUDING zero-token docs,
    * which produce no postings — a column-pruned count over the corpus)
    * and total token count (sum of tf over the postings: no second
    * tokenize pass).
    */
  def corpusStats(corpus: DataFrame, postings: DataFrame): DataFrame =
    corpus.agg(count(lit(1)).as("n_docs"))
      .crossJoin(postings.agg(sum(col("tf")).as("tot")))

  /** Query term sets (standard BM25: query-side multiplicity ignored). */
  private def queryTerms(queries: DataFrame, qIdCol: String,
                         qTextCol: String): DataFrame =
    queries.select(col(qIdCol).as("q_id"),
        explode(TextAnalysis.tokens(lower(trim(col(qTextCol))))).as("term"))
      .distinct()

  /** THE fixed-point contribution, shared verbatim by the inline and
    * stored paths — identical integer inputs through identical expressions
    * make the two spellings bit-identical (pinned in RetrievalSpec).
    * Expects columns tf, dl, df, n_docs, tot in scope.
    */
  private def contribExpr(k1: Double, b: Double): Column = {
    val avgdl = col("tot").cast("double") / col("n_docs")
    val idf = log(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val sat = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / avgdl)))
    round(lit(1e6) * (idf * sat)).cast("bigint")
  }

  /** Shared integer-sum + top-k tail over contribution rows. */
  private def rankTopK(contrib: DataFrame, idCol: String,
                       topK: Int): DataFrame = {
    val scored = contrib.groupBy(col("q_id"), col(idCol))
      .agg(sum(col("c")).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(desc("score"), asc(idCol))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col(idCol), col("score"))
  }

  /** Top-k docs per query by BM25, index built inline. `queries` supplies
    * (qIdCol, qTextCol); query term sets are broadcast against the corpus
    * contribution stream, and the dl/df joins run only on matched rows.
    * Returns (q_id, rnk, doc id, score) with ties broken by doc id
    * ascending.
    */
  def bm25TopK(corpus: DataFrame, queries: DataFrame,
               idCol: String, textCol: String,
               qIdCol: String, qTextCol: String,
               k1: Double = 1.2, b: Double = 0.75,
               topK: Int = 10): DataFrame = {
    val tf = corpus.select(col(idCol),
        explode(TextAnalysis.tokens(lower(trim(col(textCol))))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // only (doc, term) rows matching some query term reach the float math
    val hits = tf.join(broadcast(queryTerms(queries, qIdCol, qTextCol)),
      Seq("term"))
    val stats = corpus.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(sum(col("dl")).as("tot")))
    val contrib = hits
      .join(dfreq, Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("c", contribExpr(k1, b))
    rankTopK(contrib, idCol, topK)
  }

  /** Write-once BM25 index: `path/postings` (term-partitioned (doc, term,
    * tf, dl, df) rows — `buckets` output files hashed on term keep any
    * one term's posting list in one file) and `path/stats` (one row).
    * Building costs the same three aggregates as an inline query; every
    * query after reads ONLY this store.
    */
  def writeBm25Store(corpus: DataFrame, idCol: String, textCol: String,
                     path: String, buckets: Int = 16): Unit = {
    val postings = buildPostings(corpus, idCol, textCol)
    postings.repartition(buckets, col("term"))
      .write.mode("overwrite").parquet(s"$path/postings")
    val stored = postings.sparkSession.read.parquet(s"$path/postings")
    corpusStats(corpus, stored)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** (postings, stats) handles onto a written store. */
  def readBm25Store(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/postings"), spark.read.parquet(s"$path/stats"))

  /** [[bm25TopK]] against a written store: identical scoring expressions
    * over the stored integers, so results are row-identical to the inline
    * build (pinned in RetrievalSpec) — but the query plan scans only
    * postings parquet, never corpus text.
    */
  def bm25TopKStored(postings: DataFrame, stats: DataFrame,
                     queries: DataFrame, idCol: String,
                     qIdCol: String, qTextCol: String,
                     k1: Double = 1.2, b: Double = 0.75,
                     topK: Int = 10): DataFrame = {
    val hits = postings.join(
      broadcast(queryTerms(queries, qIdCol, qTextCol)), Seq("term"))
    val contrib = hits.crossJoin(broadcast(stats))
      .withColumn("c", contribExpr(k1, b))
    rankTopK(contrib, idCol, topK)
  }
}
