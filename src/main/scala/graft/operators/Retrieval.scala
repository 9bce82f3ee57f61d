package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * [[Classify]] and the gopher kernels.
  *
  * Scale: corpus statistics are one explode + partially-aggregated groupBys
  * (tf reused for dl and df via ReusedExchange, the tf-idf shape); the
  * query term set is broadcast, so only (doc, term) rows matching some
  * query term ever reach the scoring join, and the final top-k is a
  * row_number window that plans as WindowGroupLimit — the corpus text is
  * read once and never re-shuffled.
  */
object Retrieval {

  /** Top-k docs per query by BM25. `queries` supplies (qIdCol, qTextCol);
    * query term SETS (standard BM25: query-side multiplicity ignored) are
    * broadcast against the corpus contribution stream. Returns
    * (q_id, rnk, doc id, score) with ties broken by doc id ascending.
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
    val n = corpus.agg(count(lit(1)).as("n_docs"))
    val tot = dl.agg(sum(col("dl")).as("tot"))
    val qterms = queries.select(col(qIdCol).as("q_id"),
        explode(TextAnalysis.tokens(lower(trim(col(qTextCol))))).as("term"))
      .distinct()
    // only (doc, term) rows matching some query term reach the float math
    val hits = tf.join(broadcast(qterms), Seq("term"))
    val avgdl = col("tot").cast("double") / col("n_docs")
    val idf = log(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val sat = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / avgdl)))
    val contrib = hits
      .join(dfreq, Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(n)).crossJoin(broadcast(tot))
      .withColumn("c", round(lit(1e6) * (idf * sat)).cast("bigint"))
    val scored = contrib.groupBy(col("q_id"), col(idCol))
      .agg(sum(col("c")).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(desc("score"), asc(idCol))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col(idCol), col("score"))
  }
}
