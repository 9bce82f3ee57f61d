package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained text classification — the fastText/CCNet-style linear classifier
  * stage of a large-scale training-data pipeline, here as a multinomial
  * Naive Bayes with Laplace smoothing trained distributed and applied
  * distributed.
  *
  * All model weights are FIXED-POINT INTEGERS: each log-probability is
  * rounded once, pointwise, to `round(1e6 * ln(...))` as a BIGINT, and every
  * downstream doc score is an integer SUM of integer terms. Floating point
  * never crosses an aggregation boundary, so scores are bit-exact and
  * order-independent — the same contract as the gopher/familiarity kernels,
  * which makes the whole train → predict pipeline oracle-checkable in SQL.
  *
  * Scoring identity (per doc d, class c, vocab size V, class token mass
  * tok_c, class term count cnt_tc, class doc count nd_c over N train docs):
  *
  *   score(d,c) = P_c + n_d * D_c + Σ_{t ∈ d ∩ model_c} tf_t * W_tc
  *
  * where P_c  = round(S*ln(nd_c / N))            (class prior)
  *       D_c  = round(S*ln(1 / (tok_c + V)))     (unseen-term weight)
  *       L_tc = round(S*ln((cnt_tc+1)/(tok_c+V)))
  *       W_tc = L_tc - D_c                        (seen-term lift, >= 0)
  *
  * The rewrite via D_c means unseen terms never need a join row: the inner
  * join against the model only carries terms the class has seen, and the
  * `n_d * D_c` correction is a scalar per (doc, class).
  *
  * Scale: term counts are one explode + partially-aggregated groupBy (the
  * tf-idf shape); the finished model is |V|x|classes| rows — small enough to
  * broadcast at any corpus size (the vocab saturates) — so prediction
  * shuffles only the (doc, term) tf stream, never the corpus text.
  */
object Classify {

  private val S = 1e6

  /** Per-(class, term) integer weights: label, term, llr (absolute
    * log-prob), w (lift over the unseen-term weight). Derived counts ride
    * along for audit: cnt (term count in class), tok (class token mass).
    */
  def nbModel(train: DataFrame, textCol: String, labelCol: String): DataFrame = {
    val toks = train.select(col(labelCol).as("label"),
      explode(TextAnalysis.tokens(lower(trim(col(textCol))))).as("term"))
    val cnt = toks.groupBy(col("label"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val tok = cnt.groupBy(col("label")).agg(sum(col("cnt")).as("tok"))
    val v = cnt.agg(countDistinct(col("term")).as("v"))
    val llr = round(lit(S) *
      log((col("cnt") + lit(1.0)) / (col("tok") + col("v")).cast("double")))
      .cast("bigint")
    val dw = round(lit(S) *
      log(lit(1.0) / (col("tok") + col("v")).cast("double"))).cast("bigint")
    cnt.join(tok, "label").crossJoin(broadcast(v))
      .withColumn("llr", llr)
      .withColumn("w", llr - dw)
      .select(col("label"), col("term"), col("cnt"), col("llr"), col("w"))
  }

  /** Per-class scalars: label, prior P_c, unseen-term weight D_c (both
    * fixed-point BIGINT), plus nd (train docs in class).
    */
  def nbClassBase(train: DataFrame, idCol: String, textCol: String,
                  labelCol: String): DataFrame = {
    val toks = train.select(col(labelCol).as("label"),
      explode(TextAnalysis.tokens(lower(trim(col(textCol))))).as("term"))
    val tok = toks.groupBy(col("label")).agg(count(lit(1)).as("tok"))
    val v = toks.agg(countDistinct(col("term")).as("v"))
    val nd = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nd"))
    val n = train.agg(count(lit(1)).as("n"))
    nd.join(tok, "label").crossJoin(broadcast(v)).crossJoin(broadcast(n))
      .select(col("label"), col("nd"),
        round(lit(S) * log(col("nd").cast("double") / col("n")))
          .cast("bigint").as("prior"),
        round(lit(S) * log(lit(1.0) / (col("tok") + col("v")).cast("double")))
          .cast("bigint").as("def_w"))
  }

  /** Write-once trained model: `path/model` ((label, term) integer
    * weights — tiny: |V|·|classes| rows regardless of corpus size) and
    * `path/base` (per-class scalars). Training (two tokenize aggregates
    * over the train split) is paid once at ingest; every later
    * prediction reads ONLY these frozen weights — the model-registry
    * pattern for the 100 TB pipeline, where one trained classifier
    * filters many corpus drops.
    */
  def writeNbStore(train: DataFrame, idCol: String, textCol: String,
                   labelCol: String, path: String): Unit = {
    nbModel(train, textCol, labelCol)
      .coalesce(4).write.mode("overwrite").parquet(s"$path/model")
    nbClassBase(train, idCol, textCol, labelCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/base")
  }

  /** (model, base) handles onto a written store — feed to [[nbPredict]];
    * identical integer weights make stored prediction row-identical to
    * training inline (pinned in ClassifySpec).
    */
  def readNbStore(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/model"), spark.read.parquet(s"$path/base"))

  /** Classify `test` docs against a frozen model: one row per doc with the
    * argmax class (ties broken by label ascending) and its integer score.
    * Docs with no token in any class's vocabulary still score (prior +
    * n_d * D_c); empty docs fall back to the prior alone.
    */
  def nbPredict(test: DataFrame, model: DataFrame, base: DataFrame,
                idCol: String, textCol: String): DataFrame = {
    val tf = test.select(col(idCol),
        explode(TextAnalysis.tokens(lower(trim(col(textCol))))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val lift = tf.join(broadcast(model.select(col("label"), col("term"), col("w"))),
        Seq("term"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("tf") * col("w")).as("lift"))
    val nTok = test.select(col(idCol),
      TextAnalysis.tokenCount(lower(trim(col(textCol)))).cast("bigint").as("n_tok"))
    val scored = nTok.crossJoin(broadcast(base))
      .join(lift, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        (col("prior") + col("n_tok") * col("def_w") +
          coalesce(col("lift"), lit(0L))).as("score"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(desc("score"), asc("label"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col(idCol), col("label").as("pred"), col("score"))
  }
}
