package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining — the concat-and-chunk recipe
  * (GPT-2/Pile style): every document's token stream, plus one EOS
  * separator, concatenates in deterministic id order into one global
  * stream, which slices into EXACT `budget`-token training sequences;
  * the trailing partial sequence is dropped. The output is the packing
  * PLAN — one row per (sequence, document span): which token range of
  * which doc lands where — because at 100 TB the plan is what shuffles
  * (a few rows per doc), while the token payloads are fetched by the
  * trainer's loader from the id-keyed corpus.
  *
  * Bit-exactness contract: everything is integer arithmetic on exact
  * token counts (count, prefix sum, floor division), so the plan is
  * hash-checkable row for row by a SQL replay.
  *
  * Scale shape — the naive spelling is a GLOBAL cumulative-sum window
  * (one partition holding every doc: the single-partition cliff).
  * Instead the prefix sum is TWO-LEVEL, the q_global_rownum discipline:
  * docs bucket by id RANGE (order-preserving, so concatenation order is
  * untouched), each bucket computes its local cumsum in parallel, and
  * the per-bucket totals — at most `buckets` rows — collect once and
  * broadcast back as exclusive offsets. The only full-width stages are
  * one token-count scan and one bucket-local window.
  */
object Packing {

  /** The packing plan: (seq_id, doc id, tok_start, tok_end, n_tok) —
    * token indexes are 0-based WITHIN the doc's (tokens ++ EOS) stream,
    * so tok_end == doc token count marks "this span carries the EOS".
    * Zero-token docs contribute nothing (not even an EOS). `idCol` must
    * be numeric (the range bucketing needs an order-preserving split);
    * ties are impossible (ids are keys).
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int, buckets: Int = 32): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val lens = docs.select(col(idCol).cast("long").as("__id"),
        (size(TextAnalysis.tokens(lower(trim(col(textCol))))) + 1)
          .cast("long").as("__l"))
      .filter(col("__l") > 1L)
    // order-preserving range buckets: ids split by value range, so
    // bucket b's docs all precede bucket b+1's in id order and the
    // two-level prefix sum composes exactly
    val mm = lens.agg(min(col("__id")).as("lo"), max(col("__id")).as("hi"))
      .head()
    if (mm.isNullAt(0))
      return lens.select(col("__id").as("seq_id"), col("__id").as(idCol),
        col("__l").as("tok_start"), col("__l").as("tok_end"),
        col("__l").as("n_tok")).limit(0)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val width = math.max(1L, (hi - lo) / buckets + 1L)
    // div, not `/`: long / long is DOUBLE division in Spark SQL
    val bucketed = lens.withColumn("__b",
      expr(s"(__id - ${lo}L) div ${width}L"))
    // stage 1: bucket-local exclusive cumsum (parallel across buckets)
    val wLocal = Window.partitionBy(col("__b")).orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("__cum",
      coalesce(sum(col("__l")).over(wLocal), lit(0L)))
    // stage 2: per-bucket totals -> exclusive bucket offsets (<= buckets
    // rows, driver-bounded by construction)
    val totals = bucketed.groupBy(col("__b")).agg(sum(col("__l")).as("__t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val exclusive = totals.map(_._1)
      .zip(totals.scanLeft(0L) { case (acc, (_, t)) => acc + t }.init)
    val total = totals.map(_._2).sum
    val nFull = total / budget
    import docs.sparkSession.implicits._
    val offDf = broadcast(exclusive.toSeq.toDF("__b", "__off"))
    // global start offset, covered sequence range, per-sequence clip —
    // all exact integer arithmetic (div, not float division)
    val spans = local.join(offDf, Seq("__b"))
      .withColumn("__s", col("__cum") + col("__off"))
      .withColumn("__first", expr(s"__s div $budget"))
      .withColumn("__last", expr(s"(__s + __l - 1) div $budget"))
      .withColumn("seq_id", explode(sequence(col("__first"), col("__last"))))
      .filter(col("seq_id") < nFull)
      .select(col("seq_id"), col("__id").as(idCol),
        greatest(col("seq_id") * budget - col("__s"), lit(0L))
          .as("tok_start"),
        (least((col("seq_id") + 1) * budget - col("__s"), col("__l")) - 1)
          .as("tok_end"))
      .withColumn("n_tok", col("tok_end") - col("tok_start") + 1)
    spans
  }

  /** Per-sequence packing audit: how many docs each sequence draws from
    * and its fill (always exactly `budget` for full sequences — the
    * invariant the oracle hash pins corpus-wide). */
  def packingStats(plan: DataFrame): DataFrame =
    plan.groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("fill"))
}
