package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection — median / MAD (median absolute
  * deviation) instead of mean / stddev, so a handful of pathological
  * documents cannot drag the threshold toward themselves (the classic
  * failure of z-score filtering on heavy-tailed web-corpus length
  * distributions). The pipeline use is per-language adaptive quality
  * gates: "drop documents whose token count is wildly atypical FOR THEIR
  * LANGUAGE", where fixed global thresholds misfire on languages with
  * different typical lengths.
  *
  * Both medians are LOW medians (lower-middle element for even group
  * sizes), so every statistic is an exact integer taken from the data —
  * no interpolation, no floats — and the flags replay identically on any
  * engine. Degenerate groups where MAD = 0 (more than half the values
  * identical) flag every deviating row, the standard MAD convention.
  */
object Robust {

  /** Exact median/MAD outlier flags via two per-group window passes.
    * Returns (idCol, groupCol, x, med, mad, is_outlier) with
    * `is_outlier = |x − med| > k · MAD`.
    *
    * Scale shape: ONE hash exchange on the group key — the second window
    * (deviation rank) and the two unbounded aggregates reuse the first
    * window's partitioning, adding only sorts. The funnel to know about:
    * an exact group median necessarily sees the whole group in one task,
    * so a group holding most of a 100 TB corpus (e.g. `lang = 'en'`)
    * serializes. That is inherent to EXACT order statistics — at that
    * scale use [[approxOutliers]], whose mergeable KLL-style sketch
    * partial-aggregates map-side and never funnels.
    */
  def outliers(df: DataFrame, idCol: String, groupCol: String,
               valueCol: Column, k: Int = 3): DataFrame = {
    val wAll = Window.partitionBy(col("grp"))
    val wOrd = wAll.orderBy(col("x"), col(idCol))
    val wDev = wAll.orderBy(col("dev"), col(idCol))
    df.select(col(idCol), col(groupCol).as("grp"), valueCol.cast("bigint").as("x"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("med",
        max(when(col("rn") === expr("(n + 1) div 2"), col("x"))).over(wAll))
      .withColumn("dev", abs(col("x") - col("med")))
      .withColumn("rn2", row_number().over(wDev))
      .withColumn("mad",
        max(when(col("rn2") === expr("(n + 1) div 2"), col("dev"))).over(wAll))
      .select(col(idCol), col("grp").as(groupCol), col("x"), col("med"),
        col("mad"), (col("dev") > lit(k) * col("mad")).as("is_outlier"))
  }

  /** The 100 TB path: same contract as [[outliers]], but both medians
    * come from `percentile_approx` — a mergeable sketch that partial-
    * aggregates map-side, so no group ever funnels through one task. Two
    * corpus scans + two tiny per-group aggregate shuffles; the per-group
    * stats rows broadcast back. At `accuracy` = 10k the sketch median of
    * integer data is exact for groups up to ~10k rows (spec-pinned equal
    * to [[outliers]] on driver testdata) and drifts by at most
    * 1/accuracy quantile rank beyond that — flags near the threshold may
    * differ, which is the accepted trade for unserialized scale.
    */
  def approxOutliers(df: DataFrame, idCol: String, groupCol: String,
                     valueCol: Column, k: Int = 3,
                     accuracy: Int = 10000): DataFrame = {
    val base = df.select(col(idCol), col(groupCol).as("grp"),
      valueCol.cast("bigint").as("x"))
    val med = base.groupBy(col("grp"))
      .agg(percentile_approx(col("x"), lit(0.5), lit(accuracy)).as("med"))
    val withMed = base.join(broadcast(med), "grp")
      .withColumn("dev", abs(col("x") - col("med")))
    val mad = withMed.groupBy(col("grp"))
      .agg(percentile_approx(col("dev"), lit(0.5), lit(accuracy)).as("mad"))
    withMed.join(broadcast(mad), "grp")
      .select(col(idCol), col("grp").as(groupCol), col("x"), col("med"),
        col("mad"), (col("dev") > lit(k) * col("mad")).as("is_outlier"))
  }
}
