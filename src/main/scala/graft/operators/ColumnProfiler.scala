package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling.
  *
  * Computes the reference's per-column profile — min / max / avg / median /
  * distinct-count / count / top-1 value (reference:
  * plugins/extractors/bigquery/bigquery.go:386-411).
  *
  * The reference runs ONE aggregation query and one goroutine PER COLUMN
  * (bigquery.go:237-254). Spark-first reformulation: a single
  * multi-aggregate pass computes every column's stats in ONE scan — strictly
  * better at any scale (N columns = 1 table scan, not N).
  *
  * At 100 TB use the default approximate variants: `approx_count_distinct`
  * (HLL++, fixed-size sketch, partial-aggregable) and `percentile_approx`
  * (KLL-style, mergeable). The exact variants exist for oracle-checked
  * correctness runs at small SF.
  */
object ColumnProfiler {

  /** One row with `<col>_min/_max/_avg/_med/_unique/_count` per input column.
    *
    * Approximate path (the 100 TB default): ONE multi-aggregate scan with
    * HLL++ distinct and KLL-style percentile — every sketch is mergeable and
    * partial-aggregated map-side.
    *
    * Exact path (`exactMedian && exactDistinct`, the small-SF oracle mode):
    * the naive `percentile + countDistinct` agg plans an Expand (one data
    * copy per distinct-agg) feeding a non-codegen ObjectHashAggregate with
    * per-row percentile buffers — ~6× slower than reducing each column to
    * its (value, count) groups first. Per column: hash-groupBy on the value
    * (shuffle carries distinct values only), then min/max/avg/count/unique
    * fall out of one tiny agg and the interpolated median from a cumulative
    * count over the sorted value groups. The ordered window funnels distinct
    * values of one column to one task — same terminal funnel Spark's own
    * exact `percentile` has; use the approximate path at scale.
    */
  def profile(df: DataFrame, cols: Seq[String],
              exactMedian: Boolean = false,
              exactDistinct: Boolean = false): DataFrame =
    if (exactMedian && exactDistinct)
      cols.map(c => exactProfileOne(df, c)).reduce(_.crossJoin(_))
    else {
      val aggs: Seq[Column] = cols.flatMap { c =>
        val med =
          if (exactMedian) expr(s"percentile(`$c`, 0.5)")
          else percentile_approx(col(c), lit(0.5), lit(10000))
        val uniq =
          if (exactDistinct) countDistinct(col(c))
          else approx_count_distinct(col(c))
        Seq(
          min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max"),
          avg(col(c)).as(s"${c}_avg"),
          med.as(s"${c}_med"),
          uniq.as(s"${c}_unique"),
          count(col(c)).as(s"${c}_count"))
      }
      df.agg(aggs.head, aggs.tail: _*)
    }

  /** Exact single-column profile over (value, count) groups — see
    * [[profile]]. Median matches `percentile(c, 0.5)` / DuckDB
    * `quantile_cont(c, 0.5)`: for an even row count the mean of the two
    * middle values, else the middle value.
    */
  private def exactProfileOne(df: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.filter(col(c).isNotNull)
      .groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
    val totals = g.agg(
      sum(col("cnt")).as("total"),
      sum(col("v") * col("cnt")).as("vsum"),
      count(lit(1)).as("ndist"),
      min(col("v")).as("vmin"),
      max(col("v")).as("vmax"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    val cum = g.select(col("v"), sum(col("cnt")).over(w).as("cum"))
      .crossJoin(broadcast(totals))
    // 1-based middle positions: n even → n/2 and n/2+1, n odd → (n+1)/2 twice
    val lowV = min(when(col("cum") >= floor((col("total") + 1) / 2), col("v")))
    val highV = min(when(col("cum") >= floor((col("total") + 2) / 2), col("v")))
    cum.agg(
      max(col("vmin")).as(s"${c}_min"),
      max(col("vmax")).as(s"${c}_max"),
      (max(col("vsum")) / max(col("total"))).as(s"${c}_avg"),
      ((lowV + highV) / 2.0).as(s"${c}_med"),
      coalesce(max(col("ndist")), lit(0L)).as(s"${c}_unique"),
      coalesce(max(col("total")), lit(0L)).as(s"${c}_count"))
  }

  /** Most frequent value of a column — APPROX_TOP_COUNT(c, 1) analogue
    * (reference: bigquery.go:394). Deterministic tie-break on the value.
    * groupBy + count is partial-aggregated map-side, so the shuffle carries
    * only (distinct value, count) pairs.
    */
  def top1(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c).cast("string").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("value"))
      .limit(1)

  /** First-N-rows preview (reference: bigquery.go:280-337, default cap 30).
    * Ordered for determinism — the reference relies on source order.
    */
  def preview(df: DataFrame, orderCols: Seq[String], n: Int = 30): DataFrame =
    df.orderBy(orderCols.map(col): _*).limit(n)

  /** Mergeable distinct-count sketches (Apache DataSketches HLL via
    * Spark's hll_sketch_agg): one binary sketch per group, unioned later
    * with `mergeSketches` — the 100 TB pattern for incremental distinct
    * counts (per-partition/day sketches persisted once, rollups merge
    * sketches instead of rescanning data).
    */
  def distinctSketches(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Union per-group sketches into one estimate (sketch-merge rollup). */
  def mergeSketches(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("distinct_estimate"))
}
