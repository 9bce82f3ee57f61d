package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series kernels over an event stream: calendar
  * gap-fill with forward-fill, exact integer trend fitting, and
  * sweep-line concurrency — the reporting layer a metrics pipeline
  * needs once events land.
  *
  * All three stay exact-integer (counts, rational slope as num/den,
  * sweep counters) so results are bit-reproducible cross-engine.
  *
  * Reference behavior: odpf/meteor has no time-series operators; this
  * supports the classic-operator mandate (window/sequence analytics).
  */
object TimeSeries {

  /** Per-key DAILY series with missing calendar days materialized:
    * every day in [min(day), max(day)] of that key exists in the
    * output, `n` = that day's row count (0 on gap days) and `filled` =
    * the most recent non-gap day's count (forward fill).
    *
    * Scale shape: per-key bounds are one partial-aggregable groupBy;
    * the calendar is `sequence()`-exploded from the bounds (grid rows
    * only — never a cross join against a calendar dim), the observed
    * counts join back on (key, day), and the forward fill is one
    * `last(ignoreNulls)` window per key in day order. Two hash
    * exchanges total on the same (key) grouping — AQE coalesces. A key
    * spanning y years emits 365·y grid rows: bounded by time span, not
    * by data volume.
    */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val days = df.select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .groupBy(col("key"), col("day")).agg(count(lit(1)).as("n"))
    val grid = days.groupBy(col("key"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("key"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("day"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    grid.join(days, Seq("key", "day"), "left")
      .select(col("key"), col("day"), coalesce(col("n"), lit(0L)).as("n"),
        col("n").as("__obs"))
      .withColumn("filled",
        last(col("__obs"), ignoreNulls = true).over(w).cast("bigint"))
      .drop("__obs")
  }

  /** Exact per-key linear trend of daily counts: least-squares slope of
    * (x = epoch day, y = rows that day) carried as the RATIONAL
    * numerator/denominator pair (both BIGINT) —
    * slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) — plus the integer sums
    * themselves, so the fit is bit-checkable cross-engine with no float
    * in sight. Gap days count as y=0 observations via the same grid as
    * [[gapFillDaily]] (a trend over only-observed days biases upward).
    *
    * Scale shape: grid explode + one partial-aggregable groupBy(key) —
    * every Σ is a plain sum, so map-side combine does the heavy lifting.
    */
  def trendFit(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = gapFillDaily(df, keyCol, tsCol)
      .select(col("key"),
        datediff(col("day"), lit("1970-01-01").cast("date"))
          .cast("bigint").as("x"),
        col("n").as("y"))
    daily.groupBy(col("key")).agg(
        count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("key"), col("n_days"), col("sx"), col("sy"),
        col("sxy"), col("sxx"),
        (col("n_days") * col("sxy") - col("sx") * col("sy"))
          .as("slope_num"),
        (col("n_days") * col("sxx") - col("sx") * col("sx"))
          .as("slope_den"))
  }

  /** Sweep-line maximum concurrency per day: each event holds a
    * resource for `holdSeconds` (clamped at midnight so intervals never
    * cross the partition boundary); output is each day's peak number of
    * simultaneously-open holds and the earliest instant the peak is
    * reached. Classic +1/−1 endpoint sweep: running sum over endpoints
    * ordered by (time, delta) — ends before starts at the same instant,
    * i.e. touching intervals don't overlap.
    *
    * Scale shape: endpoints double the rows map-side, then ONE window +
    * ONE groupBy, both partitioned by day — no global ordering, no
    * single-partition window. At finer grain partition by (day, hour)
    * with carry-in correction; day-clamping keeps this exact here.
    */
  def maxConcurrencyDaily(df: DataFrame, tsCol: String,
                          holdSeconds: Int = 300): DataFrame = {
    val ev = df.select(col(tsCol).as("t0"), to_date(col(tsCol)).as("day"))
      .select(col("day"), col("t0"),
        least(col("t0") + expr(s"interval $holdSeconds second"),
          (col("day") + expr("interval 1 day")).cast("timestamp"))
          .as("t1"))
    val endpoints = ev.select(col("day"), col("t0").as("t"), lit(1).as("delta"))
      .unionAll(ev.select(col("day"), col("t1").as("t"), lit(-1).as("delta")))
    // ascending (t, delta) puts the −1 first at a shared instant; the
    // running sum over ties is order-free within a tie group (all deltas
    // equal), so peak and its earliest instant are deterministic
    val w = Window.partitionBy(col("day"))
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDay = Window.partitionBy(col("day"))
    endpoints
      .withColumn("open", sum(col("delta")).over(w))
      .withColumn("peak", max(col("open")).over(wDay))
      .filter(col("open") === col("peak"))
      .groupBy(col("day"))
      .agg(max(col("open")).cast("bigint").as("peak"),
        min(col("t")).as("peak_at"))
  }
}
