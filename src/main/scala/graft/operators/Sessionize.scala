package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream batch analytics: sessionization and time-bucket rollups.
  *
  * Batch sessionization is the classic gaps-and-islands: lag over
  * (user, ts), new-session flag on gap > timeout, running sum → session id.
  * One shuffle, partitioned by user — at 100 TB the per-user partitions are
  * small and the window sort is local to each key group.
  *
  * The streaming equivalent (session_window / flatMapGroupsWithState) lives
  * in graft.streaming.
  */
object Sessionize {

  /** Assign a per-user session index; a session break is a gap strictly
    * greater than `gapMinutes`.
    */
  def withSessionIds(events: DataFrame, userCol: String, tsCol: String,
                     gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val gap = unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(byUser))
    val isNew = when(gap.isNull || gap > gapMinutes * 60L, lit(1)).otherwise(lit(0))
    events.withColumn("is_new_session", isNew)
      .withColumn("session_idx",
        sum(col("is_new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("is_new_session")
  }

  /** Sessions per user + total events (the usual session rollup). */
  def sessionCounts(events: DataFrame, userCol: String, tsCol: String,
                    gapMinutes: Int = 30): DataFrame =
    withSessionIds(events, userCol, tsCol, gapMinutes)
      .groupBy(col(userCol))
      .agg(max(col("session_idx")).as("n_sessions"),
        count(lit(1)).as("n_events"))

  /** Throttle-dedup (debounce): drop an event arriving less than
    * `minGapUs` after the PREVIOUS event of the same (user, type) —
    * telemetry hygiene for double-fires and retry storms. The kept flag
    * depends only on each event's immediate predecessor (a lag, not a
    * kept-chain), which keeps the rule engine-portable AND gives the
    * streaming twin ([[graft.streaming.EventStream.streamingThrottle]])
    * batch-split invariance with one scalar of state per key. Exact
    * integer micros end to end.
    *
    * Scale shape: one hash exchange on (user, type); the window sort is
    * local to each key group.
    */
  def throttleDedup(events: DataFrame, userCol: String, typeCol: String,
                    idCol: String, tsCol: String, minGapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol), col(typeCol))
      .orderBy(col("ts_us"), col(idCol))
    events.select(col(idCol), col(userCol), col(typeCol),
        unix_micros(col(tsCol)).as("ts_us"))
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .filter(col("prev").isNull || col("ts_us") - col("prev") >= minGapUs)
      .select(col(idCol), col(userCol), col(typeCol), col("ts_us"))
  }

  /** Fixed time-bucket rollup (hourly by default): count + value sum per
    * (bucket, event type). Partial-aggregated; shuffle carries one row per
    * (bucket, type).
    */
  def timeBuckets(events: DataFrame, tsCol: String, typeCol: String,
                  valueCol: String, bucket: String = "hour"): DataFrame =
    events.groupBy(
        date_trunc(bucket, col(tsCol)).as("bucket"),
        col(typeCol))
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol)), 2).as("value_sum"))
}
