package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the events schema
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference has no event-time engine (its "stream" is an in-process
  * channel pipe, SURVEY.md §2.5) — these are the 100 TB-pipeline extensions:
  * watermarked tumbling-window rollups, native session windows, and a
  * flatMapGroupsWithState sessionizer for custom state logic. The same
  * transforms run in batch mode (see operators.Sessionize) — one logical
  * definition, two execution modes, which is exactly the Spark-first reason
  * to express them as DataFrame ops.
  */
object EventStream {

  /** Watermarked tumbling-window count+sum per event type. Late data beyond
    * the watermark is dropped; state is bounded by (window × types).
    */
  def windowedRollup(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))

  /** Native session windows (gap-based), Spark's built-in sessionization. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))

  /** Streaming exact dedup: first occurrence per key wins; state for a key
    * is dropped once the watermark passes its event time (bounded state).
    * The streaming counterpart of batch `Dedup.exact` — dedup a 100 TB
    * ingest stream by content fingerprint with the fingerprint computed
    * map-side (`TextAnalysis.fingerprint`) before this operator.
    */
  def streamingDedup(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     watermark: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming corpus intake: the quality-gate + PII-scrub + fingerprint
    * front door of a training pipeline, applied to an UNBOUNDED document
    * stream. Pure map-side column kernels (graft.operators.TextAnalysis) —
    * literally the same expressions as the batch path, which is the point:
    * one logical definition, the engine supplies incremental execution.
    * Chain [[streamingDedup]] on `fp` downstream for watermarked exact
    * dedup of the intake.
    */
  def corpusIntake(docs: DataFrame, textCol: String = "text",
                   minTokens: Int = 25, maxRepetition: Double = 0.5): DataFrame = {
    import graft.operators.TextAnalysis
    docs
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("rep_ratio", round(TextAnalysis.repetitionRatio(col(textCol)), 4))
      .filter(col("n_tokens") >= minTokens && col("rep_ratio") <= maxRepetition)
      .withColumn(textCol, TextAnalysis.scrubPii(col(textCol)))
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
  }

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(count: Long, sum: Double, lastTs: Long)
  case class SessionOut(user_id: Long, n_events: Long, value_sum: Double)

  /** Custom stateful sessionizer via flatMapGroupsWithState — the extension
    * point for session logic session_window can't express (e.g. emit on
    * explicit "logout" events, cap session length). A session closes either
    * by an in-batch gap or by an event-time timeout once the watermark
    * passes lastTs + gap. Event-time (not processing-time) timeouts keep
    * the operator deterministic — replaying the same data gives the same
    * sessions — and avoid wall-clock-driven no-data micro-batches.
    */
  def statefulSessions(events: Dataset[Event],
                       gapMs: Long = 30L * 60 * 1000,
                       watermark: String = "2 hours"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.count, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
            val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
            sorted.foreach { e =>
              if (cur.count > 0 && e.ts.getTime - cur.lastTs > gapMs) {
                closed += SessionOut(userId, cur.count, cur.sum)
                cur = SessionState(0L, 0.0, Long.MinValue)
              }
              cur = SessionState(cur.count + 1, cur.sum + e.value, e.ts.getTime)
            }
            state.update(cur)
            state.setTimeoutTimestamp(cur.lastTs + gapMs)
            closed.iterator
          }
      }
  }
}
