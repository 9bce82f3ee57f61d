package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: attach every right row with the same key whose
  * timestamp falls in `[leftTs + lower, leftTs + upper)`.
  *
  * The naive formulation — an equi-join on key plus a range predicate —
  * degenerates when keys are hot: Spark must evaluate the range filter
  * over the full per-key cross product. The scalable pattern is time
  * bucketing: each right row is assigned ONE bucket of width `bucketMs`,
  * each left row probes the handful of buckets its window spans, and the
  * join becomes an equi-join on (key, bucket) with the exact range check
  * as a post-filter. Shuffle volume is |R| + |L|·(span/bucketMs + 1) rows
  * keyed by (key, bucket) — per-bucket workloads stay bounded no matter
  * how skewed a key's history is, and each matching pair is produced
  * exactly once (a right row lives in exactly one bucket).
  *
  * Pick `bucketMs` ≈ the window span: wider buckets shrink the probe
  * fan-out, narrower buckets tighten the post-filter selectivity.
  */
object RangeJoin {

  /** @param lowerOffsetMs window start offset from the left timestamp
    *                      (inclusive), e.g. -3600000 for "1 hour before"
    * @param upperOffsetMs window end offset (exclusive), e.g. 0 for
    *                      "strictly before the left event"
    * @param prefix        prefix for attached right columns
    * @return inner-join pairs: all left columns + prefixed right columns
    */
  def withinInterval(left: DataFrame, right: DataFrame, keyCol: String,
                     leftTsCol: String, rightTsCol: String,
                     lowerOffsetMs: Long, upperOffsetMs: Long,
                     bucketMs: Long = 3600000L,
                     prefix: String = "r_"): DataFrame = {
    require(upperOffsetMs > lowerOffsetMs, "empty window")
    require(bucketMs > 0, "bucketMs must be positive")

    // all arithmetic in microseconds: the exact-range post-filter keeps
    // full timestamp precision (no truncation drift at window boundaries)
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val (lowerUs, upperUs, bucketUs) =
      (lowerOffsetMs * 1000L, upperOffsetMs * 1000L, bucketMs * 1000L)

    val rCols = right.columns.filterNot(_ == keyCol).toSeq
    val r = right.select(
      col(keyCol).as("__k"),
      floor(us(col(rightTsCol)) / bucketUs).as("__bucket"),
      struct(rCols.map(col): _*).as("__r"))

    val lo = us(col(leftTsCol)) + lowerUs
    val hi = us(col(leftTsCol)) + upperUs // exclusive
    val l = left.select(
      col("*"),
      us(col(leftTsCol)).as("__lts"),
      explode(sequence(floor(lo / bucketUs), floor((hi - 1) / bucketUs)))
        .as("__bucket"))

    l.join(r, l(keyCol) === r("__k") && l("__bucket") === r("__bucket"))
      .withColumn("__rts", us(col(s"__r.$rightTsCol")))
      .filter(col("__rts") >= col("__lts") + lowerUs &&
        col("__rts") < col("__lts") + upperUs)
      .select(left.columns.map(col).toSeq ++
        rCols.map(c => col(s"__r.$c").as(s"$prefix$c")): _*)
  }

  /** KEYLESS interval×interval overlap join (closed intervals, micros):
    * emit every (left, right) pair with `lStart <= rEnd && rStart <=
    * lEnd`. Without an equi-key the naive spelling is a cartesian
    * product; the scalable shape decomposes each interval into the
    * width-`bucketUs` buckets it covers and equi-joins on the bucket id.
    * Each overlapping pair shares at least the bucket containing
    * `max(lStart, rStart)`, and the CANONICAL-BUCKET rule — keep a
    * candidate only in exactly that bucket — emits every pair exactly
    * once with no distinct. Shuffle volume is Σ(len/bucket + 1) rows per
    * side; pick `bucketUs` near the typical interval length.
    */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
                  right: DataFrame, rStart: String, rEnd: String,
                  bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val l = left.withColumn("__lb",
      explode(sequence(floor(col(lStart) / bucketUs).cast("bigint"),
        floor(col(lEnd) / bucketUs).cast("bigint"))))
    val r = right.withColumn("__rb",
      explode(sequence(floor(col(rStart) / bucketUs).cast("bigint"),
        floor(col(rEnd) / bucketUs).cast("bigint"))))
    l.join(r, col("__lb") === col("__rb") &&
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__lb") === floor(greatest(col(lStart), col(rStart)) / bucketUs)
          .cast("bigint"))
      .drop("__lb", "__rb")
  }
}
