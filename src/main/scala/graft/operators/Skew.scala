package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot join keys.
  *
  * AQE's skew-join splitting (on by default) handles most sort-merge skew
  * at runtime; explicit salting remains the tool when a handful of keys
  * dominate so badly that even split partitions bottleneck, or when the
  * plan must avoid SMJ entirely. `saltedJoin` spreads each hot big-side
  * key over `salt` shuffle partitions and replicates the matching
  * small-side rows, so no single task owns a whole hot key.
  *
  * Cost model: big side shuffles unchanged (one salted key per row), small
  * side shuffles ×`salt`. Worth it iff the small side is modest and the
  * key histogram is pathological — measure first; broadcast the small side
  * instead whenever it fits (`broadcast()` beats salting outright).
  */
object Skew {

  /** Inner equi-join with the big side salted over `salt` buckets.
    * Result equals `big.join(small, keys)` row-for-row.
    *
    * The salt is `rand()`-based, not a row hash: a hot key's rows are
    * often exact duplicates (the classic skew case), and a content hash
    * would send all of them to ONE salt bucket — defeating the spread.
    * Join output is invariant to which salt each row draws (the small
    * side carries every salt), so rand's per-task-retry nondeterminism
    * cannot change results.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int = 16): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val b = big.withColumn("__salt", floor(rand(42) * salt).cast("long"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    b.join(s, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys with non-reducible
    * aggregates (`collect_set`-style, where map-side partial aggregation
    * can't shrink the hot key): phase 1 aggregates (key, salt) buckets,
    * phase 2 merges the per-bucket results. Algebraic aggregates
    * (sum/count/min/max) don't need this — Spark's partial agg already
    * bounds them.
    */
  def saltedDistinctSets(df: DataFrame, key: String, valueCol: String,
                         salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_set(col(valueCol)).as("vs"))
      .groupBy(col(key))
      .agg(array_sort(array_distinct(flatten(collect_list(col("vs")))))
        .as("values"))
}
