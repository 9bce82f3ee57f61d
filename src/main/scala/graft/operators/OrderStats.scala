package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics at scale — the k-th smallest element of a
  * numeric column WITHOUT a global sort, by iterative histogram
  * refinement (the classic distributed selection algorithm; the exact
  * complement of `percentile_approx`'s sketch).
  *
  * Each round partitions the candidate range into `buckets` equi-width
  * cells and counts them in ONE partially-aggregated groupBy (counts
  * only ride the shuffle — `buckets` rows per partition, never values);
  * the driver walks the counts to find which cell holds each wanted
  * rank, and the next round refines only those cells. When a cell's
  * population is under `collectLimit` its values are fetched and the
  * rank read off exactly. Driver memory is bounded by `buckets` counts
  * per round plus one `collectLimit` fetch; every fetch is preceded by a
  * count, so the bound is enforced, not hoped for. Rounds are
  * O(log_buckets(n/collectLimit)) — 3 rounds cover 10^12 rows at the
  * defaults. Degenerate cells (all one value) resolve immediately.
  *
  * Determinism: ranks are over `ORDER BY value` with the k-th row's
  * VALUE read out — duplicates make any tie-order yield the same value,
  * so the result is exactly the SQL `row_number() = k` spelling.
  */
object OrderStats {

  /** Exact values at the given 1-based ranks of `valueCol` (nulls
    * excluded). Returns rank -> value.
    */
  def kthSmallest(df: DataFrame, valueCol: String, ranks: Seq[Long],
                  buckets: Int = 1024, collectLimit: Int = 100000,
                  maxRounds: Int = 8): Map[Long, Double] = {
    require(ranks.nonEmpty && buckets >= 2)
    val v = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .localCheckpoint() // scanned once per refinement round
    val b0 = v.agg(min(col("v")), max(col("v")), count(lit(1))).head()
    val n = b0.getLong(2)
    require(ranks.forall(k => k >= 1 && k <= n),
      s"ranks $ranks out of range 1..$n")
    // state per wanted rank: (remaining rank within [lo, hi], lo, hi)
    var pending: Map[Long, (Long, Double, Double)] =
      ranks.map(k => k -> (k, b0.getDouble(0), b0.getDouble(1))).toMap
    val done = scala.collection.mutable.Map[Long, Double]()
    var round = 0
    while (pending.nonEmpty && round < maxRounds) {
      round += 1
      // resolve degenerate / small-enough ranges; histogram the rest
      val (small, large) = pending.partition { case (_, (_, lo, hi)) =>
        lo == hi
      }
      small.foreach { case (k, (_, lo, _)) => done(k) = lo }
      pending = large
      if (pending.nonEmpty) {
        // ONE histogram pass counts every pending range's cells together,
        // carrying each cell's true min/max: a cell of duplicates
        // (min == max) resolves without a fetch, and refinement recurses
        // into [min, max] — strictly tighter than the cell bounds, so
        // heavy duplicate mass cannot stall convergence.
        // cell = ri * buckets + local bucket; hi maps into the last cell.
        // Chained .when (no otherwise): values outside every range → null
        val ranges = pending.values.map { case (_, lo, hi) => (lo, hi) }
          .toSeq.distinct.sortBy(_._1)
        val cellOf: Column = ranges.zipWithIndex.map { case ((lo, hi), ri) =>
          ((col("v") >= lo && col("v") <= hi),
            lit(ri * buckets) + least(lit(buckets - 1),
              floor((col("v") - lo) / ((hi - lo) / buckets)).cast("int")))
        } match {
          case (c0, v0) +: rest =>
            rest.foldLeft(when(c0, v0)) { case (acc, (c, vv)) => acc.when(c, vv) }
        }
        val cells = v.select(col("v"), cellOf.as("cell"))
          .filter(col("cell").isNotNull)
          .groupBy(col("cell"))
          .agg(count(lit(1)).as("c"), min(col("v")).as("mn"), max(col("v")).as("mx"))
          .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
          .toMap
        pending = pending.map { case (k, (rank, lo, hi)) =>
          val ri = ranges.indexOf((lo, hi))
          var rem = rank
          var cell = 0
          def cnt(c: Int): Long = cells.get(ri * buckets + c).fold(0L)(_._1)
          while (cell < buckets && rem > cnt(cell)) {
            rem -= cnt(cell)
            cell += 1
          }
          val (cellN, cmin, cmax) = cells(ri * buckets + cell)
          if (cmin == cmax) {
            done(k) = cmin // all duplicates: the rank's value is known
          } else if (cellN <= collectLimit) {
            // exact: fetch the cell's values (count-verified bound), sort
            val vals = v.filter(col("v") >= cmin && col("v") <= cmax)
              .collect().map(_.getDouble(0)).sorted
            done(k) = vals(rem.toInt - 1)
          }
          k -> (rem, cmin, cmax)
        }.filter { case (k, _) => !done.contains(k) }
      }
    }
    require(pending.isEmpty,
      s"quantile refinement did not converge in $maxRounds rounds: $pending")
    done.toMap
  }

  /** Exact quantiles of `valueCol` at probabilities `ps` using the
    * k = max(1, ceil(p·n)) discrete definition — each result is an
    * actual data value, bit-identical to the SQL
    * `row_number() OVER (ORDER BY v) = k` spelling. Returns a local
    * (p, k, value) table; wrap with `spark.createDataFrame` for a query.
    */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     ps: Seq[Double]): Seq[(Double, Long, Double)] = {
    val n = df.select(col(valueCol)).filter(col(valueCol).isNotNull).count()
    val ks = ps.map(p => p -> math.max(1L, math.ceil(p * n).toLong))
    val byRank = kthSmallest(df, valueCol, ks.map(_._2).distinct)
    ks.map { case (p, k) => (p, k, byRank(k)) }
  }
}
