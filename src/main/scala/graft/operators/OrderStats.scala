package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics at scale — the k-th smallest element of a
  * numeric column WITHOUT a global sort, by iterative histogram
  * refinement (the classic distributed selection algorithm; the exact
  * complement of `percentile_approx`'s sketch).
  *
  * Each round partitions every pending candidate range into `buckets`
  * equi-width cells and counts them in ONE partially-aggregated groupBy
  * (counts only ride the shuffle — `buckets` cells per pending range per
  * partition, never values), carrying each cell's true min/max: a cell
  * of duplicates (min == max) resolves without a fetch, and refinement
  * recurses into [min, max] — strictly tighter than the cell bounds, so
  * heavy duplicate mass cannot stall convergence. When a cell's
  * population is under `collectLimit` its values are fetched and the
  * rank read off exactly; every fetch is preceded by a count, so the
  * driver-memory bound is enforced, not hoped for. Rounds are
  * O(log_buckets(n/collectLimit)) — 3 rounds cover 10^12 rows at the
  * defaults.
  *
  * Determinism: ranks are over `ORDER BY value` with the k-th row's
  * VALUE read out — duplicates make any tie-order yield the same value,
  * so the result is exactly the SQL `row_number() = k` spelling.
  */
object OrderStats {

  /** Exact values at 1-based ranks per group — ALL groups refine
    * together: one histogram pass per round covers every pending
    * (group, range), so the round count is that of the worst group, not
    * the sum. Returns (group, rank) -> value.
    */
  def groupedKthSmallest(df: DataFrame, groupCol: String, valueCol: String,
                         ranks: Map[String, Seq[Long]], buckets: Int = 1024,
                         collectLimit: Int = 100000,
                         maxRounds: Int = 8): Map[(String, Long), Double] = {
    require(ranks.nonEmpty && ranks.values.forall(_.nonEmpty) && buckets >= 2)
    val v = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && col("g").isNotNull)
      .localCheckpoint() // scanned once per refinement round
    val bounds = v.groupBy(col("g"))
      .agg(min(col("v")), max(col("v")), count(lit(1)))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    ranks.foreach { case (g, ks) =>
      val n = bounds.get(g).fold(0L)(_._3)
      require(ks.forall(k => k >= 1 && k <= n),
        s"group $g: ranks $ks out of range 1..$n")
    }
    // state per wanted (group, rank): remaining rank within [lo, hi]
    var pending: Map[(String, Long), (Long, Double, Double)] =
      ranks.flatMap { case (g, ks) =>
        val (lo, hi, _) = bounds(g)
        ks.distinct.map(k => (g, k) -> ((k, lo, hi)))
      }
    val done = scala.collection.mutable.Map[(String, Long), Double]()
    var round = 0
    while (pending.nonEmpty && round < maxRounds) {
      round += 1
      val (small, large) = pending.partition { case (_, (_, lo, hi)) => lo == hi }
      small.foreach { case (gk, (_, lo, _)) => done(gk) = lo }
      pending = large
      if (pending.nonEmpty) {
        // cell = ri * buckets + local bucket; hi maps into the last cell.
        // Chained .when (no otherwise): values outside every range → null
        val ranges = pending.map { case ((g, _), (_, lo, hi)) => (g, lo, hi) }
          .toSeq.distinct.sorted
        val cellOf: Column = ranges.zipWithIndex.map { case ((g, lo, hi), ri) =>
          ((col("g") === g && col("v") >= lo && col("v") <= hi),
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
          .collect().map(r => r.getInt(0) ->
            ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
        pending = pending.map { case (gk @ (g, _), (rank, lo, hi)) =>
          val ri = ranges.indexOf((g, lo, hi))
          var rem = rank
          var cell = 0
          def cnt(c: Int): Long = cells.get(ri * buckets + c).fold(0L)(_._1)
          while (cell < buckets && rem > cnt(cell)) {
            rem -= cnt(cell)
            cell += 1
          }
          val (cellN, cmin, cmax) = cells(ri * buckets + cell)
          if (cmin == cmax) {
            done(gk) = cmin // all duplicates: the rank's value is known
          } else if (cellN <= collectLimit) {
            // exact: fetch the cell's values (count-verified bound), sort
            val vals = v.filter(col("g") === g &&
              col("v") >= cmin && col("v") <= cmax)
              .collect().map(_.getDouble(1)).sorted
            done(gk) = vals(rem.toInt - 1)
          }
          gk -> ((rem, cmin, cmax))
        }.filter { case (gk, _) => !done.contains(gk) }
      }
    }
    require(pending.isEmpty,
      s"quantile refinement did not converge in $maxRounds rounds: $pending")
    done.toMap
  }

  /** Exact values at the given 1-based ranks of `valueCol` (nulls
    * excluded). Returns rank -> value. The single-column spelling of
    * [[groupedKthSmallest]].
    */
  def kthSmallest(df: DataFrame, valueCol: String, ranks: Seq[Long],
                  buckets: Int = 1024, collectLimit: Int = 100000,
                  maxRounds: Int = 8): Map[Long, Double] =
    groupedKthSmallest(df.withColumn("__g", lit("_")), "__g", valueCol,
      Map("_" -> ranks), buckets, collectLimit, maxRounds)
      .map { case ((_, k), x) => k -> x }

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

  /** Per-group exact quantiles at probabilities `ps` (the scale path for
    * per-language length profiles): one grouped count pass picks each
    * group's ranks, then every group refines together. Returns local
    * (group, p, k, value) rows sorted by (group, p).
    */
  def groupedExactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                            ps: Seq[Double]): Seq[(String, Double, Long, Double)] = {
    val ns = df.select(col(groupCol).cast("string").as("g"), col(valueCol))
      .filter(col(valueCol).isNotNull && col("g").isNotNull)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ks = ns.keys.toSeq.sorted.flatMap { g =>
      ps.map(p => (g, p, math.max(1L, math.ceil(p * ns(g)).toLong)))
    }
    val byRank = groupedKthSmallest(df, groupCol, valueCol,
      ks.groupBy(_._1).view.mapValues(_.map(_._3)).toMap)
    ks.map { case (g, p, k) => (g, p, k, byRank((g, k))) }
  }
  /** Contiguous global row ids in (tsCol, tieCol) order WITHOUT a
    * single-partition window: partition on a deterministic coarse PREFIX
    * of the order key (its calendar day), give the per-day counts
    * exclusive prefix offsets in a window over that tiny set, broadcast
    * them back, and number each day independently —
    * grank = offset(day) + row_number within day. Day is a prefix of the
    * (ts, tie) order, so the concatenation IS the global order; at 100 TB
    * pick hour/minute grain to bound per-group size (same plan, finer
    * key). Emits (tieCol, grank).
    */
  def globalRowNumbers(df: DataFrame, tsCol: String, tieCol: String): DataFrame = {
    val ev = df.select(col(tieCol), col(tsCol),
      to_date(col(tsCol)).as("__day"))
    val offsets = ev.groupBy(col("__day")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.orderBy(col("__day"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    val wIn = Window.partitionBy(col("__day"))
      .orderBy(col(tsCol), col(tieCol))
    ev.join(broadcast(offsets), Seq("__day"))
      .select(col(tieCol),
        (col("__off") + row_number().over(wIn)).cast("bigint").as("grank"))
  }

  /** Scale-safe NTILE: bucket 1..`buckets` per row under the global
    * (orderCol, tieCol) order, WITHOUT a single-partition window — the
    * same coarse-prefix-offset construction as [[globalRowNumbers]],
    * generalized to any caller-supplied `prefix` that is a MONOTONE
    * coarsening of `orderCol` (equal prefix ⇒ contiguous run in the
    * global order; e.g. the value itself for a low-cardinality metric,
    * `value div 10^6` for a fine-grained one, the calendar day of a
    * timestamp). Exact SQL NTILE semantics: with n rows, the first
    * n mod b buckets hold ⌈n/b⌉ rows, the rest ⌊n/b⌋ — reproduced as
    * pure integer arithmetic on the exact global rank, so the result
    * hash-matches any engine's NTILE under the same ORDER BY.
    * Emits (tieCol, bucket).
    */
  def globalNtile(df: DataFrame, prefix: Column, orderCol: Column,
                  tieCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1)
    // exact floor division for non-negative longs (Column has no div;
    // the subtraction keeps the double division remainder-free and the
    // operands stay far under 2^53)
    def idiv(a: Column, d: Column): Column =
      ((a - pmod(a, d)) / d).cast("bigint")
    val ev = df.select(col(tieCol), orderCol.as("__ord"), prefix.as("__pfx"))
    val offsets = ev.groupBy(col("__pfx")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.orderBy(col("__pfx"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    val total = ev.agg(count(lit(1)).as("__tot"))
    val wIn = Window.partitionBy(col("__pfx"))
      .orderBy(col("__ord"), col(tieCol))
    val b = lit(buckets.toLong)
    val i = col("__off") + row_number().over(wIn)
    val q = idiv(col("__tot"), b)     // floor bucket size
    val r = col("__tot") % b          // first r buckets hold q+1 rows
    ev.join(broadcast(offsets), Seq("__pfx"))
      .crossJoin(broadcast(total))
      .select(col(tieCol),
        when(i <= r * (q + 1), idiv(i + q, q + 1))
          .otherwise(r + idiv(i - r * (q + 1) + q - 1, q))
          .cast("int").as("bucket"))
  }
}
