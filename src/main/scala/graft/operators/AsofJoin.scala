package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for every left row, the single most recent
  * right row with the same key and `rightTs <= leftTs`.
  *
  * Spark has no native as-of join, and the naive formulation — an
  * inequality join followed by a per-left-row top-1 — explodes into a
  * range join (O(|L|·|R|) per key) before pruning. This implementation is
  * the scalable single-shuffle pattern instead: tag both sides, union,
  * and take `last(right payload, ignoreNulls)` over a window partitioned
  * by key and ordered by (ts, tag). Each key group is sorted once; memory
  * is O(1) per row beyond the sort (the running "most recent right row"),
  * and the only shuffle is the window's hash partition by key — the same
  * cost as a plain equi-join on the key, regardless of how many right rows
  * precede each left row.
  *
  * Ties (`rightTs == leftTs`): the right row sorts first (tag 0 < tag 1),
  * so an exactly-simultaneous right row IS matched — same semantics as
  * DuckDB's `ASOF LEFT JOIN ... ON l.ts >= r.ts`. The right payload rides
  * in ONE struct column so all matched fields come from the same right row
  * (per-column `last(ignoreNulls)` could mix rows when right columns hold
  * nulls). Left rows with no preceding right row keep null matched fields
  * (left-outer semantics).
  */
object AsofJoin {

  /** @param left       probe side (every row survives)
    * @param right      candidate side (most recent row per left row attaches)
    * @param keyCol     equi-join key present on both sides
    * @param leftTsCol  event-time column on `left`
    * @param rightTsCol event-time column on `right`
    * @param rightCols  right columns to attach (default: all but key/ts)
    * @param prefix     prefix for attached right columns
    * @param direction  "backward" (most recent right row at-or-before, the
    *                   default) or "forward" (nearest right row at-or-after)
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String,
           leftTsCol: String, rightTsCol: String,
           rightCols: Seq[String] = Nil, prefix: String = "asof_",
           direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val rCols =
      if (rightCols.nonEmpty) rightCols
      else right.columns.filterNot(c => c == keyCol || c == rightTsCol).toSeq
    val lCols = left.columns.toSeq

    val probes = left.select(
      col(keyCol).as("__k"), col(leftTsCol).cast("timestamp").as("__t"),
      lit(1).as("__tag"),
      struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(right.select(rCols.map(col): _*).schema).as("__r"))
    val cands = right.select(
      col(keyCol).as("__k"), col(rightTsCol).cast("timestamp").as("__t"),
      lit(0).as("__tag"),
      lit(null).cast(left.select(lCols.map(col): _*).schema).as("__l"),
      struct(rCols.map(col): _*).as("__r"))

    // forward scans time in reverse: the running "last right row seen"
    // becomes the nearest FOLLOWING one; tag order keeps ties matched.
    // The trailing __r DESC sort arbitrates right rows with IDENTICAL
    // (key, ts): last() lands on the MINIMUM right struct (field-order
    // comparison — first attached column, e.g. the smallest event_id),
    // the same tie-break the nearest oracle pins with `c.event_id ASC`.
    // Candidate __r is never null (struct of source columns), so the
    // null ordering of probe rows is irrelevant under ignoreNulls.
    val tsOrder = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(col("__k"))
      .orderBy(tsOrder, col("__tag"), col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    probes.unionByName(cands)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(lCols.map(c => col(s"__l.$c").as(c)) ++
        rCols.map(c => col(s"__m.$c").as(s"$prefix$c")): _*)
  }

  /** Nearest-in-time as-of join — the missing third direction: for every
    * left row, the right row with the smallest |Δt| in EITHER direction
    * (ties prefer the at-or-before match, like a backward default with a
    * forward fallback). Composed from one backward and one forward
    * [[asof]] pass — two key-partitioned windows, still never the
    * inequality-join explosion — then a per-row arbitration on the two
    * candidates' exact microsecond gaps. Attaches `prefix`-ed right
    * columns plus `<prefix>dir` ("backward"/"forward"/null) and
    * `<prefix>gap_us` (exact BIGINT microseconds, null when unmatched).
    * Full arbitration order on candidate ties: (|Δt|, backward-first,
    * minimum right struct) — duplicate (key, ts) right rows resolve to
    * the smallest attached struct on BOTH legs (see [[asof]]), so the
    * composed result matches a brute-force rank by (gap, dir, id ASC).
    */
  def asofNearest(left: DataFrame, right: DataFrame, keyCol: String,
                  leftTsCol: String, rightTsCol: String,
                  rightCols: Seq[String] = Nil,
                  prefix: String = "near_"): DataFrame = {
    val rCols0 =
      if (rightCols.nonEmpty) rightCols
      else right.columns.filterNot(c => c == keyCol || c == rightTsCol).toSeq
    val rCols = (rCols0 :+ rightTsCol).distinct // matched ts drives the gap
    val b = asof(left, right, keyCol, leftTsCol, rightTsCol, rCols,
      "__b_", "backward")
    val f = asof(b, right, keyCol, leftTsCol, rightTsCol, rCols,
      "__f_", "forward")
    val lts = col(leftTsCol).cast("timestamp")
    val bts = col(s"__b_$rightTsCol")
    val fts = col(s"__f_$rightTsCol")
    val gapB = unix_micros(lts) - unix_micros(bts)
    val gapF = unix_micros(fts) - unix_micros(lts)
    val useB = bts.isNotNull && (fts.isNull || gapB <= gapF)
    val attached = rCols0.map(c =>
      when(useB, col(s"__b_$c")).otherwise(col(s"__f_$c")).as(s"$prefix$c")) ++
      Seq(
        when(useB, lit("backward"))
          .otherwise(when(fts.isNotNull, lit("forward"))).as(s"${prefix}dir"),
        when(useB, gapB).otherwise(gapF).as(s"${prefix}gap_us"))
    f.select(left.columns.map(col).toSeq ++ attached: _*)
  }
}
