package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical data layout for 100 TB corpora — the ingest-time decisions that
  * make every later query cheap:
  *
  *  - **Partition columns** (`writePartitioned`): low-cardinality filter
  *    keys (lang, source, date) become directory partitions, so a filtered
  *    read prunes whole directories (`PartitionFilters` in the scan, zero
  *    I/O for pruned values) instead of scanning 100 TB to discard rows.
  *  - **Bucketing** (`writeBucketed`): high-cardinality JOIN/GROUP keys
  *    (doc_id, user_id) hash rows into a fixed bucket count at write time.
  *    Two tables bucketed on the same key/count join with NO exchange on
  *    either side — the shuffle is paid once at ingest, not per query. The
  *    same layout serves repeated dedup/join/aggregate passes.
  *
  * The reference has no storage layer at all (it streams records through
  * memory); this module is pure Spark-native scale engineering.
  */
object Layout {

  /** Directory-partitioned parquet: one directory per distinct combination
    * of `partitionCols`. Keep cardinality low (≤ a few thousand dirs).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Hash-bucketed (and per-bucket sorted) table in the session catalog.
    * Joins and aggregations keyed on `bucketCol` across tables with the
    * SAME bucket count read co-partitioned — no exchange. Sorting within
    * buckets additionally drops the sort from sort-merge joins.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Morton (Z-order) interleave of two `bits`-bit non-negative dims into
    * one sort key: x in the even bit positions, y in the odd. Data sorted
    * by this key clusters rows that are close in BOTH dims into the same
    * parquet row groups, so a 2-D box predicate — which no single-column
    * sort can serve — prunes via ordinary min/max statistics once the box
    * is decomposed into z ranges ([[zRanges]]). Pure codegen'd bit
    * arithmetic (shift/and/or), no UDF.
    */
  def morton(x: Column, y: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1)).cast("long"),
          2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1)).cast("long"),
          2 * i + 1))
    }

  /** Exact cover of the 2-D box [xlo..xhi] × [ylo..yhi] by disjoint,
    * sorted, merged Z-value ranges over a `bits`-bit grid: the classic
    * quadtree decomposition (an aligned 2^k cell is one CONTIGUOUS z run
    * of length 4^k, so recurse only on cells that straddle the boundary).
    * Range count is O(perimeter) — bounded by ~6·2^bits after merging —
    * and membership is exact: z(x, y) falls inside some range IFF (x, y)
    * is in the box (property-tested exhaustively at bits = 4). Runs
    * driver-side over grid CELLS (never data); the ranges become ordinary
    * pushed-down BETWEEN predicates on the z column.
    */
  def zRanges(xlo: Int, xhi: Int, ylo: Int, yhi: Int,
              bits: Int): Seq[(Long, Long)] = {
    require(bits > 0 && bits <= 16, s"bits out of range: $bits")
    require(0 <= xlo && xlo <= xhi && xhi < (1 << bits) &&
      0 <= ylo && ylo <= yhi && yhi < (1 << bits),
      s"box out of the $bits-bit grid: [$xlo..$xhi]x[$ylo..$yhi]")
    def interleave(x: Int, y: Int): Long = {
      var z = 0L; var i = 0
      while (i < bits) {
        z |= ((x >> i) & 1).toLong << (2 * i)
        z |= ((y >> i) & 1).toLong << (2 * i + 1)
        i += 1
      }
      z
    }
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def rec(cx: Int, cy: Int, size: Int): Unit = {
      val x2 = cx + size - 1; val y2 = cy + size - 1
      if (x2 < xlo || cx > xhi || y2 < ylo || cy > yhi) ()
      else if (cx >= xlo && x2 <= xhi && cy >= ylo && y2 <= yhi) {
        val lo = interleave(cx, cy)
        out += ((lo, lo + size.toLong * size - 1))
      } else {
        val h = size / 2
        rec(cx, cy, h); rec(cx + h, cy, h)
        rec(cx, cy + h, h); rec(cx + h, cy + h, h)
      }
    }
    rec(0, 0, 1 << bits)
    out.sortBy(_._1).foldLeft(List.empty[(Long, Long)]) {
      case ((alo, ahi) :: rest, (lo, hi)) if lo == ahi + 1 =>
        (alo, hi) :: rest
      case (acc, r) => r :: acc
    }.reverse
  }

  /** OR-of-BETWEENs predicate over [[zRanges]] output — stays inside
    * parquet filter pushdown (each leg is a plain range on one column).
    */
  def zRangePredicate(z: Column, ranges: Seq[(Long, Long)]): Column =
    ranges.map { case (lo, hi) => z.between(lo, hi) }.reduce(_ || _)
}
