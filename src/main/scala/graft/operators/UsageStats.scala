package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-usage statistics — the Spark-first reformulation of the reference's
  * BigQuery audit-log analysis (reference:
  * plugins/extractors/bigquery/auditlog/stats.go:32-129): per-entity usage
  * counts, pairwise co-occurrence ("join") counts, and condition sets.
  *
  * Scale notes: `usageCounts` is a partial-aggregated groupBy (shuffle
  * carries one row per distinct entity). `coOccurrence` shuffles once —
  * distinct entities collected per group, pairs expanded inside the group
  * — instead of a double-shuffled self-join; degenerate groups are capped.
  */
object UsageStats {

  /** Usage count per entity (stats.go:69-75 →  groupBy().count()). */
  def usageCounts(df: DataFrame, entity: String): DataFrame =
    df.groupBy(col(entity)).agg(count(lit(1)).as("usage_count"))

  /** Pairwise co-occurrence of `entity` values sharing the same `groupKey`
    * (stats.go:77-115 — pairwise joined-tables counts). Emits each unordered
    * pair once (a < b).
    *
    * One shuffle, not a self-join: collect each group's distinct entities
    * (sorted, map-side partial agg) and expand the a<b pairs inside the
    * group with array expressions. A self-join would shuffle the table
    * twice and re-hash every group; here group size k expands to k(k−1)/2
    * pairs inline. `maxGroupSize` (off by default — dropping a group
    * silently undercounts) can cap degenerate groups on pathological
    * corpora, like the LSH bucket guard.
    */
  def coOccurrence(df: DataFrame, groupKey: String, entity: String,
                   maxGroupSize: Int = Int.MaxValue): DataFrame =
    df.groupBy(col(groupKey))
      .agg(sort_array(collect_set(col(entity))).as("es"))
      .filter(size(col("es")).between(2, maxGroupSize))
      .select(explode(ArrayPairs.pairStructs(col("es"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("pair_count"))

  /** Distinct condition set per entity (stats.go:117-129 → collect_set),
    * sorted for deterministic output.
    */
  def conditionSets(df: DataFrame, entity: String, condition: String): DataFrame =
    df.groupBy(col(entity))
      .agg(sort_array(collect_set(col(condition))).as("conditions"))
}
