package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
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
    * pairs inline. `maxGroupSize` caps degenerate groups (a group of k
    * entities expands to k²/2 pairs — one 10⁶-entity group is 5·10¹¹
    * rows) like the LSH bucket guard; dropping a group undercounts, so
    * pass `dropAudit` to account for it: an `observe` metric rides the
    * same action (zero extra jobs) and reports how many groups were
    * dropped and the largest group seen, so a binding cap is loud, not
    * silent — after any action, `dropAudit.get` has `dropped_groups` /
    * `max_group_size`.
    */
  def coOccurrence(df: DataFrame, groupKey: String, entity: String,
                   maxGroupSize: Int = Int.MaxValue,
                   dropAudit: Option[Observation] = None): DataFrame = {
    val grouped = df.groupBy(col(groupKey))
      .agg(sort_array(collect_set(col(entity))).as("es"))
    val audited = dropAudit.fold(grouped)(obs => grouped.observe(obs,
      sum(when(size(col("es")) > maxGroupSize, 1L).otherwise(0L)).as("dropped_groups"),
      max(size(col("es"))).as("max_group_size")))
    audited
      .filter(size(col("es")).between(2, maxGroupSize))
      .select(explode(ArrayPairs.pairStructs(col("es"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("pair_count"))
  }

  /** Distinct condition set per entity (stats.go:117-129 → collect_set),
    * sorted for deterministic output.
    */
  def conditionSets(df: DataFrame, entity: String, condition: String): DataFrame =
    df.groupBy(col(entity))
      .agg(sort_array(collect_set(col(condition))).as("conditions"))
}
