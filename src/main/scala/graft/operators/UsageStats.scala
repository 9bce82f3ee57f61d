package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-usage statistics — the Spark-first reformulation of the reference's
  * BigQuery audit-log analysis (reference:
  * plugins/extractors/bigquery/auditlog/stats.go:32-129): per-entity usage
  * counts, pairwise co-occurrence ("join") counts, and condition sets.
  *
  * Scale notes: `usageCounts` is a partial-aggregated groupBy (shuffle
  * carries one row per distinct entity). `coOccurrence` is a key-equi
  * self-join — at 100 TB the join key (e.g. query id / order id) has small
  * per-key cardinality so the self-join fans out k² per group with tiny k;
  * skewed hot keys are handled by AQE skew-join splitting.
  */
object UsageStats {

  /** Usage count per entity (stats.go:69-75 →  groupBy().count()). */
  def usageCounts(df: DataFrame, entity: String): DataFrame =
    df.groupBy(col(entity)).agg(count(lit(1)).as("usage_count"))

  /** Pairwise co-occurrence of `entity` values sharing the same `groupKey`
    * (stats.go:77-115 — pairwise joined-tables counts). Emits each unordered
    * pair once (a < b).
    */
  def coOccurrence(df: DataFrame, groupKey: String, entity: String): DataFrame = {
    val a = df.select(col(groupKey).as("k"), col(entity).as("a")).distinct()
    val b = df.select(col(groupKey).as("k"), col(entity).as("b")).distinct()
    a.join(b, a("k") === b("k") && a("a") < b("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("pair_count"))
  }

  /** Distinct condition set per entity (stats.go:117-129 → collect_set),
    * sorted for deterministic output.
    */
  def conditionSets(df: DataFrame, entity: String, condition: String): DataFrame =
    df.groupBy(col(entity))
      .agg(sort_array(collect_set(col(condition))).as("conditions"))
}
