package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SqlParse
import graft.operators.UsageStats

/** Audit-log usage analysis — the distributed reformulation of the
  * reference's BigQuery audit-log pipeline (reference:
  * plugins/extractors/bigquery/auditlog/auditlog.go:76-126,
  * stats.go:32-129): filter completed-query log entries over a lookback
  * window, then derive per-table usage counts, pairwise join counts with
  * join conditions, and filter-condition sets.
  *
  * Unlike the catalog extractors (driver-side, KB-sized), audit logs ARE
  * big data — a year of query logs on a busy warehouse is TB-scale — so
  * every step here is a DataFrame transform: the log never leaves the
  * executors, the SQL regex parse runs as codegen'd `regexp_extract_all`
  * columns, and co-occurrence uses the single-shuffle group expansion.
  *
  * Expected log schema: `ts timestamp, state string, sql string,
  * referenced_tables array<string>` (the reference's
  * jobStats/jobCompletedEvent fields, logdata.go:45-95).
  */
object AuditLogUsage {

  /** Completed jobs inside the lookback window (auditlog.go:26-29 filter,
    * window calc :116-126; DONE-state validation logdata.go:60-66).
    */
  def completedInWindow(log: DataFrame, now: Column,
                        lookbackDays: Int = 7): DataFrame =
    log.filter(col("state") === "DONE" &&
      col("ts") >= now - expr(s"INTERVAL $lookbackDays DAYS") &&
      col("referenced_tables").isNotNull &&
      size(col("referenced_tables")) > 0)

  /** Per-table usage counts (stats.go:69-75). */
  def usageCounts(completed: DataFrame): DataFrame =
    completed.select(explode(col("referenced_tables")).as("table_urn"))
      .groupBy(col("table_urn")).agg(count(lit(1)).as("usage_count"))

  /** Pairwise table co-occurrence = join counts (stats.go:77-115), with
    * the distinct join conditions each pair was seen with.
    */
  def joinStats(completed: DataFrame): DataFrame = {
    // tables are already an array per log row — pair expansion is pure
    // map-side; the ONLY shuffle is the final (a, b) aggregation
    val pairs = completed
      .select(SqlParse.joinConditionsCol(col("sql")).as("join_conds"),
        sort_array(array_distinct(col("referenced_tables"))).as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("join_conds"),
        explode(graft.operators.ArrayPairs.pairStructs(col("ts"))).as("p"))
    pairs.groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("join_count"),
        array_sort(array_distinct(flatten(collect_list(col("join_conds")))))
          .as("conditions"))
  }

  /** Distinct filter-condition set per table (stats.go:117-129). */
  def filterConditions(completed: DataFrame): DataFrame =
    completed
      .select(explode(col("referenced_tables")).as("table_urn"),
        SqlParse.filterConditionsCol(col("sql")).as("conds"))
      .select(col("table_urn"), explode(col("conds")).as("condition"))
      .groupBy(col("table_urn"))
      .agg(sort_array(collect_set(col("condition"))).as("filters"))

  /** Full profile: usage count + joins + filters per table, ready to merge
    * into TableAsset.profile (usageCount, joins, filters facets).
    */
  def tableProfiles(log: DataFrame, now: Column,
                    lookbackDays: Int = 7): DataFrame = {
    val completed = completedInWindow(log, now, lookbackDays)
    val usage = usageCounts(completed)
    val joins = joinStats(completed)
      .select(explode(array(
          struct(col("a").as("table_urn"), col("b").as("other"),
            col("join_count"), col("conditions")),
          struct(col("b").as("table_urn"), col("a").as("other"),
            col("join_count"), col("conditions")))).as("j"))
      .groupBy(col("j.table_urn").as("table_urn"))
      .agg(collect_list(struct(col("j.other").as("urn"),
        col("j.join_count").as("count"),
        col("j.conditions").as("conditions"))).as("joins"))
    val filters = filterConditions(completed)
    usage
      .join(joins, Seq("table_urn"), "left")
      .join(filters, Seq("table_urn"), "left")
  }
}
