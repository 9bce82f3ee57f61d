package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

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
}
