package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated TPC-H-ish parquet tables (see TESTDATA.md).
  *
  * All `SparkEntry.queries` take an `sfDir` and read via this object so the
  * scan always goes through the vectorized parquet reader with Catalyst
  * column pruning / predicate pushdown intact.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as TIMESTAMP(NANOS) (no native Spark type:
      // read nanos as long, floor-truncate to micros — DuckDB's own
      // nanos→micros truncation) and, in later testdata drops, as plain
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) which Spark reads as
      // TIMESTAMP_NTZ. Dispatch on the footer-derived type so both
      // generations read to the same session-UTC timestamp column.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ =>
          // NTZ wall-clock == the naive value DuckDB sees; the session is
          // pinned to UTC so the LTZ cast is instant-preserving
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
