package graft.processors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.plugins._

/** The enrich processor: merge recipe-config key/values into every asset's
  * custom properties (reference: plugins/processors/enrich/processor.go:57-86
  * — string values only, SET into Properties.Attributes with overwrite:
  * `customProps[key] = value`; helpers at utils/custom_properties.go:12-92).
  *
  * Attributes live in a JSON-string column (`properties.attributes`, a flat
  * string map per the Properties facet contract — model/Assets.scala). The
  * merge is a codegen'd column rewrite: parse to map<string,string>, drop
  * keys the config overwrites, concat the config map, re-serialize. A key
  * enriched twice therefore has exactly one entry, config value winning —
  * matching the reference's set-with-overwrite semantics.
  */
object EnrichProcessor extends Processor {
  val info: PluginInfo = PluginInfo("enrich",
    "Set custom fields from config into each asset's properties.attributes (overwrite on collision)",
    sampleConfig = "fieldA: valueA", tags = Seq("processor"))

  def process(df: DataFrame, config: Map[String, Any]): DataFrame = {
    if (config.isEmpty) return df
    // deterministic config map over sorted keys (string values only,
    // matching processor.go:72-77)
    val sorted = config.toSeq.sortBy(_._1)
    val configMap = map(sorted.flatMap { case (k, v) =>
      Seq(lit(k), lit(v.toString)) }: _*)
    val configKeys = sorted.map(_._1)
    val attrs = col("properties").getField("attributes")
    val existing = coalesce(
      from_json(attrs, MapType(StringType, StringType)),
      map())
    // config wins on collision: strip colliding keys BEFORE concat so the
    // merged map never has duplicates (map_concat rejects them by default)
    val kept = map_filter(existing, (k, _) => !k.isInCollection(configKeys))
    val merged = to_json(map_concat(kept, configMap))
    df.withColumn("properties",
      struct(
        col("properties").getField("tags").as("tags"),
        col("properties").getField("labels").as("labels"),
        merged.as("attributes")))
  }
}

object Populate {
  def register(r: Registry[Processor]): Unit = {
    r.register(EnrichProcessor)
  }
}
