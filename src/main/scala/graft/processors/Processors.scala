package graft.processors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plugins._

/** The enrich processor: merge recipe-config key/values into every asset's
  * custom properties (reference: plugins/processors/enrich/processor.go:57-86
  * — string values only, set into Properties.Attributes; helpers at
  * utils/custom_properties.go:12-92).
  *
  * Attributes live in a JSON-string column (`properties.attributes`), so the
  * merge is a codegen'd column rewrite: parse nothing, just inject the keys
  * with a deterministic JSON encoder over sorted keys. Labels-style plain
  * maps merge with `map_concat`.
  */
object EnrichProcessor extends Processor {
  val info: PluginInfo = PluginInfo("enrich",
    "Append custom fields from config into each asset's properties.attributes",
    sampleConfig = "fieldA: valueA", tags = Seq("processor"))

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def process(df: DataFrame, config: Map[String, Any]): DataFrame = {
    if (config.isEmpty) return df
    // deterministic JSON fragment over sorted keys (string values only,
    // matching processor.go:72-77)
    val fragment = config.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${jsonEscape(k)}":"${jsonEscape(v.toString)}""""
    }.mkString(",")
    val attrs = col("properties").getField("attributes")
    val merged = when(attrs.isNull || attrs === "{}" || attrs === "",
        lit(s"{$fragment}"))
      .otherwise(concat(
        // existing JSON object minus its trailing '}'
        expr("substring(properties.attributes, 1, length(properties.attributes) - 1)"),
        lit(s",$fragment}")))
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
