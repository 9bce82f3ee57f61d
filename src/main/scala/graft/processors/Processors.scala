package graft.processors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plugins._

/** The enrich processor: merge recipe-config key/values into every asset's
  * custom properties (reference: plugins/processors/enrich/processor.go:57-86
  * — string values only, SET into Properties.Attributes with overwrite:
  * `customProps[key] = value`; helpers at utils/custom_properties.go:12-92).
  *
  * Attributes live in a JSON-string column (`properties.attributes`) whose
  * values may be NESTED (e.g. the postgres grants rollup) — so the merge
  * must be JSON-aware: parse, set/overwrite the config keys at the TOP
  * level, re-serialize with every other value preserved verbatim. That is
  * a per-record structural rewrite, exactly what the reference does to its
  * `google.protobuf.Struct`; a Scala UDF is the right tool here (metadata
  * frames are KB-sized — this is not a data-plane hot path, and a
  * map<string,string> round-trip would stringify nested values).
  */
object EnrichProcessor extends Processor {
  val info: PluginInfo = PluginInfo("enrich",
    "Set custom fields from config into each asset's properties.attributes (overwrite on collision)",
    sampleConfig = "fieldA: valueA", tags = Seq("processor"))

  /** Deterministic JSON writer for snakeyaml-parsed values: objects keep
    * their original key order (insertion-ordered LinkedHashMap), so
    * untouched attributes round-trip byte-stable.
    */
  private[processors] def writeJson(v: Any): String = v match {
    case null => "null"
    case b: java.lang.Boolean => b.toString
    case n: java.lang.Number => n.toString
    case m: java.util.Map[_, _] =>
      val it = m.entrySet().iterator()
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val e = it.next()
        parts += graft.model.JsonText.str(e.getKey.toString) + ":" + writeJson(e.getValue)
      }
      parts.mkString("{", ",", "}")
    case l: java.util.List[_] =>
      val it = l.iterator()
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) parts += writeJson(it.next())
      parts.mkString("[", ",", "]")
    case s => graft.model.JsonText.str(s.toString)
  }

  /** Parse-set-serialize merge (processor.go:71-77 semantics): config keys
    * overwrite at the top level, everything else — including nested
    * objects/arrays — survives untouched. Unparseable/empty attributes
    * start from an empty object.
    */
  private[processors] def mergeAttributes(attrs: String,
                                          config: Seq[(String, String)]): String = {
    val base: java.util.LinkedHashMap[String, Any] =
      try {
        new org.yaml.snakeyaml.Yaml().load[Object](attrs) match {
          case m: java.util.Map[_, _] =>
            val lm = new java.util.LinkedHashMap[String, Any]()
            val it = m.entrySet().iterator()
            while (it.hasNext) { val e = it.next(); lm.put(e.getKey.toString, e.getValue) }
            lm
          case _ => new java.util.LinkedHashMap[String, Any]()
        }
      } catch { case _: Exception => new java.util.LinkedHashMap[String, Any]() }
    config.foreach { case (k, v) => base.put(k, v) }
    writeJson(base)
  }

  def process(df: DataFrame, config: Map[String, Any]): DataFrame = {
    if (config.isEmpty) return df
    // deterministic order for NEW keys; existing keys keep their position
    // (LinkedHashMap.put on a present key preserves insertion order)
    val sorted = config.toSeq.sortBy(_._1).map { case (k, v) => k -> v.toString }
    val merge = udf((attrs: String) => mergeAttributes(attrs, sorted))
    df.withColumn("properties",
      struct(
        col("properties").getField("tags").as("tags"),
        col("properties").getField("labels").as("labels"),
        merge(col("properties").getField("attributes")).as("attributes")))
  }
}

object Populate {
  def register(r: Registry[Processor]): Unit = {
    r.register(EnrichProcessor)
    // data-plane curation processors (project additions on the same SPI)
    r.register(CurationProcessors.QualityFilter)
    r.register(CurationProcessors.PiiScrub)
    r.register(CurationProcessors.LangFilter)
    r.register(CurationProcessors.DedupGate)
    r.register(CurationProcessors.NearDupGate)
    r.register(CurationProcessors.WinnowGate)
    r.register(CurationProcessors.NbFilter)
    r.register(CurationProcessors.SemDedupGate)
    r.register(CurationProcessors.Chunk)
    r.register(CurationProcessors.Normalize)
  }
}
