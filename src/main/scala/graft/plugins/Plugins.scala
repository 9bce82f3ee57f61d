package graft.plugins

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plugin SPI + registry.
  *
  * Mirrors the reference's plugin interface triple and factory registries
  * (reference: plugins/plugin.go:30-61, registry/registry.go:7-35) with the
  * control flow inverted for Spark: extractors PULL a DataFrame out of a
  * source instead of PUSHING records through a callback, processors are
  * DataFrame→DataFrame transforms, and sinks are terminal writes.
  */

/** Structured config error (reference: plugins/errors.go:6-22). */
case class InvalidConfigError(key: String, message: String) {
  override def toString: String = s"invalid config [$key]: $message"
}
class ConfigException(val errors: Seq[InvalidConfigError])
  extends RuntimeException(errors.mkString("; "))

/** Error wrapper marking a sink failure as retryable
  * (reference: plugins/errors.go:37-58 — RetryError).
  */
class RetryableException(message: String, cause: Throwable = null)
  extends RuntimeException(message, cause)

/** Plugin metadata (reference: plugins/plugin.go:22-28). */
case class PluginInfo(
    name: String,
    description: String,
    sampleConfig: String = "",
    tags: Seq[String] = Nil)

trait Plugin {
  def info: PluginInfo
  /** Config validation without side effects (plugins/plugin.go:37). */
  def validate(config: Map[String, Any]): Seq[InvalidConfigError] = Nil
  protected def requireKeys(config: Map[String, Any], keys: String*): Seq[InvalidConfigError] =
    keys.filterNot(config.contains).map(k => InvalidConfigError(k, "required key missing"))
}

/** Source: produces the asset DataFrame (plugins/plugin.go:30-46). */
trait Extractor extends Plugin {
  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame
}

/** Per-record transform, chained in recipe order (plugins/plugin.go:49-52). */
trait Processor extends Plugin {
  def process(df: DataFrame, config: Map[String, Any]): DataFrame
}

/** Terminal write; returns the record count written
  * (plugins/plugin.go:55-61).
  */
trait SinkPlugin extends Plugin {
  def sink(df: DataFrame, config: Map[String, Any]): Long
  def close(): Unit = ()
}

/** name → plugin registries with duplicate detection
  * (reference: registry/extractors.go:14-47 etc.).
  */
class Registry[P <: Plugin](kind: String) {
  private val plugins = scala.collection.mutable.LinkedHashMap[String, P]()

  def register(p: P): Unit = synchronized {
    if (plugins.contains(p.info.name))
      throw new IllegalArgumentException(s"duplicate $kind plugin: ${p.info.name}")
    plugins(p.info.name) = p
  }

  def get(name: String): P = synchronized {
    plugins.getOrElse(name,
      throw new NoSuchElementException(s"could not find $kind plugin: $name"))
  }

  def list: Seq[PluginInfo] = synchronized(plugins.values.map(_.info).toSeq)
  def contains(name: String): Boolean = synchronized(plugins.contains(name))
}

object Registries {
  val extractors = new Registry[Extractor]("extractor")
  val processors = new Registry[Processor]("processor")
  val sinks = new Registry[SinkPlugin]("sink")

  @volatile private var populated = false
  /** Register the built-in roster (reference: plugins/<kind>/populate.go). */
  def populate(): Unit = synchronized {
    if (!populated) {
      graft.sources.Populate.register(extractors)
      graft.processors.Populate.register(processors)
      graft.sinks.Populate.register(sinks)
      populated = true
    }
  }
}
