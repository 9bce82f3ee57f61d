package graft.agent

import scala.jdk.CollectionConverters._

/** Agent-level configuration (reference: config/config.go:13-32): retry
  * tuning, sink-error policy, and statsd wiring. Loaded from an optional
  * yaml config file (`--config meteor.yaml`, reference cmd/run.go:134 — a
  * missing default file is tolerated, config.go:26-29) with environment
  * variables taking precedence, viper-style. Env names are the reference's
  * (`MAX_RETRIES`, `STATSD_ENABLED`, ...), also accepted with `GRAFT_`/
  * `METEOR_` prefixes so deployments can namespace them.
  */
case class AgentConfig(
    logLevel: String = "info",
    statsdEnabled: Boolean = false,
    statsdHost: String = "localhost:8125",
    statsdPrefix: String = "meteor",
    maxRetries: Int = 5,
    retryInitialIntervalSeconds: Int = 5,
    stopOnSinkError: Boolean = false) {
  def retryInitialMs: Long = retryInitialIntervalSeconds * 1000L
}

object AgentConfig {

  /** Load from yaml file (if present) overridden by env. `explicitFile`
    * distinguishes `--config path` (missing file is an error) from the
    * default `./meteor.yaml` probe (missing file is fine).
    */
  def load(configFile: Option[java.nio.file.Path] = None,
           env: Map[String, String] = sys.env,
           explicitFile: Boolean = false): AgentConfig = {
    val fromFile: Map[String, String] = configFile match {
      case Some(p) if java.nio.file.Files.isRegularFile(p) =>
        val raw = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        new org.yaml.snakeyaml.Yaml().load[Object](raw) match {
          case m: java.util.Map[_, _] =>
            m.asScala.map { case (k, v) =>
              k.toString.toUpperCase -> (if (v == null) "" else v.toString)
            }.toMap
          case null => Map.empty[String, String]
          case other => sys.error(s"agent config $p: expected a mapping, got $other")
        }
      case Some(p) if explicitFile => sys.error(s"agent config not found: $p")
      case _ => Map.empty[String, String]
    }
    // env > file, and prefixed env > bare env (most specific wins)
    def get(key: String): Option[String] =
      env.get(s"GRAFT_$key").orElse(env.get(s"METEOR_$key"))
        .orElse(env.get(key)).orElse(fromFile.get(key))
    def bool(key: String, dflt: Boolean): Boolean =
      get(key).map(_.trim.toLowerCase).map {
        case "true" | "1" | "yes" => true
        case "false" | "0" | "no" => false
        case other => sys.error(s"$key: expected boolean, got '$other'")
      }.getOrElse(dflt)
    def int(key: String, dflt: Int): Int =
      get(key).map(_.trim.toInt).getOrElse(dflt)
    val d = AgentConfig()
    AgentConfig(
      logLevel = get("LOG_LEVEL").getOrElse(d.logLevel),
      statsdEnabled = bool("STATSD_ENABLED", d.statsdEnabled),
      statsdHost = get("STATSD_HOST").getOrElse(d.statsdHost),
      statsdPrefix = get("STATSD_PREFIX").getOrElse(d.statsdPrefix),
      maxRetries = int("MAX_RETRIES", d.maxRetries),
      retryInitialIntervalSeconds =
        int("RETRY_INITIAL_INTERVAL_SECONDS", d.retryInitialIntervalSeconds),
      stopOnSinkError = bool("STOP_ON_SINK_ERROR", d.stopOnSinkError))
  }

  /** Monitor per the config: statsd over UDP when enabled (reference:
    * cmd/root.go:29-38), else noop. `transport` overrides the UDP socket
    * for tests.
    */
  def monitorFor(cfg: AgentConfig,
                 transport: Option[String => Unit] = None): Monitor =
    if (!cfg.statsdEnabled) NoopMonitor
    else new StatsdMonitor(
      transport.map(new LineStatsdClient(_))
        .getOrElse(LineStatsdClient.udp(cfg.statsdHost)),
      cfg.statsdPrefix)

  /** Agent per the config — the CLI construction path (reference:
    * cmd/run.go:68-77 passes cfg into agent.NewAgent).
    */
  def agentFor(spark: org.apache.spark.sql.SparkSession, cfg: AgentConfig,
               transport: Option[String => Unit] = None): Agent =
    new Agent(spark,
      stopOnSinkError = cfg.stopOnSinkError,
      maxRetries = cfg.maxRetries,
      retryInitialMs = cfg.retryInitialMs,
      monitor = monitorFor(cfg, transport))
}
