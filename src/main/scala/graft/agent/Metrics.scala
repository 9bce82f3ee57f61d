package graft.agent

import graft.recipe.Recipe

/** Run-metrics emission (reference: metrics/statsd.go:14-86, wired at
  * agent/agent.go:121-129,289-297; config at config/config.go:13-15).
  *
  * The agent reports one `run` / `runDuration` / `runRecordCount` triple per
  * recipe run and one `runPlugin` increment per sink invocation. The
  * transport is pluggable (statsd-line formatter over UDP in production,
  * an in-memory recorder in tests) — Spark jobs are driver-coordinated here,
  * so the driver is the single emission point, same as the reference agent.
  */
trait Monitor {
  def recordRun(run: RunResult): Unit
  def recordPlugin(recipeName: String, pluginName: String, pluginType: String,
                   success: Boolean): Unit
}

object NoopMonitor extends Monitor {
  def recordRun(run: RunResult): Unit = ()
  def recordPlugin(recipeName: String, pluginName: String, pluginType: String,
                   success: Boolean): Unit = ()
}

/** statsd client surface (reference: metrics/statsd.go:83-87). */
trait StatsdClient {
  def timing(name: String, ms: Long): Unit
  def increment(name: String): Unit
  def incrementByValue(name: String, value: Long): Unit
}

/** statsd wire-format lines pushed through a raw send function — UDP in
  * production, a buffer in tests. Line grammar is the classic statsd
  * protocol: `name:value|ms` (timing), `name:value|c` (counter).
  */
class LineStatsdClient(send: String => Unit) extends StatsdClient {
  def timing(name: String, ms: Long): Unit = send(s"$name:$ms|ms")
  def increment(name: String): Unit = send(s"$name:1|c")
  def incrementByValue(name: String, value: Long): Unit = send(s"$name:$value|c")
}

object LineStatsdClient {
  /** UDP transport for a real statsd daemon (reference:
    * metrics/statsd.go:90-103 resolves host:port the same way).
    */
  def udp(address: String): LineStatsdClient = {
    val parts = address.split(":", 2)
    require(parts.length == 2 && parts(1).nonEmpty &&
      parts(1).forall(_.isDigit),
      s"statsd address must be host:port, got '$address'")
    val Array(host, port) = parts
    val socket = new java.net.DatagramSocket()
    val target = new java.net.InetSocketAddress(host, port.toInt)
    new LineStatsdClient(line => {
      val bytes = line.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      socket.send(new java.net.DatagramPacket(bytes, bytes.length, target))
    })
  }
}

/** Metric-name grammar copied from the reference so dashboards keyed on the
  * Go agent's series keep working (statsd.go:37-81):
  *   prefix.runDuration,name=R,success=B,extractor=S   (timing, ms)
  *   prefix.run,name=R,success=B,extractor=S           (+1)
  *   prefix.runRecordCount,name=R,success=B,extractor=S(+count)
  *   prefix.runPlugin,recipe_name=R,name=P,type=T,success=B (+1)
  */
class StatsdMonitor(client: StatsdClient, prefix: String = "meteor") extends Monitor {

  private def runMetricName(metric: String, recipe: Recipe, success: Boolean): String =
    s"$prefix.$metric,name=${recipe.name},success=$success,extractor=${recipe.source.name}"

  def recordRun(run: RunResult): Unit = {
    client.timing(runMetricName("runDuration", run.recipe, run.success), run.durationMs)
    client.increment(runMetricName("run", run.recipe, run.success))
    client.incrementByValue(
      runMetricName("runRecordCount", run.recipe, run.success), run.recordCount)
  }

  def recordPlugin(recipeName: String, pluginName: String, pluginType: String,
                   success: Boolean): Unit =
    client.increment(
      s"$prefix.runPlugin,recipe_name=$recipeName,name=$pluginName,type=$pluginType,success=$success")
}
