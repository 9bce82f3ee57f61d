package graft

import org.apache.spark.sql.SparkSession

import graft.agent.Agent
import graft.plugins.Registries
import graft.recipe.RecipeReader

/** CLI — the reference's command surface (reference: cmd/root.go:65-74):
  * `run <recipe.yaml|dir>`, `lint <recipe>`, `list <extractors|processors|sinks>`,
  * `info <type> <name>`, `gen <source> <sink,...>`.
  */
object Main {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "run" :: path :: rest =>
      val vars = parseVars(rest)
      val spark = session()
      val results = RecipeReader.read(java.nio.file.Paths.get(path), vars)
        .map(new Agent(spark).run)
      results.foreach { r =>
        val status = if (r.success) "OK " else "ERR"
        println(f"$status ${r.recipe.name}%-24s records=${r.recordCount}%-8d " +
          f"duration=${r.durationMs}ms sinks=${r.sinkCounts.map { case (k, v) => s"$k=$v" }.mkString(",")}" +
          r.error.map(e => s" error=$e").getOrElse(""))
      }
      spark.stop()
      if (results.exists(!_.success)) sys.exit(1)

    case "lint" :: path :: rest =>
      Registries.populate()
      val recipes = RecipeReader.read(java.nio.file.Paths.get(path), parseVars(rest))
      var bad = false
      recipes.foreach { r =>
        val errs = new LintOnlyAgent().validate(r)
        if (errs.isEmpty) println(s"OK  ${r.name}")
        else { bad = true; errs.foreach(e => println(s"ERR ${r.name}: $e")) }
      }
      if (bad) sys.exit(1)

    case "list" :: kind :: Nil =>
      Registries.populate()
      val infos = kind match {
        case "extractors" => Registries.extractors.list
        case "processors" => Registries.processors.list
        case "sinks" => Registries.sinks.list
        case other => sys.error(s"unknown plugin kind: $other")
      }
      infos.foreach(i => println(f"${i.name}%-12s ${i.description}"))

    case "info" :: kind :: name :: Nil =>
      Registries.populate()
      val i = kind match {
        case "extractor" => Registries.extractors.get(name).info
        case "processor" => Registries.processors.get(name).info
        case "sink" => Registries.sinks.get(name).info
        case other => sys.error(s"unknown plugin kind: $other")
      }
      println(s"${i.name}: ${i.description}")
      if (i.tags.nonEmpty) println(s"tags: ${i.tags.mkString(", ")}")
      if (i.sampleConfig.nonEmpty) println(s"sample config:\n${i.sampleConfig.linesIterator.map("  " + _).mkString("\n")}")

    case "gen" :: source :: sinks :: Nil =>
      // recipe generation from plugin sample configs
      // (reference: generator/recipe.go:32-79)
      Registries.populate()
      def indent(s: String, n: Int): String =
        s.linesIterator.map(" " * n + _).mkString("\n")
      val src = Registries.extractors.get(source).info
      println(s"name: ${source}_recipe\nversion: v1beta1\nsource:\n  name: $source")
      if (src.sampleConfig.nonEmpty)
        println("  config:\n" + indent(src.sampleConfig, 4))
      println("sinks:")
      sinks.split(",").foreach { sk =>
        val info = Registries.sinks.get(sk.trim).info
        println(s"  - name: ${sk.trim}")
        if (info.sampleConfig.nonEmpty)
          println("    config:\n" + indent(info.sampleConfig, 6))
      }

    case _ =>
      println(
        """usage: graft <command>
          |  run  <recipe.yaml|dir> [--var k=v ...]   execute recipes
          |  lint <recipe.yaml|dir>                   validate without executing
          |  list <extractors|processors|sinks>       list plugins
          |  info <extractor|processor|sink> <name>   plugin details
          |  gen  <source> <sink[,sink...]>           generate a sample recipe""".stripMargin)
      sys.exit(2)
  }

  private def parseVars(args: List[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case "--var" :: kv :: Nil if kv.contains("=") =>
        val Array(k, v) = kv.split("=", 2)
        k -> v
    }.toMap

  /** validate() needs no SparkSession; tiny shim to avoid creating one. */
  private class LintOnlyAgent {
    def validate(r: graft.recipe.Recipe) = {
      Registries.populate()
      new Agent(null).validate(r)
    }
  }
}
