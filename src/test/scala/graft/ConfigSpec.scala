package graft

import java.nio.file.Files

import graft.agent.AgentConfig
import graft.recipe.{RecipeParseException, RecipeReader}

/** CLI var-file (`--var file.yaml`, reference recipe/envs.go:15-35) and
  * agent config (`--config`, reference config/config.go:13-32) loading.
  */
class ConfigSpec extends SparkSpec {

  private def tmpYaml(content: String): java.nio.file.Path = {
    val p = Files.createTempFile("graft-cfg", ".yaml")
    Files.write(p, content.getBytes("UTF-8"))
    p.toFile.deleteOnExit()
    p
  }

  test("var-file loads a flat mapping with lowercased keys") {
    val p = tmpYaml("SRC_PATH: /from/file\nlimit: 10\nempty:\n")
    val vars = RecipeReader.loadVarFile(p)
    assert(vars == Map("src_path" -> "/from/file", "limit" -> "10", "empty" -> ""))
  }

  test("var-file rejects non-mapping yaml") {
    val p = tmpYaml("- a\n- b\n")
    intercept[RecipeParseException](RecipeReader.loadVarFile(p))
  }

  test("parseVars: inline k=v beats var-file, var-file beats env in render") {
    val p = tmpYaml("src_path: /from/file\nother: keep\n")
    val vars = Main.parseVars(List("--var", p.toString, "--var", "src_path=/inline"))
    assert(vars == Map("src_path" -> "/inline", "other" -> "keep"))
    // file value shadows METEOR_ env when handed to render (envs.go:27-33)
    val env = Map("METEOR_OTHER" -> "/from/env")
    assert(RecipeReader.render("x: {{ .other }}", vars, env) == "x: keep")
  }

  test("gen template expansion: one recipe per data entry, name defaults to FileName") {
    // mirrors the reference's own generator fixtures
    // (recipe/testdata/generator/template.yaml + data-1-2.yaml)
    val tpl = tmpYaml(
      """name: {{ .Data.name }}
        |version: v1beta1
        |source:
        |  name: csv
        |  config:
        |    path: {{ .Data.path }}
        |sinks:
        |  - name: console
        |""".stripMargin)
    val data = tmpYaml(
      """- FileName: recipe-one
        |  Data:
        |    name: recipe-1
        |    path: /a.csv
        |- FileName: recipe-two
        |  Data:
        |    path: /b.csv
        |""".stripMargin)
    val outDir = Files.createTempDirectory("graft-gen")
    val written = RecipeReader.fromTemplate(tpl, outDir, data)
    assert(written.map(_.getFileName.toString) == Seq("recipe-one.yaml", "recipe-two.yaml"))
    val r1 = RecipeReader.parse(Files.readString(written(0)))
    assert(r1.name == "recipe-1" && r1.source.config("path") == "/a.csv")
    // Data.name absent -> FileName (generator.go:50-52)
    val r2 = RecipeReader.parse(Files.readString(written(1)))
    assert(r2.name == "recipe-two" && r2.source.config("path") == "/b.csv")
  }

  test("agent config: defaults when no file and no env") {
    val cfg = AgentConfig.load(None, env = Map.empty)
    assert(cfg.maxRetries == 5)
    assert(cfg.retryInitialIntervalSeconds == 5)
    assert(!cfg.stopOnSinkError)
    assert(!cfg.statsdEnabled)
  }

  test("agent config: file values load, env overrides file, prefixed env wins") {
    val p = tmpYaml("MAX_RETRIES: 9\nSTOP_ON_SINK_ERROR: true\nSTATSD_PREFIX: filepfx\n")
    val cfg = AgentConfig.load(Some(p), env = Map(
      "MAX_RETRIES" -> "3",          // env > file
      "GRAFT_MAX_RETRIES" -> "7"))   // prefixed env > bare env
    assert(cfg.maxRetries == 7)
    assert(cfg.stopOnSinkError)           // from file
    assert(cfg.statsdPrefix == "filepfx") // from file
  }

  test("agent config: explicit missing file errors, default probe is silent") {
    val ghost = java.nio.file.Paths.get("/no/such/meteor.yaml")
    intercept[RuntimeException](
      AgentConfig.load(Some(ghost), env = Map.empty, explicitFile = true))
    val cfg = AgentConfig.load(Some(ghost), env = Map.empty, explicitFile = false)
    assert(cfg.maxRetries == 5)
  }

  test("agent config: bad boolean is a loud error") {
    intercept[RuntimeException](
      AgentConfig.load(None, env = Map("STATSD_ENABLED" -> "maybe")))
  }

  test("monitorFor: noop when disabled, statsd lines when enabled") {
    assert(AgentConfig.monitorFor(AgentConfig()) == graft.agent.NoopMonitor)
    val lines = scala.collection.mutable.Buffer.empty[String]
    val mon = AgentConfig.monitorFor(
      AgentConfig(statsdEnabled = true, statsdPrefix = "t"),
      transport = Some(lines += _))
    mon.recordPlugin("r1", "file", "sink", success = true)
    assert(lines == Seq("t.runPlugin,recipe_name=r1,name=file,type=sink,success=true:1|c"))
  }

  test("agentFor: config reaches the Agent's retry/sink-error knobs end-to-end") {
    // stopOnSinkError=true + a failing sink => run reports failure and the
    // configured (not default) retry count is respected via a 0-retry config.
    val dir = Files.createTempDirectory("graft-cfgrun")
    val csv = dir.resolve("in.csv")
    Files.write(csv, "id,name\n1,a\n2,b\n".getBytes("UTF-8"))
    val recipe = RecipeReader.parse(
      s"""name: cfgrun
         |version: v1beta1
         |source:
         |  name: csv
         |  config:
         |    path: $csv
         |sinks:
         |  - name: http
         |    config:
         |      url: http://127.0.0.1:1/unreachable
         |""".stripMargin)
    val lines = scala.collection.mutable.Buffer.empty[String]
    val agent = AgentConfig.agentFor(spark,
      AgentConfig(maxRetries = 0, retryInitialIntervalSeconds = 0,
        stopOnSinkError = true, statsdEnabled = true, statsdPrefix = "t"),
      transport = Some(lines += _))
    val res = agent.run(recipe)
    assert(!res.success)
    assert(lines.exists(_.startsWith("t.runPlugin,recipe_name=cfgrun,name=http,type=sink,success=false")))
    assert(lines.exists(_.startsWith("t.run,name=cfgrun,success=false")))
  }
}
