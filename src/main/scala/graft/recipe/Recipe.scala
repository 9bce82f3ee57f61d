package graft.recipe

import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml

/** Recipe model + YAML reader.
  *
  * A recipe names one source, zero-or-more processors, and one-or-more sinks
  * (reference: recipe/recipe.go:4-19). Recipe files are templates over YAML:
  * `{{ .var }}` placeholders fill from env vars prefixed `METEOR_` /
  * `GRAFT_` and an optional var map, with explicit vars winning conflicts
  * (reference: recipe/envs.go:12-35, recipe/reader.go:56-92). The version
  * must be `v1beta1` (recipe/reader.go:80-84); recipe name defaults to file
  * name (recipe/reader.go:74-78).
  */
case class PluginSpec(name: String, config: Map[String, Any] = Map.empty)

case class Recipe(
    name: String,
    version: String,
    source: PluginSpec,
    processors: Seq[PluginSpec] = Nil,
    sinks: Seq[PluginSpec] = Nil,
    /** YAML source positions for lint: `source`, `sinks[i]`,
      * `processors[i]` (the plugin's `name` scalar line) and
      * `<path>/config/<key>` (the config value line), 1-based — the
      * reference keeps `yaml.Node` positions for the same purpose
      * (recipe/node.go:10-25, printed at cmd/lint.go:145-178).
      */
    lines: Map[String, Int] = Map.empty)

case class RecipeParseException(message: String) extends RuntimeException(message)

object RecipeReader {
  val SupportedVersion = "v1beta1"
  private val EnvPrefixes = Seq("METEOR_", "GRAFT_")
  private val VarPattern = "\\{\\{\\s*\\.?([A-Za-z0-9_]+)\\s*\\}\\}".r

  /** env-var data: METEOR_FOO_BAR → foo_bar (reference: recipe/envs.go:55-69). */
  def envVars(env: Map[String, String] = sys.env): Map[String, String] =
    env.flatMap { case (k, v) =>
      EnvPrefixes.collectFirst {
        case p if k.startsWith(p) => k.stripPrefix(p).toLowerCase -> v
      }
    }

  /** Render `{{ .var }}` placeholders; explicit vars win over env
    * (recipe/envs.go:27-33). Unknown vars render empty (Go template
    * missingkey default renders "<no value>"; we choose empty + error on
    * strict).
    */
  def render(template: String, vars: Map[String, String],
             env: Map[String, String] = sys.env): String = {
    val data = envVars(env) ++ vars
    VarPattern.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(data.getOrElse(m.group(1), "")))
  }

  /** `gen` template expansion (reference: recipe/generator.go:22-58 via
    * `meteor gen template.yaml -o dir -d data.yaml`): the data file is a
    * yaml LIST of `{FileName, Data: {...}}` entries; the template renders
    * once per entry to `outputDir/<FileName>.yaml`, substituting
    * `{{ .Data.<key> }}` placeholders (the form the reference's own
    * template fixtures use); a missing `Data.name` defaults to FileName
    * (generator.go:50-52). Returns the written paths.
    */
  def fromTemplate(templatePath: java.nio.file.Path,
                   outputDir: java.nio.file.Path,
                   dataPath: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val template = new String(java.nio.file.Files.readAllBytes(templatePath), "UTF-8")
    val raw = new String(java.nio.file.Files.readAllBytes(dataPath), "UTF-8")
    val entries = asScala(new Yaml().load[Object](raw)) match {
      case l: Seq[_] => l.map {
        case m: Map[_, _] =>
          val e = m.asInstanceOf[Map[String, Any]]
          val fileName = e.getOrElse("FileName",
            throw RecipeParseException(s"template data entry missing FileName: $e")).toString
          val data = e.get("Data") match {
            case Some(d: Map[_, _]) => d.asInstanceOf[Map[String, Any]]
            case _ => Map.empty[String, Any]
          }
          fileName -> (if (data.contains("name")) data else data + ("name" -> fileName))
        case other => throw RecipeParseException(s"template data entry must be a mapping: $other")
      }
      case other => throw RecipeParseException(s"template data must be a yaml list, got $other")
    }
    java.nio.file.Files.createDirectories(outputDir)
    val DataVar = """\{\{\s*\.Data\.(\w+)\s*\}\}""".r
    entries.map { case (fileName, data) =>
      // FileName comes from the data file — it's data, not a path: a
      // separator or '..' must not let an entry write outside --output
      // (same rule as the jdbc family's catalog-name quoting)
      if (fileName.isEmpty || fileName.contains('/') || fileName.contains('\\') ||
        fileName.contains(".."))
        throw RecipeParseException(s"template data FileName is not a plain name: '$fileName'")
      val rendered = DataVar.replaceAllIn(template, m =>
        scala.util.matching.Regex.quoteReplacement(
          data.get(m.group(1)).map(_.toString).getOrElse("")))
      val out = outputDir.resolve(fileName + ".yaml")
      java.nio.file.Files.write(out, rendered.getBytes("UTF-8"))
      out
    }
  }

  /** Load recipe variables from a yaml var-file (reference:
    * recipe/envs.go:15-35 via `--var <path>`): a flat mapping whose keys are
    * lowercased for case-insensitive lookup. File values WIN over `METEOR_`/
    * `GRAFT_` env vars on conflict (envs.go:27-33 skips the env value when
    * the key already came from yaml) — callers get that for free by passing
    * the result as `vars` to [[render]], where explicit vars shadow env.
    */
  def loadVarFile(path: java.nio.file.Path): Map[String, String] = {
    val raw = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    asScala(new Yaml().load[Object](raw)) match {
      case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]].map { case (k, v) =>
          k.toLowerCase -> (if (v == null) "" else v.toString)
        }
      case null => Map.empty
      case other =>
        throw RecipeParseException(s"var file $path: expected a flat mapping, got $other")
    }
  }

  private def asScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => k.toString -> asScala(vv) }.toMap
    case l: java.util.List[_] => l.asScala.map(asScala).toSeq
    case other => other
  }

  private def toSpec(v: Any, where: String): PluginSpec = v match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      val name = mm.getOrElse("name",
        throw RecipeParseException(s"$where: missing plugin name")).toString
      val config = mm.get("config") match {
        case Some(c: Map[_, _]) => c.asInstanceOf[Map[String, Any]]
        case _ => Map.empty[String, Any]
      }
      PluginSpec(name, config)
    case other => throw RecipeParseException(s"$where: expected mapping, got $other")
  }

  /** Parse a rendered YAML recipe string. */
  def parse(yamlText: String, defaultName: String = ""): Recipe = {
    val root = asScala(new Yaml().load[Object](yamlText)) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => throw RecipeParseException("recipe is not a YAML mapping")
    }
    val version = root.getOrElse("version",
      throw RecipeParseException("missing version")).toString
    if (version != SupportedVersion)
      throw RecipeParseException(
        s"unsupported version: $version (supported: $SupportedVersion)")
    val source = toSpec(root.getOrElse("source",
      throw RecipeParseException("missing source")), "source")
    val processors = root.get("processors") match {
      case Some(l: Seq[_]) => l.zipWithIndex.map { case (p, i) => toSpec(p, s"processors[$i]") }
      case _ => Nil
    }
    val sinks = root.get("sinks") match {
      case Some(l: Seq[_]) => l.zipWithIndex.map { case (p, i) => toSpec(p, s"sinks[$i]") }
      case _ => Nil
    }
    if (sinks.isEmpty) throw RecipeParseException("at least one sink is required")
    val name = root.get("name").map(_.toString).filter(_.nonEmpty).getOrElse(defaultName)
    Recipe(name, version, source, processors, sinks, lineIndex(yamlText))
  }

  /** YAML line positions of every plugin block and config value — composed
    * from the rendered recipe text (the reference also parses positions
    * post-render, recipe/reader.go:56-92 + node.go).
    */
  private def lineIndex(yamlText: String): Map[String, Int] = {
    import org.yaml.snakeyaml.nodes.{MappingNode, Node, ScalarNode, SequenceNode}
    val out = scala.collection.mutable.Map[String, Int]()
    def entries(m: MappingNode): Seq[(String, Node)] =
      m.getValue.asScala.toSeq.collect {
        case t if t.getKeyNode.isInstanceOf[ScalarNode] =>
          t.getKeyNode.asInstanceOf[ScalarNode].getValue -> t.getValueNode
      }
    def plugin(path: String, n: Node): Unit = n match {
      case m: MappingNode =>
        entries(m).foreach {
          case ("name", v) => out(path) = v.getStartMark.getLine + 1
          case ("config", c: MappingNode) =>
            entries(c).foreach { case (k, v) =>
              out(s"$path/config/$k") = v.getStartMark.getLine + 1
            }
          case _ => ()
        }
      case _ => ()
    }
    try {
      new Yaml().compose(new java.io.StringReader(yamlText)) match {
        case m: MappingNode =>
          entries(m).foreach {
            case ("source", n) => plugin("source", n)
            case ("processors", s: SequenceNode) =>
              s.getValue.asScala.zipWithIndex.foreach {
                case (n, i) => plugin(s"processors[$i]", n)
              }
            case ("sinks", s: SequenceNode) =>
              s.getValue.asScala.zipWithIndex.foreach {
                case (n, i) => plugin(s"sinks[$i]", n)
              }
            case _ => ()
          }
        case _ => ()
      }
    } catch { case _: Exception => () } // positions are best-effort
    out.toMap
  }

  /** Resolve a validation-error key (`kind/plugin[/configKey]`, the shape
    * `Agent.validate` emits) to the recipe line it came from — config-value
    * line when the key exists, else the plugin's `name` line, else None
    * (mirrors cmd/lint.go:145-178: config line if present, plugin line for
    * not-found, plain message otherwise). Duplicate plugin names resolve to
    * the first occurrence, same as the reference's findPluginByName.
    */
  def lintLine(recipe: Recipe, errKey: String): Option[Int] = {
    val parts = errKey.split("/", 3)
    if (parts.length < 2) return None
    val (kind, pluginName) = (parts(0), parts(1))
    val cfgKey = if (parts.length > 2) Some(parts(2)) else None
    val path = kind match {
      case "source" => if (recipe.source.name == pluginName) Some("source") else None
      case "processor" => recipe.processors.indexWhere(_.name == pluginName) match {
        case -1 => None; case i => Some(s"processors[$i]")
      }
      case "sink" => recipe.sinks.indexWhere(_.name == pluginName) match {
        case -1 => None; case i => Some(s"sinks[$i]")
      }
      case _ => None
    }
    path.flatMap { p =>
      cfgKey.flatMap(k => recipe.lines.get(s"$p/config/$k"))
        .orElse(recipe.lines.get(p))
    }
  }

  /** Read + render + parse a recipe file; name defaults to the file name.
    * Directory reads skip unparseable files with a warning
    * (recipe/reader.go:94-112).
    */
  def read(path: java.nio.file.Path, vars: Map[String, String] = Map.empty): Seq[Recipe] = {
    import java.nio.file.Files
    if (Files.isDirectory(path)) {
      Files.list(path).iterator().asScala.toSeq.sortBy(_.toString)
        .filter(p => p.toString.endsWith(".yaml") || p.toString.endsWith(".yml"))
        .flatMap { p =>
          try Some(readOne(p, vars))
          catch {
            case e: Exception =>
              System.err.println(s"[recipe] skipping $p: ${e.getMessage}")
              None
          }
        }
    } else Seq(readOne(path, vars))
  }

  private def readOne(path: java.nio.file.Path, vars: Map[String, String]): Recipe = {
    val raw = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val base = path.getFileName.toString.replaceAll("\\.(yaml|yml)$", "")
    parse(render(raw, vars), base)
  }
}
