package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model._
import graft.plugins._

/** REST/gRPC-service extractors: github, shield (users), grafana, metabase,
  * superset, redash, tableau (dashboards), optimus (jobs). Clients are
  * driver-side interfaces injected via config key `client` — the asset
  * mapping and lineage derivation is the extractor logic under test.
  */

/** reference github/github.go:85-88 */
trait GithubClient {
  /** (login, email, full name) of org members */
  def orgMembers(org: String): Seq[(String, String, String)]
}

object GithubExtractor extends Extractor {
  val info: PluginInfo = PluginInfo("github",
    "Extract User assets from a GitHub organization's member list",
    sampleConfig = "org: my-org", tags = Seq("rest", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    requireKeys(config, "org")

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: GithubClient) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no GithubClient configured (offline container: inject via config key 'client')")))
    }
    val org = config("org").toString
    val assets = client.orgMembers(org).map { case (login, email, fullName) =>
      UserAsset(
        resource = Resource(urn = Urn.resource("github", org, login),
          name = login, service = "github", `type` = "user"),
        email = email, username = login, fullName = fullName)
    }
    assets.toDS().toDF()
  }
}

/** reference shield/shield.go:92-104 */
trait ShieldClient {
  /** (id, email, username, full name, Seq((groupUrn, roles))) */
  def users(): Seq[(String, String, String, String, Seq[(String, Seq[String])])]
}

object ShieldExtractor extends Extractor {
  val info: PluginInfo = PluginInfo("shield",
    "Extract User assets (with group memberships and roles) from Shield",
    sampleConfig = "host: shield:8080", tags = Seq("rest", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "host")

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: ShieldClient) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no ShieldClient configured (offline container: inject via config key 'client')")))
    }
    val host = config.getOrElse("host", "shield").toString
    val assets = client.users().map { case (id, email, username, fullName, groups) =>
      UserAsset(
        resource = Resource(urn = Urn.resource("shield", host, id),
          name = username, service = "shield", `type` = "user"),
        email = email, username = username, fullName = fullName,
        memberships = groups.map { case (g, roles) => Membership(g, roles) })
    }
    assets.toDS().toDF()
  }
}

/** Dashboard-service client shape shared by grafana/superset/redash:
  * dashboards with charts; each chart may carry a datasource-derived
  * upstream. (grafana.go:97-130, superset.go:111-124, redash.go:100-108)
  */
case class RestChart(
    id: String,
    name: String,
    chartType: String = "",
    source: String = "",
    url: String = "",
    upstreamTableUrns: Seq[String] = Nil)
case class RestDashboard(id: String, title: String, url: String = "",
    charts: Seq[RestChart] = Nil)

trait DashboardClient {
  def dashboards(): Seq[RestDashboard]
}

/** Shared dashboard-asset mapping: per-chart lineage from its upstream
  * URNs; dashboard upstreams = distinct union of chart upstreams
  * (reference metabase.go:249-260).
  */
abstract class DashboardServiceExtractor(service: String) extends Extractor {
  val info: PluginInfo = PluginInfo(service,
    s"Extract Dashboard assets (charts + datasource lineage) from $service",
    sampleConfig = "host: http://host\nidentifier: my-host",
    tags = Seq("rest", "extractor", "dashboard"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "host")

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: DashboardClient) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        s"no DashboardClient configured for $service (offline container: inject via config key 'client')")))
    }
    val host = config.getOrElse("identifier", config.getOrElse("host", service)).toString
    val assets = client.dashboards().map { d =>
      val charts = d.charts.map { c =>
        Chart(
          urn = s"${Urn.resource(service, host, d.id)}/${c.id}",
          name = c.name, `type` = c.chartType, source = service,
          url = c.url,
          lineage =
            if (c.upstreamTableUrns.nonEmpty)
              Some(Lineage(upstreams = c.upstreamTableUrns.map(u =>
                Resource(urn = u, name = u.split("/").last, service = "table"))))
            else None)
      }
      val dashUpstreams = charts.flatMap(_.lineage.toSeq.flatMap(_.upstreams))
        .distinctBy(_.urn)
      DashboardAsset(
        resource = Resource(urn = Urn.resource(service, host, d.id),
          name = d.title, service = service, `type` = "dashboard", url = d.url),
        charts = charts,
        lineage = if (dashUpstreams.nonEmpty) Some(Lineage(upstreams = dashUpstreams)) else None)
    }
    assets.toDS().toDF()
  }
}

object GrafanaExtractor extends DashboardServiceExtractor("grafana")
object SupersetExtractor extends DashboardServiceExtractor("superset")
object RedashExtractor extends DashboardServiceExtractor("redash")

/** Tableau Metadata-API walk (reference tableau/tableau.go:108-205): REST
  * project list → GraphQL detailed workbooks per project (sheets + upstream
  * tables, each table tagged with its POLYMORPHIC database object) →
  * Dashboard asset per workbook with per-DB-flavor upstream table URNs
  * (models.go:35-196, builder.go:10-78).
  */
case class TableauOwner(id: String = "", name: String = "", email: String = "")
case class TableauSheet(id: String, name: String)
/** `database` is the GraphQL union rendered as a string map — flavor is
  * detected by key presence, matching builder.go:31-77's mapstructure
  * decode order (hostName → server, provider → cloud file, filePath →
  * local file, connectorUrl → web-data connector).
  */
case class TableauTable(
    id: String, name: String, schema: String = "", fullName: String = "",
    database: Map[String, String] = Map.empty)
case class TableauWorkbook(
    id: String, name: String, projectName: String = "", uri: String = "",
    description: String = "", owner: TableauOwner = TableauOwner(),
    sheets: Seq[TableauSheet] = Nil, upstreamTables: Seq[TableauTable] = Nil)

trait TableauClient {
  def projects(): Seq[String]
  /** the GraphQL `workbooks` query filtered by project (client.go:139-228) */
  def workbooks(projectName: String): Seq[TableauWorkbook]
}

object TableauExtractor extends Extractor {
  val info: PluginInfo = PluginInfo("tableau",
    "Extract Dashboard assets from Tableau workbooks; upstream table lineage from the Metadata API",
    sampleConfig =
      """host: https://server.tableau.com
        |identifier: my-tableau
        |sitename: testdev""".stripMargin,
    tags = Seq("rest", "extractor", "dashboard"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "host")

  /** connection-type → service remap (models.go:15-25). */
  private val connectionTypeMap = Map("sqlserver" -> "mssql")
  private def source(db: Map[String, String]): String = {
    val ct = db.getOrElse("connectionType", "")
    connectionTypeMap.getOrElse(ct, ct)
  }

  /** `project-id.schema.table1` (backticks/brackets stripped) → parts
    * (models.go:93-105).
    */
  def parseBQFullName(fullName: String): Seq[String] =
    fullName.replaceAll("[`\\[\\]]", "").split("\\.").toSeq

  /** Per-flavor upstream resource (builder.go:24-77 + the CreateResource
    * impls in models.go). Unknown database shapes yield None (reference
    * logs and skips).
    */
  def upstreamResource(t: TableauTable): Option[Resource] = {
    val db = t.database
    val svc = source(db)
    if (db.contains("hostName")) { // DatabaseServer (models.go:107-133)
      val urn =
        if (svc == "bigquery") {
          val parts = parseBQFullName(t.fullName)
          if (parts.length == 3) Urn.table(svc, parts(0), parts(1), parts(2))
          else Urn.table(svc, parts.headOption.getOrElse(""), t.schema, t.name)
        } else
          Urn.table(svc, s"${db.getOrElse("hostName", "")}:${db.getOrElse("port", "0")}",
            db.getOrElse("name", ""), t.name)
      Some(Resource(urn = urn, name = "", service = svc, `type` = "table"))
    } else if (db.contains("provider")) { // CloudFile (models.go:137-158)
      Some(Resource(
        urn = s"$svc::${db("provider")}/${db.getOrElse("name", "")}/${t.name}",
        name = "", service = svc, `type` = "bucket"))
    } else if (db.contains("filePath")) { // File (models.go:160-176)
      Some(Resource(
        urn = s"$svc::${db("filePath")}/${db.getOrElse("name", "")}/${t.name}",
        name = "", service = svc, `type` = "bucket"))
    } else if (db.contains("connectorUrl")) { // WebDataConnector (models.go:178-196)
      Some(Resource(
        urn = s"$svc::${db("connectorUrl")}/${db.getOrElse("name", "")}/${t.name}",
        name = "", service = svc, `type` = "table"))
    } else None
  }

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: TableauClient) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no TableauClient configured (offline container: inject via config key 'client')")))
    }
    val host = config.getOrElse("identifier", config.getOrElse("host", "tableau")).toString
    val assets = for {
      project <- client.projects()
      wb <- client.workbooks(project)
    } yield {
      val upstreams = wb.upstreamTables.flatMap(upstreamResource)
      val lineage = Some(Lineage(upstreams = upstreams))
      val dashUrn = Urn.resource("tableau", host, s"workbook/${wb.id}")
      DashboardAsset(
        resource = Resource(urn = dashUrn, name = wb.name, service = "tableau",
          `type` = "dashboard", description = wb.description),
        charts = wb.sheets.map(sh => Chart(
          urn = Urn.resource("tableau", host, s"sheet/${sh.id}"),
          name = sh.name, source = "tableau")),
        ownership = Some(Ownership(Seq(Owner(
          urn = wb.owner.email, name = wb.owner.name, email = wb.owner.email)))),
        lineage = lineage,
        // workbook attributes facet (tableau.go:145-155), deterministic order
        properties = Properties(attributes = JsonText.obj(Seq(
          "id" -> wb.id, "name" -> wb.name, "project_name" -> wb.projectName,
          "uri" -> wb.uri, "owner_id" -> wb.owner.id,
          "owner_name" -> wb.owner.name, "owner_email" -> wb.owner.email))))
    }
    assets.toDS().toDF()
  }
}

/** reference metabase/metabase.go — dashboards :105-142, cards :144-190,
  * lineage from card SQL :249-260. Cards carry raw SQL; upstream tables
  * are parsed from FROM/JOIN clauses.
  */
case class MetabaseCard(id: String, name: String, sql: String = "", url: String = "")
case class MetabaseDashboard(id: String, title: String, cards: Seq[MetabaseCard] = Nil)

trait MetabaseClient {
  def dashboards(): Seq[MetabaseDashboard]
}

object MetabaseExtractor extends Extractor {
  val info: PluginInfo = PluginInfo("metabase",
    "Extract Dashboard assets from Metabase; chart lineage parsed from card SQL",
    sampleConfig = "host: http://host\ndatabase_host: db-host",
    tags = Seq("rest", "extractor", "dashboard"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "host")

  /** FROM/JOIN table references of a card's SQL (metabase.go table parse). */
  private val tableRef =
    java.util.regex.Pattern.compile("(?i)\\b(?:FROM|JOIN)\\s+([a-zA-Z0-9_\\.`\"]+)")

  def upstreamTables(sql: String): Seq[String] = {
    val m = tableRef.matcher(graft.functions.SqlParse.cleanQuery(sql))
    val out = scala.collection.mutable.LinkedHashSet[String]()
    while (m.find()) {
      val t = m.group(1).replaceAll("[`\"]", "")
      // skip derived-table openers and keywords that can follow FROM
      if (!t.equalsIgnoreCase("select") && t.nonEmpty) out += t
    }
    out.toSeq
  }

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: MetabaseClient) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no MetabaseClient configured (offline container: inject via config key 'client')")))
    }
    val host = config.getOrElse("identifier", config.getOrElse("host", "metabase")).toString
    val dbHost = config.getOrElse("database_host", "db").toString
    val assets = client.dashboards().map { d =>
      val charts = d.cards.map { c =>
        val ups = upstreamTables(c.sql).map { t =>
          val urn = t.split("\\.") match {
            case Array(db, table) => Urn.table("table", dbHost, db, table)
            case _ => Urn.table("table", dbHost, "default", t)
          }
          Resource(urn = urn, name = t, service = "table")
        }
        Chart(urn = s"${Urn.resource("metabase", host, d.id)}/${c.id}",
          name = c.name, `type` = "card", source = "metabase", url = c.url,
          lineage = if (ups.nonEmpty) Some(Lineage(upstreams = ups)) else None)
      }
      // dashboard upstreams = dedup-union of chart upstreams (metabase.go:249-260)
      val dashUpstreams = charts.flatMap(_.lineage.toSeq.flatMap(_.upstreams))
        .distinctBy(_.urn)
      DashboardAsset(
        resource = Resource(urn = Urn.resource("metabase", host, d.id),
          name = d.title, service = "metabase", `type` = "dashboard"),
        charts = charts,
        lineage = if (dashUpstreams.nonEmpty) Some(Lineage(upstreams = dashUpstreams)) else None)
    }
    assets.toDS().toDF()
  }
}

/** reference optimus/optimus.go — projects→namespaces→jobs :123-162,
  * upstreams from task dependencies :206-222, downstream from destination
  * :224-241, `bigquery://project:dataset.table` URN remap :244+.
  */
case class OptimusJob(
    name: String,
    description: String = "",
    owner: String = "",
    /** `bigquery://project:dataset.table` dependency URNs */
    dependencies: Seq[String] = Nil,
    /** destination in the same scheme, empty if none */
    destination: String = "")

trait OptimusClient {
  def projects(): Seq[String]
  def namespaces(project: String): Seq[String]
  def jobs(project: String, namespace: String): Seq[OptimusJob]
}

object OptimusExtractor extends Extractor {
  val info: PluginInfo = PluginInfo("optimus",
    "Extract Job assets (task dependency lineage) from an Optimus scheduler",
    sampleConfig = "host: optimus:80", tags = Seq("grpc", "extractor", "job"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "host")

  /** `bigquery://project:dataset.table` → table URN (optimus.go:244+). */
  def remapUrn(dep: String): String = dep match {
    case s if s.startsWith("bigquery://") =>
      s.stripPrefix("bigquery://").split("[:.]") match {
        case Array(project, dataset, table) => Urn.table("bigquery", project, dataset, table)
        case _ => s
      }
    case other => other
  }

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: OptimusClient) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no OptimusClient configured (offline container: inject via config key 'client')")))
    }
    val host = config.getOrElse("host", "optimus").toString
    val assets = for {
      project <- client.projects()
      ns <- client.namespaces(project)
      job <- client.jobs(project, ns)
    } yield JobAsset(
      resource = Resource(
        urn = Urn.resource("optimus", host, s"$project.$ns.${job.name}"),
        name = job.name, service = "optimus", `type` = "job",
        description = job.description),
      ownership =
        if (job.owner.nonEmpty) Some(Ownership(Seq(Owner(urn = job.owner, name = job.owner))))
        else None,
      lineage = Some(Lineage(
        upstreams = job.dependencies.map(d =>
          Resource(urn = remapUrn(d), name = d.split("[/.]").last, service = "table")),
        downstreams =
          if (job.destination.nonEmpty)
            Seq(Resource(urn = remapUrn(job.destination),
              name = job.destination.split("[/.]").last, service = "table"))
          else Nil)))
    assets.toDS().toDF()
  }
}
