package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model._
import graft.plugins._

/** The JDBC-introspection extractor family: one generic engine + one
  * `Dialect` per system. The reference implements these as eight
  * copy-pasted plugins whose only differences are the discovery SQL and
  * the system-schema exclusion list (SURVEY.md §2.2); here the shared
  * shape is factored once.
  *
  * All introspection queries run driver-side through a [[QueryRunner]]
  * (catalog metadata is KB-sized — there is nothing to distribute); the
  * resulting asset list becomes a Dataset. A production runner backed by
  * `java.sql.DriverManager` is provided; tests (and this offline
  * container) inject a fixture runner via config key `runner`.
  *
  * Dialect citations (all under /root/reference/plugins/extractors/):
  *   - mysql/mysql.go:95-192 (SHOW DATABASES → SHOW TABLES →
  *     information_schema.columns ORDER BY column_name; exclusions :28-33)
  *   - mariadb/mariadb.go:96-159 (same shape)
  *   - postgres/postgres.go:107-250 (pg_database WHERE datistemplate=false;
  *     information_schema; grants string_agg GROUP BY grantee)
  *   - mssql/mssql.go:101-154 (sys.databases; TABLE_TYPE='BASE TABLE')
  *   - oracle/oracle.go:97-168 (user_tables; per-table row counts)
  *   - clickhouse/clickhouse.go:90-111 (system.tables NOT LIKE 'system')
  *   - presto/presto.go:113-190 (SHOW CATALOGS → SHOW SCHEMAS → SHOW TABLES
  *     → information_schema.columns)
  *   - snowflake/snowflake.go:112-194 (SHOW DATABASES → SHOW TABLES →
  *     information_schema.columns)
  */
trait QueryRunner {
  /** Run a driver-side introspection query; rows as column-name → string. */
  def run(sql: String): Seq[Map[String, String]]
  def close(): Unit = ()
}

/** Production runner over java.sql (usable when a JDBC driver jar is on the
  * classpath; not exercisable in this offline container).
  */
class JdbcQueryRunner(url: String, user: String, password: String) extends QueryRunner {
  private lazy val conn = java.sql.DriverManager.getConnection(url, user, password)
  override def run(sql: String): Seq[Map[String, String]] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      val meta = rs.getMetaData
      val cols = (1 to meta.getColumnCount).map(meta.getColumnLabel)
      val out = scala.collection.mutable.ArrayBuffer[Map[String, String]]()
      while (rs.next())
        out += cols.map(c => c.toLowerCase -> Option(rs.getString(c)).getOrElse("")).toMap
      out.toSeq
    } finally st.close()
  }
  override def close(): Unit = conn.close()
}

/** Per-system discovery SQL. `databasesSql` rows must expose `name`;
  * `tablesSql(db)` rows `name`; `columnsSql(db, table)` rows
  * `column_name, data_type, is_nullable, length, comment` (missing keys
  * default empty).
  *
  * Optional per-table facet queries:
  *   - `grantsSql(db, table)` rows `grantee, privilege_types` (comma-joined)
  *     → rolled into `properties.attributes` as
  *     `{"grants":[{"user":…,"privilege_types":[…]}]}`
  *     (reference: postgres.go:220-250, userPrivilegesInfo)
  *   - `rowCountSql(table)` one row, one value → `profile.totalRows`
  *     (reference: oracle.go:136-168, getTableMetadata)
  */
case class Dialect(
    service: String,
    databasesSql: String,
    tablesSql: String => String,
    columnsSql: (String, String) => String,
    excludedDbs: Set[String] = Set.empty,
    grantsSql: Option[(String, String) => String] = None,
    rowCountSql: Option[String => String] = None)

/** Quoting for discovery SQL. Names discovered from one catalog query are
  * interpolated into the next — they are data, not trusted SQL, so a
  * hostile table name (`x'; drop ...`, `` a`b ``) must never change the
  * query shape. Literals double embedded quotes; identifiers use each
  * dialect's quote character with embedded occurrences doubled.
  */
private[sources] object Quote {
  /** ANSI string literal. */
  def lit(s: String): String = "'" + s.replace("'", "''") + "'"
  /** Backtick identifier (mysql/mariadb). */
  def tick(s: String): String = "`" + s.replace("`", "``") + "`"
  /** Double-quoted identifier (ANSI: postgres/oracle/presto/snowflake). */
  def ansi(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""
  /** Bracket identifier (mssql). */
  def bracket(s: String): String = "[" + s.replace("]", "]]") + "]"
}

object Dialects {
  /** reference mysql.go:28-33, :95-192 */
  val mysql: Dialect = Dialect(
    service = "mysql",
    databasesSql = "SHOW DATABASES",
    tablesSql = db => s"SHOW TABLES FROM ${Quote.tick(db)}",
    columnsSql = (db, t) =>
      s"""SELECT COLUMN_NAME, COLUMN_COMMENT, DATA_TYPE, IS_NULLABLE, IFNULL(CHARACTER_MAXIMUM_LENGTH, 0) AS LENGTH
         |FROM information_schema.columns
         |WHERE table_name = ${Quote.lit(t)} AND table_schema = ${Quote.lit(db)} ORDER BY COLUMN_NAME ASC""".stripMargin,
    excludedDbs = Set("information_schema", "mysql", "performance_schema", "sys"))

  /** reference mariadb/mariadb.go:96-159 — identical shape to mysql */
  val mariadb: Dialect = mysql.copy(service = "mariadb")

  /** reference postgres.go:107-250 */
  val postgres: Dialect = Dialect(
    service = "postgres",
    databasesSql = "SELECT datname AS name FROM pg_database WHERE datistemplate = false",
    tablesSql = db =>
      s"SELECT table_name AS name FROM information_schema.tables WHERE table_schema = 'public' ORDER BY table_name",
    columnsSql = (db, t) =>
      s"""SELECT column_name, data_type, is_nullable, COALESCE(character_maximum_length, 0) AS length
         |FROM information_schema.columns WHERE table_name = ${Quote.lit(t)} ORDER BY column_name ASC""".stripMargin,
    excludedDbs = Set("root", "postgres"),
    // userPrivilegesInfo rollup (postgres.go:220-224): privileges aggregated
    // per grantee with string_agg, keyed to the table + catalog
    grantsSql = Some((db, t) =>
      s"""SELECT grantee, string_agg(privilege_type, ',') AS privilege_types
         |FROM information_schema.role_table_grants
         |WHERE table_name=${Quote.lit(t)} AND table_catalog=${Quote.lit(db)}
         |GROUP BY grantee""".stripMargin))

  /** reference mssql/mssql.go:101-154 */
  val mssql: Dialect = Dialect(
    service = "mssql",
    databasesSql = "SELECT name FROM sys.databases",
    tablesSql = db =>
      s"SELECT TABLE_NAME AS name FROM ${Quote.bracket(db)}.INFORMATION_SCHEMA.TABLES WHERE TABLE_TYPE = 'BASE TABLE'",
    columnsSql = (db, t) =>
      s"""SELECT COLUMN_NAME, DATA_TYPE, IS_NULLABLE, COALESCE(CHARACTER_MAXIMUM_LENGTH, 0) AS LENGTH
         |FROM ${Quote.bracket(db)}.INFORMATION_SCHEMA.COLUMNS WHERE TABLE_NAME = ${Quote.lit(t)}""".stripMargin,
    excludedDbs = Set("master", "tempdb", "model", "msdb"))

  /** reference oracle/oracle.go:97-168 */
  val oracle: Dialect = Dialect(
    service = "oracle",
    databasesSql = "SELECT ora_database_name AS name FROM dual",
    tablesSql = db => "SELECT object_name AS name FROM user_objects WHERE object_type = 'TABLE'",
    columnsSql = (db, t) =>
      s"""SELECT column_name, data_type, nullable AS is_nullable, data_length AS length
         |FROM user_tab_columns WHERE table_name = ${Quote.lit(t)}""".stripMargin,
    // per-table row count into profile.totalRows (oracle.go:136-144)
    rowCountSql = Some(t => s"select count(*) from ${Quote.ansi(t)}"))

  /** reference clickhouse/clickhouse.go:90-111 */
  val clickhouse: Dialect = Dialect(
    service = "clickhouse",
    databasesSql = "SELECT DISTINCT database AS name FROM system.tables WHERE database NOT LIKE 'system'",
    tablesSql = db => s"SELECT name FROM system.tables WHERE database = ${Quote.lit(db)}",
    columnsSql = (db, t) =>
      s"SELECT name AS column_name, type AS data_type FROM system.columns WHERE database = ${Quote.lit(db)} AND table = ${Quote.lit(t)}")

  /** reference presto/presto.go:113-190 — catalogs play the database role;
    * the per-schema loop is flattened into qualified table names.
    */
  val presto: Dialect = Dialect(
    service = "presto",
    databasesSql = "SHOW CATALOGS",
    tablesSql = catalog =>
      s"""SELECT table_schema || '.' || table_name AS name FROM ${Quote.ansi(catalog)}.information_schema.tables
         |WHERE table_schema NOT IN ('information_schema')""".stripMargin,
    columnsSql = (catalog, t) => {
      // tablesSql emits "schema.table"; split at the FIRST dot (schema
      // names with dots require quoting in presto and never appear raw in
      // information_schema, while table names with dots do occur). A name
      // with no dot at all degrades to the default schema, never a crash.
      val (schema, table) = t.split("\\.", 2) match {
        case Array(s, tb) => (s, tb)
        case _ => ("default", t)
      }
      s"""SELECT column_name, data_type, is_nullable FROM ${Quote.ansi(catalog)}.information_schema.columns
         |WHERE table_schema = ${Quote.lit(schema)} AND table_name = ${Quote.lit(table)} ORDER BY column_name""".stripMargin
    },
    excludedDbs = Set("system"))

  /** reference snowflake/snowflake.go:112-194 */
  val snowflake: Dialect = Dialect(
    service = "snowflake",
    databasesSql = "SHOW DATABASES",
    tablesSql = db => s"SHOW TABLES IN DATABASE ${Quote.ansi(db)}",
    columnsSql = (db, t) =>
      s"""SELECT COLUMN_NAME, COMMENT, DATA_TYPE, IS_NULLABLE, COALESCE(CHARACTER_MAXIMUM_LENGTH, 0) AS LENGTH
         |FROM ${Quote.ansi(db)}.INFORMATION_SCHEMA.COLUMNS WHERE TABLE_NAME = ${Quote.lit(t)} ORDER BY COLUMN_NAME ASC""".stripMargin)

  val all: Seq[Dialect] =
    Seq(mysql, mariadb, postgres, mssql, oracle, clickhouse, presto, snowflake)
}

/** Generic introspection extractor: discover databases (minus exclusions +
  * per-recipe `exclude` config, reference presto.go:30-31), then tables,
  * then columns, and emit one Table asset per table.
  */
class JdbcIntrospectionExtractor(dialect: Dialect) extends Extractor {
  val info: PluginInfo = PluginInfo(dialect.service,
    s"Extract Table assets (schema facet) from ${dialect.service} catalog introspection",
    sampleConfig =
      """connection_url: jdbc:...
        |identifier: my-host
        |exclude: db1,db2""".stripMargin,
    tags = Seq("jdbc", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("runner")) Nil
    else requireKeys(config, "connection_url", "identifier")

  private def runner(config: Map[String, Any]): QueryRunner = config.get("runner") match {
    case Some(r: QueryRunner) => r
    case Some(other) => throw new ConfigException(Seq(
      InvalidConfigError("runner", s"not a QueryRunner: ${other.getClass}")))
    case None => new JdbcQueryRunner(
      config("connection_url").toString,
      config.getOrElse("user", "").toString,
      config.getOrElse("password", "").toString)
  }

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val host = config.getOrElse("identifier", dialect.service).toString
    val excluded = dialect.excludedDbs ++
      config.get("exclude").map(_.toString.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    val r = runner(config)
    try {
      val assets = for {
        db <- r.run(dialect.databasesSql).map(row =>
          row.getOrElse("name", row.values.headOption.getOrElse("")))
        if db.nonEmpty && !excluded.contains(db)
        table <- r.run(dialect.tablesSql(db)).map(row =>
          row.getOrElse("name", row.values.headOption.getOrElse("")))
        if table.nonEmpty
      } yield {
        val cols = r.run(dialect.columnsSql(db, table)).map { c =>
          ColumnDef(
            name = c.getOrElse("column_name", ""),
            description = c.getOrElse("column_comment", c.getOrElse("comment", "")),
            dataType = c.getOrElse("data_type", ""),
            isNullable = Set("yes", "y", "true", "1")
              .contains(c.getOrElse("is_nullable", "yes").toLowerCase),
            length = c.getOrElse("length", "0").toDouble.toLong)
        }
        // grants rollup → attributes JSON (postgres.go:226-250: one entry
        // per grantee, privilege_types split back into a list)
        val attributes = dialect.grantsSql.map { g =>
          val grants = r.run(g(db, table)).map { row =>
            val user = JsonText.str(row.getOrElse("grantee", ""))
            val privs = row.getOrElse("privilege_types", "").split(",")
              .filter(_.nonEmpty).map(JsonText.str).mkString(",")
            s"""{"user":$user,"privilege_types":[$privs]}"""
          }.mkString(",")
          s"""{"grants":[$grants]}"""
        }
        // per-table row count → profile.totalRows (oracle.go:136-168)
        val profile = dialect.rowCountSql.map { rc =>
          val count = r.run(rc(table)).headOption
            .flatMap(_.values.headOption).map(_.toLong).getOrElse(0L)
          TableProfile(totalRows = count)
        }
        TableAsset(
          resource = Resource(
            urn = Urn.table(dialect.service, host, db, table),
            name = table, service = dialect.service, `type` = "table"),
          profile = profile,
          schema = cols,
          properties = attributes.map(a => Properties(attributes = a))
            .getOrElse(Properties()))
      }
      assets.toDS().toDF()
    } finally r.close()
  }
}
