package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.model._
import graft.plugins.Registries
import graft.sources._

/** Extractor-family tests with fixture clients (the offline analogue of the
  * reference's dockertest integration suites).
  */
class JdbcFamilySpec extends SparkSpec {

  private class FixtureRunner extends QueryRunner {
    val log = scala.collection.mutable.ArrayBuffer[String]()
    override def run(sql: String): Seq[Map[String, String]] = {
      log += sql
      if (sql == "SHOW DATABASES")
        Seq("mysql", "shop", "information_schema").map(n => Map("name" -> n))
      else if (sql.startsWith("SHOW TABLES"))
        Seq(Map("name" -> "orders"), Map("name" -> "users"))
      else // columns query
        Seq(
          Map("column_name" -> "id", "data_type" -> "bigint",
            "is_nullable" -> "NO", "length" -> "0"),
          Map("column_name" -> "name", "data_type" -> "varchar",
            "is_nullable" -> "YES", "length" -> "255",
            "column_comment" -> "display name"))
    }
  }

  test("mysql introspection: system DBs excluded, schema facet populated") {
    val runner = new FixtureRunner
    val ex = new JdbcIntrospectionExtractor(Dialects.mysql)
    val out = ex.extract(spark,
      Map("runner" -> runner, "identifier" -> "db-host")).collect()
    // 1 surviving db × 2 tables; mysql + information_schema excluded
    assert(out.length == 2)
    val r = out.map(_.getAs[Row]("resource")).map(_.getAs[String]("urn")).sorted
    assert(r.head == "mysql::db-host/shop/orders")
    assert(!runner.log.exists(_.contains("information_schema.columns WHERE table_name = 'x' AND table_schema = 'mysql'")))
    val schema = out(0).getSeq[Row](out(0).fieldIndex("schema"))
    assert(schema.map(_.getAs[String]("name")) == Seq("id", "name"))
    assert(schema(1).getAs[Boolean]("isNullable"))
    assert(schema(1).getAs[Long]("length") == 255L)
  }

  test("all eight dialects registered with distinct discovery SQL") {
    assert(Dialects.all.map(_.service).toSet.size == 8)
    Registries.populate()
    Dialects.all.foreach(d => assert(Registries.extractors.contains(d.service)))
  }

  test("postgres: grants rollup lands in properties.attributes (postgres.go:220-250)") {
    val runner = new QueryRunner {
      override def run(sql: String): Seq[Map[String, String]] =
        if (sql.contains("pg_database")) Seq(Map("name" -> "shop"))
        else if (sql.contains("information_schema.tables")) Seq(Map("name" -> "orders"))
        else if (sql.contains("role_table_grants"))
          Seq(
            Map("grantee" -> "analyst", "privilege_types" -> "SELECT"),
            Map("grantee" -> "writer", "privilege_types" -> "INSERT,UPDATE"))
        else Seq(Map("column_name" -> "id", "data_type" -> "bigint",
          "is_nullable" -> "NO", "length" -> "0"))
    }
    val out = new JdbcIntrospectionExtractor(Dialects.postgres)
      .extract(spark, Map("runner" -> runner, "identifier" -> "pg-host")).collect()
    assert(out.length == 1)
    val attrs = out(0).getAs[Row]("properties").getAs[String]("attributes")
    assert(attrs ==
      """{"grants":[{"user":"analyst","privilege_types":["SELECT"]},""" +
      """{"user":"writer","privilege_types":["INSERT","UPDATE"]}]}""")
  }

  test("oracle: per-table row count lands in profile.totalRows (oracle.go:136-168)") {
    val runner = new QueryRunner {
      override def run(sql: String): Seq[Map[String, String]] =
        if (sql.contains("dual")) Seq(Map("name" -> "ORCL"))
        else if (sql.contains("user_objects")) Seq(Map("name" -> "ORDERS"))
        else if (sql.startsWith("select count(*)")) Seq(Map("count(*)" -> "4321"))
        else Seq(Map("column_name" -> "ID", "data_type" -> "NUMBER",
          "is_nullable" -> "N", "length" -> "22"))
    }
    val out = new JdbcIntrospectionExtractor(Dialects.oracle)
      .extract(spark, Map("runner" -> runner, "identifier" -> "ora-host")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Row]("profile").getAs[Long]("totalRows") == 4321L)
  }

  test("discovery SQL quotes catalog-sourced names (hostile identifiers stay data)") {
    // names come back from one catalog query and feed the next — a quote
    // or identifier-delimiter in them must not change the query shape
    assert(Dialects.mysql.tablesSql("a`b") == "SHOW TABLES FROM `a``b`")
    assert(Dialects.mysql.columnsSql("d'b", "t'1; drop table x--")
      .contains("table_name = 't''1; drop table x--' AND table_schema = 'd''b'"))
    assert(Dialects.postgres.grantsSql.get("d'b", "t'1")
      .contains("table_name='t''1' AND table_catalog='d''b'"))
    assert(Dialects.oracle.rowCountSql.get("T\"X") == "select count(*) from \"T\"\"X\"")
    assert(Dialects.mssql.tablesSql("d]b").contains("FROM [d]]b].INFORMATION_SCHEMA"))
    assert(Dialects.presto.columnsSql("cat\"x", "s'1.t'2")
      .contains("\"cat\"\"x\".information_schema.columns"))
    assert(Dialects.snowflake.tablesSql("D\"B") == "SHOW TABLES IN DATABASE \"D\"\"B\"")
    assert(Dialects.clickhouse.columnsSql("d'b", "t'1")
      .contains("database = 'd''b' AND table = 't''1'"))
  }
}

class CatalogFamilySpec extends SparkSpec {

  test("mongodb: system dbs/collections excluded, collections sorted, row counts kept") {
    val client = new MongoCatalog {
      def listDatabases() = Seq("admin", "app")
      def listCollectionNames(db: String) = Seq("zeta", "alpha", "system.views")
      def estimatedDocumentCount(db: String, c: String) = 42L
    }
    val out = MongoExtractor.extract(spark, Map("client" -> client)).collect()
    assert(out.length == 2)
    val names = out.map(_.getAs[Row]("resource").getAs[String]("name"))
    assert(names.toSeq == Seq("alpha", "zeta")) // sorted (mongodb.go:115)
    assert(out(0).getAs[Row]("profile").getAs[Long]("totalRows") == 42L)
  }

  test("kafka: partitions counted per topic, internal topics skipped") {
    val client = new KafkaAdmin {
      def topicPartitions() = Seq(
        ("orders", 0), ("orders", 1), ("orders", 2),
        ("__consumer_offsets", 0), ("clicks", 0))
    }
    val out = KafkaExtractor.extract(spark,
      Map("client" -> client, "broker" -> "b:9092")).collect()
    assert(out.length == 2)
    val byName = out.map(r =>
      r.getAs[Row]("resource").getAs[String]("name") ->
        r.getAs[Row]("profile").getAs[Long]("numberOfPartitions")).toMap
    assert(byName == Map("orders" -> 3L, "clicks" -> 1L))
  }

  test("gcs: blob listing behind extract_blob flag") {
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val client = new ObjectStoreClient {
      def buckets() = Seq(("data-lake", "EU", "STANDARD", t0))
      def blobs(b: String) = Seq(("part-0.parquet", 1024L, t0))
    }
    val without = GcsExtractor.extract(spark,
      Map("client" -> client, "project_id" -> "p")).collect()(0)
    assert(without.getSeq[Row](without.fieldIndex("blobs")).isEmpty)
    val withBlobs = GcsExtractor.extract(spark,
      Map("client" -> client, "project_id" -> "p", "extract_blob" -> "true")).collect()(0)
    val blobs = withBlobs.getSeq[Row](withBlobs.fieldIndex("blobs"))
    assert(blobs.map(_.getAs[String]("name")) == Seq("part-0.parquet"))
    assert(blobs(0).getAs[Long]("size") == 1024L)
  }
}

class AuditLogUsageSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val now = lit("2024-01-10 00:00:00").cast("timestamp")

  private def log = Seq(
    (ts("2024-01-09 10:00:00"), "DONE",
      "SELECT * FROM a JOIN b ON a.id = b.id WHERE a.x > 5", Seq("p.d.a", "p.d.b")),
    (ts("2024-01-09 11:00:00"), "DONE",
      "SELECT * FROM a WHERE a.x > 5", Seq("p.d.a")),
    (ts("2024-01-09 12:00:00"), "RUNNING",
      "SELECT * FROM a", Seq("p.d.a")),                       // not DONE → excluded
    (ts("2023-12-01 00:00:00"), "DONE",
      "SELECT * FROM a", Seq("p.d.a"))                        // outside window
  ).toDF("ts", "state", "sql", "referenced_tables")

  test("usage counts respect state + lookback window") {
    val completed = graft.sources.AuditLogUsage.completedInWindow(log, now, 7)
    val usage = graft.sources.AuditLogUsage.usageCounts(completed)
      .orderBy("table_urn").collect()
    assert(usage.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("p.d.a", 2L), ("p.d.b", 1L)))
  }

  test("join stats pair tables with their parsed ON conditions") {
    val completed = graft.sources.AuditLogUsage.completedInWindow(log, now, 7)
    val joins = graft.sources.AuditLogUsage.joinStats(completed).collect()
    assert(joins.length == 1)
    assert(joins(0).getAs[String]("a") == "p.d.a")
    assert(joins(0).getAs[String]("b") == "p.d.b")
    assert(joins(0).getAs[Long]("join_count") == 1L)
    assert(joins(0).getSeq[String](3).exists(_.contains("a.id = b.id")))
  }

  test("full table profile merges usage, joins, filters") {
    val out = graft.sources.AuditLogUsage.tableProfiles(log, now, 7)
      .orderBy("table_urn").collect()
    assert(out.length == 2)
    val a = out(0)
    assert(a.getAs[String]("table_urn") == "p.d.a")
    assert(a.getAs[Long]("usage_count") == 2L)
    assert(a.getSeq[org.apache.spark.sql.Row](a.fieldIndex("joins")).head
      .getAs[String]("urn") == "p.d.b")
    assert(a.getSeq[String](a.fieldIndex("filters")).exists(_.contains("a.x > 5")))
  }
}

class RestFamilySpec extends SparkSpec {

  test("metabase: chart upstreams parsed from card SQL, dashboard lineage deduped") {
    val client = new MetabaseClient {
      def dashboards() = Seq(MetabaseDashboard("7", "Revenue", Seq(
        MetabaseCard("1", "by region",
          "SELECT * FROM shop.orders o JOIN shop.customers c ON o.cid = c.id"),
        MetabaseCard("2", "totals", "select sum(x) from shop.orders"))))
    }
    val out = MetabaseExtractor.extract(spark,
      Map("client" -> client, "identifier" -> "mb", "database_host" -> "pg")).collect()(0)
    val charts = out.getSeq[Row](out.fieldIndex("charts"))
    assert(charts.length == 2)
    val chart1Ups = charts(0).getAs[Row]("lineage").getSeq[Row](0).map(_.getAs[String]("urn"))
    assert(chart1Ups == Seq("table::pg/shop/orders", "table::pg/shop/customers"))
    // dashboard upstreams: union of charts, orders deduped across cards
    val dashUps = out.getAs[Row]("lineage").getSeq[Row](0).map(_.getAs[String]("urn"))
    assert(dashUps == Seq("table::pg/shop/orders", "table::pg/shop/customers"))
  }

  test("optimus: bigquery:// dependency URNs remapped, destination is downstream") {
    assert(OptimusExtractor.remapUrn("bigquery://proj:ds.tbl") == "bigquery::proj/ds/tbl")
    val client = new OptimusClient {
      def projects() = Seq("p1")
      def namespaces(p: String) = Seq("ns")
      def jobs(p: String, ns: String) = Seq(OptimusJob("daily-agg",
        owner = "team@x", dependencies = Seq("bigquery://p:raw.events"),
        destination = "bigquery://p:mart.daily"))
    }
    val out = OptimusExtractor.extract(spark,
      Map("client" -> client, "host" -> "opt")).collect()(0)
    assert(out.getAs[Row]("resource").getAs[String]("urn") == "optimus::opt/p1.ns.daily-agg")
    val lin = out.getAs[Row]("lineage")
    assert(lin.getSeq[Row](0).map(_.getAs[String]("urn")) == Seq("bigquery::p/raw/events"))
    assert(lin.getSeq[Row](1).map(_.getAs[String]("urn")) == Seq("bigquery::p/mart/daily"))
  }

  test("bigquery: preview sanitized, profile in one pass, partition key kept") {
    import spark.implicits._
    val client = new BigQueryCatalog {
      def datasets() = Seq("sales")
      def tables(ds: String) = Seq("orders")
      def tableInfo(ds: String, t: String) = (Map("env" -> "prod"), "order_date")
      def loadTable(s: org.apache.spark.sql.SparkSession, ds: String, t: String) =
        // one cell with an EMBEDDED unicode NUL: the reference scrubs the
        // NUL escape inside the serialized JSON (bigquery.go:315-318),
        // not just whole-NUL cells
        Seq((1L, "bad\u0000byte", 10.0), (2L, "ok", 20.0)).toDF("id", "note", "amount")
    }
    val out = BigQueryExtractor.extract(spark, Map(
      "client" -> client, "project_id" -> "p",
      "include_column_profile" -> "true", "max_preview_rows" -> "10")).collect()(0)
    val profile = out.getAs[Row]("profile")
    assert(profile.getAs[Long]("totalRows") == 2L)
    assert(profile.getAs[String]("partitionKey") == "order_date")
    val preview = out.getAs[Row]("preview")
    val rows = preview.getAs[String]("rows")
    // the serialized \u0000 escape is substring-replaced -> "badnullbyte"
    assert(rows.contains("badnullbyte"), rows)
    assert(!rows.contains("\\u0000"), rows)
    val cols = out.getSeq[Row](out.fieldIndex("schema"))
    val amount = cols.find(_.getAs[String]("name") == "amount").get
    assert(amount.getAs[Row]("profile").getAs[Long]("count") == 2L)
  }

  test("tableau: metadata-API walk, per-DB-flavor upstream URNs (tableau.go:108-205)") {
    val client = new TableauClient {
      def projects() = Seq("Analytics")
      def workbooks(p: String) = Seq(TableauWorkbook(
        id = "wb1", name = "Sales", projectName = p, uri = "wb/sales",
        description = "sales wb",
        owner = TableauOwner("o1", "Ana Lyst", "ana@corp.com"),
        sheets = Seq(TableauSheet("sh1", "Trend")),
        upstreamTables = Seq(
          // DatabaseServer with the sqlserver→mssql connection-type remap
          TableauTable("t1", "orders", database = Map(
            "hostName" -> "db.corp", "port" -> "1433", "name" -> "shop",
            "connectionType" -> "sqlserver")),
          // bigquery server flavor: URN from the parsed full name
          TableauTable("t2", "invoice", schema = "ds", fullName = "`proj.dataset_a.invoice`",
            database = Map("hostName" -> "bq", "connectionType" -> "bigquery")),
          // bigquery fallback when full name is not 3 parts
          TableauTable("t3", "events", schema = "raw", fullName = "projonly",
            database = Map("hostName" -> "bq", "connectionType" -> "bigquery")),
          // CloudFile flavor
          TableauTable("t4", "blob", database = Map(
            "provider" -> "gcs", "name" -> "bucket1", "connectionType" -> "gcs")),
          // unknown database shape is skipped
          TableauTable("t5", "mystery", database = Map("weird" -> "x"))))
      )
    }
    val out = TableauExtractor.extract(spark,
      Map("client" -> client, "identifier" -> "tb")).collect()(0)
    assert(out.getAs[Row]("resource").getAs[String]("urn") == "tableau::tb/workbook/wb1")
    val charts = out.getSeq[Row](out.fieldIndex("charts"))
    assert(charts.map(_.getAs[String]("urn")) == Seq("tableau::tb/sheet/sh1"))
    val ups = out.getAs[Row]("lineage").getSeq[Row](0)
    assert(ups.map(_.getAs[String]("urn")) == Seq(
      "mssql::db.corp:1433/shop/orders",
      "bigquery::proj/dataset_a/invoice",
      "bigquery::projonly/raw/events",
      "gcs::gcs/bucket1/blob"))
    assert(ups.map(_.getAs[String]("type")) == Seq("table", "table", "table", "bucket"))
    val attrs = out.getAs[Row]("properties").getAs[String]("attributes")
    assert(attrs.contains(""""project_name":"Analytics""""))
    assert(attrs.contains(""""owner_email":"ana@corp.com""""))
    val owner = out.getAs[Row]("ownership").getSeq[Row](0).head
    assert(owner.getAs[String]("email") == "ana@corp.com")
  }

  test("registry lists the full 27-extractor roster") {
    Registries.populate()
    val names = Registries.extractors.list.map(_.name).toSet
    val expected = Set(
      "csv", "parquet", "mysql", "mariadb", "postgres", "mssql", "oracle",
      "clickhouse", "presto", "snowflake", "mongodb", "cassandra", "couchdb",
      "elastic", "kafka", "gcs", "bigtable", "redshift", "bigquery", "github",
      "shield", "grafana", "metabase", "superset", "redash", "tableau", "optimus")
    assert(expected.subsetOf(names), s"missing: ${expected -- names}")
  }
}
