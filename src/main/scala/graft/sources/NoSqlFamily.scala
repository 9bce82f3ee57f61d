package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model._
import graft.plugins._

/** NoSQL catalog extractors: mongodb, cassandra, couchdb, elastic.
  *
  * Same pattern as the JDBC family: the catalog client is an interface
  * (driver-side, metadata-sized), injected via config key `client`; the
  * mapping from catalog entries to Table assets is the extractor's real
  * logic and is fully testable offline. Production wiring would implement
  * each client over the respective Java driver.
  */

/** reference mongodb/mongodb.go:90-155 */
trait MongoCatalog {
  def listDatabases(): Seq[String]
  def listCollectionNames(db: String): Seq[String]
  def estimatedDocumentCount(db: String, collection: String): Long
}

object MongoExtractor extends Extractor {
  /** reference mongodb.go:168-171 */
  private val systemDbs = Set("admin", "config", "local")

  val info: PluginInfo = PluginInfo("mongodb",
    "Extract Table assets (collection + estimated row count) from MongoDB",
    sampleConfig = "connection_url: mongodb://host:27017\nidentifier: my-host",
    tags = Seq("nosql", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "connection_url")

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: MongoCatalog) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no MongoCatalog client configured (offline container: inject via config key 'client')")))
    }
    val host = config.getOrElse("identifier", "mongodb").toString
    val assets = for {
      db <- client.listDatabases().filterNot(systemDbs.contains)
      // sorted collection names for deterministic output (mongodb.go:115)
      coll <- client.listCollectionNames(db).sorted
      if !coll.startsWith("system.")
    } yield TableAsset(
      resource = Resource(urn = Urn.table("mongodb", host, db, coll),
        name = coll, service = "mongodb", `type` = "table"),
      profile = Some(TableProfile(totalRows = client.estimatedDocumentCount(db, coll))))
    assets.toDS().toDF()
  }
}

/** reference cassandra/cassandra.go:116-185 */
trait CassandraCatalog {
  def keyspaces(): Seq[String]
  def tables(keyspace: String): Seq[String]
  /** (column_name, type) pairs */
  def columns(keyspace: String, table: String): Seq[(String, String)]
}

object CassandraExtractor extends Extractor {
  /** reference cassandra.go:30 */
  private val systemKeyspaces = Set(
    "system", "system_auth", "system_schema", "system_distributed", "system_traces")

  val info: PluginInfo = PluginInfo("cassandra",
    "Extract Table assets (keyspace tables + columns) from Cassandra system_schema",
    sampleConfig = "host: 127.0.0.1\nidentifier: my-cluster",
    tags = Seq("nosql", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "host")

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: CassandraCatalog) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no CassandraCatalog client configured (offline container: inject via config key 'client')")))
    }
    val host = config.getOrElse("identifier", "cassandra").toString
    val assets = for {
      ks <- client.keyspaces().filterNot(systemKeyspaces.contains)
      table <- client.tables(ks)
    } yield TableAsset(
      resource = Resource(urn = Urn.table("cassandra", host, ks, table),
        name = table, service = "cassandra", `type` = "table"),
      schema = client.columns(ks, table).map { case (n, t) =>
        ColumnDef(name = n, dataType = t)
      })
    assets.toDS().toDF()
  }
}

/** reference couchdb/couchdb.go:108-165 */
trait CouchCatalog {
  def allDbs(): Seq[String]
  /** field name → value type of a sample of each db's docs */
  def docFields(db: String): Seq[(String, String)]
}

object CouchExtractor extends Extractor {
  val info: PluginInfo = PluginInfo("couchdb",
    "Extract Table assets (per-database doc fields as columns) from CouchDB",
    sampleConfig = "connection_url: http://host:5984\nidentifier: my-host",
    tags = Seq("nosql", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "connection_url")

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: CouchCatalog) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no CouchCatalog client configured (offline container: inject via config key 'client')")))
    }
    val host = config.getOrElse("identifier", "couchdb").toString
    val assets = client.allDbs().filterNot(_.startsWith("_")).map { db =>
      TableAsset(
        resource = Resource(urn = Urn.table("couchdb", host, db, db),
          name = db, service = "couchdb", `type` = "table"),
        schema = client.docFields(db).map { case (n, t) =>
          ColumnDef(name = n, dataType = t)
        })
    }
    assets.toDS().toDF()
  }
}

/** reference elastic/elastic.go:100-168 */
trait ElasticCatalog {
  def indices(): Seq[String]
  /** mapping properties: field name → type (elastic.go:151-168) */
  def mappingProperties(index: String): Seq[(String, String)]
  def docCount(index: String): Long
}

object ElasticExtractor extends Extractor {
  val info: PluginInfo = PluginInfo("elastic",
    "Extract Table assets (index mappings + doc counts) from Elasticsearch",
    sampleConfig = "connection_url: http://host:9200\nidentifier: my-cluster",
    tags = Seq("nosql", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "connection_url")

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: ElasticCatalog) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no ElasticCatalog client configured (offline container: inject via config key 'client')")))
    }
    val host = config.getOrElse("identifier", "elastic").toString
    val assets = client.indices().filterNot(_.startsWith(".")).map { idx =>
      TableAsset(
        resource = Resource(urn = Urn.table("elasticsearch", host, "default", idx),
          name = idx, service = "elasticsearch", `type` = "table"),
        profile = Some(TableProfile(totalRows = client.docCount(idx))),
        schema = client.mappingProperties(idx).map { case (n, t) =>
          ColumnDef(name = n, dataType = t)
        })
    }
    assets.toDS().toDF()
  }
}
