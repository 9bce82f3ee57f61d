package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, when}

import graft.model._
import graft.plugins._
import graft.operators.ColumnProfiler

/** Cloud/stream metadata extractors: kafka, gcs, bigtable, redshift,
  * bigquery. Admin/metadata APIs are driver-side client interfaces
  * (injected via config key `client`); anything row-scale — the BigQuery
  * preview and column profile — runs as Spark jobs over a DataFrame the
  * client hands back.
  */

/** reference kafka/kafka.go:89-136 — ReadPartitions equivalent. */
trait KafkaAdmin {
  /** (topic, partitionId) pairs across the cluster */
  def topicPartitions(): Seq[(String, Int)]
}

object KafkaExtractor extends Extractor {
  val info: PluginInfo = PluginInfo("kafka",
    "Extract Topic assets (partition counts) from a Kafka cluster",
    sampleConfig = "broker: host:9092", tags = Seq("stream", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "broker")

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: KafkaAdmin) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no KafkaAdmin client configured (offline container: inject via config key 'client')")))
    }
    val broker = config.getOrElse("broker", "kafka").toString
    // group by topic, count partitions; skip internal __topics (kafka.go:111-121)
    val assets = client.topicPartitions()
      .groupBy(_._1).view.mapValues(_.size).toSeq
      .filterNot { case (topic, _) => topic.startsWith("__") }
      .sortBy(_._1)
      .map { case (topic, nParts) =>
        TopicAsset(
          resource = Resource(urn = Urn.resource("kafka", broker, topic),
            name = topic, service = "kafka", `type` = "topic"),
          profile = Some(TopicProfile(numberOfPartitions = nParts.toLong)))
      }
    assets.toDS().toDF()
  }
}

/** reference gcs/gcs.go:100-182 */
trait ObjectStoreClient {
  /** (bucket name, location, storage class, creation time) */
  def buckets(): Seq[(String, String, String, Timestamp)]
  /** (blob name, size bytes, creation time) per bucket */
  def blobs(bucket: String): Seq[(String, Long, Timestamp)]
}

object GcsExtractor extends Extractor {
  val info: PluginInfo = PluginInfo("gcs",
    "Extract Bucket assets (location, storage class, optional blob listing) from GCS",
    sampleConfig = "project_id: my-project\nextract_blob: true",
    tags = Seq("cloud", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "project_id")

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: ObjectStoreClient) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no ObjectStoreClient configured (offline container: inject via config key 'client')")))
    }
    val projectId = config.getOrElse("project_id", "gcs").toString
    val withBlobs = config.getOrElse("extract_blob", false).toString.toBoolean
    val assets = client.buckets().map { case (name, location, storageClass, created) =>
      BucketAsset(
        resource = Resource(urn = Urn.resource("gcs", projectId, name),
          name = name, service = "gcs", `type` = "bucket"),
        location = location,
        storageType = storageClass,
        blobs =
          if (withBlobs) client.blobs(name).map { case (bn, size, bCreated) =>
            Blob(urn = s"${Urn.resource("gcs", projectId, name)}/$bn",
              name = bn, source = "gcs", size = size,
              timestamps = Some(AssetTimestamps(createTime = Some(bCreated))))
          } else Nil,
        timestamps = Some(AssetTimestamps(createTime = Some(created))))
    }
    assets.toDS().toDF()
  }
}

/** reference bigtable/bigtable.go:129-134 */
trait BigtableAdmin {
  def instances(): Seq[String]
  def tables(instance: String): Seq[String]
  def columnFamilies(instance: String, table: String): Seq[String]
}

object BigtableExtractor extends Extractor {
  val info: PluginInfo = PluginInfo("bigtable",
    "Extract Table assets (column families as schema) from Bigtable instances",
    sampleConfig = "project_id: my-project", tags = Seq("cloud", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "project_id")

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: BigtableAdmin) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no BigtableAdmin client configured (offline container: inject via config key 'client')")))
    }
    val projectId = config.getOrElse("project_id", "bigtable").toString
    val assets = for {
      instance <- client.instances()
      table <- client.tables(instance)
    } yield TableAsset(
      resource = Resource(urn = Urn.table("bigtable", projectId, instance, table),
        name = table, service = "bigtable", `type` = "table"),
      schema = client.columnFamilies(instance, table).map(cf =>
        ColumnDef(name = cf, dataType = "column_family")))
    assets.toDS().toDF()
  }
}

/** reference redshift/redshift.go:154-193 — AWS Data API shape. */
trait RedshiftDataApi {
  def listDatabases(): Seq[String]
  def listTables(db: String): Seq[String]
  /** (column_name, data_type) pairs */
  def describeTable(db: String, table: String): Seq[(String, String)]
}

object RedshiftExtractor extends Extractor {
  /** reference redshift.go:29 */
  private val excludedDbs = Set("information_schema", "pg_catalog")

  val info: PluginInfo = PluginInfo("redshift",
    "Extract Table assets via the Redshift Data API (ListDatabases/ListTables/DescribeTable)",
    sampleConfig = "cluster_id: my-cluster\nidentifier: my-host",
    tags = Seq("cloud", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "cluster_id")

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: RedshiftDataApi) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no RedshiftDataApi client configured (offline container: inject via config key 'client')")))
    }
    val host = config.getOrElse("identifier",
      config.getOrElse("cluster_id", "redshift")).toString
    val assets = for {
      db <- client.listDatabases().filterNot(excludedDbs.contains)
      table <- client.listTables(db)
    } yield TableAsset(
      resource = Resource(urn = Urn.table("redshift", host, db, table),
        name = table, service = "redshift", `type` = "table"),
      schema = client.describeTable(db, table).map { case (n, t) =>
        ColumnDef(name = n, dataType = t)
      })
    assets.toDS().toDF()
  }
}

/** reference bigquery/bigquery.go — dataset/table iteration :124-173,
  * labels + partition field :192-195, preview :280-337, column profile
  * :386-411.
  */
trait BigQueryCatalog {
  def datasets(): Seq[String]
  def tables(dataset: String): Seq[String]
  /** table labels + the time-partitioning field (empty if none) */
  def tableInfo(dataset: String, table: String): (Map[String, String], String)
  /** the table's data as a DataFrame — previews and profiles run on Spark */
  def loadTable(spark: SparkSession, dataset: String, table: String): DataFrame
}

object BigQueryExtractor extends Extractor {
  val info: PluginInfo = PluginInfo("bigquery",
    "Extract Table assets with labels, partition field, preview rows and column profiles from BigQuery",
    sampleConfig =
      """project_id: my-project
        |include_column_profile: true
        |max_preview_rows: 30""".stripMargin,
    tags = Seq("cloud", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    if (config.contains("client")) Nil else requireKeys(config, "project_id")

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val client = config.get("client") match {
      case Some(c: BigQueryCatalog) => c
      case _ => throw new ConfigException(Seq(InvalidConfigError("client",
        "no BigQueryCatalog client configured (offline container: inject via config key 'client')")))
    }
    val projectId = config.getOrElse("project_id", "bigquery").toString
    val includeProfile = config.getOrElse("include_column_profile", false).toString.toBoolean
    val previewRows = config.getOrElse("max_preview_rows", 30).toString.toInt

    val assets = for {
      ds <- client.datasets()
      table <- client.tables(ds)
    } yield {
      val (labels, partitionField) = client.tableInfo(ds, table)
      val df = client.loadTable(spark, ds, table)
      val totalRows = df.count()

      // preview sanitization (bigquery.go:315-318): the reference serializes
      // the preview rows to JSON and substring-replaces every \\u0000
      // (unicode-NUL escape) with `null` — so embedded NULs anywhere inside a
      // cell are scrubbed, not just whole-NUL cells. Jackson (toJSON) escapes
      // control characters the same way, so the same post-serialize replace
      // reproduces the semantics exactly.
      val preview =
        if (previewRows > 0) {
          val json = df.limit(previewRows).toJSON.collect().mkString("[", ",", "]")
          Some(Preview(fields = df.columns.toSeq,
            rows = json.replace("\\u0000", "null")))
        } else None

      // ONE multi-aggregate profile pass for ALL columns — replaces the
      // reference's goroutine-per-column query fan-out (bigquery.go:237-254)
      val numericCols = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
      }.toSeq
      val profiles: Map[String, ColumnProfile] =
        if (includeProfile && numericCols.nonEmpty) {
          val row = ColumnProfiler.profile(df, numericCols).collect()(0)
          numericCols.map { c =>
            c -> ColumnProfile(
              min = Option(row.getAs[Any](s"${c}_min")).map(_.toString).getOrElse(""),
              max = Option(row.getAs[Any](s"${c}_max")).map(_.toString).getOrElse(""),
              avg = Option(row.getAs[Any](s"${c}_avg")).map(_.toString.toDouble).getOrElse(0.0),
              med = Option(row.getAs[Any](s"${c}_med")).map(_.toString.toDouble).getOrElse(0.0),
              unique = row.getAs[Long](s"${c}_unique"),
              count = row.getAs[Long](s"${c}_count"))
          }.toMap
        } else Map.empty

      TableAsset(
        resource = Resource(urn = Urn.table("bigquery", projectId, ds, table),
          name = table, service = "bigquery", `type` = "table"),
        profile = Some(TableProfile(totalRows = totalRows, partitionKey = partitionField)),
        schema = df.schema.fields.map(f =>
          ColumnDef(name = f.name, dataType = f.dataType.simpleString,
            isNullable = f.nullable, profile = profiles.get(f.name))).toSeq,
        preview = preview,
        properties = Properties(labels = labels))
    }
    assets.toDS().toDF()
  }
}
