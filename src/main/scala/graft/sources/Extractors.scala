package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._

import graft.model._
import graft.plugins._
import graft.operators.ColumnProfiler

/** Offline-capable extractors: csv and parquet.
  *
  * The csv extractor mirrors the reference's csv plugin (reference:
  * plugins/extractors/csv/csv.go:85-167): scan a file or directory for
  * `*.csv`, read the header row, and emit one Table asset per file whose
  * schema facet lists the column names. The parquet extractor generalizes
  * it with full schema/type introspection, row counts, column profiles
  * (one multi-aggregate pass — see ColumnProfiler), and a JSON preview
  * (reference bigquery preview semantics, bigquery.go:280-337).
  */
object CsvExtractor extends Extractor {
  val info: PluginInfo = PluginInfo("csv",
    "Extract a Table asset per CSV file (header row becomes the schema)",
    sampleConfig = "path: ./dir-or-file.csv", tags = Seq("file", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    requireKeys(config, "path")

  private def csvFiles(path: java.io.File): Seq[java.io.File] =
    if (path.isDirectory)
      path.listFiles().filter(_.getName.endsWith(".csv")).sortBy(_.getName).toSeq
    else Seq(path)

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val path = new java.io.File(config("path").toString)
    if (!path.exists())
      throw new ConfigException(Seq(InvalidConfigError("path", s"$path does not exist")))
    val assets = csvFiles(path).map { f =>
      // header-only read: one-row scan resolves the column names
      val df = spark.read.option("header", "true").csv(f.getPath)
      TableAsset(
        resource = Resource(
          // urn = bare file name, same as the reference (csv.go:116-122)
          urn = f.getName, name = f.getName, service = "csv", `type` = "table"),
        schema = df.schema.fields.map(fd =>
          ColumnDef(name = fd.name, dataType = fd.dataType.simpleString,
            isNullable = fd.nullable)).toSeq)
    }
    assets.toDS().toDF()
  }
}

object ParquetExtractor extends Extractor {
  val info: PluginInfo = PluginInfo("parquet",
    "Extract Table assets with schema, row counts, column profiles and preview from parquet",
    sampleConfig =
      """path: /data/table.parquet
        |include_column_profile: true
        |max_preview_rows: 30""".stripMargin,
    tags = Seq("file", "extractor"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    requireKeys(config, "path")

  def extract(spark: SparkSession, config: Map[String, Any]): DataFrame = {
    import spark.implicits._
    val path = config("path").toString
    val includeProfile = config.getOrElse("include_column_profile", false).toString.toBoolean
    val previewRows = config.getOrElse("max_preview_rows", 30).toString.toInt
    val df = spark.read.parquet(path)
    val totalRows = df.count()

    val numericCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq
    val profiles: Map[String, ColumnProfile] =
      if (includeProfile && numericCols.nonEmpty) {
        // ONE aggregate pass over all columns (vs the reference's
        // query-per-column goroutines, bigquery.go:237-254)
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

    val preview =
      if (previewRows > 0) {
        val rows = df.limit(previewRows).toJSON.collect().mkString("[", ",", "]")
        Some(Preview(fields = df.columns.toSeq, rows = rows))
      } else None

    val name = new java.io.File(path).getName.replaceAll("\\.parquet$", "")
    val asset = TableAsset(
      resource = Resource(urn = Urn.table("parquet", "local", "default", name),
        name = name, service = "parquet", `type` = "table"),
      profile = Some(TableProfile(totalRows = totalRows)),
      schema = df.schema.fields.map(f =>
        ColumnDef(name = f.name, dataType = f.dataType.simpleString,
          isNullable = f.nullable,
          profile = profiles.get(f.name))).toSeq,
      preview = preview)
    Seq(asset).toDS().toDF()
  }
}

/** Full extractor roster (reference: plugins/extractors/populate.go:4-29,
  * all 26, plus our parquet extractor).
  */
object Populate {
  def register(r: Registry[Extractor]): Unit = {
    r.register(CsvExtractor)
    r.register(ParquetExtractor)
    Dialects.all.foreach(d => r.register(new JdbcIntrospectionExtractor(d)))
    r.register(MongoExtractor)
    r.register(CassandraExtractor)
    r.register(CouchExtractor)
    r.register(ElasticExtractor)
    r.register(KafkaExtractor)
    r.register(GcsExtractor)
    r.register(BigtableExtractor)
    r.register(RedshiftExtractor)
    r.register(BigQueryExtractor)
    r.register(GithubExtractor)
    r.register(ShieldExtractor)
    r.register(GrafanaExtractor)
    r.register(SupersetExtractor)
    r.register(RedashExtractor)
    r.register(TableauExtractor)
    r.register(MetabaseExtractor)
    r.register(OptimusExtractor)
    r.register(graft.processors.DocumentsExtractor)
    // project additions: query-side surface of the stored retrieval
    // indexes (the ingest sinks' missing symmetry)
    r.register(Bm25SearchExtractor)
    r.register(AnnSearchExtractor)
    r.register(HybridSearchExtractor)
  }
}
