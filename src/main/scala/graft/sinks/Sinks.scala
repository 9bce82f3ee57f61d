package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.plugins._

/** Built-in sinks (reference roster: plugins/sinks/populate.go:4-9 —
  * console, file, http, kafka, compass, stencil).
  *
  * Asset metadata streams are KB-MB-sized, so push-style sinks (console,
  * single-file, http) intentionally run on the driver via
  * `toJSON.toLocalIterator` — constant memory, no collect() of the whole
  * frame. Data-sized writes (ndjson directories, kafka topics) go through
  * `DataFrameWriter`, which scales out.
  */

object ConsoleSink extends SinkPlugin {
  val info: PluginInfo = PluginInfo("console",
    "JSON-print every record to stdout", tags = Seq("sink"))

  /** reference: plugins/sinks/console/sink.go:43-60 */
  def sink(df: DataFrame, config: Map[String, Any]): Long = {
    var n = 0L
    df.toJSON.toLocalIterator().forEachRemaining { j => println(j); n += 1 }
    n
  }
}

object FileSink extends SinkPlugin {
  val info: PluginInfo = PluginInfo("file",
    "Write records as NDJSON or YAML to a single file",
    sampleConfig =
      """path: ./out.ndjson
        |format: ndjson
        |overwrite: true""".stripMargin,
    tags = Seq("sink"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] = {
    val missing = requireKeys(config, "path", "format")
    val badFormat = config.get("format").map(_.toString).filter(f =>
      f != "ndjson" && f != "yaml").map(f =>
      InvalidConfigError("format", s"unsupported format: $f"))
    missing ++ badFormat
  }

  /** reference: plugins/sinks/file/file.go:57-118 — ndjson or yaml, one
    * file, overwrite default true (file.go:22-26).
    */
  def sink(df: DataFrame, config: Map[String, Any]): Long = {
    val path = Paths.get(config("path").toString)
    val format = config.getOrElse("format", "ndjson").toString
    val overwrite = config.getOrElse("overwrite", true).toString.toBoolean
    if (path.getParent != null) Files.createDirectories(path.getParent)
    val opts =
      if (overwrite) Seq(StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      else Seq(StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    val out = Files.newBufferedWriter(path, StandardCharsets.UTF_8, opts: _*)
    var n = 0L
    try {
      if (format == "yaml") {
        val yaml = new org.yaml.snakeyaml.Yaml()
        df.toJSON.toLocalIterator().forEachRemaining { j =>
          val obj = yaml.load[Object](j) // JSON is a YAML subset
          out.write("- " + yaml.dump(obj).replace("\n", "\n  ").trim + "\n")
          n += 1
        }
      } else {
        df.toJSON.toLocalIterator().forEachRemaining { j =>
          out.write(j); out.write("\n"); n += 1
        }
      }
    } finally out.close()
    n
  }
}

/** HTTP poster indirection so tests (and the offline container) can swap
  * the transport (reference mirrors this with its httpClient interface,
  * compass/sink.go:43-45).
  */
trait HttpPoster {
  /** Returns the response status code. */
  def post(url: String, method: String, headers: Map[String, String], body: String): Int
}

object JdkHttpPoster extends HttpPoster {
  def post(url: String, method: String, headers: Map[String, String], body: String): Int = {
    val client = java.net.http.HttpClient.newHttpClient()
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .method(method, java.net.http.HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
  }
}

/** Per-sink record batching (reference: agent/batch.go:10-48, default size 1
  * at agent/agent.go:17; 0 = unbounded). Chunks the driver-side JSON record
  * iterator into the groups the agent would hand a reference sink's
  * `Sink(ctx, batch)` call. The HTTP-family sinks still POST one request
  * per record regardless of batch size (http.go:74-88 loops the batch;
  * same at compass/sink.go:79-98 and stencil.go:87) — batch_size is
  * iteration chunking only, never the wire shape (a JSON-array body would
  * be a shape meteor-compatible receivers never see). "Unbounded" (0)
  * therefore caps at a bounded chunk: with per-record posting there is no
  * observable difference, and buffering the whole frame driver-side would
  * be the same OOM cliff `toLocalIterator` exists to avoid.
  */
private[sinks] object Batching {
  private val UnboundedChunk = 1024

  def batches(df: DataFrame, batchSize: Int): Iterator[Seq[String]] = {
    import scala.jdk.CollectionConverters._
    val it = df.toJSON.toLocalIterator().asScala
    it.grouped(if (batchSize == 0) UnboundedChunk else batchSize)
  }

  def size(config: Map[String, Any]): Int =
    config.getOrElse("batch_size", 1).toString.toInt

  def validateSize(config: Map[String, Any]): Seq[InvalidConfigError] =
    try {
      if (size(config) < 0)
        Seq(InvalidConfigError("batch_size", "batch_size must be >= 0"))
      else Nil
    } catch {
      case _: NumberFormatException =>
        Seq(InvalidConfigError("batch_size", "batch_size must be an integer"))
    }
}

class HttpSink(poster: HttpPoster = JdkHttpPoster) extends SinkPlugin {
  val info: PluginInfo = PluginInfo("http",
    "POST records as JSON to a URL (batch_size records per request, 0 = all)",
    sampleConfig =
      """url: http://host/api
        |method: POST
        |success_code: 200
        |batch_size: 1""".stripMargin,
    tags = Seq("sink"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    requireKeys(config, "url") ++ Batching.validateSize(config)

  /** reference: plugins/sinks/http/http.go:74-131 — JSON per record;
    * success_code default 200; 5xx raises a retryable error
    * (http.go:123-128). Batching per agent/batch.go: batch_size records per
    * request (default 1 = the reference's per-record behavior).
    */
  def sink(df: DataFrame, config: Map[String, Any]): Long = {
    val url = config("url").toString
    val method = config.getOrElse("method", "POST").toString
    val successCode = config.getOrElse("success_code", 200).toString.toInt
    val batchSize = Batching.size(config)
    val headers = config.get("headers") match {
      case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v.toString }
      case _ => Map("Content-Type" -> "application/json")
    }
    var n = 0L
    Batching.batches(df, batchSize).foreach { batch =>
      batch.foreach { record =>
        val code = poster.post(url, method, headers, record)
        // success check FIRST (http.go:110-112): a 5xx success_code counts
        // as success, not as a retryable failure
        if (code != successCode) {
          if (code >= 500)
            throw new RetryableException(s"http sink: server error $code")
          throw new RuntimeException(s"http sink: unexpected status $code (want $successCode)")
        }
        n += 1
      }
    }
    n
  }
}

object KafkaSink extends SinkPlugin {
  val info: PluginInfo = PluginInfo("kafka",
    "Serialize records to a Kafka topic (protobuf asset payload; key from a dotted key_path)",
    sampleConfig =
      """brokers: host:9092
        |topic: assets
        |key_path: resource.urn
        |format: protobuf""".stripMargin,
    tags = Seq("sink"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] = {
    val badFormat = config.get("format").map(_.toString)
      .filter(f => f != "protobuf" && f != "json")
      .map(f => InvalidConfigError("format", s"unsupported format: $f"))
    requireKeys(config, "brokers", "topic") ++ badFormat
  }

  /** Build the (key, value) payload frame (reference:
    * plugins/sinks/kafka/sink.go:88-152). Value = the asset's protobuf
    * bytes (`proto.Marshal`, sink.go:110-116) via [[AssetProto.tableBytes]]
    * — per-row imperative encoding, so a typed `map` is the right tool;
    * non-Table frames (and `format: json`) fall back to full-record JSON.
    * Key = dotted-path field as UTF-8 (the reference's dynamic-proto key
    * needs a top-level string field, which the Table message doesn't have;
    * a plain string key is what partitioners consume anyway).
    */
  def payload(df: DataFrame, keyPath: Option[String],
              format: String = "protobuf"): DataFrame = {
    val all = struct(df.columns.toIndexedSeq.map(col): _*)
    val key = keyPath match {
      case Some(p) =>
        // dotted paths into struct columns resolve directly — serializing
        // the whole row to JSON per record just to read one field is pure
        // overhead; the JSON route stays as the fallback for paths that
        // aren't plain nested columns
        try df.col(p).cast("string")
        catch { case _: org.apache.spark.sql.AnalysisException =>
          get_json_object(to_json(all), "$." + p)
        }
      case None => lit(null).cast("string")
    }
    val protoEncoder =
      if (format == "protobuf") AssetProto.encoderFor(df.schema) else None
    protoEncoder match {
      case Some(encode) =>
        import org.apache.spark.sql.Encoders
        val enc = Encoders.tuple(Encoders.STRING, Encoders.BINARY)
        df.select(key.as("key"), all.as("asset"))
          .map((r: Row) => (r.getString(0), encode(r.getStruct(1))))(enc)
          .toDF("key", "value")
      case None =>
        df.select(key.as("key"), to_json(all).as("value"))
    }
  }

  def sink(df: DataFrame, config: Map[String, Any]): Long = {
    val out = payload(df, config.get("key_path").map(_.toString),
      config.getOrElse("format", "protobuf").toString)
    // ONE pass: Observation counts rows inside the write action itself —
    // kafka writes exactly one message per input row, so this is the sunk
    // record count with no second scan (a trailing df.count() would
    // re-execute the whole upstream pipeline when the frame isn't the
    // agent-persisted one)
    val obs = org.apache.spark.sql.Observation()
    // output_format is a test seam (same convention as the jdbc family's
    // `runner` injection): this container has no kafka connector jars, so
    // tests write "noop"; format("kafka") is the real path on a cluster
    // with spark-sql-kafka on the classpath
    out.observe(obs, count(lit(1)).as("n"))
      .write.format(config.getOrElse("output_format", "kafka").toString)
      .option("kafka.bootstrap.servers", config("brokers").toString)
      .option("topic", config("topic").toString)
      .mode("append")
      .save()
    obs.get("n").asInstanceOf[Long]
  }
}

class CompassSink(poster: HttpPoster = JdkHttpPoster) extends SinkPlugin {
  val info: PluginInfo = PluginInfo("compass",
    "PATCH assets into a Compass catalog, lineage included",
    sampleConfig =
      """host: http://compass
        |labels:
        |  team: $properties.attributes.team""".stripMargin,
    tags = Seq("sink"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    requireKeys(config, "host") ++ Batching.validateSize(config)

  /** Compass payload: urn/type/name/service/description + data + labels,
    * upstreams/downstreams from the lineage facet (reference:
    * plugins/sinks/compass/sink.go:143-197). Label values support
    * `$properties.attributes.X` / `$properties.labels.X` templating
    * (sink.go:222-300).
    */
  def payload(df: DataFrame, labelTemplates: Map[String, String]): DataFrame = {
    val full = to_json(struct(df.columns.toIndexedSeq.map(col): _*))
    // label templates resolve against the PROPERTIES facet: attributes is
    // a JSON-string column (queried with get_json_object), labels a map
    // (sink.go:222-300); non-$ values are literals
    val labelCols = labelTemplates.toSeq.sortBy(_._1).map { case (k, tpl) =>
      val v = tpl match {
        case t if t.startsWith("$properties.attributes.") =>
          get_json_object(col("properties.attributes"),
            "$." + t.stripPrefix("$properties.attributes."))
        case t if t.startsWith("$properties.labels.") =>
          element_at(col("properties.labels"), t.stripPrefix("$properties.labels."))
        case t if t.startsWith("$") =>
          get_json_object(full, "$." + t.stripPrefix("$"))
        case t => lit(t)
      }
      struct(lit(k).as("key"), v.as("value"))
    }
    val labels =
      if (labelCols.isEmpty) Nil
      else Seq(map_from_entries(array(labelCols: _*)).as("labels"))
    // labels are computed in the SAME projection — they reference the
    // asset columns, which no longer exist after this select
    df.select(Seq(
      col("resource.urn").as("urn"),
      col("resource.type").as("type"),
      col("resource.name").as("name"),
      col("resource.service").as("service"),
      col("resource.description").as("description"),
      full.as("data"),
      when(col("lineage").isNotNull, col("lineage.upstreams.urn"))
        .otherwise(array().cast("array<string>")).as("upstreams"),
      when(col("lineage").isNotNull, col("lineage.downstreams.urn"))
        .otherwise(array().cast("array<string>")).as("downstreams")) ++ labels: _*)
  }

  def sink(df: DataFrame, config: Map[String, Any]): Long = {
    val host = config("host").toString
    val labels = config.get("labels") match {
      case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v.toString }
      case _ => Map.empty[String, String]
    }
    val batchSize = Batching.size(config)
    var n = 0L
    Batching.batches(payload(df, labels), batchSize).foreach { batch =>
      batch.foreach { record =>
        val code = poster.post(s"$host/v1beta1/assets", "PATCH",
          Map("Content-Type" -> "application/json"), record)
        // compass/sink.go:124-138: 200 = success, 5xx retryable, else permanent
        if (code != 200) {
          if (code >= 500) throw new RetryableException(s"compass: server error $code")
          throw new RuntimeException(s"compass: unexpected status $code")
        }
        n += 1
      }
    }
    n
  }
}

class StencilSink(poster: HttpPoster = JdkHttpPoster) extends SinkPlugin {
  val info: PluginInfo = PluginInfo("stencil",
    "Upload table schemas as JSON-Schema or Avro to a Stencil registry",
    sampleConfig =
      """host: http://stencil
        |namespace_id: ns
        |format: json""".stripMargin,
    tags = Seq("sink"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] =
    requireKeys(config, "host", "namespace_id")

  /** Table assets only (stencil.go:88-91); urn dots→path
    * (stencil.go:151-176); format json|avro (stencil.go:120-148).
    */
  def sink(df: DataFrame, config: Map[String, Any]): Long = {
    val host = config("host").toString
    val ns = config("namespace_id").toString
    val format = config.getOrElse("format", "json").toString
    var n = 0L
    // schema documents are built from each asset's column facet — streamed
    // one partition at a time like every driver-side sink (never collect():
    // a pathological asset count must not OOM the driver)
    val rows = df.select(col("resource.urn"), col("resource.name"),
        col("schema.name"), col("schema.dataType"), col("schema.isNullable"))
      .toLocalIterator()
    rows.forEachRemaining { r =>
      val rawUrn = r.getString(0)
      val tableName = r.getString(1)
      // schema id = urn with ONLY '/' dotted — '::' stays (stencil.go:157)
      val schemaId = rawUrn.replace("/", ".")
      val cols = r.getSeq[String](2)
        .lazyZip(r.getSeq[String](3)).lazyZip(r.getSeq[Boolean](4)).toSeq
      // payloads mirror stencil.go:119-148: json $id = urn + ".json",
      // title = table name; avro record name = table name, namespace = ns
      val body =
        if (format == "avro") SchemaFormats.columnsToAvroSchema(cols, tableName, ns)
        else SchemaFormats.columnsToJsonSchema(cols, rawUrn + ".json", tableName)
      // json schemas carry the compatibility header (stencil.go:164-166)
      val headers = Map("Content-Type" -> "application/json") ++
        (if (format == "json") Map("X-Compatibility" -> "COMPATIBILITY_UNSPECIFIED")
         else Map.empty)
      val code = poster.post(s"$host/v1beta1/namespaces/$ns/schemas/$schemaId",
        "POST", headers, body)
      // stencil.go:173-187: 201 Created = success, 5xx retryable, else
      // permanent
      if (code != 201) {
        if (code >= 500) throw new RetryableException(s"stencil: server error $code")
        throw new RuntimeException(s"stencil: unexpected status $code")
      }
      n += 1
    }
    n
  }
}

/** bm25-index: terminal write of the incoming rows into the engine's
  * stored BM25 postings layout ([[graft.operators.Retrieval.Bm25Store]])
  * — the retrieval-index sibling of the fingerprint/LSH indexes the
  * curation gates build, so a YAML recipe can displace index building to
  * ingest (`documents → gates → bm25-index`, then every query scores the
  * frozen store). First batch at an empty `index_path` builds the store;
  * later batches FOLD IN via [[graft.operators.Retrieval.mergeBm25StoreAt]]
  * (postings append, df/stats integer adds — historical text is never
  * re-read), so the indexed corpus only ever widens.
  *
  * Concurrency contract: the index is SINGLE-WRITER, like
  * [[graft.processors.CurationProcessors.DedupGate]] — the merge is a
  * read-then-replace of the two small stats tables with no atomic
  * check-and-swap on a parquet directory, so run one ingest recipe per
  * index. Batches must carry ids DISJOINT from the store (the
  * arriving-batch contract every incremental gate shares); chain a
  * `dedup-gate` upstream when re-deliveries are possible.
  */
object Bm25IndexSink extends SinkPlugin {
  val info: PluginInfo = PluginInfo("bm25-index",
    "Build or incrementally extend a stored BM25 postings index from the incoming rows (mode: forget erases them instead)",
    sampleConfig =
      """index_path: /indexes/bm25
        |id_column: doc_id
        |text_column: text
        |buckets: 16
        |# after a `chunk` processor: pack (id, chunk) into one index key
        |# chunk_id_column: chunk_id
        |# mode: forget   # rows are TOMBSTONES: erase their ids in place""".stripMargin,
    tags = Seq("sink", "curation", "retrieval"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] = {
    val badMode = config.get("mode").map(_.toString)
      .filter(m => m != "ingest" && m != "forget")
      .map(m => InvalidConfigError("mode", s"unsupported mode: $m"))
    requireKeys(config, "index_path") ++ badMode
  }

  /** mode: forget — the incoming rows are TOMBSTONES (only `id_column`
    * is read): erase them from the store in place, right-to-erasure on
    * the recipe surface (`tombstones.parquet → bm25-index(mode:
    * forget)`). Layout dispatch mirrors the ingest side: fielded via the
    * config flag, chunk grain erases by PARENT doc id through the cid
    * sidecar. Returns the tombstone count processed.
    */
  private def forget(df: DataFrame, config: Map[String, Any]): Long = {
    val spark = df.sparkSession
    val path = config("index_path").toString
    val idc = config.getOrElse("id_column", "doc_id").toString
    // layout from the STORE, never the forget recipe's config: the
    // ingest froze fielded/chunk grain in _graft_index_config precisely
    // so a later batch cannot mis-specify them, and a GDPR recipe is
    // exactly such a later batch — trusting its flags would dispatch
    // the wrong forget (loud since the layout sniff in Retrieval, but
    // needlessly so). Fielded ⟺ no dfreq table; chunk grain and bits
    // come from the frozen config, falling back to the recipe keys for
    // library-built stores that carry no config file.
    val fielded = !graft.operators.Retrieval.isPlainBm25StoreAt(spark, path)
    val frozen = storedLayoutConfig(spark, path)
    val chunked = frozen.map(_.contains("chunk_grain=true")).getOrElse(
      config.contains("chunk_id_column") ||
        config.getOrElse("chunk_grain", false).toString.toBoolean)
    val bits = frozen.flatMap(
        _.split(",").find(_.startsWith("chunk_bits="))
          .map(_.stripPrefix("chunk_bits=").toInt))
      .getOrElse(config.getOrElse("chunk_id_bits", 20).toString.toInt)
    val tomb = df.select(org.apache.spark.sql.functions.col(idc))
      .localCheckpoint()
    val n = tomb.count()
    if (n == 0) return 0L
    if (chunked)
      graft.operators.Retrieval.forgetBm25ChunkStoreAt(spark, path, tomb,
        idc, chunkIdBits = bits)
    else if (fielded)
      graft.operators.Retrieval.forgetBm25fStoreAt(spark, path, tomb, idc)
    else
      graft.operators.Retrieval.forgetBm25StoreAt(spark, path, tomb, idc)
    n
  }

  private def storedLayoutConfig(spark: org.apache.spark.sql.SparkSession,
                                 path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_graft_index_config")
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      None
    else Some(spark.read.parquet(s"$path/_graft_index_config")
      .head().getString(0))
  }

  def sink(df: DataFrame, config: Map[String, Any]): Long = {
    if (config.getOrElse("mode", "ingest").toString == "forget")
      return forget(df, config)
    val spark = df.sparkSession
    val path = config("index_path").toString
    val idc = config.getOrElse("id_column", "doc_id").toString
    val tc = config.getOrElse("text_column", "text").toString
    val buckets = config.getOrElse("buckets", 16).toString.toInt
    // chunk-grain composition (`documents → chunk → bm25-index`): the
    // chunk processor emits (id, chunk_id) at chunk grain; pack them
    // into the engine's cid convention (id·2^bits + chunk, parent =
    // cid >> bits) so the indexed key matches what hard-negative mining
    // and chunk retrieval expect — the d_chunk_bm25 id space
    val chunkCol = config.get("chunk_id_column").map(_.toString)
    val bits = config.getOrElse("chunk_id_bits", 20).toString.toInt
    val keyCol = chunkCol.map(_ => "cid").getOrElse(idc)
    val keyed = chunkCol match {
      // cast the id to LONG before shifting: an IntegerType id column
      // would wrap at ids >= 2^(31-bits) (2048 at the default 20 bits),
      // silently colliding different docs' chunk keys
      case Some(cc) => df.withColumn("cid",
        org.apache.spark.sql.functions.shiftleft(
          org.apache.spark.sql.functions.col(idc).cast("long"), bits) +
          org.apache.spark.sql.functions.col(cc))
      case None => df
    }
    // one materialization serves the count and both index aggregates
    val batch = keyed.localCheckpoint()
    val n = batch.count()
    // fielded: true builds/extends the BM25F layout instead (title
    // window from title_tokens; field weights stay query-time knobs)
    val fielded = config.getOrElse("fielded", false).toString.toBoolean
    val titleTokens = config.getOrElse("title_tokens", 8).toString.toInt
    // a marked store refuses BEFORE the dispatch: a crash mid-merge may
    // have destroyed the stats _SUCCESS this dispatch keys on, and the
    // build branch would then static-overwrite away all history
    IndexProtocol.refuseIfMergePending(spark, path)
    // the stats table is written last on both paths, so its _SUCCESS
    // marker is the store's commit signal (the indexExists discipline)
    val exists =
      graft.processors.CurationProcessors.indexExists(spark, s"$path/stats")
    val layoutCfg = s"fielded=$fielded,title_tokens=$titleTokens," +
      s"buckets=$buckets,chunk_grain=${chunkCol.isDefined},chunk_bits=$bits"
    (fielded, exists) match {
      case (false, false) =>
        graft.operators.Retrieval.writeBm25Store(batch, keyCol, tc, path,
          buckets)
        IndexProtocol.writeLayoutConfig(spark, path, layoutCfg)
      case (false, true) =>
        val adopt = IndexProtocol.checkLayoutConfig(spark, path, layoutCfg)
        // the merge acquires the pending marker INTERNALLY (staged — a
        // plan-time failure releases it), so direct library merges get
        // the same protection as the sink path
        graft.operators.Retrieval.mergeBm25StoreAt(spark, path, batch,
          keyCol, tc, buckets)
        // pre-protocol stores adopt the batch's config only once a merge
        // under it actually succeeded
        if (adopt) IndexProtocol.writeLayoutConfig(spark, path, layoutCfg)
      case (true, false) =>
        graft.operators.Retrieval.writeBm25fStore(batch, keyCol, tc, path,
          titleTokens, buckets)
        IndexProtocol.writeLayoutConfig(spark, path, layoutCfg)
      case (true, true) =>
        val adopt = IndexProtocol.checkLayoutConfig(spark, path, layoutCfg)
        graft.operators.Retrieval.mergeBm25fStoreAt(spark, path, batch,
          keyCol, tc, titleTokens, buckets)
        if (adopt) IndexProtocol.writeLayoutConfig(spark, path, layoutCfg)
    }
    n
  }
}

/** The two parquet-has-no-transactions mitigations shared by the index
  * sinks. Neither makes a multi-file mutation atomic — nothing on a
  * plain object store can — but together they turn the silent failure
  * modes into loud ones:
  *
  *  - A MERGE/APPEND that died between its writes must never be
  *    retried blindly (the postings-append half would run twice and
  *    double every tf it carries, breaking merged ≡ rebuild with no
  *    error). [[withMergePending]] drops a `_graft_merge_pending`
  *    marker for the duration of the mutation; a sink invocation that
  *    finds a stale marker REFUSES with a rebuild instruction instead
  *    of corrupting the store. Build paths need no marker: they are
  *    static overwrites, and their commit signal (stats/codebook
  *    written last) means a half-built store simply rebuilds.
  *
  *  - A later batch run with DIFFERENT layout parameters (fielded flag,
  *    title window, chunk grain/bits, buckets) would merge components
  *    computed under another geometry — silently wrong scores.
  *    [[writeLayoutConfig]] freezes the build-time parameters in the
  *    store; [[checkLayoutConfig]] rejects a mismatched merge loudly.
  *    Stores written before this protocol (no config file) adopt the
  *    current batch's config on their next successful merge.
  */
private[sinks] object IndexProtocol {
  private def fs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The stale-marker refusal, checked BEFORE any branch dispatch: a
    * crash mid-merge can destroy the store's commit signal (the merge
    * overwrites the very table whose _SUCCESS the build/merge dispatch
    * keys on), flipping the next run onto the BUILD branch — which
    * would static-overwrite away all history. Every sink invocation
    * against a marked store must refuse, whichever branch it was about
    * to take. Delegates to [[graft.operators.Layout.refuseIfPending]] —
    * one marker protocol for every store mutation (merge, grow, forget).
    */
  def refuseIfMergePending(spark: org.apache.spark.sql.SparkSession,
                           path: String): Unit =
    graft.operators.Layout.refuseIfPending(spark, path)

  /** Atomic pending-marker acquire around a merge — see
    * [[graft.operators.Layout.withPendingMarker]]. */
  def withMergePending[A](spark: org.apache.spark.sql.SparkSession,
                          path: String)(body: => A): A =
    graft.operators.Layout.withPendingMarker(spark, path)(body)

  def writeLayoutConfig(spark: org.apache.spark.sql.SparkSession,
                        path: String, cfg: String): Unit = {
    import spark.implicits._
    Seq(cfg).toDF("cfg").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_graft_index_config")
  }

  /** Reject a merge whose batch is configured with a different layout
    * than the store was built with. Returns true when the store
    * PREDATES the protocol (no config file): the caller adopts the
    * batch's config by writing it AFTER its merge completes — stamping
    * it up front would freeze a possibly mismatched geometry as
    * official even when the merge refuses or dies.
    */
  def checkLayoutConfig(spark: org.apache.spark.sql.SparkSession,
                        path: String, cfg: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_graft_index_config")
    if (!fs(spark, path).exists(p)) return true
    val stored = spark.read.parquet(s"$path/_graft_index_config")
      .head().getString(0)
    require(stored == cfg,
      s"$path was built with layout ($stored) but this batch is " +
        s"configured ($cfg) — merging mixed geometries silently corrupts " +
        "scores. Align the recipe config or rebuild the index.")
    false
  }
}

/** ivf-index: terminal write of the incoming (id, vector) rows into the
  * engine's centroid-partitioned ANN layout — the vector-search sibling
  * of [[Bm25IndexSink]], so a YAML recipe can displace vector-index
  * building to ingest (`embeddings → ivf-index`, then every query probes
  * the frozen store). First batch at an empty `index_path` auto-sizes
  * the codebook from the data (C = √N, blind — the
  * [[graft.operators.Similarity.autoTwoLevelCodebook]] policy) and
  * persists it INSIDE the store
  * ([[graft.operators.Similarity.writeCodebookAt]]); later batches
  * reload that frozen codebook from disk and APPEND — assignment is
  * O(2√C·d) per row against the reloaded centroids, historical
  * directories are never read or rewritten, and any micro-batching of
  * the ingest stream lands identical rows (the append-parity contract).
  *
  * `two_level: true` (default) builds the past-the-clamp hierarchical
  * layout — on disk indistinguishable from a flat store, probes stay
  * directory-pruned, and C tracks √N to ~4.3B vectors; `two_level:
  * false` opts into the flat codebook (clamped at 4096 centroids — the
  * regime where a flat literal-array assignment is still cheap).
  * `grow: true` additionally runs one
  * [[graft.operators.Similarity.splitHotChildrenAt]] round after each
  * append (two-level only): children above `max_share_pct` split in
  * place — only affected tops' directories rewrite — and the GROWN
  * codebook is persisted back, so the index keeps the share audit's
  * balance as the corpus widens without ever re-laying-out.
  *
  * Concurrency contract: SINGLE-WRITER per index, like [[Bm25IndexSink]]
  * (append + codebook replace have no atomic check-and-swap); batches
  * must carry ids DISJOINT from the store — chain a `dedup-gate`
  * upstream when re-deliveries are possible. The codebook parquet is
  * written LAST on the build path, so its _SUCCESS marker is the
  * store's commit signal (the indexExists discipline).
  */
object IvfIndexSink extends SinkPlugin {
  val info: PluginInfo = PluginInfo("ivf-index",
    "Build or incrementally extend a centroid-partitioned ANN vector index from the incoming rows",
    sampleConfig =
      """index_path: /indexes/ivf
        |id_column: vec_id
        |vector_column: embedding
        |two_level: true
        |max_share_pct: 5.0
        |# meta_columns: [label, lang]
        |#                # carry metadata columns alongside each vector,
        |#                # so ann-search can PRE-filter candidates
        |#                # (filter: "label <= 3") — raw stores only;
        |#                # appends derive the set from the store itself
        |# grow: true     # split hot children in place after each append
        |# mode: forget   # rows are TOMBSTONES: erase their ids in place
        |# quantize: pq   # store 8-byte PQ codes (pq_m: 8, pq_k: 16)
        |#                # routed by the two-level hierarchy
        |# rerank_store_path: /indexes/ivf_vectors
        |#                # with quantize: pq — ALSO write the exact
        |#                # vectors id-partitioned, so ann-search can
        |#                # re-rank the ADC shortlist. The store RECORDS
        |#                # this linkage: mode: forget cascades to the
        |#                # sidecar automatically and ann-search defaults
        |#                # to it, so later recipes may omit the key""".stripMargin,
    tags = Seq("sink", "curation", "similarity"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] = {
    // grow runs split rounds over the two-level hierarchy only — on the
    // flat layout it would silently no-op, so the unsupported combination
    // fails at recipe lint time, not as an index that quietly stops
    // rebalancing
    val growFlat =
      if (config.getOrElse("grow", false).toString.toBoolean &&
          !config.getOrElse("two_level", true).toString.toBoolean)
        Seq(InvalidConfigError("grow",
          "grow: true requires two_level: true (the flat layout has no " +
            "split path — drop grow or switch to the two-level layout)"))
      else Nil
    val badMode = config.get("mode").map(_.toString)
      .filter(m => m != "ingest" && m != "forget")
      .map(m => InvalidConfigError("mode", s"unsupported mode: $m"))
    val badQuant = config.get("quantize").map(_.toString)
      .filter(q => q != "none" && q != "pq")
      .map(q => InvalidConfigError("quantize", s"unsupported quantize: $q"))
    val pqConflicts =
      if (config.getOrElse("quantize", "none").toString == "pq") {
        val flat = config.get("two_level").map(_.toString.toBoolean)
          .contains(false)
        val grow = config.getOrElse("grow", false).toString.toBoolean
        (if (flat) Seq(InvalidConfigError("two_level",
          "quantize: pq always routes through the two-level hierarchy"))
         else Nil) ++
        (if (grow) Seq(InvalidConfigError("grow",
          "grow is unsupported on a codes store (splits re-assign raw " +
            "vectors, which PQ codes no longer carry)"))
         else Nil) ++
        (if (config.contains("meta_columns")) Seq(InvalidConfigError(
          "meta_columns",
          "meta_columns pairs with raw-vector stores only (PQ codes " +
            "rows carry no filterable attributes — drop quantize or " +
            "drop meta_columns)"))
         else Nil)
      } else Nil
    // the rerank store only pairs with a codes layout: a raw-vector
    // store re-ranks against itself, so the key on a non-pq recipe is a
    // config mistake (likely a quantize: pq line lost in an edit)
    val rerankRaw =
      if (config.contains("rerank_store_path") &&
          config.getOrElse("quantize", "none").toString != "pq" &&
          config.getOrElse("mode", "ingest").toString != "forget")
        Seq(InvalidConfigError("rerank_store_path",
          "rerank_store_path pairs with quantize: pq (raw-vector stores " +
            "re-rank against their own exact vectors)"))
      else Nil
    requireKeys(config, "index_path") ++ growFlat ++ badMode ++ badQuant ++
      pqConflicts ++ rerankRaw
  }

  def sink(df: DataFrame, config: Map[String, Any]): Long = {
    import graft.operators.Similarity
    val spark = df.sparkSession
    val path = config("index_path").toString
    val idc = config.getOrElse("id_column", "vec_id").toString
    // mode: forget — rows are TOMBSTONES (only id_column read): erase
    // them from the vector store in place via the sidecar-located
    // per-directory compaction. Right-to-erasure on the recipe surface.
    if (config.getOrElse("mode", "ingest").toString == "forget") {
      val tomb = df.select(org.apache.spark.sql.functions.col(idc))
        .localCheckpoint()
      val n = tomb.count()
      if (n > 0) {
        // a codes store's exact-vector sidecar must forget the same ids —
        // erasure that leaves the raw vector fetchable by every re-rank
        // is no erasure at all. The store's own recorded linkage drives
        // the cascade (resolveRerankLink): a forget recipe that omits the
        // key still erases the sidecar, a key contradicting the record
        // refuses, and a recorded-but-unreachable sidecar refuses BEFORE
        // the codes mutate (all-or-nothing posture — "codes erased,
        // vectors kept" must never read as success). Only stores
        // predating the linkage record fall back to the explicit key.
        val isPq2 = graft.processors.CurationProcessors.indexExists(spark,
          s"$path/_graft_pq2/subs/_graft_codebook")
        val explicit = config.get("rerank_store_path").map(_.toString)
        val rerank =
          if (isPq2) Similarity.resolveRerankLink(spark, path, explicit)
          else explicit
        // codes first, then vectors: the crash window leaves orphan
        // vectors (never shortlisted — harmless until the re-run
        // completes them) rather than codes whose re-rank silently drops
        Similarity.forgetIvfStoreAt(spark, path, tomb, idc)
        rerank.foreach { rp =>
          Similarity.forgetVectorStoreAt(spark, rp, tomb, idc)
        }
      }
      return n
    }
    val vc = config.getOrElse("vector_column", "embedding").toString
    val twoLevel = config.getOrElse("two_level", true).toString.toBoolean
    val maxShare = config.getOrElse("max_share_pct", 5.0).toString.toDouble
    val grow = config.getOrElse("grow", false).toString.toBoolean
    val quantizePq = config.getOrElse("quantize", "none").toString == "pq"
    require(!(grow && !twoLevel),
      "ivf-index: grow: true requires two_level: true")
    // meta_columns: raw stores may carry filterable attribute columns so
    // ann-search can PRE-filter candidates (`filter:`). Builds freeze the
    // configured set into the layout; appends derive the set from the
    // STORE's own schema (the frozen-geometry authority — a recipe must
    // not be able to append ragged rows) and refuse a contradicting key.
    val metaCfg: Seq[String] = config.get("meta_columns").map {
      case l: java.util.List[_] =>
        scala.jdk.CollectionConverters.ListHasAsScala(l).asScala
          .map(_.toString.trim).filter(_.nonEmpty).toSeq
      // the recipe reader hands plugins SCALA collections — a toString
      // fall-through would silently parse "List(label)"
      case l: Iterable[_] => l.map(_.toString.trim).filter(_.nonEmpty).toSeq
      case s => s.toString.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }.getOrElse(Nil)
    // validate() covers recipes; direct sink() calls must refuse too —
    // silently ignoring the meta request would be worse than the error
    require(!(quantizePq && metaCfg.nonEmpty),
      "ivf-index: meta_columns pairs with raw-vector stores only (PQ " +
        "codes rows carry no filterable attributes)")
    val metaEff: Seq[String] =
      if (quantizePq) Nil
      else if (graft.processors.CurationProcessors.indexExists(spark,
          s"$path/_graft_codebook")) {
        val stored = Similarity.storeMetaCols(spark, path, idc, vc)
        require(metaCfg.isEmpty || metaCfg.toSet == stored.toSet,
          s"$path carries metadata columns [${stored.mkString(",")}] but " +
            s"this batch is configured [${metaCfg.mkString(",")}] — " +
            "ragged appends silently break filtered search. Align " +
            "meta_columns with the store or drop the key (appends adopt " +
            "the store's own set).")
        stored
      } else metaCfg
    // one materialization serves the count, the codebook sizing scans,
    // and the assignment pass — meta columns ride IN it, so the meta
    // path pays no second checkpoint of the vector payload
    val batch = df.select((Seq(idc, vc) ++ metaEff)
      .map(org.apache.spark.sql.functions.col): _*).localCheckpoint()
    val n = batch.count()
    // an empty batch is a no-op, not a degenerate build: auto-sizing a
    // codebook from zero rows has no geometry to freeze (and streaming
    // recipes deliver empty micro-batches routinely)
    if (n == 0) return 0L
    // marked store ⇒ refuse before the dispatch (the Bm25IndexSink
    // rationale: a crashed merge can have destroyed the codebook commit
    // signal this dispatch keys on)
    IndexProtocol.refuseIfMergePending(spark, path)
    // quantize: pq — the billion-vector layout on the YAML surface: PQ
    // codes routed by the two-level hierarchy. First batch trains the m
    // subquantizers on a bounded deterministic sample and auto-sizes the
    // router, persisting BOTH geometries inside the store
    // (writePq2CodebooksAt — the commit signal); later batches reload
    // the frozen pair and append codes. Erasure (mode: forget above)
    // composes unchanged through the id sidecar.
    // the raw and pq2 layouts carry DISJOINT commit signals
    // (_graft_codebook vs _graft_pq2/...), so a quantize flag flipped
    // against an existing store would sail into the BUILD branch and
    // static-overwrite away the history — cross-check the OTHER
    // layout's signal before any dispatch and refuse loudly instead
    val rawExists = graft.processors.CurationProcessors.indexExists(spark,
      s"$path/_graft_codebook")
    val pq2Exists = graft.processors.CurationProcessors.indexExists(spark,
      s"$path/_graft_pq2/subs/_graft_codebook")
    if (config.getOrElse("quantize", "none").toString == "pq") {
      require(!rawExists,
        s"$path holds a RAW vector store — a quantize: pq batch cannot " +
          "merge into it (codes and vectors are different layouts). " +
          "Drop quantize or point the recipe at a fresh index_path.")
      val m = config.getOrElse("pq_m", 8).toString.toInt
      val kk = config.getOrElse("pq_k", 16).toString.toInt
      // rerank_store_path: write the batch's EXACT vectors into the
      // id-partitioned re-rank layout alongside the codes — what makes
      // the codes store queryable from ann-search (ADC shortlists must
      // re-rank against full-precision vectors the codes no longer carry)
      val rerank = config.get("rerank_store_path").map(_.toString)
      if (!pq2Exists) {
        val sample = Similarity.normalized(
            batch.select(org.apache.spark.sql.functions.col(idc),
              org.apache.spark.sql.functions.col(vc).cast("array<double>")
                .as("__u")), "__u")
          .orderBy(org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col(idc)),
            org.apache.spark.sql.functions.col(idc))
          .limit(4096).select(org.apache.spark.sql.functions.col("__u"))
          .collect().map(_.getSeq[Double](0).toSeq).toSeq
        val codebooks = Similarity.pqTrain(sample, m, kk)
        val cb = Similarity.autoTwoLevelCodebook(batch, idc, vc,
          maxSharePct = maxShare)
        // vectors BEFORE codes (orphan vectors are never shortlisted —
        // harmless; codes whose vectors are missing silently vanish at
        // re-rank), linkage record BEFORE the codebook commit signal —
        // a committed store always knows whether a sidecar pairs with it
        rerank.foreach(rp =>
          Similarity.writeVectorStore(batch, idc, vc, rp))
        Similarity.writePqStoreTwoLevel(batch, idc, vc, cb, codebooks, path)
        Similarity.writeRerankLinkAt(spark, path, rerank)
        Similarity.writePq2CodebooksAt(spark, path, cb, codebooks)
      } else {
        val (cb, codebooks) = Similarity.readPq2CodebooksAt(spark, path)
        // the store's recorded linkage drives the pairing: a key that
        // contradicts the record refuses, a linked-but-unreachable
        // sidecar refuses, and on a linked store an append may OMIT the
        // key (the record wins) — appended vectors still land in the
        // sidecar, so history never silently diverges from it
        val link = Similarity.rerankLinkAt(spark, path)
        val effRerank = Similarity.resolveRerankLink(spark, path, rerank)
        // stores predating the linkage record keep the original guard:
        // a rerank store bolted on AFTER history landed would silently
        // miss every historical vector at re-rank time — refuse; it must
        // ride along from the first batch (or the index rebuilds)
        if (link.isEmpty) rerank.foreach { rp =>
          require(Similarity.vectorStoreExistsAt(spark, rp),
            s"$rp is not an initialized vector store but $path already " +
              "holds history — a rerank store started mid-stream would " +
              "silently miss the historical vectors. Rebuild the index " +
              "with rerank_store_path set from the first batch.")
        }
        IndexProtocol.withMergePending(spark, path) {
          // vectors BEFORE codes (the build-path rationale: a crash
          // between the two must strand harmless orphan vectors, never
          // committed codes whose exact vectors the re-rank cannot fetch)
          effRerank.foreach(rp =>
            Similarity.appendVectorStore(batch, idc, vc, rp))
          Similarity.appendPqStoreTwoLevel(batch, idc, vc, cb, codebooks,
            path)
          // adopt the linkage onto a pre-record store once a batch names
          // the sidecar and the guard above proved it initialized —
          // POSITIVE knowledge only (an append that merely omits the key
          // must not freeze "no sidecar" for a store that may have one)
          if (link.isEmpty && rerank.isDefined)
            Similarity.writeRerankLinkAt(spark, path, rerank)
        }
      }
      return n
    }
    require(!pq2Exists,
      s"$path holds a PQ-CODES store — a raw-vector batch cannot merge " +
        "into it. Set quantize: pq (matching the store) or point the " +
        "recipe at a fresh index_path.")
    (twoLevel, rawExists) match {
      case (true, false) =>
        val cb = Similarity.writeIvfStoreTwoLevelAuto(batch, idc, vc, path,
          maxSharePct = maxShare, metaCols = metaEff)
        Similarity.writeCodebookAt(spark, path, cb)
      case (true, true) =>
        val cb = Similarity.readTwoLevelCodebookAt(spark, path)
        IndexProtocol.withMergePending(spark, path) {
          Similarity.appendIvfStoreTwoLevel(batch, idc, vc, cb, path,
            metaCols = metaEff)
          // persistTo writes the grown codebook BEFORE the directory
          // rewrite (inside the split op), so a crash mid-grow never
          // leaves rows in directories no persisted codebook names
          if (grow)
            Similarity.splitHotChildrenAt(spark, path, idc, vc, cb,
              maxShare, persistTo = Some(path))
        }
      case (false, false) =>
        val coarse = Similarity.writeIvfStoreAuto(batch, idc, vc, path,
          maxSharePct = maxShare, metaCols = metaEff)
        Similarity.writeCodebookAt(spark, path, coarse)
      case (false, true) =>
        val coarse = Similarity.readCoarseCodebookAt(spark, path)
        IndexProtocol.withMergePending(spark, path) {
          Similarity.appendIvfStore(batch, idc, vc, coarse, path,
            metaCols = metaEff)
        }
    }
    n
  }
}

/** winnow-index: terminal write of the incoming rows' winnowed span
  * fingerprints into the ERASABLE refcounted winnow store — the index
  * half of the span-reuse (plagiarism) gate on the recipe surface. First
  * batch at an empty `index_path` builds the (fp, refs) + attribution
  * sidecar layout ([[graft.operators.Dedup.writeWinnowStoreAt]]); later
  * batches MERGE (refcount adds, sidecar appends — merged ≡ rebuild
  * spec-pinned). `mode: forget` treats the rows as TOMBSTONES (only
  * `id_column` read): refcounts decrement through the attribution
  * sidecar and fps at zero leave the gate
  * ([[graft.operators.Dedup.forgetWinnowStoreAt]]) — right-to-erasure
  * for the plagiarism gate in one YAML recipe. Same arriving-batch +
  * single-writer contract as [[Bm25IndexSink]]; mutations run under the
  * staged pending marker.
  */
object WinnowIndexSink extends SinkPlugin {
  val info: PluginInfo = PluginInfo("winnow-index",
    "Build or incrementally extend the refcounted span-fingerprint (plagiarism) index from the incoming rows (mode: forget erases them instead)",
    sampleConfig =
      """index_path: /indexes/winnow
        |id_column: doc_id
        |text_column: text
        |k: 4
        |w: 4
        |# mode: forget   # rows are TOMBSTONES: decrement their fps in place""".stripMargin,
    tags = Seq("sink", "curation", "dedup"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] = {
    val badMode = config.get("mode").map(_.toString)
      .filter(m => m != "ingest" && m != "forget")
      .map(m => InvalidConfigError("mode", s"unsupported mode: $m"))
    requireKeys(config, "index_path") ++ badMode
  }

  def sink(df: DataFrame, config: Map[String, Any]): Long = {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val path = config("index_path").toString
    val idc = config.getOrElse("id_column", "doc_id").toString
    if (config.getOrElse("mode", "ingest").toString == "forget") {
      val tomb = df.select(col(idc)).localCheckpoint()
      val n = tomb.count()
      if (n > 0) Dedup.forgetWinnowStoreAt(spark, path, tomb, idc)
      return n
    }
    val tc = config.getOrElse("text_column", "text").toString
    val k = config.getOrElse("k", 4).toString.toInt
    val w = config.getOrElse("w", 4).toString.toInt
    val batch = df.select(col(idc), col(tc)).localCheckpoint()
    val n = batch.count()
    if (n == 0) return 0L
    Dedup.mergeWinnowStoreAt(spark, path, batch, idc, tc, k, w)
    n
  }
}

/** nb-index: train or incrementally extend the stored NB classifier from
  * the incoming LABELED rows — the model-registry half of the `nb-filter`
  * processor, completing the trained-classifier lifecycle on the recipe
  * surface: train (first batch builds), extend (later batches merge —
  * count adds re-derived through the shared expressions, merged ≡
  * retrain), and UNLEARN (`mode: forget`). Forget-mode rows must carry
  * the erased docs' CONTENT (text + label): unlearning subtracts exactly
  * what the doc contributed, so run the model forget BEFORE erasing the
  * doc from the corpus. Same arriving-batch + single-writer contract as
  * every index sink; staged pending marker; base written LAST (commit).
  */
object NbIndexSink extends SinkPlugin {
  val info: PluginInfo = PluginInfo("nb-index",
    "Train or incrementally extend the stored NB classifier from the incoming labeled rows (mode: forget unlearns them instead)",
    sampleConfig =
      """index_path: /models/nb
        |id_column: doc_id
        |text_column: text
        |label_column: lang
        |# mode: forget   # rows are erased TRAIN DOCS (with text+label):
        |#                # subtract them from the model exactly""".stripMargin,
    tags = Seq("sink", "curation", "classify"))

  override def validate(config: Map[String, Any]): Seq[InvalidConfigError] = {
    val badMode = config.get("mode").map(_.toString)
      .filter(m => m != "ingest" && m != "forget")
      .map(m => InvalidConfigError("mode", s"unsupported mode: $m"))
    requireKeys(config, "index_path") ++ badMode
  }

  def sink(df: DataFrame, config: Map[String, Any]): Long = {
    import graft.operators.Classify
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val path = config("index_path").toString
    val idc = config.getOrElse("id_column", "doc_id").toString
    val tc = config.getOrElse("text_column", "text").toString
    val lc = config.getOrElse("label_column", "lang").toString
    val batch = df.select(col(idc), col(tc), col(lc)).localCheckpoint()
    val n = batch.count()
    if (n == 0) return 0L
    if (config.getOrElse("mode", "ingest").toString == "forget")
      Classify.forgetNbStoreAt(spark, path, batch, idc, tc, lc)
    else
      Classify.mergeNbStoreAt(spark, path, batch, idc, tc, lc)
    n
  }
}

object Populate {
  def register(r: Registry[SinkPlugin]): Unit = {
    r.register(ConsoleSink)
    r.register(FileSink)
    r.register(new HttpSink())
    r.register(KafkaSink)
    r.register(new CompassSink())
    r.register(new StencilSink())
    // project additions on the same SPI: retrieval/vector index ingest
    r.register(Bm25IndexSink)
    r.register(IvfIndexSink)
    r.register(WinnowIndexSink)
    r.register(NbIndexSink)
  }
}
