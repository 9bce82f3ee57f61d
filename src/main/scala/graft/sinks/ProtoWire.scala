package graft.sinks

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Row

/** Minimal protobuf wire-format writer (proto3 semantics: zero-valued
  * scalars omitted, `None` messages absent, present-but-empty messages
  * serialized as tag + length 0).
  *
  * Exists so the kafka sink can publish the reference's on-wire bytes
  * (kafka/sink.go:110-116 `proto.Marshal(asset)`) without a protobuf
  * runtime on the classpath: the generated descriptors are fixed and tiny,
  * so the tag/varint/length-delimited framing is hand-rolled here. On a
  * real cluster the drop-in upgrade is spark-protobuf's `to_protobuf` with
  * the compiled descriptor set; the bytes are identical.
  */
private[graft] object ProtoWire {
  final val WireVarint = 0
  final val WireFixed64 = 1
  final val WireLen = 2

  def putVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  def putTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    putVarint(out, (field.toLong << 3) | wire)

  /** length-delimited submessage/bytes field — always written when called
    * (caller decides presence).
    */
  def putLen(out: ByteArrayOutputStream, field: Int, bytes: Array[Byte]): Unit = {
    putTag(out, field, WireLen)
    putVarint(out, bytes.length)
    out.write(bytes, 0, bytes.length)
  }

  /** proto3 string: empty = omitted. */
  def putString(out: ByteArrayOutputStream, field: Int, s: String): Unit =
    if (s != null && s.nonEmpty) putLen(out, field, s.getBytes("UTF-8"))

  /** proto3 int64/bool varint: zero/false = omitted. */
  def putInt(out: ByteArrayOutputStream, field: Int, v: Long): Unit =
    if (v != 0L) { putTag(out, field, WireVarint); putVarint(out, v) }

  def putBool(out: ByteArrayOutputStream, field: Int, b: Boolean): Unit =
    if (b) { putTag(out, field, WireVarint); putVarint(out, 1L) }

  /** proto3 double (fixed64 little-endian): zero = omitted. */
  def putDouble(out: ByteArrayOutputStream, field: Int, d: Double): Unit =
    if (d != 0.0) {
      putTag(out, field, WireFixed64)
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }

  def bytesOf(f: ByteArrayOutputStream => Unit): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    f(out)
    out.toByteArray
  }

  // --- google.protobuf.Struct / Value / ListValue (well-known types) ---
  // Struct.fields: map<string, Value> = 1 (entries: key=1, value=2);
  // Value oneof: null=1, number=2 (double), string=3, bool=4, struct=5,
  // list=6 — oneof members serialize even at zero value.

  def structBytes(m: Seq[(String, Any)]): Array[Byte] = bytesOf { out =>
    m.foreach { case (k, v) =>
      putLen(out, 1, bytesOf { e =>
        putString(e, 1, k)
        putLen(e, 2, valueBytes(v))
      })
    }
  }

  def listBytes(l: Seq[Any]): Array[Byte] = bytesOf { out =>
    l.foreach(v => putLen(out, 1, valueBytes(v)))
  }

  def valueBytes(v: Any): Array[Byte] = bytesOf { out =>
    v match {
      case null => putTag(out, 1, WireVarint); putVarint(out, 0L) // NullValue
      case b: Boolean =>
        putTag(out, 4, WireVarint); putVarint(out, if (b) 1L else 0L)
      case n: Number =>
        putTag(out, 2, WireFixed64)
        val bits = java.lang.Double.doubleToLongBits(n.doubleValue())
        var i = 0
        while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
      case s: String => putTag(out, 3, WireLen); putVarint(out, s.getBytes("UTF-8").length); out.write(s.getBytes("UTF-8"))
      case m: java.util.Map[_, _] =>
        val entries = {
          val it = m.entrySet().iterator()
          val buf = scala.collection.mutable.ArrayBuffer[(String, Any)]()
          while (it.hasNext) { val e = it.next(); buf += (e.getKey.toString -> e.getValue) }
          buf.toSeq
        }
        putLen(out, 5, structBytes(entries))
      case l: java.util.List[_] =>
        val buf = scala.collection.mutable.ArrayBuffer[Any]()
        val it = l.iterator(); while (it.hasNext) buf += it.next()
        putLen(out, 6, listBytes(buf.toSeq))
      case other => // fall back to string representation
        val b = other.toString.getBytes("UTF-8")
        putTag(out, 3, WireLen); putVarint(out, b.length); out.write(b)
    }
  }

  /** JSON text → google.protobuf.Struct bytes (empty/blank/"{}" → None —
    * the reference's nil-pointer absence). JSON is parsed with snakeyaml
    * (JSON is a YAML subset; the library is already a recipe dependency).
    */
  def jsonStructBytes(json: String): Option[Array[Byte]] = {
    if (json == null || json.trim.isEmpty || json.trim == "{}") return None
    new org.yaml.snakeyaml.Yaml().load[Object](json) match {
      case m: java.util.Map[_, _] =>
        val buf = scala.collection.mutable.ArrayBuffer[(String, Any)]()
        val it = m.entrySet().iterator()
        while (it.hasNext) { val e = it.next(); buf += (e.getKey.toString -> e.getValue) }
        Some(structBytes(buf.toSeq))
      case _ => None
    }
  }

  def jsonListBytes(json: String): Option[Array[Byte]] = {
    if (json == null || json.trim.isEmpty || json.trim == "[]") return None
    new org.yaml.snakeyaml.Yaml().load[Object](json) match {
      case l: java.util.List[_] =>
        val buf = scala.collection.mutable.ArrayBuffer[Any]()
        val it = l.iterator(); while (it.hasNext) buf += it.next()
        Some(listBytes(buf.toSeq))
      case _ => None
    }
  }
}

/** Table-asset → protobuf bytes using the reference's generated descriptors
  * (field numbers cited per message; see models/odpf/assets in the
  * reference). Walks the nested Row of a `Dataset[TableAsset].toDF()`
  * frame.
  */
object AssetProto {
  import ProtoWire._

  private def opt(r: Row, name: String): Option[Row] = {
    val i = r.fieldIndex(name)
    if (r.isNullAt(i)) None else Some(r.getStruct(i))
  }

  private def rows(r: Row, name: String): Seq[Row] = {
    val i = r.fieldIndex(name)
    if (r.isNullAt(i)) Nil else r.getSeq[Row](i)
  }

  private def strs(r: Row, name: String): Seq[String] = {
    val i = r.fieldIndex(name)
    if (r.isNullAt(i)) Nil else r.getSeq[String](i)
  }

  private def str(r: Row, name: String): String = {
    val i = r.fieldIndex(name)
    if (r.isNullAt(i)) "" else r.getString(i)
  }

  private def lng(r: Row, name: String): Long = {
    val i = r.fieldIndex(name)
    if (r.isNullAt(i)) 0L else r.getLong(i)
  }

  private def dbl(r: Row, name: String): Double = {
    val i = r.fieldIndex(name)
    if (r.isNullAt(i)) 0.0 else r.getDouble(i)
  }

  /** common/v1beta1/resource.pb.go: urn=1 name=2 service=3 type=4 url=5
    * description=6
    */
  def resourceBytes(r: Row): Array[Byte] = bytesOf { out =>
    putString(out, 1, str(r, "urn"))
    putString(out, 2, str(r, "name"))
    putString(out, 3, str(r, "service"))
    putString(out, 4, str(r, "type"))
    putString(out, 5, str(r, "url"))
    putString(out, 6, str(r, "description"))
  }

  /** v1beta1/table.pb.go TableProfile: total_rows=1 partition_key=2
    * partition_value=3 usage_count=4 joins=5 filters=6; Join: urn=1
    * count=2 conditions=3
    */
  def profileBytes(r: Row): Array[Byte] = bytesOf { out =>
    putInt(out, 1, lng(r, "totalRows"))
    putString(out, 2, str(r, "partitionKey"))
    putString(out, 3, str(r, "partitionValue"))
    putInt(out, 4, lng(r, "usageCount"))
    rows(r, "joins").foreach { j =>
      putLen(out, 5, bytesOf { e =>
        putString(e, 1, str(j, "urn"))
        putInt(e, 2, lng(j, "count"))
        strs(j, "conditions").foreach(c => putString(e, 3, c))
      })
    }
    strs(r, "filters").foreach(f => putString(out, 6, f))
  }

  /** facets/v1beta1/schema.pb.go ColumnProfile: min=1 max=2 avg=3(double)
    * med=4(double) unique=5 count=6 top=7
    */
  def columnProfileBytes(r: Row): Array[Byte] = bytesOf { out =>
    putString(out, 1, str(r, "min"))
    putString(out, 2, str(r, "max"))
    putDouble(out, 3, dbl(r, "avg"))
    putDouble(out, 4, dbl(r, "med"))
    putInt(out, 5, lng(r, "unique"))
    putInt(out, 6, lng(r, "count"))
    putString(out, 7, str(r, "top"))
  }

  /** facets/v1beta1/schema.pb.go Column: name=1 description=2 data_type=3
    * is_nullable=4 length=5 profile=6 properties=31
    */
  def columnBytes(r: Row): Array[Byte] = bytesOf { out =>
    putString(out, 1, str(r, "name"))
    putString(out, 2, str(r, "description"))
    putString(out, 3, str(r, "dataType"))
    putBool(out, 4, !r.isNullAt(r.fieldIndex("isNullable")) &&
      r.getBoolean(r.fieldIndex("isNullable")))
    putInt(out, 5, lng(r, "length"))
    opt(r, "profile").foreach(p => putLen(out, 6, columnProfileBytes(p)))
  }

  /** facets/v1beta1/properties.pb.go: tags=1 labels=2(map) attributes=3
    * (google.protobuf.Struct); map entries key=1 value=2
    */
  def propertiesBytes(r: Row): Array[Byte] = bytesOf { out =>
    strs(r, "tags").foreach(t => putString(out, 1, t))
    val li = r.fieldIndex("labels")
    if (!r.isNullAt(li)) {
      r.getMap[String, String](li).toSeq.sortBy(_._1).foreach { case (k, v) =>
        putLen(out, 2, bytesOf { e => putString(e, 1, k); putString(e, 2, v) })
      }
    }
    jsonStructBytes(str(r, "attributes")).foreach(b => putLen(out, 3, b))
  }

  /** facets/v1beta1/ownership.pb.go: owners=7; Owner: urn=1 name=2 role=3
    * email=4
    */
  def ownershipBytes(r: Row): Array[Byte] = bytesOf { out =>
    rows(r, "owners").foreach { o =>
      putLen(out, 7, bytesOf { e =>
        putString(e, 1, str(o, "urn"))
        putString(e, 2, str(o, "name"))
        putString(e, 3, str(o, "role"))
        putString(e, 4, str(o, "email"))
      })
    }
  }

  /** facets/v1beta1/lineage.pb.go: upstreams=1 downstreams=2 (Resource) */
  def lineageBytes(r: Row): Array[Byte] = bytesOf { out =>
    rows(r, "upstreams").foreach(u => putLen(out, 1, resourceBytes(u)))
    rows(r, "downstreams").foreach(d => putLen(out, 2, resourceBytes(d)))
  }

  /** facets/v1beta1/preview.pb.go: fields=1 rows=2 (ListValue from the
    * JSON-text rows column)
    */
  def previewBytes(r: Row): Array[Byte] = bytesOf { out =>
    strs(r, "fields").foreach(f => putString(out, 1, f))
    jsonListBytes(str(r, "rows")).foreach(b => putLen(out, 2, b))
  }

  /** common/v1beta1/timestamp.pb.go: create_time=1 update_time=2, each a
    * google.protobuf.Timestamp (seconds=1, nanos=2)
    */
  def timestampsBytes(r: Row): Array[Byte] = bytesOf { out =>
    def ts(name: String, field: Int): Unit = {
      val i = r.fieldIndex(name)
      if (!r.isNullAt(i)) {
        val t = r.getTimestamp(i)
        // proto Timestamp: seconds floor-divided so pre-1970 instants keep
        // forward-counting nanos (truncation would round toward zero)
        putLen(out, field, bytesOf { e =>
          putInt(e, 1, Math.floorDiv(t.getTime, 1000L))
          putInt(e, 2, t.getNanos.toLong)
        })
      }
    }
    ts("createTime", 1)
    ts("updateTime", 2)
  }

  /** v1beta1/table.pb.go Table: resource=1 profile=21 schema=22 preview=23
    * ownership=31 lineage=32 properties=33 timestamps=34. `schema` is the
    * Columns facet wrapper (columns=1).
    */
  def tableBytes(r: Row): Array[Byte] = bytesOf { out =>
    opt(r, "resource").foreach(x => putLen(out, 1, resourceBytes(x)))
    opt(r, "profile").foreach(x => putLen(out, 21, profileBytes(x)))
    val cols = rows(r, "schema")
    if (cols.nonEmpty)
      putLen(out, 22, bytesOf { e =>
        cols.foreach(c => putLen(e, 1, columnBytes(c)))
      })
    opt(r, "preview").foreach(x => putLen(out, 23, previewBytes(x)))
    opt(r, "ownership").foreach(x => putLen(out, 31, ownershipBytes(x)))
    opt(r, "lineage").foreach(x => putLen(out, 32, lineageBytes(x)))
    opt(r, "properties").foreach(x => putLen(out, 33, propertiesBytes(x)))
    opt(r, "timestamps").foreach(x => putLen(out, 34, timestampsBytes(x)))
  }

  /** v1beta1/topic.pb.go: resource=1 profile=21 schema=31 ownership=32
    * lineage=33 properties=34; TopicProfile: throughput=1
    * number_of_partitions=2; TopicSchema (facets/schema.pb.go:277-284):
    * schema_url=1 format=2
    */
  def topicBytes(r: Row): Array[Byte] = bytesOf { out =>
    opt(r, "resource").foreach(x => putLen(out, 1, resourceBytes(x)))
    opt(r, "profile").foreach { p =>
      putLen(out, 21, bytesOf { e =>
        putString(e, 1, str(p, "throughput"))
        putInt(e, 2, lng(p, "numberOfPartitions"))
      })
    }
    opt(r, "schema").foreach { sc =>
      putLen(out, 31, bytesOf { e =>
        putString(e, 1, str(sc, "schemaUrl"))
        putString(e, 2, str(sc, "format"))
      })
    }
    opt(r, "ownership").foreach(x => putLen(out, 32, ownershipBytes(x)))
    opt(r, "lineage").foreach(x => putLen(out, 33, lineageBytes(x)))
    opt(r, "properties").foreach(x => putLen(out, 34, propertiesBytes(x)))
  }

  /** v1beta1/dashboard.pb.go Chart: urn=1 name=2 type=3 source=4
    * description=5 url=6 lineage=32
    */
  def chartBytes(r: Row): Array[Byte] = bytesOf { out =>
    putString(out, 1, str(r, "urn"))
    putString(out, 2, str(r, "name"))
    putString(out, 3, str(r, "type"))
    putString(out, 4, str(r, "source"))
    putString(out, 5, str(r, "description"))
    putString(out, 6, str(r, "url"))
    opt(r, "lineage").foreach(x => putLen(out, 32, lineageBytes(x)))
  }

  /** v1beta1/dashboard.pb.go: resource=1 charts=21 ownership=31
    * properties=32 timestamps=33 lineage=34
    */
  def dashboardBytes(r: Row): Array[Byte] = bytesOf { out =>
    opt(r, "resource").foreach(x => putLen(out, 1, resourceBytes(x)))
    rows(r, "charts").foreach(c => putLen(out, 21, chartBytes(c)))
    opt(r, "ownership").foreach(x => putLen(out, 31, ownershipBytes(x)))
    opt(r, "properties").foreach(x => putLen(out, 32, propertiesBytes(x)))
    opt(r, "timestamps").foreach(x => putLen(out, 33, timestampsBytes(x)))
    opt(r, "lineage").foreach(x => putLen(out, 34, lineageBytes(x)))
  }

  /** v1beta1/job.pb.go: resource=1 ownership=31 lineage=32 properties=33
    * timestamps=34
    */
  def jobBytes(r: Row): Array[Byte] = bytesOf { out =>
    opt(r, "resource").foreach(x => putLen(out, 1, resourceBytes(x)))
    opt(r, "ownership").foreach(x => putLen(out, 31, ownershipBytes(x)))
    opt(r, "lineage").foreach(x => putLen(out, 32, lineageBytes(x)))
    opt(r, "properties").foreach(x => putLen(out, 33, propertiesBytes(x)))
    opt(r, "timestamps").foreach(x => putLen(out, 34, timestampsBytes(x)))
  }

  /** v1beta1/user.pb.go: resource=1 email=3 username=4 first_name=5
    * last_name=6 full_name=7 status=10 memberships=22 properties=31;
    * Membership: group_urn=1 role=2 (repeated)
    */
  def userBytes(r: Row): Array[Byte] = bytesOf { out =>
    opt(r, "resource").foreach(x => putLen(out, 1, resourceBytes(x)))
    putString(out, 3, str(r, "email"))
    putString(out, 4, str(r, "username"))
    putString(out, 5, str(r, "firstName"))
    putString(out, 6, str(r, "lastName"))
    putString(out, 7, str(r, "fullName"))
    putString(out, 10, str(r, "status"))
    rows(r, "memberships").foreach { m =>
      putLen(out, 22, bytesOf { e =>
        putString(e, 1, str(m, "groupUrn"))
        strs(m, "roles").foreach(role => putString(e, 2, role))
      })
    }
    opt(r, "properties").foreach(x => putLen(out, 31, propertiesBytes(x)))
  }

  /** v1beta1/bucket.pb.go: resource=1 description=4 location=5
    * storage_type=6 blobs=7 ownership=31 properties=32 timestamps=33;
    * Blob: urn=1 name=2 source=3 size=4 ownership=31 timestamps=33
    */
  def bucketBytes(r: Row): Array[Byte] = bytesOf { out =>
    opt(r, "resource").foreach(x => putLen(out, 1, resourceBytes(x)))
    putString(out, 4, str(r, "description"))
    putString(out, 5, str(r, "location"))
    putString(out, 6, str(r, "storageType"))
    rows(r, "blobs").foreach { b =>
      putLen(out, 7, bytesOf { e =>
        putString(e, 1, str(b, "urn"))
        putString(e, 2, str(b, "name"))
        putString(e, 3, str(b, "source"))
        putInt(e, 4, lng(b, "size"))
        opt(b, "ownership").foreach(x => putLen(e, 31, ownershipBytes(x)))
        opt(b, "timestamps").foreach(x => putLen(e, 33, timestampsBytes(x)))
      })
    }
    opt(r, "ownership").foreach(x => putLen(out, 31, ownershipBytes(x)))
    opt(r, "properties").foreach(x => putLen(out, 32, propertiesBytes(x)))
    opt(r, "timestamps").foreach(x => putLen(out, 33, timestampsBytes(x)))
  }

  /** v1beta1/group.pb.go: resource=1 email=2 members=21 properties=31
    * timestamps=32; GroupMember: urn=1 role=2
    */
  def groupBytes(r: Row): Array[Byte] = bytesOf { out =>
    opt(r, "resource").foreach(x => putLen(out, 1, resourceBytes(x)))
    putString(out, 2, str(r, "email"))
    rows(r, "members").foreach { m =>
      putLen(out, 21, bytesOf { e =>
        putString(e, 1, str(m, "urn"))
        putString(e, 2, str(m, "role"))
      })
    }
    opt(r, "properties").foreach(x => putLen(out, 31, propertiesBytes(x)))
    opt(r, "timestamps").foreach(x => putLen(out, 32, timestampsBytes(x)))
  }

  /** Pick the encoder for a frame by its discriminating fields — the Scala
    * analogue of the reference's `proto.Marshal(value.(proto.Message))`
    * working on any asset kind. None → the frame is not a known asset
    * shape and the kafka sink falls back to JSON.
    */
  def encoderFor(schema: org.apache.spark.sql.types.StructType): Option[Row => Array[Byte]] = {
    val names = schema.fieldNames.toSet
    if (!names.contains("resource")) None
    else if (isTableFrame(schema)) Some(tableBytes)
    else if (names.contains("charts")) Some(dashboardBytes)
    else if (names.contains("memberships") && names.contains("username")) Some(userBytes)
    else if (names.contains("blobs")) Some(bucketBytes)
    else if (names.contains("members") && names.contains("email")) Some(groupBytes)
    else if (names.contains("schema") || names.contains("profile")) Some(topicBytes)
    else if (names == Set("resource", "ownership", "lineage", "properties", "timestamps"))
      Some(jobBytes)
    else None
  }

  /** Is this frame a TableAsset frame (the shape `tableBytes` encodes)?
    * Field NAMES are not enough — TopicAsset also has resource/profile/
    * schema/properties, but its `schema` is a TopicSchema STRUCT while a
    * table's is the column ARRAY, and its profile has no `totalRows`. Check
    * the discriminating types so topic/dashboard frames fall back to JSON
    * instead of crashing the encoder mid-job.
    */
  def isTableFrame(schema: org.apache.spark.sql.types.StructType): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    def schemaIsColumnArray = byName.get("schema").exists {
      case ArrayType(s: StructType, _) => s.fieldNames.contains("dataType")
      case _ => false
    }
    def profileIsTableProfile = byName.get("profile").forall {
      case s: StructType => s.fieldNames.contains("totalRows")
      case _ => false
    }
    Set("resource", "schema", "properties").subsetOf(byName.keySet) &&
      schemaIsColumnArray && profileIsTableProfile
  }
}
