package graft.model

import java.sql.Timestamp

/** The asset data model — Scala case-class mirror of the reference's
  * protobuf Asset union and shared facets (reference:
  * models/odpf/assets/v1beta1 pb.go files, facets at
  * models/odpf/assets/facets/v1beta1 pb.go files, commons at
  * models/odpf/assets/common/v1beta1 pb.go files).
  *
  * Spark mapping notes (SURVEY.md §1.2-1.3): fixed facets become nested
  * structs via `Encoders.product`; the reference's dynamic
  * `google.protobuf.Struct` attributes become a JSON string column
  * (`Properties.attributes`) — portable across engines, queryable with
  * `get_json_object`/`from_json`; row previews likewise serialize to JSON.
  */

/** common/v1beta1/resource.pb.go:25-48 */
case class Resource(
    urn: String,
    name: String,
    service: String,
    `type`: String = "",
    url: String = "",
    description: String = "")

/** facets/v1beta1/schema.pb.go:180-192 */
case class ColumnProfile(
    min: String = "",
    max: String = "",
    avg: Double = 0.0,
    med: Double = 0.0,
    unique: Long = 0L,
    count: Long = 0L,
    top: String = "")

/** facets/v1beta1/schema.pb.go:25-97 */
case class ColumnDef(
    name: String,
    description: String = "",
    dataType: String = "",
    isNullable: Boolean = true,
    length: Long = 0L,
    profile: Option[ColumnProfile] = None)

/** v1beta1/table.pb.go:251-260 — join usage stat */
case class JoinStat(urn: String, count: Long, conditions: Seq[String] = Nil)

/** v1beta1/table.pb.go:156-174 */
case class TableProfile(
    totalRows: Long = 0L,
    partitionKey: String = "",
    partitionValue: String = "",
    usageCount: Long = 0L,
    joins: Seq[JoinStat] = Nil,
    filters: Seq[String] = Nil)

/** facets/v1beta1/ownership.pb.go:24-85 */
case class Owner(urn: String = "", name: String = "", role: String = "", email: String = "")
case class Ownership(owners: Seq[Owner] = Nil)

/** facets/v1beta1/lineage.pb.go:26-37 */
case class Lineage(upstreams: Seq[Resource] = Nil, downstreams: Seq[Resource] = Nil)

/** facets/v1beta1/properties.pb.go:30-34 — attributes kept as JSON text */
case class Properties(
    tags: Seq[String] = Nil,
    labels: Map[String, String] = Map.empty,
    attributes: String = "{}")

/** facets/v1beta1/preview.pb.go:31-34 — rows kept as JSON text */
case class Preview(fields: Seq[String] = Nil, rows: String = "[]")

/** common/v1beta1/timestamp.pb.go:25-34 */
case class AssetTimestamps(createTime: Option[Timestamp] = None, updateTime: Option[Timestamp] = None)

/** v1beta1/table.pb.go:27-58 */
case class TableAsset(
    resource: Resource,
    profile: Option[TableProfile] = None,
    schema: Seq[ColumnDef] = Nil,
    preview: Option[Preview] = None,
    ownership: Option[Ownership] = None,
    lineage: Option[Lineage] = None,
    properties: Properties = Properties(),
    timestamps: Option[AssetTimestamps] = None)

/** v1beta1/topic.pb.go:27-48, :146-156 */
case class TopicProfile(throughput: String = "", numberOfPartitions: Long = 0L)
case class TopicSchema(schemaUrl: String = "", format: String = "")
case class TopicAsset(
    resource: Resource,
    profile: Option[TopicProfile] = None,
    schema: Option[TopicSchema] = None,
    ownership: Option[Ownership] = None,
    lineage: Option[Lineage] = None,
    properties: Properties = Properties())

/** v1beta1/dashboard.pb.go:26-47, chart at :134-156 */
case class Chart(
    urn: String,
    name: String = "",
    `type`: String = "",
    source: String = "",
    description: String = "",
    url: String = "",
    lineage: Option[Lineage] = None)
case class DashboardAsset(
    resource: Resource,
    charts: Seq[Chart] = Nil,
    ownership: Option[Ownership] = None,
    lineage: Option[Lineage] = None,
    properties: Properties = Properties(),
    timestamps: Option[AssetTimestamps] = None)

/** v1beta1/job.pb.go:26-47 */
case class JobAsset(
    resource: Resource,
    ownership: Option[Ownership] = None,
    lineage: Option[Lineage] = None,
    properties: Properties = Properties(),
    timestamps: Option[AssetTimestamps] = None)

/** v1beta1/user.pb.go:28-49, memberships :217-227 */
case class Membership(groupUrn: String, roles: Seq[String] = Nil)
case class UserAsset(
    resource: Resource,
    email: String = "",
    username: String = "",
    firstName: String = "",
    lastName: String = "",
    fullName: String = "",
    status: String = "",
    memberships: Seq[Membership] = Nil,
    properties: Properties = Properties())

/** v1beta1/bucket.pb.go:26-47, blob :153-173 */
case class Blob(
    urn: String,
    name: String = "",
    source: String = "",
    size: Long = 0L,
    ownership: Option[Ownership] = None,
    timestamps: Option[AssetTimestamps] = None)
case class BucketAsset(
    resource: Resource,
    description: String = "",
    location: String = "",
    storageType: String = "",
    blobs: Seq[Blob] = Nil,
    ownership: Option[Ownership] = None,
    properties: Properties = Properties(),
    timestamps: Option[AssetTimestamps] = None)

/** v1beta1/group.pb.go:26-47 */
case class GroupMember(urn: String, role: String = "")
case class GroupAsset(
    resource: Resource,
    email: String = "",
    members: Seq[GroupMember] = Nil,
    properties: Properties = Properties(),
    timestamps: Option[AssetTimestamps] = None)

/** URN builders (reference: models/urn.go:5-15). */
object Urn {
  /** `service::host/database/name` — tables. */
  def table(service: String, host: String, database: String, name: String): String =
    s"$service::$host/$database/$name"

  /** `service::host/id` — dashboards, jobs, topics, buckets, users. */
  def resource(service: String, host: String, id: String): String =
    s"$service::$host/$id"
}
