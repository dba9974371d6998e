package graft.model

/** Remaining graph-serializable domain models (SURVEY §1.2).
  * Key formats and relationship types follow the reference models cited on
  * each class; fan-out is pure and unit-tested.
  */

/** User — keyed by email (reference: databuilder/models/user.py:18-223).
  * Reference-exact fan-out: every string attribute is emitted with an ''
  * default (user.py:131-150), `updated_at` defaults to 0, and the
  * `do_not_update_empty_attribute` option deletes ALL falsy attributes —
  * including `is_active` when false, a faithful reference quirk
  * (user.py:154-157 deletes on `not v`). Only the MANAGE_BY relation is
  * produced for a manager; the manager's own node is someone else's row
  * (user.py:202-214 yields no manager node). */
case class User(
    email: String,
    firstName: Option[String] = None,
    lastName: Option[String] = None,
    fullName: Option[String] = None,
    githubUsername: Option[String] = None,
    teamName: Option[String] = None,
    employeeType: Option[String] = None,
    managerEmail: Option[String] = None,
    slackId: Option[String] = None,
    roleName: Option[String] = None,
    isActive: Boolean = true,
    updatedAt: Long = 0L,
    doNotUpdateEmptyAttribute: Boolean = false)

object User {
  val Label = "User"
  implicit val serializer: GraphSerializable[User] = new GraphSerializable[User] {
    def nodes(u: User): Seq[GraphNode] = {
      val base = Map(
        "email" -> u.email,
        "is_active" -> u.isActive.toString,
        "first_name" -> u.firstName.getOrElse(""),
        "last_name" -> u.lastName.getOrElse(""),
        "full_name" -> u.fullName.getOrElse(""),
        "github_username" -> u.githubUsername.getOrElse(""),
        "team_name" -> u.teamName.getOrElse(""),
        "employee_type" -> u.employeeType.getOrElse(""),
        "slack_id" -> u.slackId.getOrElse(""),
        "role_name" -> u.roleName.getOrElse(""))
      val withUpdated =
        if (u.updatedAt != 0L) base + ("updated_at" -> u.updatedAt.toString)
        else if (!u.doNotUpdateEmptyAttribute) base + ("updated_at" -> "0")
        else base
      val attrs =
        if (u.doNotUpdateEmptyAttribute)
          withUpdated.filter { case (_, v) => v.nonEmpty && v != "false" }
        else withUpdated
      Seq(GraphNode(u.email, Label, attrs))
    }
    def relationships(u: User): Seq[GraphRelationship] =
      u.managerEmail.filter(_.nonEmpty).toSeq.map(m =>
        GraphRelationship(Label, Label, u.email, m, "MANAGE_BY", "MANAGE", Map.empty))
  }
}

/** Table↔User read frequency — READ/READ_BY with read_count
  * (reference: databuilder/models/table_column_usage.py:19-132). */
case class TableUsage(tableKey: String, userEmail: String, readCount: Long)

object TableUsage {
  implicit val serializer: GraphSerializable[TableUsage] = new GraphSerializable[TableUsage] {
    def nodes(t: TableUsage): Seq[GraphNode] =
      Seq(GraphNode(t.userEmail, User.Label, Map("email" -> t.userEmail)))
    def relationships(t: TableUsage): Seq[GraphRelationship] =
      Seq(GraphRelationship(TableMetadata.TableLabel, User.Label, t.tableKey, t.userEmail,
        "READ_BY", "READ", Map("read_count" -> t.readCount.toString)))
  }
}

/** Table-level lineage — edges only
  * (reference: databuilder/models/table_lineage.py:15-121). */
case class TableLineage(sourceTableKey: String, targetTableKey: String)

object TableLineage {
  implicit val serializer: GraphSerializable[TableLineage] = new GraphSerializable[TableLineage] {
    def nodes(t: TableLineage): Seq[GraphNode] = Nil
    def relationships(t: TableLineage): Seq[GraphRelationship] =
      Seq(GraphRelationship(TableMetadata.TableLabel, TableMetadata.TableLabel,
        t.sourceTableKey, t.targetTableKey, "HAS_DOWNSTREAM", "HAS_UPSTREAM", Map.empty))
  }
}

/** Column-level lineage — edges between column keys, no nodes
  * (reference: databuilder/models/table_lineage.py:15-121, column variant).
  * Column keys follow the `{table_key}/{column}` layout of
  * [[TableMetadata]]'s column fan-out. */
case class ColumnLineage(sourceColumnKey: String, targetColumnKey: String)

object ColumnLineage {
  implicit val serializer: GraphSerializable[ColumnLineage] =
    new GraphSerializable[ColumnLineage] {
      def nodes(c: ColumnLineage): Seq[GraphNode] = Nil
      def relationships(c: ColumnLineage): Seq[GraphRelationship] =
        Seq(GraphRelationship(TableMetadata.ColumnLabel, TableMetadata.ColumnLabel,
          c.sourceColumnKey, c.targetColumnKey, "HAS_DOWNSTREAM", "HAS_UPSTREAM", Map.empty))
    }
}

/** Partition watermark — parses `part_name` as "col=value"
  * (reference: databuilder/models/watermark.py:17-130, parse :43-49). */
case class Watermark(
    database: String, cluster: String, schema: String, table: String,
    partName: String, partType: String, createTime: String) {
  def tableKey: String = s"$database://$cluster.$schema/$table"
  def key: String = s"$tableKey/$partType/"
  // split on the FIRST '=' only: a nested part name like
  // "ds=2017-09-18/feature_id=9" keeps the remainder intact as the value
  // (watermark.py:46-49)
  def partitionKey: String = partName.split("=", 2).head
  def partitionValue: String = partName.split("=", 2).lift(1).getOrElse("")
}

object Watermark {
  val Label = "Watermark"
  implicit val serializer: GraphSerializable[Watermark] = new GraphSerializable[Watermark] {
    def nodes(w: Watermark): Seq[GraphNode] =
      Seq(GraphNode(w.key, Label, Map(
        "partition_key" -> w.partitionKey, "partition_value" -> w.partitionValue,
        "create_time" -> w.createTime)))
    def relationships(w: Watermark): Seq[GraphRelationship] =
      Seq(GraphRelationship(Label, TableMetadata.TableLabel, w.key, w.tableKey,
        "BELONG_TO_TABLE", "WATERMARK", Map.empty))
  }
}

/** Table last-updated timestamp node
  * (reference: databuilder/models/table_last_updated.py:17-125). */
case class TableLastUpdated(tableKey: String, lastUpdatedEpoch: Long)

object TableLastUpdated {
  val Label = "Timestamp"
  implicit val serializer: GraphSerializable[TableLastUpdated] =
    new GraphSerializable[TableLastUpdated] {
      def nodes(t: TableLastUpdated): Seq[GraphNode] =
        Seq(GraphNode(s"${t.tableKey}/timestamp", Label,
          Map("last_updated_timestamp" -> t.lastUpdatedEpoch.toString)))
      def relationships(t: TableLastUpdated): Seq[GraphRelationship] =
        Seq(GraphRelationship(TableMetadata.TableLabel, Label,
          t.tableKey, s"${t.tableKey}/timestamp", "LAST_UPDATED_AT", "LAST_UPDATED_TIME_OF",
          Map.empty))
    }
}

/** Table source-file location — Source node keyed `{table_key}/_source`
  * (reference: databuilder/models/table_source.py:18-116). */
case class TableSource(
    database: String, cluster: String, schema: String, table: String,
    source: String, sourceType: String = "github") {
  def tableKey: String = s"$database://$cluster.$schema/$table"
  def key: String = s"$tableKey/_source"
}

object TableSource {
  val Label = "Source"
  implicit val serializer: GraphSerializable[TableSource] =
    new GraphSerializable[TableSource] {
      def nodes(s: TableSource): Seq[GraphNode] =
        Seq(GraphNode(s.key, Label,
          Map("source" -> s.source, "source_type" -> s.sourceType)))
      def relationships(s: TableSource): Seq[GraphRelationship] =
        Seq(GraphRelationship(Label, TableMetadata.TableLabel, s.key, s.tableKey,
          "SOURCE_OF", "SOURCE", Map.empty))
    }
}

/** Table ownership — OWNER/OWNER_OF
  * (reference: databuilder/models/table_owner.py:20-121). */
case class TableOwner(tableKey: String, owners: Seq[String])

object TableOwner {
  implicit val serializer: GraphSerializable[TableOwner] = new GraphSerializable[TableOwner] {
    def nodes(t: TableOwner): Seq[GraphNode] =
      t.owners.map(o => GraphNode(o, User.Label, Map("email" -> o)))
    def relationships(t: TableOwner): Seq[GraphRelationship] =
      t.owners.map(o => GraphRelationship(User.Label, TableMetadata.TableLabel,
        o, t.tableKey, "OWNER_OF", "OWNER", Map.empty))
  }
}
