package graft.model

import scala.util.matching.Regex

/** Remaining first-class models: Badge (with per-label key-pattern
  * validation, badge.py:33-162), Watermark (part_name `col=value` parse,
  * watermark.py:17-130), TableColumnStats (table_stats.py:17-132),
  * Application (application.py:16-150), SchemaModel
  * (schema/schema.py:25-115).
  */
case class BadgeMetadata(startLabel: String, startKey: String, badges: Seq[String]) {
  import BadgeMetadata._
  require(keyPatterns.contains(startLabel),
    s"$startLabel is not a valid start label for a badge relation")
  require(keyPatterns(startLabel).pattern.matcher(startKey).matches(),
    s"$startKey does not match the key pattern for a $startLabel")
}

object BadgeMetadata {
  val BadgeLabel = "Badge"

  /** Per-label key regex validation (badge.py:52-67). */
  val keyPatterns: Map[String, Regex] = Map(
    "Table" -> "[a-z]+://[a-zA-Z0-9_.-]+\\.[a-zA-Z0-9_.-]+/[a-zA-Z0-9_.-]+".r,
    "Dashboard" -> "[a-z]+_dashboard://[a-zA-Z0-9_.-]+\\.[a-zA-Z0-9_.-]+/[a-zA-Z0-9_.-]+".r,
    "Column" -> "[a-z]+://[a-zA-Z0-9_.-]+\\.[a-zA-Z0-9_.-]+/[a-zA-Z0-9_.-]+/[a-zA-Z0-9_.-]+".r)

  implicit val serializer: GraphSerializable[BadgeMetadata] =
    new GraphSerializable[BadgeMetadata] {
      def nodes(b: BadgeMetadata): Seq[GraphNode] =
        b.badges.filter(_.nonEmpty).map(badge =>
          GraphNode(badge, BadgeLabel, Map("category" -> "table_status")))
      def relationships(b: BadgeMetadata): Seq[GraphRelationship] =
        b.badges.filter(_.nonEmpty).map(badge =>
          GraphRelationship(b.startLabel, BadgeLabel, b.startKey, badge,
            "HAS_BADGE", "BADGE_FOR", Map.empty))
    }
}

/** Stat node per (column, stat_name) with the observation window. */
case class TableColumnStats(
    db: String,
    cluster: String,
    schema: String,
    table: String,
    colName: String,
    statName: String,
    statVal: String,
    startEpoch: Long,
    endEpoch: Long) {
  def columnKey: String = s"$db://$cluster.$schema/$table/$colName"
  def statKey: String = s"$columnKey/$statName/"
}

object TableColumnStats {
  val Label = "Stat"

  implicit val serializer: GraphSerializable[TableColumnStats] =
    new GraphSerializable[TableColumnStats] {
      def nodes(s: TableColumnStats): Seq[GraphNode] = Seq(
        GraphNode(s.statKey, Label, Map(
          // the reference attribute is stat_type even though the ctor
          // param is stat_name (table_stats.py:49,100)
          "stat_type" -> s.statName, "stat_val" -> s.statVal,
          "start_epoch" -> s.startEpoch.toString, "end_epoch" -> s.endEpoch.toString)))
      def relationships(s: TableColumnStats): Seq[GraphRelationship] = Seq(
        GraphRelationship(Label, "Column", s.statKey, s.columnKey,
          "STAT_OF", "STAT", Map.empty))
    }
}

/** Application (Airflow DAG/task) generating a table. */
case class Application(
    taskId: String,
    dagId: String,
    database: String,
    cluster: String,
    schema: String,
    table: String,
    applicationUrl: String = "") {
  def key: String = s"application://$cluster.airflow/$dagId/$taskId"
  def tableKey: String = s"$database://$cluster.$schema/$table"
  def applicationId: String = s"$dagId/$taskId"
}

object Application {
  val Label = "Application"

  implicit val serializer: GraphSerializable[Application] =
    new GraphSerializable[Application] {
      def nodes(a: Application): Seq[GraphNode] = Seq(
        GraphNode(a.key, Label, Map(
          "id" -> a.applicationId, "name" -> "Airflow",
          "application_url" -> a.applicationUrl)))
      def relationships(a: Application): Seq[GraphRelationship] = Seq(
        GraphRelationship(Label, "Table", a.key, a.tableKey,
          "GENERATES", "DERIVED_FROM", Map.empty))
    }
}

/** Schema entity with its own description node. */
case class SchemaModel(
    schemaKey: String,
    schema: String,
    description: Option[String] = None,
    descriptionSource: Option[String] = None) {
  def descriptionKey: String = descriptionSource match {
    case Some(src) => s"$schemaKey/_${src}_description"
    case None      => s"$schemaKey/_description"
  }
  def descriptionLabel: String =
    if (descriptionSource.isDefined) "Programmatic_Description" else "Description"
}

object SchemaModel {
  val Label = "Schema"

  implicit val serializer: GraphSerializable[SchemaModel] =
    new GraphSerializable[SchemaModel] {
      def nodes(s: SchemaModel): Seq[GraphNode] =
        GraphNode(s.schemaKey, Label, Map("name" -> s.schema)) +:
          s.description.map(d =>
            GraphNode(s.descriptionKey, s.descriptionLabel, Map("description" -> d))).toSeq
      def relationships(s: SchemaModel): Seq[GraphRelationship] =
        s.description.map(_ =>
          GraphRelationship(Label, s.descriptionLabel, s.schemaKey, s.descriptionKey,
            "DESCRIPTION", "DESCRIPTION_OF", Map.empty)).toSeq
    }
}
