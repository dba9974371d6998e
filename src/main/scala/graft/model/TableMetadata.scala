package graft.model

/** Table/column metadata domain model + graph fan-out.
  *
  * Key formats and node/relationship structure follow the reference
  * (databuilder/models/table_metadata.py — keys :296-314, node fan-out
  * :427-509, relation fan-out :517-599); the record-at-a-time generators
  * become a pure `GraphSerializable` instance used in Dataset.flatMap.
  */
case class ColumnMetadata(
    name: String,
    description: Option[String],
    colType: String,
    sortOrder: Int,
    badges: Seq[String] = Nil)

case class TableMetadata(
    database: String,
    cluster: String,
    schema: String,
    name: String,
    description: Option[String] = None,
    columns: Seq[ColumnMetadata] = Nil,
    isView: Boolean = false,
    tags: Seq[String] = Nil,
    descriptionSource: Option[String] = None) {

  import TableMetadata._

  def tableKey: String = s"$database://$cluster.$schema/$name"
  def schemaKey: String = s"$database://$cluster.$schema"
  def clusterKey: String = s"$database://$cluster"
  def databaseKey: String = s"database://$database"
  def columnKey(c: ColumnMetadata): String = s"$tableKey/${c.name}"
  def descriptionKey: String = descriptionSource match {
    case Some(src) => s"$tableKey/_${src}_description"
    case None      => s"$tableKey/_description"
  }
  def columnDescriptionKey(c: ColumnMetadata): String = s"${columnKey(c)}/_description"
  def descriptionLabel: String =
    if (descriptionSource.isDefined) ProgrammaticDescriptionLabel else DescriptionLabel
}

object TableMetadata {
  val TableLabel = "Table"
  val ColumnLabel = "Column"
  val DescriptionLabel = "Description"
  val ProgrammaticDescriptionLabel = "Programmatic_Description"
  val TagLabel = "Tag"
  val DatabaseLabel = "Database"
  val ClusterLabel = "Cluster"
  val SchemaLabel = "Schema"

  implicit val serializer: GraphSerializable[TableMetadata] =
    new GraphSerializable[TableMetadata] {

      def nodes(t: TableMetadata): Seq[GraphNode] = {
        val hierarchy = Seq(
          GraphNode(t.databaseKey, DatabaseLabel, Map("name" -> t.database)),
          GraphNode(t.clusterKey, ClusterLabel, Map("name" -> t.cluster)),
          GraphNode(t.schemaKey, SchemaLabel, Map("name" -> t.schema)))
        val table = GraphNode(t.tableKey, TableLabel,
          Map("name" -> t.name, "is_view" -> t.isView.toString))
        val tableDesc = t.description.map(d =>
          GraphNode(t.descriptionKey, t.descriptionLabel,
            Map("description" -> d, "description_source" -> t.descriptionSource.getOrElse("description"))))
        val tagNodes = t.tags.map(tag =>
          GraphNode(tag, TagLabel, Map("tag_type" -> "default")))
        val colNodes = t.columns.map(c =>
          GraphNode(t.columnKey(c), ColumnLabel,
            Map("name" -> c.name, "col_type" -> c.colType, "sort_order" -> c.sortOrder.toString)))
        val colDescs = t.columns.flatMap(c => c.description.map(d =>
          GraphNode(t.columnDescriptionKey(c), DescriptionLabel,
            Map("description" -> d, "description_source" -> "description"))))
        hierarchy ++ Seq(table) ++ tableDesc.toSeq ++ tagNodes ++ colNodes ++ colDescs
      }

      def relationships(t: TableMetadata): Seq[GraphRelationship] = {
        val none = Map.empty[String, String]
        val chain = Seq(
          GraphRelationship(DatabaseLabel, ClusterLabel, t.databaseKey, t.clusterKey,
            "CLUSTER", "CLUSTER_OF", none),
          GraphRelationship(ClusterLabel, SchemaLabel, t.clusterKey, t.schemaKey,
            "SCHEMA", "SCHEMA_OF", none),
          GraphRelationship(SchemaLabel, TableLabel, t.schemaKey, t.tableKey,
            "TABLE", "TABLE_OF", none))
        val desc = t.description.map(_ =>
          GraphRelationship(TableLabel, t.descriptionLabel, t.tableKey, t.descriptionKey,
            "DESCRIPTION", "DESCRIPTION_OF", none))
        val tagRels = t.tags.map(tag =>
          GraphRelationship(TableLabel, TagLabel, t.tableKey, tag,
            "TAGGED_BY", "TAG", none))
        val colRels = t.columns.map(c =>
          GraphRelationship(TableLabel, ColumnLabel, t.tableKey, t.columnKey(c),
            "COLUMN", "COLUMN_OF", none))
        val colDescRels = t.columns.flatMap(c => c.description.map(_ =>
          GraphRelationship(ColumnLabel, DescriptionLabel, t.columnKey(c), t.columnDescriptionKey(c),
            "DESCRIPTION", "DESCRIPTION_OF", none)))
        chain ++ desc.toSeq ++ tagRels ++ colRels ++ colDescRels
      }
    }
}
