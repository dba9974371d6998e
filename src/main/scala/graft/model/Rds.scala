package graft.model

/** Relational-record universe — the reference's third output world
  * (graph / relational / search).
  *
  * TableSerializable (databuilder/models/table_serializable.py:10-37)
  * yields typed ORM rows destined for per-entity RDS tables; here that is
  * a `RowSerializable` typeclass fanning a domain record out into
  * `RdsRecord`s (one per RDS-table row) applied via `Dataset.flatMap`.
  * The reference's class-level `serialized_records_keys` global dedup
  * (table_metadata.py:611-625) becomes a distributed
  * `dropDuplicates("table","rk")` downstream.
  */
case class RdsRecord(table: String, rk: String, attributes: Map[String, String])

trait RowSerializable[T] extends Serializable {
  def records(t: T): Seq[RdsRecord]
}

object Rds {

  /** FK dependency order — parents before children, the analog of
    * `Base.metadata.sorted_tables` used by the MySQL publisher to apply
    * record files in an order that never violates a foreign key
    * (mysql_csv_publisher.py:94-103). */
  val publishOrder: Seq[String] = Seq(
    "database", "cluster", "schema", "table", "table_description",
    "tag", "table_tag", "column", "column_description")

  /** Attribute columns per RDS table (fixed StructType per table). */
  val tableAttrs: Map[String, Seq[String]] = Map(
    "database" -> Seq("name"),
    "cluster" -> Seq("name", "database_rk"),
    "schema" -> Seq("name", "cluster_rk"),
    "table" -> Seq("name", "is_view", "schema_rk"),
    "table_description" -> Seq("description", "description_source", "table_rk"),
    "tag" -> Seq("tag_type"),
    "table_tag" -> Seq("table_rk", "tag_rk"),
    "column" -> Seq("name", "col_type", "sort_order", "table_rk"),
    "column_description" -> Seq("description", "column_rk"))

  /** TableMetadata → RDS rows, mirroring the reference's record iterator
    * (table_metadata.py:606-701): database/cluster/schema chain (deduped
    * globally downstream), table, descriptions, tags + table_tag links,
    * columns + column descriptions. */
  implicit val tableMetadataRows: RowSerializable[TableMetadata] =
    new RowSerializable[TableMetadata] {
      def records(t: TableMetadata): Seq[RdsRecord] = {
        val chain = Seq(
          RdsRecord("database", t.databaseKey, Map("name" -> t.database)),
          RdsRecord("cluster", t.clusterKey,
            Map("name" -> t.cluster, "database_rk" -> t.databaseKey)),
          RdsRecord("schema", t.schemaKey,
            Map("name" -> t.schema, "cluster_rk" -> t.clusterKey)))
        val table = RdsRecord("table", t.tableKey,
          Map("name" -> t.name, "is_view" -> t.isView.toString, "schema_rk" -> t.schemaKey))
        val desc = t.description.map(d =>
          RdsRecord("table_description", t.descriptionKey,
            Map("description" -> d,
              "description_source" -> t.descriptionSource.getOrElse("description"),
              "table_rk" -> t.tableKey)))
        val tags = t.tags.flatMap(tag => Seq(
          RdsRecord("tag", tag, Map("tag_type" -> "default")),
          RdsRecord("table_tag", s"${t.tableKey}|$tag",
            Map("table_rk" -> t.tableKey, "tag_rk" -> tag))))
        val cols = t.columns.flatMap { c =>
          val colRec = RdsRecord("column", t.columnKey(c),
            Map("name" -> c.name, "col_type" -> c.colType,
              "sort_order" -> c.sortOrder.toString, "table_rk" -> t.tableKey))
          val colDesc = c.description.map(d =>
            RdsRecord("column_description", t.columnDescriptionKey(c),
              Map("description" -> d, "column_rk" -> t.columnKey(c))))
          colRec +: colDesc.toSeq
        }
        chain ++ Seq(table) ++ desc.toSeq ++ tags ++ cols
      }
    }
}
