package graft.model

/** Dashboard model family (reference databuilder/models/dashboard/):
  * dashboard_metadata.py:25-365 (group/cluster/description/tag fan-out),
  * dashboard_query.py:21, dashboard_chart.py:21, dashboard_execution.py:21,
  * dashboard_usage.py:25, dashboard_table.py:23. Key formats follow
  * `{product}_dashboard://{cluster}.{group}/{name}` exactly.
  */
case class DashboardMetadata(
    dashboardGroup: String,
    dashboardName: String,
    description: Option[String],
    tags: Seq[String] = Nil,
    cluster: String = "gold",
    product: String = "",
    dashboardGroupDescription: Option[String] = None,
    createdTimestamp: Option[Long] = None,
    dashboardUrl: Option[String] = None,
    groupUrl: Option[String] = None) {
  def clusterKey: String = s"${product}_dashboard://$cluster"
  def groupKey: String = s"${product}_dashboard://$cluster.$dashboardGroup"
  def groupDescriptionKey: String = s"$groupKey/_description"
  def dashboardKey: String = s"$groupKey/$dashboardName"
  def descriptionKey: String = s"$dashboardKey/_description"
}

case class DashboardQuery(
    dashboardGroup: String,
    dashboardName: String,
    queryId: String,
    queryName: String,
    cluster: String = "gold",
    product: String = "") {
  def dashboardKey: String = s"${product}_dashboard://$cluster.$dashboardGroup/$dashboardName"
  def queryKey: String = s"$dashboardKey/query/$queryId"
}

case class DashboardChart(
    dashboardGroup: String,
    dashboardName: String,
    queryId: String,
    chartId: String,
    chartName: String,
    cluster: String = "gold",
    product: String = "") {
  def queryKey: String =
    s"${product}_dashboard://$cluster.$dashboardGroup/$dashboardName/query/$queryId"
  def chartKey: String = s"$queryKey/chart/$chartId"
}

case class DashboardExecution(
    dashboardGroup: String,
    dashboardName: String,
    executionId: String,
    timestamp: Long,
    state: String,
    cluster: String = "gold",
    product: String = "") {
  def dashboardKey: String = s"${product}_dashboard://$cluster.$dashboardGroup/$dashboardName"
  def executionKey: String = s"$dashboardKey/execution/$executionId"
}

case class DashboardUsage(
    dashboardGroup: String,
    dashboardName: String,
    email: String,
    viewCount: Long,
    cluster: String = "gold",
    product: String = "") {
  def dashboardKey: String = s"${product}_dashboard://$cluster.$dashboardGroup/$dashboardName"
}

case class DashboardTable(
    dashboardGroup: String,
    dashboardName: String,
    tableKey: String,
    cluster: String = "gold",
    product: String = "") {
  def dashboardKey: String = s"${product}_dashboard://$cluster.$dashboardGroup/$dashboardName"
}

/** Dashboard ownership — OWNER/OWNER_OF between Dashboard and User
  * (reference: dashboard_owner.py:23-71, owner_constants.py:5-6). */
case class DashboardOwner(
    dashboardGroup: String,
    dashboardName: String,
    email: String,
    cluster: String = "gold",
    product: String = "") {
  def dashboardKey: String = s"${product}_dashboard://$cluster.$dashboardGroup/$dashboardName"
}

/** Dashboard last-modified Timestamp node keyed
  * `{dashboard_key}/_last_modified_timestamp`
  * (reference: dashboard_last_modified.py:22-108, timestamp_constants.py). */
case class DashboardLastModified(
    dashboardGroup: String,
    dashboardName: String,
    lastModifiedTimestamp: Long,
    cluster: String = "gold",
    product: String = "") {
  def dashboardKey: String = s"${product}_dashboard://$cluster.$dashboardGroup/$dashboardName"
  def key: String = s"$dashboardKey/_last_modified_timestamp"
}

object Dashboard {
  val ClusterLabel = "Cluster"
  val GroupLabel = "Dashboardgroup"
  val DashboardLabel = "Dashboard"
  val DescriptionLabel = "Description"
  val TagLabel = "Tag"
  val QueryLabel = "Query"
  val ChartLabel = "Chart"
  val ExecutionLabel = "Execution"
  val UserLabel = "User"
  val TableLabel = "Table"

  private val none = Map.empty[String, String]

  implicit val metadataSerializer: GraphSerializable[DashboardMetadata] =
    new GraphSerializable[DashboardMetadata] {
      def nodes(d: DashboardMetadata): Seq[GraphNode] = {
        val cluster = GraphNode(d.clusterKey, ClusterLabel, Map("name" -> d.cluster))
        // urls ride the nodes only when set (dashboard_metadata.py:160-180)
        val group = GraphNode(d.groupKey, GroupLabel,
          Map("name" -> d.dashboardGroup) ++
            d.groupUrl.map("dashboard_group_url" -> _))
        val groupDesc = d.dashboardGroupDescription.map(t =>
          GraphNode(d.groupDescriptionKey, DescriptionLabel, Map("description" -> t)))
        val dash = GraphNode(d.dashboardKey, DashboardLabel,
          Map("name" -> d.dashboardName) ++
            d.createdTimestamp.map(t => "created_timestamp" -> t.toString) ++
            d.dashboardUrl.map("dashboard_url" -> _))
        val desc = d.description.map(t =>
          GraphNode(d.descriptionKey, DescriptionLabel, Map("description" -> t)))
        val tags = d.tags.map(t => GraphNode(t, TagLabel, Map("tag_type" -> "default")))
        Seq(cluster, group) ++ groupDesc.toSeq ++ Seq(dash) ++ desc.toSeq ++ tags
      }
      def relationships(d: DashboardMetadata): Seq[GraphRelationship] = {
        val base = Seq(
          GraphRelationship(ClusterLabel, GroupLabel, d.clusterKey, d.groupKey,
            "DASHBOARD_GROUP", "DASHBOARD_GROUP_OF", none),
          GraphRelationship(GroupLabel, DashboardLabel, d.groupKey, d.dashboardKey,
            "DASHBOARD", "DASHBOARD_OF", none))
        val groupDesc = d.dashboardGroupDescription.map(_ =>
          GraphRelationship(GroupLabel, DescriptionLabel, d.groupKey, d.groupDescriptionKey,
            "DESCRIPTION", "DESCRIPTION_OF", none))
        val desc = d.description.map(_ =>
          GraphRelationship(DashboardLabel, DescriptionLabel, d.dashboardKey, d.descriptionKey,
            "DESCRIPTION", "DESCRIPTION_OF", none))
        val tags = d.tags.map(t =>
          GraphRelationship(DashboardLabel, TagLabel, d.dashboardKey, t, "TAG", "TAG_OF", none))
        base ++ groupDesc.toSeq ++ desc.toSeq ++ tags
      }
    }

  implicit val querySerializer: GraphSerializable[DashboardQuery] =
    new GraphSerializable[DashboardQuery] {
      def nodes(q: DashboardQuery): Seq[GraphNode] = Seq(
        GraphNode(q.queryKey, QueryLabel, Map("id" -> q.queryId, "name" -> q.queryName)))
      def relationships(q: DashboardQuery): Seq[GraphRelationship] = Seq(
        GraphRelationship(DashboardLabel, QueryLabel, q.dashboardKey, q.queryKey,
          "HAS_QUERY", "QUERY_OF", none))
    }

  implicit val chartSerializer: GraphSerializable[DashboardChart] =
    new GraphSerializable[DashboardChart] {
      def nodes(c: DashboardChart): Seq[GraphNode] = Seq(
        GraphNode(c.chartKey, ChartLabel, Map("id" -> c.chartId, "name" -> c.chartName)))
      def relationships(c: DashboardChart): Seq[GraphRelationship] = Seq(
        GraphRelationship(QueryLabel, ChartLabel, c.queryKey, c.chartKey,
          "HAS_CHART", "CHART_OF", none))
    }

  implicit val executionSerializer: GraphSerializable[DashboardExecution] =
    new GraphSerializable[DashboardExecution] {
      def nodes(e: DashboardExecution): Seq[GraphNode] = Seq(
        GraphNode(e.executionKey, ExecutionLabel,
          Map("timestamp" -> e.timestamp.toString, "state" -> e.state)))
      def relationships(e: DashboardExecution): Seq[GraphRelationship] = Seq(
        GraphRelationship(DashboardLabel, ExecutionLabel, e.dashboardKey, e.executionKey,
          "EXECUTED", "EXECUTION_OF", none))
    }

  implicit val usageSerializer: GraphSerializable[DashboardUsage] =
    new GraphSerializable[DashboardUsage] {
      def nodes(u: DashboardUsage): Seq[GraphNode] = Nil
      def relationships(u: DashboardUsage): Seq[GraphRelationship] = Seq(
        GraphRelationship(DashboardLabel, UserLabel, u.dashboardKey, u.email,
          "READ_BY", "READ", Map("read_count" -> u.viewCount.toString)))
    }

  implicit val tableSerializer: GraphSerializable[DashboardTable] =
    new GraphSerializable[DashboardTable] {
      def nodes(t: DashboardTable): Seq[GraphNode] = Nil
      def relationships(t: DashboardTable): Seq[GraphRelationship] = Seq(
        GraphRelationship(DashboardLabel, TableLabel, t.dashboardKey, t.tableKey,
          "DASHBOARD_WITH_TABLE", "TABLE_OF_DASHBOARD", none))
    }

  implicit val ownerSerializer: GraphSerializable[DashboardOwner] =
    new GraphSerializable[DashboardOwner] {
      def nodes(o: DashboardOwner): Seq[GraphNode] = Nil
      def relationships(o: DashboardOwner): Seq[GraphRelationship] = Seq(
        GraphRelationship(DashboardLabel, UserLabel, o.dashboardKey, o.email,
          "OWNER", "OWNER_OF", none))
    }

  val TimestampLabel = "Timestamp"
  implicit val lastModifiedSerializer: GraphSerializable[DashboardLastModified] =
    new GraphSerializable[DashboardLastModified] {
      def nodes(m: DashboardLastModified): Seq[GraphNode] = Seq(
        GraphNode(m.key, TimestampLabel, Map(
          "timestamp" -> m.lastModifiedTimestamp.toString,
          "name" -> "last_updated_timestamp")))
      def relationships(m: DashboardLastModified): Seq[GraphRelationship] = Seq(
        GraphRelationship(DashboardLabel, TimestampLabel, m.dashboardKey, m.key,
          "LAST_UPDATED_AT", "LAST_UPDATED_TIME_OF", none))
    }
}
