package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.model.Dashboard._
import graft.sources.Tables

/** Dashboard-family graph build: the Mode/Redash/Tableau extractor output
  * re-expressed over a deterministic TPC-H mapping, exercising every
  * dashboard model serializer (group → dashboard → query → chart +
  * executions).
  *
  * Mapping (documented so the oracle can recompute counts):
  *   product 'mode', cluster 'gold'; dashboard group = part brand,
  *   dashboard = part ('d'+partkey), description = part type,
  *   tags = [lower(brand)]; query per distinct (part, supplier) of its
  *   lineitems ('q'+suppkey); chart per lineitem ('{orderkey}_{linenumber}');
  *   one last-successful execution per part with lineitems (max shipdate).
  *
  * Scale: fan-outs are narrow flatMaps; the single shuffle per output is
  * the (label, key) dedup, as in GraphBuild.
  */
object DashboardBuild {

  private val Product = "mode"
  private val Cluster = "gold"

  def dashboards(spark: SparkSession, dir: String): Dataset[DashboardMetadata] = {
    import spark.implicits._
    Tables(spark, dir, "part").select(
      col("p_brand").as("dashboardGroup"),
      concat(lit("d"), col("p_partkey")).as("dashboardName"),
      col("p_type").as("description"),
      array(lower(col("p_brand"))).as("tags"),
      lit(Cluster).as("cluster"),
      lit(Product).as("product"),
      lit(null).cast("string").as("dashboardGroupDescription"),
      lit(null).cast("long").as("createdTimestamp"))
      .as[DashboardMetadata]
  }

  private def liWithPart(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .join(broadcast(Tables(spark, dir, "part")), col("l_partkey") === col("p_partkey"))

  def queries(spark: SparkSession, dir: String): Dataset[DashboardQuery] = {
    import spark.implicits._
    liWithPart(spark, dir)
      .select(
        col("p_brand").as("dashboardGroup"),
        concat(lit("d"), col("p_partkey")).as("dashboardName"),
        concat(lit("q"), col("l_suppkey")).as("queryId"),
        concat(lit("supplier "), col("l_suppkey")).as("queryName"),
        lit(Cluster).as("cluster"),
        lit(Product).as("product"))
      .distinct()
      .as[DashboardQuery]
  }

  def charts(spark: SparkSession, dir: String): Dataset[DashboardChart] = {
    import spark.implicits._
    liWithPart(spark, dir)
      .select(
        col("p_brand").as("dashboardGroup"),
        concat(lit("d"), col("p_partkey")).as("dashboardName"),
        concat(lit("q"), col("l_suppkey")).as("queryId"),
        concat(col("l_orderkey"), lit("_"), col("l_linenumber")).as("chartId"),
        col("l_returnflag").as("chartName"),
        lit(Cluster).as("cluster"),
        lit(Product).as("product"))
      .as[DashboardChart]
  }

  def executions(spark: SparkSession, dir: String): Dataset[DashboardExecution] = {
    import spark.implicits._
    liWithPart(spark, dir)
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(max(unix_timestamp(col("l_shipdate"))).as("ts"))
      .select(
        col("p_brand").as("dashboardGroup"),
        concat(lit("d"), col("p_partkey")).as("dashboardName"),
        lit("_last_successful_execution").as("executionId"),
        col("ts").as("timestamp"),
        lit("succeeded").as("state"),
        lit(Cluster).as("cluster"),
        lit(Product).as("product"))
      .as[DashboardExecution]
  }

  private def nodesOf[T](ds: Dataset[T])(implicit s: GraphSerializable[T]): Dataset[GraphNode] = {
    import ds.sparkSession.implicits._
    ds.flatMap(t => s.nodes(t).filter(Graph.nodeValid))
  }

  private def edgesOf[T](ds: Dataset[T])(implicit s: GraphSerializable[T]): Dataset[GraphRelationship] = {
    import ds.sparkSession.implicits._
    ds.flatMap(t => s.relationships(t).filter(Graph.relationshipValid))
  }

  // Columnar fan-out for the two per-event (high-volume) models — Query
  // and Chart nodes/edges as pure column expressions over the lineitem
  // scan; spec-asserted identical to the typeclass output. Low-volume
  // models (dashboards, executions) stay on the typeclass path.
  // Persisted: feeds the query-node, chart-node, and both edge fan-outs
  // (Spark's cache manager resolves the identical plan to one cache entry
  // across those consumers, so the lineitem⋈part join runs once).
  private def keyCols(df: DataFrame): DataFrame = {
    val dashKey = concat(lit(s"${Product}_dashboard://$Cluster."), col("p_brand"),
      lit("/d"), col("p_partkey"))
    val queryKey = concat(dashKey, lit("/query/q"), col("l_suppkey"))
    df.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"),
        dashKey.as("_dash_key"),
        queryKey.as("_query_key"),
        concat(queryKey, lit("/chart/"), col("l_orderkey"), lit("_"),
          col("l_linenumber")).as("_chart_key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  private val noAttrs = map().cast("map<string,string>")

  private[graft] def columnarQueryChartNodes(spark: SparkSession, dir: String): DataFrame = {
    val li = keyCols(liWithPart(spark, dir))
    li.select(col("_query_key").as("key"), lit(QueryLabel).as("label"),
        map(lit("id"), concat(lit("q"), col("l_suppkey")),
          lit("name"), concat(lit("supplier "), col("l_suppkey"))).as("attributes"))
      .union(li.select(col("_chart_key").as("key"), lit(ChartLabel).as("label"),
        map(lit("id"), concat(col("l_orderkey"), lit("_"), col("l_linenumber")),
          lit("name"), col("l_returnflag")).as("attributes")))
  }

  private[graft] def columnarQueryChartEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = keyCols(liWithPart(spark, dir))
    li.select(lit(DashboardLabel).as("startLabel"), lit(QueryLabel).as("endLabel"),
        col("_dash_key").as("startKey"), col("_query_key").as("endKey"),
        lit("HAS_QUERY").as("relType"), lit("QUERY_OF").as("reverseType"),
        noAttrs.as("attributes"))
      .union(li.select(lit(QueryLabel).as("startLabel"), lit(ChartLabel).as("endLabel"),
        col("_query_key").as("startKey"), col("_chart_key").as("endKey"),
        lit("HAS_CHART").as("relType"), lit("CHART_OF").as("reverseType"),
        noAttrs.as("attributes")))
  }

  def nodes(spark: SparkSession, dir: String): Dataset[GraphNode] = {
    import spark.implicits._
    nodesOf(dashboards(spark, dir)).toDF()
      .union(columnarQueryChartNodes(spark, dir))
      .union(nodesOf(executions(spark, dir)).toDF())
      .dropDuplicates("label", "key")
      .as[GraphNode]
  }

  def edges(spark: SparkSession, dir: String): Dataset[GraphRelationship] = {
    import spark.implicits._
    edgesOf(dashboards(spark, dir)).toDF()
      .union(columnarQueryChartEdges(spark, dir))
      .union(edgesOf(executions(spark, dir)).toDF())
      .dropDuplicates("startKey", "endKey", "relType")
      .as[GraphRelationship]
  }

  /** Node count per label — the guardrail shape over the dashboard graph. */
  def nodeCounts(spark: SparkSession, dir: String): DataFrame =
    nodes(spark, dir).groupBy("label")
      .agg(count(lit(1)).as("n")).orderBy("label")
}
