package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
  * Scale: all fan-outs are columnar (the GraphSerializable typeclasses
  * remain the semantic definition, spec-asserted equal); only the
  * branches that can produce duplicate keys shuffle — the query grain as
  * a slim distinct, the dashboard-family fan-out as a small dedup — and
  * the per-lineitem chart branch never shuffles at all.
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
      lit(null).cast("long").as("createdTimestamp"),
      concat(lit("https://mode.example/"), col("p_brand"), lit("/d"),
        col("p_partkey")).as("dashboardUrl"),
      concat(lit("https://mode.example/"), col("p_brand")).as("groupUrl"))
      .as[DashboardMetadata]
  }

  /** lineitem ⋈ part (broadcast), slimmed to the columns the dashboard
    * fan-outs read. Deliberately NOT persisted even though up to six
    * fan-out branches re-derive it: the branches are narrow scans that
    * run concurrently on otherwise-idle cores and each prunes further
    * (measured 2x faster than persist+eager-materialize, which
    * serializes the build and blocks column pruning below the cache).
    * The scan is repartitioned first — the fan-outs are narrow, so their
    * parallelism is the scan's, and a single unsplittable file would
    * otherwise run them in one task. */
  private def liWithPart(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .repartition(spark.sparkContext.defaultParallelism)
      .join(broadcast(Tables(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_shipdate"), col("p_brand"), col("p_partkey"))

  /** The stage-once path for the fan-out's fact side: write the slim
    * projection to parquet ONCE, then let every branch re-read the staged
    * file instead of re-deriving the scan+join. At bench SF the inline
    * plan wins (branches are narrow, run concurrently, and prune further
    * per branch); at 100 TB six branches × a full fact re-scan is 6× the
    * I/O and the staged slim file — a fraction of the fact table's width —
    * is the production shape. Both paths are spec-asserted equal. */
  def stageFacts(spark: SparkSession, dir: String, outDir: String): String = {
    liWithPart(spark, dir).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(outDir)
    outDir
  }

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

  def executions(spark: SparkSession, dir: String): Dataset[DashboardExecution] =
    executionsFrom(liWithPart(spark, dir))

  private def executionsFrom(facts: DataFrame): Dataset[DashboardExecution] = {
    import facts.sparkSession.implicits._
    facts
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

  /** Typeclass fan-out — the semantic definition the columnar paths are
    * spec-asserted against (and the path low-volume callers can use). */
  def nodesOf[T](ds: Dataset[T])(implicit s: GraphSerializable[T]): Dataset[GraphNode] = {
    import ds.sparkSession.implicits._
    ds.flatMap(t => s.nodes(t).filter(Graph.nodeValid))
  }

  def edgesOf[T](ds: Dataset[T])(implicit s: GraphSerializable[T]): Dataset[GraphRelationship] = {
    import ds.sparkSession.implicits._
    ds.flatMap(t => s.relationships(t).filter(Graph.relationshipValid))
  }

  // Columnar fan-out for the two per-event (high-volume) models — Query
  // and Chart nodes/edges as pure column expressions over the lineitem
  // scan; spec-asserted identical to the typeclass output (up to the
  // (label, key) dedup).
  //
  // Scale shape: the Query grain is a DISTINCT over a slim key triple
  // (one shuffle of 3 narrow columns), from which both the Query nodes
  // and the HAS_QUERY edges derive — the fat attribute maps are built
  // AFTER the dedup, on the already-unique rows. Chart nodes/edges are
  // keyed by the lineitem primary key, so they are unique by construction
  // and never shuffle at all.
  private def dashKeyOf(brand: Column, partkey: Column): Column =
    concat(lit(s"${Product}_dashboard://$Cluster."), brand, lit("/d"), partkey)

  /** One row per (group, dashboard, query) — the slim distinct both
    * query-grain fan-outs derive from. */
  private def queryGrain(facts: DataFrame): DataFrame =
    facts
      .select(col("p_brand"), col("p_partkey"), col("l_suppkey"))
      .distinct()

  private def chartCols(facts: DataFrame): DataFrame = {
    val queryKey = concat(dashKeyOf(col("p_brand"), col("p_partkey")),
      lit("/query/q"), col("l_suppkey"))
    facts.select(
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      queryKey.as("_query_key"),
      concat(queryKey, lit("/chart/"), col("l_orderkey"), lit("_"),
        col("l_linenumber")).as("_chart_key"))
  }

  private val noAttrs = map().cast("map<string,string>")

  private[graft] def columnarQueryChartNodes(spark: SparkSession, dir: String): DataFrame =
    columnarQueryChartNodesFrom(liWithPart(spark, dir))

  private def columnarQueryChartNodesFrom(facts: DataFrame): DataFrame = {
    val q = queryGrain(facts)
    val queryKey = concat(dashKeyOf(col("p_brand"), col("p_partkey")),
      lit("/query/q"), col("l_suppkey"))
    q.select(queryKey.as("key"), lit(QueryLabel).as("label"),
        map(lit("id"), concat(lit("q"), col("l_suppkey")),
          lit("name"), concat(lit("supplier "), col("l_suppkey"))).as("attributes"))
      .union(chartCols(facts)
        .select(col("_chart_key").as("key"), lit(ChartLabel).as("label"),
          map(lit("id"), concat(col("l_orderkey"), lit("_"), col("l_linenumber")),
            lit("name"), col("l_returnflag")).as("attributes")))
  }

  private[graft] def columnarQueryChartEdges(spark: SparkSession, dir: String): DataFrame =
    columnarQueryChartEdgesFrom(liWithPart(spark, dir))

  private def columnarQueryChartEdgesFrom(facts: DataFrame): DataFrame = {
    val q = queryGrain(facts)
    val dashKey = dashKeyOf(col("p_brand"), col("p_partkey"))
    q.select(lit(DashboardLabel).as("startLabel"), lit(QueryLabel).as("endLabel"),
        dashKey.as("startKey"),
        concat(dashKey, lit("/query/q"), col("l_suppkey")).as("endKey"),
        lit("HAS_QUERY").as("relType"), lit("QUERY_OF").as("reverseType"),
        noAttrs.as("attributes"))
      .union(chartCols(facts)
        .select(lit(QueryLabel).as("startLabel"), lit(ChartLabel).as("endLabel"),
          col("_query_key").as("startKey"), col("_chart_key").as("endKey"),
          lit("HAS_CHART").as("relType"), lit("CHART_OF").as("reverseType"),
          noAttrs.as("attributes")))
  }

  // Columnar fan-out of the DashboardMetadata + Execution models —
  // spec-asserted identical to the typeclass serializers, which remain
  // the semantic definition. The group-description branch is omitted
  // because this mapping never sets dashboardGroupDescription.
  private def dashKeys(md: DataFrame): DataFrame = {
    val groupKey = concat(lit(s"${Product}_dashboard://$Cluster."), col("dashboardGroup"))
    md.withColumn("_cluster_key", lit(s"${Product}_dashboard://$Cluster"))
      .withColumn("_group_key", groupKey)
      .withColumn("_dash_key", concat(groupKey, lit("/"), col("dashboardName")))
  }

  private def m(kvs: (String, Column)*): Column =
    map(kvs.flatMap { case (k, v) => Seq(lit(k), v) }: _*)

  private[graft] def columnarDashboardNodes(spark: SparkSession, dir: String): DataFrame = {
    val md = dashKeys(dashboards(spark, dir).toDF())
    md.select(explode(array(
        struct(col("_cluster_key").as("key"), lit(ClusterLabel).as("label"),
          m("name" -> lit(Cluster)).as("attributes")),
        struct(col("_group_key").as("key"), lit(GroupLabel).as("label"),
          m("name" -> col("dashboardGroup"),
            "dashboard_group_url" -> col("groupUrl")).as("attributes")),
        struct(col("_dash_key").as("key"), lit(DashboardLabel).as("label"),
          m("name" -> col("dashboardName"),
            "dashboard_url" -> col("dashboardUrl")).as("attributes")))).as("n"))
      .select("n.*")
      .union(md.filter(col("description").isNotNull)
        .select(concat(col("_dash_key"), lit("/_description")).as("key"),
          lit(DescriptionLabel).as("label"),
          m("description" -> col("description")).as("attributes")))
      .union(md.select(explode(col("tags")).as("key"))
        .select(col("key"), lit(TagLabel).as("label"),
          m("tag_type" -> lit("default")).as("attributes")))
  }

  private[graft] def columnarDashboardEdges(spark: SparkSession, dir: String): DataFrame = {
    val md = dashKeys(dashboards(spark, dir).toDF())
    def e(sl: String, el: String, sk: Column, ek: Column, t: String, rt: String) =
      struct(lit(sl).as("startLabel"), lit(el).as("endLabel"), sk.as("startKey"),
        ek.as("endKey"), lit(t).as("relType"), lit(rt).as("reverseType"),
        noAttrs.as("attributes"))
    md.select(explode(array(
        e(ClusterLabel, GroupLabel, col("_cluster_key"), col("_group_key"),
          "DASHBOARD_GROUP", "DASHBOARD_GROUP_OF"),
        e(GroupLabel, DashboardLabel, col("_group_key"), col("_dash_key"),
          "DASHBOARD", "DASHBOARD_OF"))).as("r"))
      .select("r.*")
      .union(md.filter(col("description").isNotNull).select(
        e(DashboardLabel, DescriptionLabel, col("_dash_key"),
          concat(col("_dash_key"), lit("/_description")),
          "DESCRIPTION", "DESCRIPTION_OF").as("r")).select("r.*"))
      .union(md.select(col("_dash_key"), explode(col("tags")).as("tag")).select(
        e(DashboardLabel, TagLabel, col("_dash_key"), col("tag"),
          "TAG", "TAG_OF").as("r")).select("r.*"))
  }

  private[graft] def columnarExecutionNodes(spark: SparkSession, dir: String): DataFrame =
    columnarExecutionNodesFrom(executions(spark, dir).toDF())

  private def columnarExecutionNodesFrom(exDf: DataFrame): DataFrame = {
    val ex = dashKeys(exDf)
    ex.select(concat(col("_dash_key"), lit("/execution/"), col("executionId")).as("key"),
      lit(ExecutionLabel).as("label"),
      m("timestamp" -> col("timestamp").cast("string"),
        "state" -> col("state")).as("attributes"))
  }

  private[graft] def columnarExecutionEdges(spark: SparkSession, dir: String): DataFrame =
    columnarExecutionEdgesFrom(executions(spark, dir).toDF())

  private def columnarExecutionEdgesFrom(exDf: DataFrame): DataFrame = {
    val ex = dashKeys(exDf)
    ex.select(lit(DashboardLabel).as("startLabel"), lit(ExecutionLabel).as("endLabel"),
      col("_dash_key").as("startKey"),
      concat(col("_dash_key"), lit("/execution/"), col("executionId")).as("endKey"),
      lit("EXECUTED").as("relType"), lit("EXECUTION_OF").as("reverseType"),
      noAttrs.as("attributes"))
  }

  /** Dashboard badge fan-out (badge.py Badge rows with start_label
    * Dashboard): every fifth dashboard carries a deterministic
    * 'certified' badge. Nodes collapse to the distinct badge keys. */
  private[graft] def columnarBadgeNodes(spark: SparkSession, dir: String): DataFrame =
    dashKeys(dashboards(spark, dir).toDF())
      .filter(substring(col("dashboardName"), 2, 100).cast("long") % 5 === 0)
      .select(lit("certified").as("key")).distinct()
      .select(col("key"), lit("Badge").as("label"),
        m("category" -> lit("dashboard_status")).as("attributes"))

  private[graft] def columnarBadgeEdges(spark: SparkSession, dir: String): DataFrame =
    dashKeys(dashboards(spark, dir).toDF())
      .filter(substring(col("dashboardName"), 2, 100).cast("long") % 5 === 0)
      .select(lit(DashboardLabel).as("startLabel"), lit("Badge").as("endLabel"),
        col("_dash_key").as("startKey"), lit("certified").as("endKey"),
        lit("HAS_BADGE").as("relType"), lit("BADGE_FOR").as("reverseType"),
        noAttrs.as("attributes"))

  // The global (label, key) dedup decomposes per-branch: every branch
  // emits a disjoint label set (Dashboard-family vs Query/Chart vs
  // Execution), so per-branch dedup is EXACTLY the same multiset as a
  // global one — each branch shuffles only its own slim rows. The
  // query/chart branch MUST dedup: the synthetic lineitem data contains
  // duplicate (part, supplier, order, linenumber) tuples, and a MERGE
  // publisher collapses same-key nodes/edges — the graph contract is
  // key-unique. Execution keys are unique (one row per dashboard after
  // the groupBy), so that branch skips the shuffle.
  def nodes(spark: SparkSession, dir: String): Dataset[GraphNode] =
    nodesImpl(spark, dir, () => liWithPart(spark, dir))

  def edges(spark: SparkSession, dir: String): Dataset[GraphRelationship] =
    edgesImpl(spark, dir, () => liWithPart(spark, dir))

  /** Stage-once variants: every fan-out branch reads the staged slim
    * projection instead of re-deriving the fact scan — the 100 TB shape
    * (see stageFacts). The thunk is called once per branch, but each call
    * is a parquet read of the SAME small staged file. */
  def nodesStaged(spark: SparkSession, dir: String, stageDir: String): Dataset[GraphNode] =
    nodesImpl(spark, dir, () => spark.read.parquet(stageDir))

  def edgesStaged(spark: SparkSession, dir: String,
      stageDir: String): Dataset[GraphRelationship] =
    edgesImpl(spark, dir, () => spark.read.parquet(stageDir))

  private def nodesImpl(spark: SparkSession, dir: String,
      facts: () => DataFrame): Dataset[GraphNode] = {
    import spark.implicits._
    columnarDashboardNodes(spark, dir)
      .dropDuplicates("label", "key")
      .union(columnarExecutionNodesFrom(executionsFrom(facts()).toDF()))
      .union(columnarQueryChartNodesFrom(facts()).dropDuplicates("label", "key"))
      .union(columnarBadgeNodes(spark, dir))
      .as[GraphNode]
  }

  private def edgesImpl(spark: SparkSession, dir: String,
      facts: () => DataFrame): Dataset[GraphRelationship] = {
    import spark.implicits._
    columnarDashboardEdges(spark, dir)
      .dropDuplicates("startKey", "endKey", "relType")
      .union(columnarExecutionEdgesFrom(executionsFrom(facts()).toDF()))
      .union(columnarQueryChartEdgesFrom(facts())
        .dropDuplicates("startKey", "endKey", "relType"))
      .union(columnarBadgeEdges(spark, dir))
      .as[GraphRelationship]
  }

  /** Node count per label — the guardrail shape over the dashboard graph. */
  def nodeCounts(spark: SparkSession, dir: String): DataFrame =
    nodes(spark, dir).groupBy("label")
      .agg(count(lit(1)).as("n")).orderBy("label")

  /** Stage-once twin of nodeCounts under the SAME oracle: the fan-out
    * branches read a staged slim fact projection (written here, once per
    * run) instead of six inline re-scans — the 100 TB shape, priced
    * against the inline path in every bench round. */
  def nodeCountsStaged(spark: SparkSession, dir: String): DataFrame = {
    val staged =
      graft.sources.TmpStores.pidScopedRoot("graft-dash-facts").toString
    stageFacts(spark, dir, staged)
    nodesStaged(spark, dir, staged).groupBy("label")
      .agg(count(lit(1)).as("n")).orderBy("label")
  }
}
