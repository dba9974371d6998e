package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.sources.Tables

/** End-to-end graph build: domain records → GraphSerializable flatMap →
  * deduplicated node/edge DataFrames (SURVEY §3.1 "Spark shape").
  *
  * The synthetic catalog is derived deterministically from the star schema
  * (documented mapping, so the DuckDB oracle can recompute expected counts):
  *   database = 'tpch', cluster = region name, schema = nation name,
  *   table = customer, table description = market segment,
  *   columns = the customer's orders (name `o`+zero-padded orderkey,
  *   col_type = order status, description = order priority,
  *   sort_order = orderkey), tags = [lower(segment)].
  *
  * Scale notes: the serializer fan-out is a narrow flatMap (no shuffle);
  * dedup shuffles once on (label, key) — the natural partitioning for any
  * downstream publisher merge, which can reuse it.
  */
object GraphBuild {

  def tableMetadata(spark: SparkSession, dir: String): Dataset[TableMetadata] = {
    import spark.implicits._
    val colAgg = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(struct(
        concat(lit("o"), lpad(col("o_orderkey").cast("string"), 8, "0")).as("name"),
        col("o_orderpriority").as("description"),
        col("o_orderstatus").as("colType"),
        col("o_orderkey").cast("int").as("sortOrder"),
        array().cast("array<string>").as("badges")
      ))).as("columns"))
    Tables(spark, dir, "customer")
      .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .join(colAgg, col("c_custkey") === col("o_custkey"), "left")
      .select(
        lit("tpch").as("database"),
        col("r_name").as("cluster"),
        col("n_name").as("schema"),
        col("c_name").as("name"),
        col("c_mktsegment").as("description"),
        coalesce(col("columns"), array().cast(
          "array<struct<name:string,description:string,colType:string,sortOrder:int,badges:array<string>>>"))
          .as("columns"),
        lit(false).as("isView"),
        array(lower(col("c_mktsegment"))).as("tags"),
        lit(null).cast("string").as("descriptionSource"))
      .as[TableMetadata]
  }

  /** Serializer fan-out → deduplicated node table. */
  def nodes(ds: Dataset[TableMetadata]): Dataset[GraphNode] = {
    import ds.sparkSession.implicits._
    val ser = TableMetadata.serializer
    ds.flatMap(t => ser.nodes(t).filter(Graph.nodeValid))
      .dropDuplicates("label", "key")
  }

  /** Serializer fan-out → deduplicated edge table. */
  def edges(ds: Dataset[TableMetadata]): Dataset[GraphRelationship] = {
    import ds.sparkSession.implicits._
    val ser = TableMetadata.serializer
    ds.flatMap(t => ser.relationships(t).filter(Graph.relationshipValid))
      .dropDuplicates("startKey", "endKey", "relType")
  }

  /** (custkey → table key) map used by the usage / last-updated fan-outs. */
  private def keyedTables(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"),
        concat(lit("tpch://"), col("r_name"), lit("."), col("n_name"), lit("/"),
          col("c_name")).as("tableKey"))

  /** Usage fan-out: READ_BY edges (+User nodes) per (table, supplier) with
    * read_count = its lineitem count — the TableColumnUsage model over the
    * star schema (table_column_usage.py:19-132). */
  def usage(spark: SparkSession, dir: String): Dataset[TableUsage] =
    usageFrom(spark, dir, keyedTables(spark, dir))

  private def usageFrom(spark: SparkSession, dir: String, keyed: DataFrame): Dataset[TableUsage] = {
    import spark.implicits._
    Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("readCount"))
      .join(keyed, col("o_custkey") === col("c_custkey"))
      .select(col("tableKey"), concat(lit("s"), col("l_suppkey")).as("userEmail"),
        col("readCount"))
      .as[TableUsage]
  }

  /** Timestamp fan-out: LAST_UPDATED_AT per table = max order date
    * (table_last_updated.py:17-125). */
  def lastUpdated(spark: SparkSession, dir: String): Dataset[TableLastUpdated] =
    lastUpdatedFrom(spark, dir, keyedTables(spark, dir))

  private def lastUpdatedFrom(spark: SparkSession, dir: String, keyed: DataFrame): Dataset[TableLastUpdated] = {
    import spark.implicits._
    Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).cast("timestamp").cast("long").as("lastUpdatedEpoch"))
      .join(keyed, col("o_custkey") === col("c_custkey"))
      .select(col("tableKey"), col("lastUpdatedEpoch"))
      .as[TableLastUpdated]
  }

  /** The full published-graph shape the search-document queries read
    * (neo4j_search_data_extractor.py reads the published graph, :161-175):
    * metadata graph ∪ usage ∪ last-updated, deduplicated. The domain
    * Dataset and the key map are persisted — each feeds two consumers
    * (node + edge fan-out), and recomputing the collect_list fold twice
    * doubles the graph-build cost for nothing. */
  def searchGraph(spark: SparkSession, dir: String): (Dataset[GraphNode], Dataset[GraphRelationship]) = {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val md = tableMetadata(spark, dir).persist(StorageLevel.MEMORY_AND_DISK)
    val keyed = keyedTables(spark, dir).persist(StorageLevel.MEMORY_AND_DISK)
    val usg = usageFrom(spark, dir, keyed).persist(StorageLevel.MEMORY_AND_DISK)
    val ts = lastUpdatedFrom(spark, dir, keyed)
    val mdSer = TableMetadata.serializer
    val usgSer = TableUsage.serializer
    val tsSer = TableLastUpdated.serializer
    // raw fan-outs unioned first, ONE dedup shuffle at the end (dedup
    // before + after the union would shuffle the big component twice)
    val allNodes = md.flatMap(t => mdSer.nodes(t).filter(Graph.nodeValid))
      .union(usg.flatMap(u => usgSer.nodes(u).filter(Graph.nodeValid)))
      .union(ts.flatMap(t => tsSer.nodes(t).filter(Graph.nodeValid)))
      .dropDuplicates("label", "key")
    val allEdges = md.flatMap(t => mdSer.relationships(t).filter(Graph.relationshipValid))
      .union(usg.flatMap(u => usgSer.relationships(u).filter(Graph.relationshipValid)))
      .union(ts.flatMap(t => tsSer.relationships(t).filter(Graph.relationshipValid)))
      .dropDuplicates("startKey", "endKey", "relType")
    (allNodes, allEdges)
  }

  /** Table-level lineage fan-out — HAS_DOWNSTREAM/HAS_UPSTREAM edges, no
    * nodes (table_lineage.py:15-121); pairs = distinct (part, supplier)
    * so the run is deterministic. */
  def lineageEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ser = TableLineage.serializer
    Tables(spark, dir, "lineitem")
      .select(
        concat(lit("tpch://part/"), col("l_partkey")).as("sourceTableKey"),
        concat(lit("tpch://sup/"), col("l_suppkey")).as("targetTableKey"))
      .distinct()
      .as[TableLineage]
      .flatMap(l => ser.relationships(l).filter(Graph.relationshipValid))
      .select(col("startKey").as("source_key"), col("endKey").as("target_key"),
        col("relType").as("rel_type"), col("reverseType").as("reverse_type"))
      .orderBy("source_key", "target_key")
  }

  /** Grouped node count per label — the staleness guardrail shape
    * (reference: databuilder/task/neo4j_staleness_removal_task.py:211-232). */
  def nodeCounts(spark: SparkSession, dir: String): DataFrame =
    nodes(tableMetadata(spark, dir)).groupBy("label")
      .agg(count(lit(1)).as("n")).orderBy("label")

  def edgeCounts(spark: SparkSession, dir: String): DataFrame =
    edges(tableMetadata(spark, dir)).groupBy(col("relType").as("rel_type"))
      .agg(count(lit(1)).as("n")).orderBy("rel_type")

  /** Per-row value check of the Table nodes (key format + attributes). */
  def tableNodes(spark: SparkSession, dir: String): DataFrame =
    nodes(tableMetadata(spark, dir))
      .filter(col("label") === TableMetadata.TableLabel)
      .select(col("key"),
        col("attributes")("name").as("name"),
        col("attributes")("is_view").as("is_view"))
      .orderBy("key")
}
