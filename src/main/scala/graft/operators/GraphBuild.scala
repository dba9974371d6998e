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
