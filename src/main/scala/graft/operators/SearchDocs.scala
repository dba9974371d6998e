package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** The three search-document queries — the correctness centerpiece
  * (reference: databuilder/extractor/neo4j_search_data_extractor.py:23-115;
  * SURVEY §2.6). The Cypher MATCH chains become inner joins over the
  * star-schema's hierarchy, OPTIONAL MATCH branches become pre-aggregated
  * left joins, and COLLECT/SUM/COUNT DISTINCT map to Spark aggregates.
  *
  * Entity mapping (same catalog mapping as GraphBuild): table=customer,
  * schema=nation, cluster=region, database='tpch'; usage comes from the
  * customer's orders' lineitems (user=supplier, read_count=#lineitems).
  *
  * Scale notes: each branch pre-aggregates to table grain BEFORE joining —
  * at 100 TB the join inputs are |tables|-sized, not |usage-events|-sized;
  * dimension sides broadcast.
  */
object SearchDocs {

  /** DEFAULT_NEO4J_TABLE_CYPHER_QUERY analog (reference :23-60). */
  def tableDocs(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders")
    val lineitem = Tables(spark, dir, "lineitem")

    // columns branch: COLLECT(col.name) per table
    val colAgg = orders.groupBy(col("o_custkey").as("ck_cols"))
      .agg(
        array_join(sort_array(collect_list(
          concat(lit("o"), lpad(col("o_orderkey").cast("string"), 8, "0")))), ",")
          .as("column_names"),
        max(col("o_orderdate")).cast("timestamp").cast("long").as("last_updated_timestamp"))

    // usage branch: SUM(read.read_count) + COUNT(DISTINCT user)
    val usageAgg = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("ck_usage"))
      .agg(count(lit(1)).as("total_usage"), countDistinct(col("l_suppkey")).as("unique_usage"))

    customer
      .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .join(colAgg, col("c_custkey") === col("ck_cols"), "left")
      .join(usageAgg, col("c_custkey") === col("ck_usage"), "left")
      .select(
        lit("tpch").as("database"),
        col("r_name").as("cluster"),
        col("n_name").as("schema"),
        col("c_name").as("name"),
        tableKey(lit("tpch"), col("r_name"), col("n_name"), col("c_name")).as("key"),
        col("c_mktsegment").as("description"),
        lower(col("c_mktsegment")).as("tags"),
        coalesce(col("column_names"), lit("")).as("column_names"),
        coalesce(col("last_updated_timestamp"), lit(0L)).as("last_updated_timestamp"),
        coalesce(col("total_usage"), lit(0L)).as("total_usage"),
        coalesce(col("unique_usage"), lit(0L)).as("unique_usage"))
      .orderBy("name")
  }

  /** DEFAULT_NEO4J_USER_CYPHER_QUERY analog (reference :64-82):
    * user=supplier; READ rels = lineitems; owned = distinct parts;
    * follows = distinct orders. */
  def userDocs(spark: SparkSession, dir: String): DataFrame = {
    val readAgg = Tables(spark, dir, "lineitem")
      .groupBy(col("l_suppkey").as("sk_reads"))
      .agg(
        count(lit(1)).as("total_read"),
        countDistinct(col("l_partkey")).as("total_own"),
        countDistinct(col("l_orderkey")).as("total_follow"))
    Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(readAgg, col("s_suppkey") === col("sk_reads"), "left")
      .filter(col("s_name").isNotNull)
      .select(
        col("s_name").as("name"),
        col("n_name").as("team_name"),
        coalesce(col("total_read"), lit(0L)).as("total_read"),
        coalesce(col("total_own"), lit(0L)).as("total_own"),
        coalesce(col("total_follow"), lit(0L)).as("total_follow"))
      .orderBy("name")
  }

  /** DEFAULT_NEO4J_DASHBOARD_CYPHER_QUERY analog (reference :85-115):
    * dashboard=part, group=brand, usage/queries from lineitems;
    * coalesce defaults + integer cast + ORDER BY group name. */
  def dashboardDocs(spark: SparkSession, dir: String): DataFrame = {
    val usage = Tables(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk_usage"))
      .agg(
        count(lit(1)).as("total_usage"),
        max(col("l_shipdate")).cast("timestamp").cast("long").as("last_successful_run_timestamp"),
        sortedSet(col("l_returnflag")).as("chart_names"))
    Tables(spark, dir, "part")
      .join(usage, col("p_partkey") === col("pk_usage"), "left")
      .select(
        col("p_brand").as("group_name"),
        col("p_name").as("name"),
        concat(col("p_brand"), lit("/"), col("p_name")).as("key"),
        coalesce(col("p_type"), lit("")).as("description"),
        coalesce(col("total_usage"), lit(0L)).as("total_usage"),
        coalesce(col("last_successful_run_timestamp"), lit(0L)).as("last_successful_run_timestamp"),
        coalesce(col("chart_names"), lit("")).as("chart_names"))
      .orderBy("group_name", "name")
  }
}
