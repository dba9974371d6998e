package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** Core relational operator inventory (SURVEY §2.1–§2.4) re-expressed as
  * declarative DataFrame programs over the testdata star schema.
  *
  * Scale notes (100 TB design stance):
  *  - filters/projections sit directly on the scan so Catalyst pushes them
  *    into parquet (PushedFilters / ReadSchema);
  *  - dimension tables (region, nation, customer at catalog scale) are
  *    broadcast — no shuffle of the fact side;
  *  - aggregations are hash-aggs with partial (map-side) combine for free;
  *  - nothing collects to the driver.
  */
object Relational {

  /** Scan + filter + projection — CsvExtractor/SQLAlchemyExtractor analog
    * (reference: databuilder/extractor/csv_extractor.py:27). Predicate and
    * column list reach the parquet reader. */
  def scanFilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** Sort-based group-agg fold analog (reference:
    * databuilder/extractor/hive_table_metadata_extractor.py:133-158) —
    * in Spark a hash aggregation; the sort dependency disappears.
    * Shape of TPC-H Q1. */
  def groupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Broadcast hash join of a small dimension (reference CSV badge/column
    * hash joins, databuilder/extractor/csv_extractor.py:107-143). */
  def broadcastJoin(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "nation")
      .join(broadcast(Tables(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_nations"), sortedList(col("n_name")).as("nations"))
      .orderBy("r_name")

  /** Skew-safe equi-join: the skewed (big) side spreads each key over
    * `salt` sub-keys via a deterministic hash of a tiebreak column; the
    * other side replicates `salt`×. The classic salting pattern for hot
    * keys that AQE's skew-join splitting can't reach (e.g. a
    * non-broadcastable build side); results are identical to the plain
    * join (spec-asserted). At 100 TB, apply per detected hot key rather
    * than globally to avoid inflating the replicated side. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      tiebreak: org.apache.spark.sql.Column,
      salt: Int): DataFrame = {
    val bigS = big.withColumn("_salt", pmod(xxhash64(tiebreak), lit(salt.toLong)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    bigS.join(smallS, keys :+ "_salt").drop("_salt")
  }

  /** Oracle-gated salted-join query: orders (the skewed fact side)
    * against customer keyed by custkey, aggregated per market segment.
    * The DuckDB oracle computes the PLAIN join — identical results prove
    * the salting rewrite is semantics-preserving end to end. */
  def saltedJoinQuery(spark: SparkSession, dir: String): DataFrame =
    saltedJoin(
      Tables(spark, dir, "orders").withColumnRenamed("o_custkey", "custkey"),
      Tables(spark, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_mktsegment")),
      Seq("custkey"), col("o_orderkey"), salt = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment")

  /** Multi-hop inner equi-join chain — the Cypher MATCH pattern
    * Database←Cluster←Schema←Table (reference:
    * databuilder/extractor/neo4j_search_data_extractor.py:23-60). Dimensions
    * broadcast; only the fact table shuffles for the final agg. */
  def multiwayJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-01-01").cast("timestamp"))
    orders
      .join(broadcast(Tables(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(moneySum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")
  }

  /** Left-outer join + aggregation — the OPTIONAL MATCH branches of the
    * search-document queries (SURVEY §2.3). */
  def leftJoinAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey", "c_name")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(moneySum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy("c_custkey")

  /** Anti join — NOT EXISTS over partitions (reference:
    * databuilder/extractor/hive_table_last_updated_extractor.py:87-89). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "orders").filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** Bucketed CO-LOCATED join — the shuffle-avoidance contract of a
    * repeatedly-joined 100 TB fact pair: both sides are written
    * `bucketBy(n, key)` into catalog tables, so the join consumes the
    * bucketing (`SelectedBucketsCount` on both scans) and the physical
    * plan carries NO shuffle exchange under the join — at scale this
    * turns every recurring fact⋈fact join on the bucket key into a
    * zero-shuffle merge, the same decision as the reference pipelines'
    * pre-partitioned staging dirs (one folder per entity/key family,
    * e.g. fs_neo4j_csv_loader.py's per-label shards). The one-time
    * bucketed write IS a shuffle — amortized across every later join.
    * PlanShapeSpec pins the no-exchange plan; the bucketed write lands
    * in the session warehouse (a stand-in for the curated lakehouse
    * zone). */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val buckets = 8
    // the in-memory catalog dies with the JVM but the warehouse dirs
    // persist — drop any stale entry AND its orphaned location so the
    // bucketed write starts clean in every session
    Seq("graft_bkt_lineitem", "graft_bkt_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(loc, true)
    }
    Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_bkt_lineitem")
    Tables(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_bkt_orders")
    bucketedJoinRead(spark)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** The co-located join over the bucketed catalog tables — split out so
    * the spec can assert the exchange-free plan directly. */
  def bucketedJoinRead(spark: SparkSession): DataFrame =
    spark.table("graft_bkt_lineitem")
      .join(spark.table("graft_bkt_orders"),
        col("l_orderkey") === col("o_orderkey"))

  /** Semi join — EXISTS filter (reference Cassandra/Delta allowlist filters,
    * databuilder/extractor/cassandra_extractor.py:62-90). */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** UNION with dedup — partition-col ∪ regular-col branch (reference:
    * databuilder/extractor/hive_table_metadata_extractor.py:46). */
  def unionDedup(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000).select(col("o_custkey").as("custkey"))
    val building = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
    big.union(building).distinct().orderBy("custkey")
  }

  /** Hash counting aggregation — usage counting dict[key] += 1 (reference:
    * databuilder/extractor/bigquery_usage_extractor.py:47-110). */
  def countGroup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("unique_users"),
        moneySum(col("value")).as("total_value"))
      .orderBy("event_type")

  /** Column-stats extraction — the TableColumnStats pipeline
    * (table_stats.py:17-132): per-column min/max/sum/count melted to one
    * Stat row per (column, stat_type) with the reference's
    * `{column}/{stat}/` key. One full-scan aggregate then a plan-literal
    * stack() unpivot — no shuffle beyond the single partial-agg tree. */
  def columnStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .agg(
        min(col("l_quantity")).as("q_min"), max(col("l_quantity")).as("q_max"),
        moneySum(col("l_quantity")).as("q_sum"),
        count(col("l_quantity")).cast("double").as("q_cnt"),
        min(col("l_extendedprice")).as("e_min"), max(col("l_extendedprice")).as("e_max"),
        moneySum(col("l_extendedprice")).as("e_sum"),
        count(col("l_extendedprice")).cast("double").as("e_cnt"))
      .select(expr(
        """stack(8,
             'l_quantity', 'count', q_cnt, 'l_quantity', 'max', q_max,
             'l_quantity', 'min', q_min,   'l_quantity', 'sum', q_sum,
             'l_extendedprice', 'count', e_cnt, 'l_extendedprice', 'max', e_max,
             'l_extendedprice', 'min', e_min,   'l_extendedprice', 'sum', e_sum)
           AS (col_name, stat_type, stat_val)"""))
      .withColumn("stat_key",
        format_string("hive://gold.tpch/lineitem/%s/%s/", col("col_name"), col("stat_type")))
      .orderBy("col_name", "stat_type")

  /** BigQueryTableUsageExtractor's email-pattern gate (reference:
    * databuilder/extractor/bigquery_usage_extractor.py:88-95): usage is
    * counted only for emails matching the configured regex. The
    * start-anchored pattern reproduces Python re.match semantics; rlike
    * is codegen'd and the filter sits directly on the scan. */
  def usageEmailFilter(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(concat(lit("s"), col("l_suppkey")).as("email"))
      .filter(col("email").rlike("^s[0-9]*[02468]$"))
      .groupBy("email")
      .agg(count(lit(1)).as("read_count"))
      .orderBy("email")

  /** Max/min aggregation — table-last-updated (reference:
    * databuilder/extractor/hive_table_last_updated_extractor.py:61-72). */
  def maxGroup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(
        max(col("o_orderdate")).as("last_order"),
        min(col("o_orderdate")).as("first_order"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  /** COLLECT(DISTINCT …) — tag/badge collection branches (reference:
    * neo4j_search_data_extractor.py:32-47); sorted string for determinism. */
  def collectAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .groupBy("c_nationkey")
      .agg(sortedSet(col("c_mktsegment")).as("segments"), count(lit(1)).as("n_customers"))
      .orderBy("c_nationkey")

  /** ORDER BY + LIMIT — Spark plans this as TakeOrderedAndProject: a per-
    * partition top-k then a k-row merge, no global sort of 100 TB. */
  def sortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** Distinct rows — the global dedup sets of low-cardinality nodes
    * (reference: databuilder/models/table_metadata.py:324-327) as a
    * distributed dropDuplicates. */
  def dedupRows(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey")
      .dropDuplicates()
      .orderBy("l_partkey", "l_suppkey")

  /** Top-k per group via window rank — beyond-reference extension (the
    * reference has LIMIT only); ranks inside each group without a global
    * sort. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rank")
  }
}
