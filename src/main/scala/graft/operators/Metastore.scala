package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The shared dialect-metastore pipeline: every JDBC metadata extractor in
  * the reference (Hive, Postgres, Redshift, Athena, Db2, MySQL, MSSQL,
  * Snowflake, Vertica, Dremio, Druid) is the same program — a dialect SQL
  * of inner + left joins over the metastore tables, optionally UNIONed
  * with a partition-keys branch, `ORDER BY tbl_id, is_partition_col DESC`,
  * then a sort-based group-by fold into TableMetadata with a per-column
  * partition badge (hive_table_metadata_extractor.py:35-158,
  * base_postgres_metadata_extractor.py:24-96).
  *
  * Spark shape: the dialect SQL's joins become DataFrame joins (Catalyst
  * broadcasts the small DBS/TABLE_PARAMS sides), the UNION keeps the
  * is_partition_col flag, and the order-dependent `itertools.groupby` fold
  * becomes an order-free `groupBy` + `sort_array(collect_list(struct))` —
  * the sort key (partition-cols-first, then sort order) moves into the
  * collected struct, so no global sort is needed and the fold shuffles
  * once on the table key regardless of input order.
  */
object Metastore {

  /** Metastore input frames after the per-dialect scan — the shapes the
    * reference's dialect SQLs read. `partitionKeys` is None for dialects
    * without Hive's partition-column branch (Postgres & friends). */
  case class Frames(
      tbls: DataFrame, // tbl_id, db_id, name, tbl_type
      dbs: DataFrame, // db_id, schema_name
      cols: DataFrame, // tbl_id, col_name, col_type, col_sort_order
      partitionKeys: Option[DataFrame], // same shape as cols
      tableParams: Option[DataFrame]) // tbl_id, param_key, param_value

  val PartitionBadge = "partition column"

  /** The fold: (partition ∪ regular) column rows grouped per table, columns
    * ordered partition-cols-first then by sort order, partition columns
    * badged; description comes from the `comment` table param. Emits one
    * row per table with the canonical `{db}://{cluster}.{schema}/{name}`
    * key. `where` is the reference's `where_clause_suffix` analog (a
    * filter Catalyst pushes into the scans). */
  def foldTableMetadata(
      f: Frames,
      database: String,
      cluster: String,
      where: Option[Column] = None): DataFrame = {
    val flag = (df: DataFrame, isPart: Int) =>
      df.select(col("tbl_id"), col("col_name"), col("col_type"), col("col_sort_order"),
        lit(isPart).as("is_partition_col"))
    val colRows = f.partitionKeys match {
      case Some(pk) => flag(pk, 1).union(flag(f.cols, 0))
      case None     => flag(f.cols, 0)
    }
    val tbls = where.fold(f.tbls)(f.tbls.filter)
    val descs = f.tableParams.map(
      _.filter(col("param_key") === "comment")
        .select(col("tbl_id"), col("param_value").as("description")))
    val base = tbls
      .join(broadcast(f.dbs), "db_id")
      .join(colRows, "tbl_id")
    val withDesc = descs.fold(base.withColumn("description", lit("")))(d =>
      base.join(broadcast(d), Seq("tbl_id"), "left")
        .withColumn("description", coalesce(col("description"), lit(""))))
    withDesc
      .groupBy(col("tbl_id"), col("schema_name"), col("name"), col("tbl_type"),
        col("description"))
      .agg(
        count(lit(1)).as("n_cols"),
        // partition-cols-first (the reference's is_partition_col DESC),
        // then sort order — the sort key lives in the struct, not a
        // global ORDER BY
        array_join(
          transform(
            sort_array(collect_list(struct(
              (lit(1) - col("is_partition_col")).as("np"),
              col("col_sort_order"),
              col("col_name"),
              col("col_type"),
              when(col("is_partition_col") === 1, lit(PartitionBadge))
                .otherwise(lit("")).as("badge")))),
            c => concat_ws(":", c.getField("col_name"), c.getField("col_type"),
              c.getField("badge"))),
          ",").as("columns"))
      .select(
        format_string("%s://%s.%s/%s", lit(database), lit(cluster),
          col("schema_name"), col("name")).as("key"),
        col("schema_name"), col("name"), col("description"),
        (col("tbl_type") === "VIRTUAL_VIEW").as("is_view"),
        col("n_cols"), col("columns"))
  }

  // ---- oracle-checkable query shape ----

  /** Hive metastore fold over TPC-H stand-ins: nation=DBS,
    * customer=TBLS (+ its segment as the `comment` param), orders as
    * COLUMNS_V2 with status='P' rows playing PARTITION_KEYS. */
  def hiveMetastoreFold(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val nation = Tables(spark, dir, "nation")
    val orders = Tables(spark, dir, "orders")
    val colShape = (df: DataFrame) => df.select(
      col("o_custkey").as("tbl_id"),
      concat(lit("c"), col("o_orderkey")).as("col_name"),
      col("o_orderpriority").as("col_type"),
      col("o_orderkey").as("col_sort_order"))
    val frames = Frames(
      tbls = customer.select(
        col("c_custkey").as("tbl_id"), col("c_nationkey").as("db_id"),
        col("c_name").as("name"),
        when(col("c_custkey") % 20 === 0, lit("VIRTUAL_VIEW"))
          .otherwise(lit("MANAGED_TABLE")).as("tbl_type")),
      dbs = nation.select(col("n_nationkey").as("db_id"), col("n_name").as("schema_name")),
      cols = colShape(orders.filter(col("o_orderstatus") =!= "P")),
      partitionKeys = Some(colShape(orders.filter(col("o_orderstatus") === "P"))),
      tableParams = Some(customer.select(
        col("c_custkey").as("tbl_id"), lit("comment").as("param_key"),
        col("c_mktsegment").as("param_value"))))
    foldTableMetadata(frames, "hive", "gold").orderBy("key")
  }
}
