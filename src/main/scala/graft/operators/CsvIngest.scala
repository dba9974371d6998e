package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.sources.Tables

/** CSV extractor family end-to-end (databuilder/extractor/csv_extractor.py):
  * CsvTableColumnExtractor's group-then-join (:161-243) and
  * CsvTableBadgeExtractor's hash join on the composite table key
  * (:80-143), as declarative joins — the build-side dict becomes a
  * broadcast hash join, the dict-of-lists group-by becomes
  * `groupBy + sort_array(collect_list(struct))`.
  */
object CsvIngest {

  private val tableKeyCols = Seq("database", "cluster", "schema", "name")

  /** columns CSV grouped per table, left-joined to tables CSV → nested
    * TableMetadata-shaped rows. */
  def tableColumn(tables: DataFrame, columns: DataFrame): DataFrame = {
    val colAgg = columns
      .groupBy(tableKeyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col("sort_order").cast("int").as("sortOrder"),
        col("col_name").as("name"),
        col("col_type").as("colType"),
        col("description")))).as("columns"))
    tables.join(colAgg, tableKeyCols, "left")
      .withColumn("columns",
        coalesce(col("columns"),
          array().cast(
            "array<struct<sortOrder:int,name:string,colType:string,description:string>>")))
  }

  /** badges CSV broadcast-joined on the composite key, collected per
    * table — BadgeMetadata rows ready for the badge fan-out. */
  def tableBadges(tables: DataFrame, badges: DataFrame): DataFrame =
    tables.join(broadcast(badges), tableKeyCols, "left")
      .groupBy(tableKeyCols.map(col): _*)
      .agg(sort_array(collect_list(col("badge"))).as("badges"))

  // ---- end-to-end oracle queries --------------------------------------
  // CSV text is synthesized deterministically from the star schema (same
  // catalog mapping as GraphBuild: database=tpch, cluster=region,
  // schema=nation, table=customer, columns=orders), then parsed back with
  // from_csv — so what the oracle verifies is the RFC-4180 parse (incl. a
  // quoted field containing a comma) plus the extractor's group+join.
  // At 100 TB the `line` column would come from spark.read.text over a
  // partitioned directory; from_csv keeps parsing codegen'd and
  // distributed, with no driver-side file handling.

  private val tableCsvSchema = StructType.fromDDL(
    "database STRING, cluster STRING, schema STRING, name STRING, description STRING")
  private val colCsvSchema = StructType.fromDDL(
    "database STRING, cluster STRING, schema STRING, name STRING, " +
      "col_name STRING, col_type STRING, sort_order BIGINT, description STRING")

  /** tables-file CSV lines; description carries an embedded comma inside
    * quotes to exercise quoting (csv_extractor.py relies on csv.DictReader
    * doing the same). */
  private def tablesFromCsv(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables(spark, dir, "customer")
      .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(concat_ws(",",
        lit("tpch"), col("r_name"), col("n_name"), col("c_name"),
        concat(lit("\""), col("c_mktsegment"), lit(",seg\""))).as("line"))
    lines.select(from_csv(col("line"), tableCsvSchema, Map.empty[String, String]).as("r"))
      .select(col("r.*"))
  }

  /** columns-file CSV lines (one per order of the table's customer). */
  private def columnsFromCsv(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(concat_ws(",",
        lit("tpch"), col("r_name"), col("n_name"), col("c_name"),
        concat(lit("o"), lpad(col("o_orderkey").cast("string"), 8, "0")),
        col("o_orderstatus"),
        col("o_orderkey").cast("string"),
        concat(lit("\""), col("o_orderpriority"), lit("\""))).as("line"))
    lines.select(from_csv(col("line"), colCsvSchema, Map.empty[String, String]).as("r"))
      .select(col("r.*"))
  }

  /** CsvTableColumnExtractor end-to-end (csv_extractor.py:161-243): parse
    * both CSVs, group columns per table, left-join to tables, then
    * re-explode the nested array for the row-level oracle compare.
    * posexplode_outer keeps column-less tables — the extractor's
    * left-join semantics. */
  def csvTableColumn(spark: SparkSession, dir: String): DataFrame =
    tableColumn(tablesFromCsv(spark, dir), columnsFromCsv(spark, dir))
      .select(col("database"), col("cluster"), col("schema"), col("name"),
        col("description"), posexplode_outer(col("columns")))
      .select(col("database"), col("cluster"), col("schema"), col("name"),
        col("description"),
        col("col.sortOrder").cast("bigint").as("sort_order"),
        col("col.name").as("col_name"),
        col("col.colType").as("col_type"),
        col("col.description").as("col_description"))
      .orderBy("cluster", "schema", "name", "sort_order")

  /** CsvTableBadgeExtractor end-to-end (csv_extractor.py:80-143): badge
    * CSV rows (distinct order-status per table) broadcast-joined on the
    * composite table key and collected per table. */
  def csvTableBadges(spark: SparkSession, dir: String): DataFrame = {
    val badgeLines = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(concat_ws(",",
        lit("tpch"), col("r_name"), col("n_name"), col("c_name"),
        concat(lit("st_"), lower(col("o_orderstatus")))).as("line"))
      .distinct()
    val badgeCsvSchema = StructType.fromDDL(
      "database STRING, cluster STRING, schema STRING, name STRING, badge STRING")
    val badges = badgeLines
      .select(from_csv(col("line"), badgeCsvSchema, Map.empty[String, String]).as("r"))
      .select(col("r.*"))
    tableBadges(tablesFromCsv(spark, dir), badges)
      .select(col("database"), col("cluster"), col("schema"), col("name"),
        array_join(col("badges"), ",").as("badges"),
        size(col("badges")).cast("bigint").as("n_badges"))
      .orderBy("cluster", "schema", "name")
  }
}
