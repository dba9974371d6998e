package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
