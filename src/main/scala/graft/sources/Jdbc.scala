package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source layer — SQLAlchemyExtractor / DBAPIExtractor analog
  * (reference databuilder/extractor/sql_alchemy_extractor.py:177-200,
  * db_api_extractor.py:15): arbitrary dialect SQL pushed down to the
  * source database, results as a DataFrame.
  *
  * The dialect pipelines (graft.operators.Metastore) consume plain
  * DataFrames, so they are source-agnostic; this is the production entry
  * point when the metastore lives behind JDBC. Not integration-tested in
  * this sandbox (no JDBC endpoint) — the read is a thin declaration over
  * `spark.read.format("jdbc")`.
  */
object Jdbc {

  /** Whole-query read: the dialect SQL runs on the source DB (predicate
    * pushdown by construction) and lands as one partition. Fine for
    * metastore-sized results (thousands of rows). */
  def read(spark: SparkSession, url: String, query: String,
      fetchSize: Int = 1000): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
      .option("fetchsize", fetchSize)
      .load()

  /** MySQLCSVPublisher analog: write one staged RDS-table frame per JDBC
    * table; callers iterate `graft.model.Rds.publishOrder` so parents land
    * before children (mysql_csv_publisher.py:94-206). Upsert-vs-append is
    * the target DB's MERGE concern — stage + MERGE SQL in production. */
  def writeTable(df: org.apache.spark.sql.DataFrame, url: String, table: String,
      batchSize: Int = 500): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .mode("append")
      .save()

  /** Partitioned read for large source tables: executors fetch stripes of
    * `partitionColumn` in parallel — the scale path when the "metastore"
    * query is itself big (e.g. usage/audit tables). Replaces the
    * reference's single-cursor record loop. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, fetchSize: Int = 1000): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("fetchsize", fetchSize)
      .load()
}
