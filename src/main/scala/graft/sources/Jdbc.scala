package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source layer — SQLAlchemyExtractor / DBAPIExtractor analog
  * (reference databuilder/extractor/sql_alchemy_extractor.py:177-200,
  * db_api_extractor.py:15): arbitrary dialect SQL pushed down to the
  * source database, results as a DataFrame.
  *
  * The dialect pipelines (graft.operators.Metastore) consume plain
  * DataFrames, so they are source-agnostic; this is the production entry
  * point when the metastore lives behind JDBC. Driven end-to-end against
  * embedded Derby: JdbcDerbySpec covers reads/writes/the metastore fold,
  * and q_jdbc_roundtrip oracle-gates the write → partitioned-read loop.
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

  /** Oracle-gated JDBC lifecycle: write a customer projection into an
    * embedded in-memory Derby table (the MySQLCSVPublisher write path),
    * read it back with the PARTITIONED read (four executor stripes on
    * the id — the scale path a single-cursor loop is not), and return
    * it — the round trip must be lossless, so the oracle is the plain
    * source query. A fresh database per invocation keeps repeated
    * bench/verify passes append-safe. */
  private val jdbcRun = new java.util.concurrent.atomic.AtomicLong()
  def jdbcRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val db = s"graftv${ProcessHandle.current().pid()}x${jdbcRun.incrementAndGet()}"
    val url = s"jdbc:derby:memory:$db;create=true"
    val src = Tables(spark, dir, "customer")
      .filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").cast("long").as("id"),
        col("c_name").as("name"), col("c_mktsegment").as("segment"))
    writeTable(src, url, "verify_customers")
    readPartitioned(spark, url, "verify_customers", "id", 0L, 10000000L, 4)
      .select(col("id"), col("name"), col("segment"))
      .orderBy("id")
  }

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
