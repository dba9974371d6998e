package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.model.Rds.tableMetadataRows

/** RDS record pipeline: domain Dataset → RowSerializable flatMap →
  * deduplicated record table → per-RDS-table DataFrames → FK-ordered
  * staged write (FSMySQLCSVLoader + MySQLCSVPublisher analog,
  * loader/file_system_mysql_csv_loader.py:24,
  * publisher/mysql_csv_publisher.py:94-206).
  *
  * Scale notes: fan-out is a narrow flatMap; the one shuffle is the
  * (table, rk) dedup — the same partitioning the downstream JDBC upsert
  * wants. Staged output is parquet partitioned by RDS table so the
  * publisher can apply files in FK order without re-reading everything.
  */
object RdsBuild {

  def records[T](ds: Dataset[T])(implicit s: RowSerializable[T]): Dataset[RdsRecord] = {
    import ds.sparkSession.implicits._
    ds.flatMap(s.records).dropDuplicates("table", "rk")
  }

  /** One fixed-schema DataFrame per RDS table (rk + its attribute
    * columns) — the `TableSerializable` → typed ORM row materialization. */
  def tableFrame(recs: Dataset[RdsRecord], table: String): DataFrame = {
    val attrs = Rds.tableAttrs(table)
    recs.filter(col("table") === table)
      .select(col("rk") +: attrs.map(a => col("attributes")(a).as(a)): _*)
  }

  /** FK-dependency-ordered staged write: parents land before children, so
    * a sequential downstream publisher never sees a dangling FK. */
  def stage(recs: Dataset[RdsRecord], outDir: String): Unit = {
    val cached = recs.persist()
    try Rds.publishOrder.foreach { t =>
      tableFrame(cached, t).write.mode("overwrite").parquet(s"$outDir/$t")
    } finally cached.unpersist()
  }

  // ---- oracle-checkable query shape ----

  /** Record counts per RDS table over the deterministic catalog mapping
    * (GraphBuild.tableMetadata) — exercises every RowSerializable branch
    * and the global (table, rk) dedup. */
  def rdsRecordCounts(spark: SparkSession, dir: String): DataFrame =
    records(GraphBuild.tableMetadata(spark, dir))
      .groupBy(col("table").as("rds_table"))
      .agg(count(lit(1)).as("n"))
      .orderBy("rds_table")
}
