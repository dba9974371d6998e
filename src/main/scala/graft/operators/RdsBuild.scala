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

  /** FK dependency edges derived from the RDS schema itself: an attribute
    * named `<parent>_rk` is a foreign key to `<parent>` — the same
    * metadata SQLAlchemy walks to produce `Base.metadata.sorted_tables`
    * (mysql_csv_publisher.py:94-103). */
  private[graft] def fkDeps: Map[String, Set[String]] =
    Rds.tableAttrs.map { case (t, attrs) =>
      t -> attrs.filter(_.endsWith("_rk")).map(_.stripSuffix("_rk")).toSet
        .intersect(Rds.tableAttrs.keySet)
    }

  /** Longest-path depth of a table in the FK DAG (parents rank lower). */
  private[graft] def fkRank(t: String): Int = {
    val deps = fkDeps
    def go(x: String): Int =
      if (deps(x).isEmpty) 0 else deps(x).map(go).max + 1
    go(t)
  }

  /** The staged/publish table SEQUENCE, oracle-pinned: `seq_pos` is the
    * position `stage` (and the downstream publisher) applies the table
    * at, `fk_rank` the topological depth derived from the `_rk` FK
    * metadata. The invariant a sequential publisher needs — every
    * parent's seq_pos precedes its children's — is spec-asserted; the
    * oracle pins both columns so a reorder of `publishOrder` that
    * violated FK application order breaks the gate. */
  def fkOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Rds.publishOrder.zipWithIndex
      .map { case (t, i) => (t, (i + 1).toLong, fkRank(t).toLong) }
      .toDF("rds_table", "seq_pos", "fk_rank")
      .orderBy("seq_pos")
  }
}
