package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{ColumnMetadata, TableMetadata}

/** Small source inventory: GenericExtractor, EsLastUpdatedExtractor, and
  * the Spark-catalog metadata extractor (the DeltaLake extractor is
  * already Spark in the reference — spark.catalog + DESCRIBE,
  * delta_lake_metadata_extractor.py:118-312).
  */
object Generic {

  /** GenericExtractor (generic_extractor.py:12): a literal record list
    * from config becomes a local-relation DataFrame — no scan, no files;
    * Catalyst folds it like any other leaf. */
  def fromRecords[T <: Product : scala.reflect.runtime.universe.TypeTag](
      spark: SparkSession, records: Seq[T]): DataFrame =
    spark.createDataFrame(records)

  /** EsLastUpdatedExtractor (es_last_updated_extractor.py:13): one record
    * carrying the job timestamp — injected by the driver, never `now()`
    * inside the plan (keeps runs replayable). */
  def esLastUpdated(spark: SparkSession, epoch: Long): DataFrame = {
    import spark.implicits._
    Seq(epoch).toDF("timestamp")
  }

  /** Spark-catalog table metadata: walk databases/tables minus an
    * exclusion list, list columns, emit TableMetadata. The catalog walk is
    * driver-side (metadata-scale, exactly like the reference); nothing
    * data-sized is collected. */
  def catalogTables(
      spark: SparkSession,
      database: String,
      cluster: String,
      excludeTables: Set[String] = Set.empty): Seq[TableMetadata] = {
    import scala.jdk.CollectionConverters._
    spark.catalog.listTables().collectAsList().asScala.toSeq
      .filterNot(t => excludeTables.contains(t.name))
      .map { t =>
        // temp views have no database; catalog tables need the qualified name
        val qualified = Option(t.database).filter(_.nonEmpty)
          .map(db => s"$db.${t.name}").getOrElse(t.name)
        val cols = spark.catalog.listColumns(qualified).collectAsList().asScala.toSeq
          .zipWithIndex.map { case (c, i) =>
            ColumnMetadata(c.name, Option(c.description), c.dataType, i)
          }
        TableMetadata(
          database = database,
          cluster = cluster,
          schema = Option(t.database).getOrElse("session"),
          name = t.name,
          description = Option(t.description).filter(_.nonEmpty),
          columns = cols,
          isView = t.tableType == "TEMPORARY" || t.tableType == "VIEW")
      }
  }
}
