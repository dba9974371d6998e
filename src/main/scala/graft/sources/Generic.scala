package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{ColumnMetadata, TableLastUpdated, TableMetadata}

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

  /** DESCRIBE EXTENDED detail as a key→value map — the analog of the
    * reference's DESCRIBE DETAIL dict (delta_lake_metadata_extractor
    * .py:241-276; the view branch parses the '# Detailed Table' section of
    * DESCRIBE EXTENDED exactly like this). Tables that cannot be
    * described (a dropped temp view, a foreign catalog) yield an empty
    * map, mirroring the reference's scrape-failure skip. */
  def describeDetail(spark: SparkSession, qualified: String): Map[String, String] =
    try {
      spark.sql(s"DESCRIBE EXTENDED $qualified").collect()
        .map(r => r.getString(0) -> Option(r.getString(1)).getOrElse(""))
        .toMap
    } catch { case _: Exception => Map.empty }

  /** TableLastUpdated emission (delta_lake_metadata_extractor.py:190-192 +
    * :334-339): per non-view catalog table, read the last-modified (or,
    * failing that, created) timestamp from the table detail and emit the
    * Timestamp node record. `detail` is injectable so environments with a
    * real DESCRIBE DETAIL (Delta's lastModified) plug it in; the default
    * reads the Spark-catalog DESCRIBE EXTENDED rows, whose 'Created Time'
    * is the closest catalog-native analog. Tables with no parseable
    * timestamp are skipped, like the reference's None return. */
  def catalogLastUpdated(
      spark: SparkSession,
      database: String,
      cluster: String,
      excludeTables: Set[String] = Set.empty,
      detail: String => Map[String, String] = null): Seq[TableLastUpdated] = {
    import scala.jdk.CollectionConverters._
    val detailFn = Option(detail).getOrElse(describeDetail(spark, _: String))
    val fmt = java.time.format.DateTimeFormatter.ofPattern(
      "EEE MMM dd HH:mm:ss zzz yyyy", java.util.Locale.US)
    def parseEpoch(s: String): Option[Long] =
      s.toLongOption // epoch seconds straight from a Delta-style detail
        .orElse(try Some(java.time.ZonedDateTime.parse(s, fmt).toEpochSecond)
        catch { case _: Exception => None })
    spark.catalog.listTables().collectAsList().asScala.toSeq
      .filterNot(t => excludeTables.contains(t.name))
      .filterNot(t => t.tableType == "TEMPORARY" || t.tableType == "VIEW")
      .flatMap { t =>
        val qualified = Option(t.database).filter(_.nonEmpty)
          .map(db => s"$db.${t.name}").getOrElse(t.name)
        val d = detailFn(qualified)
        val ts = d.get("lastModified").orElse(d.get("Created Time")).flatMap(parseEpoch)
        val schema = Option(t.database).getOrElse("session")
        ts.map(epoch => TableLastUpdated(
          s"$database://$cluster.$schema/${t.name}", epoch))
      }
  }
}
