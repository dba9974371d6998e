package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch table sources over the driver-provided parquet star schema.
  *
  * Mirrors the reference's extractor layer (CsvExtractor,
  * SQLAlchemyExtractor, ... — /root/reference/databuilder/extractor/) in
  * Spark terms: every source is a DataFrame read whose filters/projections
  * Catalyst pushes into the scan. At 100 TB these reads are partitioned
  * parquet directories; nothing here assumes single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read nanos as long (legacy conf) and truncate to microsecond
    * timestamps — the same truncation DuckDB's epoch_us applies, so oracle
    * comparisons stay exact. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** CSV source with header-derived schema — CsvExtractor analog
    * (reference: databuilder/extractor/csv_extractor.py:27). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)
}
