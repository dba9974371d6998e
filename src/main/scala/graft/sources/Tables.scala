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

  /** SQL conf required to read events.parquet (TIMESTAMP(NANOS), which
    * Spark's vectorized reader otherwise rejects). Set at session
    * construction by Verify/Bench/test builders; there is no per-read
    * datasource option for it (it is consumed from the session conf when
    * the physical scan is built). */
  val nanosAsLongConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** events.ts is parquet TIMESTAMP(NANOS). Read nanos as long and truncate
    * to microsecond timestamps — the same truncation DuckDB's epoch_us
    * applies, so oracle comparisons stay exact.
    *
    * NOTE: if the session was built without [[nanosAsLongConf]], this sets
    * it for the remainder of the session (it must still be true when the
    * scan executes, so a set-and-restore would break the returned plan).
    * Session builders in Verify/Bench/tests set it up front so this
    * mutation path never triggers there. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    if (!spark.conf.getOption(nanosAsLongConf).contains("true"))
      spark.conf.set(nanosAsLongConf, "true")
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
