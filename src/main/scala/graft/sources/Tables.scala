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

  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others.
    * Normalize both to a session-zoned TIMESTAMP at microsecond precision
    * so downstream `unix_micros`/window logic sees one type:
    *  - NANOS: read nanos as long (legacy conf) and truncate to µs — the
    *    same truncation DuckDB's epoch_us applies, so oracles stay exact.
    *  - MICROS/NTZ: cast NTZ→TIMESTAMP; sessions pin timeZone=UTC, so the
    *    wall-clock is reinterpreted as UTC — exactly DuckDB's epoch_us on
    *    the naive column.
    *
    * NOTE: if the session was built without [[nanosAsLongConf]], this sets
    * it for the remainder of the session (it must still be true when the
    * scan executes, so a set-and-restore would break the returned plan).
    * Session builders in Verify/Bench/tests set it up front so this
    * mutation path never triggers there. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (!spark.conf.getOption(nanosAsLongConf).contains("true"))
      spark.conf.set(nanosAsLongConf, "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // The NTZ→TIMESTAMP cast reinterprets the naive wall-clock in the
        // SESSION zone — oracle parity (DuckDB epoch_us) is only exact under
        // UTC. Unlike nanosAsLong above there is no safe way to set this
        // mid-session (plans already built resolve against the old zone), so
        // a non-UTC session must fail loudly rather than read shifted
        // instants.
        val tz = spark.conf.get("spark.sql.session.timeZone")
        // accept any zero-offset zone id (UTC / Etc/UTC / GMT / +00:00) —
        // they all give the wall-clock semantics the oracle needs; only a
        // genuinely shifted zone must fail loudly
        val zeroOffset =
          try java.time.ZoneId.of(tz).getRules.isFixedOffset &&
            java.time.ZoneId.of(tz).getRules.getOffset(java.time.Instant.EPOCH)
              .getTotalSeconds == 0
          catch { case _: Exception => false }
        require(zeroOffset,
          s"events.ts is TIMESTAMP_NTZ; reading it requires a UTC-equivalent spark.sql.session.timeZone (got '$tz')")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  /** CSV source with header-derived schema — CsvExtractor analog
    * (reference: databuilder/extractor/csv_extractor.py:27). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)
}
