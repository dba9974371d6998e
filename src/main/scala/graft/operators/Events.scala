package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** Event-stream operators — the batch equivalents of the reference's Kafka
  * micro-batch path (databuilder/extractor/kafka_source_extractor.py:22).
  * The same transforms run unchanged under Structured Streaming (see
  * graft.streaming); these batch forms are what the DuckDB oracle checks.
  */
object Events {

  /** Tumbling-window aggregation (hour buckets). Under streaming this is
    * `withWatermark + groupBy(window(...))`; the batch form uses date_trunc
    * so the oracle can reproduce it. */
  def windowedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
      .orderBy("window_start", "event_type")

  /** JSON property extraction — the reference's JSONPath field extraction
    * (databuilder/rest_api/rest_api_query.py:207-250) as get_json_object. */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
      .orderBy("event_type")

  /** Record-level drop-on-error channel — the reference task loop's
    * transform-with-drop (kafka_source_extractor.py:99-114: a record that
    * fails to transform is counted and skipped, never kills the job).
    * A malformed-JSON minority is planted (every 7th event loses its
    * opening brace), parsed with the non-throwing from_json path, and the
    * report splits good/bad per event type with the good-side aggregate —
    * the Spark form of a bad-records side channel. Narrow parse + one
    * aggregation shuffle. */
  def badRecords(spark: SparkSession, dir: String): DataFrame = {
    // plant a doubled opening brace — unparseable by any JSON parser, so
    // both engines agree on what "bad" means
    val raw = when(col("event_id") % 7 === 0, concat(lit("{"), col("props")))
      .otherwise(col("props"))
    // PERMISSIVE parse with an explicit corrupt-record column: a failed
    // row lands its raw text in _corrupt instead of throwing (a null
    // struct would be indistinguishable from a parsed-but-empty record)
    val schema = org.apache.spark.sql.types.DataType.fromDDL("k BIGINT, _corrupt STRING")
    Tables(spark, dir, "events")
      .withColumn("raw", raw)
      // Jackson's lax defaults (single quotes, NaN literals) accept
      // inputs DuckDB's json_valid rejects — pin the parser strict so
      // the Spark definition of "bad" matches the oracle's for ANY
      // input, not just the strict-JSON fixture
      .withColumn("parsed", from_json(col("raw"), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt",
          "allowSingleQuotes" -> "false", "allowNonNumericNumbers" -> "false",
          "allowUnquotedFieldNames" -> "false", "allowBackslashEscapingAnyCharacter" -> "false")))
      .withColumn("bad", col("parsed").isNull || col("parsed._corrupt").isNotNull)
      .groupBy("event_type")
      .agg(
        count(when(!col("bad"), 1)).as("n_good"),
        count(when(col("bad"), 1)).as("n_bad"),
        sum(when(!col("bad"), col("parsed.k"))).as("sum_k_good"))
      .orderBy("event_type")
  }

  /** As-of join — attribute each click to the most recent preceding view
    * by the same user. Spark has no native ASOF JOIN; the scalable
    * re-expression is the sorted-merge pattern: union both event kinds,
    * shuffle ONCE on user_id, and carry the latest view forward with a
    * running `last(..., ignoreNulls)` window — never a range join (whose
    * candidate set explodes quadratically on hot users). At equal
    * timestamps the view sorts before the click, matching the oracle's
    * inclusive `v.us <= c.us` bound; timestamps compare as epoch micros
    * end-to-end so both engines use exact integer order. */
  def asofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val kindRank = when(col("event_type") === "view", 0).otherwise(1)
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), kindRank, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "events")
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("view_event_id",
        last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("view_us",
        last(when(col("event_type") === "view", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us").as("click_us"),
        col("view_event_id"), col("view_us"),
        (col("us") - col("view_us")).as("lag_us"))
      .orderBy("event_id")
  }

  /** Sessionization: a new session starts after a >30 min gap per user.
    * Batch form uses lag + running sum windows; the streaming form is
    * flatMapGroupsWithState (graft.streaming.Sessionize). Per-user windows
    * partition cleanly at scale (shuffle once on user_id, both windows and
    * the final agg reuse that partitioning). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables(spark, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("boundary",
        when(col("prev_us").isNull ||
             unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("boundary")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id")
      .agg(
        max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_events"),
        moneySum(col("value")).as("total_value"))
      .orderBy("user_id")
  }
}
