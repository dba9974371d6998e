package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** Scalar transformer inventory (SURVEY §2.2, §2.5) — each reference
  * transformer as a codegen'd column expression, no UDFs.
  */
object Transforms {

  /** TimestampStringToEpoch with the reference's 0-on-parse-failure
    * semantics (databuilder/transformer/timestamp_string_to_epoch.py:30-44):
    * `coalesce(unix_timestamp(...), 0)`, NOT null. Odd event ids carry an
    * unparseable string to exercise the failure path. */
  def timestampToEpoch(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("ts_string",
        when(col("event_id") % 2 === 0, date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
          .otherwise(lit("not-a-timestamp")))
      .withColumn("epoch",
        coalesce(unix_timestamp(try_to_timestamp(col("ts_string"), lit("yyyy-MM-dd'T'HH:mm:ss"))), lit(0L)))
      .select("event_id", "ts_string", "epoch")
      .orderBy("event_id")

  /** RegexStrReplaceTransformer — ordered literal replacements
    * (databuilder/transformer/regex_str_replace_transformer.py:19).
    * Output is fingerprinted (md5) to keep the oracle compact. */
  def strReplace(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("replaced", regexp_replace(regexp_replace(col("text"), " ", "_"), "a", "@"))
      .select(col("doc_id"), md5(col("replaced")).as("fingerprint"))
      .orderBy("doc_id")

  /** TemplateVariableSubstitutionTransformer — key building via format
    * (databuilder/transformer/template_variable_substitution_transformer.py:17
    * + table_metadata.py key formats :296-314). */
  def keyFormat(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"),
        tableKey(lit("tpch"), col("r_name"), col("n_name"), col("c_name")).as("key"))
      .orderBy("c_custkey")

  /** RemoveFieldTransformer (transformer/remove_field_transformer.py:16). */
  def removeFields(df: DataFrame, fields: String*): DataFrame = df.drop(fields: _*)

  /** TableTagTransformer — append configured tags
    * (transformer/table_tag_transformer.py:12). */
  def addTags(df: DataFrame, tagsCol: String, tags: Seq[String]): DataFrame =
    df.withColumn(tagsCol, array_union(col(tagsCol), lit(tags.toArray)))

  /** TagMetadata.format_tags analog (table_metadata.py:34-41): split a
    * comma-separated tag string, drop empty SEGMENTS, then lowercase and
    * trim — in that order, exactly as the reference (`filter(None, ...)`
    * runs before `.lower().strip()`, so a pure-whitespace segment
    * survives as an empty tag). */
  def formatTags(c: Column): Column =
    transform(filter(split(c, ","), t => t =!= ""), t => lower(trim(t)))

  /** GenericTransformer — callback on one named field
    * (transformer/generic_transformer.py:17); the callback is a Column
    * function, so it stays codegen'd. */
  def onField(df: DataFrame, field: String, fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
    df.withColumn(field, fn(col(field)))

  /** ChainedTransformer end-to-end through the Pipeline abstraction
    * (base_transformer.py:42-83 + task/task.py:49-77): sequential stages
    * where a None return filters the record out and an iterator return
    * fans out. The chain here is template key-building → literal replace
    * → None-drop → per-tag fan-out → field removal — each stage one of
    * the reference transformers, composed exactly as DefaultTask would. */
  def transformChain(spark: SparkSession, dir: String): DataFrame = {
    val pipe = graft.pipeline.Pipeline(
      name = "chained-transformers",
      source = s => Tables(s, dir, "customer")
        .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment").as("segment"),
          col("r_name").as("cluster"), col("n_name").as("schema")),
      transforms = Seq(
        // TemplateVariableSubstitutionTransformer: key from record fields
        df => df.withColumn("key", concat(lit("tpch://"), col("cluster"),
          lit("."), col("schema"), lit("/"), col("c_name"))),
        // RegexStrReplaceTransformer: ordered literal replace on one field
        df => onField(df, "segment", regexp_replace(_, "MACHINERY", "MACHINES")),
        // per-stage None filter: a transformer returning None drops the row
        df => df.filter(col("segment") =!= "FURNITURE"),
        // iterator fan-out: one record -> one row per tag
        df => df.withColumn("tag", explode(array(lower(col("segment")), lit("default")))),
        // RemoveFieldTransformer
        df => removeFields(df, "cluster", "schema")))
    pipe.dataFrame(spark).orderBy("c_custkey", "tag")
  }

  /** GlueExtractor's positional column fan-out —
    * posexplode(concat(columns, partition_keys)), positions continuing
    * across the concat (extractor/glue_extractor.py:42-90). */
  def glueColumns(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select(col("p_partkey"),
        posexplode(array(col("p_name"), col("p_brand"), col("p_type"),
          col("p_size").cast("string"))))
      .select(col("p_partkey"), col("pos"), col("col").as("col_name"))
      .orderBy("p_partkey", "pos")

  /** PrestoViewMetadataExtractor decode path — base64 round trip + JSON
    * field extraction (databuilder/extractor/
    * presto_view_metadata_extractor.py:92-115): unbase64 + get_json_object. */
  def base64Json(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(col("event_id") < 1000)
      .withColumn("encoded", base64(col("props").cast("binary")))
      .withColumn("decoded", unbase64(col("encoded")).cast("string"))
      .select(col("event_id"), col("encoded"),
        get_json_object(col("decoded"), "$.k").cast("long").as("k"))
      .orderBy("event_id")
}
