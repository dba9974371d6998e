package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** RestApiQuery framework analog — the reference's REST-composed join that
  * gates all ~20 dashboard extractors (Mode/Redash/Tableau).
  *
  * Reference semantics (databuilder/rest_api/rest_api_query.py):
  *  - nested-loop 1:1 / 1:N join: for each outer record, format a URL,
  *    fetch a JSON payload, JSONPath-extract N sub-records, merge each
  *    into a copy of the outer record (:134-185);
  *  - AND (`,`) field zipping: k fields extracted per sub-record, zipped
  *    positionally (:207-250); OR (`|`): first JSONPath alternative that
  *    yields values wins (:103-115);
  *  - `skip_no_result` drops outer records with no sub-records (inner
  *    join); default keeps the outer record unchanged (left outer);
  *  - pagination (`mode_paginated_rest_api_query.py:20-71`) = a driver
  *    fetch loop whose pages union into one responses DataFrame.
  *
  * Spark shape: the HTTP fetch is the ingestion edge — the driver (or a
  * rate-limited `mapPartitions`) materializes a `responses` table of
  * (join keys, raw JSON payload); everything after is a declarative
  * equi-join + JSONPath extraction + `arrays_zip` + `explode`, so at scale
  * it broadcasts or shuffles like any other join instead of doing N+1
  * driver round-trips.
  */
object RestJoin {

  /** One output field: OR-alternative dotted field paths into the parsed
    * payload (first path that yields any non-null value wins — the
    * reference's `|` semantics) and the output column name. A path like
    * `orders.id` navigates `array<struct>` levels implicitly (the
    * JSONPath `$.orders[*].id`). */
  case class JsonField(name: String, paths: Seq[String])
  object JsonField {
    def apply(name: String, path: String): JsonField = JsonField(name, Seq(path))
  }

  /** Navigate a dotted path through the parsed payload; array-of-struct
    * levels project field-wise (GetArrayStructFields), so the result of a
    * path through one array level is an array of leaf values. */
  private def navigate(parsed: Column, path: String): Column =
    path.split('.').foldLeft(parsed)(_.getField(_))

  /** Whether the dotted path crosses an array level in the declared
    * payload type — a scalar path (the reference's 1:1 join,
    * e.g. `foo.name` into `{"foo":{"name":…}}`) extracts one value per
    * payload and is lifted to a 1-element array so the zip/explode tail
    * is uniform. */
  private def crossesArray(dt: org.apache.spark.sql.types.DataType, path: String): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    var cur = dt
    var array = false
    path.split('.').foreach { seg =>
      while (cur.isInstanceOf[ArrayType]) {
        array = true
        cur = cur.asInstanceOf[ArrayType].elementType
      }
      cur match {
        case st: StructType => cur = st(seg).dataType
        case other => throw new IllegalArgumentException(
          s"path '$path' segment '$seg' navigates into non-struct type $other")
      }
    }
    array || cur.isInstanceOf[ArrayType]
  }

  /** OR fallthrough: a path whose extraction is null or all-null (the
    * field is absent from the payload) yields no match. */
  private def extractField(
      parsed: Column,
      schema: org.apache.spark.sql.types.DataType,
      f: JsonField): Column = {
    val alts = f.paths.map { p =>
      val a = navigate(parsed, p)
      if (crossesArray(schema, p)) when(a.isNotNull && exists(a, _.isNotNull), a)
      else when(a.isNotNull, array(a))
    }
    coalesce(alts: _*)
  }

  /** The RestApiQuery join. `responses` carries one raw JSON payload per
    * outer key (the fetched body), parsed once with the declared
    * `payloadSchema` (DDL string — the analog of knowing the JSONPath
    * shapes up front; a single codegen'd from_json, robust to 1-element
    * arrays where a JSONPath wildcard degenerates to a scalar). Each
    * configured field is extracted as an array and the arrays are
    * positionally zipped into sub-records (AND semantics), then exploded —
    * 1:N fan-out. `skipNoResult = true` is the reference's inner-join
    * behavior; `false` keeps outer records with null fields (the
    * reference yields the record without the fields; a DataFrame keeps
    * the schema and nulls them). */
  def restApiJoin(
      outer: DataFrame,
      responses: DataFrame,
      keyCols: Seq[String],
      payloadCol: String,
      payloadSchema: String,
      fields: Seq[JsonField],
      skipNoResult: Boolean): DataFrame = {
    val schema = org.apache.spark.sql.types.DataType.fromDDL(payloadSchema)
    val parsed = from_json(col(payloadCol), schema)
    val extracted = responses.select(
      keyCols.map(col) ++ fields.map(f => extractField(parsed, schema, f).as(f.name)): _*)
    // a field with no match zips as an empty array (arrays_zip pads with
    // nulls), so one absent field nulls that column instead of dropping
    // the whole outer record
    val arrs = extracted.select(
      keyCols.map(col) ++ fields.map(f =>
        coalesce(col(f.name), array().cast(extracted.schema(f.name).dataType)).as(f.name)): _*)
    val zipped = arrs
      .withColumn("_zipped", arrays_zip(fields.map(f => col(f.name)): _*))
      .drop(fields.map(_.name): _*)
    val joined = outer.join(zipped, keyCols, "left")
    val gen = if (skipNoResult) explode(col("_zipped")) else explode_outer(col("_zipped"))
    joined
      .withColumn("_sub", gen)
      .select(outer.columns.map(col) ++ fields.map(f => col(s"_sub.${f.name}").as(f.name)): _*)
  }

  /** Paginated fetch analog: the driver loop unions page DataFrames
    * (mode_paginated_rest_api_query.py's page-detection loop). */
  def paginated(pages: Seq[DataFrame]): DataFrame = {
    require(pages.nonEmpty, "paginated() needs at least one page")
    pages.reduce(_ union _)
  }

  // ---- oracle-checkable query shapes ----

  /** Fixture standing in for the driver-side fetcher: one JSON payload per
    * customer listing their orders (sorted for determinism), exactly the
    * shape a dashboard API returns per space. */
  private def orderResponses(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(to_json(struct(
        sort_array(collect_list(struct(
          col("o_orderkey").as("id"),
          col("o_orderstatus").as("status")))).as("orders"))).as("payload"))

  private def restJoin(spark: SparkSession, dir: String, skipNoResult: Boolean): DataFrame = {
    val outer = Tables(spark, dir, "customer").select(col("c_custkey"), col("c_name"))
    val fields = Seq(
      JsonField("order_id", "orders.id"),
      // OR semantics: a path absent from the payload falls through
      JsonField("order_status", Seq("orders.missing_field", "orders.status")))
    restApiJoin(outer, orderResponses(spark, dir), Seq("c_custkey"), "payload",
      "STRUCT<orders: ARRAY<STRUCT<missing_field: STRING, id: BIGINT, status: STRING>>>",
      fields, skipNoResult)
  }

  /** skip_no_result = inner-join behavior: customers without orders drop. */
  def restJoinInner(spark: SparkSession, dir: String): DataFrame =
    restJoin(spark, dir, skipNoResult = true)
      .orderBy("c_custkey", "order_id")

  /** Default = left-outer behavior: customers without orders survive with
    * empty fields (coalesced for deterministic oracle hashing). */
  def restJoinOuter(spark: SparkSession, dir: String): DataFrame =
    restJoin(spark, dir, skipNoResult = false)
      .withColumn("order_id", coalesce(col("order_id"), lit(0L)))
      .withColumn("order_status", coalesce(col("order_status"), lit("")))
      .orderBy("c_custkey", "order_id")
}
