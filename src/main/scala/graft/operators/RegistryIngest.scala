package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Payload-registry extractors: services that hand back a typed document
  * (Feast's feature registry, BambooHR's employee-directory XML) which the
  * reference walks object-by-object. Spark-first shape: the payload is a
  * column, the walk is `from_json`/`from_xml` + array/map expressions, so
  * parsing stays codegen'd and distributed — no driver-side iteration.
  */
object RegistryIngest {

  /** FeastExtractor analog (reference:
    * databuilder/extractor/feast_extractor.py:49-140): a feature table
    * becomes TableMetadata(database='feast', cluster=instance, schema=
    * project, name=feature_table) whose columns are the ENTITIES first
    * (sort_order 0..) then the FEATURES (sort_order nEntities..), exactly
    * the reference's index arithmetic (:75-91).
    *
    * The registry payload is built deterministically from the star schema
    * (project = region, feature table per nation, entity = nation key,
    * features = the nation's suppliers) and then parsed back with
    * from_json — the oracle recomputes the expected columns relationally,
    * so the parse path is what is being verified. */
  def feastFeatureTables(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables(spark, dir, "nation")
      .join(broadcast(Tables(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
    val features = Tables(spark, dir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(sort_array(collect_list(struct(col("s_suppkey"),
        concat(lit("f_s"), col("s_suppkey")).as("name")))).as("fs"))
      .select(col("s_nationkey"),
        expr("transform(fs, f -> struct(f.name as name, 'DOUBLE' as dtype))").as("features"))
    val registry = nations
      .join(features, col("n_nationkey") === col("s_nationkey"), "left")
      .select(to_json(struct(
        col("r_name").as("project"),
        concat(lit("ft_"), lower(col("n_name"))).as("name"),
        array(struct(concat(lower(col("n_name")), lit("_id")).as("name"),
          lit("INT64").as("value_type"))).as("entities"),
        coalesce(col("features"),
          expr("array()").cast("array<struct<name:string,dtype:string>>")).as("features")
      )).as("payload"))
    val parsed = registry.select(from_json(col("payload"), org.apache.spark.sql.types.DataType.fromDDL(
      "STRUCT<project: STRING, name: STRING, " +
        "entities: ARRAY<STRUCT<name: STRING, value_type: STRING>>, " +
        "features: ARRAY<STRUCT<name: STRING, dtype: STRING>>>"))
      .as("ft"))
    parsed.select(col("ft.project").as("project"),
        col("ft.name").as("feature_table"),
        posexplode(expr(
          "concat(transform(ft.entities, e -> struct(e.name as name, e.value_type as col_type)), " +
            "transform(ft.features, f -> struct(f.name as name, f.dtype as col_type)))")))
      .select(lit("feast").as("database_name"), lit("main").as("cluster"),
        col("project"), col("feature_table"),
        col("col.name").as("col_name"), col("col.col_type").as("col_type"),
        col("pos").cast("long").as("sort_order"))
      .orderBy("project", "feature_table", "sort_order")
  }

  /** BamboohrUserExtractor analog (reference:
    * databuilder/extractor/user/bamboohr/bamboohr_user_extractor.py:38-62):
    * the employee-directory XML (`<employee><field id="...">` rows) parsed
    * with from_xml; each `field` element keys by its `id` attribute and a
    * missing field defaults to '' exactly like the reference's get_field.
    * jobTitle is present only for even ids to exercise that default. */
  def bamboohrUsers(spark: SparkSession, dir: String): DataFrame = {
    val xml = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(concat(
        lit("<employee>"),
        lit("<field id=\"workEmail\">s"), col("s_suppkey"), lit("@corp</field>"),
        lit("<field id=\"firstName\">F"), col("s_suppkey"), lit("</field>"),
        lit("<field id=\"lastName\">L"), col("s_suppkey"), lit("</field>"),
        lit("<field id=\"displayName\">"), col("s_name"), lit("</field>"),
        lit("<field id=\"department\">"), col("n_name"), lit("</field>"),
        when(col("s_suppkey") % 2 === 0,
          lit("<field id=\"jobTitle\">supplier</field>")).otherwise(lit("")),
        lit("</employee>")).as("payload"))
    val parsed = xml.select(expr(
      "from_xml(payload, 'field ARRAY<STRUCT<_id: STRING, _VALUE: STRING>>')").as("e"))
    val fields = parsed.select(
      map_from_entries(expr("transform(e.field, f -> struct(f._id, f._VALUE))")).as("m"))
    def f(name: String) = coalesce(col("m")(name), lit(""))
    fields.select(
        f("workEmail").as("email"), f("firstName").as("first_name"),
        f("lastName").as("last_name"), f("displayName").as("name"),
        f("department").as("team_name"), f("jobTitle").as("role_name"))
      .orderBy("email")
  }
}
