package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.RestFetch
import graft.sources.RestFetch.{HttpClient, RetryPolicy}

/** Atlas search-data extractor analog (reference databuilder/extractor/
  * atlas_search_data_extractor.py:56-317): a paginated DSL search yields
  * entity GUIDs, details are fetched in bulk chunks, and a DECLARATIVE
  * entity→field mapping table turns each raw Atlas entity into a
  * TableESDocument row.
  *
  * The fetch side is driver-resident like every extractor edge (the GUID
  * universe is catalog-sized); the mapping side is pure column algebra —
  * each reference mapping tuple (es_field, atlas path, transform, default)
  * becomes a codegen'd Column over the parsed payload, so document
  * construction distributes over however many entity pages exist.
  */
object AtlasSearch {

  /** One row of FIELDS_MAPPING_SPEC (reference :86-112): output name,
    * extraction expression over the entity struct, and the default that
    * fills nulls — exactly the (field, path, fn, default) tuple as data. */
  final case class FieldMapping(name: String, expr: Column => Column, default: Column)

  /** `attributes.qualifiedName` style dotted navigation. */
  private def path(e: Column, p: String): Column = p.split('.').foldLeft(e)(_.getField(_))

  /** Helpers (reference AtlasSearchDataExtractorHelpers:28-54): status-
    * filtered projections of relationship arrays, Nones dropped. */
  private def activeColumnNames(e: Column): Column =
    filter(path(e, "relationshipAttributes.columns"),
      c => lower(c.getField("status")) === "active" &&
        c.getField("attributes").getField("name").isNotNull)
  private def columnNames(e: Column): Column =
    transform(activeColumnNames(e), c => c.getField("attributes").getField("name"))
  private def columnDescriptions(e: Column): Column =
    filter(transform(activeColumnNames(e), c => c.getField("attributes").getField("description")),
      _.isNotNull)
  private def glossaryTags(e: Column): Column =
    filter(transform(filter(path(e, "relationshipAttributes.meanings"),
      m => lower(coalesce(m.getField("entityStatus"), lit(""))) === "active"),
      _.getField("displayText")), _.isNotNull)
  private def classificationBadges(e: Column): Column =
    filter(transform(filter(path(e, "classifications"),
      c => lower(coalesce(c.getField("entityStatus"), lit(""))) === "active"),
      _.getField("typeName")), _.isNotNull)

  /** FIELDS_MAPPING_SPEC['Table'] verbatim (reference :86-112). */
  val tableFieldMappings: Seq[FieldMapping] = Seq(
    FieldMapping("database", _.getField("typeName"), lit(null).cast("string")),
    FieldMapping("cluster",
      e => element_at(split(path(e, "attributes.qualifiedName"), "@"), -1),
      lit(null).cast("string")),
    FieldMapping("schema", e => path(e, "relationshipAttributes.db.displayText"),
      lit(null).cast("string")),
    FieldMapping("name", e => path(e, "attributes.name"), lit(null).cast("string")),
    FieldMapping("key", e => path(e, "attributes.qualifiedName"), lit(null).cast("string")),
    FieldMapping("description", e => path(e, "attributes.description"),
      lit(null).cast("string")),
    FieldMapping("last_updated_timestamp",
      e => (e.getField("updateTime") / 1000).cast("long"), lit(0L)),
    FieldMapping("total_usage",
      e => path(e, "attributes.popularityScore").cast("long"), lit(0L)),
    FieldMapping("unique_usage",
      e => path(e, "attributes.uniqueUsage").cast("long"), lit(1L)),
    FieldMapping("column_names", columnNames, array().cast("array<string>")),
    FieldMapping("column_descriptions", columnDescriptions, array().cast("array<string>")),
    FieldMapping("tags", glossaryTags, array().cast("array<string>")),
    FieldMapping("badges", classificationBadges, array().cast("array<string>")),
    FieldMapping("display_name",
      e => element_at(split(path(e, "attributes.qualifiedName"), "@"), 1),
      lit(null).cast("string")),
    FieldMapping("schema_description",
      e => path(e, "attributes.parameters").getItem("sourceDescription"),
      lit(null).cast("string")),
    FieldMapping("programmatic_descriptions",
      e => map_values(path(e, "attributes.parameters")), array().cast("array<string>")))

  /** The Atlas Table entity payload shape the mapping table navigates —
    * the analog of knowing the REST response schema up front. */
  val tableEntitySchema: String =
    """STRUCT<guid: STRING, typeName: STRING, updateTime: BIGINT,
       attributes: STRUCT<qualifiedName: STRING, name: STRING, description: STRING,
         popularityScore: DOUBLE, uniqueUsage: BIGINT, parameters: MAP<STRING, STRING>>,
       relationshipAttributes: STRUCT<
         db: STRUCT<displayText: STRING>,
         columns: ARRAY<STRUCT<status: STRING,
           attributes: STRUCT<name: STRING, description: STRING>>>,
         meanings: ARRAY<STRUCT<displayText: STRING, entityStatus: STRING>>>,
       classifications: ARRAY<STRUCT<typeName: STRING, entityStatus: STRING>>>"""

  /** Apply the mapping table over a frame of raw entity-page payloads
    * (one JSON body per row in `payloadCol`, each an
    * `{"entities":[…]}` bulk-details response): explode the entities and
    * evaluate every mapping, `coalesce`-ing in its default. */
  def tableDocs(pages: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val pageSchema = org.apache.spark.sql.types.DataType.fromDDL(
      s"STRUCT<entities: ARRAY<$tableEntitySchema>>")
    pages
      .select(explode(from_json(col(payloadCol), pageSchema).getField("entities")).as("e"))
      .select(tableFieldMappings.map(m => coalesce(m.expr(col("e")), m.default).as(m.name)): _*)
  }

  /** Offset-paginated DSL GUID search (reference _get_entity_guids
    * :213-239): GET `{base}/search/dsl?offset=N&limit=chunk` until a page
    * comes back short. Returns all GUIDs in offset order. */
  def searchGuids(
      baseUrl: String,
      entityType: String,
      chunkSize: Int,
      client: HttpClient,
      retry: RetryPolicy = RetryPolicy()): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var offset = 0
    var continue = true
    while (continue) {
      val body = RestFetch.sendWithRetry(client,
        s"$baseUrl/search/dsl?typeName=$entityType&offset=$offset&limit=$chunkSize",
        retry).body
      val guids = guidsOf(body)
      out ++= guids
      continue = guids.size >= chunkSize
      offset += chunkSize
    }
    out.toList
  }

  private[graft] def guidsOf(body: String): Seq[String] = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val root = new ObjectMapper().readTree(body)
    val entities = root.get("entities")
    if (entities == null || !entities.isArray) Seq.empty
    else (0 until entities.size()).flatMap(i =>
      Option(entities.get(i).get("guid")).map(_.asText()))
  }

  /** Bulk details fetch in GUID chunks (reference _get_entity_details
    * :241-258 + split_list_to_chunks :260-264): one page payload per
    * chunk of `detailsChunkSize` GUIDs. */
  def fetchEntityPages(
      baseUrl: String,
      guids: Seq[String],
      detailsChunkSize: Int,
      client: HttpClient,
      retry: RetryPolicy = RetryPolicy()): Seq[String] =
    guids.grouped(detailsChunkSize).map { chunk =>
      RestFetch.sendWithRetry(client,
        s"$baseUrl/entity/bulk?guids=${chunk.mkString(",")}", retry).body
    }.toList

  /** The full extractor: search → bulk details → mapping table → search
    * documents, defaults chunked like the reference (search 250 /
    * details 25). */
  def extractTableDocs(
      spark: SparkSession,
      baseUrl: String,
      client: HttpClient,
      searchChunkSize: Int = 250,
      detailsChunkSize: Int = 25,
      retry: RetryPolicy = RetryPolicy()): DataFrame = {
    import spark.implicits._
    val guids = searchGuids(baseUrl, "Table", searchChunkSize, client, retry)
    val pages = fetchEntityPages(baseUrl, guids, detailsChunkSize, client, retry)
    tableDocs(pages.toDF("payload"))
  }
}
