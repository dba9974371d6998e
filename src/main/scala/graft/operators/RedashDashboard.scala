package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.RestFetch
import graft.sources.RestFetch.{HttpClient, RetryPolicy}

/** Redash dashboard extractor configuration (reference
  * databuilder/extractor/dashboard/redash/redash_dashboard_extractor.py +
  * redash_dashboard_utils.py): a count-paginated dashboard list, a
  * published filter, and per-dashboard widget payloads fanned into the
  * dashboard/query/chart model family — Redash's third pagination
  * discipline (total `count` vs `page * page_size`, :80-96) alongside
  * Mode's full-page heuristic and Tableau's relay cursors.
  */
object RedashDashboard {

  /** get_auth_headers (redash_dashboard_utils.py:135-136). */
  def authHeaders(apiKey: String): Map[String, String] =
    Map("Authorization" -> s"Key $apiKey")

  private[graft] def pageMeta(body: String): (Long, Long, Long) = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val root = new ObjectMapper().readTree(body)
    def l(k: String): Long = Option(root.get(k)).map(_.asLong(0L)).getOrElse(0L)
    (l("count"), l("page"), l("page_size"))
  }

  /** RedashPaginatedRestApiQuery's loop (:74-96): `?page=N` until
    * `page * page_size >= count`. */
  def fetchCountPaginated(
      url: String,
      client: HttpClient,
      retry: RetryPolicy = RetryPolicy()): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    // the loop is driven by a LOCAL page counter — a response missing
    // page/page_size must terminate, not refetch page 1 forever
    var page = 1L
    var continue = true
    while (continue) {
      val body = RestFetch.sendWithRetry(client, s"$url?page=$page", retry).body
      out += body
      val (count, _, pageSize) = pageMeta(body)
      continue = pageSize > 0 && page * pageSize < count
      page += 1
    }
    out.toList
  }

  private val dashboardsPageSchema =
    """STRUCT<count: BIGINT, page: BIGINT, page_size: BIGINT,
       results: ARRAY<STRUCT<id: BIGINT, name: STRING, slug: STRING,
         created_at: STRING, updated_at: STRING,
         is_archived: BOOLEAN, is_draft: BOOLEAN,
         user: STRUCT<email: STRING>>>>"""

  /** Dashboard list pages → one row per PUBLISHED dashboard
    * (`not (is_archived or is_draft)`, reference :108-109) with the
    * identity columns, epoch timestamps (0-on-failure), the version-
    * dependent dashboard URL (:129-133), and the owner email riding
    * along — the flattened union of the reference's DashboardMetadata +
    * DashboardLastModifiedTimestamp + DashboardOwner yields. */
  def dashboards(
      spark: SparkSession,
      pages: Seq[String],
      redashBaseUrl: String,
      cluster: String = "prod",
      redashVersion: Int = 9): DataFrame = {
    import spark.implicits._
    def epoch(c: org.apache.spark.sql.Column) = ModeDashboard.isoEpoch(c)
    val url =
      if (redashVersion >= 9)
        concat(lit(s"$redashBaseUrl/dashboards/"), col("id"))
      else concat(lit(s"$redashBaseUrl/dashboard/"), col("slug"))
    pages.toDF("payload")
      .select(explode(from_json(col("payload"),
        org.apache.spark.sql.types.DataType.fromDDL(dashboardsPageSchema))
        .getField("results")).as("d"))
      .select("d.*")
      .filter(!col("is_archived") && !col("is_draft"))
      .select(
        lit("Redash").as("dashboard_group"),
        lit("redash").as("dashboard_group_id"),
        lit(redashBaseUrl).as("dashboard_group_url"),
        col("id").cast("string").as("dashboard_id"),
        col("name").as("dashboard_name"),
        url.as("dashboard_url"),
        epoch(col("created_at")).as("created_timestamp"),
        epoch(col("updated_at")).as("last_modified_timestamp"),
        col("user").getField("email").as("owner_email"),
        lit(cluster).as("cluster"),
        lit("redash").as("product"))
  }

  private val widgetsSchema =
    """STRUCT<widgets: ARRAY<STRUCT<
         text: STRING,
         options: STRUCT<position: STRUCT<row: BIGINT, col: BIGINT>>,
         visualization: STRUCT<id: BIGINT, name: STRING, type: STRING,
           query: STRUCT<id: BIGINT, name: STRING, query: STRING>>>>>"""

  /** Per-dashboard widget payloads → one row per visualization widget:
    * the DashboardQuery + DashboardChart fan-out (reference :168-186).
    * `responses` carries (dashboard_id, payload). */
  def vizWidgets(responses: DataFrame, redashBaseUrl: String): DataFrame =
    responses
      .select(col("dashboard_id"), explode(from_json(col("payload"),
        org.apache.spark.sql.types.DataType.fromDDL(widgetsSchema))
        .getField("widgets")).as("w"))
      .filter(col("w").getField("visualization").isNotNull)
      .select(
        col("dashboard_id"),
        col("w").getField("visualization").getField("query").getField("id")
          .cast("string").as("query_id"),
        col("w").getField("visualization").getField("query").getField("name")
          .as("query_name"),
        concat(lit(s"$redashBaseUrl/queries/"),
          col("w").getField("visualization").getField("query").getField("id")).as("url"),
        col("w").getField("visualization").getField("query").getField("query")
          .as("query_text"),
        col("w").getField("visualization").getField("id").cast("string").as("chart_id"),
        col("w").getField("visualization").getField("name").as("chart_name"),
        col("w").getField("visualization").getField("type").as("chart_type"))

  /** generate_dashboard_description (redash_dashboard_utils.py:139-155):
    * concatenated text widgets (in dashboard position order) win; else a
    * sorted query-name list (the reference iterates a SET — unordered —
    * so a deterministic sort is the reproducible reading); else the
    * empty-dashboard sentinel. One row per dashboard_id. */
  def descriptions(responses: DataFrame): DataFrame =
    responses
      .select(col("dashboard_id"), explode_outer(from_json(col("payload"),
        org.apache.spark.sql.types.DataType.fromDDL(widgetsSchema))
        .getField("widgets")).as("w"))
      .groupBy("dashboard_id")
      .agg(
        array_join(transform(array_sort(collect_list(
          when(col("w").getField("visualization").isNull &&
            col("w").getField("text").isNotNull,
            struct(
              col("w").getField("options").getField("position").getField("row").as("row"),
              col("w").getField("options").getField("position").getField("col").as("col"),
              col("w").getField("text").as("text"))))),
          s => s.getField("text")), "\n\n").as("text_desc"),
        array_join(sort_array(collect_set(
          when(col("w").getField("visualization").isNotNull,
            concat(lit("- "), col("w").getField("visualization")
              .getField("query").getField("name"))))), "\n").as("query_list"))
      .select(col("dashboard_id"),
        when(col("text_desc") =!= "", col("text_desc"))
          .when(col("query_list") =!= "",
            concat(lit("A dashboard containing the following queries:\n\n"),
              col("query_list")))
          .otherwise(lit("This dashboard appears to be empty!")).as("description"))
}
