package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.DashboardMetadata
import graft.operators.RestJoin.JsonField
import graft.sources.RestFetch
import graft.sources.RestFetch.{FailureHandler, HttpClient, NeverSkip, RetryPolicy}

/** The concrete Mode dashboard extractor configuration — the reference's
  * `ModeDashboardExtractor` (extractor/dashboard/mode_analytics/
  * mode_dashboard_extractor.py:38-109) expressed as DATA over the generic
  * machinery: a seed record, two chained REST queries (spaces →
  * paginated reports), and a transformer chain (TimestampStringToEpoch →
  * 2× TemplateVariableSubstitution → DictToModel) landing in the typed
  * `DashboardMetadata` model the graph builder consumes.
  *
  * Query chain (mode_dashboard_utils.py:23-55 + mode_dashboard_extractor
  * .py:92-109):
  *  - seed: `[{organization}]`;
  *  - spaces: `/batch/{organization}/spaces`, JSONPath
  *    `spaces[*].[token,name,description]` → (dashboard_group_id,
  *    dashboard_group, dashboard_group_description), paginated at
  *    `spaces[*]` with page size 1000;
  *  - reports: `/api/{organization}/spaces/{dashboard_group_id}/reports`,
  *    JSONPath `_embedded.reports[*].[token,name,description,created_at]`
  *    → (dashboard_id, dashboard_name, description, created_timestamp),
  *    paginated at `_embedded.reports[*]` with page size 30,
  *    skip_no_result=true (spaces without reports drop).
  *
  * The driver-side fetch universe is |spaces|+1 HTTP calls — catalog-
  * sized, like the reference; everything after the fetch is declarative
  * and distributed.
  */
object ModeDashboard {

  /** TimestampStringToEpoch analog shared by the dashboard products:
    * ISO8601 with 0 to 6 fractional digits (Python's %f accepts any of
    * them; Spark's S patterns count digits exactly, hence the coalesce
    * ladder), 0 on parse failure
    * (transformer/timestamp_string_to_epoch.py:30-44). */
  def isoEpoch(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(unix_timestamp(coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.S'Z'")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SS'Z'")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSS'Z'")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSS'Z'")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss")))), lit(0L))

  /** One link of the reference's RestApiQuery decorator chain, as data. */
  final case class RestQueryConfig(
      urlTemplate: String,
      payloadSchema: String,
      fields: Seq[JsonField],
      paginationPath: Option[String] = None,
      maxRecordSize: Int = 30,
      skipNoResult: Boolean = false)

  /** `{placeholder}` names a URL template pulls from the outer record. */
  private[graft] def templateKeys(template: String): Seq[String] =
    "\\{([A-Za-z0-9_]+)\\}".r.findAllMatchIn(template).map(_.group(1)).toSeq.distinct

  /** Execute one configured query against the outer frame: collect the
    * distinct template-key combinations (API-entity-sized), run the
    * fetch loop (paginated when configured), land the payloads as a
    * responses frame, and apply the declarative REST join. Pages of one
    * key each join and explode independently — the union-of-pages
    * semantics of the reference's pagination loop falls out of the join. */
  def runQuery(
      outer: DataFrame,
      cfg: RestQueryConfig,
      client: HttpClient,
      retry: RetryPolicy = RetryPolicy(),
      failureHandler: FailureHandler = NeverSkip): DataFrame = {
    val keys = templateKeys(cfg.urlTemplate)
    val missing = keys.filterNot(outer.columns.contains)
    require(missing.isEmpty,
      s"URL template needs columns ${missing.mkString(",")} not present in the outer frame")
    val records = outer.select(keys.map(col): _*).distinct().collect()
      .map(r => keys.zipWithIndex.map { case (c, i) =>
        c -> Option(r.get(i)).map(_.toString).orNull }.toMap).toSeq
    val fetched = cfg.paginationPath match {
      case Some(p) => RestFetch.fetchPaginated(records, cfg.urlTemplate, p,
        cfg.maxRecordSize, client, retry, failureHandler)
      case None => RestFetch.fetchPerRecord(records, cfg.urlTemplate,
        client, retry, failureHandler)
    }
    val responses = RestFetch.responsesDF(outer.sparkSession, keys, fetched).drop("page")
    RestJoin.restApiJoin(outer, responses, keys, "payload",
      cfg.payloadSchema, cfg.fields, cfg.skipNoResult)
  }

  /** Spaces query (mode_dashboard_utils.py:23-55). `baseUrl` replaces the
    * hardcoded https://app.mode.com so specs point at a local stub. */
  def spacesQuery(baseUrl: String): RestQueryConfig = RestQueryConfig(
    urlTemplate = s"$baseUrl/batch/{organization}/spaces",
    payloadSchema =
      "STRUCT<spaces: ARRAY<STRUCT<token: STRING, name: STRING, description: STRING>>>",
    fields = Seq(
      JsonField("dashboard_group_id", "spaces.token"),
      JsonField("dashboard_group", "spaces.name"),
      JsonField("dashboard_group_description", "spaces.description")),
    paginationPath = Some("spaces"),
    maxRecordSize = 1000)

  /** Reports query (mode_dashboard_extractor.py:92-109): paginated at 30
    * records per page, inner-join semantics. */
  def reportsQuery(baseUrl: String): RestQueryConfig = RestQueryConfig(
    urlTemplate = s"$baseUrl/api/{organization}/spaces/{dashboard_group_id}/reports",
    payloadSchema =
      "STRUCT<_embedded: STRUCT<reports: ARRAY<STRUCT<token: STRING, name: STRING, " +
        "description: STRING, created_at: STRING>>>>",
    fields = Seq(
      JsonField("dashboard_id", "_embedded.reports.token"),
      JsonField("dashboard_name", "_embedded.reports.name"),
      JsonField("description", "_embedded.reports.description"),
      JsonField("created_timestamp", "_embedded.reports.created_at")),
    paginationPath = Some("_embedded.reports"),
    maxRecordSize = 30,
    skipNoResult = true)

  /** Reports as id-only rows — the slimmer middle link the queries/owner
    * chains use (mode_dashboard_queries_extractor.py:92-96 extracts just
    * `(_embedded.reports[*].token)`). */
  def reportTokensQuery(baseUrl: String): RestQueryConfig = reportsQuery(baseUrl).copy(
    fields = Seq(JsonField("dashboard_id", "_embedded.reports.token")))

  /** Usage chain (mode_dashboard_usage_extractor.py:25-80): the reports
    * page carries each report's accumulated view count — same paginated
    * walk, different field list. */
  def usageQuery(baseUrl: String): RestQueryConfig = reportsQuery(baseUrl).copy(
    payloadSchema =
      "STRUCT<_embedded: STRUCT<reports: ARRAY<STRUCT<token: STRING, " +
        "view_count: BIGINT>>>>",
    fields = Seq(
      JsonField("dashboard_id", "_embedded.reports.token"),
      JsonField("accumulated_view_count", "_embedded.reports.view_count")))

  /** Last-successful-execution chain
    * (mode_dashboard_last_successful_executions_extractor.py): reports →
    * (token, last_successfully_run_at) → epoch. */
  def lastSuccessfulRunQuery(baseUrl: String): RestQueryConfig = reportsQuery(baseUrl).copy(
    payloadSchema =
      "STRUCT<_embedded: STRUCT<reports: ARRAY<STRUCT<token: STRING, " +
        "last_successfully_run_at: STRING>>>>",
    fields = Seq(
      JsonField("dashboard_id", "_embedded.reports.token"),
      JsonField("last_successful_run_timestamp", "_embedded.reports.last_successfully_run_at")))

  /** Last-modified chain (mode_dashboard_last_modified_timestamp_extractor
    * .py): reports → (token, edited_at) → epoch. */
  def lastModifiedQuery(baseUrl: String): RestQueryConfig = reportsQuery(baseUrl).copy(
    payloadSchema =
      "STRUCT<_embedded: STRUCT<reports: ARRAY<STRUCT<token: STRING, " +
        "edited_at: STRING>>>>",
    fields = Seq(
      JsonField("dashboard_id", "_embedded.reports.token"),
      JsonField("last_modified_timestamp", "_embedded.reports.edited_at")))

  /** Run one of the reports-page sibling chains (usage / last-run /
    * last-modified): seed → spaces → the given reports-page variant, with
    * any `*_timestamp` string column epoched 0-on-failure. */
  def reportsChain(
      spark: SparkSession,
      organization: String,
      cfg: RestQueryConfig,
      baseUrl: String,
      client: HttpClient,
      retry: RetryPolicy = RetryPolicy()): DataFrame = {
    import spark.implicits._
    val seed = Seq(organization).toDF("organization")
    val spaces = runQuery(seed, spacesQuery(baseUrl), client, retry)
    val out = runQuery(spaces, cfg, client, retry)
    out.schema.fields.filter(f =>
      f.name.endsWith("_timestamp") && f.dataType ==
        org.apache.spark.sql.types.StringType)
      .foldLeft(out)((df, f) => df.withColumn(f.name, isoEpoch(col(f.name))))
  }

  /** The queries chain (mode_dashboard_queries_extractor.py:25-109):
    * spaces → report tokens → per-report queries API, then the
    * transformer chain — query URL template substitution and the
    * backslash escape (RegexStrReplaceTransformer with ('\','\\')) —
    * producing the DashboardQuery fields. */
  def queriesQuery(baseUrl: String): RestQueryConfig = RestQueryConfig(
    urlTemplate = s"$baseUrl/api/{organization}/reports/{dashboard_id}/queries",
    payloadSchema =
      "STRUCT<_embedded: STRUCT<queries: ARRAY<STRUCT<token: STRING, name: STRING, " +
        "raw_query: STRING>>>>",
    fields = Seq(
      JsonField("query_id", "_embedded.queries.token"),
      JsonField("query_name", "_embedded.queries.name"),
      JsonField("query_text", "_embedded.queries.raw_query")),
    skipNoResult = true)

  def dashboardQueries(
      spark: SparkSession,
      organization: String,
      baseUrl: String,
      client: HttpClient,
      retry: RetryPolicy = RetryPolicy(),
      failureHandler: FailureHandler = NeverSkip): DataFrame = {
    import spark.implicits._
    val seed = Seq(organization).toDF("organization")
    val spaces = runQuery(seed, spacesQuery(baseUrl), client, retry, failureHandler)
    val reports = runQuery(spaces, reportTokensQuery(baseUrl), client, retry, failureHandler)
    runQuery(reports, queriesQuery(baseUrl), client, retry, failureHandler)
      .withColumn("url",
        format_string("https://app.mode.com/%s/reports/%s/queries/%s",
          col("organization"), col("dashboard_id"), col("query_id")))
      // escape backslashes — they break the downstream Cypher statement
      // (RegexStrReplaceTransformer config in the reference)
      .withColumn("query_text", regexp_replace(col("query_text"), "\\\\", "\\\\\\\\"))
      .select("organization", "dashboard_group_id", "dashboard_group",
        "dashboard_id", "query_id", "query_name", "url", "query_text")
  }

  /** The charts chain (mode_dashboard_charts_extractor.py:55-100) — the
    * reference's deepest composition: spaces → report tokens →
    * per-report queries → per-(report, query) charts, the last link
    * OR-zipping the chart token with its viz-web href. */
  def dashboardCharts(
      spark: SparkSession,
      organization: String,
      baseUrl: String,
      client: HttpClient,
      retry: RetryPolicy = RetryPolicy()): DataFrame = {
    import spark.implicits._
    val seed = Seq(organization).toDF("organization")
    val spaces = runQuery(seed, spacesQuery(baseUrl), client, retry)
    val reports = runQuery(spaces, reportTokensQuery(baseUrl), client, retry)
    val queryNames = runQuery(reports, queriesQuery(baseUrl).copy(
      fields = Seq(
        JsonField("query_id", "_embedded.queries.token"),
        JsonField("query_name", "_embedded.queries.name"))), client, retry)
    val chartsCfg = RestQueryConfig(
      urlTemplate =
        s"$baseUrl/api/{organization}/reports/{dashboard_id}/queries/{query_id}/charts",
      payloadSchema =
        "STRUCT<_embedded: STRUCT<charts: ARRAY<STRUCT<token: STRING, " +
          "_links: STRUCT<report_viz_web: STRUCT<href: STRING>>>>>>",
      fields = Seq(
        JsonField("chart_id", "_embedded.charts.token"),
        JsonField("chart_url", "_embedded.charts._links.report_viz_web.href")),
      skipNoResult = true)
    runQuery(queryNames, chartsCfg, client, retry)
      .select("organization", "dashboard_group_id", "dashboard_group",
        "dashboard_id", "query_id", "query_name", "chart_id", "chart_url")
  }

  /** The owner chain (mode_dashboard_owner_extractor.py:25-100): the
    * reports page OR-zips two paths per report — token AND the creator
    * href — then each creator resource is fetched individually with a
    * 404-skip failure handler, inner-joining the owner email. */
  def ownerReportsQuery(baseUrl: String): RestQueryConfig = reportsQuery(baseUrl).copy(
    payloadSchema =
      "STRUCT<_embedded: STRUCT<reports: ARRAY<STRUCT<token: STRING, " +
        "_links: STRUCT<creator: STRUCT<href: STRING>>>>>>",
    fields = Seq(
      JsonField("dashboard_id", "_embedded.reports.token"),
      JsonField("creator_resource_path", "_embedded.reports._links.creator.href")))

  def dashboardOwners(
      spark: SparkSession,
      organization: String,
      baseUrl: String,
      client: HttpClient,
      retry: RetryPolicy = RetryPolicy()): DataFrame = {
    import spark.implicits._
    val seed = Seq(organization).toDF("organization")
    val spaces = runQuery(seed, spacesQuery(baseUrl), client, retry)
    val reports = runQuery(spaces, ownerReportsQuery(baseUrl), client, retry)
      // a report without a creator link (deleted user) OR-zips a null
      // resource path — drop it here like the reference's 404-skip drops
      // the fetch, instead of failing URL templating for the whole run
      .filter(col("creator_resource_path").isNotNull)
    // per-creator user fetch: skip-on-404 (HttpFailureSkipOnStatus in
    // rest_api_failure_handlers.py), inner-join semantics
    val creatorCfg = RestQueryConfig(
      urlTemplate = s"$baseUrl{creator_resource_path}",
      payloadSchema = "STRUCT<email: STRING>",
      fields = Seq(JsonField("email", "email")),
      skipNoResult = true)
    runQuery(reports, creatorCfg, client, retry, RestFetch.SkipOnStatus(Set(404)))
      .filter(col("email").isNotNull)
      .select("organization", "dashboard_group_id", "dashboard_group",
        "dashboard_id", "email")
  }

  /** The full extractor: seed → spaces → reports → transformer chain →
    * typed model. The transformer chain is the reference's, in order:
    *  1. TimestampStringToEpoch on created_timestamp (ISO8601 with
    *     fractional seconds; 0 on parse failure — transformer/
    *     timestamp_string_to_epoch.py:30-44);
    *  2. TemplateVariableSubstitution → dashboard_group_url;
    *  3. TemplateVariableSubstitution → dashboard_url;
    *  4. DictToModel → DashboardMetadata (product=mode, cluster=gold).
    */
  def dashboardMetadata(
      spark: SparkSession,
      organization: String,
      baseUrl: String,
      client: HttpClient,
      retry: RetryPolicy = RetryPolicy(),
      failureHandler: FailureHandler = NeverSkip): Dataset[DashboardMetadata] = {
    import spark.implicits._
    val seed = Seq(organization).toDF("organization")
    val spaces = runQuery(seed, spacesQuery(baseUrl), client, retry, failureHandler)
    val reports = runQuery(spaces, reportsQuery(baseUrl), client, retry, failureHandler)
    reports
      .withColumn("created_timestamp", isoEpoch(col("created_timestamp")))
      .withColumn("dashboard_group_url",
        format_string("https://app.mode.com/%s/spaces/%s",
          col("organization"), col("dashboard_group_id")))
      .withColumn("dashboard_url",
        format_string("https://app.mode.com/%s/reports/%s",
          col("organization"), col("dashboard_id")))
      .select(
        col("dashboard_group").as("dashboardGroup"),
        col("dashboard_name").as("dashboardName"),
        col("description"),
        array().cast("array<string>").as("tags"),
        lit("gold").as("cluster"),
        lit("mode").as("product"),
        col("dashboard_group_description").as("dashboardGroupDescription"),
        col("created_timestamp").as("createdTimestamp"),
        col("dashboard_url").as("dashboardUrl"),
        col("dashboard_group_url").as("groupUrl"))
      .as[DashboardMetadata]
  }
}
