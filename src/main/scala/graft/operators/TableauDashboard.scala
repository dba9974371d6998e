package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.DashboardMetadata
import graft.sources.RestFetch
import graft.sources.RestFetch.{HttpPostClient, RetryPolicy}

/** Tableau dashboard extractor configuration (reference
  * databuilder/extractor/dashboard/tableau/tableau_dashboard_extractor.py
  * + tableau_dashboard_utils.py): the Metadata API is GraphQL — a POSTed
  * query document with an auth-token header — and large sites page it
  * with the relay cursor convention (`first`/`after` +
  * `pageInfo{hasNextPage,endCursor}`); the reference's single-shot
  * `query { workbooks {…} }` (:90-99) is the degenerate one-page case.
  *
  * Semantics reproduced:
  *  - workbooks → dashboards, top-level project → dashboard group
  *    (tableau_dashboard_extractor.py:66-74);
  *  - project-exclusion list + permission skip (rows with null
  *    projectName/name dropped with the reference's warning semantics)
  *    (:38-51);
  *  - `sanitize_workbook_name`: forward slashes and single quotes deleted
  *    (tableau_dashboard_utils.py:57-65);
  *  - group/dashboard URLs built from base url + optional
  *    `/site/{site}` path + vizportal ids (:52-59);
  *  - created_timestamp → epoch with 0-on-failure (the chained
  *    TimestampStringToEpoch, :103-107).
  */
object TableauDashboard {

  /** The workbooks query, cursor-paged. */
  val workbooksQuery: String =
    """query workbooks($first: Int!, $after: String) {
      |  workbooksConnection(first: $first, after: $after) {
      |    nodes { id name createdAt description projectName
      |            projectVizportalUrlId vizportalUrlId }
      |    pageInfo { hasNextPage endCursor }
      |  }
      |}""".stripMargin

  /** Parse `data.workbooksConnection.pageInfo` for the fetch loop. */
  private[graft] def pageInfoOf(body: String): (Boolean, String) = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val root = new ObjectMapper().readTree(body)
    val pi = Seq("data", "workbooksConnection", "pageInfo")
      .foldLeft(root)((n, p) => if (n == null) null else n.get(p))
    if (pi == null) (false, null)
    else (Option(pi.get("hasNextPage")).exists(_.asBoolean(false)),
      Option(pi.get("endCursor")).map(_.asText()).orNull)
  }

  /** The GraphQL fetch loop: POST the query with relay cursor variables
    * until `hasNextPage` goes false; one raw page body per element. The
    * auth token rides the `X-Tableau-Auth` header exactly like the
    * reference's execute_query (tableau_dashboard_utils.py:94-109). */
  def fetchWorkbookPages(
      metadataUrl: String,
      authToken: String,
      pageSize: Int,
      post: HttpPostClient,
      retry: RetryPolicy = RetryPolicy()): Seq[String] = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    val headers = Map(
      "Content-Type" -> "application/json",
      "X-Tableau-Auth" -> authToken)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var after: String = null
    var continue = true
    while (continue) {
      val vars = s"""{"first": $pageSize, "after": ${
        if (after == null) "null" else "\"" + esc(after) + "\""}}"""
      val payload = s"""{"query": "${esc(workbooksQuery)}", "variables": $vars}"""
      val body = RestFetch.sendPostWithRetry(post, metadataUrl, payload, headers, retry).body
      out += body
      val (hasNext, cursor) = pageInfoOf(body)
      continue = hasNext && cursor != null
      after = cursor
    }
    out.toList
  }

  /** sanitize_workbook_name (tableau_dashboard_utils.py:57-65). */
  def sanitizeWorkbookName(c: Column): Column = regexp_replace(c, "[/']", "")

  private val pageSchema =
    """STRUCT<data: STRUCT<workbooksConnection: STRUCT<
         nodes: ARRAY<STRUCT<id: STRING, name: STRING, createdAt: STRING,
           description: STRING, projectName: STRING,
           projectVizportalUrlId: STRING, vizportalUrlId: STRING>>>>>"""

  /** Pages → typed models: parse, explode, exclude, sanitize, build URLs,
    * epoch the timestamp — the reference's execute() + transformer chain
    * as column algebra. */
  def dashboardMetadata(
      spark: SparkSession,
      pages: Seq[String],
      tableauBaseUrl: String,
      siteName: String = "",
      cluster: String = "gold",
      excludedProjects: Seq[String] = Nil): Dataset[DashboardMetadata] = {
    import spark.implicits._
    val sitePath = if (siteName.isEmpty) "" else s"/site/$siteName"
    val nodes = pages.toDF("payload")
      .select(explode(from_json(col("payload"),
        org.apache.spark.sql.types.DataType.fromDDL(pageSchema))
        .getField("data").getField("workbooksConnection").getField("nodes")).as("w"))
      .select("w.*")
      // permission skip: null project or name (reference :48-51)
      .filter(col("projectName").isNotNull && col("name").isNotNull)
      .filter(if (excludedProjects.isEmpty) lit(true)
        else !col("projectName").isInCollection(excludedProjects))
    nodes.select(
        col("projectName").as("dashboardGroup"),
        sanitizeWorkbookName(col("name")).as("dashboardName"),
        col("description"),
        array().cast("array<string>").as("tags"),
        lit(cluster).as("cluster"),
        lit("tableau").as("product"),
        lit(null).cast("string").as("dashboardGroupDescription"),
        ModeDashboard.isoEpoch(col("createdAt")).as("createdTimestamp"),
        concat(lit(s"$tableauBaseUrl/#$sitePath/workbooks/"),
          col("vizportalUrlId"), lit("/views")).as("dashboardUrl"),
        concat(lit(s"$tableauBaseUrl/#$sitePath/projects/"),
          col("projectVizportalUrlId")).as("groupUrl"))
      .as[DashboardMetadata]
  }

  /** Full extractor: paged GraphQL fetch → model. */
  def extract(
      spark: SparkSession,
      metadataUrl: String,
      authToken: String,
      tableauBaseUrl: String,
      post: HttpPostClient,
      siteName: String = "",
      cluster: String = "gold",
      excludedProjects: Seq[String] = Nil,
      pageSize: Int = 100,
      retry: RetryPolicy = RetryPolicy()): Dataset[DashboardMetadata] =
    dashboardMetadata(spark,
      fetchWorkbookPages(metadataUrl, authToken, pageSize, post, retry),
      tableauBaseUrl, siteName, cluster, excludedProjects)
}
