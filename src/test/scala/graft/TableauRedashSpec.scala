package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{RedashDashboard, TableauDashboard}
import graft.sources.RestFetch.{RetryPolicy, defaultClient, defaultPostClient}
import java.net.InetSocketAddress

/** The remaining two per-product dashboard configs, each with its own
  * pagination discipline driven against a real local stub: Tableau's
  * relay-cursor GraphQL metadata API and Redash's count-based paging.
  */
class TableauRedashSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val noSleep = RetryPolicy(sleeper = _ => ())

  private def serve(routes: (String, HttpExchange => (Int, String))*)(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, handler) =>
      server.createContext(path, (ex: HttpExchange) => {
        val (status, payload) = handler(ex)
        val bytes = payload.getBytes("UTF-8")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  // ---- Tableau ----

  private def workbook(id: Int, name: String, project: String): String =
    s"""{"id":"wb$id","name":"$name","createdAt":"2023-03-0${(id % 9) + 1}T10:00:00Z",
        "description":"about $name","projectName":${
      if (project == null) "null" else "\"" + project + "\""},
        "projectVizportalUrlId":"p$id","vizportalUrlId":"v$id"}"""

  test("Tableau: relay-cursor paging + workbook mapping + exclusions") {
    val seenAuth = scala.collection.mutable.ListBuffer.empty[String]
    val seenAfter = scala.collection.mutable.ListBuffer.empty[String]
    serve("/api/metadata/graphql" -> { ex =>
      seenAuth += Option(ex.getRequestHeaders.getFirst("X-Tableau-Auth")).orNull
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      // crude after-cursor extraction from the variables
      val after = "\"after\": (null|\"([^\"]*)\")".r.findFirstMatchIn(body)
        .flatMap(m => Option(m.group(2))).orNull
      seenAfter += after
      val (nodes, pageInfo) =
        if (after == null)
          (Seq(workbook(1, "Sales / Q1", "Analytics"),
            workbook(2, "Ops'", "Internal")),
            """{"hasNextPage": true, "endCursor": "c1"}""")
        else
          (Seq(workbook(3, "Churn", "Analytics"),
            workbook(4, "NoProject", null)),
            """{"hasNextPage": false, "endCursor": null}""")
      (200, s"""{"data":{"workbooksConnection":{
          "nodes":[${nodes.mkString(",")}],
          "pageInfo":$pageInfo}}}""")
    }) { base =>
      val models = TableauDashboard.extract(spark,
        s"$base/api/metadata/graphql", "tok123", "https://tableau.example",
        defaultPostClient(), siteName = "acme",
        excludedProjects = Seq("Internal"), pageSize = 2, retry = noSleep)
        .collect().sortBy(_.dashboardName)
      // both pages fetched, cursor threaded, auth header sent
      assert(seenAfter.toList == List(null, "c1"))
      assert(seenAuth.forall(_ == "tok123"))
      // Internal excluded, null-project permission skip, sanitize applied
      assert(models.map(_.dashboardName).toSeq == Seq("Churn", "Sales  Q1"))
      val m = models.find(_.dashboardName == "Churn").get
      assert(m.product == "tableau" && m.dashboardGroup == "Analytics")
      assert(m.dashboardUrl.contains(
        "https://tableau.example/#/site/acme/workbooks/v3/views"))
      assert(m.groupUrl.contains("https://tableau.example/#/site/acme/projects/p3"))
      assert(m.createdTimestamp.exists(_ > 0L))
      assert(m.description.contains("about Churn"))
    }
  }

  test("Tableau pageInfo parsing") {
    assert(TableauDashboard.pageInfoOf(
      """{"data":{"workbooksConnection":{"pageInfo":{"hasNextPage":true,"endCursor":"x"}}}}""")
      == ((true, "x")))
    assert(TableauDashboard.pageInfoOf("""{"data":{}}""") == ((false, null)))
  }

  // ---- Redash ----

  private def redashDash(id: Int, name: String, archived: Boolean, draft: Boolean): String =
    s"""{"id":$id,"name":"$name","slug":"s$id","created_at":"2022-05-01T09:00:00Z",
        "updated_at":"2022-06-01T09:00:00Z","is_archived":$archived,
        "is_draft":$draft,"user":{"email":"u$id@ex.com"}}"""

  test("Redash pagination terminates when the server omits page/page_size") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    serve("/api/dashboards" -> { _ =>
      hits.incrementAndGet()
      (200, """{"count": 5, "results": []}""")
    }) { base =>
      val pages = RedashDashboard.fetchCountPaginated(
        s"$base/api/dashboards", defaultClient(), noSleep)
      assert(pages.length == 1 && hits.get() == 1)
    }
  }

  test("Redash: count paging + published filter + widget fan-out + description") {
    serve("/api/dashboards" -> { ex =>
      val page = Option(ex.getRequestURI.getQuery).getOrElse("page=1")
        .stripPrefix("page=").toInt
      val results = page match {
        case 1 => Seq(redashDash(1, "Rev", false, false),
          redashDash(2, "Archived", true, false))
        case 2 => Seq(redashDash(3, "Draft", false, true),
          redashDash(4, "Funnel", false, false))
        case _ => Seq(redashDash(5, "Empty", false, false))
      }
      (200, s"""{"count": 5, "page": $page, "page_size": 2,
        "results": [${results.mkString(",")}]}""")
    }) { base =>
      val pages = RedashDashboard.fetchCountPaginated(
        s"$base/api/dashboards", defaultClient(), noSleep)
      assert(pages.length == 3) // 5 results / page_size 2 → 3 pages
      val dashes = RedashDashboard.dashboards(spark, pages, "https://redash.example")
        .orderBy("dashboard_id").collect()
      // archived + draft filtered: 1, 4, 5 remain
      assert(dashes.map(_.getAs[String]("dashboard_id")).toSeq == Seq("1", "4", "5"))
      val d1 = dashes.head
      assert(d1.getAs[String]("dashboard_url") == "https://redash.example/dashboards/1")
      assert(d1.getAs[String]("owner_email") == "u1@ex.com")
      assert(d1.getAs[Long]("created_timestamp") == 1651395600L)
      assert(d1.getAs[Long]("last_modified_timestamp") > 0L)
      // v8 URLs use the slug
      assert(RedashDashboard.dashboards(spark, pages, "https://redash.example",
        redashVersion = 8).orderBy("dashboard_id").head()
        .getAs[String]("dashboard_url") == "https://redash.example/dashboard/s1")

      import spark.implicits._
      val widgets = Seq(
        ("1", """{"widgets":[
            {"text":"Top section","options":{"position":{"row":0,"col":0}}},
            {"visualization":{"id":11,"name":"Chart A","type":"line",
              "query":{"id":7,"name":"daily rev","query":"select 1"}},
             "options":{"position":{"row":1,"col":0}}},
            {"text":"Bottom","options":{"position":{"row":2,"col":0}}}]}"""),
        ("4", """{"widgets":[
            {"visualization":{"id":12,"name":"Funnel viz","type":"funnel",
              "query":{"id":8,"name":"funnel q","query":"select 2"}},
             "options":{"position":{"row":0,"col":0}}}]}"""),
        ("5", """{"widgets":[]}""")).toDF("dashboard_id", "payload")
      val viz = RedashDashboard.vizWidgets(widgets, "https://redash.example")
        .orderBy("dashboard_id").collect()
      assert(viz.length == 2)
      assert(viz.head.getAs[String]("query_id") == "7")
      assert(viz.head.getAs[String]("url") == "https://redash.example/queries/7")
      assert(viz.head.getAs[String]("chart_name") == "Chart A")
      val desc = RedashDashboard.descriptions(widgets)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      // text widgets concatenated in position order
      assert(desc("1") == "Top section\n\nBottom")
      // no text → query-name list
      assert(desc("4") == "A dashboard containing the following queries:\n\n- funnel q")
      // no widgets at all → empty sentinel
      assert(desc("5") == "This dashboard appears to be empty!")
    }
  }
}
