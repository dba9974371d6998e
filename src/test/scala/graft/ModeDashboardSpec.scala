package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Dashboard
import graft.model.Graph
import graft.operators.ModeDashboard
import graft.sources.RestFetch.{RetryPolicy, defaultClient}
import java.net.InetSocketAddress

/** End-to-end Mode extractor config: a stub Mode API (spaces + paginated
  * reports endpoints) drives seed → spaces → reports → transformer chain
  * → Dataset[DashboardMetadata] → graph fan-out, the full composition of
  * mode_dashboard_extractor.py:38-109 over fixture payloads.
  */
class ModeDashboardSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val noSleep = RetryPolicy(sleeper = _ => ())

  private def space(token: String, name: String, desc: String) =
    s"""{"token":"$token","name":"$name","description":"$desc"}"""
  private def report(i: Int) = {
    val ts = s"2021-02-05T21:20:${(i % 60).formatted("%02d")}.019Z"
    // report 30 has no creator link — the deleted-user shape the owner
    // chain must skip rather than crash on
    val links = if (i == 30) "" else s""""_links":{"creator":{"href":"/api/users/u$i"}},"""
    s"""{"token":"r$i","name":"report $i","description":"about $i",$links""" +
      s""""view_count":${100 + i},"last_successfully_run_at":"$ts",""" +
      s""""edited_at":"$ts","created_at":"$ts"}"""
  }

  private def withModeStub(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: HttpExchange, payload: String): Unit = {
      val bytes = payload.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    // spaces: one short page (page size 1000 — never paginates here)
    server.createContext("/batch/org1/spaces", (ex: HttpExchange) =>
      respond(ex, s"""{"spaces":[${space("s1", "Marketing", "mkt space")},
        ${space("s2", "Finance", "fin space")}, ${space("s3", "Empty", "no reports")}]}"""))
    // reports: s1 has 31 (30 = full page → page 2 fetched), s2 has 1, s3 none
    server.createContext("/api/org1/spaces", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath // /api/org1/spaces/{token}/reports
      val token = path.split('/')(4)
      val page = Option(ex.getRequestURI.getQuery).getOrElse("page=1").stripPrefix("page=").toInt
      val reports = (token, page) match {
        case ("s1", 1) => (0 until 30).map(report)
        case ("s1", _) => Seq(report(30))
        case ("s2", 1) => Seq(report(99))
        case _         => Seq.empty
      }
      respond(ex, s"""{"_embedded":{"reports":[${reports.mkString(",")}]}}""")
    })
    // per-report queries API + per-(report, query) charts API
    // (/api/org1/reports/{token}/queries[/{qid}/charts])
    server.createContext("/api/org1/reports", (ex: HttpExchange) => {
      val parts = ex.getRequestURI.getPath.split('/')
      if (parts.length >= 8 && parts(7) == "charts") {
        val cs = (parts(4), parts(6)) match {
          case ("r0", "q1") => Seq(
            """{"token":"c1","_links":{"report_viz_web":{"href":"/viz/c1"}}}""",
            """{"token":"c2","_links":{"report_viz_web":{"href":"/viz/c2"}}}""")
          case _ => Seq.empty
        }
        respond(ex, s"""{"_embedded":{"charts":[${cs.mkString(",")}]}}""")
      } else {
        val qs = parts(4) match {
          case "r0" => Seq(
            """{"token":"q1","name":"daily","raw_query":"select 1"}""",
            """{"token":"q2","name":"weekly","raw_query":"select c:\\x from t"}""")
          case "r99" => Seq("""{"token":"q3","name":"fin","raw_query":"select 2"}""")
          case _ => Seq.empty
        }
        respond(ex, s"""{"_embedded":{"queries":[${qs.mkString(",")}]}}""")
      }
    })
    // creator user API: u99 is gone (404-skip path)
    server.createContext("/api/users", (ex: HttpExchange) => {
      val who = ex.getRequestURI.getPath.split('/')(3)
      if (who == "u99") {
        ex.sendResponseHeaders(404, -1); ex.close()
      } else respond(ex, s"""{"email":"$who@ex.com"}""")
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("Mode config end to end: spaces -> paginated reports -> transformer chain -> model") {
    withModeStub { base =>
      val models = ModeDashboard.dashboardMetadata(
        spark, "org1", base, defaultClient(), noSleep).collect()
      // 31 reports in Marketing + 1 in Finance; Empty dropped (skip_no_result)
      assert(models.length == 32)
      assert(models.map(_.dashboardGroup).toSet == Set("Marketing", "Finance"))
      val r0 = models.find(_.dashboardName == "report 0").get
      assert(r0.product == "mode" && r0.cluster == "gold")
      assert(r0.description.contains("about 0"))
      assert(r0.dashboardGroupDescription.contains("mkt space"))
      // TimestampStringToEpoch: 2021-02-05T21:20:00.019Z -> epoch seconds
      assert(r0.createdTimestamp.contains(1612560000L))
      // TemplateVariableSubstitution results
      assert(r0.groupUrl.contains("https://app.mode.com/org1/spaces/s1"))
      assert(r0.dashboardUrl.contains("https://app.mode.com/org1/reports/r0"))
      // key format {product}_dashboard://{cluster}.{group}/{name}
      assert(r0.dashboardKey == "mode_dashboard://gold.Marketing/report 0")
      // pagination really crossed a page boundary
      assert(models.count(_.dashboardGroup == "Marketing") == 31)

      // the models feed the existing graph fan-out with valid shapes
      val nodes = models.toSeq.flatMap(Dashboard.metadataSerializer.nodes)
      val rels = models.toSeq.flatMap(Dashboard.metadataSerializer.relationships)
      assert(nodes.forall(Graph.nodeValid))
      assert(rels.forall(Graph.relationshipValid))
      assert(nodes.count(_.label == "Dashboard") == 32)
    }
  }

  test("Mode queries chain: spaces -> report tokens -> per-report queries + escape") {
    withModeStub { base =>
      val q = ModeDashboard.dashboardQueries(spark, "org1", base,
        graft.sources.RestFetch.defaultClient(), noSleep)
        .orderBy("query_id").collect()
      // r0 has 2 queries, r99 has 1; the other 30 reports have none and
      // drop (skip_no_result)
      assert(q.length == 3)
      val q2 = q.find(_.getAs[String]("query_id") == "q2").get
      assert(q2.getAs[String]("dashboard_id") == "r0")
      assert(q2.getAs[String]("dashboard_group") == "Marketing")
      assert(q2.getAs[String]("url") ==
        "https://app.mode.com/org1/reports/r0/queries/q2")
      // backslash escape for the downstream Cypher statement: the payload
      // carries one literal backslash, the transformer doubles it
      assert(q2.getAs[String]("query_text") == "select c:\\\\x from t")
      assert(q.find(_.getAs[String]("query_id") == "q3").get
        .getAs[String]("dashboard_group") == "Finance")
    }
  }

  test("Mode sibling chains: usage view counts, last-run + last-modified epochs") {
    withModeStub { base =>
      val client = defaultClient()
      val usage = ModeDashboard.reportsChain(spark, "org1",
        ModeDashboard.usageQuery(base), base, client, noSleep)
        .orderBy("dashboard_id").collect()
      assert(usage.length == 32)
      assert(usage.head.getAs[Long]("accumulated_view_count") == 100L) // r0
      val lastRun = ModeDashboard.reportsChain(spark, "org1",
        ModeDashboard.lastSuccessfulRunQuery(base), base, client, noSleep)
        .orderBy("dashboard_id").collect()
      // string timestamps auto-epoch; the stub serves the created_at shape
      assert(lastRun.head.getAs[Long]("last_successful_run_timestamp") == 1612560000L)
      val lastMod = ModeDashboard.reportsChain(spark, "org1",
        ModeDashboard.lastModifiedQuery(base), base, client, noSleep)
        .orderBy("dashboard_id").collect()
      assert(lastMod.head.getAs[Long]("last_modified_timestamp") == 1612560000L)
    }
  }

  test("Mode charts chain: four-level composition with OR-zipped chart urls") {
    withModeStub { base =>
      val charts = ModeDashboard.dashboardCharts(spark, "org1", base,
        defaultClient(), noSleep).orderBy("chart_id").collect()
      // only r0/q1 has charts; q2 and q3 fetch empty chart lists and drop
      assert(charts.length == 2)
      assert(charts.map(_.getAs[String]("chart_id")).toSeq == Seq("c1", "c2"))
      val c1 = charts.head
      assert(c1.getAs[String]("dashboard_id") == "r0")
      assert(c1.getAs[String]("query_id") == "q1")
      assert(c1.getAs[String]("query_name") == "daily")
      assert(c1.getAs[String]("chart_url") == "/viz/c1")
      assert(c1.getAs[String]("dashboard_group") == "Marketing")
    }
  }

  test("Mode owner chain: OR-zipped creator href + 404-skip user fetch") {
    withModeStub { base =>
      val owners = ModeDashboard.dashboardOwners(spark, "org1", base,
        graft.sources.RestFetch.defaultClient(), noSleep)
        .orderBy("dashboard_id").collect()
      // 32 reports; r99's creator 404s (skip handler) and r30 carries no
      // creator link at all (null-path skip) — both drop, neither crashes
      assert(owners.length == 30)
      assert(owners.forall(r => r.getAs[String]("dashboard_id") != "r99" &&
        r.getAs[String]("dashboard_id") != "r30"))
      val o0 = owners.find(_.getAs[String]("dashboard_id") == "r0").get
      assert(o0.getAs[String]("email") == "u0@ex.com")
      assert(o0.getAs[String]("dashboard_group") == "Marketing")
    }
  }

  test("unparseable created_at lands 0, not null (reference 0-on-failure)") {
    withModeStub { base =>
      // drive just the transformer stage: a report with a junk timestamp
      // report 99 carries seconds 39 — rewrite exactly its created_at to
      // junk via a wrapping client
      val models = ModeDashboard.dashboardMetadata(
        spark, "org1", base, url => {
          val res = defaultClient()(url)
          res.copy(body = res.body.replace("2021-02-05T21:20:39.019Z", "not-a-date"))
        }, noSleep).collect()
      assert(models.find(_.dashboardName == "report 99")
        .get.createdTimestamp.contains(0L))
      // the other timestamps still parse
      assert(models.exists(_.createdTimestamp.exists(_ > 0L)))
    }
  }

  test("isoEpoch accepts 0-6 fractional digits like Python's %f") {
    import spark.implicits._
    val base = 1612560039L // 2021-02-05T21:20:39Z
    val rows = Seq(
      "2021-02-05T21:20:39Z", "2021-02-05T21:20:39.0Z",
      "2021-02-05T21:20:39.01Z", "2021-02-05T21:20:39.019Z",
      "2021-02-05T21:20:39.0190Z", "2021-02-05T21:20:39.01900Z",
      "2021-02-05T21:20:39.019000Z")
      .toDF("ts").select(ModeDashboard.isoEpoch(
        org.apache.spark.sql.functions.col("ts")).as("e"))
      .collect().map(_.getLong(0))
    assert(rows.forall(_ == base), rows.mkString(","))
  }
}
