package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.RestFetch
import graft.sources.RestFetch._
import graft.operators.RestJoin
import graft.operators.RestJoin.JsonField
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** Drives the driver-side REST executor against a REAL local HTTP server —
  * retry with exponential backoff (rest_api_query.py:195-205), skip-on-
  * status failure handlers (rest_api_failure_handlers.py), and the Mode
  * full-page-implies-more pagination loop
  * (mode_paginated_rest_api_query.py:20-71) — then feeds the fetched
  * payloads through RestJoin.restApiJoin end to end, mirroring
  * tests/unit/rest_api/test_rest_api_query.py.
  */
class RestFetchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- local stub server ----
  private def withServer(routes: (String, HttpExchange => (Int, String))*)(
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

  private val noSleep: RetryPolicy =
    RetryPolicy(sleeper = _ => ())

  test("URL templating substitutes every {field}; unresolved placeholder raises") {
    assert(formatUrl("http://h/spaces/{space}/reports/{id}",
      Map("space" -> "s1", "id" -> "42")) == "http://h/spaces/s1/reports/42")
    intercept[IllegalArgumentException] {
      formatUrl("http://h/{missing}", Map("space" -> "s1"))
    }
    // a null record value for a used placeholder is a loud error, not an NPE
    intercept[IllegalArgumentException] {
      formatUrl("http://h/{space}", Map("space" -> null))
    }
    // a null value for an UNUSED key is fine
    assert(formatUrl("http://h/{a}", Map("a" -> "1", "b" -> null)) == "http://h/1")
    // single-pass like Python's str.format: brace-patterned text INSIDE a
    // substituted value passes through verbatim — it is neither
    // re-substituted by another key nor flagged as unresolved
    assert(formatUrl("http://h/{path}/x",
      Map("path" -> "{id}", "id" -> "42")) == "http://h/{id}/x")
    assert(formatUrl("http://h/{a}{b}",
      Map("a" -> "{b}", "b" -> "2")) == "http://h/{b}2")
  }

  test("retry backoff is exponential with a cap: 1s, 2s, 4s, 8s, 10s") {
    val p = RetryPolicy()
    assert((1 to 5).map(p.waitMs) == Seq(1000L, 2000L, 4000L, 8000L, 10000L))
    assert(p.waitMs(10) == 10000L)
  }

  test("transient 500s retry to success; attempts and waits are observed") {
    val hits = new AtomicInteger(0)
    val waits = scala.collection.mutable.ListBuffer.empty[Long]
    withServer("/flaky" -> { _ =>
      if (hits.incrementAndGet() <= 2) (500, "boom") else (200, """{"ok":true}""")
    }) { base =>
      val res = sendWithRetry(defaultClient(), s"$base/flaky",
        RetryPolicy(sleeper = waits += _))
      assert(res.status == 200 && res.body.contains("ok"))
      assert(hits.get() == 3)
      assert(waits.toList == List(1000L, 2000L))
    }
  }

  test("a permanent failure propagates after maxAttempts") {
    val hits = new AtomicInteger(0)
    withServer("/dead" -> { _ => hits.incrementAndGet(); (503, "down") }) { base =>
      val e = intercept[HttpStatusException] {
        sendWithRetry(defaultClient(), s"$base/dead", noSleep.copy(maxAttempts = 3))
      }
      assert(e.status == 503)
      assert(hits.get() == 3)
    }
  }

  test("SkipOnStatus drops the failing record and keeps the rest; NeverSkip raises") {
    withServer(
      "/item/ok" -> { _ => (200, """{"v":"good"}""") },
      "/item/gone" -> { _ => (404, "nope") }
    ) { base =>
      val records = Seq(Map("id" -> "ok"), Map("id" -> "gone"))
      val kept = fetchPerRecord(records, s"$base/item/{id}",
        defaultClient(), noSleep, SkipOnStatus(Set(404)))
      assert(kept.map(_._1("id")) == Seq("ok"))
      intercept[HttpStatusException] {
        fetchPerRecord(records, s"$base/item/{id}", defaultClient(), noSleep, NeverSkip)
      }
    }
  }

  test("Mode pagination: full pages fetch the next page, a short page stops") {
    // page 1 and 2 return exactly maxRecordSize reports, page 3 is short —
    // the reference heuristic must fetch exactly 3 pages
    def reports(n: Int, from: Int): String =
      (from until from + n).map(i => s"""{"token":"r$i"}""")
        .mkString("""{"_embedded":{"reports":[""", ",", "]}}")
    val pagesServed = scala.collection.mutable.ListBuffer.empty[String]
    withServer("/spaces/s1/reports" -> { ex =>
      val page = Option(ex.getRequestURI.getQuery).getOrElse("page=1").stripPrefix("page=")
      pagesServed += page
      page match {
        case "1" => (200, reports(2, 0))
        case "2" => (200, reports(2, 2))
        case _   => (200, reports(1, 4))
      }
    }) { base =>
      val out = fetchPaginated(Seq(Map("space" -> "s1")),
        s"$base/spaces/{space}/reports", "_embedded.reports",
        maxRecordSize = 2, client = defaultClient(), retry = noSleep)
      assert(pagesServed.toList == List("1", "2", "3"))
      assert(out.map(_._2) == Seq(1, 2, 3))
      // union-of-pages carries all 5 reports
      val all = out.flatMap(p => "r\\d+".r.findAllIn(p._3))
      assert(all == Seq("r0", "r1", "r2", "r3", "r4"))
    }
  }

  test("countAtPath: arrays count elements, scalars 1, absent 0") {
    assert(countAtPath("""{"a":{"b":[1,2,3]}}""", "a.b") == 3)
    assert(countAtPath("""{"a":{"b":"x"}}""", "a.b") == 1)
    assert(countAtPath("""{"a":{}}""", "a.b") == 0)
    assert(countAtPath("""{}""", "a.b") == 0)
  }

  test("distributed fetch: per-partition clients, failures as status rows") {
    val hits = new AtomicInteger(0)
    withServer(
      "/ok" -> { _ => hits.incrementAndGet(); (200, """{"d":1}""") },
      "/gone" -> { _ => (404, "nope") }
    ) { base =>
      import spark.implicits._
      val urls = (1 to 6).map(i => s"$base/ok/$i") :+ s"$base/gone/x"
      val got = RestFetch.fetchDistributed(
        urls.toDS().repartition(3),
        // factory builds the client executor-side; noSleep retry keeps
        // the 404 from pausing the test
        () => defaultClient(),
        RetryPolicy(maxAttempts = 1, sleeper = _ => ()),
        perPartitionQps = 1000.0)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      assert(got.length == 7)
      // successes carry bodies, the 404 is a status-coded row, not a crash
      assert(got.count(_._2 == 200) == 6)
      assert(got.filter(_._2 == 200).forall(_._3 == """{"d":1}"""))
      val bad = got.find(_._2 == 404).get
      assert(bad._1.endsWith("/gone/x") && bad._3 == null)
      assert(hits.get() == 6)
    }
  }

  test("distributed fetch paces to the per-partition rate limit") {
    withServer("/fast" -> { _ => (200, "{}") }) { base =>
      import spark.implicits._
      // 4 requests in ONE partition at 20 qps → ≥150ms between-send floor
      val t0 = System.nanoTime()
      RestFetch.fetchDistributed(
        (1 to 4).map(i => s"$base/fast/$i").toDS().coalesce(1),
        () => defaultClient(), RetryPolicy(sleeper = _ => ()),
        perPartitionQps = 20.0).collect()
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(elapsedMs >= 150, s"4 reqs at 20qps finished in ${elapsedMs}ms")
    }
  }

  test("fetched payloads drive restApiJoin end to end (reference unit-test shape)") {
    // mirrors test_rest_api_query: seed records join per-record payloads,
    // extracted fields merge into copies of the outer record
    withServer(
      "/api/bar1" -> { _ => (200, """{"foo":{"name":"john","hobby":"skiing"}}""") },
      "/api/bar2" -> { _ => (200, """{"foo":{"name":"doe","hobby":"snowboarding"}}""") }
    ) { base =>
      import spark.implicits._
      val outer = Seq(("bar1", 1L), ("bar2", 2L)).toDF("seed", "n")
      val fetched = fetchPerRecord(
        Seq(Map("seed" -> "bar1"), Map("seed" -> "bar2")),
        s"$base/api/{seed}", defaultClient(), noSleep)
      val responses = responsesDF(spark, Seq("seed"), fetched)
      assert(responses.columns.toSeq == Seq("seed", "page", "payload"))
      val joined = RestJoin.restApiJoin(outer, responses, Seq("seed"), "payload",
        "STRUCT<foo: STRUCT<name: STRING, hobby: STRING>>",
        Seq(JsonField("name_field", "foo.name"), JsonField("hobby", "foo.hobby")),
        skipNoResult = false)
        .orderBy("seed")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      assert(joined.toSeq == Seq(
        ("bar1", 1L, "john", "skiing"),
        ("bar2", 2L, "doe", "snowboarding")))
    }
  }
}
