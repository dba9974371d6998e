package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{NeptuneBulkLoad, Stage}
import graft.sources.NeptuneBulkLoad._
import graft.sources.RestFetch.{HttpResponse, RetryPolicy}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

/** Drives the Neptune bulk-load publisher protocol end to end against a
  * REAL local HTTP stub + directory object store — upload set and order,
  * the one-folder load request, the sleep-then-poll status loop, error-log
  * accumulation across polls, the empty-staging short-circuit, and the
  * fatal missing-loadId / missing-status paths
  * (publisher/neptune_csv_publisher.py:93-175). The staged input is
  * produced by the REAL Spark writer (Stage.writeNeptuneCsv) and the
  * uploaded bytes are read back through Stage.readNeptuneCsv — the staging
  * → store round trip is lossless at the typed-CSV level.
  */
class NeptuneBulkLoadSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val mapper = new ObjectMapper()
  private val noSleepRetry = RetryPolicy(sleeper = _ => ())

  private def withServer(routes: (String, HttpExchange => (Int, String))*)(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, handler) =>
      server.createContext(path, (ex: HttpExchange) => {
        val (status, payload) = handler(ex)
        val bytes = payload.getBytes(UTF_8)
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def realClients: (RestFetchPost, RestFetchGet) =
    (graft.sources.RestFetch.defaultPostClient(), graft.sources.RestFetch.defaultClient())
  private type RestFetchPost = graft.sources.RestFetch.HttpPostClient
  private type RestFetchGet = graft.sources.RestFetch.HttpClient

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(graft.sources.TmpStores.pidScopedRoot("graft-testtmp"), prefix)
    d.toFile.deleteOnExit()
    d
  }

  private def conf(url: String, polls: AtomicInteger = new AtomicInteger()) = Config(
    loaderUrl = url + "/loader",
    bucket = "graft-bucket",
    basePath = "amundsen/graph",
    iamRoleArn = "arn:aws:iam::0:role/loader",
    region = "us-west-2",
    failOnError = true,
    pollPeriodMs = 7L,
    sleeper = _ => polls.incrementAndGet(),
    retry = noSleepRetry)

  test("full protocol: staged CSVs upload in node-then-relation order, one load request, poll to completion") {
    import spark.implicits._
    val nodeDir = tmpDir("nbl-nodes")
    val relDir = tmpDir("nbl-rels")
    val bucket = tmpDir("nbl-bucket")
    // real Spark staging: typed-header CSV shards
    val nodes = Seq((1L, "db://a", true, 0.5), (2L, "db://b", false, 1.5))
      .toDF("id", "key", "active", "score")
    Stage.writeNeptuneCsv(nodes, nodeDir.resolve("nodes.csv").toString)
    val rels = Seq((1L, 2L, "OWNER")).toDF("from", "to", "label")
    Stage.writeNeptuneCsv(rels, relDir.resolve("rels.csv").toString)
    // writeNeptuneCsv writes a DIRECTORY of shards; the publisher uploads
    // regular files in the staging dirs — flatten shards up one level,
    // the loader consumes every file in the folder regardless of name
    def flatten(stageDir: Path, prefix: String): Unit = {
      val sub = stageDir.resolve(s"$prefix.csv")
      Files.list(sub).iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".csv"))
        .zipWithIndex.foreach { case (p, i) =>
          Files.move(p, stageDir.resolve(f"$prefix-part$i%03d.csv"))
        }
      Files.walk(sub).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
    flatten(nodeDir, "nodes")
    flatten(relDir, "rels")

    val polls = new AtomicInteger()
    val loadRequests = new AtomicInteger()
    val statusCalls = new AtomicInteger()
    var requestBody: String = null
    withServer(
      "/loader" -> { ex =>
        if (ex.getRequestMethod == "POST") {
          loadRequests.incrementAndGet()
          requestBody = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          (200, """{"status":"200 OK","payload":{"loadId":"load-42"}}""")
        } else {
          // GET /loader/load-42?errors=true — first poll in progress with
          // one error entry, second completed with another
          assert(ex.getRequestURI.getPath == "/loader/load-42")
          assert(ex.getRequestURI.getQuery == "errors=true")
          val n = statusCalls.incrementAndGet()
          val (st, err) =
            if (n == 1) ("LOAD_IN_PROGRESS", """{"errorCode":"PARSING_ERROR","errorMessage":"bad row","fileName":"s3://graft-bucket/x.csv"}""")
            else ("LOAD_COMPLETED", """{"errorCode":"DATA_TYPE_MISMATCH","errorMessage":"col","fileName":"s3://graft-bucket/y.csv"}""")
          (200, s"""{"payload":{"overallStatus":{"status":"$st"},"errors":{"errorLogs":[$err]}}}""")
        }
      }) { base =>
      val (post, get) = realClients
      val report = NeptuneBulkLoad.publish(
        nodeDir, relDir, "2024_01_02_03_04_05",
        new DirObjectStore(bucket), post, get, conf(base, polls))

      // one load request, polled until terminal, slept before each poll
      assert(loadRequests.get() == 1)
      assert(statusCalls.get() == 2)
      assert(polls.get() == 2)
      assert(report.loadId.contains("load-42"))
      assert(report.status == "LOAD_COMPLETED")
      // error logs accumulate across ALL polls, not just the last
      assert(report.errors.map(_.errorCode) == Seq("PARSING_ERROR", "DATA_TYPE_MISMATCH"))

      // the load request names the uploaded folder and carries the config
      val req = mapper.readTree(requestBody)
      assert(req.get("source").asText() == "s3://graft-bucket/amundsen/graph/2024_01_02_03_04_05")
      assert(req.get("format").asText() == "csv")
      assert(req.get("failOnError").asBoolean())
      assert(req.get("region").asText() == "us-west-2")
      assert(req.get("iamRoleArn").asText().startsWith("arn:aws:iam"))

      // nodes uploaded before relations; keys under basePath/runStamp
      assert(report.uploaded.nonEmpty)
      assert(report.uploaded.forall(_.startsWith("amundsen/graph/2024_01_02_03_04_05/")))
      val (nodeKeys, relKeys) = report.uploaded.partition(_.contains("nodes"))
      assert(nodeKeys.nonEmpty && relKeys.nonEmpty)
      assert(report.uploaded.indexOf(nodeKeys.head) < report.uploaded.indexOf(relKeys.head))

      // uploaded bytes are byte-identical to the staged shards …
      report.uploaded.foreach { key =>
        val staged = (if (key.contains("nodes")) nodeDir else relDir).resolve(key.split('/').last)
        assert(java.util.Arrays.equals(Files.readAllBytes(bucket.resolve(key)), Files.readAllBytes(staged)))
      }
      // … and the typed-header contract survives the store: read the
      // "S3" folder back through the bulk-loader's header parser
      val uploadedNodesDir = tmpDir("nbl-nodes-read")
      report.uploaded.filter(_.contains("nodes")).foreach { key =>
        Files.copy(bucket.resolve(key), uploadedNodesDir.resolve(key.split('/').last))
      }
      val back = Stage.readNeptuneCsv(spark, uploadedNodesDir.toString)
        .orderBy("id").collect()
      assert(back.map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getDouble(3))).toSeq ==
        Seq((1L, "db://a", true, 0.5), (2L, "db://b", false, 1.5)))
    }
  }

  test("empty staging dirs short-circuit: no uploads, no HTTP calls") {
    val hits = new AtomicInteger()
    val post: RestFetchPost = (_, _, _) => { hits.incrementAndGet(); HttpResponse(200, "{}") }
    val get: RestFetchGet = _ => { hits.incrementAndGet(); HttpResponse(200, "{}") }
    val report = NeptuneBulkLoad.publish(
      tmpDir("nbl-empty-n"), tmpDir("nbl-empty-r"), "s",
      new DirObjectStore(tmpDir("nbl-empty-b")), post, get,
      conf("http://unused"))
    assert(report.status == "NO_UPLOAD_REQUIRED")
    assert(report.loadId.isEmpty && report.uploaded.isEmpty && report.errors.isEmpty)
    assert(hits.get() == 0)
  }

  test("missing loadId and missing overallStatus are fatal protocol errors") {
    val nodeDir = tmpDir("nbl-f-nodes")
    Files.write(nodeDir.resolve("n.csv"), "a:Long\n1\n".getBytes(UTF_8))
    val relDir = tmpDir("nbl-f-rels")
    val store = new DirObjectStore(tmpDir("nbl-f-bucket"))

    val noId: RestFetchPost = (_, _, _) => HttpResponse(200, """{"payload":{}}""")
    val get0: RestFetchGet = _ => HttpResponse(200, "{}")
    val e1 = intercept[IllegalStateException] {
      NeptuneBulkLoad.publish(nodeDir, relDir, "s", store, noId, get0, conf("http://unused"))
    }
    assert(e1.getMessage.contains("Failed to load csv"))

    val okId: RestFetchPost = (_, _, _) =>
      HttpResponse(200, """{"payload":{"loadId":"L1"}}""")
    val noStatus: RestFetchGet = _ => HttpResponse(200, """{"payload":{"errors":{}}}""")
    val e2 = intercept[IllegalStateException] {
      NeptuneBulkLoad.publish(nodeDir, relDir, "s", store, okId, noStatus, conf("http://unused"))
    }
    assert(e2.getMessage.contains("Failed to check status of L1"))
  }

  test("transient 5xx on the load POST retries to success; queued loads keep polling") {
    val nodeDir = tmpDir("nbl-r-nodes")
    Files.write(nodeDir.resolve("n.csv"), "a:Long\n1\n".getBytes(UTF_8))
    val relDir = tmpDir("nbl-r-rels")
    val postAttempts = new AtomicInteger()
    val post: RestFetchPost = (_, _, _) =>
      if (postAttempts.incrementAndGet() < 3) HttpResponse(503, "busy")
      else HttpResponse(200, """{"payload":{"loadId":"L2"}}""")
    val statuses = Iterator("LOAD_NOT_STARTED", "LOAD_IN_QUEUE", "LOAD_IN_PROGRESS", "LOAD_COMPLETED")
    val get: RestFetchGet = _ =>
      HttpResponse(200, s"""{"payload":{"overallStatus":{"status":"${statuses.next()}"}}}""")
    val report = NeptuneBulkLoad.publish(
      nodeDir, relDir, "s", new DirObjectStore(tmpDir("nbl-r-bucket")),
      post, get, conf("http://unused"))
    assert(postAttempts.get() == 3)
    assert(report.status == "LOAD_COMPLETED")
    assert(report.errors.isEmpty)
  }
}
