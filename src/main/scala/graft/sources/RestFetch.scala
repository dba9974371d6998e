package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** Driver-side REST fetch executor — the piece that PRODUCES the
  * `responses` table RestJoin consumes.
  *
  * Reference semantics reproduced:
  *  - per-record URL templating `url.format(**record)`
  *    (databuilder/rest_api/rest_api_query.py:172-183 via _preprocess_url);
  *  - HTTP GET with exponential-backoff retry, 5 attempts, 1 s base wait
  *    capped at 10 s (rest_api_query.py:195-205's @retry decorator);
  *  - skip-on-failure handlers keyed by HTTP status
  *    (rest_api/rest_api_failure_handlers.py: HttpFailureSkipOnStatus) —
  *    a skippable failure drops the outer record and the loop continues
  *    (rest_api_query.py:146-150);
  *  - Mode page-detection: fetch `url?page=N`, count the records at a
  *    pagination path in the payload, and fetch page N+1 only while the
  *    count reaches the page size — a "full page implies more" heuristic
  *    (mode_analytics/mode_paginated_rest_api_query.py:20-71).
  *
  * Scale stance: the fetch loop runs on the DRIVER, like the reference —
  * the outer universe is API-entity-sized (spaces, reports: thousands),
  * never data-sized, and the product of the loop is a small `responses`
  * DataFrame that joins distributively downstream. The HTTP client is
  * injected (`HttpClient = String => HttpResponse`) so tests drive the
  * full retry/pagination machinery against a local stub and production
  * plugs in a real client; the JDK client below is the default.
  */
object RestFetch {

  final case class HttpResponse(status: Int, body: String)
  type HttpClient = String => HttpResponse

  /** A non-2xx response, carrying the status for skip-on-status handlers. */
  final case class HttpStatusException(status: Int, url: String)
    extends RuntimeException(s"HTTP $status from $url")

  /** Exponential backoff: wait min(maxWaitMs, baseWaitMs * 2^(attempt-1))
    * between attempts — the reference's wait_exponential_multiplier=1000 /
    * wait_exponential_max=10000 / stop_max_attempt_number=5. `sleeper` is
    * injectable so specs don't actually sleep. */
  final case class RetryPolicy(
      maxAttempts: Int = 5,
      baseWaitMs: Long = 1000L,
      maxWaitMs: Long = 10000L,
      sleeper: Long => Unit = Thread.sleep) {
    def waitMs(attempt: Int): Long =
      math.min(maxWaitMs, baseWaitMs * (1L << math.min(attempt - 1, 30)))
  }

  trait FailureHandler { def canSkipFailure(e: Throwable): Boolean }
  object NeverSkip extends FailureHandler {
    def canSkipFailure(e: Throwable): Boolean = false
  }
  /** HttpFailureSkipOnStatus analog: skip outer records whose fetch died
    * with one of the listed statuses (after retries are exhausted). */
  final case class SkipOnStatus(codes: Set[Int]) extends FailureHandler {
    def canSkipFailure(e: Throwable): Boolean = e match {
      case HttpStatusException(status, _) => codes(status)
      case _ => false
    }
  }

  /** Production client on the JDK's HttpClient; status and body only —
    * the contract RestApiQuery needs. */
  def defaultClient(timeoutMs: Long = 10000L): HttpClient = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    url => {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
      val res = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      HttpResponse(res.statusCode(), res.body())
    }
  }

  /** POST client shape — (url, body, headers) → response. The GraphQL
    * ingestion edges (Tableau's metadata API) POST a JSON query document
    * (tableau_dashboard_utils.py:90-109). */
  type HttpPostClient = (String, String, Map[String, String]) => HttpResponse

  def defaultPostClient(timeoutMs: Long = 10000L): HttpPostClient = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    (url, body, headers) => {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      headers.foreach { case (k, v) => b.header(k, v) }
      val res = client.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      HttpResponse(res.statusCode(), res.body())
    }
  }

  /** POST with the same retry/raise-for-status discipline as GETs. */
  def sendPostWithRetry(
      client: HttpPostClient,
      url: String,
      body: String,
      headers: Map[String, String],
      retry: RetryPolicy): HttpResponse = {
    var attempt = 1
    while (true) {
      try {
        val res = client(url, body, headers)
        if (res.status < 200 || res.status >= 300) throw HttpStatusException(res.status, url)
        return res
      } catch {
        case e: Throwable =>
          if (attempt >= retry.maxAttempts) throw e
          retry.sleeper(retry.waitMs(attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** `url.format(**record)`: every `{field}` placeholder replaced from the
    * record; an unresolved placeholder is an error, like Python's
    * KeyError. Single-pass over the TEMPLATE like Python's str.format —
    * brace-patterned text inside a substituted VALUE is emitted verbatim,
    * never re-substituted or mistaken for an unresolved placeholder. */
  def formatUrl(template: String, record: Map[String, String]): String =
    "\\{([A-Za-z0-9_]+)\\}".r.replaceAllIn(template, m => {
      val k = m.group(1)
      require(record.contains(k), s"unresolved URL placeholder {$k} in $template")
      val v = record(k)
      require(v != null, s"null value for URL placeholder {$k} in $template")
      java.util.regex.Matcher.quoteReplacement(v)
    })

  /** GET with retry: raise-for-status on non-2xx, exponential backoff
    * between attempts, last failure propagates. */
  def sendWithRetry(client: HttpClient, url: String, retry: RetryPolicy): HttpResponse = {
    var attempt = 1
    while (true) {
      try {
        val res = client(url)
        if (res.status < 200 || res.status >= 300) throw HttpStatusException(res.status, url)
        return res
      } catch {
        case e: Throwable =>
          if (attempt >= retry.maxAttempts) throw e
          retry.sleeper(retry.waitMs(attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The fetch loop: one payload per outer record; a record whose fetch
    * fails skippably is dropped (the reference `continue`s), any other
    * failure kills the job after retries. Returns (record, page=1, body). */
  def fetchPerRecord(
      records: Seq[Map[String, String]],
      urlTemplate: String,
      client: HttpClient,
      retry: RetryPolicy = RetryPolicy(),
      failureHandler: FailureHandler = NeverSkip): Seq[(Map[String, String], Int, String)] =
    records.flatMap { rec =>
      val url = formatUrl(urlTemplate, rec)
      try Seq((rec, 1, sendWithRetry(client, url, retry).body))
      catch {
        case e: Throwable if failureHandler.canSkipFailure(e) => Seq.empty
      }
    }

  /** Count the elements at a dotted path in a JSON body (the pagination
    * JSONPath `_embedded.reports[*]` expressed as `_embedded.reports`):
    * an array node counts its elements, a scalar counts 1, absent is 0. */
  private[graft] def countAtPath(body: String, path: String): Int = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val root = new ObjectMapper().readTree(body)
    val node = path.split('.').foldLeft(root)((n, p) => if (n == null) null else n.get(p))
    if (node == null || node.isNull || node.isMissingNode) 0
    else if (node.isArray) node.size()
    else 1
  }

  /** Mode-style paginated fetch: for each outer record, GET
    * `url?page=1,2,…`, stopping after the first page whose record count at
    * `paginationPath` falls below `maxRecordSize` (a full page implies a
    * next page; a short page is the last). Each page is one output row —
    * the downstream union-of-pages IS RestJoin.paginated. */
  def fetchPaginated(
      records: Seq[Map[String, String]],
      urlTemplate: String,
      paginationPath: String,
      maxRecordSize: Int = 30,
      client: HttpClient,
      retry: RetryPolicy = RetryPolicy(),
      failureHandler: FailureHandler = NeverSkip): Seq[(Map[String, String], Int, String)] =
    records.flatMap { rec =>
      val base = formatUrl(urlTemplate, rec)
      val pages = Iterator.from(1).map { page =>
        try {
          val body = sendWithRetry(client, s"$base?page=$page", retry).body
          Some((rec, page, body, countAtPath(body, paginationPath)))
        } catch {
          case e: Throwable if failureHandler.canSkipFailure(e) => None
        }
      }
      // takeWhile-inclusive: keep consuming while pages come back full;
      // a skipped (failed) page ends that record's loop like `continue`
      val out = scala.collection.mutable.ListBuffer.empty[(Map[String, String], Int, String)]
      var continue = true
      while (continue) {
        pages.next() match {
          case Some((r, p, body, n)) =>
            out += ((r, p, body))
            continue = n >= maxRecordSize
          case None => continue = false
        }
      }
      out.toList
    }

  /** Distributed fetch — the scale path the driver loop is not. The
    * reference fetches on one thread (or a 500-thread pool,
    * hive_table_last_updated_extractor.py:110-117) because its universes
    * are catalog-sized; a training-data pipeline refreshing millions of
    * URLs needs the fetch ON THE EXECUTORS: each partition initializes
    * its own client once (mapPartitions — the same codec-init discipline
    * as MultimodalOps), paces itself with a per-partition rate limit so
    * total QPS = partitions × perPartitionQps is an explicit knob, and
    * emits (url, status, body) rows with failures as data (status-coded
    * rows, never task retries for a 404).
    *
    * `clientFactory` must be serializable — pass a function object that
    * builds the client executor-side, NOT a captured client. Retries are
    * per-URL with the same backoff policy; a URL that exhausts retries
    * lands its final status (or -1 for transport errors) so the caller
    * filters/routes bad rows as a side channel instead of losing the
    * partition. */
  def fetchDistributed(
      urls: org.apache.spark.sql.Dataset[String],
      clientFactory: () => HttpClient,
      retry: RetryPolicy = RetryPolicy(),
      perPartitionQps: Double = 10.0): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val minIntervalNs = (1e9 / perPartitionQps).toLong
    urls.mapPartitions { it =>
      val client = clientFactory()
      var lastSend = 0L
      it.map { url =>
        // pace: busy-wait-free sleep to the next allowed send slot
        val now = System.nanoTime()
        val waitNs = lastSend + minIntervalNs - now
        if (waitNs > 0) Thread.sleep(waitNs / 1000000L, (waitNs % 1000000L).toInt)
        lastSend = System.nanoTime()
        try {
          val res = sendWithRetry(client, url, retry)
          (url, res.status, res.body)
        } catch {
          case HttpStatusException(status, _) => (url, status, null: String)
          case _: Throwable => (url, -1, null: String)
        }
      }
    }.toDF("url", "status", "payload")
  }

  /** Land fetched payloads as the `responses` DataFrame RestJoin.restApiJoin
    * consumes: one row per (outer keys, page, payload). */
  def responsesDF(
      spark: SparkSession,
      keyCols: Seq[String],
      fetched: Seq[(Map[String, String], Int, String)]): DataFrame = {
    val schema = StructType(
      keyCols.map(StructField(_, StringType)) :+
        StructField("page", IntegerType) :+ StructField("payload", StringType))
    val rows = fetched.map { case (rec, page, body) =>
      Row.fromSeq(keyCols.map(rec.getOrElse(_, null)) ++ Seq(page, body))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }
}
