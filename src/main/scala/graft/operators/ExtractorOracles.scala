package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Generic, RestFetch, Tables}
import graft.sources.RestFetch.{HttpClient, HttpPostClient, HttpResponse, RetryPolicy}

/** Oracle gates for the fetch-configured extractors (Mode / Redash /
  * Tableau / Atlas) and the catalog sources: each builds a DETERMINISTIC
  * fixture universe from the star schema, serves it through an in-process
  * `HttpClient` (the client type is just `String => HttpResponse`, so no
  * server is involved), and drives the REAL extractor chain — pagination
  * loops, JSON parsing, REST joins, transformer chains — end to end. The
  * DuckDB oracle recomputes the expected frame relationally from the same
  * tables, so the whole fetch→parse→transform path is hash-checked, the
  * same discipline as the Feast/BambooHR registry gates
  * ([[RegistryIngest]]).
  *
  * Driver-side state is fixture-sized only (a few hundred collected rows
  * per gate — the same catalog-scale bound as the production fetch loops
  * these configs drive).
  */
object ExtractorOracles {

  private val noSleep = RetryPolicy(sleeper = _ => ())

  /** Deterministic ISO-8601 stamp from an integer key, with a planted
    * unparseable value at key % 97 == 0 exercising the 0-on-failure
    * branch of TimestampStringToEpoch. The oracle recomputes the epoch
    * arithmetically (make_timestamp over the same key expressions). */
  private def isoTs(k: Long): String =
    if (k % 97 == 0) "bad-ts"
    else f"2023-${1 + k % 12}%02d-${1 + k % 28}%02dT${k % 24}%02d:${k % 60}%02d:${(k * 7) % 60}%02dZ"

  /** The matching DuckDB epoch expression over key column `k`. */
  private[graft] def isoEpochSql(k: String): String =
    s"CASE WHEN $k % 97 = 0 THEN 0 ELSE " +
      s"epoch(make_timestamp(2023, 1 + $k % 12, 1 + $k % 28, " +
      s"$k % 24, $k % 60, ($k * 7) % 60))::BIGINT END"

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c => c.toString
    } + "\""

  // ---------------------------------------------------------------- Mode

  /** Mode chain gate: regions become spaces, every 5th customer becomes a
    * report in its region's space (≈60 per space, so the 30-per-page
    * reports loop really paginates), and the full
    * seed → spaces → paginated reports → TimestampStringToEpoch →
    * TemplateVariableSubstitution → DictToModel chain runs against the
    * in-process client. */
  def modeDashboardMetadata(spark: SparkSession, dir: String): DataFrame = {
    val spaces = Tables(spark, dir, "region")
      .select(col("r_regionkey").cast("long"), col("r_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val reports = Tables(spark, dir, "customer")
      .filter(col("c_custkey") % 5 === 0)
      .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").cast("long"), col("c_name"), col("c_mktsegment"),
        col("n_regionkey").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    val reportsByRegion = reports.groupBy(_._4)
    def reportJson(c: (Long, String, String, Long)): String =
      s"""{"token":"rep${c._1}","name":${jstr(c._2)},"description":${jstr(c._3)},""" +
        s""""created_at":"${isoTs(c._1)}"}"""
    val client: HttpClient = url => {
      val spacesRe = "stub://mode/batch/graft/spaces\\?page=(\\d+)".r
      val reportsRe = "stub://mode/api/graft/spaces/sp(\\d+)/reports\\?page=(\\d+)".r
      url match {
        case spacesRe(p) =>
          val body = if (p.toInt == 1)
            spaces.map { case (k, name) =>
              s"""{"token":"sp$k","name":${jstr(name)},"description":${jstr(s"space $name")}}"""
            }.mkString("""{"spaces":[""", ",", "]}")
          else """{"spaces":[]}"""
          HttpResponse(200, body)
        case reportsRe(k, p) =>
          val page = reportsByRegion.getOrElse(k.toLong, Array.empty)
            .slice((p.toInt - 1) * 30, p.toInt * 30)
          HttpResponse(200,
            page.map(reportJson).mkString("{\"_embedded\":{\"reports\":[", ",", "]}}"))
        case other => HttpResponse(404, s"no fixture for $other")
      }
    }
    ModeDashboard.dashboardMetadata(spark, "graft", "stub://mode", client, noSleep)
      .toDF()
      .select(
        col("dashboardGroup").as("dashboard_group"),
        col("dashboardName").as("dashboard_name"),
        col("description"),
        col("cluster"), col("product"),
        col("dashboardGroupDescription").as("dashboard_group_description"),
        col("createdTimestamp").as("created_timestamp"),
        col("dashboardUrl").as("dashboard_url"),
        col("groupUrl").as("group_url"))
      .orderBy("dashboard_url")
  }

  // -------------------------------------------------------------- Redash

  /** Redash gate: nations become dashboards served through the
    * count-paginated list API (page_size 10 over 25 rows → three pages),
    * archived/draft rows planted to exercise the published filter. */
  def redashDashboards(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables(spark, dir, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val pageSize = 10
    def dashJson(k: Long, name: String): String =
      s"""{"id":$k,"name":${jstr(name)},"slug":${jstr(name.toLowerCase)},""" +
        s""""created_at":"${isoTs(k)}","updated_at":"${isoTs(k + 7)}",""" +
        s""""is_archived":${k % 5 == 0},"is_draft":${k % 7 == 0},""" +
        s""""user":{"email":"u$k@corp"}}"""
    val client: HttpClient = url => {
      val re = "stub://redash/api/dashboards\\?page=(\\d+)".r
      url match {
        case re(p) =>
          val page = nations.slice((p.toInt - 1) * pageSize, p.toInt * pageSize)
          HttpResponse(200,
            page.map { case (k, n) => dashJson(k, n) }.mkString(
              s"""{"count":${nations.length},"page":$p,"page_size":$pageSize,"results":[""",
              ",", "]}"))
        case other => HttpResponse(404, s"no fixture for $other")
      }
    }
    val pages = RedashDashboard.fetchCountPaginated(
      "stub://redash/api/dashboards", client, noSleep)
    RedashDashboard.dashboards(spark, pages, "https://redash.example")
      .orderBy("dashboard_id")
  }

  // ------------------------------------------------------------- Tableau

  /** Tableau gate: suppliers become workbooks served through the relay-
    * cursor GraphQL pages (40 per page over 100 rows → three pages),
    * with planted null project names (permission skip), slash/quote
    * names (sanitize), and a region-0 project exclusion list. */
  def tableauDashboards(spark: SparkSession, dir: String): DataFrame = {
    val wbs = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").cast("long"), col("s_name"),
        col("n_nationkey").cast("long"), col("n_name"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    val excluded = Tables(spark, dir, "nation")
      .filter(col("n_regionkey") === 0).select(col("n_name")).collect()
      .map(_.getString(0)).toSeq
    val pageSize = 40
    def nodeJson(w: (Long, String, Long, String)): String = {
      val (s, sname, nk, nname) = w
      val project = if (s % 11 == 0) "null" else jstr(nname)
      s"""{"id":"wb$s","name":${jstr(s"W/$sname's")},"createdAt":"${isoTs(s)}",""" +
        s""""description":${jstr(s"wb $sname")},"projectName":$project,""" +
        s""""projectVizportalUrlId":"p$nk","vizportalUrlId":"v$s"}"""
    }
    val post: HttpPostClient = (url, payload, headers) => {
      if (url != "stub://tableau/api/metadata/graphql" ||
          !headers.get("X-Tableau-Auth").contains("tok-graft"))
        HttpResponse(401, "bad endpoint or token")
      else {
        val after = "\"after\": \"c(\\d+)\"".r.findFirstMatchIn(payload)
          .map(_.group(1).toInt).getOrElse(0)
        val page = wbs.slice(after, after + pageSize)
        val hasNext = after + pageSize < wbs.length
        HttpResponse(200, page.map(nodeJson).mkString(
          """{"data":{"workbooksConnection":{"nodes":[""", ",",
          s"""],"pageInfo":{"hasNextPage":$hasNext,"endCursor":"c${after + pageSize}"}}}}"""))
      }
    }
    TableauDashboard.extract(spark, "stub://tableau/api/metadata/graphql",
        "tok-graft", "https://tableau.example", post,
        siteName = "graft", excludedProjects = excluded,
        pageSize = pageSize, retry = noSleep)
      .toDF()
      .select(
        col("dashboardGroup").as("dashboard_group"),
        col("dashboardName").as("dashboard_name"),
        col("description"),
        col("cluster"), col("product"),
        col("createdTimestamp").as("created_timestamp"),
        col("dashboardUrl").as("dashboard_url"),
        col("groupUrl").as("group_url"))
      .orderBy("dashboard_url")
  }

  // --------------------------------------------------------------- Atlas

  /** Atlas gate: nations become Table entities (columns = the nation's
    * suppliers, with planted inactive/null rows for every status filter
    * in the mapping table), served through the offset-paginated DSL
    * search (10 per page) and chunked bulk-details API (4 per chunk);
    * the declarative field-mapping table builds the documents. Array
    * outputs are joined to '|' strings for the hash compare. */
  def atlasTableDocs(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables(spark, dir, "nation")
      .join(broadcast(Tables(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"), col("r_name"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    val cols = Tables(spark, dir, "supplier")
      .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val colsByNation = cols.groupBy(_._2)
    def colJson(s: Long): String = {
      val status = if (s % 3 == 0) "INACTIVE" else "ACTIVE"
      val name = if (s % 13 == 0) "null" else jstr(s"col_$s")
      val desc = if (s % 4 == 0) "null" else jstr(s"dc $s")
      s"""{"status":"$status","attributes":{"name":$name,"description":$desc}}"""
    }
    def entityJson(n: (Long, String, Long, String)): String = {
      val (k, nname, rk, rname) = n
      val uniq = if (k % 6 == 0) "" else s""""uniqueUsage":${k * 2},"""
      val badges =
        if (k % 2 == 0) """{"typeName":"pii","entityStatus":"ACTIVE"}"""
        else """{"typeName":"pii","entityStatus":"DELETED"}"""
      s"""{"guid":"g$k","typeName":"Table","updateTime":${k * 1000000},""" +
        s""""attributes":{"qualifiedName":${jstr(s"db_${nname.toLowerCase}@cl$rk")},""" +
        s""""name":${jstr(nname)},"description":${jstr(s"nation $nname")},""" +
        s""""popularityScore":$k.5,$uniq""" +
        s""""parameters":{"note":${jstr(s"note $k")},"sourceDescription":${jstr(s"src $nname")}}},""" +
        s""""relationshipAttributes":{"db":{"displayText":${jstr(rname)}},""" +
        s""""columns":[${colsByNation.getOrElse(k, Array.empty).map(c => colJson(c._1)).mkString(",")}],""" +
        s""""meanings":[{"displayText":"tag${k}a","entityStatus":"ACTIVE"},""" +
        s"""{"displayText":"tag${k}x","entityStatus":"DELETED"}]},""" +
        s""""classifications":[$badges]}"""
    }
    val byGuid = nations.map(n => s"g${n._1}" -> entityJson(n)).toMap
    val client: HttpClient = url => {
      val searchRe = "stub://atlas/search/dsl\\?typeName=Table&offset=(\\d+)&limit=(\\d+)".r
      val bulkRe = "stub://atlas/entity/bulk\\?guids=(.*)".r
      url match {
        case searchRe(off, lim) =>
          val page = nations.slice(off.toInt, off.toInt + lim.toInt)
          HttpResponse(200,
            page.map(n => s"""{"guid":"g${n._1}"}""")
              .mkString("""{"entities":[""", ",", "]}"))
        case bulkRe(guids) =>
          HttpResponse(200, guids.split(',').map(byGuid)
            .mkString("""{"entities":[""", ",", "]}"))
        case other => HttpResponse(404, s"no fixture for $other")
      }
    }
    def joined(c: Column): Column = array_join(array_sort(c), "|")
    AtlasSearch.extractTableDocs(spark, "stub://atlas", client,
        searchChunkSize = 10, detailsChunkSize = 4, retry = noSleep)
      .select(col("database"), col("cluster"), col("schema"), col("name"),
        col("key"), col("description"), col("last_updated_timestamp"),
        col("total_usage"), col("unique_usage"),
        joined(col("column_names")).as("column_names"),
        joined(col("column_descriptions")).as("column_descriptions"),
        joined(col("tags")).as("tags"),
        joined(col("badges")).as("badges"),
        col("display_name"), col("schema_description"),
        joined(col("programmatic_descriptions")).as("programmatic_descriptions"))
      .orderBy("key")
  }

  // ------------------------------------------------------ catalog sources

  /** Spark-catalog metadata gate: one temp view per region (two typed
    * columns each) registered under a `gcat_` prefix, then the catalog
    * walk emits TableMetadata whose flattened column rows the oracle
    * recomputes from `region` × a constant column table. */
  def catalogTables(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val regions = Tables(spark, dir, "region")
      .select(col("r_regionkey").cast("long"), col("r_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    regions.foreach { case (k, name) =>
      Tables(spark, dir, "nation").filter(col("n_regionkey") === k)
        .select(col("n_nationkey").cast("long").as("nation_id"),
          col("n_name").as("nation_name"))
        .createOrReplaceTempView(s"gcat_${name.toLowerCase.replaceAll("[^a-z0-9]", "_")}")
    }
    val metas = Generic.catalogTables(spark, "spark", "local")
      .filter(_.name.startsWith("gcat_"))
    metas.flatMap(t => t.columns.map(c =>
        (t.schema, t.name, t.isView, c.name, c.colType, c.sortOrder.toLong)))
      .toDF("table_schema", "table_name", "is_view", "col_name", "col_type", "sort_order")
      .orderBy("table_name", "sort_order")
  }

  /** Catalog last-updated gate: two managed tables written from the
    * orders split, with the table detail injected from a data-derived
    * lastModified epoch — the DESCRIBE DETAIL seam of the DeltaLake
    * extractor, oracle-checked end to end. */
  def catalogLastUpdated(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the managed tables land in the SHARED spark-warehouse directory, so
    // their physical names are pid-scoped (concurrent graft JVMs — Verify
    // while Bench runs — must not delete/overwrite each other's store);
    // the logical table_key the oracle checks strips the pid back out
    val pid = java.lang.Long.toHexString(ProcessHandle.current().pid())
    // sweep warehouse dirs left by DEAD pids: the catalog is per-JVM
    // (in-memory), so a killed run leaves orphan gcatlu_* data dirs with
    // no table entry — without this they accumulate unboundedly
    locally {
      val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val orphan = "gcatlu_([0-9a-f]+)_(?:even|odd)".r
      if (fs.exists(wh)) fs.listStatus(wh).foreach { st =>
        st.getPath.getName match {
          case orphan(hex) if hex != pid &&
              !ProcessHandle.of(java.lang.Long.parseLong(hex, 16))
                .map[Boolean](_.isAlive).orElse(false) =>
            fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    }
    val splits = Seq("even" -> 0, "odd" -> 1)
    // unix_date × 86400 over an explicit to_date, never
    // java.sql.Date.toLocalDate — the latter converts through the JVM
    // default zone and can shift a day, and o_orderdate has shipped as
    // both DATE and TIMESTAMP_NTZ across testdata generations
    val epochs = Tables(spark, dir, "orders")
      .groupBy((col("o_orderkey") % 2).as("par"))
      .agg((unix_date(to_date(max(col("o_orderdate")))).cast("long") * 86400L).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    splits.foreach { case (nm, par) =>
      val t = s"gcatlu_${pid}_$nm"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      Tables(spark, dir, "orders").filter(col("o_orderkey") % 2 === par)
        .select("o_orderkey", "o_orderdate")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(t)
    }
    val detail: String => Map[String, String] = name =>
      splits.collectFirst { case (nm, par) if name.endsWith(s"gcatlu_${pid}_$nm") =>
        Map("lastModified" -> epochs(par.toLong).toString)
      }.getOrElse(Map.empty)
    Generic.catalogLastUpdated(spark, "spark", "local", detail = detail)
      .filter(_.tableKey.contains(s"gcatlu_${pid}_"))
      .toDF()
      .select(
        regexp_replace(col("tableKey"), s"gcatlu_${pid}_", "gcatlu_").as("table_key"),
        col("lastUpdatedEpoch").as("last_updated"))
      .orderBy("table_key")
  }

  /** EsLastUpdated gate: the single job-timestamp record, with the epoch
    * derived from the data (newest order date) instead of a wall clock so
    * the run stays replayable and the oracle exact. */
  def esLastUpdated(spark: SparkSession, dir: String): DataFrame = {
    val epoch = Tables(spark, dir, "orders")
      .agg((unix_date(to_date(max(col("o_orderdate")))).cast("long") * 86400L).as("e"))
      .collect().head.getLong(0)
    Generic.esLastUpdated(spark, epoch)
  }

  private case class RegionRec(region_id: Long, region_name: String)

  /** GenericExtractor gate: a literal record list (here read off the
    * region table, so the oracle is data-derived) becomes a local-
    * relation DataFrame through the fromRecords path. */
  def genericRecords(spark: SparkSession, dir: String): DataFrame = {
    val recs = Tables(spark, dir, "region")
      .select(col("r_regionkey").cast("long"), col("r_name")).collect()
      .map { case Row(k: Long, n: String) => RegionRec(k, n) }.toSeq
      .sortBy(_.region_id)
    Generic.fromRecords(spark, recs).orderBy("region_id")
  }

  // ------------------------------------------- driver fetch loop (REST)

  /** Driver fetch-loop gate — the [[RestFetch]] machinery itself under
    * the hash-compare oracle (rest_api_query.py:134-205's execute loop +
    * mode_paginated_rest_api_query.py:20-71's page detection). Regions
    * are the outer universe; each region's nations are served in pages
    * of three, so every region really paginates (full page → fetch the
    * next, short page → stop). Three failure paths run for real and are
    * CORRECTNESS-COUPLED, not merely logged: region 2's first page 503s
    * once and must succeed via the exponential-backoff retry (a broken
    * retry fails the whole query, not just a row); region 4 always 404s
    * and the SkipOnStatus handler must drop that outer record exactly
    * like the reference's `continue` (the oracle excludes region 4); and
    * URL templating resolves `{rk}` per record. The fetched payloads
    * land through responsesDF → restApiJoin — the same join path the
    * production extractor configs use — and the oracle recomputes
    * (region, page, nation) with a window over `nation`. */
  def restFetchPages(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables(spark, dir, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"), col("n_regionkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val byRegion = nations.groupBy(_._3)
    val attempts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val re = "stub://api/regions/(\\d+)/nations\\?page=(\\d+)".r
    val client: HttpClient = url => {
      attempts(url) += 1
      url match {
        case re(rk, _) if rk.toLong == 4L => HttpResponse(404, "no such region")
        case re(rk, p) if rk.toLong == 2L && p.toInt == 1 && attempts(url) == 1 =>
          HttpResponse(503, "transient")
        case re(rk, p) =>
          val page = byRegion.getOrElse(rk.toLong, Array.empty[(Long, String, Long)])
            .slice((p.toInt - 1) * 3, p.toInt * 3)
          HttpResponse(200, page.map { case (nk, nm, _) =>
            s"""{"nk":$nk,"name":${jstr(nm)}}"""
          }.mkString("""{"items":[""", ",", "]}"))
        case other => HttpResponse(404, s"no fixture for $other")
      }
    }
    val outerRecs = Tables(spark, dir, "region")
      .select(col("r_regionkey").cast("long")).collect().map(_.getLong(0)).sorted
      .map(k => Map("rk" -> k.toString)).toSeq
    val fetched = RestFetch.fetchPaginated(outerRecs, "stub://api/regions/{rk}/nations",
      paginationPath = "items", maxRecordSize = 3, client = client, retry = noSleep,
      failureHandler = RestFetch.SkipOnStatus(Set(404)))
    val responses = RestFetch.responsesDF(spark, Seq("rk"), fetched)
    // join key is (rk, page): each page row fans out into its items;
    // skipNoResult drops a trailing empty page (a region whose nation
    // count is an exact multiple of the page size fetches one page past)
    RestJoin.restApiJoin(
      outer = responses.select(col("rk"), col("page")),
      responses = responses,
      keyCols = Seq("rk", "page"),
      payloadCol = "payload",
      payloadSchema = "STRUCT<items: ARRAY<STRUCT<nk: BIGINT, name: STRING>>>",
      fields = Seq(RestJoin.JsonField("n_nationkey", "items.nk"),
        RestJoin.JsonField("n_name", "items.name")),
      skipNoResult = true)
      .select(col("rk").cast("long").as("r_regionkey"), col("page"),
        col("n_nationkey"), col("n_name"))
      .orderBy("n_nationkey")
  }

  /** Executor-distributed fetch gate — [[RestFetch.fetchDistributed]]
    * under the oracle: the URL universe is built FROM the nation table
    * (key and name embedded in the URL), the per-partition client is
    * constructed executor-side by a serializable factory (a local parser
    * closure, nothing captured from the driver), and the two failure
    * routes land as DATA: every nk % 7 == 0 URL is a permanent 404 whose
    * row carries (status=404, payload=null), and every nk % 5 == 3 URL
    * 503s on its first attempt so the per-URL retry must recover it on
    * the same client instance — a broken executor-side retry path would
    * surface as status 503 rows and fail the hash compare. */
  def restFetchDistributed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urls = Tables(spark, dir, "nation")
      .select(concat(lit("stub://fetch/nation/"), col("n_nationkey"),
        lit("/"), col("n_name")).as("url")).as[String]
    val factory: () => HttpClient = () => {
      val firstAttemptDone = scala.collection.mutable.Set.empty[String]
      val re = "stub://fetch/nation/([0-9]+)/(.*)".r
      url => url match {
        case re(nk, name) =>
          val k = nk.toLong
          if (k % 7 == 0) HttpResponse(404, "absent")
          else if (k % 5 == 3 && firstAttemptDone.add(url)) HttpResponse(503, "transient")
          else HttpResponse(200, s"""{"nk":$k,"name":"$name"}""")
        case _ => HttpResponse(404, "no fixture")
      }
    }
    RestFetch.fetchDistributed(urls, factory,
      retry = RetryPolicy(baseWaitMs = 1L, maxWaitMs = 1L), perPartitionQps = 1e6)
      .select(
        regexp_extract(col("url"), "nation/([0-9]+)/", 1).cast("long").as("n_nationkey"),
        col("status"),
        get_json_object(col("payload"), "$.name").as("fetched_name"))
      .orderBy("n_nationkey")
  }

  // -------------------------------------- pipeline orchestration (e2e)

  /** pid-scoped root for published pipeline stores, deleted on JVM exit
    * (same hygiene as SimilarityOps' staged IVF store). */
  private lazy val pipelinePubRoot: java.nio.file.Path =
    graft.sources.TmpStores.pidScopedRoot("graft-pipeline-pub")

  /** DefaultTask/DefaultJob orchestration gate — a full
    * [[graft.pipeline.Pipeline]] LAUNCH (task/task.py:49-77 +
    * job/job.py:53-88), not just its composed frame: source → chained
    * transforms (a None-drop filter, a template-substitution key build,
    * an iterator fan-out, a field removal — one of each reference
    * transformer shape) → parquet stage sink → atomic CURRENT-marker
    * publish ([[Stage.atomicRepoint]]) → Callback + statsd hooks. The
    * returned frame is read back FROM THE PUBLISHED STORE via the
    * CURRENT marker, so staging, publishing, and the commit protocol all
    * sit inside the hash compare; the callback/metrics contract is
    * asserted in-line (exactly one success counter, onSuccess fired). */
  def pipelineE2E(spark: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Pipeline
    import graft.sources.Stage
    val base = pipelinePubRoot.resolve(
      "pub-" + Integer.toHexString(dir.hashCode)).toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
    val gen = s"gen-${System.nanoTime()}"
    var published = false
    var succeeded = false
    val counters = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val pipe = Pipeline(
      name = "pub-customers",
      source = s => Tables(s, dir, "customer")
        .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey").cast("long"), col("c_name"), col("n_name"), col("c_acctbal")),
      transforms = Seq(
        // None-drop: a transformer returning None filters the record out
        df => df.filter(col("c_acctbal") >= 0),
        // TemplateVariableSubstitution: key built from record fields
        df => df.withColumn("key",
          concat(lit("tpch://"), col("n_name"), lit("/"), col("c_name"))),
        // iterator fan-out: one record -> one row per role
        df => df.withColumn("role", explode(array(lit("owner"), lit("reader")))),
        // RemoveFieldTransformer
        df => df.drop("c_name", "n_name")),
      sink = df => df.write.mode("overwrite").parquet(s"$base/$gen"),
      publish = () => {
        Stage.atomicRepoint(base, gen)
        // prune superseded generations after the repoint — repeated
        // invocations must not accumulate a full store copy each
        val walk = java.nio.file.Files.list(java.nio.file.Paths.get(base))
        try walk.forEach { p =>
          val name = p.getFileName.toString
          if (name.startsWith("gen-") && name != gen)
            graft.sources.TmpStores.deleteRecursively(p)
        } finally walk.close()
        published = true
      },
      onSuccess = () => { succeeded = true },
      metrics = (k, v) => counters(k) += v)
    pipe.launch(spark)
    require(published && succeeded && counters("job.pub-customers.success") == 1L
      && counters("job.pub-customers.fail") == 0L,
      "pipeline publish/callback/metrics contract violated")
    val target = Stage.currentTarget(base).getOrElse(
      sys.error("no CURRENT marker after publish"))
    spark.read.parquet(s"$base/$target")
      .select(col("c_custkey"), col("key"), col("role"), col("c_acctbal"))
      .orderBy("c_custkey", "role")
  }
}
