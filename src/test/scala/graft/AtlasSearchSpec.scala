package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AtlasSearch
import graft.sources.RestFetch.{RetryPolicy, defaultClient}
import java.net.InetSocketAddress

/** Atlas extractor analog over fixture payloads: offset-paginated GUID
  * search, chunked bulk-details fetch, and the declarative field-mapping
  * table producing TableESDocument rows — the shape of
  * atlas_search_data_extractor.py:56-317 end to end against a local stub.
  */
class AtlasSearchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val noSleep = RetryPolicy(sleeper = _ => ())

  private def entity(guid: String, qn: String, withExtras: Boolean): String = {
    val extras = if (withExtras)
      """"popularityScore": 42.9, "uniqueUsage": 7,
         "parameters": {"sourceDescription": "src desc", "note": "extra"}"""
    else """"parameters": null"""
    s"""{
      "guid": "$guid", "typeName": "hive_table", "updateTime": 1612560000123,
      "attributes": {"qualifiedName": "$qn", "name": "${qn.split('.')(1).split('@')(0)}",
        "description": "d of $guid", $extras},
      "relationshipAttributes": {
        "db": {"displayText": "${qn.split('.')(0)}"},
        "columns": [
          {"status": "ACTIVE", "attributes": {"name": "c1", "description": "c1 desc"}},
          {"status": "DELETED", "attributes": {"name": "gone", "description": "x"}},
          {"status": "ACTIVE", "attributes": {"name": "c2", "description": null}}],
        "meanings": [
          {"displayText": "pii", "entityStatus": "ACTIVE"},
          {"displayText": "old", "entityStatus": "DELETED"}]},
      "classifications": [
        {"typeName": "gold", "entityStatus": "ACTIVE"},
        {"typeName": "stale", "entityStatus": "DELETED"}]
    }"""
  }

  private def withAtlasStub(nEntities: Int)(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: HttpExchange, payload: String): Unit = {
      val bytes = payload.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    val searches = scala.collection.mutable.ListBuffer.empty[String]
    server.createContext("/search/dsl", (ex: HttpExchange) => {
      val q = ex.getRequestURI.getQuery
      searches += q
      val params = q.split('&').map(_.split('=')).map(a => a(0) -> a(1)).toMap
      val (off, lim) = (params("offset").toInt, params("limit").toInt)
      val guids = (off until math.min(off + lim, nEntities))
        .map(i => s"""{"guid":"g$i"}""")
      respond(ex, s"""{"entities":[${guids.mkString(",")}]}""")
    })
    server.createContext("/entity/bulk", (ex: HttpExchange) => {
      val guids = ex.getRequestURI.getQuery.stripPrefix("guids=").split(',')
      val ents = guids.map(g =>
        entity(g, s"schema1.tbl_$g@cl1", withExtras = g == "g0"))
      respond(ex, s"""{"entities":[${ents.mkString(",")}]}""")
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("offset pagination + chunked details + mapping table end to end") {
    withAtlasStub(nEntities = 5) { base =>
      // search chunk 2 → offsets 0,2,4 (last short page stops the loop);
      // details chunk 2 → 3 bulk pages
      val docs = AtlasSearch.extractTableDocs(spark, base, defaultClient(),
        searchChunkSize = 2, detailsChunkSize = 2, retry = noSleep)
        .orderBy("key").collect()
      assert(docs.length == 5)
      val d0 = docs.find(_.getAs[String]("key") == "schema1.tbl_g0@cl1").get
      // mapping tuples (reference FIELDS_MAPPING_SPEC):
      assert(d0.getAs[String]("database") == "hive_table")
      assert(d0.getAs[String]("cluster") == "cl1")            // qualifiedName after @
      assert(d0.getAs[String]("schema") == "schema1")          // db.displayText
      assert(d0.getAs[String]("name") == "tbl_g0")
      assert(d0.getAs[String]("description") == "d of g0")
      assert(d0.getAs[Long]("last_updated_timestamp") == 1612560000L) // ms -> s
      assert(d0.getAs[Long]("total_usage") == 42L)             // int(popularityScore)
      assert(d0.getAs[Long]("unique_usage") == 7L)
      assert(d0.getAs[String]("display_name") == "schema1.tbl_g0") // before @
      // status filters: ACTIVE survives, DELETED drops, null desc drops
      assert(d0.getSeq[String](d0.fieldIndex("column_names")) == Seq("c1", "c2"))
      assert(d0.getSeq[String](d0.fieldIndex("column_descriptions")) == Seq("c1 desc"))
      assert(d0.getSeq[String](d0.fieldIndex("tags")) == Seq("pii"))
      assert(d0.getSeq[String](d0.fieldIndex("badges")) == Seq("gold"))
      assert(d0.getAs[String]("schema_description") == "src desc")
      assert(d0.getSeq[String](d0.fieldIndex("programmatic_descriptions")).toSet ==
        Set("src desc", "extra"))
      // defaults where the payload lacks the fields (g1 has no extras)
      val d1 = docs.find(_.getAs[String]("key") == "schema1.tbl_g1@cl1").get
      assert(d1.getAs[Long]("total_usage") == 0L)              // default 0
      assert(d1.getAs[Long]("unique_usage") == 1L)             // default 1
      assert(d1.getAs[String]("schema_description") == null)
      assert(d1.getSeq[String](d1.fieldIndex("programmatic_descriptions")).isEmpty)
    }
  }

  test("guid parsing tolerates empty and malformed-ish pages") {
    assert(AtlasSearch.guidsOf("""{"entities":[]}""").isEmpty)
    assert(AtlasSearch.guidsOf("""{}""").isEmpty)
    assert(AtlasSearch.guidsOf("""{"entities":[{"guid":"a"},{"noguid":1}]}""") == Seq("a"))
  }
}
