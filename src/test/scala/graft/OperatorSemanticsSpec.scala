package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.model.Rds.tableMetadataRows
import graft.operators._

/** Golden semantics tests for the round-2 operator families: REST-join
  * zip/OR/no-result behavior, dialect metastore fold (Postgres shape),
  * RDS record fan-out + FK-ordered staging, publisher fidelity options,
  * and validation invariants — mirroring the reference's unit-test
  * pattern (hand fixtures in, exact rows out).
  */
class OperatorSemanticsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import scala.jdk.CollectionConverters._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  // ---- RestJoin ----

  private def restFixture: (DataFrame, DataFrame) = {
    val outer = spark.createDataFrame(
      Seq((1, "space-a"), (2, "space-b"), (3, "space-empty")))
      .toDF("space_id", "space_name")
    val responses = spark.createDataFrame(Seq(
      (1, """{"reports": [{"token": "t1", "label": "r1"}, {"token": "t2", "label": "r2"}]}"""),
      (2, """{"reports": [{"token": "t3", "nested": {"deep": "d3"}}]}""")))
      .toDF("space_id", "payload")
    (outer, responses)
  }
  private val schema =
    "STRUCT<reports: ARRAY<STRUCT<token: STRING, label: STRING, nested: STRUCT<deep: STRING>>>>"

  test("restApiJoin zips AND fields positionally and fans out 1:N") {
    val (outer, responses) = restFixture
    val out = RestJoin.restApiJoin(outer, responses, Seq("space_id"), "payload", schema,
      Seq(RestJoin.JsonField("token", "reports.token"),
        RestJoin.JsonField("label", "reports.label")),
      skipNoResult = true).orderBy("space_id", "token")
    assert(rows(out) == Seq(
      Seq(1, "space-a", "t1", "r1"),
      Seq(1, "space-a", "t2", "r2"),
      Seq(2, "space-b", "t3", null)))
  }

  test("restApiJoin OR path falls through to the alternative that matches") {
    val (outer, responses) = restFixture
    val out = RestJoin.restApiJoin(outer.filter(col("space_id") === 2), responses,
      Seq("space_id"), "payload", schema,
      Seq(RestJoin.JsonField("value", Seq("reports.label", "reports.nested.deep"))),
      skipNoResult = true)
    assert(rows(out) == Seq(Seq(2, "space-b", "d3")))
  }

  test("restApiJoin default keeps no-result outer records, skipNoResult drops them") {
    val (outer, responses) = restFixture
    val fields = Seq(RestJoin.JsonField("token", "reports.token"))
    val kept = RestJoin.restApiJoin(outer, responses, Seq("space_id"), "payload", schema,
      fields, skipNoResult = false)
    assert(kept.filter(col("space_id") === 3).count() == 1)
    val dropped = RestJoin.restApiJoin(outer, responses, Seq("space_id"), "payload", schema,
      fields, skipNoResult = true)
    assert(dropped.filter(col("space_id") === 3).count() == 0)
  }

  // ---- Metastore fold, Postgres shape (no partition branch) ----

  test("foldTableMetadata without partition branch matches base_postgres fold") {
    val f = Metastore.Frames(
      tbls = spark.createDataFrame(Seq((10L, 1L, "users", "MANAGED_TABLE")))
        .toDF("tbl_id", "db_id", "name", "tbl_type"),
      dbs = spark.createDataFrame(Seq((1L, "public"))).toDF("db_id", "schema_name"),
      cols = spark.createDataFrame(
        Seq((10L, "id", "bigint", 1L), (10L, "email", "varchar", 2L)))
        .toDF("tbl_id", "col_name", "col_type", "col_sort_order"),
      partitionKeys = None,
      tableParams = None)
    val out = Metastore.foldTableMetadata(f, "postgres", "gold")
    assert(rows(out) == Seq(Seq(
      "postgres://gold.public/users", "public", "users", "", false, 2L,
      "id:bigint:,email:varchar:")))
  }

  test("hive fold puts partition columns first with the partition badge") {
    val f = Metastore.Frames(
      tbls = spark.createDataFrame(Seq((10L, 1L, "sales", "MANAGED_TABLE")))
        .toDF("tbl_id", "db_id", "name", "tbl_type"),
      dbs = spark.createDataFrame(Seq((1L, "default"))).toDF("db_id", "schema_name"),
      cols = spark.createDataFrame(Seq((10L, "amount", "double", 1L)))
        .toDF("tbl_id", "col_name", "col_type", "col_sort_order"),
      partitionKeys = Some(spark.createDataFrame(Seq((10L, "ds", "string", 99L)))
        .toDF("tbl_id", "col_name", "col_type", "col_sort_order")),
      tableParams = Some(spark.createDataFrame(Seq((10L, "comment", "daily sales")))
        .toDF("tbl_id", "param_key", "param_value")))
    val out = Metastore.foldTableMetadata(f, "hive", "gold")
    assert(rows(out) == Seq(Seq(
      "hive://gold.default/sales", "default", "sales", "daily sales", false, 2L,
      s"ds:string:${Metastore.PartitionBadge},amount:double:")))
  }

  // ---- RDS universe ----

  private val sampleTable = TableMetadata(
    database = "hive", cluster = "gold", schema = "public", name = "users",
    description = Some("user table"),
    columns = Seq(
      ColumnMetadata("id", Some("pk"), "bigint", 1),
      ColumnMetadata("email", None, "varchar", 2)),
    tags = Seq("pii"))

  test("RowSerializable fan-out emits the full FK chain") {
    val recs = Rds.tableMetadataRows.records(sampleTable)
    val byTable = recs.groupBy(_.table).view.mapValues(_.size).toMap
    assert(byTable == Map(
      "database" -> 1, "cluster" -> 1, "schema" -> 1, "table" -> 1,
      "table_description" -> 1, "tag" -> 1, "table_tag" -> 1,
      "column" -> 2, "column_description" -> 1))
    val table = recs.find(_.table == "table").get
    assert(table.rk == "hive://gold.public/users")
    assert(table.attributes("schema_rk") == "hive://gold.public")
  }

  test("stage writes per-RDS-table parquet in FK order with intact parents") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(sampleTable, sampleTable.copy(name = "orders")))
    val out = java.nio.file.Files.createTempDirectory(graft.sources.TmpStores.pidScopedRoot("graft-testtmp"), "rds_stage").toString
    RdsBuild.stage(RdsBuild.records(ds), out)
    val tables = spark.read.parquet(s"$out/table")
    val schemas = spark.read.parquet(s"$out/schema")
    assert(tables.count() == 2 && schemas.count() == 1)
    // FK integrity: every table's schema_rk exists in the schema stage
    assert(tables.join(schemas.select(col("rk").as("schema_rk")), Seq("schema_rk"),
      "left_anti").count() == 0)
    // dedup: the shared database/cluster/schema chain collapsed
    assert(spark.read.parquet(s"$out/database").count() == 1)
  }

  test("bloom pre-filter admits every corpus key and prunes nearly all novel keys") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val fp = docs.select(md5(col("text")).as("fp"))
    val bloom = fp.stat.bloomFilter("fp", fp.count(), 0.01)
    // no false negatives: every corpus fingerprint must hit
    val corpus = fp.collect().map(_.getString(0))
    assert(corpus.forall(bloom.mightContainString))
    // novel fingerprints miss at ~the configured fpp — the pre-filter
    // actually removes the novel majority before any join
    val novel = docs.select(md5(reverse(col("text"))).as("fp"))
      .collect().map(_.getString(0)).filterNot(corpus.toSet)
    val hits = novel.count(bloom.mightContainString)
    assert(novel.nonEmpty && hits.toDouble / novel.length < 0.05,
      s"$hits/${novel.length} novel keys passed the bloom")
  }

  test("snapshotDiff classifies NULL vs '' vs value with IS DISTINCT FROM semantics") {
    import spark.implicits._
    val before = Seq(
      ("k1", null.asInstanceOf[String]), // NULL -> ''      : changed
      ("k2", ""),                        // ''   -> NULL    : changed
      ("k3", null.asInstanceOf[String]), // NULL -> value   : changed
      ("k4", null.asInstanceOf[String]), // NULL -> NULL    : unchanged
      ("k5", "v")                        // value -> value  : unchanged
    ).toDF("key", "attr")
    val after = Seq(
      ("k1", ""), ("k2", null.asInstanceOf[String]), ("k3", "v"),
      ("k4", null.asInstanceOf[String]), ("k5", "v")).toDF("key", "attr")
    val got = Publish.snapshotDiff(before, after, "key", Seq("attr"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("k1" -> "changed", "k2" -> "changed", "k3" -> "changed",
      "k4" -> "unchanged", "k5" -> "unchanged"))
  }

  test("publishOrder is a topological order of the _rk-derived FK DAG") {
    val pos = graft.model.Rds.publishOrder.zipWithIndex.toMap
    // every RDS table is in the sequence exactly once
    assert(pos.keySet == graft.model.Rds.tableAttrs.keySet)
    assert(graft.model.Rds.publishOrder.size == pos.size)
    // and every FK parent is applied before its children
    for ((child, parents) <- RdsBuild.fkDeps; parent <- parents)
      assert(pos(parent) < pos(child),
        s"$parent must stage before $child (FK ${parent}_rk)")
  }

  // ---- Publisher fidelity ----

  test("lastWriteWins keeps the latest record per key") {
    val batch = spark.createDataFrame(Seq(
      (1, "old", 100L), (1, "new", 200L), (2, "only", 50L)))
      .toDF("key", "value", "seq")
    val out = Publish.lastWriteWins(batch, "key", Seq(col("seq"))).orderBy("key")
    assert(rows(out.select("key", "value")) == Seq(Seq(1, "new"), Seq(2, "only")))
  }

  test("assertStaleGuardrail raises when a label exceeds the threshold") {
    val nodes = spark.createDataFrame(Seq(
      ("A", true), ("A", true), ("A", false), ("B", false), ("B", true)))
      .toDF("label", "stale")
    intercept[Publish.StaleGuardrailException] {
      Publish.assertStaleGuardrail(nodes, col("stale"), "label", 0.5)
    }
    // below threshold: no throw
    Publish.assertStaleGuardrail(nodes, col("stale"), "label", 0.7)
  }

  test("rdsStaleSweep honors per-table threshold overrides and aborts whole") {
    val recs = spark.createDataFrame(Seq(
      ("t1", "a", "cur"), ("t1", "b", "old"),          // t1: 50% stale
      ("t2", "c", "cur"), ("t2", "d", "cur"), ("t2", "e", "old"))) // t2: 33%
      .toDF("table", "rk", "published_tag")
    val stale = Publish.rdsStaleCondition("cur", 0L, None)
    // default threshold passes both tables; survivors are the fresh rows
    val kept = Publish.rdsStaleSweep(recs, stale, "table", 0.9)
    assert(rows(kept.select("rk").orderBy("rk")).flatten == Seq("a", "c", "d"))
    // a per-table override at t2's exact ratio aborts the WHOLE sweep,
    // even though t1 is under the default — nothing is deleted
    intercept[Publish.StaleGuardrailException] {
      Publish.rdsStaleSweep(recs, stale, "table", 0.9, Map("t2" -> 1.0 / 3))
    }
  }

  test("rds/neptune stale conditions select the reference's expiry modes") {
    val recs = spark.createDataFrame(Seq(
      ("a", "cur", 100L, "job"), ("b", "old", 900L, "job"),
      ("c", "cur", 900L, "user"), ("d", "old", 100L, "user")))
      .toDF("rk", "published_tag", "publisher_last_updated_epoch_ms", "creation_type")
    // tag mode ignores the epoch entirely
    val byTag = recs.filter(Publish.rdsStaleCondition("cur", 99999L, None))
    assert(rows(byTag.select("rk").orderBy("rk")).flatten == Seq("b", "d"))
    // epoch mode ignores the tag entirely: now=1000, expire after 500ms
    val byEpoch = recs.filter(Publish.rdsStaleCondition("cur", 1000L, Some(500L)))
    assert(rows(byEpoch.select("rk").orderBy("rk")).flatten == Seq("a", "d"))
    // neptune: job-created AND older than cutoff — user rows never sweep
    val nep = recs.withColumnRenamed(
      "publisher_last_updated_epoch_ms", "last_extracted_epoch_ms")
      .filter(Publish.neptuneStaleCondition(500L))
    assert(rows(nep.select("rk")).flatten == Seq("a"))
  }

  // ---- columnar fan-out ≡ typeclass fan-out ----

  test("dashboard columnar query/chart fan-out matches the typeclass") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val qser = graft.model.Dashboard.querySerializer
    val cser = graft.model.Dashboard.chartSerializer
    val qds = DashboardBuild.queries(spark, dir)
    val cds = DashboardBuild.charts(spark, dir)
    val tcNodes = (qds.flatMap(q => qser.nodes(q)).collect() ++
      cds.flatMap(c => cser.nodes(c)).collect()).toSet
    val colNodes = DashboardBuild.columnarQueryChartNodes(spark, dir)
      .dropDuplicates("label", "key").as[GraphNode].collect().toSet
    assert(colNodes == tcNodes)
    val tcEdges = (qds.flatMap(q => qser.relationships(q)).collect() ++
      cds.flatMap(c => cser.relationships(c)).collect()).toSet
    val colEdges = DashboardBuild.columnarQueryChartEdges(spark, dir)
      .dropDuplicates("startKey", "endKey", "relType").as[GraphRelationship]
      .collect().toSet
    assert(colEdges == tcEdges)
  }

  test("dashboard/execution columnar fan-out matches the typeclass") {
    val dir = "/root/testdata/sf0.001"
    import spark.implicits._
    import graft.model.Dashboard.{metadataSerializer, executionSerializer}
    val tcNodes = (DashboardBuild.nodesOf(DashboardBuild.dashboards(spark, dir)).collect() ++
      DashboardBuild.nodesOf(DashboardBuild.executions(spark, dir)).collect()).toSet
    val colNodes = DashboardBuild.columnarDashboardNodes(spark, dir)
      .union(DashboardBuild.columnarExecutionNodes(spark, dir))
      .as[GraphNode].collect().toSet
    assert(colNodes == tcNodes)
    val tcEdges = (DashboardBuild.edgesOf(DashboardBuild.dashboards(spark, dir)).collect() ++
      DashboardBuild.edgesOf(DashboardBuild.executions(spark, dir)).collect()).toSet
    val colEdges = DashboardBuild.columnarDashboardEdges(spark, dir)
      .union(DashboardBuild.columnarExecutionEdges(spark, dir))
      .as[GraphRelationship].collect().toSet
    assert(colEdges == tcEdges)
  }

  test("staged-facts dashboard build equals the inline-plan build") {
    val dir = "/root/testdata/sf0.001"
    val staged = java.nio.file.Files.createTempDirectory(graft.sources.TmpStores.pidScopedRoot("graft-testtmp"), "dash-facts").toString
    DashboardBuild.stageFacts(spark, dir, staged)
    val inlineNodes = DashboardBuild.nodes(spark, dir).collect().toSet
    val stagedNodes = DashboardBuild.nodesStaged(spark, dir, staged).collect().toSet
    assert(stagedNodes == inlineNodes)
    val inlineEdges = DashboardBuild.edges(spark, dir).collect().toSet
    val stagedEdges = DashboardBuild.edgesStaged(spark, dir, staged).collect().toSet
    assert(stagedEdges == inlineEdges)
  }

  test("columnar lineage fan-out matches the TableLineage typeclass") {
    import spark.implicits._
    val ser = TableLineage.serializer
    val out = GraphBuild.lineageEdges(spark, "/root/testdata/sf0.001")
    val fromTypeclass = out.select(col("source_key").as("sourceTableKey"),
        col("target_key").as("targetTableKey")).as[TableLineage]
      .flatMap(l => ser.relationships(l).filter(Graph.relationshipValid))
      .select(col("startKey"), col("endKey"), col("relType"), col("reverseType"))
    assert(rows(out) == rows(fromTypeclass.orderBy("startKey", "endKey")))
  }

  test("columnar graph fan-out matches the GraphSerializable typeclass exactly") {
    import spark.implicits._
    val md = GraphBuild.tableMetadata(spark, "/root/testdata/sf0.001")
    val nodesTc = GraphBuild.nodes(md).collect().toSet
    val nodesCol = GraphBuild.columnarNodes(md.toDF())
      .dropDuplicates("label", "key").as[GraphNode].collect().toSet
    assert(nodesCol == nodesTc)
    val edgesTc = GraphBuild.edges(md).collect().toSet
    val edgesCol = GraphBuild.columnarEdges(md.toDF())
      .dropDuplicates("startKey", "endKey", "relType").as[GraphRelationship]
      .collect().toSet
    assert(edgesCol == edgesTc)
  }

  // ---- graph → staged parquet → search docs, end to end ----

  test("table search docs over the staged (written+reread) graph match the direct path") {
    val dir = "/root/testdata/sf0.001"
    val (nodes, edges) = GraphBuild.searchGraph(spark, dir)
    val out = java.nio.file.Files.createTempDirectory(graft.sources.TmpStores.pidScopedRoot("graft-testtmp"), "staged_graph").toString
    graft.sources.Stage.stageNodes(nodes, out)
    graft.sources.Stage.stageEdges(edges, out)
    val fromStage = SearchDocs.tableDocsFromGraph(
      graft.sources.Stage.readNodes(spark, out),
      graft.sources.Stage.readEdges(spark, out))
    val direct = SearchDocs.tableDocs(spark, dir)
    assert(fromStage.collect().toSeq == direct.collect().toSeq)
  }

  test("publish cycles compose: merge, re-publish, then staleness sweep") {
    import spark.implicits._
    // cycle 1: empty graph + batch1 (a, b) published with tag_1
    val empty = Seq.empty[(Long, String)].toDF("key", "name")
    val batch1 = Seq((1L, "a"), (2L, "b")).toDF("key", "name")
    val state1 = Publish.mergeUpsert(empty, batch1, "key", Seq("name"), "tag_1", 1000L)
    // cycle 2: batch2 re-publishes key 1 (renamed) but not key 2
    val batch2 = Seq((1L, "a2"), (3L, "c")).toDF("key", "name")
    val state2 = Publish.mergeUpsert(
      state1.select("key", "name"), batch2, "key", Seq("name"), "tag_2", 2000L)
    // rows untouched in cycle 2 carry no tag_2 stamp → stale; sweep them
    // (threshold above the 1/3 stale ratio so the guardrail lets it run)
    val graph = state2.withColumn("label", lit("Table"))
    val stale = col("published_tag") =!= "tag_2"
    Publish.assertStaleGuardrail(graph, stale, "label", 0.9)
    val survivors = Publish.staleSweep(graph, stale, "label", 0.9)
      .orderBy("key")
    assert(rows(survivors.select("key", "name")) ==
      Seq(Seq(1L, "a2"), Seq(3L, "c")), "cycle-2 graph should keep only re-published rows")
    // the hard guardrail fires when the stale fraction reaches the limit
    intercept[Publish.StaleGuardrailException] {
      Publish.assertStaleGuardrail(graph, stale, "label", 0.3)
    }
  }

  test("create-only upsert leaves matched rows untouched, including nulls") {
    import spark.implicits._
    val existing = Seq((1L, Option.empty[String]), (3L, Some("keep")))
      .toDF("key", "name")
    val incoming = Seq((1L, "backfill"), (2L, "new")).toDF("key", "name")
    val out = Publish.mergeUpsert(existing, incoming, "key", Seq("name"),
        "tag", 42L, createOnly = true)
      .orderBy("key").collect()
    assert(out(0).isNullAt(1), "matched row's null attribute was back-filled")
    assert(out(1).getString(1) == "new" && out(1).getString(2) == "tag")
    assert(out(2).getString(1) == "keep" && out(2).getString(2) == "")
  }

  test("validateEndpoints splits publishable vs dangling edges") {
    import spark.implicits._
    val nodes = Seq("a", "b", "c").toDF("key")
    val edges = Seq(("a", "b"), ("a", "x"), ("y", "b")).toDF("startKey", "endKey")
    val (valid, dangling) = Publish.validateEndpoints(edges, nodes)
    // both frames preserve the input column ORDER (startKey, endKey)
    assert(valid.columns.toSeq == Seq("startKey", "endKey"))
    assert(rows(valid) == Seq(Seq("a", "b")))
    assert(rows(dangling.orderBy("startKey")).toSet ==
      Set(Seq("a", "x"), Seq("y", "b")))
  }

  test("connected components propagate the min label transitively") {
    import spark.implicits._
    // chain 5-3, 3-9 plus isolated pair 20-21: components {3,5,9} and {20,21}
    val pairs = Seq((5L, 3L), (3L, 9L), (20L, 21L)).toDF("doc_a", "doc_b")
    val cc = DedupOps.connectedComponents(pairs).orderBy("doc_id")
    assert(rows(cc) == Seq(Seq(3L, 3L), Seq(5L, 3L), Seq(9L, 3L),
      Seq(20L, 20L), Seq(21L, 20L)))
  }

  test("candidate join drops buckets over the hot-bucket cap") {
    import spark.implicits._
    // bucket 0 is hot (4 members -> 6 pairs); bucket 1 holds a twin pair
    val corpus = Seq(
        (1L, Seq(1.0, 0.0)), (2L, Seq(2.0, 0.0)), (3L, Seq(3.0, 0.0)),
        (4L, Seq(4.0, 0.0)), (10L, Seq(0.0, 1.0)), (11L, Seq(0.0, 2.0)))
      .toDF("vec_id", "v")
    val keyed = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 0), (10L, 1), (11L, 1))
      .toDF("vec_id", "bucket")
    val uncapped = SimilarityOps.verifiedCosinePairs(corpus, keyed, Seq("bucket"))
    assert(uncapped.count() == 6 + 1) // all colinear pairs pass cos >= 0.99
    val capped = SimilarityOps.verifiedCosinePairs(corpus, keyed, Seq("bucket"),
      maxBucket = Some(3L))
    assert(rows(capped.select("id_a", "id_b")) == Seq(Seq(10L, 11L)),
      "hot bucket should be dropped whole, small bucket kept")
  }

  test("media codec encodes and decodes real PNG/JPEG bytes round trip") {
    import graft.operators.MultimodalOps.MediaCodec
    for (id <- Seq(0L, 1L, 7L, 48L, 123L)) {
      val bytes = MediaCodec.encode(id)
      // real container magic, not carried metadata: PNG \x89PNG / JPEG \xFFD8
      if (id % 2 == 0)
        assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P', s"asset $id not PNG")
      else
        assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
          s"asset $id not JPEG")
      val m = MediaCodec.decode(id, bytes)
      assert(m.width == MediaCodec.widthOf(id) && m.height == MediaCodec.heightOf(id))
      assert(m.format == MediaCodec.formatOf(id))
      val expected = MediaCodec.grayOf(id)
      if (id % 2 == 0) assert(m.pxGray == expected, s"png pixel drifted: $m")
      else assert(math.abs(m.pxGray - expected) <= 8, s"jpeg pixel drifted: $m")
    }
  }

  test("audio codec encodes and decodes real RIFF/WAVE PCM16 round trip") {
    import graft.operators.MultimodalOps.AudioCodec
    for (id <- Seq(0L, 1L, 7L, 63L, 128L, 500L)) {
      val bytes = AudioCodec.encode(id)
      // real RIFF container magic + canonical 44-byte header framing
      assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
      assert(new String(bytes, 8, 4, "US-ASCII") == "WAVE")
      assert(bytes.length == 44 + AudioCodec.nSamplesOf(id) * 2)
      val m = AudioCodec.decode(id, bytes)
      assert(m.sampleRate == AudioCodec.Rate && m.nSamples == AudioCodec.nSamplesOf(id))
      assert(m.durationUs == m.nSamples.toLong * 1000000L / AudioCodec.Rate)
      val gen = (0 until m.nSamples).map(i => AudioCodec.sampleOf(id, i))
      assert(m.peak == gen.map(math.abs).max)
      assert(m.energy == gen.map(s => s.toLong * s).sum)
      assert(AudioCodec.decodeSamples(id, bytes).toSeq == gen)
    }
  }

  test("audio chunk walk skips unknown RIFF chunks before data") {
    import graft.operators.MultimodalOps.AudioCodec
    val id = 42L
    val canonical = AudioCodec.encode(id)
    // splice an odd-length LIST chunk between fmt and data (word-aligned
    // per the RIFF spec: 7 payload bytes + 1 pad); a strict 44-byte-header
    // reader would misparse, a real chunk walker must not
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](7, 0, 0, 0) ++ "INFOxyz".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = canonical.slice(0, 36) ++ junk ++ canonical.drop(36)
    // patch the RIFF size field for the inserted bytes
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xff).toByte
    spliced(5) = ((riffLen >> 8) & 0xff).toByte
    assert(AudioCodec.decode(id, spliced) == AudioCodec.decode(id, canonical))
  }

  test("audio frame energy frames stride by hop and replay the generator") {
    import graft.operators.MultimodalOps
    import graft.operators.MultimodalOps.AudioCodec
    val out = MultimodalOps.audioFrameEnergy(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (id, frames) =>
      val n = AudioCodec.nSamplesOf(id)
      assert(frames.length == (n - 64) / 32 + 1, s"doc $id frame count")
      frames.foreach { r =>
        val f = r.getLong(1).toInt
        val expected = (0 until 64)
          .map(j => AudioCodec.sampleOf(id, f * 32 + j).toLong)
          .map(s => s * s).sum
        assert(r.getLong(2) == expected, s"doc $id frame $f energy")
      }
    }
  }

  test("video codec round-trips real animated GIF frames exactly") {
    import graft.operators.MultimodalOps.VideoCodec
    for (id <- Seq(0L, 1L, 4L, 59L, 500L)) {
      val bytes = VideoCodec.encode(id)
      // real GIF container magic
      assert(new String(bytes, 0, 6, "US-ASCII").startsWith("GIF8"))
      val frames = VideoCodec.decodeFrames(id, bytes)
      assert(frames.length == VideoCodec.nFramesOf(id), s"asset $id frame count")
      frames.foreach { fr =>
        assert(fr.width == VideoCodec.widthOf(id) && fr.height == VideoCodec.heightOf(id))
        // a solid-color frame survives palette quantization losslessly
        assert(fr.gray == VideoCodec.frameGrayOf(id, fr.frameIdx),
          s"asset $id frame ${fr.frameIdx} gray drifted: $fr")
      }
    }
  }

  test("real resize preserves aspect ratio within the target box") {
    import graft.operators.MultimodalOps._
    // fixed-point box fit: 640x480 into 320x320 -> 320x240 (4:3 kept)
    assert(MediaCodec.fitBox(640, 480, 320, 320) == ((320, 240)))
    assert(MediaCodec.fitBox(1, 4000, 64, 64) == ((1, 62))) // width clamps to 1
    val out = resizedMeta(spark, "/root/testdata/sf0.001", 32, 32).collect()
    assert(out.nonEmpty && out.forall(x => x.width <= 32 && x.height <= 32 &&
      x.width >= 1 && x.height >= 1 && x.format == "png"))
  }

  test("media chunks stride by hop with fixed width and full leading coverage") {
    val out = graft.operators.MultimodalOps
      .mediaChunks(spark, "/root/testdata/sf0.001", width = 16, hop = 12).collect()
    assert(out.nonEmpty)
    // offsets stride by hop from 0; every chunk is exactly width bytes
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.values.foreach { chunks =>
      val offs = chunks.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      assert(offs == offs.indices.map(_ * 12L), s"offsets not hop-strided: $offs")
      assert(chunks.forall(_.getString(3).length == 32)) // 16 bytes = 32 hex chars
    }
    // overlapping windows: consecutive chunks share width - hop bytes
    val one = byDoc.values.find(_.length >= 2).get.sortBy(_.getLong(1))
    assert(one(0).getString(3).takeRight(8) == one(1).getString(3).take(8),
      "chunk overlap bytes must match between consecutive windows")
  }

  test("bamboohr XML parse defaults missing fields to empty string") {
    import spark.implicits._
    val parsed = Seq(
      "<employee><field id=\"workEmail\">a@x</field></employee>")
      .toDF("payload")
      .select(expr(
        "from_xml(payload, 'field ARRAY<STRUCT<_id: STRING, _VALUE: STRING>>')").as("e"))
      .select(map_from_entries(
        expr("transform(e.field, f -> struct(f._id, f._VALUE))")).as("m"))
      .select(coalesce(col("m")("workEmail"), lit("")).as("email"),
        coalesce(col("m")("jobTitle"), lit("")).as("role"))
    assert(rows(parsed) == Seq(Seq("a@x", "")))
  }

  test("feast columns put entities before features with contiguous sort order") {
    val out = RegistryIngest.feastFeatureTables(spark, "/root/testdata/sf0.001")
    val one = out.filter(col("feature_table") === "ft_nation_0")
      .select("col_name", "col_type", "sort_order").collect()
    assert(one.head.getString(0) == "nation_0_id" && one.head.getString(1) == "INT64")
    assert(one.head.getLong(2) == 0L)
    assert(one.tail.forall(r => r.getString(0).startsWith("f_s") &&
      r.getString(1) == "DOUBLE"))
    assert(one.map(_.getLong(2)).toSeq == (0L until one.length).toSeq)
  }

  test("Neptune typed headers map Spark types to String/Long/Double/Bool") {
    import spark.implicits._
    val df = Seq((1L, 2, 3.5, true, "x")).toDF("k", "i", "d", "b", "s")
    assert(graft.sources.Stage.typedHeader(df.schema) ==
      Seq("k:Long", "i:Long", "d:Double", "b:Bool", "s:String"))
    val out = java.nio.file.Files.createTempDirectory(graft.sources.TmpStores.pidScopedRoot("graft-testtmp"), "neptune_csv").toString + "/out"
    graft.sources.Stage.writeNeptuneCsv(df, out)
    val header = spark.read.text(out).filter(col("value").contains(":"))
      .collect().map(_.getString(0)).head
    assert(header == "k:Long,i:Long,d:Double,b:Bool,s:String")
  }

  test("bucketed staging joins with zero exchanges in the plan") {
    val dir = "/root/testdata/sf0.001"
    graft.sources.Stage.stageBucketed(
      graft.sources.Tables(spark, dir, "orders"), "b_orders", "o_custkey", 4)
    graft.sources.Stage.stageBucketed(
      graft.sources.Tables(spark, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_name")),
      "b_customer", "o_custkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      // and it still returns the right rows
      assert(joined.count() ==
        graft.sources.Tables(spark, dir, "orders").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedJoin returns exactly the plain join's rows") {
    val dir = "/root/testdata/sf0.001"
    val big = graft.sources.Tables(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val small = graft.sources.Tables(spark, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val cols = Seq("o_orderkey", "o_custkey", "o_totalprice", "c_name")
    val plain = big.join(small, Seq("o_custkey"))
      .select(cols.map(col): _*).orderBy("o_orderkey").collect().toSeq
    val salted = Relational.saltedJoin(big, small, Seq("o_custkey"),
        col("o_orderkey"), salt = 8)
      .select(cols.map(col): _*).orderBy("o_orderkey").collect().toSeq
    assert(salted == plain)
  }

  // ---- validation ----

  test("hamming_distance native expression works from Column API and SQL") {
    import graft.functions.HammingDistance.hamming
    import spark.implicits._
    val df = Seq((12L, 10L), (0L, -1L)).toDF("a", "b")
    assert(df.select(hamming(col("a"), col("b"))).collect().map(_.getInt(0)).toSeq ==
      Seq(2, 64))
    graft.extensions.GraftExtensions.register(spark)
    assert(spark.sql("SELECT hamming_distance(CAST(12 AS BIGINT), CAST(10 AS BIGINT))")
      .collect().head.getInt(0) == 2)
    // null-safe: null input → null output
    assert(Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .select(hamming(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("dot_product native expression matches the HOF form bit-for-bit") {
    import graft.functions.DotProduct.dot
    import spark.implicits._
    val df = Seq(
        (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
        (Seq(0.1, 0.2), Seq(0.3, 0.4)))
      .toDF("a", "b")
    val hof = expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)")
    val both = df.select(dot(col("a"), col("b")).as("native"), hof.as("hof")).collect()
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
    graft.extensions.GraftExtensions.register(spark)
    assert(spark.sql("SELECT dot_product(array(1d, 2d), array(3d, 4d))")
      .collect().head.getDouble(0) == 11.0)
    // zip_with pad semantics: length mismatch or null array → null
    assert(Seq((Seq(1.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(dot(col("a"), col("b"))).collect().head.isNullAt(0))
    assert(Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
      .select(dot(col("a"), col("b"))).collect().head.isNullAt(0))
    // untyped NULL literals pass analysis and yield null (HOF parity)
    assert(spark.sql("SELECT dot_product(array(1d), NULL)").collect().head.isNullAt(0))
    assert(spark.sql("SELECT hamming_distance(CAST(1 AS BIGINT), NULL)")
      .collect().head.isNullAt(0))
  }

  test("formatTags matches _format_as_list: filter empties BEFORE strip") {
    import spark.implicits._
    val out = Seq("A, B ,c", "a,, ,B", "", "x").toDF("t")
      .select(Transforms.formatTags(col("t")).as("tags"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a", "b", "c"))
    // ",," drops the empty segment; " " survives the filter then strips
    // to an empty tag — exactly the reference's order of operations
    assert(out(1) == Seq("a", "", "b"))
    assert(out(2) == Seq())
    assert(out(3) == Seq("x"))
  }

  test("isTitle matches Python str.istitle semantics") {
    assert(Graph.isTitle("Table"))
    assert(Graph.isTitle("Dashboardgroup"))
    assert(Graph.isTitle("Programmatic_Description"))
    assert(!Graph.isTitle("TABLE"))
    assert(!Graph.isTitle("tAble"))
    assert(!Graph.isTitle("table"))
    assert(!Graph.isTitle("123"))
    assert(!Graph.isTitle(""))
  }

  test("repetition signals count the top n-gram fraction exactly") {
    val dir = java.nio.file.Files.createTempDirectory(graft.sources.TmpStores.pidScopedRoot("graft-testtmp"), "rep_docs").toString
    import spark.implicits._
    Seq(
      (1L, "a a a b"),        // top unigram a=3/4; top bigram "a a"=2/3; trigram "a a a"=1/2
      (2L, "x y"),            // bigram list has 1 element; no trigrams
      (3L, "w"))              // single token: no bigrams/trigrams -> nulls
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = TextOps.repetitionSignals(spark, dir).collect()
    assert(out.length == 3)
    val r1 = out(0)
    assert(r1.getLong(1) == 4L)
    assert(r1.getDouble(2) == 3.0 / 4.0)
    assert(r1.getDouble(3) == 2.0 / 3.0)
    assert(r1.getDouble(4) == 1.0 / 2.0)
    val r2 = out(1)
    assert(r2.getDouble(3) == 1.0 && r2.isNullAt(4))
    val r3 = out(2)
    assert(r3.getDouble(2) == 1.0 && r3.isNullAt(3) && r3.isNullAt(4))
  }

  test("as-of attribution picks the latest prior view, inclusive at ties") {
    val dir = java.nio.file.Files.createTempDirectory(graft.sources.TmpStores.pidScopedRoot("graft-testtmp"), "asof_events").toString
    import spark.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision is enough here
    Seq(
      (1L, ts(1000000L), 7L, "click", 0.0, "{}"),  // click before any view -> null
      (2L, ts(2000000L), 7L, "view", 0.0, "{}"),
      (3L, ts(3000000L), 7L, "click", 0.0, "{}"),  // -> view 2
      (4L, ts(4000000L), 7L, "view", 0.0, "{}"),
      (5L, ts(4000000L), 7L, "click", 0.0, "{}"),  // equal ts -> view 4 (inclusive)
      (6L, ts(9000000L), 8L, "view", 0.0, "{}"))   // other user, no clicks
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Events.asofAttribution(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L))
    assert(out(0).isNullAt(3) && out(0).isNullAt(5))
    assert(out(1).getLong(3) == 2L && out(1).getLong(5) == 1000000L)
    assert(out(2).getLong(3) == 4L && out(2).getLong(5) == 0L)
  }

  test("token sharding's distributed prefix sum equals the naive scan") {
    val dir = "/root/testdata/sf0.001"
    val budget = 500L
    val naive = {
      val toks = TextOps.tokenCount(spark, dir)
        .select("doc_id", "n_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var cum = 0L
      toks.map { case (id, n) => val s = cum / budget; cum += n; (id, s) }
        .groupBy(_._2).map { case (s, xs) => (s, xs.length.toLong) }
    }
    val got = TextOps.tokenShards(spark, dir, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == naive, s"distributed shard assignment diverged: $got vs $naive")
  }

  test("sequence packing: budget respected, bins contiguous, layout-independent") {
    val dir = "/root/testdata/sf0.001"
    val budget = 256L
    val rows = TextOps.packSequences(spark, dir, budget, 4 * budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // a bin's token total exceeds the budget only when it holds a single
    // oversized document (next-fit gives oversized docs their own bin)
    rows.groupBy(r => (r._2, r._3)).foreach { case (_, ds) =>
      assert(ds.map(_._4).sum <= budget || ds.length == 1,
        s"overfull multi-doc bin: $ds")
    }
    // within a segment, bins cover contiguous doc_id runs in order
    rows.groupBy(_._2).foreach { case (_, ds) =>
      val byId = ds.sortBy(_._1).map(_._3)
      assert(byId.zip(byId.drop(1)).forall { case (a, b) => b == a || b == a + 1 })
    }
    // deterministic across runs (layout-independent by construction —
    // the segment cut is the distributed prefix sum, packing is a pure
    // fold in doc order)
    val again = TextOps.packSequences(spark, dir, budget, 4 * budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("approx length quantiles track the exact percentiles (sketch scale path)") {
    val dir = "/root/testdata/sf0.001"
    val exact = TextOps.lengthQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // new contract: the frame emits the EXACT interpolated quantiles
    // (oracle-replayable) plus within_eps — the sketch's rank-bracket
    // self-check that the DuckDB oracle expects TRUE on every row
    val approx = TextOps.lengthQuantilesApprox(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)), r.getBoolean(5))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (lang, ((p25, p50, p75), withinEps)) =>
      assert((p25, p50, p75) == exact(lang),
        s"$lang emitted quantiles diverge from the exact twin")
      assert(withinEps, s"$lang sketch value fell outside its rank bracket")
    }
  }

  test("quantized ANN holds high recall against full-precision top-k") {
    val dir = "/root/testdata/sf0.001"
    def topk(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val full = topk(SimilarityOps.annBruteForce(spark, dir))
    val quant = topk(SimilarityOps.annBruteForceQuantized(spark, dir))
    assert(quant.keySet == full.keySet)
    val recalls = full.map { case (q, exact) =>
      quant(q).intersect(exact).size.toDouble / exact.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.85, s"avg recall@5 of int8 ranking was $avg")
  }

  test("domain mix is deterministic and honors per-language rates") {
    val dir = "/root/testdata/sf0.001"
    val a = TextOps.domainMix(spark, dir).collect()
    val b = TextOps.domainMix(spark, dir).collect()
    assert(a.toSeq == b.toSeq, "same corpus must make identical keep decisions")
    assert(a.nonEmpty)
    assert(a.forall(r => r.getDouble(2) < r.getDouble(3)),
      "every survivor drew u below its language rate")
    val rates = TextOps.MixRates.toMap
    assert(a.forall(r => rates(r.getString(1)) == r.getDouble(3)))
  }

  test("decontamination flags every planted eval excerpt's source document") {
    val dir = "/root/testdata/sf0.01"
    val out = DedupOps.decontaminate(spark, dir)
      .select("doc_id", "n_overlap", "contaminated").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // every 50th doc seeded a 200-char excerpt into the eval set; the
    // excerpt's 5-grams come verbatim from the source text, so the source
    // doc must be flagged (docs long enough to shingle at all)
    val sources = out.keys.filter(id => id % 50 == 0)
    assert(sources.nonEmpty, "fixture must contain planted sources")
    sources.foreach { id =>
      assert(out(id)._2, s"planted source doc $id must be contaminated (overlap=${out(id)._1})")
    }
    // contamination must be the exception, not the rule: unplanted docs
    // overwhelmingly carry zero overlapping 5-grams
    val unplanted = out.view.filterKeys(_ % 50 != 0)
    val clean = unplanted.count(!_._2._2)
    assert(clean.toDouble / unplanted.size > 0.9,
      s"expected >90% of unplanted docs clean, got $clean/${unplanted.size}")
  }

  test("watermark nodes parse col=value and key by part type") {
    val dir = "/root/testdata/sf0.01"
    val out = GraphBuild.watermarkNodes(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val key = r.getString(0)
      assert(key.startsWith("tpch://") &&
        (key.endsWith("/low_watermark/") || key.endsWith("/high_watermark/")))
      assert(r.getString(1) == "o_orderdate")
      assert(r.getString(2).matches("\\d{4}-\\d{2}-\\d{2}"))
    }
    // low <= high per table prefix
    val byTable = out.groupBy(r => r.getString(0).stripSuffix("low_watermark/")
      .stripSuffix("high_watermark/"))
    byTable.values.foreach { rs =>
      assert(rs.length == 2, "exactly one low and one high watermark per table")
      val lo = rs.find(_.getString(0).endsWith("/low_watermark/")).get.getString(2)
      val hi = rs.find(_.getString(0).endsWith("/high_watermark/")).get.getString(2)
      assert(lo <= hi)
    }
  }

  test("approx_count_distinct tracks the exact vocabulary size within 5%") {
    // the sketch path a 100 TB vocabulary/usage report would take —
    // HLL++ is merge-associative (one narrow pass + tiny state) where
    // exact countDistinct shuffles every token; assert the accuracy
    // envelope that makes the swap safe
    val toks = TextOps.tokens(col("text"))
    val df = graft.sources.Tables(spark, "/root/testdata/sf0.01", "documents")
      .select(explode(toks).as("token"))
    val exact = df.select(countDistinct("token")).head.getLong(0)
    val approx = df.select(approx_count_distinct("token", 0.02)).head.getLong(0)
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"HLL estimate $approx vs exact $exact drifts over 5%")
  }

  test("IVF nprobe=2 recall dominates nprobe=1 against the exact top-k") {
    val dir = "/root/testdata/sf0.01"
    val exact = SimilarityOps.annBruteForce(spark, dir)
      .select("query_id", "neighbor_id")
    def hits(nprobe: Int): Long = exact.join(
      SimilarityOps.annIvfTopKProbes(spark, dir, nprobe)
        .select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    val h1 = hits(1)
    val h2 = hits(2)
    assert(h1 > 0, "single-probe search should find some true neighbors")
    assert(h2 >= h1, s"nprobe=2 ($h2) must not lose recall vs nprobe=1 ($h1)")
    assert(h2 > h1, s"on this corpus the second probe should add recall ($h1 -> $h2)")
  }

  test("two-stage quantized shortlist + full-precision rerank recovers the exact top-k") {
    val dir = "/root/testdata/sf0.01"
    val exact = SimilarityOps.annBruteForce(spark, dir)
      .select("query_id", "neighbor_id")
    val nExact = exact.count()
    val hits = exact.join(
      SimilarityOps.annTopKRerank(spark, dir).select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(nExact > 0)
    // a 20-candidate int8 shortlist re-ranked at full precision should
    // recover essentially all of the true top-5
    assert(hits >= (nExact * 95) / 100,
      s"rerank recall too low: $hits / $nExact")
  }

  test("BPE merges greedily left-to-right, counts by word frequency, stops when no pairs remain") {
    import spark.implicits._
    // corpus: "aaa" ×2, "ab" ×1
    val toks = Seq("aaa", "aaa", "ab").toDF("word")
    val merges = TextOps.bpeMergesFromTokens(toks, k = 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (a,a) appears twice PER "aaa" occurrence -> 2 words × 2 = 4;
    // (a,b) counts 1. Merge (a,a). Greedy left-to-right: "a a a" -> "aa a"
    // (the overlapping second (a,a) pair is NOT merged).
    // round 2: (aa,a) count 2 beats (a,b) count 1. round 3: (a,b).
    // rounds 4+: no pairs anywhere -> trainer stops at 3 merges.
    assert(merges.toSeq == Seq(
      (1L, "a", "a", 4L),
      (2L, "aa", "a", 2L),
      (3L, "a", "b", 1L)))
  }

  test("BPE tie on pair count breaks lexicographically") {
    import spark.implicits._
    // "xy" and "ab" both once: counts tie at 1 -> (a,b) wins over (x,y)
    val merges = TextOps.bpeMergesFromTokens(Seq("xy", "ab").toDF("word"), k = 1)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(merges.head == ("a", "b"))
  }
}
