package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CsvIngest, Transforms}
import graft.pipeline.{Pipeline, ScopedConfig}
import graft.sources.{Generic, Stage, Tables}
import java.nio.file.Files

/** Orchestration + long-tail source/transformer coverage: scoped config,
  * pipeline launch with callbacks, CSV extractor family, catalog metadata
  * source, generic/remove/tag transformers, CSV loader. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ScopedConfig scopes keys and falls back like HOCON") {
    val conf = ScopedConfig(Map(
      "extractor.csv.file_location" -> "/tmp/x.csv",
      "extractor.csv.batch" -> "500",
      "publisher.neo4j.tag" -> "t1"))
    val csv = conf.scoped("extractor.csv")
    assert(csv.string("file_location") == "/tmp/x.csv")
    assert(csv.longOr("batch", 0) == 500L)
    assert(csv.stringOr("missing", "d") == "d")
    intercept[NoSuchElementException] { csv.string("missing") }
    val withDefaults = csv.withFallback(
      ScopedConfig(Map("extractor.csv.batch" -> "100", "extractor.csv.quote" -> "\"")))
    assert(withDefaults.string("batch") == "500") // own value wins
    assert(withDefaults.string("quote") == "\"")  // fallback fills gaps
  }

  test("Pipeline composes source→transforms→sink and fires callbacks") {
    var succeeded = 0
    var staged: Long = -1
    val p = Pipeline(
      name = "test",
      source = s => Tables(s, "/root/testdata/sf0.001", "customer"),
      transforms = Seq(
        _.filter(col("c_custkey") % 2 === 0),
        df => Transforms.removeFields(df, "c_mktsegment")),
      sink = df => staged = df.count(),
      onSuccess = () => succeeded += 1)
    p.launch(spark)
    assert(succeeded == 1 && staged > 0)
    assert(!p.dataFrame(spark).columns.contains("c_mktsegment"))
    // failure path: sink throws → onFailure fires, exception propagates
    var failed = 0
    val bad = p.copy(sink = _ => throw new RuntimeException("sink down"),
      onFailure = () => failed += 1)
    intercept[RuntimeException] { bad.launch(spark) }
    assert(failed == 1)
  }

  test("Pipeline emits statsd-style success/fail counters (job.py:68-89)") {
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val p = Pipeline(
      name = "metered",
      source = s => Tables(s, "/root/testdata/sf0.001", "region"),
      sink = df => { df.count(); () },
      metrics = (k, v) => counts(k) += v)
    p.launch(spark)
    assert(counts("job.metered.success") == 1L && counts("job.metered.fail") == 0L)
    // failure increments fail exactly once, success not at all
    val bad = p.copy(sink = _ => throw new RuntimeException("down"))
    intercept[RuntimeException] { bad.launch(spark) }
    assert(counts("job.metered.success") == 1L && counts("job.metered.fail") == 1L)
    // a throwing metrics sink never changes the outcome
    var ok = 0
    val noisy = p.copy(metrics = (_, _) => throw new IllegalStateException("statsd down"),
      onSuccess = () => ok += 1)
    noisy.launch(spark)
    assert(ok == 1)
  }

  test("CSV extractor family: column group-join and badge join") {
    val dir = Files.createTempDirectory(graft.sources.TmpStores.pidScopedRoot("graft-testtmp"), "csv_ingest")
    val tablesCsv = dir.resolve("tables.csv")
    Files.writeString(tablesCsv,
      "database,cluster,schema,name,description\n" +
        "hive,gold,public,users,people\n" +
        "hive,gold,public,orders,sales\n")
    val colsCsv = dir.resolve("cols.csv")
    Files.writeString(colsCsv,
      "database,cluster,schema,name,col_name,col_type,sort_order,description\n" +
        "hive,gold,public,users,id,bigint,1,pk\n" +
        "hive,gold,public,users,email,varchar,2,contact\n")
    val badgesCsv = dir.resolve("badges.csv")
    Files.writeString(badgesCsv,
      "database,cluster,schema,name,badge\n" +
        "hive,gold,public,users,pii\n" +
        "hive,gold,public,users,golden\n")

    val tables = Tables.csv(spark, tablesCsv.toString)
    val nested = CsvIngest.tableColumn(tables, Tables.csv(spark, colsCsv.toString))
      .orderBy("name").collect()
    assert(nested.length == 2)
    val users = nested.find(_.getAs[String]("name") == "users").get
    assert(users.getAs[scala.collection.Seq[Any]]("columns").length == 2)
    assert(nested.find(_.getAs[String]("name") == "orders").get
      .getAs[scala.collection.Seq[Any]]("columns").isEmpty)

    val badged = CsvIngest.tableBadges(tables, Tables.csv(spark, badgesCsv.toString))
      .orderBy("name").collect()
    assert(badged.find(_.getAs[String]("name") == "users").get
      .getAs[scala.collection.Seq[String]]("badges").toSeq == Seq("golden", "pii"))
  }

  test("catalog metadata source lists temp views with columns") {
    Tables(spark, "/root/testdata/sf0.001", "region").createOrReplaceTempView("cat_region")
    val mds = Generic.catalogTables(spark, "spark", "gold")
      .filter(_.name == "cat_region")
    assert(mds.length == 1)
    val md = mds.head
    assert(md.isView && md.columns.map(_.name).contains("r_name"))
    assert(md.columns.map(_.sortOrder) == md.columns.indices.toSeq)
    // exclusion list drops it
    assert(Generic.catalogTables(spark, "spark", "gold", Set("cat_region"))
      .forall(_.name != "cat_region"))
  }

  test("catalog last-updated emission from table detail (DeltaLake analog)") {
    // a real managed catalog table so the DESCRIBE EXTENDED branch runs
    spark.sql("DROP TABLE IF EXISTS cat_lu_tbl")
    Tables(spark, "/root/testdata/sf0.001", "region").limit(2)
      .write.mode("overwrite").saveAsTable("cat_lu_tbl")
    Tables(spark, "/root/testdata/sf0.001", "region").createOrReplaceTempView("cat_lu_view")
    try {
      val got = Generic.catalogLastUpdated(spark, "spark", "gold")
        .filter(_.tableKey.endsWith("/cat_lu_tbl"))
      // the managed table emits a positive epoch from its Created Time
      assert(got.length == 1)
      assert(got.head.lastUpdatedEpoch > 1500000000L)
      assert(got.head.tableKey == "spark://gold.default/cat_lu_tbl")
      // views never emit (reference view branch has no lastModified)
      assert(Generic.catalogLastUpdated(spark, "spark", "gold")
        .forall(!_.tableKey.endsWith("/cat_lu_view")))
      // a Delta-style detail map with epoch lastModified wins over Created Time
      val injected = Generic.catalogLastUpdated(spark, "spark", "gold",
        detail = _ => Map("lastModified" -> "1700000000", "Created Time" -> "ignored"))
        .filter(_.tableKey.endsWith("/cat_lu_tbl"))
      assert(injected.head.lastUpdatedEpoch == 1700000000L)
    } finally spark.sql("DROP TABLE IF EXISTS cat_lu_tbl")
  }

  test("Mode dashboard extractor pipeline: spaces seed → reports REST join → transforms → DashboardMetadata") {
    // the ModeDashboardExtractor composition (mode_dashboard_extractor.py:38-109):
    // seed spaces query → reports RestApiQuery → TimestampStringToEpoch →
    // template substitution → DictToModel
    import spark.implicits._
    val spaces = Seq(("s1", "Finance"), ("s2", "Growth")).toDF("space_id", "space_name")
    val responses = Seq(
      ("s1", """{"reports": [{"token": "r1", "name": "Revenue", "created_at": "2024-01-02T03:04:05"},
                             {"token": "r2", "name": "Costs", "created_at": "bad-timestamp"}]}"""),
      ("s2", """{"reports": [{"token": "r3", "name": "Signups", "created_at": "2024-02-03T04:05:06"}]}"""))
      .toDF("space_id", "payload")
    val joined = graft.operators.RestJoin.restApiJoin(spaces, responses,
      Seq("space_id"), "payload",
      "STRUCT<reports: ARRAY<STRUCT<token: STRING, name: STRING, created_at: STRING>>>",
      Seq(graft.operators.RestJoin.JsonField("token", "reports.token"),
        graft.operators.RestJoin.JsonField("report_name", "reports.name"),
        graft.operators.RestJoin.JsonField("created_at", "reports.created_at")),
      skipNoResult = true)
    val modeled = joined
      // TimestampStringToEpoch: 0 on parse failure, never null
      .withColumn("createdTimestamp",
        coalesce(unix_timestamp(
          try_to_timestamp(col("created_at"), lit("yyyy-MM-dd'T'HH:mm:ss"))), lit(0L)))
      .select(
        col("space_name").as("dashboardGroup"),
        col("report_name").as("dashboardName"),
        concat(lit("report "), col("token")).as("description"), // template substitution
        array().cast("array<string>").as("tags"),
        lit("gold").as("cluster"),
        lit("mode").as("product"),
        lit(null).cast("string").as("dashboardGroupDescription"),
        col("createdTimestamp").cast("long").as("createdTimestamp"),
        lit(null).cast("string").as("dashboardUrl"),
        lit(null).cast("string").as("groupUrl"))
      .as[graft.model.DashboardMetadata] // DictToModel
      .collect().sortBy(_.dashboardName)
    assert(modeled.map(_.dashboardName).toSeq == Seq("Costs", "Revenue", "Signups"))
    assert(modeled.find(_.dashboardName == "Costs").get.createdTimestamp.contains(0L))
    assert(modeled.find(_.dashboardName == "Revenue").get.dashboardKey ==
      "mode_dashboard://gold.Finance/Revenue")
  }

  test("EsLastUpdated emits the driver-injected timestamp") {
    val lit = Generic.fromRecords(spark, Seq(("a", 1), ("b", 2)))
    assert(lit.collect().map(_.toSeq).toSeq == Seq(Seq("a", 1), Seq("b", 2)))
    val df = Generic.esLastUpdated(spark, 1234L)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1234L))
  }

  test("tag and generic-field transformers") {
    import spark.implicits._
    val df = Seq((1, Seq("a"))).toDF("id", "tags")
    val tagged = Transforms.addTags(df, "tags", Seq("b", "a"))
    assert(tagged.collect().head.getAs[Seq[String]]("tags").toSet == Set("a", "b"))
    val up = Transforms.onField(Seq((1, "x")).toDF("id", "v"), "v", upper(_))
    assert(up.collect().head.getAs[String]("v") == "X")
  }

  test("writeCsv round-trips with headers") {
    val out = Files.createTempDirectory(graft.sources.TmpStores.pidScopedRoot("graft-testtmp"), "csv_loader").toString + "/out"
    Stage.writeCsv(Tables(spark, "/root/testdata/sf0.001", "region"), out)
    assert(Tables.csv(spark, out).count() ==
      Tables(spark, "/root/testdata/sf0.001", "region").count())
  }
}
