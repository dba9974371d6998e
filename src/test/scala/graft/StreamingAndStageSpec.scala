package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Events, GraphBuild}
import graft.sources.{Stage, Tables}
import graft.streaming.EventStream
import java.nio.file.Files

/** Drives the streaming micro-batch path and the staged-output layer
  * end-to-end against testdata. */
class StreamingAndStageSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(graft.sources.TmpStores.pidScopedRoot("graft-testtmp"), prefix).toString

  test("streaming windowed agg over AvailableNow micro-batch matches batch result") {
    // stage the events through a parquet dir with µs timestamps (stream edge)
    val staged = tmp("stream-in")
    Tables(spark, dir, "events").write.mode("overwrite").parquet(staged)
    val result = EventStream.runAvailableNow(
      spark, EventStream.source(spark, staged), "win_counts", tmp("ckpt"))
    val batch = Events.windowedAgg(spark, dir)
    assert(result.count() == batch.count())
    val streamTotal = result.agg(sum("n")).head.getLong(0)
    val batchTotal = batch.agg(sum("n")).head.getLong(0)
    assert(streamTotal == batchTotal)
  }

  test("checkpointed restart does not reprocess (at-least-once commit analog)") {
    val staged = tmp("stream-in2")
    Tables(spark, dir, "events").write.mode("overwrite").parquet(staged)
    val ckpt = tmp("ckpt2")
    val first = EventStream.runAvailableNow(
      spark, EventStream.source(spark, staged), "win1", ckpt)
    val n1 = first.agg(sum("n")).head.getLong(0)
    assert(n1 == Tables(spark, dir, "events").count())
    // second run with same checkpoint: offsets already committed, so
    // AvailableNow terminates without emitting any batch (no reprocessing)
    val second = EventStream.runAvailableNow(
      spark, EventStream.source(spark, staged), "win1b", ckpt)
    assert(second.count() == 0, "restart reprocessed already-committed data")
  }

  test("streaming dedup within watermark drops redelivered events") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val staged = tmp("stream-dedup")
    val events = Tables(spark, dir, "events")
    // simulate at-least-once redelivery: every event written twice
    events.union(events).write.mode("overwrite").parquet(staged)
    val q = EventStream.dedupWithinWatermark(EventStream.source(spark, staged))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("deduped")
      .option("checkpointLocation", tmp("ckpt-dedup"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("deduped")
    assert(out.count() == events.count(), "duplicates survived the stream dedup")
    assert(out.select("event_id").distinct().count() == events.count())
  }

  test("late cross-batch events extend the open session instead of regressing it") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import java.sql.Timestamp
    val inDir = tmp("stream-late")
    def writeBatch(name: String, eventsAt: Seq[(Long, String)]): Unit = {
      import spark.implicits._
      eventsAt.zipWithIndex.map { case ((uid, ts), i) =>
        (1000L + i, Timestamp.valueOf(ts), uid, "view", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(inDir)
      Thread.sleep(1100) // distinct mtimes → deterministic file order
    }
    // batch 1: 10:00, 10:10 — watermark after it is 09:10
    writeBatch("b1", Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:10:00")))
    // batch 2: LATE 09:50 (within watermark) + 10:20
    writeBatch("b2", Seq((1L, "2024-01-01 09:50:00"), (1L, "2024-01-01 10:20:00")))
    // batch 3: 11:00 — 40 min after 10:20 closes the session
    writeBatch("b3", Seq((1L, "2024-01-01 11:00:00")))
    val src = spark.readStream.schema(EventStream.eventSchemaDDL)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = EventStream.closedSessions(spark, src).writeStream
      .outputMode(OutputMode.Append()).format("memory").queryName("late_sessions")
      .option("checkpointLocation", tmp("ckpt-late"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("late_sessions")
      .select("start_micros", "end_micros", "n_events").collect()
    assert(rows.length == 1, s"expected one closed session, got ${rows.length}")
    val (start, end, n) = (rows.head.getLong(0), rows.head.getLong(1), rows.head.getLong(2))
    assert(start == Timestamp.valueOf("2024-01-01 09:50:00").getTime * 1000,
      "late event should extend the session start backward")
    assert(end == Timestamp.valueOf("2024-01-01 10:20:00").getTime * 1000)
    assert(n == 4 && end > start)
  }

  test("stateful sessionization agrees with the batch window form") {
    val staged = tmp("stream-in3")
    Tables(spark, dir, "events").write.mode("overwrite").parquet(staged)
    val events = EventStream.source(spark, staged)
    val q = EventStream.sessionize(spark, events).writeStream
      .outputMode("update").format("memory").queryName("sessions")
      .option("checkpointLocation", tmp("ckpt3"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("sessions")
      .groupBy("user_id").agg(max("n_sessions").as("n_sessions"))
    val batch = Events.sessionize(spark, dir).select("user_id", "n_sessions")
    val joined = streamed.as("s").join(batch.as("b"), "user_id")
      .filter(col("s.n_sessions") =!= col("b.n_sessions"))
    assert(joined.count() == 0, "stream/batch session counts diverge")
  }

  test("flatMapGroupsWithState emits exactly the in-batch closed sessions") {
    val staged = tmp("stream-in4")
    Tables(spark, dir, "events").write.mode("overwrite").parquet(staged)
    val q = EventStream.closedSessions(spark, EventStream.source(spark, staged))
      .writeStream
      .outputMode("append").format("memory").queryName("closed_sessions")
      .option("checkpointLocation", tmp("ckpt4"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val closed = spark.table("closed_sessions")
    // gap-closed sessions: per user n_sessions - 1; PLUS the trailing
    // session of every user whose last event + 30 min falls before the
    // final watermark (max event - 1 h) — those time out in the follow-up
    // AvailableNow batch
    val gapClosed = Events.sessionize(spark, dir)
      .agg(sum(col("n_sessions") - lit(1))).head.getLong(0)
    val ev = Tables(spark, dir, "events")
      .select(col("user_id").cast("long").as("uid"),
        expr("unix_micros(ts)").as("us"))
    val maxUs = ev.agg(max("us")).head.getLong(0)
    val wmMs = maxUs / 1000L - 3600000L
    val timedOut = ev.groupBy("uid").agg(max("us").as("last_us"))
      .filter(col("last_us") / 1000L + 1800000L < wmMs)
      .count()
    assert(closed.count() == gapClosed + timedOut)
    // session_id is the session start time (eviction-stable), so ids are
    // unique per user and consecutive sessions (by start order) disjoint
    import org.apache.spark.sql.expressions.Window
    assert(closed.select("user_id", "session_id").distinct().count() == closed.count())
    assert(closed.filter(col("session_id") =!= col("start_micros")).count() == 0)
    val w = Window.partitionBy("user_id").orderBy("start_micros")
    val bad = closed.withColumn("prev_end", lag("end_micros", 1).over(w))
      .filter(col("prev_end").isNotNull && col("prev_end") >= col("start_micros"))
    assert(bad.count() == 0, "overlapping consecutive sessions")
  }

  test("streaming as-of attribution matches the batch result on out-of-order input") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import java.sql.Timestamp
    val base = tmp("asof-stream")
    val evDir = s"$base/events.parquet"
    def writeBatch(rows: Seq[(Long, String, Long, String)]): Unit = {
      import spark.implicits._
      rows.map { case (id, ts, uid, kind) =>
        (id, Timestamp.valueOf(ts), uid, kind, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(evDir)
      Thread.sleep(1100)
    }
    // out-of-order within the 1 h watermark, across micro-batches
    writeBatch(Seq(
      (1L, "2024-01-01 10:00:00", 7L, "view"),
      (2L, "2024-01-01 10:20:00", 7L, "click")))
    writeBatch(Seq(
      (3L, "2024-01-01 10:10:00", 7L, "view"),   // late view between 1 and 2
      (4L, "2024-01-01 10:30:00", 7L, "click"),
      (5L, "2024-01-01 10:05:00", 8L, "click"))) // user 8: click before any view
    // sentinel far-future view pushes the watermark past every click
    writeBatch(Seq((99L, "2024-01-01 13:00:00", 9L, "view")))
    val q = EventStream.streamingAsof(spark,
        spark.readStream.schema(EventStream.eventSchemaDDL)
          .option("maxFilesPerTrigger", "1").parquet(evDir))
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("asof_stream").option("checkpointLocation", tmp("ckpt-asof"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("asof_stream")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val batch = Events.asofAttribution(spark, base)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // click 2 -> view 3: the LATE view (10:10, arriving a batch later)
    // must win over view 1 because the click only matures at the
    // watermark; click 4 -> view 3; click 5 -> no prior view
    assert(batch == Set((2L, 3L), (4L, 3L), (5L, -1L)))
    assert(streamed == batch,
      s"streaming attribution diverged: $streamed vs $batch")
  }

  test("stream-stream interval join matches the batch range join") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val staged = tmp("stream-ij")
    // single file → single micro-batch: the parity assertion requires
    // that the 1h/2h watermarks never fire mid-stream (a multi-file
    // staged write could deliver batches in arbitrary file order and
    // evict state the batch range join keeps — that would be a property
    // of file ordering, not of the join)
    Tables(spark, dir, "events").coalesce(1).write.mode("overwrite").parquet(staged)
    val q = EventStream.intervalJoin(EventStream.source(spark, staged))
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("interval_join").option("checkpointLocation", tmp("ckpt-ij"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("interval_join")
      .select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"),
        expr("unix_micros(ts)").as("cus"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("vu"),
        expr("unix_micros(ts)").as("vus"))
    val batch = clicks.join(views,
        col("cu") === col("vu") && col("vus") <= col("cus") &&
          col("vus") >= col("cus") - expr("3600000000L"))
      .select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture must produce in-window pairs")
    assert(streamed == batch,
      s"interval join diverged: ${streamed.size} streamed vs ${batch.size} batch pairs")
  }

  test("graph staging round-trips with per-label partitioning") {
    val out = tmp("staged-graph")
    val meta = GraphBuild.tableMetadata(spark, dir)
    Stage.stageNodes(GraphBuild.nodes(meta), out)
    Stage.stageEdges(GraphBuild.edges(meta), out)
    val back = Stage.readNodes(spark, out)
    assert(back.select("label").distinct().count() == 7)
    // partition pruning: a single-label read should not scan other labels
    val tablesOnly = Stage.readNodes(spark, out).filter(col("label") === "Table")
    assert(tablesOnly.count() ==
      Tables(spark, dir, "customer").count())
    assert(Stage.readEdges(spark, out).count() > 0)
  }

  test("blue/green publish swaps CURRENT atomically") {
    val base = tmp("docs-pub")
    val docs1 = operators.SearchDocs.tableDocs(spark, dir)
    Stage.publishBlueGreen(docs1, base, "v1")
    val got1 = Stage.current(spark, base)
    assert(got1.count() == docs1.count())
    val docs2 = docs1.limit(10)
    Stage.publishBlueGreen(docs2, base, "v2")
    assert(Stage.current(spark, base).count() == 10)
    // the old generation is DROPPED with the publish — the reference
    // deletes the old index in the same atomic alias update
    // (elasticsearch_publisher.py:111-122); repeated publishes must not
    // leak a corpus copy per run
    assert(!graft.sources.Hfs.exists(s"$base/gen=v1"))
    assert(graft.sources.Hfs.children(base)(_.startsWith("gen="))
      .map(_.getName) == Seq("gen=v2"))
  }

  test("ES publish contract: mapping artifact + _id routing column") {
    val base = tmp("docs-pub-es")
    val docs = operators.SearchDocs.tableDocs(spark, dir)
    // the id column must exist — a typo is a publish-time error
    intercept[IllegalArgumentException] {
      Stage.publishBlueGreen(docs, base, "bad", docType = "table", idCol = "nope")
    }
    val target = Stage.publishBlueGreen(docs, base, "v1",
      docType = "table", idCol = "key")
    val mapping = java.nio.file.Files.readString(
      java.nio.file.Paths.get(target, "_MAPPING.json"))
    // the new index is created WITH the mapping
    // (elasticsearch_publisher.py:94): text fields carry the simple
    // analyzer + raw keyword subfield, epochs map to date/epoch_second,
    // counters to long, and the id contract names the routing column
    assert(mapping.contains(""""_id_from":"key""""))
    assert(mapping.contains(
      """"name":{"type":"text","analyzer":"simple","fields":{"raw":{"type":"keyword"}}}"""))
    assert(mapping.contains(
      """"last_updated_timestamp":{"type":"date","format":"epoch_second"}"""))
    assert(mapping.contains(""""total_usage":{"type":"long"}"""))
    // documents still read back, id column intact and unique
    val got = Stage.current(spark, base)
    assert(got.count() == docs.count())
    assert(got.select("key").distinct().count() == docs.count())
    // the mapping sidecar must not corrupt the json read
    assert(got.columns.contains("key"))
  }

  test("current(schema) skips the inference pass — no job at construction") {
    val base = tmp("docs-pub-lazy")
    // a plain frame with no internal persists/futures, so the only jobs
    // in play are the publish write and (if any) the read's inference
    val docs = spark.range(100)
      .select(col("id").as("key"), concat(lit("n"), col("id")).as("name"))
    Stage.publishBlueGreen(docs, base, "v1")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // the bus is async — drain it around each step so counts are exact
    def drained(): Int = {
      org.apache.spark.GraftTestBridge.flushListenerBus(spark.sparkContext)
      jobs.get()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val base0 = drained()
      val lazyDf = Stage.current(spark, base, docs.schema)
      val after = drained()
      assert(after == base0,
        s"current(schema) ran ${after - base0} job(s) at construction — " +
          "the declared-schema read must not infer")
      // and the data is what the inference path would see
      assert(lazyDf.count() == 100)
      // schema-less construction DOES pay the inference pass (the
      // documented last-resort behavior this API exists to avoid)
      val base1 = drained()
      Stage.current(spark, base)
      val after1 = drained()
      assert(after1 > base1,
        "schema-less current() unexpectedly skipped inference — update the docs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
