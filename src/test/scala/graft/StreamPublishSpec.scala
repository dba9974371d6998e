package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.streaming.StreamPublish
import java.nio.file.Files

/** Continuous MERGE publishing: micro-batches fold into a versioned
  * snapshot with publish-tag stamping, untouched-row stamp retention,
  * atomic CURRENT swaps, and redelivery idempotence — the streaming form
  * of the reference's extract → publish → offset-commit loop.
  */
class StreamPublishSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config(Tables.nanosAsLongConf, "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String): String =
    Files.createTempDirectory(graft.sources.TmpStores.pidScopedRoot("graft-testtmp"), s"graft-$name").toString

  private val dir = "/root/testdata/sf0.001"

  test("micro-batches fold into a stamped snapshot; CURRENT swaps per batch") {
    val in = tmp("sp-in")
    val base = tmp("sp-out")
    // two files → two micro-batches: batch 0 carries every user, batch 1
    // re-delivers only users with user_id % 3 != 0 — so one user cohort
    // is touched by batch 0 alone (stamp-retention case) and the rest
    // are re-stamped by batch 1
    val ev = Tables(spark, dir, "events")
      .select(col("user_id").cast("string").as("key"),
        col("event_type"), col("value").cast("string").as("value"),
        col("ts"), col("event_id"), col("user_id"))
    ev.drop("user_id").coalesce(1).write.mode("append").parquet(in)
    ev.filter(col("user_id") % 3 =!= 0).drop("user_id")
      .coalesce(1).write.mode("append").parquet(in)

    val src = spark.readStream
      .schema(ev.drop("user_id").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in)
    val q = StreamPublish.publishStream(src, base, tmp("sp-ckpt"),
      "key", Seq("event_type", "value"),
      Seq(col("ts"), col("event_id")), "tag_")
    q.awaitTermination()

    val snap = StreamPublish.readCurrent(spark, base)
    // every user present exactly once
    val users = ev.select("key").distinct().count()
    assert(snap.count() == users)
    assert(snap.select("key").distinct().count() == users)
    // both batches carry each shared user's full event set, so the fold
    // equals the global LWW by (ts, event_id) for every user
    val expected = graft.operators.Publish.lastWriteWins(
      ev.drop("user_id"), "key", Seq(col("ts"), col("event_id")))
      .select("key", "event_type", "value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val got = snap.select("key", "event_type", "value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == expected)
    // stamps: the %3==0 cohort is only in batch 0 and keeps tag_0 after
    // batch 1 merges (stamp retention); the rest re-stamp to tag_1
    val tags = snap.select("key", "published_tag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val batch0Only = ev.filter(col("user_id") % 3 === 0)
      .select("key").distinct().collect().map(_.getString(0))
    val touched = ev.filter(col("user_id") % 3 =!= 0)
      .select("key").distinct().collect().map(_.getString(0))
    assert(batch0Only.nonEmpty && batch0Only.forall(k => tags(k) == "tag_0"))
    assert(touched.nonEmpty && touched.forall(k => tags(k) == "tag_1"))
    // both generations exist; CURRENT points at the last batch's manifest
    assert(Files.exists(java.nio.file.Paths.get(base, "gen=0")))
    assert(Files.exists(java.nio.file.Paths.get(base, "gen=1")))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(base, "CURRENT")).contains("manifest-1"))
  }

  test("a batch rewrites only the buckets it touches; untouched bucket files are byte-identical") {
    import spark.implicits._
    val base = tmp("sp4-out")
    def md5s(gen: String): Map[String, String] = {
      val root = java.nio.file.Paths.get(base, gen)
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.startsWith("part-"))
        .map(p => p.toString ->
          java.security.MessageDigest.getInstance("MD5")
            .digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString)
        .toMap
    }
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // batch 0 spreads 200 keys over every bucket
    val b0 = (1 to 200).map(i => (s"u$i", "seed", s"v$i", ts, i.toLong))
      .toDF("key", "event_type", "value", "ts", "event_id")
    StreamPublish.publishBatch(b0, 0L, base, "key",
      Seq("event_type", "value"), Seq(col("ts"), col("event_id")), "t_")
    val gen0 = md5s("gen=0")
    val m0 = java.nio.file.Files.readString(java.nio.file.Paths.get(base, "manifest-0"))
    val buckets0 = m0.linesIterator.drop(2).map(_.split('\t')(0).toInt).toSet
    assert(buckets0.size > 1, s"batch 0 should span several buckets:\n$m0")
    // batch 1 touches a single key → a single bucket
    val b1 = Seq(("u1", "update", "v1b", ts, 1000L))
      .toDF("key", "event_type", "value", "ts", "event_id")
    StreamPublish.publishBatch(b1, 1L, base, "key",
      Seq("event_type", "value"), Seq(col("ts"), col("event_id")), "t_")
    val m1 = java.nio.file.Files.readString(java.nio.file.Paths.get(base, "manifest-1"))
    val entries1 = m1.linesIterator.drop(2)
      .map { l => val a = l.split('\t'); a(0).toInt -> a(1) }.toMap
    val rewritten = entries1.filter(_._2.startsWith("gen=1"))
    assert(rewritten.size == 1, s"batch 1 should rewrite exactly one bucket:\n$m1")
    assert(entries1.count(_._2.startsWith("gen=0")) == buckets0.size - 1)
    // the untouched buckets' files were not rewritten — same paths, same bytes
    assert(md5s("gen=0") == gen0)
    // and the folded snapshot is still the global LWW state
    val snap = StreamPublish.readCurrent(spark, base)
    assert(snap.count() == 200)
    val u1 = snap.filter(col("key") === "u1")
      .select("event_type", "value", "published_tag").collect().head
    assert((u1.getString(0), u1.getString(1), u1.getString(2)) == ("update", "v1b", "t_1"))
    // an untouched key keeps its batch-0 row and stamp
    val u2 = snap.filter(col("key") === "u2")
      .select("event_type", "value", "published_tag").collect().head
    assert((u2.getString(0), u2.getString(1), u2.getString(2)) == ("seed", "v2", "t_0"))
    // the bucket-pruned point lookup returns exactly the full read's rows
    val pruned = StreamPublish.readCurrentKeys(spark, base, Seq("u1", "u2"), "key")
      .select("key", "event_type", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val full = snap.filter(col("key").isin("u1", "u2"))
      .select("key", "event_type", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(pruned == full && pruned.size == 2)
    // a key that hashes to an absent bucket is simply absent
    assert(StreamPublish.readCurrentKeys(spark, base, Seq("nope"), "key").count() == 0)
  }

  test("compaction folds live buckets into one generation, drops the dead ones, keeps the snapshot") {
    import spark.implicits._
    val base = tmp("sp5-out")
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val b0 = (1 to 100).map(i => (s"u$i", "seed", s"v$i", ts, i.toLong))
      .toDF("key", "event_type", "value", "ts", "event_id")
    val b1 = Seq(("u1", "update", "v1b", ts, 1000L), ("u201", "seed", "v201", ts, 1001L))
      .toDF("key", "event_type", "value", "ts", "event_id")
    def publish(df: org.apache.spark.sql.DataFrame, id: Long) =
      StreamPublish.publishBatch(df, id, base, "key",
        Seq("event_type", "value"), Seq(col("ts"), col("event_id")), "t_")
    publish(b0, 0L); publish(b1, 1L)
    def snap() = StreamPublish.readCurrent(spark, base)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val before = snap()
    StreamPublish.compact(spark, base, "key")
    assert(snap() == before)
    // exactly one generation dir remains and the manifest references only it
    import scala.jdk.CollectionConverters._
    val gens = Files.list(java.nio.file.Paths.get(base)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("gen=")).toList
    assert(gens == List("gen=1.c0"), gens.toString)
    // redelivery guard survives (same batch id), and publishing continues
    StreamPublish.publishBatch(b1, 1L, base, "key",
      Seq("event_type", "value"), Seq(col("ts"), col("event_id")), "t_")
    assert(snap() == before)
    publish(Seq(("u2", "update", "v2b", ts, 2000L))
      .toDF("key", "event_type", "value", "ts", "event_id"), 2L)
    assert(snap() != before)
    assert(StreamPublish.readCurrent(spark, base)
      .filter(col("key") === "u2").select("value").collect().head.getString(0) == "v2b")
  }

  test("a redelivered batch whose CURRENT swap already landed is a no-op") {
    import spark.implicits._
    val base = tmp("sp3-out")
    val batch = Seq(("u1", "click", "1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L))
      .toDF("key", "event_type", "value", "ts", "event_id")
    StreamPublish.publishBatch(batch, 0L, base, "key",
      Seq("event_type", "value"), Seq(col("ts"), col("event_id")), "t_")
    val snap1 = StreamPublish.readCurrent(spark, base).collect().toSeq
    // the crash-after-swap-before-checkpoint-commit shape: the SAME batch
    // id arrives again — without the guard this reads gen=0 as prior and
    // overwrites gen=0 while reading it
    StreamPublish.publishBatch(batch, 0L, base, "key",
      Seq("event_type", "value"), Seq(col("ts"), col("event_id")), "t_")
    assert(StreamPublish.readCurrent(spark, base).collect().toSeq == snap1)
  }

  test("randomized batch sequences fold to the sequential in-memory merge") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    for (seed <- Seq(7, 23, 91)) {
      val rnd = new scala.util.Random(seed)
      val base = tmp(s"spprop$seed")
      var expected = Map.empty[String, (String, String)]
      for (b <- 0 until 4) {
        // batch 2 is empty — must be a clean no-op (no manifest commit)
        val n = if (b == 2) 0 else rnd.nextInt(40) + 1
        val rows = (0 until n).map { i =>
          ("k" + rnd.nextInt(25), "t" + rnd.nextInt(5), "v" + rnd.nextInt(1000),
            ts, (b * 1000 + i).toLong)
        }
        rows.groupBy(_._1).foreach { case (k, rs) =>
          val last = rs.maxBy(_._5) // event_id strictly increasing = LWW order
          expected += k -> ((last._2, last._3))
        }
        StreamPublish.publishBatch(
          rows.toDF("key", "event_type", "value", "ts", "event_id"),
          b.toLong, base, "key", Seq("event_type", "value"),
          Seq(col("ts"), col("event_id")), "t_")
      }
      val got = StreamPublish.readCurrent(spark, base)
        .select("key", "event_type", "value").collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
      assert(got == expected, s"seed $seed diverged")
    }
  }

  test("redelivery is idempotent: replaying the stream converges to the same snapshot") {
    val in = tmp("sp2-in")
    val base = tmp("sp2-out")
    val ev = Tables(spark, dir, "events")
      .select(col("user_id").cast("string").as("key"),
        col("event_type"), col("value").cast("string").as("value"),
        col("ts"), col("event_id"))
    ev.coalesce(1).write.mode("append").parquet(in)
    def run(): Unit = {
      val q = StreamPublish.publishStream(
        spark.readStream.schema(ev.schema).parquet(in), base, tmp("sp2-ckpt"),
        "key", Seq("event_type", "value"), Seq(col("ts"), col("event_id")), "t_")
      q.awaitTermination()
    }
    run()
    val first = StreamPublish.readCurrent(spark, base)
      .select("key", "event_type", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // a fresh checkpoint redelivers everything — the merge must converge
    run()
    val second = StreamPublish.readCurrent(spark, base)
      .select("key", "event_type", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(second == first)
  }
}
