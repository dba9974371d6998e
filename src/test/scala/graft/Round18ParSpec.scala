package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 OPTIMIZATION specs — the StreamPar threading contract.
  *
  * Round 17's `StreamPar.runAll` submitted per-batch Spark actions on
  * `ExecutionContext.Implicits.global`; those pool threads inherit the
  * active-session thread-local from whichever thread happened to force
  * the global pool first, so under concurrent suites/streams a worker
  * could construct plans with a NULL session (the driver's observed
  * `SparkPlan.session() is null` NPE from `Dataset.persist` inside a
  * running micro-batch). runAll now uses a dedicated per-call pool that
  * pins the CALLER's active session on every worker. These tests pin:
  *
  *  - session propagation: tasks observe the submitting thread's active
  *    session even when the caller is a secondary thread and the global
  *    pool is unavailable/poisoned;
  *  - two concurrent streams + a concurrent persist loop on ONE session
  *    complete green (the driver's failing schedule);
  *  - failure semantics: every task runs to completion and the FIRST
  *    failure in task order is the one surfaced. */
class Round18ParSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.nanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s
  }

  test("runAll tasks observe the caller's active session, from any caller thread") {
    import java.util.concurrent.atomic.AtomicInteger
    val seen = new AtomicInteger(0)
    val wrong = new AtomicInteger(0)
    // poison the global pool's inheritance source: force it from a
    // thread with NO active session, the way an unrelated suite thread
    // could — runAll must be immune because it no longer uses it
    val poison = new Thread(() => {
      SparkSession.clearActiveSession()
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      Await.ready(Future(()), Duration.Inf)
    })
    poison.start(); poison.join()
    // call runAll from a SECONDARY thread that owns the session — the
    // shape a foreachBatch micro-batch thread has
    var failure: Option[Throwable] = None
    val caller = new Thread(() => {
      try {
        SparkSession.setActiveSession(spark)
        graft.streaming.StreamPar.runAll((1 to 4).map { _ => () => {
          if (SparkSession.getActiveSession.contains(spark)) seen.incrementAndGet()
          else wrong.incrementAndGet()
          // a real session-dependent action: plan + persist + compute
          val df = spark.range(0, 1000).selectExpr("id", "id * 2 as v")
            .persist()
          try assert(df.count() === 1000L) finally df.unpersist()
        }})
      } catch { case t: Throwable => failure = Some(t) }
    })
    caller.start(); caller.join()
    assert(failure.isEmpty, s"runAll failed: $failure")
    assert(wrong.get() === 0, "a task ran without the caller's active session")
    assert(seen.get() === 4)
  }

  test("runAll runs every task and surfaces the FIRST failure in task order") {
    import java.util.concurrent.atomic.AtomicInteger
    val ran = new AtomicInteger(0)
    val e = intercept[RuntimeException] {
      graft.streaming.StreamPar.runAll(Seq(
        () => { ran.incrementAndGet(); () },
        () => { ran.incrementAndGet(); throw new RuntimeException("first") },
        () => { ran.incrementAndGet(); throw new RuntimeException("second") }
      ))
    }
    assert(e.getMessage === "first",
      "the surfaced failure must be the first by TASK order, not completion order")
    assert(ran.get() === 3, "no sibling task may be abandoned when one fails")
  }

  test("two concurrent streams + a concurrent persist loop on one session stay green") {
    val spark0 = spark
    import spark0.implicits._
    val root = graft.sources.TmpStores.pidScopedRoot("graft-testtmp")
      .resolve("r18-concurrent-streams")
    graft.sources.TmpStores.deleteRecursively(root)
    def p(s: String) = root.resolve(s).toString
    // two independent media gates (image + audio kinds) over disjoint
    // dirs, plus a driver persist loop — the concurrent schedule the
    // driver's sbt test run NPE'd on in round 17
    Seq((0L, 0L, "orig"), (1L, 1L, "orig"))
      .toDF("doc_id", "orig_id", "kind")
      .coalesce(1).write.mode(SaveMode.Append).parquet(p("in1"))
    Seq((2L, 2L, "orig"), (3L, 3L, "orig"))
      .toDF("doc_id", "orig_id", "kind")
      .coalesce(1).write.mode(SaveMode.Append).parquet(p("in2"))
    val schema = Seq((0L, 0L, "x")).toDF("doc_id", "orig_id", "kind").schema
    @volatile var persistFailure: Option[Throwable] = None
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val persister = new Thread(() => {
      try {
        SparkSession.setActiveSession(spark)
        while (!stop.get()) {
          val df = spark.range(0, 2000).selectExpr("id", "id % 7 as k")
            .groupBy("k").count().persist()
          try df.count() finally df.unpersist()
        }
      } catch { case t: Throwable => persistFailure = Some(t) }
    })
    persister.start()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def runStream(in: String, out: String, ckpt: String): Thread = {
      val t = new Thread(() => {
        SparkSession.setActiveSession(spark)
        graft.streaming.MediaDedupStream.run(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(in),
          out, ckpt).awaitTermination()
      })
      t.setUncaughtExceptionHandler((_, e) => failures.add(e))
      t.start(); t
    }
    val t1 = runStream(p("in1"), p("out1"), p("ckpt1"))
    val t2 = runStream(p("in2"), p("out2"), p("ckpt2"))
    t1.join(120000); t2.join(120000)
    stop.set(true); persister.join(30000)
    assert(!t1.isAlive && !t2.isAlive, "streams must terminate")
    assert(failures.isEmpty, s"stream failed: ${failures.peek()}")
    assert(persistFailure.isEmpty,
      s"concurrent persist loop failed: $persistFailure")
    assert(spark.read.parquet(p("out1")).count() === 2L)
    assert(spark.read.parquet(p("out2")).count() === 2L)
    graft.sources.TmpStores.deleteRecursively(root)
  }
}
