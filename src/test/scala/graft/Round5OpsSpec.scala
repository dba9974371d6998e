package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps
import graft.sources.Tables

/** Golden semantics for the round-5 operators: the fixed-point quality-
  * model trainer (layout independence of the integer optimization, and
  * that training actually learns past the base rate).
  */
class Round5OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("quality trainer is layout-independent: identical trace on any partitioning") {
    val docs = Tables(spark, dir, "documents")
    val a = TextOps.trainQualityModelFrame(docs.repartition(1), 6)
      .collect().map(_.toSeq).toSeq
    val b = TextOps.trainQualityModelFrame(docs.repartition(7, col("doc_id")), 6)
      .collect().map(_.toSeq).toSeq
    assert(a == b, "fixed-point training must not depend on data layout")
  }

  test("ivf upsert rewrites only touched cells and replaces without duplicating") {
    import graft.operators.SimilarityOps
    val store = SimilarityOps.ivfUpsertBuild(spark, dir)
    def snapshot(): Map[String, Map[String, (Long, Long)]] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(store)
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .toSeq.groupBy { p =>
          root.relativize(p).toString.split('/').find(_.startsWith("cell=")).getOrElse("?")
        }.map { case (cell, ps) =>
          cell -> ps.map(p => p.toString ->
            (java.nio.file.Files.size(p),
              java.nio.file.Files.getLastModifiedTime(p).toMillis)).toMap
        }
    }
    val before = snapshot()
    SimilarityOps.ivfUpsertApply(spark, dir)
    val after = snapshot()
    val unchanged = before.keySet.intersect(after.keySet)
      .filter(c => before(c) == after(c))
    val changed = after.keySet -- unchanged
    assert(unchanged.nonEmpty, "every cell partition was rewritten — upsert is not partition-scoped")
    assert(changed.nonEmpty, "no cell partition changed — the incoming batch landed nowhere")
    // replace semantics: every vector present exactly once after the
    // upsert (the % 97 == 3 re-upserted ids must not duplicate)
    val stored = spark.read.parquet(store)
    assert(stored.count() == 500L && stored.select("vec_id").distinct().count() == 500L)
    // the touched-cell read must statically partition-prune: the scan's
    // partitionFilters reference `cell`, and only the named directories
    // survive file listing
    import org.apache.spark.sql.execution.FileSourceScanExec
    val probe = SimilarityOps.touchedCellRows(spark, store, Seq(1, 2))
    val scans = probe.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.exists(_.partitionFilters.exists(
        _.references.exists(_.name == "cell"))),
      s"touched-cell read does not partition-prune:\n${probe.queryExecution.executedPlan}")
  }

  test("streaming quality filter matches batch scoring row for row") {
    val docs = Tables(spark, dir, "documents")
    val (_, w, m) = TextOps.qualityTrainLoop(docs.filter(col("doc_id") % 2 === 0), 12)
    val batch = TextOps.scoreQualityRows(docs.filter(col("doc_id") % 2 === 1), w, m)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val streamed = graft.streaming.QualityFilterStream
      .qualityFilterStreamQuery(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "stream verdicts diverge from batch scoring")
  }

  test("held-out eval beats the all-keep base rate (no leakage)") {
    val r = TextOps.qualityTrainEval(spark, dir).head()
    val (n, tp, fp, tn, fn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n == tp + fp + tn + fn)
    val correct = tp + tn
    val allKeep = tp + fn // predicting 1 for everything gets the positives
    assert(correct > allKeep,
      s"held-out accuracy $correct/$n does not beat all-keep $allKeep/$n")
  }

  test("quality trainer learns: final accuracy beats the all-keep base rate") {
    val trace = TextOps.trainQualityModel(spark, dir)
      .select("iter", "n_correct").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val first = trace.head._2 // iter 0 = zero weights = all-keep prediction
    val last = trace.last._2
    assert(last > first,
      s"training did not improve accuracy: $first -> $last")
    // the hard-sigmoid GD at the tuned gain should not crater below the
    // base rate at any recorded iteration's final state
    assert(trace.last._2 >= trace.head._2)
  }
}
