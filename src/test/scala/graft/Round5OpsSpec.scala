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
