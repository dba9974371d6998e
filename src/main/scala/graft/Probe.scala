package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
/** Dev tool: stage-level timing for named SparkEntry queries.
  * `sbt "runMain graft.Probe q_table_search_doc"` — wall time plus each
  * completed stage's duration/task count, to separate executor work from
  * driver planning/codegen when hunting bench regressions. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.sources.Tables.nanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      // AQE sizes post-shuffle partitions by bytes; at bench/verify SF the
      // shuffles are byte-small but compute-heavy, so keep it from
      // coalescing below real parallelism
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16kb")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    graft.sources.Tables(spark, sfDir, "region").count()
    spark.range(0, 10000)
      .selectExpr("id % 100 as k", "named_struct('id', id, 'status', cast(id as string)) as s")
      .groupBy("k").agg(org.apache.spark.sql.functions.expr("to_json(struct(sort_array(collect_list(s)) as orders))").as("p"))
      .selectExpr("k", "from_json(p, 'STRUCT<orders: ARRAY<STRUCT<id: BIGINT, status: STRING>>>') as o")
      .selectExpr("k", "explode(o.orders) as e").orderBy("k").count()
    @volatile var stages = List.empty[(Int, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages ::= ((si.stageId,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks))
      }
    })
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"PROBE $name: unknown query")
        case Some(fn) =>
          stages = Nil
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // let listener events drain
          val exec = stages.map(_._2).sum / 1000.0
          println(f"PROBE $name%-28s $wall%8.2f s wall, $exec%6.2f s stage-sum, rows=$n")
          stages.reverse.foreach { case (id, dur, nt) =>
            if (dur >= 200)
              println(f"  STAGE $id%4d ${dur / 1000.0}%7.2f s tasks=$nt")
          }
      }
    }
    spark.stop()
  }
}
