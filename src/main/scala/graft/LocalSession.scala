package graft

import org.apache.spark.sql.SparkSession

/** The one local-session recipe shared by the harness mains
  * (Verify/Bench/Probe), so a conf change cannot silently leave the
  * tools measuring different configurations. */
object LocalSession {
  def apply(cpus: String): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.nanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      // AQE sizes post-shuffle partitions by bytes; at bench/verify SF
      // the shuffles are byte-small but compute-heavy, so keep it from
      // coalescing below real parallelism
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16kb")
      // above this many paths, partition discovery runs as a SPARK JOB
      // with one task per directory — on the probe-key-partitioned claim
      // stores (≤2048 pk= dirs) that is a ~1100-task, multi-second
      // listing job on EVERY per-batch store read, vs microsecond-class
      // driver-side listing on a local filesystem. Local default lists
      // serially; override via spark.sql.sources.parallelPartitionDiscovery.threshold
      // on deployments whose store sits on an object store / HDFS where
      // per-prefix listing latency makes the parallel job win.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_PAR_DISCOVERY_THRESHOLD", "8192"))
      .getOrCreate()

  /** JVM/codegen warm-up touching the machinery the queries lean on:
    * whole-stage codegen, the parquet reader, the typed-encoder /
    * object-hash-agg path, and the JSON parse/format path. */
  def warmup(spark: SparkSession, sfDir: String): Unit = {
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    graft.sources.Tables(spark, sfDir, "region").count()
    locally {
      import spark.implicits._
      spark.range(0, 1000).as[Long]
        .flatMap(i => Seq((i, Map("k" -> i.toString))))
        .toDF("id", "m").dropDuplicates("id")
        .groupBy("id").count().count()
    }
    spark.range(0, 10000)
      .selectExpr("id % 100 as k", "named_struct('id', id, 'status', cast(id as string)) as s")
      .groupBy("k")
      .agg(org.apache.spark.sql.functions.expr(
        "to_json(struct(sort_array(collect_list(s)) as orders))").as("p"))
      .selectExpr("k", "from_json(p, 'STRUCT<orders: ARRAY<STRUCT<id: BIGINT, status: STRING>>>') as o")
      .selectExpr("k", "explode(o.orders) as e").orderBy("k").count()
  }
}
