package graft
import org.apache.spark.sql.functions._

/** Scratch dev probe for the ClaimStore fold-write shape (r18). */
object FoldWriteProbe {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toInt).getOrElse(666)
    val df = spark.range(n).select(
      ((col("id") * 3) % 2048).cast("int").as("pk"),
      md5(col("id").cast("string")).as("fp"),
      lit(1L).as("epoch"))
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = "/tmp/foldprobe"
    t("warmup")(df.limit(10).write.mode("overwrite").parquet(s"$base/warm"))
    t("A repartition(32,pk)+partitionBy")(
      df.repartition(32, col("pk")).write.mode("overwrite").partitionBy("pk").parquet(s"$base/a"))
    t("B repartition(pk)+partitionBy (AQE)")(
      df.repartition(col("pk")).write.mode("overwrite").partitionBy("pk").parquet(s"$base/b"))
    t("C repartition(8,pk)+partitionBy")(
      df.repartition(8, col("pk")).write.mode("overwrite").partitionBy("pk").parquet(s"$base/c"))
    t("D flat repartition(32), no partitionBy")(
      df.repartition(32).write.mode("overwrite").parquet(s"$base/d"))
    t("A2 repeat of A")(
      df.repartition(32, col("pk")).write.mode("overwrite").partitionBy("pk").parquet(s"$base/a2"))
    t("E sortWithinPartitions(pk)+partitionBy")(
      df.repartition(32, col("pk")).sortWithinPartitions("pk")
        .write.mode("overwrite").partitionBy("pk").parquet(s"$base/e"))
    // pruned-probe plan artifact: fold a real ClaimStore and dump the
    // single-key probe's executed plan (PartitionFilters/PushedFilters)
    locally {
      import org.apache.spark.sql.SparkSession
      val sp: SparkSession = spark
      import sp.implicits._
      val root = graft.sources.TmpStores.pidScopedRoot("graft-foldprobe")
      graft.sources.TmpStores.deleteRecursively(root)
      val st = graft.streaming.ClaimStore(root.toString, partitionCol = Some("pk"))
      val empty = Seq.empty[(Int, String, Long)].toDF("pk", "fp", "epoch")
      (0 until 9).foreach { b =>
        st.append(sp, sp.range(b * 1000L, (b + 1) * 1000L)
          .select((col("id") % 2048).cast("int").as("pk"),
            md5(col("id").cast("string")).as("fp"), lit(b.toLong).as("epoch")))
      }
      val pruned = st.readPruned(sp, empty, Seq(7))
      pruned.collect()
      args.drop(1).headOption.foreach { out =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
          pruned.queryExecution.executedPlan.toString)
        println(s"pruned-probe plan -> $out")
      }
    }
    t("F A + committer v2")(
      df.repartition(32, col("pk")).write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .partitionBy("pk").parquet(s"$base/f"))
    t("G A + snappy")(
      df.repartition(32, col("pk")).write.mode("overwrite")
        .option("compression", "snappy")
        .partitionBy("pk").parquet(s"$base/g"))
    t("F2 repeat of F")(
      df.repartition(32, col("pk")).write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .partitionBy("pk").parquet(s"$base/f2"))
    t("A3 repeat of A")(
      df.repartition(32, col("pk")).write.mode("overwrite").partitionBy("pk").parquet(s"$base/a3"))
    spark.stop()
  }
}
