package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Publish
import java.nio.file.{Files, Paths}

/** Continuous metadata publishing: a streaming source MERGE-upserted into
  * a versioned snapshot per micro-batch — the reference's canonical loop
  * (Kafka extract → stage → Neo4jCsvPublisher MERGE → offset commit on
  * success, kafka_source_extractor.py:116-130 + neo4j_csv_publisher.py)
  * as one Structured Streaming query.
  *
  * Semantics carried over:
  *  - within-batch last-write-wins before the merge (the reference
  *    applies MERGEs in file order; Publish.lastWriteWins);
  *  - MERGE upsert with publish-tag + epoch stamping for touched rows
  *    (Publish.mergeUpsert), untouched rows RETAINING their previous
  *    stamp — the reference never clears a row's tag, it only re-stamps
  *    what the batch touched;
  *  - each batch lands a fresh `gen=<batchId>` snapshot then atomically
  *    repoints CURRENT — the publisher's single-logical-commit;
  *  - the checkpoint advances only after the batch function returns, so
  *    a failed publish is redelivered (at-least-once) and re-merging the
  *    same batch is idempotent — exactly the offset-commit-on-success
  *    Callback contract.
  *
  * Scale: state lives in the snapshot files, not executor memory; each
  * batch is one full-outer merge shuffle on the key — the same shape a
  * nightly batch publish would run, just continuous.
  */
object StreamPublish {

  private def currentSnapshot(spark: SparkSession, baseDir: String,
      keyCol: String, attrCols: Seq[String]): DataFrame = {
    graft.sources.Stage.currentTarget(baseDir) match {
      case Some(target) => spark.read.parquet(target)
      case None =>
        // first batch: empty snapshot with the full schema
        val schema = org.apache.spark.sql.types.StructType(
        (keyCol +: attrCols).map(c =>
          org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)) :+
          org.apache.spark.sql.types.StructField("published_tag",
            org.apache.spark.sql.types.StringType) :+
          org.apache.spark.sql.types.StructField("publisher_last_updated_epoch_ms",
            org.apache.spark.sql.types.LongType))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    }
  }

  /** Best-effort recursive delete for the harness temp staging dirs. */
  private def deleteRecursively(path: java.nio.file.Path): Unit =
    if (Files.exists(path)) {
      import scala.jdk.CollectionConverters._
      Files.walk(path).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => try Files.delete(p) catch { case _: Exception => () })
    }

  /** One micro-batch publish step (exposed for specs): LWW → MERGE →
    * stamp retention → versioned write → atomic CURRENT swap. */
  def publishBatch(
      batch: DataFrame,
      batchId: Long,
      baseDir: String,
      keyCol: String,
      attrCols: Seq[String],
      orderCols: Seq[Column],
      tagPrefix: String): Unit = {
    val spark = batch.sparkSession
    val target = s"$baseDir/gen=$batchId"
    // Redelivery guard: a crash AFTER the CURRENT swap but BEFORE the
    // checkpoint commit redelivers this batch with CURRENT already
    // pointing at gen=<batchId> — re-merging would read `prior` from the
    // very directory the overwrite is about to clobber (Spark refuses:
    // "cannot overwrite a path that is also being read from"), wedging
    // every retry. The batch's effect is already durable, so skip.
    if (graft.sources.Stage.currentTarget(baseDir).contains(target)) return
    val prior = currentSnapshot(spark, baseDir, keyCol, attrCols)
    val incoming = Publish.lastWriteWins(
      batch.select((keyCol +: attrCols).map(col) ++ orderCols: _*), keyCol, orderCols)
      .select((keyCol +: attrCols).map(col): _*)
    val tag = s"$tagPrefix$batchId"
    val merged = Publish.mergeUpsert(prior, incoming, keyCol, attrCols, tag,
      epochMs = batchId)
    // stamp retention: mergeUpsert blanks the tag of rows the batch did
    // not touch; re-join the prior stamps so untouched rows keep theirs
    val prev = prior.select(col(keyCol),
      col("published_tag").as("_pt"), col("publisher_last_updated_epoch_ms").as("_pe"))
    val retained = merged.join(prev, Seq(keyCol), "left")
      .select(
        (keyCol +: attrCols).map(col) :+
          when(col("published_tag") =!= "", col("published_tag"))
            .otherwise(coalesce(col("_pt"), lit(""))).as("published_tag") :+
          when(col("published_tag") =!= "", col("publisher_last_updated_epoch_ms"))
            .otherwise(coalesce(col("_pe"), lit(0L)))
            .as("publisher_last_updated_epoch_ms"): _*)
    retained.write.mode(SaveMode.Overwrite).parquet(target)
    graft.sources.Stage.atomicRepoint(baseDir, target)
  }

  /** The continuous publisher. `orderCols` define within-batch LWW order;
    * tags are `tagPrefix<batchId>` and epochs the batch id, so reruns are
    * deterministic and specs can assert exact stamps. */
  def publishStream(
      events: DataFrame,
      baseDir: String,
      checkpoint: String,
      keyCol: String,
      attrCols: Seq[String],
      orderCols: Seq[Column],
      tagPrefix: String = "batch_"): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishBatch(batch, batchId, baseDir, keyCol, attrCols, orderCols, tagPrefix)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  def readCurrent(spark: SparkSession, baseDir: String): DataFrame =
    spark.read.parquet(graft.sources.Stage.currentTarget(baseDir)
      .getOrElse(throw new IllegalStateException(s"no CURRENT in $baseDir")))

  /** Oracle-gated query: stage the events table as two DISJOINT-keyed
    * files (user cohorts), stream them through the continuous publisher
    * one file per micro-batch, and read the folded snapshot back.
    * Because the cohorts are key-disjoint, the fold equals the global
    * per-user last-write-wins regardless of which file becomes batch 0 —
    * so the result is deterministic and SQL-expressible even though
    * FileStreamSource's batch order is not. */
  def streamPublishFoldQuery(spark: SparkSession, dir: String): DataFrame = {
    // per-process fixed dirs, wiped per run: repeated bench/verify passes
    // reuse the same paths instead of leaking an events-table-sized copy
    // per invocation; the pid suffix isolates concurrent graft JVMs
    val root = Paths.get(sys.props("java.io.tmpdir"),
      s"graft-spq-${ProcessHandle.current().pid()}")
    deleteRecursively(root)
    Files.createDirectories(root)
    val in = root.resolve("in").toString
    val base = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    val ev = graft.sources.Tables(spark, dir, "events")
      .select(col("user_id").cast("string").as("key"),
        col("event_type"),
        col("event_id").cast("string").as("eid"),
        col("ts"), col("event_id"), col("user_id"))
    ev.filter(col("user_id") % 3 === 0).drop("user_id")
      .coalesce(1).write.mode(SaveMode.Append).parquet(in)
    ev.filter(col("user_id") % 3 =!= 0).drop("user_id")
      .coalesce(1).write.mode(SaveMode.Append).parquet(in)
    val src = spark.readStream.schema(ev.drop("user_id").schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = publishStream(src, base, ckpt, "key", Seq("event_type", "eid"),
      Seq(col("ts"), col("event_id")), "fold_")
    q.awaitTermination()
    readCurrent(spark, base)
      .select(col("key"), col("event_type"), col("eid"))
      .orderBy("key")
  }
}
