package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Publish
import java.nio.file.{Files, Paths, StandardOpenOption}

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
    val marker = Paths.get(baseDir, "CURRENT")
    if (Files.exists(marker))
      spark.read.parquet(Files.readString(marker).trim)
    else {
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
    val target = s"$baseDir/gen=$batchId"
    retained.write.mode(SaveMode.Overwrite).parquet(target)
    val tmp = Paths.get(baseDir, "CURRENT.tmp")
    Files.writeString(tmp, target, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(baseDir, "CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
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
    spark.read.parquet(
      Files.readString(Paths.get(baseDir, "CURRENT")).trim)

  /** Oracle-gated query: stage the events table as two DISJOINT-keyed
    * files (user cohorts), stream them through the continuous publisher
    * one file per micro-batch, and read the folded snapshot back.
    * Because the cohorts are key-disjoint, the fold equals the global
    * per-user last-write-wins regardless of which file becomes batch 0 —
    * so the result is deterministic and SQL-expressible even though
    * FileStreamSource's batch order is not. */
  def streamPublishFoldQuery(spark: SparkSession, dir: String): DataFrame = {
    val in = Files.createTempDirectory("graft-spq-in").toString
    val base = Files.createTempDirectory("graft-spq-out").toString
    val ckpt = Files.createTempDirectory("graft-spq-ckpt").toString
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
