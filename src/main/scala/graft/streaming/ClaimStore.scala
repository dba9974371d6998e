package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

object ClaimStore {
  /** Fold a store into one generation once its delta dir holds this many
    * files — the bound on every claim store's live file count. */
  val CompactDeltaFiles = 8
}

/** The ONE at-least-once verdict READ CONTRACT shared by every streaming
  * gate ([[CurationStream]], [[MediaDedupStream]], [[DedupGateStream]]):
  * verdicts append before claims, claims before the checkpoint, so the
  * only corrupted delivery is a batch replayed AFTER its claims landed —
  * the replay sees its own winners as already claimed and re-emits them
  * as duplicates with inflated match stats. Per doc, therefore:
  *
  *  - `anyTrue` (admitted-class booleans): TRUE if ANY delivery said so —
  *    a doc's own claim in the store proves its admission, and quality /
  *    contamination verdicts re-derive identically on every delivery;
  *  - `everyTrue` (duplicate-class booleans): TRUE only if EVERY delivery
  *    said so — only a replay can spuriously flag a winner duplicated;
  *  - `preClaim` (match stats): the values of the delivery MINIMIZING the
  *    column tuple, resolved TOGETHER — the claim set only grows, so the
  *    original delivery's match set is a subset of any replay's; the
  *    smaller count is the pre-claim verdict and equal counts imply the
  *    identical set. (Resolving each stat independently, or with max(),
  *    would stitch values from different deliveries.)
  *  - `carried`: delivery-invariant passthroughs (any delivery's value).
  */
private[streaming] object StreamVerdicts {
  def resolvePerDoc(
      verdicts: DataFrame,
      anyTrue: Seq[String] = Nil,
      everyTrue: Seq[String] = Nil,
      preClaim: Seq[String] = Nil,
      carried: Seq[String] = Nil,
      key: String = "doc_id"): DataFrame = {
    val aggs =
      carried.map(c => min(col(c)).as(c)) ++
        anyTrue.map(c => max(col(c)).as(c)) ++
        everyTrue.map(c => min(col(c)).as(c)) ++
        (if (preClaim.isEmpty) Nil
         else Seq(min(struct(preClaim.map(col): _*)).as("_pre")))
    val grouped = verdicts.groupBy(key).agg(aggs.head, aggs.tail: _*)
    val out = preClaim.foldLeft(grouped)((df, c) =>
      df.withColumn(c, col(s"_pre.$c")))
    (if (preClaim.isEmpty) out else out.drop("_pre")).orderBy(key)
  }
}

/** The ONE generational side-store discipline shared by every streaming
  * gate — [[CurationStream]]'s exact-md5 claim classes,
  * [[MediaDedupStream]]'s perceptual fingerprints, and
  * [[DedupGateStream]]'s admitted shingle index all accrete through this
  * type, so a long-running stream can never regrow the
  * one-file-per-batch-forever / O(store)-shuffle-per-batch shape.
  *
  * Layout and lifecycle (the StreamPublish manifest-swap discipline):
  *
  *  - each batch's claims land as ONE parquet delta file
  *    (`<dir>/delta/part-*.parquet`) BEFORE the stream checkpoint
  *    commits — at-least-once, so a replayed batch re-appends identical
  *    rows;
  *  - once the delta dir exceeds [[ClaimStore.CompactDeltaFiles]] files,
  *    the whole set folds into one fresh `gen=N` base committed by an
  *    atomic CURRENT swap; dead generations and consumed deltas are
  *    dropped only AFTER the swap, so a reader resolving CURRENT first
  *    never loses a reachable byte, and a crash anywhere mid-compaction
  *    leaves at worst duplicate rows;
  *  - claims are a MONOTONE SET: duplicates are always row-identical, so
  *    the fold's `distinct()` and the callers' read-side resolution
  *    (distinct / pair-level dedup / per-key aggregation) absorb every
  *    single-crash schedule.
  *
  * `partitionCol` lays the compacted base out on the PROBE KEY
  * (`gen=N/<col>=v/...`) so a batch's [[readPruned]] partition-prunes to
  * the key values the batch actually touches instead of scanning the
  * whole store — the staged-IVF cell-pruned layout applied to claim
  * stores. Delta files keep the key as a plain column (they are at most
  * the file budget of batch-sized files, read with the filter pushed
  * down); the fold rewrites them into the pruned layout. Reference
  * analog: the publisher commits one transaction per batch and the
  * staleness sweep bounds what any later pass must rescan
  * (amundsendatabuilder publisher/neo4j_csv_publisher.py:412-447).
  *
  * The compaction fold itself reads the full store — O(store) once per
  * budget-many batches, the amortized cost every LSM-shaped store pays;
  * per-BATCH work never scans more than the pruned keys + the delta
  * budget. */
final case class ClaimStore(dir: String, partitionCol: Option[String] = None) {
  import ClaimStore.CompactDeltaFiles

  private[streaming] def deltaFiles: Seq[java.nio.file.Path] = {
    val d = java.nio.file.Paths.get(dir, "delta")
    if (!java.nio.file.Files.isDirectory(d)) Seq.empty
    else {
      val s = java.nio.file.Files.list(d)
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      finally s.close()
    }
  }

  /** Committed base generation (CURRENT, if any fold has run) ++ delta
    * files, columns normalized to `empty`'s order (the base read returns
    * `partitionCol` as a trailing partition column). Raw rows: crash
    * duplicates survive; the caller's read semantics absorb them. */
  def read(spark: SparkSession, empty: DataFrame): DataFrame =
    readWhere(spark, empty, None)

  /** [[read]] restricted to the probe keys this batch touches: the base
    * generation's scan PARTITION-PRUNES to the matching `gen=N/<col>=v`
    * directories (the filter lands in the scan's PartitionFilters), and
    * the delta files — at most the file budget of them — take the same
    * filter as an ordinary pushed predicate. */
  def readPruned(spark: SparkSession, empty: DataFrame, keys: Seq[Int]): DataFrame = {
    val pc = partitionCol.getOrElse(
      throw new IllegalStateException(s"claim store $dir has no probe-key layout"))
    readWhere(spark, empty, Some(col(pc).isin(keys.map(Integer.valueOf): _*)))
  }

  /** A generation folded from ALL-EMPTY claims writes no part files at
    * all under the partitioned layout (dynamic partition dirs exist per
    * row) — reading such a directory would fail schema inference, so an
    * empty generation reads as the empty set it is. */
  private def hasParquet(p: String): Boolean = {
    val path = java.nio.file.Paths.get(p)
    java.nio.file.Files.isDirectory(path) && {
      val w = java.nio.file.Files.walk(path)
      try w.anyMatch(f => f.getFileName.toString.endsWith(".parquet"))
      finally w.close()
    }
  }

  private def readWhere(spark: SparkSession, empty: DataFrame,
      pred: Option[org.apache.spark.sql.Column]): DataFrame = {
    val sel = empty.columns.toSeq.map(col)
    def part(paths: Seq[String]): Option[DataFrame] =
      if (paths.isEmpty) None
      else {
        val df = spark.read.parquet(paths: _*)
        Some(pred.fold(df)(df.filter).select(sel: _*))
      }
    val parts =
      part(graft.sources.Stage.currentTarget(dir).toSeq.filter(hasParquet)).toSeq ++
        part(deltaFiles.map(_.toString)).toSeq
    if (parts.isEmpty) pred.fold(empty)(empty.filter)
    else parts.reduce(_ union _)
  }

  /** Land one batch's claims as a single delta file; fold the store into
    * a fresh generation once the delta budget is crossed. Call BEFORE the
    * stream checkpoint commits — the at-least-once claim discipline.
    *
    * A gate appending to SEVERAL stores in one batch must use
    * [[appendDelta]] for every store first and [[maybeCompact]] only
    * after the last write: a compaction deletes the consumed delta
    * files, and a later write whose lineage re-reads this batch's store
    * scan (Spark recomputes lazily; a cache hit is not guaranteed under
    * foreachBatch) would resolve vanished paths — observed as
    * FAILED_READ_FILE on the second store's append. With every write
    * done before the first fold, recomputation only ever sees files
    * that still exist. */
  def append(spark: SparkSession, claims: DataFrame): Unit = {
    appendDelta(claims)
    maybeCompact(spark, claims.limit(0))
  }

  /** The write half of [[append]]: one delta file, no fold. */
  def appendDelta(claims: DataFrame): Unit =
    claims.coalesce(1).write.mode(SaveMode.Append).parquet(s"$dir/delta")

  /** The fold half of [[append]]: compact once the budget is crossed.
    * Safe only after every frame that reads this store's pre-fold files
    * has been written or materialized (see [[append]]). */
  def maybeCompact(spark: SparkSession, empty: DataFrame): Unit =
    if (deltaFiles.size >= CompactDeltaFiles) compact(spark, empty)

  /** Fold base + deltas into one fresh `gen=N` (laid out on
    * `partitionCol` when set), atomically swap CURRENT at it, then drop
    * dead generations and consumed deltas. Run between batches — the
    * foreachBatch loop is single-threaded, so no append races the fold;
    * a crash at any point loses nothing (claims are a monotone set and
    * every pre-swap byte stays where a restarted reader finds it). */
  def compact(spark: SparkSession, empty: DataFrame): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) return
    def listGens(): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.list(root)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("gen=")).toList
      finally s.close()
    }
    val next = s"$dir/gen=${(listGens().map(
      _.getFileName.toString.stripPrefix("gen=").toLong) :+ -1L).max + 1}"
    val consumed = deltaFiles
    val folded = read(spark, empty).distinct()
    partitionCol match {
      case Some(pc) =>
        // one shuffle keyed on the probe key → at most one file per
        // gen=N/<pc>=v directory, the pruned serving layout
        folded.repartition(col(pc)).write.partitionBy(pc).parquet(next)
      case None =>
        folded.repartition(spark.sparkContext.defaultParallelism)
          .write.parquet(next)
    }
    graft.sources.Stage.atomicRepoint(dir, next)
    // cleanup AFTER the swap: readers resolve CURRENT first, so nothing
    // they can reach disappears under them
    listGens().filter(_.toString != next)
      .foreach(graft.sources.TmpStores.deleteRecursively)
    // delete consumed deltas through the Hadoop (Checksum)FileSystem so
    // each part file's '.part-*.parquet.crc' sidecar goes with it — a
    // bare nio delete leaves the sidecars accreting in the delta dir,
    // the very unbounded-small-file growth this fold bounds
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create("file:///"), spark.sparkContext.hadoopConfiguration)
    (consumed :+ java.nio.file.Paths.get(dir, "delta", "_SUCCESS"))
      .foreach(p =>
        try fs.delete(new org.apache.hadoop.fs.Path(p.toUri), false)
        catch { case _: Exception => () })
  }
}
