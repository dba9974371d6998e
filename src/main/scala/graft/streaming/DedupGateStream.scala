package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.DedupOps

/** Streaming form of the near-dup admission gate: incoming documents
  * arrive as micro-batches and each batch is checked against the STATIC
  * corpus index, built, banded and persisted ONCE before the stream
  * starts and reused by every micro-batch (at production scale the
  * corpus index is a staged artifact refreshed out-of-band as admitted
  * docs accrete). The incoming side's shingle cache and the verdict
  * frame are scoped to their batch and unpersisted once the batch's
  * decisions land, so cache usage is flat across an unbounded stream.
  * Decisions append to a parquet side channel per batch; the checkpoint
  * advances only after the batch's decisions land — the same
  * at-least-once discipline as the publishers, and re-emitted decisions
  * are identical rows (the gate is deterministic), so downstream dedups
  * are trivial. */
object DedupGateStream {

  private def emptySh(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Int, Long, Seq[String], Long)]
      .toDF("dbucket", "doc_id", "sh", "epoch")
  }
  private def emptyBands(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Int, Long, Int, Long, Long)]
      .toDF("bucket", "doc_id", "band", "band_hash", "epoch")
  }

  /** RETENTION for the accreted text index — the epoch-stamped
    * [[ClaimStore.retentionSweep]] discipline on BOTH stores (band rows
    * and shingle sets age together: a doc whose claims aged out
    * re-admits whole). Run between stream runs. Returns (band rows,
    * shingle rows) dropped. */
  def sweepClaims(spark: SparkSession, outDir: String, minEpoch: Long,
      maxDropFrac: Double): (Long, Long) = (
    ClaimStore(s"${outDir}_bands", partitionCol = Some("bucket"))
      .retentionSweep(spark, emptyBands(spark), minEpoch, maxDropFrac),
    ClaimStore(s"${outDir}_index", partitionCol = Some("dbucket"))
      .retentionSweep(spark, emptySh(spark), minEpoch, maxDropFrac))

  /** The band and shingle-index stores as [[Maintenance.Action]]s — see
    * [[Maintenance.run]] and [[CurationStream.maintenanceActions]]. */
  def maintenanceActions(spark: SparkSession, outDir: String, minEpoch: Long,
      maxDropFrac: Double): Seq[Maintenance.Action] = Seq(
    Maintenance.Action(s"${outDir}_bands", "retention+compact", () =>
      Maintenance.sweepAndCompact(spark,
        ClaimStore(s"${outDir}_bands", partitionCol = Some("bucket")),
        emptyBands(spark), minEpoch, maxDropFrac)),
    Maintenance.Action(s"${outDir}_index", "retention+compact", () =>
      Maintenance.sweepAndCompact(spark,
        ClaimStore(s"${outDir}_index", partitionCol = Some("dbucket")),
        emptySh(spark), minEpoch, maxDropFrac)))

  /** Probe-key bucket of a MinHash band hash: its low 8 bits (splitmix64
    * output — uniform), 256 possible values, so a batch's touched set is
    * a bounded driver collect whatever the batch size. */
  private def bucketOf(bandHash: org.apache.spark.sql.Column) =
    bandHash.bitwiseAND(255).cast("int")

  /** Verify-side bucket of an admitted doc id — 64 possible values. */
  private def dbucketOf(docId: org.apache.spark.sql.Column) =
    pmod(docId, lit(64L)).cast("int")

  /** `accrete = true` folds each batch's ADMITTED documents into the
    * corpus index before the next batch — the production admission-gate
    * semantics: once a novel document enters the corpus, later
    * duplicates of it are rejected, even across micro-batches AND across
    * restarts. The accreted index is TWO generational [[ClaimStore]]s,
    * both laid out on their probe key so a batch never rescans the whole
    * store:
    *
    *  - `<outDir>_bands` — admitted docs' MinHash band rows, partitioned
    *    by the band hash's low byte: candidate generation reads only the
    *    ≤ 256 buckets the batch's own band hashes touch;
    *  - `<outDir>_index` — admitted docs' shingle sets, partitioned by
    *    doc-id bucket: the exact-Jaccard verify fetches sh ONLY for the
    *    ≤ 64 id buckets the surviving candidates name.
    *
    * Claims land one delta file per batch BEFORE the checkpoint commits
    * and fold into a partitioned generation at the file budget (the
    * shared ClaimStore swap discipline), so the store's file count is
    * bounded and a resumed stream keeps rejecting duplicates of
    * everything it ever admitted. Redelivered batches re-append
    * identical rows; the pruned reads dedup per doc_id, so at-least-once
    * delivery cannot double-count a corpus doc in later verdicts. */
  def run(
      corpus: DataFrame,
      incoming: DataFrame,
      outDir: String,
      checkpoint: String,
      accrete: Boolean = false,
      maxBandFreq: Option[Long] = None,
      epochBase: Long = 0L): StreamingQuery = {
    val spark = corpus.sparkSession
    val spark0 = spark
    import spark0.implicits._
    val shStore = ClaimStore(s"${outDir}_index", partitionCol = Some("dbucket"))
    val bandStore = ClaimStore(s"${outDir}_bands", partitionCol = Some("bucket"))
    // base index: shingles AND band rows persist for the stream's
    // lifetime — band hashes of the static corpus are computed once, not
    // once per micro-batch
    val base = DedupOps.gateShingles(corpus)
    val baseBands = DedupOps.bandRows(base)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    baseBands.count()
    val query = incoming.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val iSh = DedupOps.gateShingles(batch)
        val iBands = DedupOps.bandRows(iSh)
        // candidate generation: the batch's bands against the cached base
        // plus the accreted store PRUNED to the buckets this batch probes
        val touched = iBands.select(bucketOf(col("band_hash")).as("bucket"))
          .distinct().as[Int].collect().toSeq
        val storeBands = bandStore
          .readPruned(spark, emptyBands(spark), touched)
          .select("doc_id", "band", "band_hash")
        val cand = DedupOps
          .gateCandidates(iBands, baseBands.union(storeBands), maxBandFreq)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // verify fetch: sh only for the id buckets the candidates name
          // (redelivered store rows are identical — dedup the pruned read).
          // This collect IS the candidate pass's cache fill (it consumes
          // every cand partition) — a separate count() paid one whole
          // extra job per batch
          val touchedIds = cand.select(dbucketOf(col("corpus_id")).as("d"))
            .distinct().as[Int].collect().toSeq
          val storeSh = shStore.readPruned(spark, emptySh(spark), touchedIds)
            .dropDuplicates("doc_id")
            .select(col("doc_id").as("corpus_id"), col("sh").as("sh_c"))
          val cShById = base
            .select(col("doc_id").as("corpus_id"), col("sh").as("sh_c"))
            .union(storeSh)
          val verdict = DedupOps.gateVerdicts(cand, iSh, cShById, batch)
          try {
            verdict.write.mode(SaveMode.Append).parquet(outDir)
            if (accrete) {
              val admitted = verdict.filter(col("decision") === "admit")
                .select("doc_id")
              // retention stamp: epochBase is caller-threaded monotone
              // (restarted streams restart batch ids at 0 — see
              // MediaDedupStream)
              val shClaims = iSh.join(admitted, Seq("doc_id"))
                .select(dbucketOf(col("doc_id")).as("dbucket"),
                  col("doc_id"), col("sh"),
                  lit(epochBase + batchId).as("epoch"))
              val bandClaims = iBands.join(admitted, Seq("doc_id"))
                .select(bucketOf(col("band_hash")).as("bucket"),
                  col("doc_id"), col("band"), col("band_hash"),
                  lit(epochBase + batchId).as("epoch"))
              // BOTH delta writes land before EITHER store folds: a fold
              // deletes its consumed delta files, and the second write's
              // lineage re-reads this batch's store scan when Spark
              // recomputes instead of hitting the verdict cache (observed
              // under foreachBatch) — write-all-then-fold-all keeps every
              // recomputation on files that still exist
              shStore.appendDelta(shClaims)
              bandStore.appendDelta(bandClaims)
              shStore.maybeCompact(spark, shClaims.limit(0))
              bandStore.maybeCompact(spark, bandClaims.limit(0))
              ()
            }
          } finally verdict.unpersist()
        } finally {
          cand.unpersist()
          iSh.unpersist()
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    // release the corpus index when the stream ends (daemon watcher —
    // run() hands the live query back to the caller, so the index's
    // lifetime is tied to the query's, not to this call)
    val watcher = new Thread(() => {
      try query.awaitTermination()
      catch { case _: Throwable => () }
      finally { baseBands.unpersist(); base.unpersist() }
    })
    watcher.setDaemon(true)
    watcher.start()
    query
  }

  /** Decision readback under the shared at-least-once contract
    * ([[StreamVerdicts]]): a doc admits if ANY delivery admitted it (its
    * own shingles in the accreted index prove the admission — a replay
    * after the claim landed self-matches and re-emits reject), and the
    * match stats come from the pre-claim delivery (minimum n_matches —
    * the index only grows, so the original match set is a subset of any
    * replay's). */
  def readDecisions(spark: SparkSession, outDir: String): DataFrame =
    StreamVerdicts.resolvePerDoc(
      spark.read.parquet(outDir)
        .withColumn("admitted", col("decision") === "admit"),
      anyTrue = Seq("admitted"),
      preClaim = Seq("n_matches", "best_match", "best_jaccard"))
      .select(col("doc_id"),
        when(col("admitted"), "admit").otherwise("reject").as("decision"),
        col("n_matches"), col("best_match"), col("best_jaccard"))
}
