package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.DedupOps

/** Streaming form of the near-dup admission gate: incoming documents
  * arrive as micro-batches and each batch is checked against the STATIC
  * corpus index, built and persisted ONCE before the stream starts and
  * reused by every micro-batch (at production scale the corpus index is
  * a staged artifact refreshed out-of-band as admitted docs accrete).
  * The incoming side's shingle cache and the verdict frame are scoped to
  * their batch and unpersisted once the batch's decisions land, so cache
  * usage is flat across an unbounded stream. Decisions append to a
  * parquet side channel per batch; the checkpoint advances only after
  * the batch's decisions land — the same at-least-once discipline as the
  * publishers, and re-emitted decisions are identical rows (the gate is
  * deterministic), so downstream dedups are trivial. */
object DedupGateStream {

  /** `accrete = true` folds each batch's ADMITTED documents into the
    * corpus index before the next batch — the production admission-gate
    * semantics: once a novel document enters the corpus, later
    * duplicates of it are rejected, even across micro-batches AND across
    * restarts: admitted shingles append to a parquet side store
    * (`<outDir>_index`) before the checkpoint commits, and run() folds
    * that store back in on start, so a resumed stream keeps rejecting
    * duplicates of everything it ever admitted. The index is always
    * cached-base-corpus ∪ one parquet scan of the side store — constant
    * lineage depth and one corpus-sized cache however long the stream
    * runs (never a union-of-unions chain). Redelivered batches re-append
    * identical rows; the read side dedups on doc_id, so at-least-once
    * delivery cannot double-count a corpus doc in later verdicts. */
  def run(
      corpus: DataFrame,
      incoming: DataFrame,
      outDir: String,
      checkpoint: String,
      accrete: Boolean = false): StreamingQuery = {
    import org.apache.spark.sql.functions.col
    val spark = corpus.sparkSession
    val indexDir = s"${outDir}_index"
    val base = DedupOps.gateShingles(corpus)
    // base stays cached for the stream's lifetime; the accreted side is
    // |admitted docs|-sized, so it rides as a plain parquet scan under
    // the union instead of a second corpus-sized cache
    def currentIndex(): DataFrame =
      if (!accrete ||
          !java.nio.file.Files.exists(java.nio.file.Paths.get(indexDir))) base
      else base.union(spark.read.parquet(indexDir).dropDuplicates("doc_id"))
    val index = new java.util.concurrent.atomic.AtomicReference(currentIndex())
    val query = incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val iSh = DedupOps.gateShingles(batch)
        val verdict = DedupOps.dedupGateScored(index.get(), iSh, batch)
        try {
          verdict.write.mode(SaveMode.Append).parquet(outDir)
          if (accrete) {
            val admitted = verdict.filter(col("decision") === "admit")
              .select("doc_id")
            iSh.join(admitted, Seq("doc_id"))
              .write.mode(SaveMode.Append).parquet(indexDir)
            index.set(currentIndex())
          }
        } finally {
          verdict.unpersist()
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
      finally base.unpersist()
    })
    watcher.setDaemon(true)
    watcher.start()
    query
  }
}
