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
    * duplicates of it are rejected, even across micro-batches. The
    * accreted index is persisted and materialized per batch while the
    * previous generation is still cached, then the old generation is
    * released — cache usage stays one-index-sized (plus the batch). At
    * cluster scale the same fold is a staged parquet append and the
    * index rebuild is out-of-band; the per-batch shape (batch bands ⋈
    * index bands, never batch × corpus) is identical. */
  def run(
      corpus: DataFrame,
      incoming: DataFrame,
      outDir: String,
      checkpoint: String,
      accrete: Boolean = false): StreamingQuery = {
    val index = new java.util.concurrent.atomic.AtomicReference(
      DedupOps.gateShingles(corpus))
    val query = incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cSh = index.get()
        val iSh = DedupOps.gateShingles(batch)
        val verdict = DedupOps.dedupGateScored(cSh, iSh, batch)
        try {
          verdict.write.mode(SaveMode.Append).parquet(outDir)
          if (accrete) {
            val admitted = verdict
              .filter(org.apache.spark.sql.functions.col("decision") === "admit")
              .select("doc_id")
            val next = cSh.union(iSh.join(admitted, Seq("doc_id")))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            next.count() // materialize while cSh and iSh are still cached
            cSh.unpersist()
            index.set(next)
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
      finally index.get().unpersist()
    })
    watcher.setDaemon(true)
    watcher.start()
    query
  }
}
