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

  def run(
      corpus: DataFrame,
      incoming: DataFrame,
      outDir: String,
      checkpoint: String): StreamingQuery = {
    val corpusIndex = DedupOps.gateShingles(corpus)
    val query = incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val verdict = DedupOps.dedupGateOnIndex(corpusIndex, batch)
        try verdict.write.mode(SaveMode.Append).parquet(outDir)
        finally verdict.unpersist()
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
      finally corpusIndex.unpersist()
    })
    watcher.setDaemon(true)
    watcher.start()
    query
  }
}
