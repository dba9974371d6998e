package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.DedupOps

/** Streaming form of the near-dup admission gate: incoming documents
  * arrive as micro-batches and each batch is checked against the STATIC
  * corpus index (stream-static shape — the corpus side's shingle/band
  * caches are plan-identical across batches, so Spark's cache manager
  * reuses them; at production scale the corpus index is a staged
  * artifact refreshed out-of-band as admitted docs accrete). Decisions
  * append to a parquet side channel per batch; the checkpoint advances
  * only after the batch's decisions land — the same at-least-once
  * discipline as the publishers, and re-emitted decisions are identical
  * rows (the gate is deterministic), so downstream dedups are trivial. */
object DedupGateStream {

  def run(
      corpus: DataFrame,
      incoming: DataFrame,
      outDir: String,
      checkpoint: String): StreamingQuery =
    incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        DedupOps.dedupGateFrames(corpus, batch)
          .write.mode(SaveMode.Append).parquet(outDir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
