package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ONE guardrailed maintenance entry point for a composed pipeline's
  * deployed stores — the operational pass a 100 TB deployment schedules
  * nightly. The gates expose their store maintenance piecemeal
  * ([[CurationStream.sweepClaims]] over three stores,
  * [[CurationStream.sweepFunnel]], [[EmbedDedupStream.sweepClaims]],
  * [[MediaDedupStream.sweepClaims]], [[DedupGateStream.sweepClaims]],
  * plus per-store compaction); `Maintenance.run` executes a pipeline's
  * whole action list with PER-STORE guardrail isolation:
  *
  *  - each action is one store's retention sweep followed by its
  *    budget-gated compaction fold (the sweep is itself a major fold
  *    when anything expires; the compaction only fires when the delta
  *    budget is crossed, so a quiet store costs two directory listings);
  *  - a tripped guardrail ([[ClaimStore.retentionSweep]]'s
  *    drop-fraction abort — an `IllegalStateException`) ABORTS THAT
  *    STORE ONLY, is reported in the outcome, and every other store's
  *    maintenance still runs — a mis-set horizon on one store must not
  *    leave the rest of the fleet unswept;
  *  - any OTHER exception propagates: an I/O failure is a real failure,
  *    not a policy abort, and must fail the scheduled job loudly.
  *
  * Reference analog: the staleness-removal tasks run as their own
  * scheduled jobs with per-type guardrails
  * (neo4j_staleness_removal_task.py:45's 5 % abort threshold); this is
  * that discipline over every claim/funnel store a streaming pipeline
  * deploys. */
object Maintenance {

  /** One store's maintenance step: `run()` returns the rows dropped. */
  final case class Action(store: String, kind: String, run: () => Long)

  /** What happened to one action: rows dropped, or the guardrail
    * message that aborted it (other stores unaffected). */
  final case class Outcome(store: String, kind: String, dropped: Long,
      aborted: Option[String]) {
    def ok: Boolean = aborted.isEmpty
  }

  final case class Report(outcomes: Seq[Outcome]) {
    def aborted: Seq[Outcome] = outcomes.filterNot(_.ok)
    def dropped: Long = outcomes.map(_.dropped).sum
  }

  /** Run every action; a guardrail abort is captured per store, any
    * other failure propagates. */
  def run(actions: Seq[Action]): Report = Report(actions.map { a =>
    try Outcome(a.store, a.kind, a.run(), None)
    catch {
      case e: IllegalStateException =>
        Outcome(a.store, a.kind, 0L,
          Some(Option(e.getMessage).getOrElse("guardrail abort")))
    }
  })

  /** The sweep-then-compact step shared by every claim store: expire
    * claims below the horizon under the guardrail, then fold the delta
    * backlog if the budget is crossed (a sweep that dropped nothing is
    * NOT a fold — the compaction keeps the file count bounded on quiet
    * stores too). */
  private[streaming] def sweepAndCompact(spark: SparkSession, store: ClaimStore,
      empty: DataFrame, minEpoch: Long, maxDropFrac: Double,
      epochCol: String = "epoch"): Long = {
    val dropped =
      store.retentionSweep(spark, empty, minEpoch, maxDropFrac, epochCol)
    store.maybeCompact(spark, empty)
    dropped
  }
}
