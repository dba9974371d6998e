package graft.streaming

/** Driver-side overlap of INDEPENDENT Spark actions (optimization
  * guide §2.6): Spark's scheduler happily runs several jobs at once
  * inside one application — actions are only sequential because the
  * driver calls them sequentially. A micro-batch gate issues a handful
  * of independent small jobs (per-store appends, the verdict write,
  * the funnel frame); submitting them from a thread pool lets the next
  * job's tasks back-fill executors freed by the current job's tail
  * instead of paying each job's straggler tail in sequence — the same
  * discipline [[graft.operators.SearchDocs]]' staged writes already
  * use. FIFO scheduling (the default) gives exactly the back-fill
  * behaviour wanted here. */
private[graft] object StreamPar {
  /** Run every task, await ALL of them, then surface the FIRST
    * failure (by task order) — a failed store append must fail the
    * batch exactly as it did when the calls were sequential, and no
    * task may be silently abandoned mid-flight when a sibling fails
    * (a torn batch would leave stores half-appended).
    *
    * Threading contract: tasks run on a DEDICATED pool sized to the
    * task count, and every worker pins the CALLER's active
    * SparkSession before running its task. The first cut used
    * `ExecutionContext.Implicits.global`, whose lazily-created worker
    * threads inherit the active-session thread-local from whichever
    * thread happened to force the global pool first — under
    * concurrent suites/streams a worker could carry a NULL or STALE
    * session into plan construction (`SparkPlan.session() is null`
    * NPE from `Dataset.persist` mid-batch), and Spark actions also
    * blocked the CPU-sized shared pool on I/O. A per-call pool of at
    * most `tasks.size` threads (these are per-batch handfuls of
    * multi-second jobs — thread creation is noise) leaks no session
    * state across calls and never starves an unrelated user of the
    * global pool. */
  def runAll(tasks: Seq[() => Unit]): Unit = {
    if (tasks.isEmpty) return
    if (tasks.size == 1) { tasks.head.apply(); return }
    val session = org.apache.spark.sql.SparkSession.getActiveSession
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val fs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            // pin the submitting thread's session on this worker: the
            // session-dependent thread-locals (active session, SQL conf)
            // must match the caller's, not the pool-creator's
            session.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
            t()
          }
        })
      }
      // await ALL before surfacing the first failure (task order):
      // no sibling is abandoned mid-flight
      var firstFailure: Option[Throwable] = None
      fs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure.isEmpty) firstFailure = Some(e.getCause)
        }
      }
      firstFailure.foreach(throw _)
    } finally pool.shutdown()
  }
}
