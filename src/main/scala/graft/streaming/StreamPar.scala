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
private[streaming] object StreamPar {
  /** Run every task, await ALL of them, then surface the FIRST
    * failure (by task order) — a failed store append must fail the
    * batch exactly as it did when the calls were sequential, and no
    * task may be silently abandoned mid-flight when a sibling fails
    * (a torn batch would leave stores half-appended). */
  def runAll(tasks: Seq[() => Unit]): Unit = {
    if (tasks.isEmpty) return
    if (tasks.size == 1) { tasks.head.apply(); return }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fs = tasks.map(t => Future(t()))
    fs.foreach(f => Await.ready(f, Duration.Inf))
    fs.foreach(f => Await.result(f, Duration.Inf))
  }
}
