package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming re-expression of the reference's Kafka micro-batch
  * extractor (databuilder/extractor/kafka_source_extractor.py:22):
  *  - the bounded poll loop (consumer_total_timeout_sec) becomes
  *    Trigger.AvailableNow — process everything available, then stop;
  *  - offset-commit-on-publish-success (reference :116-130) becomes the
  *    checkpoint commit the sink performs after each micro-batch — the same
  *    at-least-once contract;
  *  - drop-on-error transform becomes a typed filter over parse results.
  *
  * In production the source is `format("kafka")`; tests drive the identical
  * plan from a file source (the transform DAG is source-agnostic).
  */
object EventStream {

  /** The event schema of /root/testdata's events table (ts as epoch micros
    * long at the stream edge; converted to timestamp in the plan). */
  val eventSchemaDDL =
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"

  /** Streaming source over a parquet directory (Kafka stand-in). */
  def source(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(eventSchemaDDL).parquet(path)

  /** Watermarked tumbling-window aggregation — the streaming form of
    * Events.windowedAgg. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Run a bounded micro-batch into an in-memory table and return the
    * result — Trigger.AvailableNow ≙ the reference's bounded consume
    * window, checkpoint ≙ its offset commit. */
  def runAvailableNow(spark: SparkSession, events: DataFrame, name: String,
      checkpoint: String): DataFrame = {
    val q = windowedCounts(events).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Streaming exact dedup — the training-data ingest shape: duplicate
    * event ids (at-least-once sources redeliver) are dropped with state
    * bounded by the watermark window, so the dedup map holds only the
    * last hour of ids instead of the all-time id set
    * (dropDuplicatesWithinWatermark; at 100 TB/day the alternative —
    * plain dropDuplicates — would grow state without bound). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  case class SessionState(sessionId: Long, lastSeenMicros: Long, nEvents: Long)
  case class SessionUpdate(userId: Long, nSessions: Long, nEvents: Long)

  case class OpenSession(sessionId: Long, startMicros: Long, lastMicros: Long, nEvents: Long)
  case class ClosedSession(userId: Long, sessionId: Long, startMicros: Long,
      endMicros: Long, nEvents: Long)

  /** flatMapGroupsWithState variant — the fan-out custom-state path: emits
    * one record per CLOSED session (0..N per invocation) instead of a
    * running summary. A session closes in-batch when a 30-minute gap
    * appears; the trailing open session closes at event-time timeout once
    * the watermark passes its last event + 30 minutes. */
  def closedSessions(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val gapMicros = 1800000000L
    val typed = events
      .withWatermark("ts", "1 hour")
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val open = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, open.sessionId, open.startMicros,
              open.lastMicros, open.nEvents))
          } else {
            val sorted = rows.map(_._2).toArray.sorted
            var open = state.getOption.orNull
            val closed = Iterator.newBuilder[ClosedSession]
            sorted.foreach { us =>
              if (open == null) {
                // session_id = session START TIME: unique and monotonic
                // per user even across event-time state eviction (a
                // counter would restart at 1 after the timeout removes
                // state and silently collide downstream)
                open = OpenSession(us, us, us, 1L)
              } else if (us - open.lastMicros > gapMicros) {
                closed += ClosedSession(userId, open.sessionId, open.startMicros,
                  open.lastMicros, open.nEvents)
                open = OpenSession(us, us, us, 1L)
              } else {
                // a LATE cross-batch event (us < lastMicros but within
                // the watermark) extends the session backward/forward
                // rather than regressing its bounds; id stays = start
                open = OpenSession(
                  math.min(open.sessionId, us),
                  math.min(open.startMicros, us),
                  math.max(open.lastMicros, us),
                  open.nEvents + 1)
              }
            }
            state.update(open)
            state.setTimeoutTimestamp(
              math.max(open.lastMicros / 1000L + gapMicros / 1000L,
                state.getCurrentWatermarkMs() + 60000L))
            closed.result().iterator
          }
      }
      .toDF("user_id", "session_id", "start_micros", "end_micros", "n_events")
  }

  /** Stateful sessionization with mapGroupsWithState — the custom-state
    * path (KeyValueGroupedDataset) for per-user session tracking with a
    * 30-minute gap, matching the batch Events.sessionize semantics for
    * in-order input.
    *
    * State discipline at scale: the kept state is fixed-size (3 longs per
    * user) and idle users are evicted via EventTimeTimeout once the
    * watermark passes their last event + 1 hour, so state growth is
    * bounded by the active-user set, not the all-time user set. That
    * eviction means n_sessions counts sessions within the retained-state
    * horizon — after an idle user's state is dropped, a comeback restarts
    * the count (the price of bounded state; closedSessions keys sessions
    * by start time instead, which survives eviction). The
    * per-invocation sort is bounded by the user's rows in ONE micro-batch
    * (size the trigger with maxFilesPerTrigger / maxOffsetsPerTrigger),
    * never the full history. */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events
      .withWatermark("ts", "1 hour")
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            SessionUpdate(userId, st.sessionId, st.nEvents)
          } else {
            val sorted = rows.map(_._2).toArray.sorted
            var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
            sorted.foreach { us =>
              val newSession =
                st.lastSeenMicros == Long.MinValue || us - st.lastSeenMicros > 1800000000L
              st = SessionState(if (newSession) st.sessionId + 1 else st.sessionId,
                math.max(st.lastSeenMicros, us), // late events must not regress last-seen
                st.nEvents + 1)
            }
            state.update(st)
            // evict once the watermark passes last-seen + 1 h (never
            // earlier than the current watermark, which would throw)
            state.setTimeoutTimestamp(
              math.max(st.lastSeenMicros / 1000L + 3600000L,
                state.getCurrentWatermarkMs() + 60000L))
            SessionUpdate(userId, st.sessionId, st.nEvents)
          }
      }
      .toDF("user_id", "n_sessions", "n_events")
  }

  /** Stream-stream INTERVAL join — every (click, view) pair of the same
    * user with the view inside the click's preceding hour: Spark's
    * built-in watermarked range join. Both sides buffer only the rows the
    * range condition + watermarks still allow (clicks 1 h, views 2 h), and
    * the engine evicts state automatically — the built-in alternative to
    * [[streamingAsof]] when ALL in-window matches are wanted rather than
    * the single latest one. Inner join, so results are final on emit. */
  def intervalJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").cast("long").as("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").cast("long").as("v_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    clicks.join(views,
        col("user_id") === col("v_user") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("user_id"), col("view_id"),
        unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("view_ts")).as("view_us"))
  }

  case class AsofState(latestViewId: Long, latestViewUs: Long, hasView: Boolean,
      buffered: Seq[(Long, Long, Int)]) // (us, event_id, kind 0=view 1=click)

  /** Streaming as-of attribution — the real-time twin of
    * Events.asofAttribution: attribute each click to the latest
    * preceding view by the same user. A click is emitted only once the
    * WATERMARK passes its timestamp — at that point no view at-or-before
    * it can still arrive, so the answer is final and identical to the
    * batch result (parity is spec-asserted on out-of-order multi-batch
    * input).
    *
    * State discipline at scale: matured events leave the buffer at every
    * invocation, collapsing all consumed views into ONE carried
    * (latest view id, ts) pair — state is the unmatured tail (bounded by
    * the watermark window) plus two longs, never the user's history.
    * Idle users evict a day after their last activity. */
  def streamingAsof(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events
      .withWatermark("ts", "1 hour")
      .filter(col("event_type").isin("view", "click"))
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"),
        col("event_id").cast("long"),
        when(col("event_type") === "view", 0).otherwise(1).as("kind"), col("ts"))
      .as[(Long, Long, Long, Int, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, Long, Long, Int, java.sql.Timestamp)],
            state: GroupState[AsofState]) =>
          val st0 = state.getOption.getOrElse(AsofState(0L, 0L, false, Nil))
          val buf = st0.buffered ++ rows.map(r => (r._2, r._3, r._4))
          val horizonUs = state.getCurrentWatermarkMs() * 1000L
          val (matured, pending) = buf.partition(_._1 <= horizonUs)
          var (lvId, lvUs, hasV) = (st0.latestViewId, st0.latestViewUs, st0.hasView)
          val out = Seq.newBuilder[(Long, Long, Long, java.lang.Long, java.lang.Long)]
          // views sort before clicks at equal timestamps (inclusive
          // bound), larger event_id wins among equal views — the same
          // total order as the batch window
          matured.sortBy(e => (e._1, e._3, e._2)).foreach { case (us, id, kind) =>
            if (kind == 0) { lvId = id; lvUs = us; hasV = true }
            else out += ((id, userId, us,
              if (hasV) Long.box(lvId) else null, if (hasV) Long.box(lvUs) else null))
          }
          state.update(AsofState(lvId, lvUs, hasV, pending))
          state.setTimeoutTimestamp(
            if (pending.nonEmpty)
              math.max(pending.map(_._1).min / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1000L)
            else state.getCurrentWatermarkMs() + 86400000L)
          out.result().iterator
      }
      .toDF("event_id", "user_id", "click_us", "view_event_id", "view_us")
  }
}
