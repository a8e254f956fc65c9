package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operator surface (SURVEY.md §2B "Streaming").
  *
  * The reference's "streaming" is sequential file streaming of record blocks
  * (`/root/reference/docs/draft.md:213-218`); the north star extends that to
  * true incremental event-time processing. Each transform here takes a
  * (possibly streaming) DataFrame with an event-time column `ts` and returns
  * the standard windowed shapes, identical in batch and streaming mode — the
  * batch analogs are oracle-checked (graft.operators.StreamShapeQueries),
  * these are exercised incrementally in StreamingSpec with MemoryStream.
  *
  * Scale notes: watermarks bound state size (state store holds only open
  * windows/sessions); keyed state in [[sessionizeWithState]] partitions by
  * user — at 100 TB/day the state store shards across executors with the
  * shuffle, and RocksDB-backed state keeps memory flat.
  */
object StreamingOps {

  /** Tumbling event-time window counts+sums with a watermark; late rows
    * beyond `watermark` are dropped (append mode emits only finalized
    * windows).
    */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes",
      window_ : String = "1 minute"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("cnt"), col("sum_value"))

  def slidingCounts(events: DataFrame, watermark: String = "10 minutes",
      size: String = "5 minutes", slide: String = "1 minute"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("cnt"))

  /** Gap-based session windows per user (built-in session_window). */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes",
      gap: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("cnt"))

  /** Keyed dedup with bounded state: duplicates of (user_id, event_type)
    * arriving within the watermark are dropped; state for keys older than
    * the watermark is reclaimed.
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-stream interval join: each click pairs with views by the same
    * user within `[v_ts, v_ts + maxDelay]`. BOTH sides carry watermarks and
    * the join condition bounds event time in both directions, so Spark can
    * expire buffered rows from both state stores — unbounded state is the
    * classic stream-join failure at scale, and this shape avoids it.
    */
  def clickAfterView(views: DataFrame, clicks: DataFrame,
      maxDelay: String = "5 minutes", watermark: String = "10 minutes"): DataFrame = {
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    v.join(c, expr(
        s"v_user = c_user AND c_ts >= v_ts AND c_ts <= v_ts + INTERVAL $maxDelay"))
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        col("v_ts"), col("c_ts"))
  }

  /** Stream-static enrichment join: the static dim is broadcast to every
    * micro-batch task — no stream state at all, the right default for
    * dimension lookups in a 100 TB/day pipeline.
    */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionOut(user_id: Long, sess_start: java.sql.Timestamp,
      sess_end: java.sql.Timestamp, cnt: Int)

  /** Custom stateful sessionization via flatMapGroupsWithState — the escape
    * hatch for session semantics the built-in can't express. A session
    * closes after `gapMs` of event-time silence; an EVENT-TIME timeout at
    * `last + gapMs` flushes each user's trailing session and removes its
    * state once the watermark passes the gap, so a user who goes quiet
    * neither loses their last session nor leaks a state-store entry.
    * (Processing-time timeouts would busy-loop empty micro-batches; event
    * time fires only as the watermark advances.)
    */
  def sessionizeWithState(events: Dataset[Event], gapMs: Long,
      watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          def close(st: SessionState) = SessionOut(user,
            new java.sql.Timestamp(st.start),
            new java.sql.Timestamp(st.last + gapMs), st.n)
          if (state.hasTimedOut) {
            // gap elapsed with no new events: emit the pending session and
            // reclaim this user's state
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(st) if t < st.last + gapMs =>
                  // merge; a cross-batch straggler may precede the recorded
                  // start, so the session start moves back too
                  cur = Some(SessionState(math.min(st.start, t),
                    math.max(st.last, t), st.n + 1))
                case Some(st) =>
                  out += close(st)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              // flush the trailing session when the watermark passes the gap
              state.setTimeoutTimestamp(st.last + gapMs)
            }
            out.iterator
          }
      }
  }
}
