package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap sessionization as CUSTOM streaming state
  * (flatMapGroupsWithState) — the escape hatch for session semantics
  * `session_window` can't express (e.g. carrying per-session derived
  * state, emitting the full ordered interaction array per session,
  * the reference's nep_session_events shape). Built-ins remain the
  * first choice (SURVEY §2.12); this demonstrates the custom-state
  * path with ONE state function shared by batch and streaming, so
  * semantics cannot drift between the two.
  *
  * Boundary semantics match q34/session_window: an event at exactly
  * last_ts + gap merges; strictly greater starts a new session.
  */
object StatefulSessionize {

  case class Ev(user_id: Long, event_id: Long, ts_ms: Long, ts: java.sql.Timestamp)
  case class Sess(user_id: Long, session_start_ms: Long, interactions: Seq[Long])
  case class State(startMs: Long, lastMs: Long, events: List[(Long, Long)])

  private def emit(user: Long, s: State): Sess =
    Sess(user, s.startMs,
      s.events.sortBy(identity).map(_._2))

  /** The shared state-transition function. `flushTrailing` is true in
    * batch mode (each group is complete) and false in streaming
    * (trailing sessions wait for the event-time timeout).
    */
  def transition(gapMs: Long, flushTrailing: Boolean)(
      user: Long, it: Iterator[Ev], state: GroupState[State]): Iterator[Sess] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(emit(user, _))
      state.remove()
      return out.iterator
    }
    var st = state.getOption
    var out = List.empty[Sess]
    it.toSeq.sortBy(e => (e.ts_ms, e.event_id)).foreach { e =>
      st match {
        case Some(s) if e.ts_ms >= s.startMs - gapMs &&
            e.ts_ms - s.lastMs <= gapMs =>
          // min/max, not overwrite: a late-but-within-watermark event
          // from an earlier micro-batch must never regress lastMs
          // (that would split the next on-time event into a bogus new
          // session and set the close timeout too early). The LOWER
          // bound matters symmetrically: a late event more than one
          // gap BEFORE the open session's start does not belong to it
          // — without the bound `e.ts_ms - s.lastMs <= gapMs` is
          // trivially true for ANY past event and would drag startMs
          // arbitrarily backward.
          st = Some(State(math.min(s.startMs, e.ts_ms),
            math.max(s.lastMs, e.ts_ms), (e.ts_ms, e.event_id) :: s.events))
        case Some(s) if e.ts_ms > s.lastMs =>
          // forward gap exceeded: close the session, open the next
          out ::= emit(user, s)
          st = Some(State(e.ts_ms, e.ts_ms, List((e.ts_ms, e.event_id))))
        case Some(_) =>
          // late event beyond the open session's backward reach: its
          // own session under batch semantics, which here closed
          // before the open one started — emit it immediately as a
          // (best-effort) late singleton rather than corrupting the
          // open session. Unreachable at the 0-seconds default
          // watermark (late events are filtered pre-transition); only
          // a caller opting into a real lateness window sees it.
          out ::= emit(user, State(e.ts_ms, e.ts_ms, List((e.ts_ms, e.event_id))))
        case None =>
          st = Some(State(e.ts_ms, e.ts_ms, List((e.ts_ms, e.event_id))))
      }
    }
    if (flushTrailing) {
      out = out ++ st.map(emit(user, _))
      state.remove()
    } else {
      st.foreach { s =>
        state.update(s)
        // flush once the watermark passes the session's close (must
        // stay ahead of the already-advanced watermark)
        state.setTimeoutTimestamp(
          math.max(s.lastMs + gapMs + 1, state.getCurrentWatermarkMs() + 1))
      }
    }
    out.reverse.iterator
  }

  private def toEvents(df: DataFrame)(implicit spark: SparkSession): Dataset[Ev] = {
    import spark.implicits._
    df.select(col("user_id"), col("event_id"), col("ts_ms"), col("ts")).as[Ev]
  }

  /** Batch form — equals Features.sessionize(minSize=0) up to the
    * session-id labeling (asserted in StreamingSpec).
    */
  def sessionizeBatch(spark: SparkSession, events: DataFrame, gapMs: Long = 30 * 60 * 1000L): Dataset[Sess] = {
    import spark.implicits._
    toEvents(events)(spark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        transition(gapMs, flushTrailing = true))
  }

  /** Streaming form over an event stream (needs `ts` TimestampType
    * for the watermark plus `ts_ms`). `watermarkDelay` is the
    * admitted lateness window: the "0 seconds" default DROPS every
    * cross-batch out-of-order event (watermark = max seen ts), which
    * is what makes the AvailableNow equivalence specs exact and
    * trailing sessions flush at stream end; a real deployment with
    * late data passes e.g. "30 minutes" — late events inside the
    * window then reach [[transition]] (whose bounded-merge rule
    * handles them), at the cost of session finalization lagging the
    * watermark by the same window.
    */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30 * 60 * 1000L,
      watermarkDelay: String = "0 seconds"): Dataset[Sess] = {
    import spark.implicits._
    toEvents(events.withWatermark("ts", watermarkDelay))(spark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        transition(gapMs, flushTrailing = false))
  }

  // -- incremental nep_session_events (reference model 2, streaming) --

  case class SkuEv(session_id: String, api_key: String,
      session_date: java.sql.Date, epoch_ms: Long, sku: String,
      ts: java.sql.Timestamp)
  case class SessionRow(session_id: String, api_key: String,
      session_date: java.sql.Date, interactions: Seq[String])
  case class SkuState(api_key: String, minDateMs: Long, lastMs: Long,
      events: List[(Long, String)])

  /** The reference's nep_session_events made INCREMENTAL: the raw
    * append-only log arrives as a stream, sessions are keyed by the
    * explicit session_id (the reference's grouping,
    * nep_session_events.sql:17-18) with custom state accumulating the
    * time-ordered SKU array; a session closes (emits) when the
    * event-time watermark passes its last event + `closeAfterMs` —
    * the streaming stand-in for "the view is re-run after the batch
    * is complete" (README.md:80,86). SESSION_DATE = min event date,
    * matching first_value-over-ascending-ts.
    */
  def sessionEventsTransition(closeAfterMs: Long, flushTrailing: Boolean)(
      sid: String, it: Iterator[SkuEv], state: GroupState[SkuState]): Iterator[SessionRow] = {
    def emitRow(s: SkuState): SessionRow =
      SessionRow(sid, s.api_key, new java.sql.Date(s.minDateMs),
        s.events.sortBy(identity).map(_._2))
    if (state.hasTimedOut) {
      val out = state.getOption.map(emitRow)
      state.remove()
      return out.iterator
    }
    var st = state.getOption
    it.foreach { e =>
      val dateMs = e.session_date.getTime
      st = st match {
        case Some(s) => Some(SkuState(s.api_key, math.min(s.minDateMs, dateMs),
          math.max(s.lastMs, e.epoch_ms), (e.epoch_ms, e.sku) :: s.events))
        case None => Some(SkuState(e.api_key, dateMs, e.epoch_ms,
          List((e.epoch_ms, e.sku))))
      }
    }
    if (flushTrailing) {
      val out = st.map(emitRow)
      state.remove()
      out.iterator
    } else {
      st.foreach { s =>
        state.update(s)
        // +1 for boundary consistency with transition(): an event
        // landing exactly at lastMs + closeAfterMs in a later
        // micro-batch must still find the state open (merge), never a
        // flushed session (duplicate row).
        state.setTimeoutTimestamp(
          math.max(s.lastMs + closeAfterMs + 1, state.getCurrentWatermarkMs() + 1))
      }
      Iterator.empty
    }
  }

  /** Streaming nep_session_events over an exploded-events stream
    * (schema: session_id, api_key, session_date DATE, epoch_ms LONG,
    * sku STRING, ts TIMESTAMP for the watermark).
    */
  def sessionEventsStream(spark: SparkSession, exploded: DataFrame,
      closeAfterMs: Long = 30 * 60 * 1000L,
      watermarkDelay: String = "0 seconds"): Dataset[SessionRow] = {
    import spark.implicits._
    // the lateness trade is [[sessionizeStream]]'s; merging itself is
    // order-free here (sessions are keyed by explicit session_id)
    exploded.withWatermark("ts", watermarkDelay).as[SkuEv]
      .groupByKey(_.session_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionEventsTransition(closeAfterMs, flushTrailing = false))
  }

  /** Batch twin of [[sessionEventsStream]] (groups complete). */
  def sessionEventsBatch(spark: SparkSession, exploded: DataFrame): Dataset[SessionRow] = {
    import spark.implicits._
    exploded.as[SkuEv]
      .groupByKey(_.session_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionEventsTransition(0L, flushTrailing = true))
  }

  /** Declared q55: the incremental nep_session_events custom-state
    * path (the same transition function the stream runs) driven as a
    * deterministic batch query over the events table, so the
    * flatMapGroupsWithState surface gets a driver-hash-green row.
    * Sessions keyed by an explicit user-day session_id;
    * SESSION_DATE = min event date; interactions = (epoch_ms, sku)-
    * ordered pipe-joined SKU string (scalar-only declared output).
    */
  def q55SessionEventsStateful(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val exploded = graft.Tables.events(spark, dir).select(
      concat(col("user_id"), lit("-"), to_date(col("ts"))).as("session_id"),
      lit("k1").as("api_key"),
      to_date(col("ts")).as("session_date"),
      col("ts_ms").as("epoch_ms"),
      concat(lit("sku_"), col("event_id") % 100).as("sku"),
      col("ts"))
    sessionEventsBatch(spark, exploded).toDF()
      .withColumn("interactions", concat_ws("|", col("interactions")))
      .orderBy("session_id")
  }
}
