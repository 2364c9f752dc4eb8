package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Session windows over the events stream (SURVEY.md §2.8 extension):
  * per-user activity sessions closed by a gap of inactivity.
  *
  * Two implementations, deliberately:
  *
  *  1. [[sessions]] — the Spark-native `session_window` aggregate. One
  *     plan for batch AND streaming (add a watermark upstream for
  *     streaming); Catalyst handles merge/split, state store, and late
  *     data. This is the production path.
  *  2. [[sessionizeWithState]] / [[sessionizeStream]] — the same
  *     semantics hand-built on `flatMapGroupsWithState`, the escape hatch
  *     for session logic `session_window` cannot express (per-session
  *     early emission, custom merge rules, side outputs). The batch form
  *     is differentially tested against (1); the streaming form closes
  *     sessions by event-time timeout when the watermark passes
  *     `last_event + gap`.
  *
  * Scale: both shuffle once on `user_id` (the state key); per-task state
  * is bounded by open sessions per user, not corpus size. No single
  * reducer anywhere.
  */
object SessionWindows {

  /** Session boundary contract (shared by all implementations and the
    * DuckDB oracle): an event extends the session when it lands strictly
    * inside `last_event + gap`; at exactly `gap` it starts a new session
    * (session windows are [start, last+gap) half-open). */
  val defaultGap = "4 hours"

  /** Native session windows: (user_id, session_start, session_end,
    * n_events, total_value), end = last event + gap. Timestamps emitted
    * as formatted strings (engine-portable). */
  def sessions(events: DataFrame, gap: String = defaultGap): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        graft.Det.dsum(col("value")).as("total_value"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n_events"),
        col("total_value"))

  // ---- custom-state implementation ------------------------------------

  final case class SessionEvent(
      user_id: Long, ts: java.sql.Timestamp, value: Double)

  final case class Session(
      user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, total_value: Double)

  /** One open (not yet gap-closed) session kept in the state store.
    * `sum_cents` accumulates value scaled to 2-dp EXACT integers — the
    * same decimal arithmetic [[graft.Det.dsum]] uses in [[sessions]], so
    * the custom-state path's totals equal the native aggregate's
    * regardless of summation order. */
  final case class OpenSession(
      start_us: Long, last_us: Long, n: Long, sum_cents: Long)

  private def micros(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  /** value → exact scale-2 cents, matching Spark's double→DECIMAL(18,2)
    * cast (shortest-repr decimal, HALF_UP). */
  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  private def close(user: Long, o: OpenSession, gapUs: Long): Session =
    Session(user, o.start_us, o.last_us + gapUs, o.n, o.sum_cents / 100.0)

  /** Fold sorted events into an open session, emitting every session the
    * gap closes along the way. */
  private def foldEvents(
      evs: Array[SessionEvent], open0: Option[OpenSession], gapUs: Long,
      user: Long, out: ListBuffer[Session]): Option[OpenSession] = {
    var open = open0
    evs.foreach { e =>
      val ts = micros(e.ts)
      open = open match {
        case Some(o) if ts - o.last_us < gapUs =>
          Some(OpenSession(o.start_us, math.max(o.last_us, ts),
            o.n + 1, o.sum_cents + cents(e.value)))
        case Some(o) =>
          out += close(user, o, gapUs)
          Some(OpenSession(ts, ts, 1, cents(e.value)))
        case None =>
          Some(OpenSession(ts, ts, 1, cents(e.value)))
      }
    }
    open
  }

  private def stateFn(gapUs: Long, emitOpen: Boolean)(
      user: Long, it: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[Session] = {
    val out = ListBuffer[Session]()
    if (state.hasTimedOut) {
      // watermark passed last_event + gap: the open session is final
      state.getOption.foreach(o => out += close(user, o, gapUs))
      state.remove()
    } else {
      val evs = it.toArray.sortBy(e => micros(e.ts))
      val open = foldEvents(evs, state.getOption, gapUs, user, out)
      open match {
        case Some(o) if emitOpen => // batch mode: no timeouts ever fire
          out += close(user, o, gapUs)
          state.remove()
        case Some(o) =>
          state.update(o)
          state.setTimeoutTimestamp((o.last_us + gapUs) / 1000L)
        case None => state.remove()
      }
    }
    out.iterator
  }

  /** Pending (not yet watermark-finalized) sessions for one user —
    * [[sessionizeStream]]'s state. Kept as a LIST: sessions older than
    * the open one may still merge with an out-of-order (but
    * above-watermark) event, so nothing is final until the watermark
    * passes its `last + gap`. */
  final case class PendingSessions(sessions: List[OpenSession])

  /** Merge events + prior pending sessions into the canonical disjoint
    * session list: treat each event as a singleton session, sort
    * everything by start, and merge adjacent entries whose gap is
    * `< gapUs` — associative and order-independent, so out-of-order
    * arrivals (including ones that BRIDGE two previously separate
    * sessions) land exactly where the batch semantics put them. */
  private def normalize(
      pending: List[OpenSession], evs: Array[SessionEvent],
      gapUs: Long): List[OpenSession] = {
    val singles = evs.map(e => {
      val us = micros(e.ts)
      OpenSession(us, us, 1, cents(e.value))
    })
    val all = (pending ++ singles).sortBy(s => (s.start_us, s.last_us))
    all.foldLeft(List.empty[OpenSession]) {
      case (acc, s) => acc match {
        case prev :: rest if s.start_us - prev.last_us < gapUs =>
          OpenSession(prev.start_us, math.max(prev.last_us, s.last_us),
            prev.n + s.n, prev.sum_cents + s.sum_cents) :: rest
        case _ => s :: acc
      }
    }.reverse
  }

  private def streamStateFn(gapUs: Long)(
      user: Long, it: Iterator[SessionEvent],
      state: GroupState[PendingSessions]): Iterator[Session] = {
    val pending0 = state.getOption.map(_.sessions).getOrElse(Nil)
    val merged =
      if (state.hasTimedOut) pending0
      else normalize(pending0, it.toArray, gapUs)
    // a session is FINAL only once the watermark passes last + gap —
    // even one closed by a successor event could still merge with an
    // out-of-order arrival that is above the watermark (legal late
    // data), so successor closure alone must NOT emit
    val wm = state.getCurrentWatermarkMs()
    val (ripe, still) = merged.partition(s => (s.last_us + gapUs) / 1000 < wm)
    val out = ripe.sortBy(_.start_us).map(close(user, _, gapUs))
    if (still.isEmpty) state.remove()
    else {
      state.update(PendingSessions(still))
      // earliest pending finality, clamped above the current watermark
      // (setTimeoutTimestamp rejects timestamps <= watermark)
      val t = still.map(s => (s.last_us + gapUs) / 1000).min
      state.setTimeoutTimestamp(math.max(t, wm + 1))
    }
    out.iterator
  }

  /** Batch form: each group's whole history arrives in one call, so open
    * sessions are emitted eagerly (`emitOpen`) — differentially equal to
    * [[sessions]]. */
  def sessionizeWithState(
      events: Dataset[SessionEvent], gapUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        stateFn(gapUs, emitOpen = true))
  }

  /** Streaming form: a session is emitted ONLY when the event-time
    * watermark passes `last_event + gap`, so results are final under
    * late/out-of-order data up to the watermark delay — INCLUDING
    * out-of-order events that extend, backdate, or BRIDGE sessions the
    * in-order view would have considered closed (state is the LIST of
    * pending sessions per user, re-normalized each batch; an early
    * successor-closure emit would be unmergeable and wrong). State per
    * user is bounded by pending sessions inside the watermark horizon.
    * Input must carry a watermark on `ts`. */
  def sessionizeStream(
      events: DataFrame, gapUs: Long, watermark: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("value").cast("double").as("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PendingSessions, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        streamStateFn(gapUs))
  }
}
