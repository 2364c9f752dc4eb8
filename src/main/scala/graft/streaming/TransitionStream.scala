package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming extraction of user-journey TRANSITIONS (event-type
  * bigrams) — the stateful twin of the batch `q_markov_transitions`
  * lag-window. Production shape: real-time next-action features need
  * the (previous event → this event) pair the moment an event is
  * final, which a batch lag window can only deliver per run.
  *
  * Finality rule (the [[SessionWindows.sessionizeStream]] discipline):
  * a transition is emitted only when the watermark passes its TO
  * event's time. Any event that could still insert between the pair
  * would carry an earlier timestamp than the TO event — i.e. it would
  * be below the watermark, which the stream has already declared late
  * and dropped — so the predecessor of a below-watermark event is
  * settled, and the emitted bigram can never be contradicted.
  * Above-watermark events wait in state.
  *
  * State per user = the buffered above-watermark events (bounded by
  * the watermark horizon × that user's rate, NOT history) plus the
  * single last-emitted event (O(1) forever — the predecessor the next
  * batch's first event links back to). Event-time timeouts flush
  * buffered events as the watermark overtakes them, so a user who
  * goes quiet still gets their trailing transitions.
  */
object TransitionStream {

  final case class TEvent(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String)

  /** One buffered event in the state store (timestamp pre-converted to
    * epoch micros: state payloads stay primitive). */
  final case class PEvent(ts_us: Long, event_id: Long, event_type: String)

  final case class PendState(pending: List[PEvent], last: Option[PEvent])

  final case class Transition(user_id: Long, from_type: String,
      to_type: String)

  private def micros(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private def stateFn(
      user: Long, it: Iterator[TEvent], state: GroupState[PendState])
      : Iterator[Transition] = {
    val st = state.getOption.getOrElse(PendState(Nil, None))
    val merged =
      if (state.hasTimedOut) st.pending
      else (st.pending ++ it.map(e =>
        PEvent(micros(e.ts), e.event_id, e.event_type)).toList)
        .sortBy(e => (e.ts_us, e.event_id))
    val wm = state.getCurrentWatermarkMs()
    // strict-< in ms mirrors the sessionizeStream ripeness spelling
    val (ripe, still) = merged.partition(e => e.ts_us / 1000 < wm)
    val out = (st.last.toList ++ ripe).sliding(2).collect {
      case Seq(a, b) => Transition(user, a.event_type, b.event_type)
    }.toList
    // `last` persists forever (O(1)): it is the FROM side of the next
    // ripe event, however far in the future that arrives
    state.update(PendState(still, ripe.lastOption.orElse(st.last)))
    if (still.nonEmpty) {
      val t = still.map(_.ts_us / 1000).min
      state.setTimeoutTimestamp(math.max(t, wm + 1))
    }
    out.iterator
  }

  /** The raw transition stream: append-mode, one row per finalized
    * bigram. Input must be the events frame (`ts`, `user_id`,
    * `event_id`, `event_type`); one shuffle on user_id (the state
    * key). */
  def transitions(events: DataFrame, watermark: String)
      : Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_id").cast("long").as("event_id"), col("event_type"))
      .as[TEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PendState, Transition](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        stateFn)
  }
}
