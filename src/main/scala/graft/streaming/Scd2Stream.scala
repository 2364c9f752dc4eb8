package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming TYPE-2 SCD build — the stateful twin of the batch
  * `q_scd2_user_segments` lag/lead windows: per user, emit each CLOSED
  * dimension version (segment, valid_from, valid_to) exactly once, the
  * moment it can never be contradicted. Production shape: a warehouse
  * dimension fed from a change stream wants history rows on arrival,
  * not at the nightly batch.
  *
  * Finality rule (the [[TransitionStream]] discipline): a version
  * closes when its CLOSING change event is below the watermark — any
  * event that could still land inside the version would carry an
  * earlier timestamp than the closing event and the stream has already
  * declared such times late. The OPEN version never emits (absence of
  * a next change is not final), matching the batch twin's
  * `valid_to IS NULL` rows, which the oracle cutoff excludes.
  *
  * State per user = buffered above-watermark events (bounded by the
  * watermark horizon × that user's rate) plus the single open version
  * (O(1) forever). Event-time timeouts flush buffered events as the
  * watermark overtakes them. One shuffle on user_id (the state key).
  * No-op changes (same segment again) extend the open version without
  * emitting — the batch collapse rule.
  */
object Scd2Stream {

  final case class SEvent(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String)

  final case class PEvent(ts_us: Long, event_id: Long, event_type: String)

  /** The open (not-yet-closed) dimension version. */
  final case class OpenV(segment: String, from_us: Long)

  final case class SState(pending: List[PEvent], open: Option[OpenV])

  final case class Version(user_id: Long, segment: String,
      from_us: Long, to_us: Long)

  private def micros(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private def stateFn(
      user: Long, it: Iterator[SEvent], state: GroupState[SState])
      : Iterator[Version] = {
    val st = state.getOption.getOrElse(SState(Nil, None))
    val merged =
      if (state.hasTimedOut) st.pending
      else (st.pending ++ it.map(e =>
        PEvent(micros(e.ts), e.event_id, e.event_type)).toList)
        .sortBy(e => (e.ts_us, e.event_id))
    val wm = state.getCurrentWatermarkMs()
    // strict-< in ms, the TransitionStream ripeness spelling
    val (ripe, still) = merged.partition(e => e.ts_us / 1000 < wm)
    val out = scala.collection.mutable.ListBuffer.empty[Version]
    var open = st.open
    ripe.foreach { e =>
      open match {
        case None =>
          open = Some(OpenV(e.event_type, e.ts_us))
        case Some(o) if o.segment == e.event_type =>
          () // no-op change: the open version absorbs it
        case Some(o) =>
          out += Version(user, o.segment, o.from_us, e.ts_us)
          open = Some(OpenV(e.event_type, e.ts_us))
      }
    }
    state.update(SState(still, open))
    if (still.nonEmpty) {
      val t = still.map(_.ts_us / 1000).min
      state.setTimeoutTimestamp(math.max(t, wm + 1))
    }
    out.iterator
  }

  /** The raw closed-version stream: append mode, one row per finalized
    * SCD2 version. Input must carry (`user_id`, `ts`, `event_id`,
    * `event_type`). */
  def versions(events: DataFrame, watermark: String): Dataset[Version] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_id").cast("long").as("event_id"), col("event_type"))
      .as[SEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SState, Version](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        stateFn)
  }
}
