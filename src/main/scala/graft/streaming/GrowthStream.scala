package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming GROWTH ACCOUNTING — the stateful twin of the batch
  * `q_growth_accounting` decomposition (new / retained / resurrected /
  * churned per user-week). Production shape: lifecycle alerts ("this
  * cohort is churning") need the classification the moment a week is
  * settled, not at the next batch run.
  *
  * Finality rule (the [[TransitionStream]] discipline lifted from
  * events to WEEKS): a user's week w can be classified only when no
  * event for w or any earlier week can still arrive — i.e. once the
  * watermark passes the END of week w (every event of week w carries
  * ts < end(w) ≤ watermark, so a late one would already be dropped).
  * Weeks above the watermark wait in state.
  *
  * CHURN is the hard part — it is an ABSENCE, so no arriving event can
  * trigger it: after finalizing week w the state arms an EVENT-TIME
  * TIMEOUT at end(w + 1wk); if the timeout fires (or a later week
  * finalizes across a gap) with no activity in w + 1wk, the user
  * churned at week w + 1wk — emitted exactly once per gap, and a later
  * resurrection re-opens the cycle.
  *
  * State per user is O(1) + bounded: the above-watermark pending weeks
  * (≤ watermark horizon / 7d entries), the last finalized week, and
  * the churn-emitted flag. One shuffle on user_id (the state key).
  */
object GrowthStream {

  final case class GEvent(user_id: Long, ts: java.sql.Timestamp)

  /** pending: DISTINCT above-watermark active weeks (epoch-day of the
    * Monday); lastFinal: last finalized active week; churned: whether
    * the gap after lastFinal already emitted its churn row. */
  final case class GState(pending: List[Long], lastFinal: Option[Long],
      churned: Boolean)

  /** One finalized lifecycle fact: cls ∈ new | retained | resurrected |
    * churned, week = epoch-day of the Monday it belongs to. */
  final case class GRow(user_id: Long, week_day: Long, cls: String)

  private val DayMs = 86400000L
  private val WeekDays = 7L

  /** Monday-start week of a timestamp, as epoch days (epoch day 0 =
    * Thursday 1970-01-01, so Monday alignment is (d + 3) mod 7). */
  private def weekOf(t: java.sql.Timestamp): Long = {
    val us = t.toInstant.getEpochSecond * 1000000L +
      t.toInstant.getNano / 1000L
    val day = Math.floorDiv(us, 86400000000L)
    day - Math.floorMod(day + 3, WeekDays)
  }

  private def endMs(week: Long): Long = (week + WeekDays) * DayMs

  private def stateFn(
      user: Long, it: Iterator[GEvent], state: GroupState[GState])
      : Iterator[GRow] = {
    val st = state.getOption.getOrElse(GState(Nil, None, churned = false))
    val merged =
      if (state.hasTimedOut) st.pending
      else (st.pending ++ it.map(e => weekOf(e.ts))).distinct.sorted
    val wm = state.getCurrentWatermarkMs()
    val (ripe, still) = merged.partition(w => endMs(w) <= wm)
    val out = scala.collection.mutable.ListBuffer.empty[GRow]
    var lastFinal = st.lastFinal
    var churned = st.churned
    ripe.foreach { w =>
      lastFinal match {
        case None =>
          out += GRow(user, w, "new")
        case Some(prev) if w == prev + WeekDays =>
          out += GRow(user, w, "retained")
        case Some(prev) =>
          // a gap: the churn at prev+1wk is settled (its week ended
          // before w's, which is below the watermark) — emit it first
          // unless the timeout path already did
          if (!churned) out += GRow(user, prev + WeekDays, "churned")
          out += GRow(user, w, "resurrected")
      }
      lastFinal = Some(w)
      churned = false
    }
    // timeout/absence path: the week after lastFinal has fully ended
    // with no activity in it — the user churned there. No pending-week
    // guard needed: activity in week prev+1wk below the watermark
    // would have ripened above (its end ≤ wm is exactly this
    // condition), and a pending week further out does not contradict
    // the settled absence in between.
    lastFinal.foreach { prev =>
      if (!churned && endMs(prev + WeekDays) <= wm) {
        out += GRow(user, prev + WeekDays, "churned")
        churned = true
      }
    }
    state.update(GState(still, lastFinal, churned))
    // next wake-up: the MINIMUM of the earliest pending week's end and
    // the churn deadline for the current gap. Both must compete: with a
    // pending week far above the watermark AND an unsettled gap at
    // lastFinal+1wk, waking only for the pending week would emit the
    // already-settled churn late (or never, if the stream ends first).
    val deadline: Option[Long] = {
      val pendingWake = if (still.nonEmpty) Some(endMs(still.min)) else None
      val churnWake =
        if (!churned) lastFinal.map(p => endMs(p + WeekDays)) else None
      (pendingWake.toList ++ churnWake.toList).minOption
    }
    deadline.foreach(t => state.setTimeoutTimestamp(math.max(t, wm + 1)))
    out.iterator
  }

  /** The raw lifecycle-fact stream: append mode, one row per finalized
    * (user, week, class) — input must carry (`user_id`, `ts`). */
  def lifecycle(events: DataFrame, watermark: String)
      : Dataset[GRow] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[GEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GState, GRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        stateFn)
  }
}
