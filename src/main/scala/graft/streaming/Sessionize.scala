package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (ST7 upgrade): gap-based sessionization with
  * `flatMapGroupsWithState` — the state primitive the reference never
  * needed but a streaming engine must expose. State is per-key and bounded
  * by an event-time timeout, so it scales with live keys, not history.
  *
  * Out-of-order correctness: state holds a LIST of disjoint gap-separated
  * intervals, not one "current" session — Spark does not late-filter
  * `flatMapGroupsWithState` input, so a watermark-admissible event may
  * precede the open session by more than a gap (it must open its own
  * earlier session) or land between two sessions (it must MERGE them).
  * A single-interval formulation silently glues such events onto the
  * newest session, inventing sessions that span silence. Intervals close
  * individually once the watermark passes their `lastTs + gap`.
  */
object Sessionize {

  final case class Event(key: String, ts: Timestamp, value: Double)
  final case class Interval(start: Long, lastTs: Long, n: Long, sum: Double)
  final case class SessionState(intervals: List[Interval])
  final case class Session(key: String, start: Timestamp, end: Timestamp,
      n_events: Long, total_value: Double)

  /** Fold one event into the disjoint-interval list: absorb every interval
    * within `gapMs` of `t` (an event can bridge two), keep the rest.
    */
  private def addEvent(intervals: List[Interval], t: Long, v: Double,
      gapMs: Long): List[Interval] = {
    val (touching, rest) = intervals.partition(iv =>
      t >= iv.start - gapMs && t <= iv.lastTs + gapMs)
    val merged = touching.foldLeft(Interval(t, t, 1L, v)) { (acc, iv) =>
      Interval(math.min(acc.start, iv.start), math.max(acc.lastTs, iv.lastTs),
        acc.n + iv.n, acc.sum + iv.sum)
    }
    (merged :: rest).sortBy(_.start)
  }

  /** Emit a session when `gapMs` of event-time silence passes for a key
    * (enforced via event-time timeout against the stream's watermark).
    */
  def sessions(events: Dataset[Event], gapMs: Long)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", s"$gapMs milliseconds") // no integer-second truncation
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[SessionState]) =>
          def emit(iv: Interval): Session =
            Session(key, new Timestamp(iv.start), new Timestamp(iv.lastTs),
              iv.n, iv.sum)
          def rearm(open: List[Interval]): Unit =
            if (open.isEmpty) state.remove()
            else {
              state.update(SessionState(open))
              // earliest candidate close; must stay ahead of the watermark
              val wm = state.getCurrentWatermarkMs()
              val t = open.map(_.lastTs + gapMs).min
              state.setTimeoutTimestamp(math.max(t, wm + 1))
            }
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            val (closed, open) = state.get.intervals
              .partition(_.lastTs + gapMs < wm)
            rearm(open)
            closed.sortBy(_.start).map(emit).iterator
          } else {
            val intervals = rows.foldLeft(
              state.getOption.map(_.intervals).getOrElse(Nil)) { (ivs, e) =>
              addEvent(ivs, e.ts.getTime, e.value, gapMs)
            }
            // an interval already behind the watermark can never grow — close
            // it now rather than waiting for the next timeout pass
            val (closed, open) = intervals.partition(_.lastTs + gapMs < wm)
            rearm(open)
            closed.sortBy(_.start).map(emit).iterator
          }
      }
  }
}
