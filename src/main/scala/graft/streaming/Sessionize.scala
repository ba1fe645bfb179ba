package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (ST7 upgrade): gap-based sessionization with
  * `flatMapGroupsWithState` — the state primitive the reference never
  * needed but a streaming engine must expose. State is per-key and bounded
  * by an event-time timeout, so it scales with live keys, not history.
  */
object Sessionize {

  final case class Event(key: String, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Long, sum: Double)
  final case class Session(key: String, start: Timestamp, end: Timestamp,
      n_events: Long, total_value: Double)

  /** Emit a session when `gapMs` of event-time silence passes for a key
    * (enforced via event-time timeout against the stream's watermark).
    */
  def sessions(events: Dataset[Event], gapMs: Long)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", s"${gapMs / 1000} seconds")
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(key, new Timestamp(s.start),
              new Timestamp(s.lastTs), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  // watermark-admissible late event may precede the open
                  // session's start — extend backwards as well as forwards
                  cur = Some(s.copy(start = math.min(s.start, t),
                    lastTs = math.max(s.lastTs, t),
                    n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += Session(key, new Timestamp(s.start),
                    new Timestamp(s.lastTs), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
