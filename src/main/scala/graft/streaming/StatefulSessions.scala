package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class UserEvent(user_id: Long, ts: Timestamp)
case class SessionBuf(start: Long, last: Long, n: Long)
case class SessionSummary(user_id: Long, session_start: Timestamp,
                          session_end: Timestamp, n_events: Long)

/** Custom stateful streaming operator via flatMapGroupsWithState — the
  * §2.7 "stateful ops" surface the built-in session_window can't cover
  * when per-group logic is arbitrary (here: emit a completed session the
  * moment a gap is observed in-stream, and flush dangling sessions by
  * event-time timeout when the watermark passes last+gap). State per user
  * is a constant-size [[SessionBuf]]; eviction is driven by the watermark,
  * so a 100 TB/day stream holds one tiny buffer per active user. */
object StatefulSessions {

  def sessions(events: Dataset[UserEvent], gapMs: Long,
               watermark: String = "2 hours"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._

    def summary(user: Long, b: SessionBuf): SessionSummary =
      SessionSummary(user, new Timestamp(b.start), new Timestamp(b.last), b.n)

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[UserEvent], state: GroupState[SessionBuf]) =>
          if (state.hasTimedOut) {
            val b = state.get
            state.remove()
            Iterator(summary(user, b))
          } else {
            val times = evs.map(_.ts.getTime).toSeq.sorted
            val out = ArrayBuffer.empty[SessionSummary]
            var buf = state.getOption
            times.foreach { t =>
              buf = buf match {
                case Some(b) if t - b.last > gapMs =>
                  out += summary(user, b)
                  Some(SessionBuf(t, t, 1))
                case Some(b) =>
                  Some(b.copy(last = math.max(b.last, t), n = b.n + 1))
                case None => Some(SessionBuf(t, t, 1))
              }
            }
            buf.foreach { b =>
              state.update(b)
              state.setTimeoutTimestamp(b.last + gapMs)
            }
            out.iterator
          }
      }
  }
}
