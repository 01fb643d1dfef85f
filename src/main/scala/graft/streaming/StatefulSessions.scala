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
  * so a 100 TB/day stream holds one tiny buffer per active user.
  *
  * All gap arithmetic is exact MICROSECONDS ([[SessionBuf]] stores epoch
  * micros): `Timestamp.getTime` truncates to milliseconds, and a gap
  * straddling the threshold inside one millisecond would silently split
  * sessions differently from the micros-exact batch twin
  * (operators.Sessionize / the DuckDB oracle). */
object StatefulSessions {

  def sessions(events: Dataset[UserEvent], gapMs: Long,
               watermark: String = "2 hours"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMs * 1000L

    // local defs: the stateful closure must capture only serializable
    // locals, never the enclosing module (StreamTime is a standalone
    // top-level object — static access, no capture)
    def micros(t: Timestamp): Long = StreamTime.micros(t)
    def tsOf(us: Long): Timestamp =
      Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000))
    def summary(user: Long, b: SessionBuf): SessionSummary =
      SessionSummary(user, tsOf(b.start), tsOf(b.last), b.n)

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
            val times = evs.map(e => micros(e.ts)).toSeq.sorted
            val out = ArrayBuffer.empty[SessionSummary]
            var buf = state.getOption
            times.foreach { t =>
              buf = buf match {
                case Some(b) if t - b.last > gapUs =>
                  out += summary(user, b)
                  Some(SessionBuf(t, t, 1))
                case Some(b) =>
                  Some(b.copy(last = math.max(b.last, t), n = b.n + 1))
                case None => Some(SessionBuf(t, t, 1))
              }
            }
            buf.foreach { b =>
              state.update(b)
              // timeout API is millisecond-granular: round UP so the flush
              // never fires a microsecond early
              state.setTimeoutTimestamp(Math.floorDiv(b.last + gapUs, 1000L) + 1)
            }
            out.iterator
          }
      }
  }
}
