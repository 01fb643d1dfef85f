package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap-session processor on `transformWithState` — Spark 4's successor to
  * flatMapGroupsWithState (typed named state, first-class event-time
  * timers, RocksDB column families). Semantics are identical to
  * [[StatefulSessions]]: a completed session is emitted the moment a gap
  * is observed in-stream, and the dangling session flushes via an
  * event-time TIMER once the watermark passes last+gap (the timer replaces
  * the old API's GroupStateTimeout). Gap arithmetic is exact micros, same
  * as the batch twin.
  *
  * Timers are not deregistered on session extension (the API has
  * deleteTimer, but tracking the previous expiry in state costs a second
  * state column); instead a fired timer re-checks the CURRENT buffer's
  * expiry and ignores itself if a newer event extended the session —
  * standard stale-timer guard. */
class SessionProcessor(gapUs: Long)
    extends StatefulProcessor[Long, UserEvent, SessionSummary] {

  @transient private var buf: ValueState[SessionBuf] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getValueState[SessionBuf]("session",
      Encoders.product[SessionBuf], TTLConfig.NONE)

  private def micros(t: Timestamp): Long = StreamTime.micros(t)
  private def tsOf(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000))
  private def summary(user: Long, b: SessionBuf): SessionSummary =
    SessionSummary(user, tsOf(b.start), tsOf(b.last), b.n)
  private def expiryMs(b: SessionBuf): Long =
    Math.floorDiv(b.last + gapUs, 1000L) + 1 // round UP: never a µs early

  override def handleInputRows(user: Long, rows: Iterator[UserEvent],
      timerValues: TimerValues): Iterator[SessionSummary] = {
    val times = rows.map(e => micros(e.ts)).toSeq.sorted
    val out = ArrayBuffer.empty[SessionSummary]
    var cur = if (buf.exists()) Some(buf.get()) else None
    times.foreach { t =>
      cur = cur match {
        case Some(b) if t - b.last > gapUs =>
          out += summary(user, b)
          Some(SessionBuf(t, t, 1))
        case Some(b) =>
          Some(b.copy(last = math.max(b.last, t), n = b.n + 1))
        case None => Some(SessionBuf(t, t, 1))
      }
    }
    cur.foreach { b =>
      buf.update(b)
      getHandle.registerTimer(expiryMs(b))
    }
    out.iterator
  }

  override def handleExpiredTimer(user: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSummary] = {
    if (buf.exists()) {
      val b = buf.get()
      if (expiredTimerInfo.getExpiryTimeInMs >= expiryMs(b)) {
        buf.clear()
        Iterator(summary(user, b))
      } else Iterator.empty // stale timer: the session was extended
    } else Iterator.empty
  }
}

object StatefulSessionsTws {

  /** Same contract as [[StatefulSessions.sessions]], on the
    * transformWithState API. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — transformWithState needs
    * multiple column families, which the HDFS-backed store lacks. */
  def sessions(events: Dataset[UserEvent], gapMs: Long,
               watermark: String = "2 hours"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
