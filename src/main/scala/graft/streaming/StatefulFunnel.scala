package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

/** Per-user funnel state: how many stages are complete and the event-time
  * (epoch micros) of the last completed stage. Constant size — the whole
  * point of maintaining a funnel in-stream is NOT holding event lists. */
case class FunnelState(stage: Int, t: Long)

case class FunnelProgress(user_id: Long, stage: Long)

/** STREAMING strict-order funnel maintenance — the incremental twin of
  * [[graft.operators.EventAnalytics.funnel]] (same semantics as the
  * `funnel_stages` gate, maintained continuously instead of recomputed).
  *
  * State per user is a constant-size [[FunnelState]] — stage index plus
  * one timestamp — so a 100 TB/day event stream holds a few bytes per
  * active user, never a per-user event list. Each micro-batch sorts only
  * that user's batch slice by event time (bounded by per-user batch
  * volume) and advances the stage greedily on the first qualifying event.
  *
  * Correctness contract: arrival must respect per-user event-time order
  * ACROSS micro-batches (the changelog contract every incremental gate
  * here uses; the gate stages time-range files to enforce it). Under
  * time-ordered arrival, greedy earliest-match IS the batch funnel's
  * min-time matching: stage k's first qualifying event in scan order is
  * exactly `min(ts) where ts > t_{k-1}`, so the furthest stage reached
  * per user equals batch membership — ties at stage boundaries included,
  * because advancing requires STRICTLY later time on both sides. */
object StatefulFunnel {

  def progress(events: Dataset[FunnelEvent],
               stages: Seq[String]): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "need at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    // serializable local (the closure must not capture the module)
    val stageSeq = stages.toIndexedSeq

    def micros(t: Timestamp): Long = StreamTime.micros(t)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          evs.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
            if (st.stage < stageSeq.length &&
                e.event_type == stageSeq(st.stage) &&
                (st.stage == 0 || micros(e.ts) > st.t))
              st = FunnelState(st.stage + 1, micros(e.ts))
          }
          state.update(st)
          Iterator(FunnelProgress(user, st.stage.toLong))
      }
  }
}
