package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class PrefEvent(user_id: Long, ts: Timestamp, event_id: Long,
                     event_type: String, value: Double)

/** Per-user carry: the last event seen, as (epoch micros, event_id,
  * type, value). Constant size — the streaming matchup derivation holds
  * ONE predecessor per user where the batch lag window re-sorts the
  * whole corpus every run. */
case class PrefLast(t: Long, eid: Long, typ: String, v: Double)

case class PrefMatch(winner: String, loser: String)

/** STREAMING matchup derivation — the incremental twin of
  * [[graft.operators.Preference.matchups]] (the `pref_bt_strength` /
  * `pref_consistency` input): consecutive same-user events of different
  * type and different value are one match, higher value wins. Emitted
  * matchup rows feed the win-count aggregate, which is a sum monoid —
  * so the Bradley–Terry input table maintains itself continuously and
  * must land exactly on the batch counts.
  *
  * State per user is a constant-size [[PrefLast]] (the predecessor for
  * the next pair), never an event list. Each micro-batch sorts only
  * that user's batch slice by (event-time micros, event_id) — the same
  * total order as the batch lag window.
  *
  * Correctness contract: arrival must respect per-user event-time order
  * ACROSS micro-batches (the changelog contract the other incremental
  * gates use — [[StatefulFunnel]]'s note; the gate stages global
  * time-range files to enforce it, which preserves per-user order
  * because the cuts are on ts alone). Within a batch the sort restores
  * any intra-batch disorder — and a CROSS-batch violation fails loudly:
  * the carried (micros, event_id) predecessor key is compared against
  * each arriving event, so a late arrival raises instead of silently
  * pairing as-if-newest and drifting from the batch oracle. */
object StatefulMatchups {

  def matches(events: Dataset[PrefEvent]): Dataset[PrefMatch] = {
    val spark = events.sparkSession
    import spark.implicits._

    // local defs (the closure-capture convention of the sibling
    // operators): Spark-SQL double semantics for the JVM-side fold, so
    // the stream agrees with the batch twin's `=!=` / `>` comparisons
    // on EVERY double — SQL says NaN = NaN (Scala primitives say
    // NaN ≠ NaN) and −0.0 = 0.0 (Double.compare says they differ), and
    // NaN sorts above every other value.
    def sqlEq(a: Double, b: Double): Boolean =
      (a == b) || (a.isNaN && b.isNaN)
    def sqlGt(a: Double, b: Double): Boolean =
      !sqlEq(a, b) && java.lang.Double.compare(a, b) > 0

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[PrefEvent], state: GroupState[PrefLast]) =>
          val out = ArrayBuffer.empty[PrefMatch]
          var last = state.getOption
          evs.toSeq.sortBy(e => (StreamTime.micros(e.ts), e.event_id))
            .foreach { e =>
              val t = StreamTime.micros(e.ts)
              last.foreach { p =>
                if (t < p.t || (t == p.t && e.event_id < p.eid))
                  throw new IllegalStateException(
                    s"out-of-order arrival for user $user: event " +
                      s"(${e.event_id}, t=$t) after state predecessor " +
                      s"(${p.eid}, t=${p.t}) — the per-user time-ordered " +
                      "arrival contract is violated; stage sources by " +
                      "event-time ranges")
                // the predecessor ALWAYS advances (batch pairs are
                // consecutive regardless of whether the pair qualifies)
                if (p.typ != e.event_type && !sqlEq(p.v, e.value)) {
                  if (sqlGt(e.value, p.v))
                    out += PrefMatch(e.event_type, p.typ)
                  else out += PrefMatch(p.typ, e.event_type)
                }
              }
              last = Some(PrefLast(t, e.event_id, e.event_type, e.value))
            }
          last.foreach(state.update)
          out.iterator
      }
  }
}
