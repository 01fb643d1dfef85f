package graft.streaming

import java.sql.Timestamp

/** Epoch-micros conversion shared by the stateful streaming operators.
  * A dedicated top-level object: closures reference it as a static
  * module access (no capture of the enclosing operator object — the
  * serialization concern the per-operator local defs used to address,
  * now in ONE copy). `Timestamp.getTime` truncates to milliseconds, so
  * every operator that compares event times goes through here to stay
  * micros-exact with the batch twins and the DuckDB oracles. */
object StreamTime {
  def micros(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000
  }
}
