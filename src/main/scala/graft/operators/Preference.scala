package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise-preference analytics — the aggregation stage of an
  * RLHF / reward-model data pipeline. Raw preference logs are pairwise
  * verdicts ("A beat B"); before training on them a pipeline wants the
  * per-item strength table (Bradley–Terry), and a consistency audit of
  * the judgments themselves (how cyclic is the majority tournament).
  * Everything here is integer arithmetic on counts, so the DuckDB
  * oracles replay each fixed-point iteration exactly.
  *
  * The reference engine (neo4j-arrow) has no preference surface at all;
  * these belong to the §2.7 "categories the reference lacks" family.
  */
object Preference {

  /** Derive a deterministic matchup log from an event stream: within
    * each user's timeline (ordered by ts, then event_id for exact
    * tie-breaks), every consecutive pair of events of DIFFERENT types
    * with DIFFERENT values is one match — the type with the larger
    * value wins. Returns (winner, loser), one row per match.
    *
    * Scale: the lag window partitions by user — per-key sequential
    * state, O(1) per row, never a corpus-scale window. A pathological
    * user with billions of events would be time-bucketed first (the
    * sessionization split); the synthetic data caps at ~100 events per
    * user. */
  def matchups(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("pt", lag(col("event_type"), 1).over(w))
      .withColumn("pv", lag(col("value"), 1).over(w))
      .where(col("pt").isNotNull && col("pt") =!= col("event_type") &&
        col("pv") =!= col("value"))
      .select(
        when(col("value") > col("pv"), col("event_type"))
          .otherwise(col("pt")).as("winner"),
        when(col("value") > col("pv"), col("pt"))
          .otherwise(col("event_type")).as("loser"))
  }

  /** Directed win counts: (winner i, loser j, c = #i-beat-j). */
  private def winCounts(m: DataFrame): DataFrame =
    m.groupBy(col("winner"), col("loser"))
      .agg(count(lit(1)).as("c"))

  /** Bradley–Terry strengths by `iters` rounds of the MM fixed point
    * (Hunter 2004), integer-exact: with SCALE = 10^6 and all strengths
    * starting at SCALE,
    *
    *   d_ij = (n_ij · SCALE²) div max(s_i + s_j, 1)
    *   s_i' = (W_i · SCALE²) div max(Σ_j d_ij, 1)
    *
    * where W_i = total wins of i and n_ij = matches between i and j.
    * Every operand is non-negative, so Spark's `div` and DuckDB's `//`
    * agree bit-for-bit and the oracle unrolls the rounds as CTEs. No
    * normalization between rounds: the fixed iteration count makes the
    * (scale-drifting) raw MM sequence itself the contract.
    *
    * Overflow bounds (int64): n_ij, W_i ≤ ~9.2·10^6 before the ·10^12
    * products wrap. BT is invariant to scaling ALL counts by a common
    * factor, so a 100 TB log first floor-divides every count by
    * 2^⌈log₂(maxW / 9·10^6)⌉ — same fixpoint, bounded operands.
    *
    * Items = every type appearing in any match (zero-win items keep
    * strength 0 after round 1 — the MM limit for winless players).
    * Item vocabulary is bounded (event types / model ids), so each
    * round is a broadcast-sized self-join, never a corpus scan: the
    * corpus is touched once, by [[matchups]].
    *
    * Returns (item, wins, matches, strength). */
  def btStrength(events: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val wl = winCounts(matchups(events)).localCheckpoint(true)
    // symmetric match counts n_ij (both orientations present)
    val n = wl.select(col("winner").as("i"), col("loser").as("j"), col("c"))
      .unionByName(
        wl.select(col("loser").as("i"), col("winner").as("j"), col("c")))
      .groupBy(col("i"), col("j")).agg(sum(col("c")).as("n"))
    val items = n.groupBy(col("i").as("item"))
      .agg(sum(col("n")).as("matches"))
      .join(wl.groupBy(col("winner").as("item"))
          .agg(sum(col("c")).as("w")),
        Seq("item"), "left")
      .select(col("item"), coalesce(col("w"), lit(0L)).as("wins"),
        col("matches"))
      .localCheckpoint(true)
    var s = items.select(col("item"), lit(1000000L).as("st"))
    for (_ <- 1 to iters) {
      val d = n
        .join(s.select(col("item").as("i"), col("st").as("si")), Seq("i"))
        .join(s.select(col("item").as("j"), col("st").as("sj")), Seq("j"))
        .groupBy(col("i").as("item"))
        .agg(sum(expr(
          "(n * 1000000000000) div greatest(si + sj, 1)")).as("dd"))
      s = items.join(d, Seq("item"))
        .select(col("item"),
          expr("(wins * 1000000000000) div greatest(dd, 1)").as("st"))
    }
    items.join(s, Seq("item"))
      .select(col("item"), col("wins"), col("matches"),
        col("st").as("strength"))
  }

  /** Judgment-consistency audit of the majority tournament: draw the
    * directed edge i→j iff i beat j strictly more often than j beat i
    * (equal counts = a tied pair, no edge), then count cyclic triads —
    * i→j→k→i triples, each counted once via its minimum vertex. Kendall's
    * coefficient of consistency ζ = 1 − cycles/maxCycles, reported as
    * exact ppm with maxCycles = n(n²−4)/24 for even n, n(n²−1)/24 for
    * odd (Kendall & Babington Smith 1940).
    *
    * One summary row: (n_items, n_edges, n_tied_pairs, cyclic_triads,
    * max_triads, consistency_ppm). Item vocabulary is bounded, so the
    * triangle join runs on a broadcast-sized edge list; the corpus is
    * scanned once by [[matchups]]. */
  def cyclicTriads(events: DataFrame): DataFrame = {
    val wl = winCounts(matchups(events)).localCheckpoint(true)
    val rev = wl.select(col("winner").as("loser2"),
      col("loser").as("winner2"), col("c").as("rc"))
    val paired = wl.join(rev,
      col("winner") === col("winner2") && col("loser") === col("loser2"),
      "left")
      .select(col("winner"), col("loser"), col("c"),
        coalesce(col("rc"), lit(0L)).as("rc"))
    val edges = paired.where(col("c") > col("rc"))
      .select(col("winner").as("a"), col("loser").as("b"))
      .localCheckpoint(true)
    val nItems = wl
      .select(col("winner").as("item"))
      .unionByName(wl.select(col("loser").as("item")))
      .distinct().agg(count(lit(1)).as("n_items"))
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    val nTied = paired
      .where(col("c") === col("rc") && col("winner") < col("loser"))
      .agg(count(lit(1)).as("n_tied_pairs"))
    val cyc = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .join(edges.as("e3"),
        col("e2.b") === col("e3.a") && col("e3.b") === col("e1.a"))
      .where(col("e1.a") < col("e1.b") && col("e1.a") < col("e2.b"))
      .agg(count(lit(1)).as("cyclic_triads"))
    nItems.join(nEdges, lit(true)).join(nTied, lit(true))
      .join(cyc, lit(true))
      .select(col("n_items"), col("n_edges"), col("n_tied_pairs"),
        col("cyclic_triads"),
        expr("""CASE WHEN n_items % 2 = 0
               |  THEN (n_items * (n_items * n_items - 4)) div 24
               |  ELSE (n_items * (n_items * n_items - 1)) div 24
               |END""".stripMargin).as("max_triads"))
      .select(col("*"),
        expr("""CASE WHEN max_triads > 0
               |  THEN ((max_triads - cyclic_triads) * 1000000)
               |       div max_triads
               |  ELSE 1000000 END""".stripMargin).as("consistency_ppm"))
  }
}
