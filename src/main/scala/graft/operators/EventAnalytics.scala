package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics — the funnel / cohort workload family every
  * product-analytics OLAP engine ships as first-class operators. */
object EventAnalytics {

  /** Ordered funnel: how many entities completed stage 1, then stage 2
    * AFTER their stage-1 time, then stage 3 after stage 2, … Stage k's
    * qualifying time is the MINIMUM event time strictly after the
    * entity's stage-(k−1) time — the standard strict-order funnel
    * semantics (an earlier B does not count toward A→B).
    *
    * Each stage is one filtered aggregate joined to the previous stage's
    * per-entity times: k stages = k hash aggregates + k−1 equi-joins on
    * the entity key, all map-side combined — no windows, no sorting, no
    * per-entity event lists. Returns (stage, n_entities) with stage
    * numbered "1_<label>"… so sort order matches funnel order. */
  def funnel(events: DataFrame, entity: String, ts: String,
             stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    var reached: DataFrame = null
    val counts = stages.zipWithIndex.map { case ((label, pred), i) =>
      reached =
        if (i == 0)
          events.where(pred).groupBy(col(entity))
            .agg(min(col(ts)).as("_t"))
        else
          events.where(pred)
            .join(reached.select(col(entity), col("_t").as("_prev")), entity)
            .where(col(ts) > col("_prev"))
            .groupBy(col(entity)).agg(min(col(ts)).as("_t"))
      reached.agg(count(lit(1)).as("n_entities"))
        .select(lit(s"${i + 1}_$label").as("stage"), col("n_entities"))
    }
    counts.reduce(_ unionByName _)
  }

  /** WINDOWED strict-order funnel — the production form (ClickHouse's
    * `windowFunnel`, Amplitude conversion windows): every later stage
    * must happen AFTER the previous stage's match and WITHIN `windowUs`
    * of the stage-1 time. Greedy earliest-match per stage is OPTIMAL
    * here, not merely conventional: the deadline is common to all
    * stages, so taking the earliest qualifying event can only leave
    * more room for the stages after it. Same cost shape as [[funnel]]:
    * k hash aggregates + k−1 equi-joins on the entity key, no windows,
    * no per-entity event lists. */
  def funnelWithin(events: DataFrame, entity: String, ts: String,
                   stages: Seq[(String, Column)],
                   windowUs: Long): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    var reached: DataFrame = null         // (entity, _t, _t1)
    val counts = stages.zipWithIndex.map { case ((label, pred), i) =>
      reached =
        if (i == 0)
          events.where(pred).groupBy(col(entity))
            .agg(min(col(ts)).as("_t"))
            .withColumn("_t1", col("_t"))
        else
          events.where(pred)
            .join(reached.select(col(entity), col("_t").as("_prev"),
              col("_t1")), entity)
            .where(col(ts) > col("_prev") &&
              unix_micros(col(ts)) <= unix_micros(col("_t1")) + windowUs)
            .groupBy(col(entity))
            .agg(min(col(ts)).as("_t"), min(col("_t1")).as("_t1"))
      reached.agg(count(lit(1)).as("n_entities"))
        .select(lit(s"${i + 1}_$label").as("stage"), col("n_entities"))
    }
    counts.reduce(_ unionByName _)
  }

  /** Cohort retention: entities grouped by the period of their FIRST
    * event (the cohort); for each later period, how many of the cohort
    * were active. Periods are integer buckets of event time
    * (`periodUs`), offsets are periods since the cohort period — the
    * classic retention triangle, all int64.
    *
    * Two hash aggregates (first-event per entity; distinct active
    * periods per entity) + one equi-join on the entity key. Returns
    * (cohort_period, period_offset, n_active). */
  def cohortRetention(events: DataFrame, entity: String, ts: String,
                      periodUs: Long): DataFrame = {
    val period = expr(s"unix_micros($ts) div ${periodUs}L")
    val cohort = events.groupBy(col(entity))
      .agg(min(period).as("cohort_period"))
    val active = events.select(col(entity), period.as("p")).distinct()
    active.join(cohort, entity)
      .groupBy(col("cohort_period"),
        (col("p") - col("cohort_period")).as("period_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Market-basket pair counts — A-Priori's pairwise candidate scan.
    * Distinct items per basket, co-occurrence counted over each
    * basket's item pairs. Baskets above `maxBasket` items are dropped
    * whole: the quadratic guard (a 10⁶-item basket would alone emit
    * 5·10¹¹ pairs) — the same bounded-candidate-generation discipline
    * as the dedup DF caps, replicated by the oracle. Top-k pairs by
    * (cnt DESC, a, b) through TakeOrderedAndProject — O(k) per
    * partition crosses the final shuffle. Returns (a, b, cnt). */
  def basketPairs(df: DataFrame, basket: String, item: String,
                  maxBasket: Int, k: Int): DataFrame =
    cappedItems(df, basket, item, maxBasket) match { case ok =>
      pairCounts(ok)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(k)
    }

  /** Distinct (basket, item) pairs from baskets within the size cap. */
  private def cappedItems(df: DataFrame, basket: String, item: String,
                          maxBasket: Int): DataFrame = {
    val items = df.select(col(basket).as("bk"), col(item).as("it"))
      .distinct().localCheckpoint(true)
    val small = items.groupBy(col("bk")).agg(count(lit(1)).as("bsz"))
      .where(col("bsz") <= maxBasket).select(col("bk"))
    items.join(small, Seq("bk"), "left_semi")
  }

  private def pairCounts(ok: DataFrame): DataFrame =
    ok.as("x").join(ok.as("y"),
        col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
      .groupBy(col("x.it").as("a"), col("y.it").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Association rules from the pair scan: both directed rules per
    * co-occurring pair with exact integer metrics —
    * conf(x→y) = ⌊cnt·10⁶ / n(x)⌋ and lift = ⌊cnt·N·10⁶ / (n(x)·n(y))⌋
    * ppm, where n(i) counts capped baskets containing i and N the
    * capped baskets. Top-k by (lift DESC, x, y) via
    * TakeOrderedAndProject. Returns (x, y, cnt, conf_ppm, lift_ppm). */
  def assocRules(df: DataFrame, basket: String, item: String,
                 maxBasket: Int, k: Int): DataFrame = {
    val ok = cappedItems(df, basket, item, maxBasket).localCheckpoint(true)
    val pairs = pairCounts(ok)
    val itemN = ok.groupBy(col("it")).agg(count(lit(1)).as("n"))
    val totalN = ok.select(col("bk")).distinct()
      .agg(count(lit(1)).as("nb"))
    val directed = pairs.select(col("a").as("x"), col("b").as("y"),
        col("cnt"))
      .union(pairs.select(col("b"), col("a"), col("cnt")))
    directed
      .join(itemN.select(col("it").as("x"), col("n").as("nx")), "x")
      .join(itemN.select(col("it").as("y"), col("n").as("ny")), "y")
      .join(broadcast(totalN), lit(true))
      .select(col("x"), col("y"), col("cnt"),
        expr("cnt * 1000000 div nx").as("conf_ppm"),
        expr("cnt * nb * 1000000 div (nx * ny)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("x"), col("y"))
      .limit(k)
  }

  /** A-priori level-3: frequent triples grown ONLY from frequent pairs —
    * the candidate-pruning step that makes large-scale itemset mining
    * tractable (counting all C(b,3) triples per basket is the naive
    * blowup; growing from the frequent-pair lattice bounds the scan by
    * frequent-pair occurrences). Pipeline: frequent pairs (support ≥
    * minSup) → pair occurrences semi-joined to them → extend by a third
    * item (c > b) → A-priori prune ((a,c) AND (b,c) must be frequent) →
    * count, keep support ≥ minSup, top-k (cnt DESC, a, b, c).
    * Returns (a, b, c, cnt). */
  def assocTriples(df: DataFrame, basket: String, item: String,
                   maxBasket: Int, minSup: Long, k: Int): DataFrame = {
    val ok = cappedItems(df, basket, item, maxBasket).localCheckpoint(true)
    val pairs = ok.as("x").join(ok.as("y"),
        col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
      .groupBy(col("x.it").as("a"), col("y.it").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val fp = pairs.where(col("cnt") >= minSup)
      .select(col("a"), col("b")).localCheckpoint(true)
    val pairOcc = ok.as("x").join(ok.as("y"),
        col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
      .select(col("x.bk").as("bk"), col("x.it").as("a"),
        col("y.it").as("b"))
      .join(fp, Seq("a", "b"), "left_semi")
    pairOcc.as("po").join(ok.as("z"),
        col("po.bk") === col("z.bk") && col("z.it") > col("po.b"))
      .select(col("po.bk"), col("po.a").as("a"), col("po.b").as("b"),
        col("z.it").as("c"))
      .join(fp.select(col("a"), col("b").as("c")), Seq("a", "c"),
        "left_semi")
      .join(fp.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"),
        "left_semi")
      .groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minSup)
      .orderBy(col("cnt").desc, col("a"), col("b"), col("c"))
      .limit(k)
  }

  /** Top event paths ("user journeys"): per (entity, day) session, the
    * ordered sequence of the first `maxLen` event types joined with
    * ">", counted corpus-wide, top-k (count DESC, path ASC). The
    * per-session list is collected ONCE and sorted array-locally
    * ((ts, tiebreak) struct sort — deterministic under any partitioning
    * or retry); sessions are bounded by per-entity-per-day activity, so
    * the collected array never scales with the corpus. Final rank via
    * TakeOrdered. Returns (path, n). */
  def topPaths(events: DataFrame, entity: String, ts: String,
               tiebreak: String, typ: String, maxLen: Int,
               k: Int): DataFrame = {
    val sessions = events
      .groupBy(col(entity).as("u"),
        expr(s"unix_micros($ts) div 86400000000L").as("d"))
      .agg(concat_ws(">",
        slice(transform(
          sort_array(collect_list(struct(col(ts).as("t1"),
            col(tiebreak).as("t2"), col(typ).as("t3")))),
          s => s.getField("t3")), 1, maxLen)).as("path"))
    sessions.groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(k)
  }

  /** First-order Markov transition matrix of event types — the
    * behavioral-model statistic behind "what happens after a click":
    * per entity, consecutive event pairs in (ts, tiebreak) order become
    * (from_type, to_type) transitions; counts row-normalize to exact
    * integer ppm. Returns (from_type, to_type, cnt, p_ppm).
    *
    * Scale: ONE per-entity window (hash-partitioned by the entity key —
    * billions of small partitions, never a global sort) + two hash
    * aggregates over the type×type matrix (alphabet-bounded). */
  def transitionMatrix(events: DataFrame, entity: String, ts: String,
                       tiebreak: String, typ: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entity)).orderBy(col(ts), col(tiebreak))
    val trans = events
      .select(col(entity), col(typ).as("from_type"),
        lead(col(typ), 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val totals = trans.groupBy(col("from_type"))
      .agg(sum(col("cnt")).as("tot"))
    trans.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("cnt"),
        expr("cnt * 1000000 div tot").as("p_ppm"))
  }

  /** Temporal precedence matrix: for each ordered type pair (a, b), how
    * many entities saw a STRICTLY before b — first occurrences compared,
    * unlike [[transitionMatrix]]'s adjacent steps, so "signup precedes
    * purchase" counts however many events sit between them. Ties (equal
    * first-occurrence micros) are skipped: neither order is evidenced.
    *
    * Scale: events collapse per (entity, type) to the first-occurrence
    * row — bounded by entities × type alphabet — and the self-join is
    * per-entity, at most |alphabet|² pairs each. Returns
    * (type_a, type_b, n_entities). */
  def precedencePairs(events: DataFrame, entity: String, ts: String,
                      typ: String): DataFrame = {
    val first = events
      .groupBy(col(entity), col(typ))
      .agg(min(expr(s"unix_micros($ts)")).as("first_us"))
    first.as("x").join(first.as("y"), col(s"x.$entity") === col(s"y.$entity"))
      .where(col("x.first_us") < col("y.first_us"))
      .groupBy(col(s"x.$typ").as("type_a"), col(s"y.$typ").as("type_b"))
      .agg(count(lit(1)).as("n_entities"))
  }

  /** RFM (recency / frequency / monetary) customer scoring — the classic
    * segmentation every commerce warehouse derives from its purchase
    * stream. Recency anchors on the CORPUS max purchase time (a 1-row
    * broadcast), so the scores are a pure function of the data, not of
    * wall-clock; monetary sums ⌊100·value⌋ cents for engine-exact
    * integer totals. Fixed threshold tiers (3/2/1 per axis) and the
    * composite rfm = 100·r + 10·f + m. One filtered aggregate per user
    * + one broadcast join — no windows, no sorting. Returns (user_id,
    * r_days, f, m_cents, r_score, f_score, m_score, rfm). */
  def rfmScores(events: DataFrame, entity: String, ts: String,
                value: Column, convPred: Column): DataFrame = {
    val p = events.where(convPred).select(col(entity).as("user_id"),
      expr(s"unix_micros($ts)").as("tus"),
      floor(value * 100).cast("long").as("cents"))
    val maxT = p.agg(max(col("tus")).as("maxt"))
    p.groupBy(col("user_id"))
      .agg(max(col("tus")).as("last_us"), count(lit(1)).as("f"),
        sum(col("cents")).as("m_cents"))
      .join(broadcast(maxT), lit(true))
      .select(col("user_id"),
        expr("(maxt - last_us) div 86400000000").as("r_days"),
        col("f"), col("m_cents"))
      .withColumn("r_score", when(col("r_days") <= 2, 3L)
        .when(col("r_days") <= 7, 2L).otherwise(1L))
      .withColumn("f_score", when(col("f") >= 15, 3L)
        .when(col("f") >= 10, 2L).otherwise(1L))
      .withColumn("m_score", when(col("m_cents") >= 50000L, 3L)
        .when(col("m_cents") >= 20000L, 2L).otherwise(1L))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
  }

  /** Multi-touch attribution over a conversion lookback window: for each
    * conversion event, every touch by the same entity in the
    * `lookbackUs`-microsecond window strictly before it shares the
    * credit — linear weight = ⌊10⁶ / n_touches⌋ ppm each, plus the
    * first- and last-touch ids (the two single-touch models come free
    * from the same aggregate; ties broken by event id). Conversions with
    * no touch in window are reported with n_touches = 0 — the
    * "organic" bucket an inner join would silently drop.
    *
    * One equi-join on the entity key restricted by the time band (the
    * per-entity touch set is the join's unit of work — no windows over
    * the global stream, no per-entity event lists), then one aggregate
    * keyed by conversion. Returns (conv_id, n_touches, weight_ppm,
    * first_touch, last_touch). */
  def attribution(events: DataFrame, entity: String, ts: String,
                  id: String, touchPred: Column, convPred: Column,
                  lookbackUs: Long): DataFrame = {
    val t = events.where(touchPred).select(col(entity).as("_e"),
      expr(s"unix_micros($ts)").as("_tus"), col(id).as("_tid"))
    val c = events.where(convPred).select(col(entity).as("_e"),
      expr(s"unix_micros($ts)").as("_cus"), col(id).as("conv_id"))
    c.join(t, Seq("_e"), "left")
      .withColumn("_in", col("_tus").isNotNull &&
        col("_tus") < col("_cus") &&
        col("_tus") >= col("_cus") - lookbackUs)
      .groupBy(col("conv_id"))
      .agg(sum(when(col("_in"), 1L).otherwise(0L)).as("n_touches"),
        min(when(col("_in"), struct(col("_tus"), col("_tid")))).as("_f"),
        max(when(col("_in"), struct(col("_tus"), col("_tid")))).as("_l"))
      .select(col("conv_id"), col("n_touches"),
        when(col("n_touches") > 0,
          expr("1000000 div n_touches")).otherwise(0L).as("weight_ppm"),
        col("_f._tid").as("first_touch"), col("_l._tid").as("last_touch"))
  }
}
