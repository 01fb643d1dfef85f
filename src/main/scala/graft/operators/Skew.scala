package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join strategies — the Spark-first rendition of the
  * reference's supernode machinery (SuperNodeCache.java:11-44,
  * KHop.java:59-81; analysis in SURVEY.md §7.4 risk 1). AQE's skew-join
  * splitting covers sort-merge joins automatically; these utilities cover
  * the two patterns AQE can't see in advance:
  *
  *  - [[saltedJoin]]: scatter a pathologically hot probe key across R salt
  *    buckets by replicating the build side R times — bounded 1/R skew by
  *    construction, for aggregations/joins where one key dominates;
  *  - [[degreeSplitJoin]]: the reference's exact trick — treat keys above a
  *    degree threshold as "supernodes", broadcast their (small, hot) build
  *    rows, and shuffle-join only the cold remainder. The hot-key set is
  *    computed from data statistics (a degree count), the driver-side
  *    heuristic SURVEY.md §4 calls for, because Catalyst cannot know graph
  *    skew before runtime.
  */
object Skew {

  /** Inner equi-join on `key` with the build side replicated over `salt`
    * buckets. Deterministic: the probe row's bucket is a hash of its whole
    * row. Result is row-for-row identical to `probe.join(build, key)`. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val p = probe.withColumn("_salt",
      pmod(xxhash64(struct(probe.columns.toIndexedSeq.map(col): _*)),
        lit(salt.toLong)))
    val b = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }

  /** Inner equi-join on `key`, split by build-side key frequency: keys with
    * more than `hotThreshold` build rows join via broadcast, the rest via
    * the normal shuffle join; the union is the exact join result. */
  def degreeSplitJoin(probe: DataFrame, build: DataFrame, key: String,
                      hotThreshold: Long): DataFrame = {
    val hotKeys = build.groupBy(col(key))
      .agg(count(lit(1)).as("_n"))
      .where(col("_n") > hotThreshold)
      .select(col(key))
    val hotProbe = probe.join(broadcast(hotKeys), Seq(key), "left_semi")
    val coldProbe = probe.join(broadcast(hotKeys), Seq(key), "left_anti")
    val hotBuild = build.join(broadcast(hotKeys), Seq(key), "left_semi")
    val coldBuild = build.join(broadcast(hotKeys), Seq(key), "left_anti")
    hotProbe.join(broadcast(hotBuild), Seq(key))
      .unionByName(coldProbe.join(coldBuild, Seq(key)))
  }

  /** Join/partition-key distribution profile — the statistic that decides
    * BETWEEN the strategies above (salt? split? plain shuffle?) before a
    * 100 TB join is launched. One row: key cardinality, row count, max /
    * median / p99 per-key frequency, the hottest key (min id among ties),
    * and the exact Gini concentration as an integer fraction
    * gini_num / gini_den (Gini = Σᵢ(2i−n−1)xᵢ / n·Σx over ascending xᵢ).
    *
    * Scale: the corpus-sized work is ONE hash aggregate (per-key counts).
    * Everything after runs on the count HISTOGRAM (distinct frequency
    * values — thousands at most, zipf or not), where the Gini folds into
    * per-frequency terms c·f·(2S+f−n) — no per-key global rank, no
    * corpus-sized window. The histogram window is a single partition by
    * construction and bounded by |distinct frequencies|, not |keys|.
    * Percentiles are exact: the frequency at ascending key-rank
    * ⌈q·n/100⌉. All arithmetic int64; ties in the Gini sum are
    * order-free (equal xᵢ commute). */
  def keyProfile(df: DataFrame, key: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
    val hist = counts.groupBy(col("cnt")).agg(count(lit(1)).as("f"))
    val cum = hist.withColumn("s",
      coalesce(sum(col("f")).over(
        W.orderBy(col("cnt")).rowsBetween(W.unboundedPreceding, -1)),
        lit(0L)))
    val tot = hist.agg(sum(col("f")).as("n_keys"),
      sum(col("cnt") * col("f")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    val prof = cum.join(broadcast(tot), lit(true))
      .groupBy(col("n_keys"), col("n_rows"), col("max_cnt"))
      .agg(
        sum(col("cnt") * col("f")
          * (lit(2L) * col("s") + col("f") - col("n_keys")))
          .as("gini_num"),
        min(when(col("s") + col("f") >= expr("(n_keys * 50 + 99) div 100"),
          col("cnt"))).as("p50_cnt"),
        min(when(col("s") + col("f") >= expr("(n_keys * 99 + 99) div 100"),
          col("cnt"))).as("p99_cnt"))
    val hot = counts
      .join(broadcast(tot.select(col("max_cnt").as("mx"))),
        col("cnt") === col("mx"))
      .agg(min(col("k")).as("hot_key"))
    prof.join(broadcast(hot), lit(true))
      .select(col("n_keys"), col("n_rows"), col("max_cnt"), col("p50_cnt"),
        col("p99_cnt"), col("hot_key"), col("gini_num"),
        (col("n_keys") * col("n_rows")).as("gini_den"))
  }
}
