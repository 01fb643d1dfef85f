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
}
