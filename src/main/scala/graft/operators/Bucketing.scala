package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) joins — the pre-partitioning strategy for joins
  * that repeat on the same key at 100 TB: both sides written
  * `bucketBy(n, key).sortBy(key)` hash-place rows so a later sort-merge
  * join needs NO exchange and no sort — the scan itself satisfies the
  * join's required distribution and ordering. This is the durable form of
  * the reference's id-map/adjacency co-location (its in-memory graph keeps
  * nodes and adjacency on the same dense-id layout; bucketing is the same
  * idea surviving restarts and shared across jobs). */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two previously bucketed tables on their bucket key. The caller
    * can verify the plan has no Exchange (see BucketingSpec). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
