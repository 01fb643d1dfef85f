package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture compaction — the "apply changelog" primitive under
  * every lakehouse MERGE / SCD pipeline: collapse a stream of keyed change
  * records to the latest state per key, honoring tombstones.
  *
  * Scale rationale: the naive form is a window (`row_number() OVER
  * (PARTITION BY key ORDER BY seq DESC)`), which sorts EVERY key's full
  * history inside the shuffle — at 100 TB of changelog that is a sort of
  * the whole table. Compaction here is ONE hash aggregate: recency rides a
  * struct whose first field is the change id, so `max(struct(seq, …))` is
  * "latest record" by lexicographic struct order, map-side combining
  * reduces each partition to one candidate row per key before anything
  * crosses the wire, and no sort happens anywhere. Tombstone keys are
  * dropped AFTER the aggregate — a key deleted then re-inserted correctly
  * survives with its newest payload.
  */
object Changelog {

  /** Latest-record-wins compaction. `seq` must be a unique, monotone
    * change id (a commit LSN / Kafka offset — here `event_id`); ties are
    * impossible by contract so the result is deterministic under any
    * input order, partitioning, or task retry. Rows where `isDelete`
    * holds are tombstones: they participate in recency (a delete newer
    * than every upsert removes the key) but never appear in the output.
    * Output columns: key, then `last_<c>` for every payload column in
    * input order.
    */
  def compactLatest(changes: DataFrame, key: String, seq: String,
                    isDelete: Column): DataFrame = {
    val payload = changes.columns.filterNot(_ == key).toSeq
    val packed = struct(
      (col(seq) +: payload.filterNot(_ == seq).map(col)) :+
        isDelete.as("_is_delete"): _*)
    changes
      .groupBy(col(key))
      .agg(max(packed).as("_latest"))
      .where(!col("_latest._is_delete"))
      .select(col(key) +: payload.map(c =>
        col(s"_latest.$c").as(s"last_$c")): _*)
  }

  /** State-form compaction — the MERGE step of an incremental
    * materialization: the same latest-wins aggregate as [[compactLatest]]
    * but KEEPING tombstone rows and original column names, because in an
    * incremental state a tombstone must survive to defeat late-arriving
    * older records for its key (a filtered state would resurrect deleted
    * keys on the next merge). Input must carry a boolean `_is_delete`
    * column; output has the same schema, one row per key. The operation
    * is associative and commutative over change-sets (max over a unique
    * seq), so merges can apply in any batch order. */
  def compactState(state: DataFrame, key: String, seq: String): DataFrame = {
    val payload = state.columns.filterNot(c => c == key || c == seq).toSeq
    state.groupBy(col(key))
      .agg(max(struct(col(seq) +: payload.map(col): _*)).as("_m"))
      .select(col(key) +: (seq +: payload).map(c => col(s"_m.$c").as(c)): _*)
  }

  /** SCD Type-2 history build: every change record becomes a versioned
    * row valid over [`valid_from` = its seq, `valid_to` = the key's next
    * seq), with `valid_to` NULL on the key's current version — the
    * slowly-changing-dimension layout time-travel joins read. Tombstones
    * CLOSE the previous version's interval (they bound its `valid_to`)
    * but emit no row themselves, so a deleted key simply has no open
    * version.
    *
    * Unlike [[compactLatest]] this one IS a window — by design: interval
    * endpoints are a per-key order statistic, and the per-key sort is the
    * semantics. The partition key is the dimension key, so state and sort
    * are bounded by one key's change count (bounded by retention in a
    * real changelog), never by table size.
    */
  def scd2(changes: DataFrame, key: String, seq: String,
           isDelete: Column): DataFrame = {
    val payload = changes.columns.filterNot(c => c == key || c == seq).toSeq
    val w = Window.partitionBy(col(key)).orderBy(col("valid_from"))
    changes
      .select(col(key) +: col(seq).as("valid_from") +:
        isDelete.as("_is_delete") +: payload.map(col): _*)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .where(!col("_is_delete"))
      .select(col(key) +: payload.map(col) :+
        col("valid_from") :+ col("valid_to"): _*)
  }

  /** Snapshot diff — the audit step between two versions of a dataset
    * (yesterday's corpus vs today's): per status `added` / `removed` /
    * `changed` / `unchanged`, the row count and an exact id checksum.
    * Payload equality is judged on a content digest, never the payload
    * itself — at 100 TB the full-outer join carries 16-byte hashes, not
    * documents.
    *
    * Scale: one full-outer hash join on the key plus one 4-row
    * aggregate; both sides project to (id, digest) before shuffling so
    * the exchange volume is keys + digests regardless of payload size. */
  def datasetDiff(oldDf: DataFrame, newDf: DataFrame, id: String,
                  payload: String): DataFrame = {
    val o = oldDf.select(col(id).as("id"), md5(col(payload)).as("h_old"))
    val n = newDf.select(col(id).as("id"), md5(col(payload)).as("h_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("id_checksum"))
  }
}
