package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The reference's write-side surface (SURVEY.md §2.5-§2.6): graph
  * registration (gds.write.nodes/relationships → GraphStoreCatalog.set,
  * GdsWriteJob.java:437-442), catalog lookup (GraphStoreCatalog.get,
  * GdsReadJob.java:57-59) and bulk import (import.bulk →
  * BulkImportJob.java:99-184).
  *
  * Design deltas vs the reference, deliberate (SURVEY.md §7.4):
  *  - the id map is a distributed zipWithIndex, not an in-heap
  *    ConcurrentHashMap (reference caps at ~2.1B nodes; ours is unbounded);
  *  - writes are synchronous-on-action and lossless (the reference ack's
  *    before post-processing finishes and can drop rows under backpressure
  *    — README.md:196-200, Producer.java:202-230);
  *  - rel properties are fully supported (reference cannot write them,
  *    README.md:180-182).
  */
final class GraphCatalog(spark: SparkSession) {

  private val graphs = TrieMap.empty[String, GraphRef]

  /** W1 + W2 — validate canonical columns and register. The adjacency /
    * degree builds stay lazy (they are plans on `rels`, materialized only
    * when a read job runs — same laziness Spark gives every DataFrame). */
  def register(name: String, nodes: DataFrame, rels: DataFrame): GraphRef = {
    require(nodes.columns.contains("ID") && nodes.columns.contains("LABELS"),
      "nodes must have canonical columns ID, LABELS")
    val needed = Seq("START_ID", "END_ID", "TYPE")
    require(needed.forall(rels.columns.contains),
      s"rels must have canonical columns ${needed.mkString(", ")}")
    val ref = GraphRef(nodes, rels)
    graphs.put(name, ref)
    ref
  }

  /** Catalog lookup; unknown name → NOT_FOUND-style failure
    * (GdsActionHandler returns NOT_FOUND, GdsReadJob.java:57-59). */
  def graph(name: String): GraphRef =
    graphs.getOrElse(name,
      throw new NoSuchElementException(s"graph not found: $name"))

  def list(): Seq[String] = graphs.keys.toSeq.sorted

  def drop(name: String): Boolean = graphs.remove(name).isDefined
}

object GraphCatalog {

  /** W1 id-map — originalId → dense offset, as a DataFrame to join on
    * (reference: ConcurrentHashMap built row-by-row,
    * GdsWriteJob.java:162-191). zipWithIndex is two narrow passes (count
    * per partition + offset add), no shuffle, unbounded cardinality. */
  def denseIdMap(nodes: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    val withIdx = nodes.select(col("ID")).rdd
      .map(_.getLong(0)).zipWithIndex()
      .map { case (id, idx) => Row(id, idx) }
    spark.createDataFrame(withIdx, StructType(Seq(
      StructField("ID", LongType, nullable = false),
      StructField("dense_id", LongType, nullable = false))))
  }

  /** S8 bulk import — write both tables as partitioned parquet under a
    * "database" directory (partitioned by label/type so downstream label
    * and type filters become partition pruning — the scan-level filter the
    * reference implements via filtered graph views, GdsReadJob.java:
    * 363-368). Returns the re-read graph, proving the round-trip. */
  def bulkImport(nodes: DataFrame, rels: DataFrame, dbDir: String): GraphRef = {
    val spark = nodes.sparkSession
    // partition directories key on the FIRST label (pruning for label
    // filters); the full LABELS array is stored in the row data, so
    // multi-label nodes round-trip losslessly — on read-back only the
    // derived partition column is dropped, never LABELS
    nodes
      .withColumn("label", element_at(col("LABELS"), 1))
      .write.mode("overwrite").partitionBy("label")
      .parquet(s"$dbDir/nodes")
    rels.write.mode("overwrite").partitionBy("TYPE").parquet(s"$dbDir/rels")
    val n = spark.read.parquet(s"$dbDir/nodes").drop("label")
    val r = spark.read.parquet(s"$dbDir/rels")
    GraphRef(n, r)
  }
}
