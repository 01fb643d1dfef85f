package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed by per-partition batch kernels. The Spark-side
  * plumbing (schema, partitioning, batch shape) is real; the actual codec
  * is a clearly-marked deterministic STUB because no image/audio libraries
  * ship in this environment — swap [[MediaKernels.decodeStub]] for a real
  * decoder (e.g. TwelveMonkeys/JavaCV) without touching the plan shape.
  *
  * Scale design: decode/feature kernels run via `mapPartitions` so a real
  * codec amortizes native-library init per partition (the same reason
  * PySpark uses mapInPandas batches); binary payloads never pass through a
  * shuffle — metadata extraction happens before any wide operation and the
  * binary column is pruned away by Catalyst where unused. */
object Multimodal {

  final case class MediaRow(doc_id: Long, content: Array[Byte], format: String)
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                                 width: Int, height: Int, checksum: Long)

  /** Wrap a text corpus as a binary media table (content = UTF-8 bytes;
    * format sniffed — here a deterministic fake keyed on payload length). */
  def asMediaTable(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).cast("long").as("doc_id"),
      col(text).cast("binary").as("content"),
      element_at(array(lit("jpeg"), lit("png"), lit("webp")),
        (length(col(text).cast("binary")) % 3 + 1).cast("int")).as("format"))

  object MediaKernels {
    /** STUB decoder — a real implementation would parse the container
      * header and decode pixel planes. Deterministic fake: dimensions and
      * checksum derived from the bytes so tests are repeatable. Replace the
      * body, keep the signature. */
    def decodeStub(row: MediaRow): MediaFeatures = {
      val n = row.content.length.toLong
      // ??? real codec goes here — fake: fold bytes into a checksum and
      // derive plausible dimensions from the payload size.
      var sum = 0L
      var i = 0
      while (i < row.content.length) {
        sum = (sum * 131 + (row.content(i) & 0xff)) % 1000000007L
        i += 1
      }
      MediaFeatures(row.doc_id, row.format, n,
        width = (n % 640 + 1).toInt, height = (n % 480 + 1).toInt,
        checksum = sum)
    }
  }

  /** Per-partition batched decode: the kernel sees an iterator per
    * partition (the batch), mirroring mapInPandas' batch contract. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      // per-partition init of a real codec would happen here, once
      batch.map(MediaKernels.decodeStub)
    }
  }
}
