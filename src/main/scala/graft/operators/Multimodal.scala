package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed by per-partition batch kernels. The container
  * HEADER parsing is real — [[MediaKernels.decode]] reads PNG IHDR and
  * JPEG SOF dimensions from the raw bytes with no external library —
  * while full pixel decoding (which would need an image codec that does
  * not ship in this environment) falls back to a clearly-marked
  * deterministic pseudo-decode for non-image payloads; swap the fallback
  * for a real codec (e.g. TwelveMonkeys/JavaCV) without touching the plan
  * shape.
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

  /** Wrap a text corpus as REAL image containers: each document becomes a
    * byte-valid PNG (signature + IHDR) or JPEG (SOI + APP0 + SOF0) whose
    * header carries deterministic dimensions derived from the payload
    * size, followed by the text bytes as payload. Both headers are 33
    * bytes. The whole construction is codegen'd column algebra
    * (`unhex`/`lpad`/`hex`/`concat`) — no UDF — and exercises
    * [[MediaKernels.decode]]'s actual header parser end-to-end: the gate
    * oracle recomputes the dimensions from the size formula while the
    * Spark side must recover them from the binary headers. */
  def asSyntheticImages(docs: DataFrame, id: String, text: String): DataFrame = {
    val n = length(col(text).cast("binary"))
    val w = (n % 640 + 1).cast("int")
    val h = (n % 480 + 1).cast("int")
    def be(c: Column, hexDigits: Int): Column =
      unhex(lpad(hex(c), hexDigits, "0"))
    val pngHeader = concat(
      unhex(lit("89504E470D0A1A0A")),   // PNG signature
      unhex(lit("0000000D49484452")),   // IHDR chunk length (13) + tag
      be(w, 8), be(h, 8),               // width, height (u32 BE)
      unhex(lit("0806000000")),         // depth 8, RGBA, std compression
      unhex(lit("00000000")))           // CRC placeholder (not validated)
    val jpegHeader = concat(
      unhex(lit("FFD8")),                                    // SOI
      unhex(lit("FFE000104A46494600010100000100010000")),    // APP0 JFIF
      unhex(lit("FFC0000B08")),                              // SOF0, len 11
      be(h, 4), be(w, 4),               // height, width (u16 BE)
      unhex(lit("01011100")))           // 1 component, no subsampling
    docs.select(col(id).cast("long").as("doc_id"),
      concat(when(n % 2 === 0, pngHeader).otherwise(jpegHeader),
        col(text).cast("binary")).as("content"),
      lit("image").as("format"))
  }

  object MediaKernels {
    private val PngSig: Array[Byte] =
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    /** Real container-header decode: PNG dimensions from the IHDR chunk,
      * JPEG dimensions by scanning marker segments to the first SOF frame
      * header (skipping APP0/comment/quantization segments by their
      * declared lengths — the actual JPEG wire format, not a fixed
      * offset). Payloads that are neither fall back to the deterministic
      * pseudo-decode (full pixel decoding needs a codec library that is
      * not available here — swap this branch, keep the signature). */
    def decode(row: MediaRow): MediaFeatures = {
      val b = row.content
      val n = b.length.toLong
      def u8(i: Int): Int = b(i) & 0xff
      def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      def u32(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      var sum = 0L
      var ci = 0
      while (ci < b.length) {
        sum = (sum * 131 + (b(ci) & 0xff)) % 1000000007L
        ci += 1
      }
      def isPng = b.length >= 24 && b.take(8).sameElements(PngSig) &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R'
      def fallback = MediaFeatures(row.doc_id, row.format, n,
        width = (n % 640 + 1).toInt, height = (n % 480 + 1).toInt,
        checksum = sum)
      if (isPng)
        MediaFeatures(row.doc_id, "png", n, u32(16), u32(20), sum)
      else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
        // marker scan: FF D8 (SOI) then segments FF mm [len payload]
        var i = 2
        var dims: Option[(Int, Int)] = None
        var done = false
        while (!done && dims.isEmpty && i + 3 < b.length) {
          if (u8(i) != 0xFF) i += 1 // tolerate padding bytes
          else {
            val m = u8(i + 1)
            if (m == 0xFF) i += 1 // fill byte before marker
            else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2 // standalone
            else if (m == 0xD9 || m == 0xDA) done = true // EOI / scan data
            else {
              val len = u16(i + 2)
              val isSof = m >= 0xC0 && m <= 0xCF &&
                m != 0xC4 && m != 0xC8 && m != 0xCC
              if (isSof && i + 8 < b.length)
                dims = Some((u16(i + 7), u16(i + 5))) // (width, height)
              else i += 2 + len
            }
          }
        }
        dims match {
          case Some((w, h)) => MediaFeatures(row.doc_id, "jpeg", n, w, h, sum)
          case None => fallback
        }
      } else fallback
    }
  }

  /** Per-partition batched decode: the kernel sees an iterator per
    * partition (the batch), mirroring mapInPandas' batch contract. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      // per-partition init of a real codec would happen here, once
      batch.map(MediaKernels.decode)
    }
  }
}
