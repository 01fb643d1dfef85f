package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed by per-partition batch kernels. Container HEADER
  * parsing is real ([[MediaKernels.decode]] reads PNG IHDR and JPEG SOF
  * dimensions from the raw bytes), and full PIXEL decode is real for
  * uncompressed BMP ([[MediaKernels.decodeBmpPixels]]), compressed PNG
  * ([[MediaKernels.decodePngPixels]] — IDAT is zlib, so the JDK's
  * `Inflater` plus the five-filter unfilter pass needs no external
  * library), and baseline JPEG ([[MediaKernels.decodeJpegPixels]] —
  * embedded-DHT Huffman decode, dequant, IDCT, spec-checked against
  * `javax.imageio`). The deterministic pseudo-decode remains only as the
  * honest fallback for formats with no kernel (e.g. webp); swap it for a
  * codec library (e.g. TwelveMonkeys/JavaCV) without touching the plan
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
  final case class PixelFeatures(doc_id: Long, format: String, width: Int,
                                 height: Int, n_pixels: Long, sum_b: Long,
                                 sum_g: Long, sum_r: Long)
  final case class WavFeatures(doc_id: Long, format: String,
                               sample_rate: Int, channels: Int, bits: Int,
                               n_samples: Long, sum_abs: Long,
                               sum_val: Long)
  final case class VideoFeatures(doc_id: Long, format: String, width: Int,
                                 height: Int, n_frames: Long,
                                 n_sampled: Long, sum_y: Long)

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

  /** Encode each document as a REAL uncompressed 24-bit BMP — file header,
    * BITMAPINFOHEADER, bottom-up BGR rows with 4-byte row padding; any
    * image viewer opens the bytes. Dimensions derive from the text's byte
    * length (w = n%16+1, h = n%8+1) and pixel bytes from the deterministic
    * formula (doc_id·31 + j) mod 256 over the logical BGR byte index
    * j = (y·w + x)·3 + c — a pattern the gate oracle replays exactly, so
    * [[decodePixels]]' full pixel decode (row order, padding, channel
    * split) is verified byte-for-byte, not just header-deep. */
  def asSyntheticBitmaps(docs: DataFrame, id: String,
                         text: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(id).cast("long"), col(text).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, t) =>
        val n = t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        MediaRow(docId,
          MediaKernels.encodeBmp(docId, n % 16 + 1, n % 8 + 1), "bmp")
      })
  }

  /** Encode each document as a REAL compressed PNG — signature, IHDR,
    * zlib-deflated filtered scanlines in (possibly multiple) IDAT chunks
    * with correct CRC32s, IEND; any image viewer opens the bytes. Row y
    * uses filter type y mod 5, so one image exercises every PNG filter
    * (None/Sub/Up/Average/Paeth). Dimensions derive from the text's byte
    * length (w = n%16+1, h = n%8+1); odd doc_ids encode RGBA (color type
    * 6), even RGB (color type 2). Pixel byte j of the channel raster is
    * (doc_id·31 + j) mod 256 — the same formula contract as
    * [[asSyntheticBitmaps]], replayed exactly by the gate oracle, so
    * [[decodePixels]]' inflate + unfilter path is verified
    * byte-for-byte. */
  def asSyntheticPngs(docs: DataFrame, id: String,
                      text: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(id).cast("long"), col(text).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, t) =>
        val n = t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        MediaRow(docId,
          MediaKernels.encodePng(docId, n % 16 + 1, n % 8 + 1,
            alpha = docId % 2 != 0), "png")
      })
  }

  /** Encode each document as a REAL baseline JPEG — SOI, quantization
    * table, SOF0 (8-bit grayscale), embedded canonical Huffman tables
    * (DHT), entropy-coded scan, EOI; any image viewer or `javax.imageio`
    * opens the bytes (spec-verified). The image is a grid of constant
    * 8×8 blocks (w = 8·(n%4+1), h = 8·(n%2+1), block b's gray =
    * (doc_id·31 + b) mod 256): constant blocks have DC-only spectra and
    * the embedded quantization table is all-ones, so the normally-lossy
    * format is exactly LOSSLESS here — the gate oracle replays the
    * decoded pixel sums in closed form while [[decodePixels]] exercises
    * the full real bitstream path (Huffman decode, DC prediction,
    * dequantization, IDCT). */
  def asSyntheticJpegs(docs: DataFrame, id: String,
                       text: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(id).cast("long"), col(text).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, t) =>
        val n = t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        MediaRow(docId,
          MediaKernels.encodeJpeg(docId, 8 * (n % 4 + 1), 8 * (n % 2 + 1)),
          "jpeg")
      })
  }

  /** Encode each document as a REAL baseline COLOR JPEG in 4:2:0 — the
    * dominant real-world shape: Y sampled 2×2, Cb/Cr 1×1, one
    * interleaved scan (4 Y + 1 Cb + 1 Cr data units per 16×16 MCU).
    * Per MCU m the four Y sub-blocks are constant
    * (doc_id·31 + 4m + j) mod 256 (j = v·2+h), chroma constant
    * cb = (doc_id·17 + 11m) mod 256, cr = (doc_id·13 + 7m) mod 256;
    * all-ones quantization makes the round-trip exactly lossless, so
    * the gate oracle replays the BT.601 conversion + floor(x+0.5)
    * clamp in closed form while [[decodePixels]] exercises the full
    * subsampled path (per-component sampling factors, interleaved MCU
    * entropy decode, chroma box upsample, color transform).
    * w = 16·(n%2+1), h = 16·(n%3+1). */
  def asSyntheticColorJpegs(docs: DataFrame, id: String,
                            text: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(id).cast("long"), col(text).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, t) =>
        val n = t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        MediaRow(docId,
          MediaKernels.encodeJpeg420(docId, 16 * (n % 2 + 1),
            16 * (n % 3 + 1)),
          "jpeg")
      })
  }

  /** Encode the corpus as a photo set with PLANTED duplicates: the pixel
    * seed is doc_id mod 97, and dimensions derive from the seed (w =
    * seed%16+1, h = seed/16%8+1), so documents sharing a seed are exact
    * pixel twins — the ground truth for [[dedupByPhash]]. Containers are
    * byte-valid 24-bit BMPs via [[MediaKernels.encodeBmp]]. */
  def asSyntheticPhotoSet(docs: DataFrame, id: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(id).cast("long")).as[Long]
      .mapPartitions(_.map { docId =>
        val seed = docId % 97
        MediaRow(docId,
          MediaKernels.encodeBmp(seed, (seed % 16).toInt + 1,
            (seed / 16 % 8).toInt + 1), "bmp")
      })
  }

  /** Perceptual difference-hash over REAL decoded pixels — the image-dedup
    * primitive (the LAION-style near-dup key): parse the BMP, gray each
    * sampled pixel (integer (b+g+r)/3), nearest-neighbor-sample an 8×8
    * grid (x = bx·w/8 — exact integer resize, no interpolation floats),
    * and pack the 56 horizontal gradient comparisons (7 per row × 8 rows)
    * into one int64. 56 bits keeps the hash positive in two's-complement
    * engines, so the value replays exactly in SQL. Non-BMP payloads hash
    * to −1 ("unknown"). Returns (doc_id, format, width, height, phash).
    *
    * Scale: pure narrow mapPartitions — the binary column never crosses a
    * shuffle; downstream grouping ships only (doc_id, 8-byte hash). */
  def phash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map { r =>
        val (fmt, w, h, hash) = MediaKernels.dhashBmp(r.content)
        (r.doc_id, fmt, w.toLong, h.toLong, hash)
      }
    }.toDF("doc_id", "format", "width", "height", "phash")
  }

  /** Exact perceptual-hash image dedup: group by [[phash]] value, elect
    * the min-doc_id representative per hash bucket. Two images with equal
    * dHash are visual duplicates (pixel twins always are; near-twins with
    * identical gradient signs collapse too — that is the point of a
    * perceptual hash). Returns every image with (doc_id, phash, rep,
    * grp_n); rows with grp_n > 1 are the duplicate clusters.
    *
    * Scale: one hash aggregate over 8-byte keys + an equi-join of the
    * image table against the (hash, rep, n) buckets — AQE broadcasts the
    * bucket side when small; never a pair join over images. */
  def dedupByPhash(media: DataFrame): DataFrame = {
    val hashes = phash(media).select(col("doc_id"), col("phash"))
    val groups = hashes.groupBy(col("phash"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("grp_n"))
    hashes.join(groups, "phash")
      .select(col("doc_id"), col("phash"), col("rep"), col("grp_n"))
  }

  /** Encode each document as a REAL PCM WAV — RIFF header, fmt chunk
    * (mono 16-bit), data chunk with formula samples
    * vᵢ = ((doc_id·31 + i) mod 65536) − 32768; any audio player opens
    * the bytes. Sample count and rate derive from the text byte length
    * (n_samples = n%64 + 8, rate = 8000 + n%4·4000) so the gate oracle
    * replays the whole waveform exactly — sample-level decode verified
    * end-to-end, the audio twin of [[asSyntheticBitmaps]]. */
  def asSyntheticWavs(docs: DataFrame, id: String,
                      text: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(id).cast("long"), col(text).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, t) =>
        val n = t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        MediaRow(docId,
          MediaKernels.encodeWav(docId, n % 64 + 8, 8000 + n % 4 * 4000),
          "wav")
      })
  }

  /** Sample-level PCM decode (true audio features, no codec library
    * needed for uncompressed WAV): chunk-walking RIFF parse, then
    * absolute and signed sample sums. Non-WAV payloads report format
    * "unknown" with zeroed features — the swap point for a real codec,
    * same as [[decodeFeatures]]. */
  def decodeAudio(media: DataFrame): Dataset[WavFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map(r => MediaKernels.decodeWavSamples(r.doc_id, r.content))
    }
  }

  /** Shot/scene-cut detection — the video twin of [[audioSegments]]:
    * a cut is an adjacent-frame pair whose summed absolute luma delta
    * Σ_p |Y_f − Y_{f−1}| ≥ `threshold` (pure integers); shots are the
    * maximal cut-free runs. The shot list is what a video training
    * pipeline samples frames WITHIN (sampling across a cut mixes
    * scenes). Returns per doc (doc_id, n_frames, n_cuts, n_shots,
    * longest_shot); non-Y4M payloads report all-zero.
    *
    * Scale: same contract as the other media kernels — per-partition
    * byte decode, narrow per-row fold, the binary column never
    * shuffles. */
  def videoSceneCuts(media: DataFrame, threshold: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val deltas = media.as[MediaRow].mapPartitions { batch =>
      batch.map(r => (r.doc_id,
        MediaKernels.decodeY4mFrameDeltas(r.content)))
    }.toDF("doc_id", "deltas")
    val cuts = transform(col("deltas"), d => d >= threshold)
    val fold = aggregate(cuts,
      struct(lit(0L).as("run"), lit(0L).as("best"), lit(0L).as("ncut")),
      (acc, x) => {
        val run = when(x, lit(0L)).otherwise(acc.getField("run") + 1)
        struct(run.as("run"),
          greatest(acc.getField("best"), run).as("best"),
          (acc.getField("ncut") + when(x, 1L).otherwise(0L)).as("ncut"))
      })
    // empty delta list = non-Y4M or <2 frames: report all-zero (the
    // kernel needs two frames before "shots" mean anything)
    deltas.select(col("doc_id"),
        size(col("deltas")).cast("long").as("nd"), fold.as("st"))
      .select(col("doc_id"),
        when(col("nd") > 0, col("nd") + 1).otherwise(0L).as("n_frames"),
        col("st.ncut").as("n_cuts"),
        when(col("nd") > 0, col("st.ncut") + 1).otherwise(0L).as("n_shots"),
        when(col("nd") > 0, col("st.best") + 1).otherwise(0L)
          .as("longest_shot"))
  }

  /** Energy-based voice-activity segmentation — the silence-trim / VAD
    * stage an audio training pipeline runs before transcription: frame
    * the PCM into `frame`-sample windows, mark a frame speech when its
    * absolute-amplitude energy Σ|v| ≥ `threshold` (pure integers — no
    * dB floats to drift), and report the maximal speech runs. Returns
    * per doc (doc_id, n_frames, n_speech, n_segments, longest_seg,
    * speech_ppm). Real byte decode (RIFF walk + int16 LE), same kernel
    * contract as [[decodeAudio]]; non-WAV payloads report all-zero.
    *
    * Scale: decode is per-partition (codec amortization), the run
    * detection is a narrow per-row fold over the frame-energy array —
    * the binary column never shuffles and the output is one short row
    * per doc. */
  def audioSegments(media: DataFrame, frame: Int,
                    threshold: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val frames = media.as[MediaRow].mapPartitions { batch =>
      batch.map(r => (r.doc_id,
        MediaKernels.decodeWavFrameEnergies(r.content, frame)))
    }.toDF("doc_id", "energies")
    val sp = transform(col("energies"), e => e >= threshold)
    val fold = aggregate(sp,
      struct(lit(false).as("prev"), lit(0L).as("run"), lit(0L).as("best"),
        lit(0L).as("nseg"), lit(0L).as("nsp")),
      (acc, x) => {
        val run = when(x, acc.getField("run") + 1).otherwise(lit(0L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"),
          (acc.getField("nseg") +
            when(x && !acc.getField("prev"), 1L).otherwise(0L)).as("nseg"),
          (acc.getField("nsp") + when(x, 1L).otherwise(0L)).as("nsp"))
      })
    frames.select(col("doc_id"),
        size(col("energies")).cast("long").as("n_frames"),
        fold.as("st"))
      .select(col("doc_id"), col("n_frames"),
        col("st.nsp").as("n_speech"),
        col("st.nseg").as("n_segments"),
        col("st.best").as("longest_seg"),
        when(col("n_frames") > 0,
          expr("st.nsp * 1000000 div n_frames")).otherwise(0L)
          .as("speech_ppm"))
  }

  /** Encode each document as a REAL uncompressed video — YUV4MPEG2
    * (C444: full Y/U/V planes per frame), the codec-free container every
    * video toolchain reads. Frame count derives from the text byte
    * length (n_frames = n%6 + 2, fixed 4×2 planes); the luma byte of
    * frame f at position p is (doc_id·31 + f·131 + p) mod 256, chroma
    * constant 128 — the oracle replays the sampled luma sums exactly. */
  def asSyntheticVideos(docs: DataFrame, id: String,
                        text: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(id).cast("long"), col(text).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, t) =>
        val n = t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        MediaRow(docId, MediaKernels.encodeY4m(docId, 4, 2, n % 6 + 2),
          "y4m")
      })
  }

  /** Frame-sampled video decode (the brief's frame-sample op, real
    * bytes end-to-end): parse the Y4M header, walk FRAME markers, and
    * accumulate luma sums over every `step`-th frame — the decode a
    * vision-training pipeline runs to thin 30 fps video to trainable
    * frames. Non-Y4M payloads report "unknown". */
  def sampleFrames(media: DataFrame, step: Int): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map(r => MediaKernels.decodeY4mSampled(r.doc_id, r.content,
        step))
    }
  }

  /** Full pixel decode (true pixel-level features, no codec library
    * needed for uncompressed BMP; for PNG: JDK `Inflater` zlib decode +
    * per-row unfilter — see [[MediaKernels.decodePngPixels]]): per-channel
    * byte sums + pixel count. Payloads that are neither report format
    * "unknown" with zeroed features — the swap point for a real codec
    * (JPEG entropy decode), same as [[decodeFeatures]]. */
  def decodePixels(media: DataFrame): Dataset[PixelFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map { r =>
        val b = r.content
        if (b.length >= 8 && b(0) == 0x89.toByte && b(1) == 'P')
          MediaKernels.decodePngPixels(r.doc_id, b)
        else if (b.length >= 2 && (b(0) & 0xff) == 0xFF &&
          (b(1) & 0xff) == 0xD8)
          MediaKernels.decodeJpegPixels(r.doc_id, b)
        else MediaKernels.decodeBmpPixels(r.doc_id, b)
      }
    }
  }

  object MediaKernels {
    private val PngSig: Array[Byte] =
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    /** Byte-valid 24-bit uncompressed BMP with formula pixels:
      * logical BGR byte j of pixel (x, y) is (seed·31 + j) mod 256 with
      * j = (y·w + x)·3 + c, written bottom-up with padded rows per the
      * BMP wire format. */
    def encodeBmp(seed: Long, w: Int, h: Int): Array[Byte] = {
      val rowSize = (w * 3 + 3) / 4 * 4
      val size = 54 + rowSize * h
      val b = new Array[Byte](size)
      def le16(i: Int, v: Int): Unit = {
        b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      }
      def le32(i: Int, v: Int): Unit = {
        b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
        b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
      }
      b(0) = 'B'; b(1) = 'M'
      le32(2, size); le32(10, 54)          // file size, pixel-data offset
      le32(14, 40)                         // BITMAPINFOHEADER size
      le32(18, w); le32(22, h)             // positive height = bottom-up
      le16(26, 1); le16(28, 24)            // planes, bits per pixel
      le32(30, 0)                          // BI_RGB: uncompressed
      le32(34, rowSize * h)                // image size
      var y = 0
      while (y < h) {
        val rowOff = 54 + (h - 1 - y) * rowSize   // bottom-up row order
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            val j = (y.toLong * w + x) * 3 + c
            b(rowOff + x * 3 + c) = ((seed * 31 + j) % 256).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      b
    }

    /** Byte-valid YUV4MPEG2 (C444) with formula luma planes; chroma is
      * constant 128. */
    def encodeY4m(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
      val header =
        s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n".getBytes
      val frameTag = "FRAME\n".getBytes
      val planeLen = w * h
      val out = new Array[Byte](header.length +
        nFrames * (frameTag.length + 3 * planeLen))
      header.copyToArray(out, 0)
      var off = header.length
      var f = 0
      while (f < nFrames) {
        frameTag.copyToArray(out, off); off += frameTag.length
        var p = 0
        while (p < planeLen) {           // Y plane: formula bytes
          out(off + p) = ((seed * 31 + f.toLong * 131 + p) % 256).toByte
          p += 1
        }
        java.util.Arrays.fill(out, off + planeLen, off + 3 * planeLen,
          128.toByte)                    // U, V planes
        off += 3 * planeLen
        f += 1
      }
      out
    }

    /** Y4M header parse + FRAME walk with every-`step`-th luma sum.
      * Handles FRAME parameter strings (bytes to the newline) and stops
      * cleanly at truncated payloads. */
    /** Shared YUV4MPEG2 header parse: (width, height, offset of the
      * first FRAME marker). None for non-Y4M payloads OR dimensions
      * whose single C444 frame (3·w·h bytes) cannot fit the payload —
      * the LONG-arithmetic bound that keeps hostile W/H headers from
      * overflowing `3 * w * h` in Int and crashing the task on a
      * negative array allocation. */
    def parseY4mHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
      val magic = "YUV4MPEG2".getBytes
      if (b.length < 10 || !b.take(9).sameElements(magic)) return None
      var i = 9
      var w = 0L; var h = 0L
      // header params: space-separated tokens until newline
      while (i < b.length && b(i) != '\n') {
        if (b(i) == ' ' && i + 1 < b.length) {
          val tagC = b(i + 1).toChar
          var j = i + 2
          var v = 0L
          var numeric = true
          while (j < b.length && b(j) != ' ' && b(j) != '\n') {
            val c = b(j).toChar
            if (c.isDigit && v <= Int.MaxValue) v = v * 10 + (c - '0')
            else numeric = false
            j += 1
          }
          if (numeric && tagC == 'W') w = v
          if (numeric && tagC == 'H') h = v
          i = j - 1
        }
        i += 1
      }
      if (w <= 0 || h <= 0 || i >= b.length || 3L * w * h > b.length) None
      else Some((w.toInt, h.toInt, i + 1))
    }

    def decodeY4mSampled(docId: Long, b: Array[Byte],
                         step: Int): VideoFeatures = {
      val bad = VideoFeatures(docId, "unknown", 0, 0, 0L, 0L, 0L)
      parseY4mHeader(b) match {
        case None => bad
        case Some((w, h, start)) =>
          var i = start
          val frameBytes = 3 * w * h             // C444 planes
          var nFrames = 0L; var nSampled = 0L; var sumY = 0L
          val tag = "FRAME".getBytes
          while (i + tag.length <= b.length &&
            b.slice(i, i + tag.length).sameElements(tag)) {
            i += tag.length
            while (i < b.length && b(i) != '\n') i += 1  // frame params
            i += 1
            if (i + frameBytes > b.length) return bad    // truncated frame
            if (nFrames % step == 0) {
              var p = 0
              while (p < w * h) { sumY += b(i + p) & 0xff; p += 1 }
              nSampled += 1
            }
            nFrames += 1
            i += frameBytes
          }
          VideoFeatures(docId, "y4m", w, h, nFrames, nSampled, sumY)
      }
    }

    /** Byte-valid mono 16-bit PCM WAV with formula samples
      * vᵢ = ((seed·31 + i) mod 65536) − 32768, little-endian per the
      * RIFF wire format. */
    def encodeWav(seed: Long, nSamples: Int, rate: Int): Array[Byte] = {
      val dataLen = nSamples * 2
      val b = new Array[Byte](44 + dataLen)
      def tag(i: Int, s: String): Unit =
        s.getBytes.copyToArray(b, i)
      def le16(i: Int, v: Int): Unit = {
        b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      }
      def le32(i: Int, v: Int): Unit = {
        b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
        b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
      }
      tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
      tag(12, "fmt "); le32(16, 16)       // fmt chunk, PCM size 16
      le16(20, 1); le16(22, 1)            // PCM, mono
      le32(24, rate); le32(28, rate * 2)  // sample rate, byte rate
      le16(32, 2); le16(34, 16)           // block align, bits/sample
      tag(36, "data"); le32(40, dataLen)
      var i = 0
      while (i < nSamples) {
        val v = ((seed * 31 + i) % 65536L).toInt - 32768
        le16(44 + i * 2, v & 0xffff)
        i += 1
      }
      b
    }

    /** Chunk-walking RIFF/WAVE parse + sample-level PCM decode: finds
      * the fmt and data chunks by walking the declared chunk lengths
      * (arbitrary chunk order and extra chunks tolerated — the actual
      * wire format, not fixed offsets), then accumulates int16 LE
      * sample sums. */
    /** Sign-extended int16 LE sample read — shared by the WAV decoders. */
    @inline private def i16le(b: Array[Byte], off: Int): Long =
      (((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toShort).toLong

    def decodeWavSamples(docId: Long, b: Array[Byte]): WavFeatures =
      parseWavPcm(b) match {
        case None =>
          WavFeatures(docId, "unknown", 0, 0, 0, 0L, 0L, 0L)
        case Some((rate, channels, bits, dataOff, n)) =>
          var sumAbs = 0L; var sumVal = 0L
          var s = 0
          while (s < n) {
            val v = i16le(b, dataOff + s * 2)
            sumAbs += math.abs(v); sumVal += v
            s += 1
          }
          WavFeatures(docId, "wav", rate, channels, bits, n.toLong, sumAbs,
            sumVal)
      }

    /** The shared RIFF/WAVE chunk walk: returns (rate, channels, bits,
      * dataOffset, nSamples) for a valid mono-readable 16-bit PCM
      * payload, None otherwise (the "unknown format" path). */
    def parseWavPcm(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
      def u8(i: Int): Int = b(i) & 0xff
      def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def u32le(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def tag(i: Int): String =
        if (i + 4 <= b.length) new String(b.slice(i, i + 4)) else ""
      if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var i = 12
      var rate = 0; var channels = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (i + 8 <= b.length && (dataOff < 0 || rate == 0)) {
        val t = tag(i)
        val len = u32le(i + 4)
        if (t == "fmt " && i + 8 + 16 <= b.length) {
          channels = u16le(i + 10); rate = u32le(i + 12)
          bits = u16le(i + 22)
        } else if (t == "data") {
          dataOff = i + 8; dataLen = len
        }
        i += 8 + len + (len & 1)          // chunks are word-aligned
      }
      if (rate == 0 || dataOff < 0 || bits != 16 ||
        dataOff + dataLen > b.length) None
      else Some((rate, channels, bits, dataOff, dataLen / 2))
    }

    /** Per-frame absolute-amplitude energy: sum |v| over each run of
      * `frame` samples (last frame may be partial). Non-WAV payloads
      * yield an empty frame list. */
    def decodeWavFrameEnergies(b: Array[Byte], frame: Int): Array[Long] =
      parseWavPcm(b) match {
        case None => Array.empty[Long]
        case Some((_, _, _, dataOff, n)) =>
          val out = new Array[Long]((n + frame - 1) / frame)
          var s = 0
          while (s < n) {
            out(s / frame) += math.abs(i16le(b, dataOff + s * 2))
            s += 1
          }
          out
      }

    /** Per-adjacent-frame luma delta: Σ_p |Y_f(p) − Y_{f−1}(p)| for each
      * consecutive frame pair of a Y4M stream (the shot-cut signal).
      * Non-Y4M / malformed payloads yield an empty array; n_frames =
      * result + 1. Shares [[parseY4mHeader]] with [[decodeY4mSampled]]. */
    def decodeY4mFrameDeltas(b: Array[Byte]): Array[Long] =
      parseY4mHeader(b) match {
        case None => Array.empty[Long]
        case Some((w, h, start)) =>
          var i = start
          val frameBytes = 3 * w * h
          val tag = "FRAME".getBytes
          val deltas = scala.collection.mutable.ArrayBuffer.empty[Long]
          var prev: Array[Int] = null
          while (i + tag.length <= b.length &&
            b.slice(i, i + tag.length).sameElements(tag)) {
            i += tag.length
            while (i < b.length && b(i) != '\n') i += 1
            i += 1
            if (i + frameBytes > b.length) return Array.empty[Long]
            val cur = new Array[Int](w * h)
            var p = 0
            while (p < w * h) { cur(p) = b(i + p) & 0xff; p += 1 }
            if (prev != null) {
              var d = 0L; var q = 0
              while (q < w * h) { d += math.abs(cur(q) - prev(q)); q += 1 }
              deltas += d
            }
            prev = cur
            i += frameBytes
          }
          deltas.toArray
      }

    /** PNG Paeth predictor (the spec's exact tie-break order: left,
      * above, upper-left). */
    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a)
      val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** Byte-valid compressed PNG with formula pixels: channel-raster byte
      * j = (seed·31 + j) mod 256 (RGB when !alpha, RGBA otherwise), row y
      * filtered with type y mod 5 — one image exercises all five PNG
      * filters — then zlib-deflated and split into ≤256-byte IDAT chunks
      * (so the decoder's multi-IDAT concatenation is exercised too). All
      * chunk CRC32s are correct. */
    def encodePng(seed: Long, w: Int, h: Int, alpha: Boolean): Array[Byte] = {
      val bpp = if (alpha) 4 else 3
      val stride = w * bpp
      val raw = new Array[Byte](stride * h)
      var j = 0
      while (j < raw.length) {
        raw(j) = ((seed * 31 + j) % 256).toByte
        j += 1
      }
      val filtered = new Array[Byte](h * (1 + stride))
      var y = 0
      while (y < h) {
        val ft = y % 5
        val o = y * (1 + stride)
        filtered(o) = ft.toByte
        var x = 0
        while (x < stride) {
          val cur = raw(y * stride + x) & 0xff
          val left = if (x >= bpp) raw(y * stride + x - bpp) & 0xff else 0
          val up = if (y > 0) raw((y - 1) * stride + x) & 0xff else 0
          val ul =
            if (y > 0 && x >= bpp) raw((y - 1) * stride + x - bpp) & 0xff
            else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case _ => paeth(left, up, ul)
          }
          filtered(o + 1 + x) = ((cur - pred) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      val defl = new java.util.zip.Deflater()
      val zOut = new java.io.ByteArrayOutputStream()
      defl.setInput(filtered)
      defl.finish()
      val zBuf = new Array[Byte](512)
      while (!defl.finished()) {
        val k = defl.deflate(zBuf)
        zOut.write(zBuf, 0, k)
      }
      defl.end()
      val z = zOut.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write(PngSig, 0, PngSig.length)
      def writeChunk(typ: String, data: Array[Byte], from: Int,
                     len: Int): Unit = {
        def be32(v: Int): Array[Byte] = Array((v >> 24).toByte,
          (v >> 16).toByte, (v >> 8).toByte, v.toByte)
        val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        val crc = new java.util.zip.CRC32()
        crc.update(t)
        crc.update(data, from, len)
        out.write(be32(len), 0, 4)
        out.write(t, 0, 4)
        out.write(data, from, len)
        out.write(be32(crc.getValue.toInt), 0, 4)
      }
      val ihdr = new Array[Byte](13)
      def be32At(a: Array[Byte], i: Int, v: Int): Unit = {
        a(i) = (v >> 24).toByte; a(i + 1) = (v >> 16).toByte
        a(i + 2) = (v >> 8).toByte; a(i + 3) = v.toByte
      }
      be32At(ihdr, 0, w); be32At(ihdr, 4, h)
      ihdr(8) = 8                              // bit depth
      ihdr(9) = if (alpha) 6 else 2            // color type RGBA / RGB
      // compression 0, filter 0, interlace 0 already zeroed
      writeChunk("IHDR", ihdr, 0, 13)
      var off = 0
      while (off < z.length) {
        val len = math.min(256, z.length - off)
        writeChunk("IDAT", z, off, len)
        off += len
      }
      writeChunk("IEND", Array.emptyByteArray, 0, 0)
      out.toByteArray
    }

    /** REAL PNG pixel decode with zero external dependencies: chunk walk
      * (multi-IDAT concatenation), zlib inflate via the JDK's
      * `java.util.zip.Inflater` (PNG IDAT is zlib — no codec library
      * needed), then per-row unfiltering of all five filter types
      * (None/Sub/Up/Average/Paeth) for 8-bit RGB (color type 2) and RGBA
      * (color type 6). Per-channel sums cover R/G/B; alpha is decoded but
      * not summed, matching [[PixelFeatures]]' BMP contract. Truncated,
      * corrupt, interlaced, paletted, or sub-8-bit payloads report
      * "unknown" rather than throwing — a poisoned row must not kill the
      * partition at 100 TB. */
    def decodePngPixels(docId: Long, b: Array[Byte]): PixelFeatures = {
      val bad = PixelFeatures(docId, "unknown", 0, 0, 0L, 0L, 0L, 0L)
      def u8(i: Int): Int = b(i) & 0xff
      def u32(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      if (b.length < 45 ||
        !java.util.Arrays.equals(b, 0, 8, PngSig, 0, 8)) return bad
      var i = 8
      var w = 0; var h = 0
      var bitDepth = -1; var colorType = -1; var interlace = -1
      val idat = new java.io.ByteArrayOutputStream()
      var ok = true; var ended = false
      while (ok && !ended && i + 8 <= b.length) {
        val len = u32(i)
        if (len < 0 || i + 12 + len.toLong > b.length) ok = false
        else {
          val typ = new String(b, i + 4, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          typ match {
            case "IHDR" if len >= 13 =>
              w = u32(i + 8); h = u32(i + 12)
              bitDepth = u8(i + 16); colorType = u8(i + 17)
              interlace = u8(i + 20)
            case "IHDR" => ok = false
            case "IDAT" => idat.write(b, i + 8, len)
            case "IEND" => ended = true
            case _ => ()
          }
          i += 12 + len
        }
      }
      if (!ok || w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0 ||
        (colorType != 2 && colorType != 6)) return bad
      val bpp = if (colorType == 6) 4 else 3
      val stride = w * bpp
      // declared dims bound the inflate target exactly — a mismatched
      // or bomb payload fails the size check instead of allocating more
      if (stride.toLong * h + h > Int.MaxValue - 8) return bad
      val expect = h * (1 + stride)
      val data = new Array[Byte](expect)
      val infl = new java.util.zip.Inflater()
      infl.setInput(idat.toByteArray)
      var got = 0
      try {
        var stalled = false
        while (got < expect && !infl.finished() && !stalled) {
          val k = infl.inflate(data, got, expect - got)
          if (k == 0 && (infl.needsInput() || infl.needsDictionary()))
            stalled = true
          got += k
        }
      } catch {
        case _: java.util.zip.DataFormatException => return bad
      } finally infl.end()
      if (got != expect) return bad
      // unfilter in place: each row's recon bytes overwrite its filtered
      // bytes (offset o+1..o+stride); `up` reads the PREVIOUS row's recon
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        val o = y * (1 + stride)
        val ft = data(o) & 0xff
        if (ft > 4) return bad
        var x = 0
        while (x < stride) {
          val cur = data(o + 1 + x) & 0xff
          val left = if (x >= bpp) data(o + 1 + x - bpp) & 0xff else 0
          val up = if (y > 0) data(o - stride + x) & 0xff else 0
          val ul =
            if (y > 0 && x >= bpp) data(o - stride + x - bpp) & 0xff else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case _ => paeth(left, up, ul)
          }
          val recon = (cur + pred) & 0xff
          data(o + 1 + x) = recon.toByte
          (x % bpp: @annotation.switch) match {
            case 0 => sr += recon
            case 1 => sg += recon
            case 2 => sb += recon
            case _ => ()                     // alpha: decoded, not summed
          }
          x += 1
        }
        y += 1
      }
      PixelFeatures(docId, "png", w, h, w.toLong * h, sb, sg, sr)
    }

    /** Byte-valid baseline JPEG (ITU T.81 sequential DCT, 8-bit, single
      * grayscale component) with formula pixels: a grid of constant 8×8
      * blocks, block b's gray = (seed·31 + b) mod 256. Constant blocks
      * have DC-only spectra and the quantization table is all-ones, so
      * the encode is LOSSLESS — validated against `javax.imageio`'s own
      * decoder in MultimodalSpec. Huffman tables are embedded via DHT
      * (canonical, minimal: the 12 DC size categories at 4 bits each, a
      * 1-bit AC end-of-block), so any spec-conforming decoder reads the
      * stream. w and h must be multiples of 8 (whole MCUs). */
    def encodeJpeg(seed: Long, w: Int, h: Int): Array[Byte] = {
      require(w % 8 == 0 && h % 8 == 0, "whole MCUs only")
      val out = new java.io.ByteArrayOutputStream()
      def b8(v: Int): Unit = out.write(v & 0xff)
      def b16(v: Int): Unit = { b8(v >> 8); b8(v) }
      b16(0xFFD8)                                  // SOI
      b16(0xFFDB); b16(2 + 1 + 64); b8(0x00)       // DQT 0: all ones
      var k = 0
      while (k < 64) { b8(1); k += 1 }
      b16(0xFFC0); b16(2 + 6 + 3); b8(8)           // SOF0: 8-bit
      b16(h); b16(w); b8(1)                        // 1 component
      b8(1); b8(0x11); b8(0)                       // id 1, 1x1, quant 0
      b16(0xFFC4); b16(2 + 1 + 16 + 12); b8(0x00)  // DHT DC 0
      for (i <- 1 to 16) b8(if (i == 4) 12 else 0) // 12 codes of length 4
      for (s <- 0 to 11) b8(s)                     // categories 0..11
      b16(0xFFC4); b16(2 + 1 + 16 + 1); b8(0x10)   // DHT AC 0
      for (i <- 1 to 16) b8(if (i == 1) 1 else 0)  // one 1-bit code
      b8(0x00)                                     // = EOB
      b16(0xFFDA); b16(2 + 1 + 2 + 3); b8(1)       // SOS
      b8(1); b8(0x00); b8(0); b8(63); b8(0)
      var acc = 0; var nBits = 0
      def emit(bits: Int, n: Int): Unit = {
        acc = (acc << n) | (bits & ((1 << n) - 1)); nBits += n
        while (nBits >= 8) {
          val byte = (acc >> (nBits - 8)) & 0xff
          out.write(byte)
          if (byte == 0xff) out.write(0x00)        // byte stuffing
          nBits -= 8
        }
      }
      val nb = (w / 8) * (h / 8)
      var prevDc = 0
      var b = 0
      while (b < nb) {
        val g = ((seed * 31 + b) % 256).toInt
        val dc = 8 * (g - 128)
        val diff = dc - prevDc
        prevDc = dc
        val s =
          if (diff == 0) 0
          else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        emit(s, 4)                  // canonical code == category value
        if (s > 0) emit(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        emit(0, 1)                  // AC EOB
        b += 1
      }
      if (nBits % 8 != 0) {         // pad the final byte with 1-bits
        val pad = 8 - nBits % 8
        emit((1 << pad) - 1, pad)
      }
      b16(0xFFD9)                                  // EOI
      out.toByteArray
    }

    /** Byte-valid baseline COLOR JPEG in 4:2:0 (ITU T.81 sequential DCT,
      * 8-bit, YCbCr, Y sampled 2×2 / chroma 1×1, one interleaved scan).
      * Each 16×16 MCU m carries four constant Y sub-blocks
      * ((seed·31 + 4m + j) mod 256, j = v·2+h raster) and constant
      * chroma (cb = (seed·17 + 11m) mod 256, cr = (seed·13 + 7m)
      * mod 256). DC-only spectra + all-ones quantization ⇒ lossless;
      * the shared canonical Huffman pair (12 DC categories at 4 bits,
      * 1-bit AC EOB) serves all three components. w, h must be
      * multiples of 16 (whole 4:2:0 MCUs). */
    def encodeJpeg420(seed: Long, w: Int, h: Int): Array[Byte] = {
      require(w % 16 == 0 && h % 16 == 0, "whole 4:2:0 MCUs only")
      val out = new java.io.ByteArrayOutputStream()
      def b8(v: Int): Unit = out.write(v & 0xff)
      def b16(v: Int): Unit = { b8(v >> 8); b8(v) }
      b16(0xFFD8)                                  // SOI
      b16(0xFFDB); b16(2 + 1 + 64); b8(0x00)       // DQT 0: all ones
      var k = 0
      while (k < 64) { b8(1); k += 1 }
      b16(0xFFC0); b16(2 + 6 + 9); b8(8)           // SOF0: 8-bit, 3 comp
      b16(h); b16(w); b8(3)
      b8(1); b8(0x22); b8(0)                       // Y: 2×2, quant 0
      b8(2); b8(0x11); b8(0)                       // Cb: 1×1, quant 0
      b8(3); b8(0x11); b8(0)                       // Cr: 1×1, quant 0
      b16(0xFFC4); b16(2 + 1 + 16 + 12); b8(0x00)  // DHT DC 0
      for (i <- 1 to 16) b8(if (i == 4) 12 else 0) // 12 codes of length 4
      for (s <- 0 to 11) b8(s)                     // categories 0..11
      b16(0xFFC4); b16(2 + 1 + 16 + 1); b8(0x10)   // DHT AC 0
      for (i <- 1 to 16) b8(if (i == 1) 1 else 0)  // one 1-bit code
      b8(0x00)                                     // = EOB
      b16(0xFFDA); b16(2 + 1 + 6 + 3); b8(3)       // SOS: 3 components
      b8(1); b8(0x00); b8(2); b8(0x00); b8(3); b8(0x00)
      b8(0); b8(63); b8(0)
      var acc = 0; var nBits = 0
      def emit(bits: Int, n: Int): Unit = {
        acc = (acc << n) | (bits & ((1 << n) - 1)); nBits += n
        while (nBits >= 8) {
          val byte = (acc >> (nBits - 8)) & 0xff
          out.write(byte)
          if (byte == 0xff) out.write(0x00)        // byte stuffing
          nBits -= 8
        }
      }
      val prevDc = new Array[Int](3)
      def emitDcOnlyBlock(comp: Int, v: Int): Unit = {
        val dc = 8 * (v - 128)
        val diff = dc - prevDc(comp)
        prevDc(comp) = dc
        val s =
          if (diff == 0) 0
          else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        emit(s, 4)                  // canonical code == category value
        if (s > 0) emit(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        emit(0, 1)                  // AC EOB
      }
      val mcus = (w / 16) * (h / 16)
      var m = 0
      while (m < mcus) {
        var j = 0
        while (j < 4) {             // Y data units, v-then-h raster
          emitDcOnlyBlock(0, (((seed * 31 + 4 * m + j) % 256 + 256)
            % 256).toInt)
          j += 1
        }
        emitDcOnlyBlock(1, (((seed * 17 + 11 * m) % 256 + 256) % 256).toInt)
        emitDcOnlyBlock(2, (((seed * 13 + 7 * m) % 256 + 256) % 256).toInt)
        m += 1
      }
      if (nBits % 8 != 0) {         // pad the final byte with 1-bits
        val pad = 8 - nBits % 8
        emit((1 << pad) - 1, pad)
      }
      b16(0xFFD9)                                  // EOI
      out.toByteArray
    }

    /** REAL baseline JPEG pixel decode with zero external dependencies:
      * marker walk (DQT / DHT / SOF0 / DRI / SOS), canonical Huffman
      * decode tables built from the embedded DHT segments, entropy-coded
      * segment reader with 0xFF00 byte-unstuffing and RSTn restart
      * handling, DC prediction, AC run-length (ZRL/EOB) decode in
      * zig-zag order, dequantization, full 2D IDCT (StrictMath.cos
      * basis — bit-stable across JVMs), level shift + clamp. Supports 1
      * or 3 components with per-axis sampling factors 1 or 2 in one
      * interleaved scan — 4:4:4 (1×1), 4:2:2 (Y 2×1) and 4:2:0 (Y 2×2,
      * the dominant real-world shape) — with box (sample-replication)
      * chroma upsampling on the exact subsampling grid: grayscale
      * replicates to the r/g/b sums, 3 components convert YCbCr→RGB
      * (BT.601, rounded). Progressive, >2× sampling, 12-bit, or
      * arithmetic-coded streams report "unknown" rather than throwing —
      * a poisoned row must not kill the partition at 100 TB. Agreement
      * with `javax.imageio` on real-world streams is spec-pinned to ±1
      * per pixel (two correct IDCTs may round differently). */
    def decodeJpegPixels(docId: Long, b: Array[Byte]): PixelFeatures = {
      val bad = PixelFeatures(docId, "unknown", 0, 0, 0L, 0L, 0L, 0L)
      def u8(i: Int): Int = b(i) & 0xff
      def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      if (b.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return bad

      final class Huff(val maxcode: Array[Int], val mincode: Array[Int],
                       val valptr: Array[Int], val vals: Array[Int])
      val qt = Array.ofDim[Int](4, 64)
      val huff = Array.ofDim[Huff](2, 4)
      var w = 0; var h = 0; var nComp = 0
      var compQ: Array[Int] = null
      var compH: Array[Int] = null; var compV: Array[Int] = null
      var hMax = 1; var vMax = 1
      var compDcTab: Array[Int] = null; var compAcTab: Array[Int] = null
      var restartInterval = 0
      var sosAt = -1
      var i = 2
      while (sosAt < 0) {
        if (i + 4 > b.length || u8(i) != 0xFF) return bad
        val m = u8(i + 1)
        if (m == 0xD9) return bad                  // EOI before any scan
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2
        else {
          val len = u16(i + 2)
          if (len < 2 || i + 2 + len > b.length) return bad
          m match {
            case 0xDB =>                           // DQT
              var p = i + 4
              while (p < i + 2 + len) {
                if (p + 65 > i + 2 + len) return bad
                val pq = u8(p) >> 4; val tq = u8(p) & 15
                if (pq != 0 || tq > 3) return bad  // 8-bit tables only
                var k = 0
                while (k < 64) { qt(tq)(k) = u8(p + 1 + k); k += 1 }
                p += 65
              }
            case 0xC4 =>                           // DHT
              var p = i + 4
              while (p < i + 2 + len) {
                if (p + 17 > i + 2 + len) return bad
                val tc = u8(p) >> 4; val th = u8(p) & 15
                if (tc > 1 || th > 3) return bad
                val counts = new Array[Int](17)
                var total = 0
                var l = 1
                while (l <= 16) {
                  counts(l) = u8(p + l); total += counts(l); l += 1
                }
                if (p + 17 + total > i + 2 + len) return bad
                val vals = new Array[Int](total)
                var k = 0
                while (k < total) { vals(k) = u8(p + 17 + k); k += 1 }
                val mincode = new Array[Int](17)
                val maxcode = Array.fill(17)(-1)
                val valptr = new Array[Int](17)
                var code = 0; var vp = 0
                l = 1
                while (l <= 16) {                  // canonical assignment
                  valptr(l) = vp; mincode(l) = code
                  code += counts(l); vp += counts(l)
                  if (counts(l) > 0) maxcode(l) = code - 1
                  code <<= 1; l += 1
                }
                huff(tc)(th) = new Huff(maxcode, mincode, valptr, vals)
                p += 17 + total
              }
            case 0xC0 =>                           // SOF0 baseline
              if (u8(i + 4) != 8) return bad
              h = u16(i + 5); w = u16(i + 7)
              nComp = u8(i + 9)
              if ((nComp != 1 && nComp != 3) || len < 8 + 3 * nComp)
                return bad
              compQ = new Array[Int](nComp)
              compH = new Array[Int](nComp); compV = new Array[Int](nComp)
              var c = 0
              while (c < nComp) {
                // sampling factors 1 or 2 per axis: covers 1×1, 4:2:0
                // (Y 2×2, chroma 1×1) and 4:2:2 (Y 2×1) — the shapes
                // real-world baseline JPEGs actually use
                val samp = u8(i + 11 + 3 * c)
                compH(c) = samp >> 4; compV(c) = samp & 15
                if (compH(c) < 1 || compH(c) > 2 ||
                  compV(c) < 1 || compV(c) > 2) return bad
                if (compH(c) > hMax) hMax = compH(c)
                if (compV(c) > vMax) vMax = compV(c)
                compQ(c) = u8(i + 12 + 3 * c)
                if (compQ(c) > 3) return bad
                c += 1
              }
              if (nComp == 1) {                    // single-component scans
                compH(0) = 1; compV(0) = 1         // are non-interleaved:
                hMax = 1; vMax = 1                 // plain 8×8 blocks
              }
            case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
                 0xCB | 0xCD | 0xCE | 0xCF =>
              return bad                           // non-baseline frame
            case 0xDD =>                           // DRI
              if (len != 4) return bad
              restartInterval = u16(i + 4)
            case 0xDA =>                           // SOS
              if (nComp == 0) return bad           // SOF must precede
              val ns = u8(i + 4)
              if (ns != nComp || len != 6 + 2 * ns) return bad
              compDcTab = new Array[Int](ns); compAcTab = new Array[Int](ns)
              var c = 0
              while (c < ns) {
                compDcTab(c) = u8(i + 6 + 2 * c) >> 4
                compAcTab(c) = u8(i + 6 + 2 * c) & 15
                if (compDcTab(c) > 3 || compAcTab(c) > 3) return bad
                c += 1
              }
              if (u8(i + 5 + 2 * ns) != 0 || u8(i + 6 + 2 * ns) != 63 ||
                u8(i + 7 + 2 * ns) != 0) return bad
              sosAt = i + 2 + len
            case _ => ()                           // APPn / COM: skip
          }
          if (sosAt < 0) i += 2 + len
        }
      }
      if (w <= 0 || h <= 0) return bad
      var c0 = 0
      while (c0 < nComp) {
        if (huff(0)(compDcTab(c0)) == null || huff(1)(compAcTab(c0)) == null)
          return bad
        c0 += 1
      }

      // entropy-coded segment bit reader: 0xFF00 unstuffed, any other
      // marker ends the data
      var pos = sosAt
      var bitBuf = 0; var bitCnt = 0
      var hitMarker = false
      def nextBit(): Int = {
        if (bitCnt == 0) {
          if (pos >= b.length || hitMarker) return -1
          val byte = u8(pos); pos += 1
          if (byte == 0xFF) {
            val nxt = if (pos < b.length) u8(pos) else -1
            if (nxt == 0x00) pos += 1
            else { hitMarker = true; pos -= 1; return -1 }
          }
          bitBuf = byte; bitCnt = 8
        }
        bitCnt -= 1
        (bitBuf >> bitCnt) & 1
      }
      def decodeHuff(t: Huff): Int = {
        var code = 0; var l = 1
        while (l <= 16) {
          val bit = nextBit(); if (bit < 0) return -1
          code = (code << 1) | bit
          if (t.maxcode(l) >= 0 && code <= t.maxcode(l))
            return t.vals(t.valptr(l) + code - t.mincode(l))
          l += 1
        }
        -1
      }
      def receiveExtend(s: Int): Int = {
        if (s == 0) return 0
        var v = 0; var k = 0
        while (k < s) {
          val bit = nextBit(); if (bit < 0) return Int.MinValue
          v = (v << 1) | bit; k += 1
        }
        if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
      }

      val zigzag = Array(
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
      val cosT = Array.tabulate(8, 8) { (x, u) =>
        StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16) *
          (if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0)
      }
      val dcPred = new Array[Int](nComp)
      def decodeBlock(comp: Int): Array[Int] = {
        val q = qt(compQ(comp))
        val coef = new Array[Int](64)              // zig-zag order
        val s = decodeHuff(huff(0)(compDcTab(comp)))
        if (s < 0 || s > 15) return null
        val diff = receiveExtend(s)
        if (diff == Int.MinValue) return null
        dcPred(comp) += diff
        coef(0) = dcPred(comp)
        var k = 1
        while (k < 64) {
          val rs = decodeHuff(huff(1)(compAcTab(comp)))
          if (rs < 0) return null
          val r = rs >> 4; val ss = rs & 15
          if (ss == 0) {
            if (r == 15) k += 16 else k = 64       // ZRL / EOB
          } else {
            k += r
            if (k > 63) return null
            val v = receiveExtend(ss)
            if (v == Int.MinValue) return null
            coef(k) = v; k += 1
          }
        }
        val f = new Array[Double](64)
        k = 0
        while (k < 64) {                           // dequant, de-zig-zag
          f(zigzag(k)) = coef(k).toDouble * q(k); k += 1
        }
        val outp = new Array[Int](64)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var acc = 0.0
            var v = 0
            while (v < 8) {
              var u = 0
              while (u < 8) {
                acc += cosT(x)(u) * cosT(y)(v) * f(v * 8 + u); u += 1
              }
              v += 1
            }
            val px = StrictMath.round(acc / 4.0 + 128.0).toInt
            outp(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
            x += 1
          }
          y += 1
        }
        outp
      }
      def clampD(d: Double): Int = {
        val r = StrictMath.round(d).toInt
        if (r < 0) 0 else if (r > 255) 255 else r
      }

      // MCU geometry: 8·hMax × 8·vMax pixels; each component contributes
      // hi×vi data units per MCU (interleaved scan order, T.81 A.2.3).
      // Chroma upsampling is sample replication (box): component sample
      // for pixel (px, py) is at (px·hi/hMax, py·vi/vMax) — the exact
      // integer subsampling grid, no interpolation, so the math is
      // closed-form replayable by the oracle.
      val mcuW = 8 * hMax; val mcuH = 8 * vMax
      val mcusX = (w + mcuW - 1) / mcuW; val mcusY = (h + mcuH - 1) / mcuH
      var sr = 0L; var sg = 0L; var sb = 0L
      val blocks = new Array[Array[Array[Int]]](nComp)
      var c1 = 0
      while (c1 < nComp) {
        blocks(c1) = new Array[Array[Int]](compH(c1) * compV(c1)); c1 += 1
      }
      var mcu = 0
      var by = 0
      while (by < mcusY) {
        var bx = 0
        while (bx < mcusX) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            bitCnt = 0; hitMarker = false          // byte-align at RSTn
            if (pos + 1 >= b.length || u8(pos) != 0xFF ||
              u8(pos + 1) < 0xD0 || u8(pos + 1) > 0xD7) return bad
            pos += 2
            java.util.Arrays.fill(dcPred, 0)
          }
          var comp = 0
          while (comp < nComp) {
            var sub = 0
            while (sub < compH(comp) * compV(comp)) {
              blocks(comp)(sub) = decodeBlock(comp)
              if (blocks(comp)(sub) == null) return bad
              sub += 1
            }
            comp += 1
          }
          // only pixels inside the image bounds count (right/bottom MCUs
          // may overhang)
          val xMax = math.min(mcuW, w - bx * mcuW)
          val yMax = math.min(mcuH, h - by * mcuH)
          def sample(comp: Int, px: Int, py: Int): Int = {
            val cx = px * compH(comp) / hMax       // subsampling grid
            val cy = py * compV(comp) / vMax
            blocks(comp)((cy >> 3) * compH(comp) + (cx >> 3))(
              (cy & 7) * 8 + (cx & 7))
          }
          var yy = 0
          while (yy < yMax) {
            var xx = 0
            while (xx < xMax) {
              if (nComp == 3) {                    // BT.601 YCbCr → RGB
                val yv = sample(0, xx, yy).toDouble
                val cb = sample(1, xx, yy) - 128.0
                val cr = sample(2, xx, yy) - 128.0
                sr += clampD(yv + 1.402 * cr)
                sg += clampD(yv - 0.344136 * cb - 0.714136 * cr)
                sb += clampD(yv + 1.772 * cb)
              } else {
                val g = sample(0, xx, yy)          // gray → (g, g, g)
                sr += g; sg += g; sb += g
              }
              xx += 1
            }
            yy += 1
          }
          mcu += 1
          bx += 1
        }
        by += 1
      }
      PixelFeatures(docId, "jpeg", w, h, w.toLong * h, sb, sg, sr)
    }

    /** Full uncompressed-BMP pixel decode: walks the bottom-up padded rows
      * back to logical order and accumulates per-channel sums. */
    def decodeBmpPixels(docId: Long, b: Array[Byte]): PixelFeatures = {
      def u8(i: Int): Int = b(i) & 0xff
      def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def u32le(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      val isBmp = b.length >= 54 && b(0) == 'B' && b(1) == 'M' &&
        u16le(28) == 24 && u32le(30) == 0   // 24-bit uncompressed only
      if (!isBmp) return PixelFeatures(docId, "unknown", 0, 0, 0L, 0L, 0L, 0L)
      val off = u32le(10)
      val w = u32le(18)
      val h = u32le(22)
      val rowSize = (w * 3 + 3) / 4 * 4
      if (w <= 0 || h <= 0 || off + rowSize.toLong * h > b.length)
        return PixelFeatures(docId, "unknown", 0, 0, 0L, 0L, 0L, 0L)
      var sb = 0L; var sg = 0L; var sr = 0L
      var y = 0
      while (y < h) {
        val rowOff = off + (h - 1 - y) * rowSize
        var x = 0
        while (x < w) {
          sb += u8(rowOff + x * 3)
          sg += u8(rowOff + x * 3 + 1)
          sr += u8(rowOff + x * 3 + 2)
          x += 1
        }
        y += 1
      }
      PixelFeatures(docId, "bmp", w, h, w.toLong * h, sb, sg, sr)
    }

    /** Difference-hash over a decoded 24-bit BMP: integer gray
      * (b+g+r)/3, nearest-neighbor 8×8 sample (x = bx·w/8, y = by·h/8),
      * bit (by·7+bx) set iff gray(bx+1, by) > gray(bx, by) — 56 bits,
      * always non-negative. Returns (format, width, height, hash); hash
      * −1 for payloads that are not uncompressed 24-bit BMPs. */
    def dhashBmp(b: Array[Byte]): (String, Int, Int, Long) = {
      def u8(i: Int): Int = b(i) & 0xff
      def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def u32le(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      val isBmp = b.length >= 54 && b(0) == 'B' && b(1) == 'M' &&
        u16le(28) == 24 && u32le(30) == 0
      if (!isBmp) return ("unknown", 0, 0, -1L)
      val off = u32le(10)
      val w = u32le(18)
      val h = u32le(22)
      val rowSize = (w * 3 + 3) / 4 * 4
      if (w <= 0 || h <= 0 || off + rowSize.toLong * h > b.length)
        return ("unknown", 0, 0, -1L)
      // gray at logical pixel (x, y): bottom-up padded rows on the wire
      def gray(x: Int, y: Int): Int = {
        val p = off + (h - 1 - y) * rowSize + x * 3
        (u8(p) + u8(p + 1) + u8(p + 2)) / 3
      }
      var hash = 0L
      var by = 0
      while (by < 8) {
        val y = by * h / 8
        var bx = 0
        while (bx < 7) {
          if (gray((bx + 1) * w / 8, y) > gray(bx * w / 8, y))
            hash |= 1L << (by * 7 + bx)
          bx += 1
        }
        by += 1
      }
      ("bmp", w, h, hash)
    }

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
      else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
        // BMP headers are little-endian, unlike PNG/JPEG
        def u32le(i: Int): Int =
          u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
        MediaFeatures(row.doc_id, "bmp", n, u32le(18), u32le(22), sum)
      } else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
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
