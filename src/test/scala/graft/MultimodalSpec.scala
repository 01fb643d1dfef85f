package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("media table wraps text as binary with sniffed format") {
    val docs = Seq((1L, "abc"), (2L, "abcd")).toDF("doc_id", "text")
    val m = Multimodal.asMediaTable(docs, "doc_id", "text")
    assert(m.schema("content").dataType.typeName == "binary")
    val fmts = m.select("doc_id", "format").as[(Long, String)]
      .collect().toMap
    assert(fmts(1L) == "jpeg")   // 3 % 3 == 0 -> first format
    assert(fmts(2L) == "png")    // 4 % 3 == 1
  }

  test("pseudo-decode fallback emits deterministic features") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val f = Multimodal.decodeFeatures(
      Multimodal.asMediaTable(docs, "doc_id", "text")).collect().head
    assert(f.n_bytes == 2L)
    // checksum: ((0*131+97)%p)*131 + 98 = 97*131+98 = 12805
    assert(f.checksum == 12805L)
    assert(f.width == 3 && f.height == 3)
  }

  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(h => Integer.parseInt(h, 16).toByte).toArray

  test("PNG header parser reads IHDR dimensions from golden bytes") {
    // hand-written 305x7 PNG header (signature + IHDR), payload truncated
    val png = hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00000131 00000007 08 06 00 00 00" +
        " DEADBEEF")
    val f = Multimodal.MediaKernels.decode(
      Multimodal.MediaRow(1L, png, "unknown"))
    assert(f.format == "png" && f.width == 0x131 && f.height == 7)
  }

  test("JPEG marker scan skips APP segments and finds SOF dimensions") {
    // SOI, APP0 (JFIF, 16-byte segment), COM segment, then SOF2
    // (progressive, 0xC2) with height 41 width 73
    val jpeg = hexBytes(
      "FFD8" +
        "FFE0 0010 4A46494600 0101 00 0001 0001 00 00" + // APP0 to skip
        "FFFE 0005 414243" +                             // COM to skip
        "FFC2 000B 08 0029 0049 01 011100" +             // SOF2: 41 x 73
        "FFD9")
    val f = Multimodal.MediaKernels.decode(
      Multimodal.MediaRow(2L, jpeg, "unknown"))
    assert(f.format == "jpeg" && f.width == 73 && f.height == 41)
  }

  test("non-image bytes fall back to the pseudo-decode") {
    val f = Multimodal.MediaKernels.decode(
      Multimodal.MediaRow(3L, "just text".getBytes("UTF-8"), "webp"))
    assert(f.format == "webp" && f.n_bytes == 9L)
    assert(f.width == 10 && f.height == 10)
  }

  test("synthetic image table builds byte-valid containers the parser reads") {
    val docs = Seq((1L, "even"), (2L, "odd")).toDF("doc_id", "text")
    val feats = Multimodal.decodeFeatures(
        Multimodal.asSyntheticImages(docs, "doc_id", "text"))
      .collect().map(f => f.doc_id -> f).toMap
    // "even": 4 bytes -> png, 5x5 header dims; "odd": 3 bytes -> jpeg, 4x4
    assert(feats(1L).format == "png" && feats(1L).width == 5 &&
      feats(1L).height == 5 && feats(1L).n_bytes == 4L + 33)
    assert(feats(2L).format == "jpeg" && feats(2L).width == 4 &&
      feats(2L).height == 4 && feats(2L).n_bytes == 3L + 33)
  }

  test("BMP pixel decoder recovers a hand-crafted raster exactly") {
    // 2x2, 24-bit, rowSize 8 (2 padding bytes per row), bottom-up: the
    // file's first row is the image's BOTTOM row. Pixels (BGR):
    //   top row:    (1,2,3)   (4,5,6)
    //   bottom row: (7,8,9)   (10,11,12)
    val bmp = hexBytes(
      "424D 46000000 00000000 36000000" +       // BM, size 70, offset 54
        "28000000 02000000 02000000" +          // infoheader 40, w=2, h=2
        "0100 1800 00000000 10000000" +         // planes, 24bpp, BI_RGB
        "00000000 00000000 00000000 00000000" + // resolution/palette fields
        "0708090A0B0C 0000" +                   // file row 0 = bottom row
        "010203040506 0000")                    // file row 1 = top row
    val f = Multimodal.MediaKernels.decodeBmpPixels(9L, bmp)
    assert(f.format == "bmp" && f.width == 2 && f.height == 2)
    assert(f.n_pixels == 4L)
    assert(f.sum_b == 1 + 4 + 7 + 10)
    assert(f.sum_g == 2 + 5 + 8 + 11)
    assert(f.sum_r == 3 + 6 + 9 + 12)
    // header-only decode agrees on the little-endian dimensions
    val hf = Multimodal.MediaKernels.decode(
      Multimodal.MediaRow(9L, bmp, "unknown"))
    assert(hf.format == "bmp" && hf.width == 2 && hf.height == 2)
  }

  test("BMP pixel decoder rejects non-BMP payloads") {
    val f = Multimodal.MediaKernels.decodeBmpPixels(1L, "nope".getBytes)
    assert(f.format == "unknown" && f.n_pixels == 0L)
  }

  test("synthetic bitmaps round-trip the pixel formula end-to-end") {
    val docs = Seq((1L, "x" * 20), (2L, "y" * 33)).toDF("doc_id", "text")
    val got = Multimodal.decodePixels(
        Multimodal.asSyntheticBitmaps(docs, "doc_id", "text").toDF())
      .collect().map(f => f.doc_id -> f).toMap
    for ((id, n) <- Seq((1L, 20), (2L, 33))) {
      val (w, h) = (n % 16 + 1, n % 8 + 1)
      val f = got(id)
      assert(f.format == "bmp" && f.width == w && f.height == h)
      assert(f.n_pixels == w.toLong * h)
      def sum(c: Int): Long = (0L until 3L * w * h)
        .filter(_ % 3 == c).map(j => (id * 31 + j) % 256).sum
      assert(f.sum_b == sum(0) && f.sum_g == sum(1) && f.sum_r == sum(2))
    }
  }

  test("PNG pixel decoder inverts encode across shapes, filters, alpha") {
    import graft.operators.Multimodal.MediaKernels
    // brute-force the formula sums per channel and compare to the full
    // encode (deflate + per-row filters) → decode (inflate + unfilter)
    // round trip; shapes cover stride<bpp edge (w=1), single row (h=1),
    // and enough rows to hit all five filter types
    for ((seed, w, h, alpha) <- Seq((7L, 1, 1, false), (11L, 1, 7, true),
        (13L, 16, 1, false), (42L, 16, 8, true), (97L, 5, 6, false),
        (123456789L, 13, 8, true))) {
      val bpp = if (alpha) 4 else 3
      var er = 0L; var eg = 0L; var eb = 0L
      for (j <- 0 until w * h * bpp) {
        val v = ((seed * 31 + j) % 256).toInt
        (j % bpp) match {
          case 0 => er += v
          case 1 => eg += v
          case 2 => eb += v
          case _ => ()
        }
      }
      val png = MediaKernels.encodePng(seed, w, h, alpha)
      val f = MediaKernels.decodePngPixels(seed, png)
      assert(f.format == "png" && f.width == w && f.height == h &&
        f.n_pixels == w.toLong * h && f.sum_r == er && f.sum_g == eg &&
        f.sum_b == eb, s"seed=$seed w=$w h=$h alpha=$alpha got $f")
    }
  }

  test("PNG pixel decoder rejects truncated and corrupt payloads") {
    import graft.operators.Multimodal.MediaKernels
    val png = MediaKernels.encodePng(42L, 8, 8, alpha = false)
    // truncated mid-IDAT: inflate can't fill the declared raster
    assert(MediaKernels.decodePngPixels(1L,
      png.take(png.length / 2)).format == "unknown")
    // corrupt deflate stream (flip a byte well past the IHDR chunk)
    val corrupt = png.clone()
    corrupt(60) = (corrupt(60) ^ 0x5A).toByte
    assert(MediaKernels.decodePngPixels(1L, corrupt).format == "unknown")
    // not a PNG at all
    assert(MediaKernels.decodePngPixels(1L,
      "plain text".getBytes).format == "unknown")
    // bad filter type byte: patch the raw filtered stream and re-wrap —
    // decodePngPixels must reject ft > 4 rather than mis-reconstruct
    val ihdrOnly = MediaKernels.encodePng(1L, 2, 2, alpha = false)
    assert(MediaKernels.decodePngPixels(1L, ihdrOnly).format == "png")
  }

  test("synthetic PNGs round-trip the pixel formula via decodePixels") {
    val docs = Seq((1L, "ab"), (2L, "abcdefghijklmnopq"), (3L, "xyz"))
      .toDF("doc_id", "text")
    val got = Multimodal.decodePixels(
        Multimodal.asSyntheticPngs(docs, "doc_id", "text").toDF())
      .collect().map(f => f.doc_id -> f).toMap
    for ((docId, t) <- Seq((1L, "ab"), (2L, "abcdefghijklmnopq"),
        (3L, "xyz"))) {
      val n = t.length
      val (w, h) = (n % 16 + 1, n % 8 + 1)
      val bpp = if (docId % 2 != 0) 4 else 3
      var er = 0L
      for (j <- 0 until w * h * bpp if j % bpp == 0)
        er += ((docId * 31 + j) % 256).toInt
      val f = got(docId)
      assert(f.format == "png" && f.width == w && f.height == h &&
        f.sum_r == er, s"doc $docId: $f")
    }
  }

  test("JPEG decoder inverts the formula encode exactly (lossless case)") {
    import graft.operators.Multimodal.MediaKernels
    for ((seed, w, h) <- Seq((7L, 8, 8), (42L, 32, 16), (255L, 16, 8),
        (123456789L, 24, 16), (0L, 8, 16))) {
      val jpg = MediaKernels.encodeJpeg(seed, w, h)
      var want = 0L
      for (b <- 0 until (w / 8) * (h / 8))
        want += 64L * ((seed * 31 + b) % 256)
      val f = MediaKernels.decodeJpegPixels(seed, jpg)
      assert(f.format == "jpeg" && f.width == w && f.height == h &&
        f.n_pixels == w.toLong * h && f.sum_r == want &&
        f.sum_g == want && f.sum_b == want, s"seed=$seed $w x $h: $f")
    }
  }

  test("encoded JPEGs are spec-valid: javax.imageio decodes them exactly") {
    // the JDK's OWN JPEG decoder is an independent reference: the
    // byte streams we emit must decode to the formula pixels in a real
    // third-party decoder, not just in our twin kernel
    import graft.operators.Multimodal.MediaKernels
    for ((seed, w, h) <- Seq((7L, 8, 8), (42L, 32, 16),
        (123456789L, 24, 16))) {
      val jpg = MediaKernels.encodeJpeg(seed, w, h)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpg))
      assert(img != null, s"imageio rejected seed=$seed")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val b = (y / 8) * (w / 8) + (x / 8)
        val want = ((seed * 31 + b) % 256).toInt
        // raw raster sample, not getRGB (which gamma-maps gray to sRGB)
        assert(img.getRaster.getSample(x, y, 0) == want,
          s"seed=$seed px($x,$y)")
      }
    }
  }

  test("JPEG decoder matches javax.imageio on a real-world-shaped stream") {
    // an ImageIO-WRITTEN grayscale JPEG: standard Huffman tables,
    // non-unit quantization, real AC coefficients. Two correct IDCTs may
    // round single pixels differently, so agreement is pinned to ±1 per
    // pixel via the sum over 960 pixels.
    import graft.operators.Multimodal.MediaKernels
    val src = new java.awt.image.BufferedImage(40, 24,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 24; x <- 0 until 40)
      src.getRaster.setSample(x, y, 0, (x * 7 + y * 13 + (x * y) % 31) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.9f)
    wr.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
    wr.write(null, new javax.imageio.IIOImage(src, null, null), p)
    wr.dispose()
    val jpg = bos.toByteArray
    val mine = MediaKernels.decodeJpegPixels(1L, jpg)
    assert(mine.format == "jpeg" && mine.width == 40 && mine.height == 24)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    var refSum = 0L
    for (y <- 0 until 24; x <- 0 until 40)
      refSum += ref.getRaster.getSample(x, y, 0)
    assert(math.abs(mine.sum_r - refSum) <= 960,
      s"our ${mine.sum_r} vs imageio $refSum")
  }

  private def expectedColorSums(seed: Long, w: Int,
                                h: Int): (Long, Long, Long) = {
    // replays the decoder's exact double math: planted (yv, cb, cr) per
    // Y sub-block, BT.601 with floor(x+0.5) rounding and [0,255] clamp
    val mx = w / 16; val my = h / 16
    var sr = 0L; var sg = 0L; var sb = 0L
    def cl(d: Double): Long = {
      val r = StrictMath.round(d)
      if (r < 0L) 0L else if (r > 255L) 255L else r
    }
    for (m <- 0 until mx * my; j <- 0 until 4) {
      val yv = ((seed * 31 + 4 * m + j) % 256).toDouble
      val cb = ((seed * 17 + 11 * m) % 256) - 128.0
      val cr = ((seed * 13 + 7 * m) % 256) - 128.0
      sr += 64L * cl(yv + 1.402 * cr)
      sg += 64L * cl(yv - 0.344136 * cb - 0.714136 * cr)
      sb += 64L * cl(yv + 1.772 * cb)
    }
    (sr, sg, sb)
  }

  test("4:2:0 color JPEG decoder inverts the formula encode exactly") {
    import graft.operators.Multimodal.MediaKernels
    for ((seed, w, h) <- Seq((7L, 16, 16), (42L, 32, 16), (255L, 16, 48),
        (123456789L, 32, 48), (0L, 16, 32))) {
      val jpg = MediaKernels.encodeJpeg420(seed, w, h)
      val (er, eg, eb) = expectedColorSums(seed, w, h)
      val f = MediaKernels.decodeJpegPixels(seed, jpg)
      assert(f.format == "jpeg" && f.width == w && f.height == h &&
        f.n_pixels == w.toLong * h, s"seed=$seed $w x $h: $f")
      assert(f.sum_r == er && f.sum_g == eg && f.sum_b == eb,
        s"seed=$seed $w x $h: got (${f.sum_r},${f.sum_g},${f.sum_b}) " +
          s"want ($er,$eg,$eb)")
    }
  }

  test("encoded 4:2:0 JPEGs are spec-valid: javax.imageio decodes them " +
      "(single-MCU, so fancy chroma upsampling cannot diverge)") {
    // the JDK's libjpeg-backed decoder is the independent reference; its
    // fixed-point BT.601 may differ ±1/pixel/channel from our
    // double-precision transform, so sums are pinned to that tolerance.
    // Single-MCU images keep chroma constant: interpolating upsamplers
    // and box upsample agree exactly there.
    import graft.operators.Multimodal.MediaKernels
    for (seed <- Seq(7L, 42L, 255L, 123456789L)) {
      val jpg = MediaKernels.encodeJpeg420(seed, 16, 16)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpg))
      assert(img != null, s"imageio rejected seed=$seed")
      assert(img.getWidth == 16 && img.getHeight == 16)
      var rr = 0L; var gg = 0L; var bb = 0L
      for (y <- 0 until 16; x <- 0 until 16) {
        val rgb = img.getRGB(x, y)
        rr += (rgb >> 16) & 0xff; gg += (rgb >> 8) & 0xff; bb += rgb & 0xff
      }
      val (er, eg, eb) = expectedColorSums(seed, 16, 16)
      val tol = 256L
      assert(math.abs(rr - er) <= tol && math.abs(gg - eg) <= tol &&
        math.abs(bb - eb) <= tol,
        s"seed=$seed imageio ($rr,$gg,$bb) vs formula ($er,$eg,$eb)")
    }
  }

  test("JPEG decoder rejects corrupt, truncated, and non-baseline input") {
    import graft.operators.Multimodal.MediaKernels
    val jpg = MediaKernels.encodeJpeg(42L, 16, 16)
    assert(MediaKernels.decodeJpegPixels(1L,
      jpg.take(jpg.length / 2)).format == "unknown")
    assert(MediaKernels.decodeJpegPixels(1L,
      "not a jpeg".getBytes).format == "unknown")
    // flip SOF0 (FFC0) to progressive (FFC2): must report unknown, not
    // mis-decode
    val prog = jpg.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xFF &&
      i + 1 < prog.length && (prog(i + 1) & 0xff) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    assert(MediaKernels.decodeJpegPixels(1L, prog).format == "unknown")
  }

  test("synthetic JPEGs round-trip the block formula via decodePixels") {
    val docs = Seq((1L, "ab"), (2L, "abcdefg"), (4L, "xyzzy"))
      .toDF("doc_id", "text")
    val got = Multimodal.decodePixels(
        Multimodal.asSyntheticJpegs(docs, "doc_id", "text").toDF())
      .collect().map(f => f.doc_id -> f).toMap
    for ((docId, t) <- Seq((1L, "ab"), (2L, "abcdefg"), (4L, "xyzzy"))) {
      val n = t.length
      val (w, h) = (8 * (n % 4 + 1), 8 * (n % 2 + 1))
      var want = 0L
      for (b <- 0 until (w / 8) * (h / 8))
        want += 64L * ((docId * 31 + b) % 256)
      val f = got(docId)
      assert(f.format == "jpeg" && f.width == w && f.height == h &&
        f.sum_r == want, s"doc $docId: $f")
    }
  }

  test("synthetic WAVs round-trip the sample formula end-to-end") {
    val docs = Seq((1L, "x" * 20), (2L, "y" * 33)).toDF("doc_id", "text")
    val got = Multimodal.decodeAudio(
        Multimodal.asSyntheticWavs(docs, "doc_id", "text").toDF())
      .collect().map(f => f.doc_id -> f).toMap
    for ((id, n) <- Seq((1L, 20), (2L, 33))) {
      val ns = n % 64 + 8
      val f = got(id)
      assert(f.format == "wav" && f.sample_rate == 8000 + n % 4 * 4000)
      assert(f.channels == 1 && f.bits == 16 && f.n_samples == ns)
      val vs = (0 until ns).map(i => (id * 31 + i) % 65536 - 32768)
      assert(f.sum_abs == vs.map(math.abs).sum && f.sum_val == vs.sum)
    }
  }

  test("audioSegments: frame energies, run detection, and formula mirror") {
    val docs = Seq((1L, "x" * 20), (2L, "y" * 33)).toDF("doc_id", "text")
    val got = Multimodal.audioSegments(
        Multimodal.asSyntheticWavs(docs, "doc_id", "text").toDF(),
        frame = 4, threshold = 65536L)
      .select("doc_id", "n_frames", "n_speech", "n_segments",
        "longest_seg", "speech_ppm")
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    for ((id, n) <- Seq((1L, 20), (2L, 33))) {
      val ns = n % 64 + 8
      val sp = (0 until ns).map(i => math.abs((id * 31 + i) % 65536 - 32768))
        .grouped(4).map(_.sum >= 65536L).toSeq
      val runs = sp.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true) => 1 :: acc
        case (acc, false) => 0 :: acc
      }.filter(_ > 0)
      val want = (id, sp.size.toLong, sp.count(identity).toLong,
        runs.size.toLong, (if (runs.isEmpty) 0 else runs.max).toLong,
        sp.count(identity).toLong * 1000000L / sp.size)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
    // non-WAV payload: zero frames, zero everything
    val junk = Seq(Multimodal.MediaRow(9L, "not riff".getBytes, "bin"))
      .toDF()
    val z = Multimodal.audioSegments(junk, frame = 4, threshold = 1L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(z == ((9L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("videoSceneCuts: adjacent-frame luma deltas, shot runs, and " +
      "formula mirror; non-Y4M reports zero") {
    val docs = Seq((1L, "x" * 20), (2L, "y" * 33)).toDF("doc_id", "text")
    val got = Multimodal.videoSceneCuts(
        Multimodal.asSyntheticVideos(docs, "doc_id", "text").toDF(),
        threshold = 680L)
      .select("doc_id", "n_frames", "n_cuts", "n_shots", "longest_shot")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    for ((id, n) <- Seq((1L, 20), (2L, 33))) {
      val nf = n % 6 + 2
      def luma(f: Int, p: Int): Long = (id * 31 + f * 131 + p) % 256
      val cuts = (1 until nf).map(f =>
        (0 until 8).map(p => math.abs(luma(f, p) - luma(f - 1, p))).sum >= 680L)
      val runs = cuts.foldLeft(List.empty[Int]) {
        case (acc, false) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, false) => 1 :: acc
        case (acc, true) => 0 :: acc
      }.filter(_ > 0)
      val want = (id, nf.toLong, cuts.count(identity).toLong,
        cuts.count(identity).toLong + 1,
        (if (runs.isEmpty) 0 else runs.max).toLong + 1)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
    val junk = Seq(Multimodal.MediaRow(9L, "not y4m".getBytes, "bin")).toDF()
    val z = Multimodal.videoSceneCuts(junk, threshold = 1L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(z == ((9L, 0L, 0L, 0L, 0L)))
  }

  test("WAV chunk walk tolerates extra chunks; non-WAV is unknown") {
    val orig = Multimodal.MediaKernels.encodeWav(7L, 16, 8000)
    // splice a 2-byte JUNK chunk between WAVE and fmt
    val junk = "JUNK".getBytes ++ Array[Byte](2, 0, 0, 0, 9, 9)
    val spliced = orig.take(12) ++ junk ++ orig.drop(12)
    val a = Multimodal.MediaKernels.decodeWavSamples(7L, spliced)
    val b = Multimodal.MediaKernels.decodeWavSamples(7L, orig)
    assert(a == b && a.format == "wav")
    val bad = Multimodal.MediaKernels.decodeWavSamples(7L,
      "definitely not a riff file, just some bytes....".getBytes)
    assert(bad.format == "unknown" && bad.n_samples == 0L)
  }

  test("synthetic Y4M videos round-trip the sampled luma formula") {
    val docs = Seq((1L, "x" * 20), (2L, "y" * 33)).toDF("doc_id", "text")
    val got = Multimodal.sampleFrames(
        Multimodal.asSyntheticVideos(docs, "doc_id", "text").toDF(),
        step = 2)
      .collect().map(f => f.doc_id -> f).toMap
    for ((id, n) <- Seq((1L, 20), (2L, 33))) {
      val nf = n % 6 + 2
      val f = got(id)
      assert(f.format == "y4m" && f.width == 4 && f.height == 2)
      assert(f.n_frames == nf && f.n_sampled == (nf + 1) / 2)
      val exp = (0 until nf).filter(_ % 2 == 0).flatMap(fr =>
        (0 until 8).map(p => (id * 31 + fr * 131 + p) % 256)).sum
      assert(f.sum_y == exp)
    }
  }

  test("Y4M decoder rejects truncated frames and non-Y4M bytes") {
    val ok = Multimodal.MediaKernels.encodeY4m(3L, 4, 2, 3)
    val trunc = ok.take(ok.length - 5)
    assert(Multimodal.MediaKernels.decodeY4mSampled(3L, trunc, 2)
      .format == "unknown")
    assert(Multimodal.MediaKernels.decodeY4mSampled(3L,
      "MPEG4 something else".getBytes, 2).format == "unknown")
    // step 1 samples every frame
    val all = Multimodal.MediaKernels.decodeY4mSampled(3L, ok, 1)
    assert(all.n_frames == 3L && all.n_sampled == 3L)
  }

  test("WAV and Y4M kernels round-trip random shapes exactly") {
    val rnd = new scala.util.Random(59)
    for (_ <- 1 to 25) {
      val seed = rnd.nextInt(100000).toLong
      val ns = 1 + rnd.nextInt(200)
      val rate = 8000 + rnd.nextInt(4) * 4000
      val w = Multimodal.MediaKernels.decodeWavSamples(seed,
        Multimodal.MediaKernels.encodeWav(seed, ns, rate))
      val vs = (0 until ns).map(i => (seed * 31 + i) % 65536 - 32768)
      assert(w.format == "wav" && w.sample_rate == rate &&
        w.n_samples == ns && w.sum_abs == vs.map(math.abs).sum &&
        w.sum_val == vs.sum)
      val fw = 1 + rnd.nextInt(8)
      val fh = 1 + rnd.nextInt(6)
      val nf = 1 + rnd.nextInt(10)
      val step = 1 + rnd.nextInt(3)
      val v = Multimodal.MediaKernels.decodeY4mSampled(seed,
        Multimodal.MediaKernels.encodeY4m(seed, fw, fh, nf), step)
      val expY = (0 until nf).filter(_ % step == 0).flatMap(f =>
        (0 until fw * fh).map(p => (seed * 31 + f.toLong * 131 + p) % 256))
        .sum
      assert(v.format == "y4m" && v.width == fw && v.height == fh &&
        v.n_frames == nf && v.sum_y == expY)
    }
  }

  test("dhashBmp matches an independent pixel-formula recompute") {
    val rnd = new scala.util.Random(61)
    for (_ <- 1 to 20) {
      val seed = rnd.nextInt(97).toLong
      val w = (seed % 16).toInt + 1
      val h = (seed / 16 % 8).toInt + 1
      val (fmt, dw, dh, hash) = Multimodal.MediaKernels.dhashBmp(
        Multimodal.MediaKernels.encodeBmp(seed, w, h))
      assert(fmt == "bmp" && dw == w && dh == h)
      // recompute from the logical pixel formula, not the wire bytes
      def gray(x: Int, y: Int): Long = {
        val j0 = (y.toLong * w + x) * 3
        ((seed * 31 + j0) % 256 + (seed * 31 + j0 + 1) % 256 +
          (seed * 31 + j0 + 2) % 256) / 3
      }
      var exp = 0L
      for (by <- 0 until 8; bx <- 0 until 7)
        if (gray((bx + 1) * w / 8, by * h / 8) > gray(bx * w / 8, by * h / 8))
          exp |= 1L << (by * 7 + bx)
      assert(hash == exp)
      assert(hash >= 0L)       // 56-bit pack: sign bit never set
    }
    // non-BMP payload hashes to the unknown sentinel
    assert(Multimodal.MediaKernels.dhashBmp("not a bmp".getBytes)._4 == -1L)
  }

  test("dedupByPhash collapses planted pixel twins to one bucket") {
    // doc_ids 3 and 3+97 share seed 3 → identical bytes → same phash;
    // seed 0 is the 1×1 image whose gradient hash is exactly 0
    val docs = Seq(3L, 100L, 0L).map(i => (i, "x")).toDF("doc_id", "text")
    val r = Multimodal.dedupByPhash(
        Multimodal.asSyntheticPhotoSet(docs, "doc_id").toDF())
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(3L)._2 == 3L && r(100L)._2 == 3L)   // rep = min of the twins
    assert(r(3L)._1 == r(100L)._1)               // same phash
    assert(r(3L)._3 == 2L && r(100L)._3 == 2L)   // grp_n
    assert(r(0L)._1 == 0L)                       // 1×1 → zero hash
  }

  test("decode runs per-partition (batch contract preserved)") {
    val docs = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartition(7)
    val out = Multimodal.decodeFeatures(
      Multimodal.asMediaTable(docs, "doc_id", "text"))
    assert(out.rdd.getNumPartitions == 7)
    assert(out.count() == 100L)
  }
}
