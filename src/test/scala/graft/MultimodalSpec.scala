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

  test("decode runs per-partition (batch contract preserved)") {
    val docs = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartition(7)
    val out = Multimodal.decodeFeatures(
      Multimodal.asMediaTable(docs, "doc_id", "text"))
    assert(out.rdd.getNumPartitions == 7)
    assert(out.count() == 100L)
  }
}
