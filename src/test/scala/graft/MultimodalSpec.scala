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

  test("decode kernel emits deterministic features with the real schema") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val f = Multimodal.decodeFeatures(
      Multimodal.asMediaTable(docs, "doc_id", "text")).collect().head
    assert(f.n_bytes == 2L)
    // checksum: ((0*131+97)%p)*131 + 98 = 97*131+98 = 12805
    assert(f.checksum == 12805L)
    assert(f.width == 3 && f.height == 3)
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
