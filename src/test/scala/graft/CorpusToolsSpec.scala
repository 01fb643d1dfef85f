package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusTools

class CorpusToolsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hashSplit is deterministic, total, and roughly proportioned") {
    val df = (0L until 1000L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val a = CorpusTools.hashSplit(df, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val b = CorpusTools.hashSplit(df, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a == b)
    assert(a.values.sum == 1000L)
    assert(a("train") > 700 && a("train") < 900)
    assert(a("valid") > 50 && a("valid") < 180)
  }

  test("hashSplit survives repartitioning unchanged (rand() would not)") {
    val df = (0L until 200L).map(i => (i, "x")).toDF("doc_id", "text")
    val once = CorpusTools.hashSplit(df, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val again = CorpusTools.hashSplit(df.repartition(7), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(once == again)
  }

  test("topNgrams counts positional bigrams with lexicographic tiebreak") {
    val docs = Seq(
      ("en", "a b a b c"),   // bigrams: "a b"×2, "b a", "b c"
      ("en", "a b"),         // "a b"
      ("fr", "x y")
    ).toDF("lang", "text")
    val top = CorpusTools.topNgrams(docs, "lang", "text", n = 2, k = 2)
      .as[(String, String, Long, Long)].collect().toSet
    assert(top == Set(
      ("en", "a b", 3L, 1L), ("en", "b a", 1L, 2L),
      ("fr", "x y", 1L, 1L)))
  }

  test("buildVocab ranks by frequency then word, applying minCount") {
    val docs = Seq(
      (1L, "b b b a a c"), (2L, "a b")
    ).toDF("doc_id", "text")
    val v = CorpusTools.buildVocab(docs, "text", minCount = 2L)
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    // b:4, a:3 survive; c:1 filtered; tie impossible here but order fixed
    assert(v == Seq((1L, "b", 4L), (2L, "a", 3L)))
  }
}
