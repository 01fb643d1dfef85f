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

  test("profile: one-pass per-column non-null + exact distinct counts") {
    val df = Seq(
      (Some("en"), Some(1L)), (Some("en"), None), (Some("fr"), Some(2L)),
      (None, Some(2L))
    ).toDF("lang", "v")
    val p = CorpusTools.profile(df, Seq("lang", "v"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(p == Set(("lang", 3L, 2L, 4L), ("v", 3L, 2L, 4L)))
  }

  test("redactNumbers replaces every digit run and counts matches") {
    val df = Seq((1L, "a1b22c333"), (2L, "no digits")).toDF("doc_id", "text")
    val r = CorpusTools.redactNumbers(df, "text")
      .select("doc_id", "redacted", "n_redacted")
      .as[(Long, String, Long)].collect()
      .map { case (i, t, n) => i -> ((t, n)) }.toMap
    assert(r(1L) == (("a<NUM>b<NUM>c<NUM>", 3L)))
    assert(r(2L) == (("no digits", 0L)))
  }

  test("chunkWords: overlap windows cover the doc, short docs one chunk") {
    // 13 words, size 5, overlap 2 → step 3, n_chunks = 1+ceil(8/3) = 4
    val text = (1 to 13).map(i => s"w$i").mkString(" ")
    val df = Seq((7L, text), (8L, "a b")).toDF("doc_id", "text")
    val ch = CorpusTools.chunkWords(df, "doc_id", "text",
        size = 5, overlap = 2)
      .as[(Long, Long, Seq[String], Long)].collect()
    val d7 = ch.filter(_._1 == 7L).sortBy(_._2)
    assert(d7.map(_._4).toSeq == Seq(5L, 5L, 5L, 4L))
    assert(d7.head._3 == Seq("w1", "w2", "w3", "w4", "w5"))
    assert(d7(1)._3.head == "w4") // overlap of 2: starts 1,4,7,10
    assert(d7.last._3 == Seq("w10", "w11", "w12", "w13"))
    val d8 = ch.filter(_._1 == 8L)
    assert(d8.length == 1 && d8.head._3 == Seq("a", "b"))
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
