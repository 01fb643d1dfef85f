package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {

  test("rankingEval computes integer-exact MRR/recall/precision on a " +
      "hand-checkable example") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    // q1: hits at ranks 2 and 5 of 3 relevant -> mrr 2520/2, rr 2520/2 +
    // 2520/5, recall 2/3, precision 2/10
    // q2: no hits of 2 relevant -> zeros
    // q3: hit at rank 1 of 1 relevant -> perfect
    val results = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 4L),
      (1L, 14L, 5L),
      (2L, 20L, 1L), (2L, 21L, 2L),
      (3L, 30L, 1L), (3L, 31L, 2L)).toDF("qid", "doc_id", "rn")
    val qrels = Seq(
      (1L, 11L), (1L, 14L), (1L, 99L),
      (2L, 88L), (2L, 89L),
      (3L, 30L)).toDF("qid", "doc_id")
    val got = graft.operators.Retrieval.rankingEval(results, qrels, k = 10)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 2L, 1260L, 1260L + 504L, 666666L, 200000L),
      (2L, 2L, 0L, 0L, 0L, 0L, 0L, 0L),
      (3L, 1L, 1L, 1L, 2520L, 2520L, 1000000L, 100000L)))
    // rn beyond k is ignored
    val gotK2 = graft.operators.Retrieval
      .rankingEval(results, qrels, k = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(gotK2.head == (1L, 3L, 1L, 2L, 1260L, 1260L, 333333L, 500000L))
    intercept[IllegalArgumentException] {
      graft.operators.Retrieval.rankingEval(results, qrels, k = 11)
    }
  }

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "banana banana banana"))
    .toDF("doc_id", "text")

  /** The score formula replayed with the same IEEE ops the engine (and
    * the DuckDB oracle) uses — +, ×, ÷, sqrt are all correctly rounded,
    * so this is exact, not approximate. N = 3, L = 8. */
  private def term(tf: Double, dl: Double, df: Double): Long =
    math.floor((tf * 2.25) /
      (tf + 1.25 * (0.25 + 0.75 * (dl * 3.0 / 8.0))) *
      math.sqrt((3.0 - df + 0.5) / (df + 0.5)) * 1000000.0).toLong

  test("bm25TopK: single-term query scores and ranks exactly") {
    val qt = Seq((0L, "apple")).toDF("qid", "word")
    val r = Retrieval.bm25TopK(docs, "doc_id", "text", qt, k = 10)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // df(apple) = 2; d1: tf 2 dl 3, d2: tf 1 dl 2; d3 has no match
    assert(r == Map(
      (0L, 1L) -> ((term(2, 3, 2), 1L)),
      (0L, 2L) -> ((term(1, 2, 2), 2L))))
    assert(term(2, 3, 2) > term(1, 2, 2))
  }

  test("bm25TopK: multi-term scores sum per document; k bounds output") {
    val qt = Seq((7L, "apple"), (7L, "banana")).toDF("qid", "word")
    val all = Retrieval.bm25TopK(docs, "doc_id", "text", qt, k = 10)
      .as[(Long, Long, Long, Long)].collect()
    // d1 matches both terms — its score is the exact sum of the two
    val d1 = all.find(_._2 == 1L).get
    assert(d1._3 == term(2, 3, 2) + term(1, 3, 2))
    // df(banana) = 2 as well; all three docs match something
    assert(all.length == 3)
    // k = 1 keeps only the best-ranked document
    val top1 = Retrieval.bm25TopK(docs, "doc_id", "text", qt, k = 1)
      .as[(Long, Long, Long, Long)].collect()
    assert(top1.length == 1 && top1.head._4 == 1L)
    assert(top1.head._3 == all.map(_._3).max)
  }

  test("bm25TopK: score ties rank by ascending doc id") {
    val d = Seq((5L, "kiwi"), (4L, "kiwi")).toDF("doc_id", "text")
    val qt = Seq((0L, "kiwi")).toDF("qid", "word")
    val r = Retrieval.bm25TopK(d, "doc_id", "text", qt, k = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    assert(r.map(_._2).toSeq == Seq(4L, 5L))
    assert(r.map(_._3).distinct.length == 1)
  }

  test("rrfFuse: integer contributions sum across rankings, ties by doc id") {
    val a = Seq((0L, 1L, 1L), (0L, 2L, 2L)).toDF("qid", "doc_id", "rn")
    val b = Seq((0L, 2L, 1L), (0L, 3L, 2L)).toDF("qid", "doc_id", "rn")
    val r = Retrieval.rrfFuse(Seq(a, b), k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    val c1 = 1000000L / 61 // rank 1
    val c2 = 1000000L / 62 // rank 2
    // d2 appears in both lists (rank 2 + rank 1); d1's single rank-1
    // contribution outranks d3's single rank-2 one
    assert(r.map(t => (t._2, t._3)).toSeq ==
      Seq((2L, c1 + c2), (1L, c1), (3L, c2)))
    // k bounds the fused list
    assert(Retrieval.rrfFuse(Seq(a, b), k = 1).count() == 1)
  }

  test("trigramSearch: indexed result equals the brute contains-scan") {
    // doc 3 holds every trigram of "abcd" (abc, bcd) WITHOUT the
    // substring — the candidate the contains-verification must reject
    val docs = Seq(
      (1L, "xx abcd yy"), (2L, "abc only here"),
      (3L, "abcx then bcdy"), (4L, "nothing"), (5L, "ab")
    ).toDF("doc_id", "text")
    val pats = Seq("abcd", "thing")
    val got = Retrieval.trigramSearch(docs, "doc_id", "text", pats)
      .as[(String, Long)].collect().toSet
    assert(got == Set(("abcd", 1L), ("thing", 4L)))
    // short patterns are rejected up front, not silently mis-answered
    intercept[IllegalArgumentException] {
      Retrieval.trigramSearch(docs, "doc_id", "text", Seq("ab"))
    }
  }
}
