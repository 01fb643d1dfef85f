package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val a = "the quick brown fox jumps over the lazy dog again today"
  private val aNear = "the quick brown fox jumps over the lazy dog again tomorrow"
  private val b = "completely different words appear here in this other document now yes"

  private def docs = Seq(
    (0L, a), (1L, a), (2L, aNear), (3L, b)
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val groups = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n").as[(Long, Long)].collect().toSet
    assert(groups == Set((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("ngram jaccard finds the near-dup pair with the exact value") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", k = 3,
        threshold = 0.3)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    // a has 9 distinct 3-shingles, aNear has 9, they share 8 ->
    // J = 8 / (9 + 9 - 8) = 0.8
    assert(pairs.contains((0L, 1L, 1.0)))   // identical docs
    assert(pairs.contains((0L, 2L, 0.8)) && pairs.contains((1L, 2L, 0.8)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH surfaces identical and near-identical docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "est_jaccard").as[(Long, Long, Double)]
      .collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair((0L, 1L)) == 1.0)          // identical: all minima match
    assert(!byPair.contains((0L, 3L)))       // unrelated docs never collide
  }

  test("portable minhash agrees with the xxhash variant on planted dups") {
    val pairs = Dedup.minhashLshPortable(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "est_jaccard").as[(Long, Long, Double)]
      .collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair((0L, 1L)) == 1.0)
    assert(!byPair.contains((0L, 3L)))
  }

  test("simhash: identical docs at hamming 0, disjoint docs filtered") {
    val pairs = Dedup.simhash(docs, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)]
      .collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair((0L, 1L)) == 0L)
    assert(!byPair.contains((0L, 3L)))
  }

  test("embedding near-dup respects the threshold within label blocks") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.9f, 0.1f), 1),   // cos ~ 0.994 with vec 0
      (2L, Array(0.0f, 1.0f), 1),   // cos 0 with vec 0
      (3L, Array(1.0f, 0.0f), 2)    // other label: never paired with 0
    ).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingNearDup(e, threshold = 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }
}
