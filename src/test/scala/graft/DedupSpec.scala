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

  test("ngram DF cap prunes a hot shingle's quadratic candidate pairs") {
    // 10 docs share one stop-shingle run but are otherwise disjoint:
    // uncapped, the inverted index generates all 45 pairs from the hot
    // postings; with maxDf=5 the hot shingles are dropped before the pair
    // join and no candidate survives.
    val hot = Seq.tabulate(10)(i =>
      (i.toLong, s"the end of it w${i}a w${i}b w${i}c w${i}d")).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccard(hot, "doc_id", "text", k = 3,
      threshold = 0.0).count()
    val capped = Dedup.ngramJaccard(hot, "doc_id", "text", k = 3,
      threshold = 0.0, maxDf = 5).count()
    assert(uncapped == 45L && capped == 0L)
  }

  test("ngram DF cap keeps sub-cap pair scores exact") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", k = 3,
        threshold = 0.3, maxDf = 50)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(pairs.contains((0L, 1L, 1.0)) && pairs.contains((0L, 2L, 0.8)))
  }

  test("portable simhash: identical docs at hamming 0, disjoint filtered") {
    val pairs = Dedup.simhashPortable(docs, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)]
      .collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair((0L, 1L)) == 0L)
    assert(!byPair.contains((0L, 3L)))
  }

  test("clusters: min-label propagation finds components across chains") {
    // chain 5-6-7-8 (diameter 3 → needs several propagation rounds),
    // pair 1-2, and 3-4; representatives are each component's min id
    val pairs = Seq((5L, 6L), (6L, 7L), (7L, 8L), (1L, 2L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L,
      1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("large/small-star components equal min-label propagation") {
    // random graphs incl. long chains (worst case for min-label, best
    // showcase for star contraction) — both must produce identical maps
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      val chain = (0 until n - 1).map(i => (i.toLong * 7, (i + 1L) * 7))
      val random = Seq.fill(n)((rnd.nextInt(n).toLong * 3 + 1,
        rnd.nextInt(n).toLong * 3 + 1)).filter(p => p._1 != p._2)
      val pairs = (chain ++ random).toDF("doc_a", "doc_b")
      val byProp = Dedup.clusters(pairs)
        .as[(Long, Long)].collect().toMap
      val byStar = Dedup.clustersStar(pairs)
        .as[(Long, Long)].collect().toMap
      assert(byStar == byProp, s"trial $trial")
    }
  }

  test("both cluster variants keep self-loop-only nodes as their own rep") {
    val pairs = Seq((5L, 5L), (1L, 2L)).toDF("doc_a", "doc_b")
    val want = Map(5L -> 5L, 1L -> 1L, 2L -> 1L)
    assert(Dedup.clusters(pairs).as[(Long, Long)].collect().toMap == want)
    assert(Dedup.clustersStar(pairs).as[(Long, Long)].collect().toMap == want)
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

  test("hyperplane-LSH near-dup finds near-identical vectors across labels") {
    // near-identical vectors land in the same sign-bit bucket in every
    // band; orthogonal ones differ. No label involvement at all.
    val base = Array.tabulate(64)(j => math.sin(j + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val ortho = Array.tabulate(64)(j => (if (j % 2 == 0) base(j + 1) else -base(j - 1)))
    val e = Seq((0L, base, 1), (1L, near, 2), (2L, ortho, 1))
      .toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingNearDupLsh(e, threshold = 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("hyperplane-LSH fails fast on an embedding dimension mismatch") {
    // silently null-padded dot products would zero every sign bit and
    // collapse all vectors into one quadratic bucket — must throw instead
    val e = Seq((0L, Array.fill(32)(0.1f), 1), (1L, Array.fill(32)(0.2f), 1))
      .toDF("vec_id", "embedding", "label")
    val ex = intercept[Throwable](
      Dedup.embeddingNearDupLsh(e, threshold = 0.5).count())
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("dim"), msgs)
  }

  test("hyperplane-LSH matches label-blocked near-dup on same-label pairs") {
    // the LSH variant is a superset of the label-blocked gate when recall
    // holds: every label-blocked pair must also be found by the buckets
    val spark2 = spark
    val docs = spark2.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val blocked = Dedup.embeddingNearDup(docs, threshold = 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupLsh(docs, threshold = 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(blocked.subsetOf(lsh),
      s"label-blocked pairs missed by LSH: ${blocked.diff(lsh)}")
  }

  test("fuzzyPairs equals brute-force same-length Hamming<=1 on random strings") {
    // pigeonhole completeness: with no block cap, the output must be
    // EXACTLY the same-length pairs within Hamming distance 1 (for equal
    // lengths, levenshtein<=1 ⟺ Hamming<=1)
    val rnd = new scala.util.Random(29)
    val strs = (1 to 30).map { i =>
      val len = 4 + rnd.nextInt(3)
      (i.toLong, (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val brute = (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib && sa.length == sb.length &&
        sa.zip(sb).count(p => p._1 != p._2) <= 1
    } yield (ia, ib, sa.zip(sb).count(p => p._1 != p._2).toLong)).toSet
    val out = Dedup.fuzzyPairs(strs.toDF("eid", "nm"), "eid", "nm",
      maxBlock = 1000).as[(Long, Long, Long)].collect().toSet
    assert(out == brute, s"missing: ${brute.diff(out)}, extra: ${out.diff(brute)}")
  }

  test("fuzzyPairs: half-block candidates, levenshtein verify, dist 0 kept") {
    // ab/ac share the L half; ab/ab are exact dupes; xy is isolated
    val df = Seq((1L, "ab"), (2L, "ac"), (3L, "xy"), (4L, "ab"))
      .toDF("eid", "nm")
    val out = Dedup.fuzzyPairs(df, "eid", "nm", maxBlock = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 1L), (1L, 4L, 0L), (2L, 4L, 1L)))
  }

  test("fuzzyPairs: hot blocks are dropped whole by the cap") {
    // maxBlock=2 drops the 3-member "L|2|a" block; only the R-half
    // block {ab, ab} survives as a candidate source
    val df = Seq((1L, "ab"), (2L, "ac"), (3L, "xy"), (4L, "ab"))
      .toDF("eid", "nm")
    val out = Dedup.fuzzyPairs(df, "eid", "nm", maxBlock = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 4L, 0L)))
  }

  test("dupSpans: shared 5-token span marks one position in each doc") {
    // both docs contain "a b c d e"; their second spans are unique
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e x"))
      .toDF("doc_id", "text")
    val r = Dedup.dupSpans(docs, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r == Map(1L -> ((2L, 1L, 500000L)), 2L -> ((2L, 1L, 500000L))))
  }

  test("dupSpans: within-doc repetition counts as duplication") {
    // "p q r s t p q r s t": spans at positions 1 and 6 are identical
    val docs = Seq((7L, "p q r s t p q r s t"), (8L, "too short"))
      .toDF("doc_id", "text")
    val r = Dedup.dupSpans(docs, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // doc 7: 6 spans, the two "p q r s t" occurrences are dups; doc 8
    // has < 5 tokens → absent
    assert(r == Map(7L -> ((6L, 2L))))
  }

  test("minhashIncremental: batch screens against corpus, novel docs get -1") {
    val corpus = Seq((0L, a), (3L, b)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, a),                                      // exact dup of corpus 0
      (11L, aNear),                                  // near-dup of corpus 0
      (12L, "zz yy xx ww vv uu tt ss rr qq"),        // novel
      (13L, "x y")                                   // too short for k=3
    ).toDF("doc_id", "text")
    val r = Dedup.minhashIncremental(corpus, batch, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r.keySet == Set(10L, 11L, 12L, 13L))
    assert(r(10L) == ((1L, 0L)))
    assert(r(12L) == ((0L, -1L)))
    assert(r(13L) == ((0L, -1L)))
    // doc 11's verdict must agree with the self-join formulation run over
    // corpus ∪ {11}: incremental is a restriction, not a new estimator
    val pairs = Dedup.minhashLshPortable(
        Seq((0L, a), (3L, b), (11L, aNear)).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expect11 = if (pairs.contains((0L, 11L))) (1L, 0L) else (0L, -1L)
    assert(r(11L) == expect11)
  }

  test("removeDupSpans: keeps the canonical occurrence, strips the rest") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e x"))
      .toDF("doc_id", "text")
    val r = Dedup.removeDupSpans(docs, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // doc 1 holds the first "a b c d e" → untouched; doc 2's copy covers
    // its positions 1..5, leaving only the trailing "x"
    assert(r(1L) == ((6L, 6L, 0L, "a b c d e f")))
    assert(r(2L) == ((6L, 1L, 5L, "x")))
  }

  test("removeDupSpans: within-doc repeat keeps the first copy; short docs pass through") {
    val docs = Seq((7L, "p q r s t p q r s t"), (8L, "too short"))
      .toDF("doc_id", "text")
    val r = Dedup.removeDupSpans(docs, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._3, t._5))).toMap
    assert(r(7L) == ((5L, "p q r s t")))
    assert(r(8L) == ((2L, "too short")))
  }

  test("removeDupSpans: matches a brute-force reference on random corpora") {
    val rnd = new scala.util.Random(1234)
    val n = 4
    for (_ <- 0 until 3) {
      val corpus = (0L until 12L).map { id =>
        val len = 2 + rnd.nextInt(14)
        id -> Seq.fill(len)(('a' + rnd.nextInt(3)).toChar.toString)
          .mkString(" ")
      }
      // reference: span stats + canonical-min-ordinal removal, plain Scala
      val spans = corpus.flatMap { case (id, text) =>
        val ws = text.split(" ", -1)
        (0 to ws.length - n).map(i =>
          (id, i + 1, ws.slice(i, i + n).mkString(" ")))
      }
      val stats = spans.groupBy(_._3).map { case (s, occ) =>
        s -> ((occ.size, occ.map(o => o._1 * (1L << 20) + o._2).min))
      }
      val expected = corpus.map { case (id, text) =>
        val ws = text.split(" ", -1)
        val removed = spans.collect {
          case (d, p, s) if d == id && stats(s)._1 > 1 &&
            d * (1L << 20) + p != stats(s)._2 =>
            (p until p + n)
        }.flatten.toSet
        val kept = ws.zipWithIndex.collect {
          case (w, i) if !removed.contains(i + 1) => w
        }
        (id, ws.length.toLong, kept.length.toLong,
          (ws.length - kept.length).toLong, kept.mkString(" "))
      }.toSet
      val got = Dedup.removeDupSpans(corpus.toDF("doc_id", "text"),
          "doc_id", "text", n = n)
        .as[(Long, Long, Long, Long, String)].collect().toSet
      assert(got == expected)
    }
  }

  test("keepBest: component argmax on quality, ties to min id, singletons kept") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 7L))
      .toDF("doc_id", "n_chars")
    val got = Dedup.keepBest(pairs, docs, "doc_id",
        org.apache.spark.sql.functions.col("n_chars"))
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toList
    assert(got == List((1L, 1L, 5L, false), (2L, 1L, 9L, true),
      (3L, 1L, 9L, false), (4L, 4L, 7L, true)))
  }

  test("blockingQuality: hand-computed PC and RR on a 5-entity fixture") {
    // blocks (len-4 halves): L|4|ab = {1, 2, 5}, R|4|cd = {1, 5};
    // candidates = (1,2), (1,5), (2,5). Truth (1,2) found, truth (3,4)
    // shares no block → PC = 1/2; RR = 1 − 3/C(5,2) = 0.7
    val ents = Seq((1L, "abcd"), (2L, "abqd"), (3L, "xxxx"),
      (4L, "yyyy"), (5L, "abcd")).toDF("eid", "nm")
    val truth = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.blockingQuality(
        Dedup.halfBlocks(ents, "eid", "nm"), truth, maxBlock = 50)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((5L, 2L, 3L, 1L, 500000L, 700000L)))
  }

  test("blockingQuality: maxBlock cap trades pair completeness for " +
      "reduction ratio") {
    // 30 same-name entities: one hot block pair; truth = (i, i+15).
    // Uncapped: all C(30,2) pairs are candidates → PC = 1, low RR.
    // Capped at 10: the hot blocks drop whole → PC = 0, RR = 1e6.
    val ents = (1L to 30L).map(i => (i, "samename")).toDF("eid", "nm")
    val truth = (1L to 15L).map(i => (i, i + 15L)).toDF("id_a", "id_b")
    val open = Dedup.blockingQuality(
        Dedup.halfBlocks(ents, "eid", "nm"), truth, maxBlock = 100)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(open._3 == 435L && open._5 == 1000000L)
    val capped = Dedup.blockingQuality(
        Dedup.halfBlocks(ents, "eid", "nm"), truth, maxBlock = 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(capped._3 == 0L && capped._5 == 0L && capped._6 == 1000000L)
  }

  test("containment catches a short doc embedded in a long one that " +
      "Jaccard misses, with exact asymmetric scores") {
    // long: 40 distinct words -> 38 shingles; short: 8 consecutive words
    // of it -> 6 shingles, ALL shared. cont(short)=1.0, cont(long)=6/38,
    // jaccard = 6/38 -- below any useful resemblance threshold.
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (11 to 18).map(i => s"w$i").mkString(" ")
    val d = Seq((0L, long), (1L, short)).toDF("doc_id", "text")
    val jac = Dedup.ngramJaccard(d, "doc_id", "text", k = 3,
      threshold = 0.6).count()
    assert(jac == 0L)
    val cont = Dedup.containment(d, "doc_id", "text", k = 3,
        threshold = 0.6)
      .select("doc_a", "doc_b", "cont_a", "cont_b")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(cont == Seq((0L, 1L, math.floor(6.0 / 38 * 1e6 + 0.5) / 1e6, 1.0)))
  }

  test("containment DF cap drops hot-shingle-only pairs, keeps exact " +
      "denominators for survivors") {
    // 30 docs share ONE hot shingle; two docs also share a rare run
    val hot = "x y z"
    val run = "p q r s"
    val d = ((0 until 30).map(i => (i.toLong, s"$hot u$i v$i")) ++
      Seq((100L, s"$run a b"), (101L, s"$run c d"))).toDF("doc_id", "text")
    val pairs = Dedup.containment(d, "doc_id", "text", k = 3,
        threshold = 0.4, maxDf = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // hot-shingle pairs (sharing only "x y z") are pruned; the rare-run
    // pair survives: each side has 4 shingles, 2 shared ("p q r","q r s")
    assert(pairs == Set((100L, 101L)))
  }

  test("containment dominates Jaccard on every surviving pair " +
      "(C(A,B) >= J(A,B) — Broder's inequality, checked on random docs)") {
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 12).map(i => s"v$i")
    val d = (0L until 40L).map(i =>
      (i, Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))).toDF("doc_id", "text")
    val jac = Dedup.ngramJaccard(d, "doc_id", "text", k = 3,
        threshold = 0.0)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val cont = Dedup.containment(d, "doc_id", "text", k = 3,
        threshold = 0.0)
      .select("doc_a", "doc_b", "cont_a", "cont_b")
      .as[(Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(jac.nonEmpty && jac.keySet == cont.keySet)
    for ((pair, j) <- jac; (ca, cb) = cont(pair)) {
      assert(math.max(ca, cb) + 1e-6 >= j, s"$pair: max($ca,$cb) < $j")
      assert(math.min(ca, cb) + 1e-6 >= j, s"$pair: min($ca,$cb) < $j")
    }
  }

  test("clusterSafeSplit keeps near-dup clusters in one split, counts " +
      "singletons as their own cluster, and measures zero leakage") {
    // component {1,2,3} (chain), component {10,11}, singletons 20..29
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val docs = (Seq(1L, 2L, 3L, 10L, 11L) ++ (20L to 29L))
      .toDF("doc_id")
    val out = Dedup.clusterSafeSplit(docs, "doc_id", pairs)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum == 15L)           // every doc exactly once
    assert(out.forall(_._5 == 0L))             // leakage invariant
    // cluster members landed together: recompute each doc's split from
    // its rep and compare against the aggregate checksums
    def split(rep: Long): String = {
      val b = rep % 1000000007L * 2654435761L % 1000000007L % 100L
      if (b < 80) "train" else if (b < 90) "valid" else "test"
    }
    val rep = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L) ++
      (20L to 29L).map(i => i -> i)
    val expect = rep.toSeq.groupBy { case (d, r) => split(r) }
      .map { case (sp, ds) =>
        (sp, ds.size.toLong, ds.map(_._2).distinct.size.toLong,
          ds.map(_._1).sum, 0L)
      }.toSet
    assert(out.toSet == expect)
  }

  test("chunkFrequencyStrip removes cross-doc boilerplate chunks, keeps " +
      "order, and leaves all-boilerplate docs as empty rows") {
    val header = (1 to 8).map(i => s"h$i").mkString(" ") // shared chunk 0
    val bodyA = (1 to 8).map(i => s"a$i").mkString(" ")
    val bodyB = (1 to 8).map(i => s"b$i").mkString(" ")
    val unique = (1 to 16).map(i => s"u$i").mkString(" ")
    val d = Seq(
      (0L, s"$header $bodyA"), (1L, s"$header $bodyB"),
      (2L, unique),
      (3L, header), (4L, header) // entirely boilerplate pair
    ).toDF("doc_id", "text")
    val out = Dedup.chunkFrequencyStrip(d, "doc_id", "text",
        size = 8, minDf = 2)
      .select("doc_id", "total_chunks", "kept_chunks", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 2L, 1L, bodyA)))
    assert(out(1L) == ((1L, 2L, 1L, bodyB)))
    assert(out(2L) == ((2L, 2L, 2L, unique))) // untouched, order intact
    assert(out(3L) == ((3L, 1L, 0L, "")))
    assert(out(4L) == ((4L, 1L, 0L, "")))
  }
}
