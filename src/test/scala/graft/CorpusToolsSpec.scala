package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusTools

class CorpusToolsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scrubPii applies rules sequentially: the email rule consumes " +
      "addresses before the digit rules can shred them") {
    val df = Seq(
      (1L, "mail a1@b.com and 12345678 plus 42"),
      (2L, "clean text only")).toDF("id", "t")
    val out = graft.operators.CorpusTools.scrubPii(df, "t", Seq(
        ("email", "[a-z0-9._]+@[a-z0-9.-]+", "<EMAIL>"),
        ("phone", "[0-9]{7,}", "<PHONE>"),
        ("num", "[0-9]+", "<NUM>")))
      .select("id", "n_email", "n_phone", "n_num", "redacted")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, 1L, 1L, 1L,
      "mail <EMAIL> and <PHONE> plus <NUM>")))
    assert(out(1) == ((2L, 0L, 0L, 0L, "clean text only")))
    // order flipped: digits inside the address get shredded first —
    // proving the sequential contract is real, not incidental
    val flipped = graft.operators.CorpusTools.scrubPii(df, "t", Seq(
        ("num", "[0-9]+", "<NUM>"),
        ("email", "[a-z0-9._]+@[a-z0-9.-]+", "<EMAIL>")))
      .select("id", "n_num", "n_email", "redacted")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).head
    assert(flipped._2 == 3L) // a1, 12345678, 42
    // the shredded address no longer matches the email rule at all
    // (a<NUM>@b.com — '>' breaks the local-part class): flipping the
    // order silently LOSES the email redaction, which is exactly the
    // hazard the sequential contract exists to make explicit
    assert(flipped._3 == 0L && !flipped._4.contains("<EMAIL>"))
  }

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

  test("packOffsets: contiguous per-shard offsets, stable under repartition") {
    val docs = (0L until 100L)
      .map(i => (i, ("w " * ((i % 7).toInt + 1)).trim))
      .toDF("doc_id", "text")
    val p = CorpusTools.packOffsets(docs, "doc_id", "text", seqLen = 10,
        buckets = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(p.length == 100)
    // within each shard, offsets are exactly the running sum in id order
    p.groupBy(_._2).values.foreach { shard =>
      val sorted = shard.sortBy(_._1)
      sorted.foldLeft(0L) { case (expect, (_, _, n, off, bin)) =>
        assert(off == expect)
        assert(bin == off / 10)
        expect + n
      }
    }
    // deterministic under repartitioning
    val again = CorpusTools.packOffsets(docs.repartition(7), "doc_id",
        "text", seqLen = 10, buckets = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(p.toSet == again.toSet)
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

  test("temperatureMix: sqrt weights flatten the head, ppm shares exact") {
    val docs = ((1 to 900).map(i => (i.toLong, "en")) ++
      (901 to 1000).map(i => (i.toLong, "de"))).toDF("doc_id", "lang")
    val out = CorpusTools.temperatureMix(docs, "lang")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // proportional would give de 100k ppm; sqrt temperature lifts it to
    // 10/(30+10) = 250k exactly (sqrt(900)=30, sqrt(100)=10 are exact)
    assert(out("en") === (("en", 900L, 30000000L, 750000L)))
    assert(out("de") === (("de", 100L, 10000000L, 250000L)))
  }

  test("applyTemperatureMix: exact rates, deterministic kept set") {
    val docs = ((1 to 900).map(i => (i.toLong, "en")) ++
      (901 to 1000).map(i => (i.toLong, "de"))).toDF("doc_id", "lang")
    def run() = CorpusTools
      .applyTemperatureMix(docs, "doc_id", "lang", budget = 100L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val out = run()
    // shares 750k/250k ppm of a 100-doc budget → targets 75/25;
    // rates: 75e6/900 = 83333 ppm, 25e6/100 = 250000 ppm
    assert(out("en")._3 === 75L && out("en")._4 === 83333L)
    assert(out("de")._3 === 25L && out("de")._4 === 250000L)
    // the hash gate is uniform-ish (within 40% of target) and the kept
    // SET is bit-stable across runs (checksum equality, not just count)
    assert(math.abs(out("en")._5 - 75L) <= 30L)
    assert(out === run())
  }

  test("oovRate matches a Scala mirror of split, vocab, and token counts") {
    val rows = (1L to 60L).map(i =>
      (i, if (i % 2 == 0) s"alpha beta w$i" else "alpha gamma", "en"))
    val out = CorpusTools.oovRate(rows.toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang", trainPct = 80, vocabSize = 2)
      .as[(String, Long, Long, Long)].collect().head
    // mirror the hash split and top-2 vocab exactly
    def bucket(i: Long) = i * 2654435761L % 1000000007L % 100L
    val (train, valid) = rows.partition(r => bucket(r._1) < 80)
    assert(valid.nonEmpty && train.nonEmpty)
    val counts = train.flatMap(_._2.split(" "))
      .groupBy(identity).map { case (w, g) => w -> g.size }
    val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(2).map(_._1).toSet
    val vtoks = valid.flatMap(_._2.split(" "))
    val nOov = vtoks.count(w => !vocab(w)).toLong
    assert(out === (("en", vtoks.size.toLong, nOov,
      nOov * 1000000L / vtoks.size)))
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

  test("repetitionSignals: hand-computed ratios, no shuffle in the plan") {
    val docs = Seq(
      (1L, "a a a"),          // tg ["a a a"], bg ["a a"]×2
      (2L, "a b a b a b"),    // tg 4 (2 distinct), bg 5 ("a b"×3)
      (3L, "x")               // too short for any n-gram
    ).toDF("doc_id", "text")
    val r = CorpusTools.repetitionSignals(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((3L, 0.333333, 0.0, 1.0)))
    assert(r(2L) == ((6L, 0.333333, 0.5, 0.6)))
    assert(r(3L) == ((1L, 1.0, 0.0, 0.0)))
    // narrow plan: per-row array math must introduce no exchange
    val plan = CorpusTools.repetitionSignals(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("decontaminate flags only docs sharing an n-gram with the bench set") {
    val docs = Seq(
      (0L, "q1 q2 q3 q4 tail"),          // benchmark doc
      (1L, "x q1 q2 q3 q4 y"),           // shares "q1 q2 q3 q4"
      (2L, "nothing shared here at all") // clean
    ).toDF("doc_id", "text")
    val f = CorpusTools.decontaminate(docs, "doc_id", "text",
        benchPred = col("doc_id") === 0L, n = 4, maxDf = 50)
      .as[(Long, Long, Long)].collect()
    assert(f.toSeq == Seq((1L, 1L, 1L)))
  }

  test("stratifiedSample: exact hash gate per stratum, deterministic") {
    val docs = (0L until 300L).map(i =>
      (i, if (i % 3 == 0) "en" else "de")).toDF("doc_id", "lang")
    def kept(rates: Map[String, Int], dflt: Int): Set[Long] =
      CorpusTools.stratifiedSample(docs, "doc_id", "lang", rates, dflt)
        .where(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(kept(Map("en" -> 0, "de" -> 0), 0).isEmpty)
    assert(kept(Map("en" -> 100, "de" -> 100), 0).size == 300)
    // exact per-row gate matches the reference hash formula
    val k = kept(Map("en" -> 30), 55)
    def bucket(i: Long): Long = i * 2654435761L % 1000000007L % 100L
    val expected = (0L until 300L).filter(i =>
      bucket(i) < (if (i % 3 == 0) 30 else 55)).toSet
    assert(k == expected)
    // reproducible under repartitioning
    val again = CorpusTools.stratifiedSample(
        docs.repartition(7), "doc_id", "lang", Map("en" -> 30), 55)
      .where(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(again == expected)
  }

  test("groupSample: exact k smallest hashes per stratum, retry-stable") {
    def hash(i: Long): Long = i * 2654435761L % 1000000007L
    val docs = ((1L to 20L).map(i => ("a", i)) ++
      (21L to 25L).map(i => ("b", i))).toDF("lang", "doc_id")
    val out = CorpusTools.groupSample(docs, "lang", "doc_id", k = 3)
      .select(col("lang"), col("doc_id").cast("long"), col("rn"))
      .as[(String, Long, Long)].collect()
    val expA = (1L to 20L).sortBy(hash).take(3)
    val expB = (21L to 25L).sortBy(hash).take(3)
    val got = out.groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(got == Map("a" -> expA, "b" -> expB))
    val again = CorpusTools.groupSample(docs.repartition(7), "lang",
        "doc_id", k = 3)
      .select(col("doc_id").cast("long")).as[Long].collect().toSet
    assert(again == (expA ++ expB).toSet)
  }

  test("encodeCorpus equals a driver-side encode on random docs") {
    val rnd = new scala.util.Random(37)
    val vocabPool = Seq("aa", "bb", "cc", "dd", "ee", "rare1", "rare2")
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(8))(
        vocabPool(rnd.nextInt(vocabPool.length))).mkString(" "))
    }
    val allWords = docs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
    val counts = allWords.groupBy(identity).view.mapValues(_.size).toMap
    val vocab = counts.filter(_._2 >= 5).toSeq
      .sortBy { case (w, c) => (-c, w) }.zipWithIndex
      .map { case ((w, _), i) => w -> (i + 1L) }.toMap
    val brute = docs.map { case (id, t) =>
      val toks = t.split(" ", -1).zipWithIndex
        .map { case (w, p) => (w, p + 1L) }.filter(_._1.nonEmpty)
      val ids = toks.map { case (w, p) => (vocab.getOrElse(w, 0L), p) }
      (id, (toks.length.toLong, ids.count(_._1 == 0L).toLong,
        ids.map { case (v, p) => v * p }.sum))
    }.toMap
    val out = CorpusTools.encodeCorpus(docs.toDF("doc_id", "text"),
        "doc_id", "text", minCount = 5L)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out == brute)
  }

  test("collocations: lift score, hand-computed") {
    // tokens [a,b,a,b,c]: Nw=5, bigrams [(a,b),(b,a),(a,b),(b,c)]: Nb=4
    // only (a,b) reaches minCount 2: score = 2·10⁶·25 / (4·2·2)
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val out = CorpusTools.collocations(docs, "text", minCount = 2L, k = 5)
      .as[(String, String, Long, Double)].collect().toList
    assert(out == List(("a", "b", 2L, 3125000.0)))
  }

  test("encodeCorpus: positional id checksum with OOV as id 0") {
    // minCount 2 → vocab a=1, b=2 (cnt desc, word asc); c,z are OOV.
    // doc1 "a a b z": Σ id·pos = 1+2+6+0 = 9, 1 OOV of 4 tokens
    // doc2 "b c": 2·1 + 0 = 2, 1 OOV of 2
    val docs = Seq((1L, "a a b z"), (2L, "b c")).toDF("doc_id", "text")
    val r = CorpusTools.encodeCorpus(docs, "doc_id", "text", minCount = 2L)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r == Map(1L -> ((4L, 1L, 9L)), 2L -> ((2L, 1L, 2L))))
  }

  test("docSurprisal: bit-length surprisal, hand-computed") {
    // counts a:2 b:2 c:1, T=5; s = bitlen(T div cnt): a,b → bitlen(2)=2,
    // c → bitlen(5)=3. doc1 (a a b): 3 tokens, sum 6, mean 2000 milli;
    // doc2 (b c): 2 tokens, sum 5, mean 2500
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = CorpusTools.docSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r == Map(1L -> ((3L, 6L, 2000L)), 2L -> ((2L, 5L, 2500L))))
  }

  test("tfidfTerms: integer tf-idf keyword rank, hand-computed") {
    // N=3 docs. df: a→3, b→2, c→1. idf = bitlen(N div df):
    // a → bitlen(1)=1, b → bitlen(1)=1, c → bitlen(3)=2.
    // doc1 (a a b): a score 2·1=2, b 1·1=1 → rank a(2), b(1)
    // doc2 (a b c c): c 2·2=4, a 1, b 1 → rank c(4), a(1), b(1)
    //   (a before b on the word tiebreak at equal score)
    // doc3 (a): a(1)
    val docs = Seq((1L, "a a b"), (2L, "a b c c"), (3L, "a"))
      .toDF("doc_id", "text")
    val r = CorpusTools.tfidfTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(r == Set((1L, "a", 2L, 1L), (1L, "b", 1L, 2L),
      (2L, "c", 4L, 1L), (2L, "a", 1L, 2L), (3L, "a", 1L, 1L)))
  }

  test("tokenBudgetSelect: whole score classes under the budget, per group") {
    // One lang. Corpus: "r r" (rare-free), "q q q", "z". counts r:2 q:3
    // z:1, T=6. s(r)=bitlen(3)=2, s(q)=bitlen(2)=2, s(z)=bitlen(6)=3.
    // doc1 (r r): n=2 mean=2000; doc2 (q q q): n=3 mean=2000;
    // doc3 (z): n=1 mean=3000. Classes desc: 3000(1 tok) cum 1;
    // 2000(5 tok) cum 6. Budget 5 → only the 3000 class fits.
    val docs = Seq((1L, "en", "r r"), (2L, "en", "q q q"),
      (3L, "en", "z")).toDF("doc_id", "lang", "text")
    val r = CorpusTools.tokenBudgetSelect(docs, "doc_id", "text", "lang",
        budgetTokens = 5L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(r == Set(("en", 3L, 1L, 3000L)))
    // budget 6 admits both classes
    val r2 = CorpusTools.tokenBudgetSelect(docs, "doc_id", "text", "lang",
        budgetTokens = 6L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(r2.map(_._2) == Set(1L, 2L, 3L))
  }

  test("qualityFilterGrouped: exact per-group percentile cutoff") {
    // One lang, 4 docs with distinct means; p75 over 4 docs: smallest v
    // with n_le·100 ≥ 75·4 → the 3rd-ranked value keeps the top 2? No:
    // n_le(v3)=3, 300 ≥ 300 → cutoff = 3rd smallest; docs ≥ cutoff = 2.
    // means: doc1 "a a"→? build distinct word counts per doc so means
    // differ: use docs of one word each with different corpus counts.
    // corpus: a×4 b×2 c×1 over docs (1:"a a a a") (2:"b b") (3:"c")
    // T=7: s(a)=bitlen(1)=1 mean 1000; s(b)=bitlen(3)=2 mean 2000;
    // s(c)=bitlen(7)=3 mean 3000. n_le: 1000→1, 2000→2, 3000→3; N=3.
    // p75: n_le·100 ≥ 225 → first v with n_le ≥ 2.25 → 3000.
    val docs = Seq((1L, "en", "a a a a"), (2L, "en", "b b"),
      (3L, "en", "c")).toDF("doc_id", "lang", "text")
    val r = CorpusTools.qualityFilterGrouped(docs, "doc_id", "text",
        "lang", pct = 75)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(r == Set(("en", 3L, 3000L, 3000L)))
    // pct 50 → cutoff 2000, keeps docs 2 and 3
    val r2 = CorpusTools.qualityFilterGrouped(docs, "doc_id", "text",
        "lang", pct = 50)
      .as[(String, Long, Long, Long)].collect()
    assert(r2.map(_._2).toSet == Set(2L, 3L))
  }

  test("weightedNegSample: draws land in cumulative ranges, heavy items dominate") {
    // weights: cnt 16 → 16^0.75 = 8; cnt 1 → 1. total = 9.
    // ranges (by tid): tid 1 [0,8), tid 2 [8,9).
    val items = Seq((1L, 16L), (2L, 1L)).toDF("tid", "cnt")
    val r = CorpusTools.weightedNegSample(items, "tid", "cnt",
        nSamples = 50)
      .as[(Long, Long, Long)].collect()
    assert(r.length == 50)
    // every draw resolves to exactly one item, consistent with its r
    r.foreach { case (_, rv, tid) =>
      assert(if (rv < 8) tid == 1L else tid == 2L)
    }
    // the heavy item owns ~8/9 of draws; with hash draws over 50 it
    // must appear far more often
    val heavy = r.count(_._3 == 1L)
    assert(heavy > 30, s"heavy item drew $heavy of 50")
    // deterministic: same call, same draws
    val again = CorpusTools.weightedNegSample(items, "tid", "cnt",
        nSamples = 50).as[(Long, Long, Long)].collect()
    assert(r.sortBy(_._1).toList == again.sortBy(_._1).toList)
  }

  test("luhnCheck: known-valid and known-invalid card numbers") {
    val df = Seq(
      (1L, "4532015112830366"),   // valid (standard test number)
      (2L, "4532015112830367"),   // last digit off by one
      (3L, "0000000000000000"),   // degenerate, sum 0 → valid
      (4L, "79927398713")         // classic Luhn example, odd length
    ).toDF("id", "card")
    val r = CorpusTools.luhnCheck(df, "card")
      .as[(Long, String, Boolean)].collect()
      .map(t => t._1 -> t._3).toMap
    assert(r == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true))
  }

  test("textrankTerms: hub word outranks leaves on a star corpus") {
    // "hub x", "hub y", "hub z": hub co-occurs with every leaf — after
    // any number of iterations hub's rank dominates; ties among leaves
    // break alphabetically
    val docs = Seq((1L, "hub x"), (2L, "hub y"), (3L, "hub z"))
      .toDF("doc_id", "text")
    val r = CorpusTools.textrankTerms(docs, "text", iters = 2, k = 4)
      .as[(Long, String, Long)].collect().sortBy(_._1).toList
    assert(r.head._2 == "hub")
    assert(r.map(_._2) == List("hub", "x", "y", "z"))
    // leaves share one exact integer rank
    assert(r.tail.map(_._3).distinct.size == 1)
  }

  test("bpeTrain: textbook low/lower merges, hand-computed") {
    // words low×2 lower×1. Round 1 pairs: lo×3, ow×3, we×1, er×1 →
    // tie (l,o) vs (o,w) breaks lhs-asc → (l,o). Round 2: (lo,w)×3.
    // Round 3: (low,e)×1 vs (e,r)×1 → lhs asc → (e,r).
    val docs = Seq((1L, "low low"), (2L, "lower")).toDF("doc_id", "text")
    val r = CorpusTools.bpeTrain(docs, "text", rounds = 3)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toList
    assert(r == List((1L, "l", "o", 3L), (2L, "lo", "w", 3L),
      (3L, "e", "r", 1L)))
  }

  test("bpeTrain: overlapping runs merge greedily left-to-right") {
    // "aaaa": round 1 counts (a,a)×3, merge → [aa, aa] (greedy pairs,
    // never [a, aa, a]); round 2 then finds (aa, aa)×1
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val r = CorpusTools.bpeTrain(docs, "text", rounds = 2)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toList
    assert(r == List((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)))
  }

  test("bpeEncode: per-doc token counts under the learned merges") {
    // after 3 rounds on low/lower (l+o, lo+w, e+r): low → [low] (1),
    // lower → [low, er] (2)
    val docs = Seq((1L, "low low"), (2L, "lower")).toDF("doc_id", "text")
    val r = CorpusTools.bpeEncode(docs, "doc_id", "text", rounds = 3)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r == Map(1L -> ((2L, 2L)), 2L -> ((1L, 2L))))
  }

  test("bpePairs: token-weighted pair counts with deterministic ties") {
    // words: hello×2, hi×1 → pairs el/he/ll/lo ×2 (hello), hi ×1;
    // single-char words contribute nothing
    val docs = Seq((1L, "hello hello"), (2L, "hi x"))
      .toDF("doc_id", "text")
    val r = CorpusTools.bpePairs(docs, "text", k = 10)
      .as[(Long, String, Long)].collect().toList
    assert(r == List((1L, "el", 2L), (2L, "he", 2L), (3L, "ll", 2L),
      (4L, "lo", 2L), (5L, "hi", 1L)))
  }

  test("vocabDrift: exact ppm deltas, ranked by contribution") {
    val a = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val b = Seq((1L, "a b b")).toDF("doc_id", "text")
    val r = CorpusTools.vocabDrift(a, b, "text", k = 10)
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    // nA=4: a 500000, b 250000, c 250000; nB=3: a 333333, b 666666, c 0
    assert(r === List(
      ("b", 1L, 2L, 250000L, 666666L, 416666L),
      ("c", 1L, 0L, 250000L, 0L, 250000L),
      ("a", 2L, 1L, 500000L, 333333L, 166667L)))
  }

  test("skipgramPairs: exact window pairs, ordered deterministically") {
    val docs = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val w1 = CorpusTools.skipgramPairs(docs, "text", window = 1, k = 100)
      .as[(String, String, Long)].collect().toSet
    // adjacent pairs only, both directions; (a,b) occurs in both docs
    assert(w1 === Set(("a", "b", 2L), ("b", "a", 2L),
      ("b", "c", 1L), ("c", "b", 1L)))
    val w2 = CorpusTools.skipgramPairs(docs, "text", window = 2, k = 100)
      .as[(String, String, Long)].collect().toSet
    assert(w2 === w1 ++ Set(("a", "c", 1L), ("c", "a", 1L)))
    // k cuts on (cnt DESC, center, context): top-2 is the (a,b)/(b,a) tie
    val top = CorpusTools.skipgramPairs(docs, "text", window = 1, k = 2)
      .as[(String, String, Long)].collect().toList
    assert(top === List(("a", "b", 2L), ("b", "a", 2L)))
  }

  test("skipgramPairs matches a driver-side brute force on random docs") {
    val rnd = new scala.util.Random(73)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val texts = (1L to 40L).map { i =>
      i -> Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
    }
    val w = 3
    val brute = texts.flatMap { case (_, ws) =>
      for {
        i <- ws.indices; o <- -w to w
        j = i + o
        if o != 0 && j >= 0 && j < ws.size
      } yield (ws(i), ws(j))
    }.groupBy(identity).map { case (p, v) => (p._1, p._2, v.size.toLong) }
      .toSet
    val got = CorpusTools.skipgramPairs(
        texts.map { case (i, ws) => (i, ws.mkString(" ")) }
          .toDF("doc_id", "text"), "text", window = w, k = 10000)
      .as[(String, String, Long)].collect().toSet
    assert(got === brute)
  }

  test("hashFeatures matches a driver-side brute force on random docs") {
    def ph(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val d = 64  // small grid → real collisions and cancellations
    val rnd = new scala.util.Random(91)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    val texts = (1L to 30L).map { i =>
      i -> Seq.fill(1 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
    }
    val brute = texts.flatMap { case (i, ws) =>
      val cells = ws.groupBy(w => ph(w) % d).map { case (idx, g) =>
        idx -> g.map(w => (ph(w) / d % 2) * 2 - 1).sum
      }.filter(_._2 != 0L)
      if (cells.isEmpty) None
      else Some((i, cells.size.toLong, cells.values.map(math.abs).sum,
        cells.map { case (idx, v) => (idx + 1) * v }.sum))
    }.toSet
    val got = CorpusTools.hashFeatures(
        texts.map { case (i, ws) => (i, ws.mkString(" ")) }
          .toDF("doc_id", "text"), "doc_id", "text", d)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === brute)
  }

  test("hashFeatures: exact signed-hash invariants, cancellations dropped") {
    def ph(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val d = 1024
    def idx(s: String) = ph(s) % d
    def sign(s: String) = (ph(s) / d % 2) * 2 - 1
    val docs = Seq((1L, "x y x"), (2L, "z")).toDF("doc_id", "text")
    val out = CorpusTools.hashFeatures(docs, "doc_id", "text", d)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1: cell(x) = 2·sign(x), cell(y) = sign(y) (no idx collision)
    assert(idx("x") !== idx("y"))
    assert(out(1L) === ((1L, 2L, 3L,
      (idx("x") + 1) * 2 * sign("x") + (idx("y") + 1) * sign("y"))))
    assert(out(2L) === ((2L, 1L, 1L, (idx("z") + 1) * sign("z"))))
  }

  test("paddingWaste: exact seq/pad accounting for all three strategies") {
    // seqLen 4, one bucket: docs of 3, 5, 6 tokens (14 total)
    // one_doc: seqs 1+2+2 = 5 -> pad 20-14 = 6
    // concat_global: ceil(14/4) = 4 -> pad 2
    // concat_sharded (1 bucket) == global
    val docs = Seq((1L, "a b c"), (2L, "a b c d e"),
      (3L, "a b c d e f")).toDF("doc_id", "text")
    val out = CorpusTools.paddingWaste(docs, "doc_id", "text", seqLen = 4,
        buckets = 1)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("one_doc_per_seq") ==
      (("one_doc_per_seq", 3L, 14L, 5L, 6L, 300000L)))
    assert(out("concat_global") ==
      (("concat_global", 3L, 14L, 4L, 2L, 125000L)))
    assert(out("concat_sharded") ==
      (("concat_sharded", 3L, 14L, 4L, 2L, 125000L)))
  }

  test("gopherQuality: each rule bit fires on its crafted violator") {
    val good = (1L, ("the a of and " + (1 to 46).map(i => s"word$i")
      .mkString(" ")))                       // 50 words, all distinct
    val short = (2L, "the a of and tiny")    // n_words < 20 -> bit 1
    val longw = (3L, ("the a of and " + (1 to 46)
      .map(i => "verylongword" + "x" * 10 + i).mkString(" ")))
                                             // mwl > 10 -> bit 2
    val repet = (4L, ("the a of and " + Seq.fill(46)("dup")
      .mkString(" ")))                       // ttr<0.4 + top-share -> 4|32
    val nostop = (5L, (1 to 50).map(i => s"w$i").mkString(" "))
                                             // no stopwords -> bit 8
    val numeric = (6L, ("the a of and " + (1 to 46).map(_.toString)
      .mkString(" ")))                       // alpha ratio 4/50 -> 16|2
    val docs = Seq(good, short, longw, repet, nostop, numeric)
      .toDF("doc_id", "text")
    val out = CorpusTools.gopherQuality(docs, "doc_id", "text")
      .select("doc_id", "reasons", "pass")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 && out(1L)._2 == 0L)
    assert((out(2L)._2 & 1L) != 0 && !out(2L)._3)
    assert((out(3L)._2 & 2L) != 0)
    assert((out(4L)._2 & 4L) != 0 && (out(4L)._2 & 32L) != 0)
    assert((out(5L)._2 & 8L) != 0)
    assert((out(6L)._2 & 16L) != 0)
  }

  test("contaminationRatio: exact ppm overlap, capped grams excluded") {
    // bench doc 0 shares the 4-gram "a b c d" with train doc 1 (5 of its
    // grams) and nothing with doc 2; doc 3 is all-overlap
    val docs = Seq(
      (0L, "a b c d e f"),                  // bench: grams abcd bcde cdef
      (1L, "x a b c d y z w"),              // train: 5 grams, 1 hit
      (2L, "p q r s t u"),                  // train: 3 grams, 0 hits
      (3L, "a b c d e")                     // train: 2 grams, 2 hits
    ).toDF("doc_id", "text")
    val out = CorpusTools.contaminationRatio(docs, "doc_id", "text",
        benchPred = col("doc_id") === 0L, n = 4)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 5L, 1L, 200000L)))
    assert(out(2L) === ((2L, 3L, 0L, 0L)))
    assert(out(3L) === ((3L, 2L, 2L, 1000000L)))
  }

  test("contaminationRatio matches a driver-side brute force on random docs") {
    val rnd = new scala.util.Random(77)
    val n = 4
    for (_ <- 0 until 3) {
      val corpus = (0L until 16L).map { id =>
        val len = 2 + rnd.nextInt(10)
        id -> Seq.fill(len)(('a' + rnd.nextInt(3)).toChar.toString)
          .mkString(" ")
      }
      def grams(text: String): Set[String] = {
        val ws = text.split(" ", -1)
        (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" "))
          .toSet
      }
      val all = corpus.map { case (id, t) => id -> grams(t) }
      val df = all.flatMap(_._2).groupBy(identity)
        .map { case (g, o) => g -> o.size }
      val benchSet = all.filter(_._1 % 4 == 0)
        .flatMap(_._2).filter(g => df(g) <= 5).toSet
      val expected = all.filter(_._1 % 4 != 0).collect {
        case (id, gs) if gs.nonEmpty =>
          val hit = gs.count(benchSet)
          (id, gs.size.toLong, hit.toLong, hit * 1000000L / gs.size)
      }.toSet
      val got = CorpusTools.contaminationRatio(
          corpus.toDF("doc_id", "text"), "doc_id", "text",
          benchPred = col("doc_id") % 4 === 0, n = n, maxDf = 5)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == expected)
    }
  }

  test("knBigramScore: hand-computed KN probabilities on a 2-doc corpus") {
    // corpus bigrams: d1 = (a b), (b a), (a b); d2 = (a c)
    // c12: (a,b)=2 (b,a)=1 (a,c)=1; c1: a=3 (n1_fwd 2), b=1 (n1_fwd 1)
    // cont: b<-1, a<-1, c<-1; btypes=3
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = CorpusTools.knBigramScore(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // λ is milli, pcont is ppm → product div 1000 is ppm (r6 ADVICE fix):
    // p(a,b) = (2000-750)*1000 div 3 + (750*2 div 3)*(1e6 div 3) div 1e3
    //        = 416666 + 500*333333 div 1000 = 416666 + 166666 = 583332
    // p(b,a) = (1000-750)*1000 div 1 + (750*1 div 1)*333333 div 1000
    //        = 250000 + 249999 = 499999
    // p(a,c) = (1000-750)*1000 div 3 + 166666 = 83333+166666 = 249999
    // sanity: Σ_w2 p(w2|a) = p(a,b)+p(a,c)+λ(a)·pcont(a) ≈ 1e6 ppm —
    // the continuation mass is now actually redistributed (was ~0.5e6
    // under the old div 1e6, i.e. effectively unsmoothed).
    val d1 = 583332L + 499999L + 583332L
    assert(out(1L) === ((1L, 3L, d1, d1 / 3)))
    assert(out(2L) === ((2L, 1L, 249999L, 249999L)))
  }

  test("shuffleAudit: hand-computed mixing metrics; degenerate stride " +
      "caught as a non-bijection") {
    // ids 0..4 source A, 5..9 source B; pos = (3·rank + 1) mod 10 is a
    // bijection; order by pos gives ids [3,0,7,4,1,8,5,2,9,6] →
    // sources A A B A A B B A B B → 4 same-source adjacencies;
    // E[same] = (5·4 + 5·4)/10 = 4; 2 shards of 5/5 → imbalance 0
    val docs = (0L to 9L)
      .map(i => (i, if (i < 5) "A" else "B")).toDF("doc_id", "source")
    val got = CorpusTools.shuffleAudit(docs, "doc_id", "source",
        a = 3L, c = 1L, shards = 2)
      .as[(String, Long)].collect().toMap
    assert(got === Map("n_rows" -> 10L, "n_distinct_pos" -> 10L,
      "adjacent_same_source" -> 4L, "expected_same_source" -> 4L,
      "shard_imbalance" -> 0L))
    // a = 5 shares a factor with n = 10: positions collapse to {1, 6}
    // — the audit must REPORT the collapse, not assume bijectivity
    val bad = CorpusTools.shuffleAudit(docs, "doc_id", "source",
        a = 5L, c = 1L, shards = 2)
      .as[(String, Long)].collect().toMap
    assert(bad("n_distinct_pos") == 2L && bad("n_rows") == 10L)
  }

  test("ngramNovelty: first-occurrence counts in doc_id order") {
    // d1 "a b c": bigrams {a b, b c} both first-seen -> 2/2 novel
    // d2 "a b d": {a b (seen in d1), b d} -> 1/2 novel
    // d3 "x": < 2 words -> no bigrams -> absent from the result
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = CorpusTools.ngramNovelty(docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out === Map(
      1L -> ((1L, 2L, 2L, 1000000L)),
      2L -> ((2L, 2L, 1L, 500000L))))
  }

  test("langMixProfile: per-chunk language id, majority with " +
      "deterministic tie-break") {
    // width=2: doc 1 chunks ["the a" -> en, "el la" -> es]: 2 langs,
    // tied 1/1 -> majority = min(en, es) = en at 500000 ppm.
    // doc 2 one chunk "the of" -> en. doc 3 has no marker words at all:
    // all scores 0 -> ties resolve to the first language in order (en).
    val docs = Seq((1L, "the a el la"), (2L, "the of"), (3L, "zz yy"))
      .toDF("doc_id", "text")
    val out = CorpusTools.langMixProfile(docs, "doc_id", "text", width = 2)
      .as[(Long, Long, Long, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out === Map(
      1L -> ((1L, 2L, 2L, "en", 500000L)),
      2L -> ((2L, 1L, 1L, "en", 1000000L)),
      3L -> ((3L, 1L, 1L, "en", 1000000L))))
  }

  test("dsirSelect ranks target-like raw docs above raw-like raw docs " +
      "and never returns target-domain docs") {
    // target domain speaks {alpha beta gamma}; the raw pool has one doc
    // of target words, one of raw-only words, plus bulk raw background
    // that anchors the raw LM on {noise*} words
    val docs = (
      (1L to 5L).map(i => (i, "en", "alpha beta gamma alpha beta gamma")) ++
      (10L to 29L).map(i => (i, "de", s"noise${i % 7} noise${i % 5} noise${i % 3} noise${i % 2}")) ++
      Seq((50L, "de", "alpha beta gamma alpha"),
          (51L, "de", "noise0 noise1 noise2 noise0"))
    ).toDF("doc_id", "lang", "text")
    val out = CorpusTools.dsirSelect(docs, "doc_id", "text",
        langCol = "lang", targetLang = "en", d = 64, k = 100)
      .select("doc_id", "lang", "weight").as[(Long, String, Long)]
      .collect()
    assert(out.forall(_._2 != "en"))
    val w = out.map(r => r._1 -> r._3).toMap
    // the target-vocabulary doc must outscore every noise doc
    assert(w(50L) > w(51L))
    assert((10L to 29L).forall(i => w(50L) > w(i)))
    // output is sorted weight DESC, doc_id ASC -> first row is doc 50
    assert(out.head._1 == 50L)
  }

  test("perceptron separates planted vocabularies and scores empty docs " +
      "at zero with pred = -1") {
    val docs = (
      (1L to 10L).map(i => (i, "en", "good fine nice good")) ++
      (11L to 20L).map(i => (i, "de", "schlecht mies schlecht arg")) ++
      Seq((99L, "de", ""))
    ).toDF("doc_id", "lang", "text")
    val scored = CorpusTools.perceptronScore(docs, "doc_id", "text",
        positive = col("lang") === "en", d = 64, iters = 3)
      .select("doc_id", "y", "score", "pred")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // vocabularies are disjoint: after the first batch update every pos
    // word bucket carries +counts, every neg bucket -counts (modulo hash
    // collisions, absent for this planted set at d=64)
    (1L to 10L).foreach { i =>
      assert(scored(i)._3 > 0 && scored(i)._4 == 1L, s"doc $i: ${scored(i)}")
    }
    (11L to 20L).foreach { i =>
      assert(scored(i)._3 < 0 && scored(i)._4 == -1L, s"doc $i: ${scored(i)}")
    }
    assert(scored(99L) == ((99L, -1L, 0L, -1L)))
    // the weight table is exactly d rows and integer-deterministic
    // across re-runs (same literals, same plan)
    val w1 = CorpusTools.perceptronTrain(docs, "doc_id", "text",
      positive = col("lang") === "en", d = 64, iters = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val w2 = CorpusTools.perceptronTrain(docs, "doc_id", "text",
      positive = col("lang") === "en", d = 64, iters = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(w1.size == 64 && w1 == w2)
  }

  test("unigram Viterbi is optimal: segment cost never exceeds the " +
      "all-single-chars cost, and AUC is exactly 1.0 ppm on separable " +
      "perceptron data") {
    // random words over a small alphabet so multi-char pieces are common
    val rnd = new scala.util.Random(11)
    val docs = (1L to 30L).map(i =>
      (i, Seq.fill(5)(Seq.fill(2 + rnd.nextInt(5))(
        ('a' + rnd.nextInt(3)).toChar).mkString).mkString(" ")))
      .toDF("doc_id", "text")
    val vocab = CorpusTools.unigramVocab(docs, "text", maxLen = 4, v = 64)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val seg = CorpusTools.unigramSegment(docs, "doc_id", "text",
        maxLen = 4, v = 64)
      .as[(Long, Long, Long, Long)].collect()
    val texts = docs.as[(Long, String)].collect().toMap
    for ((id, nw, np, cost) <- seg) {
      val words = texts(id).split(" ").filter(_.nonEmpty)
      val charCost = words.map(_.map(c => vocab(c.toString)).sum).sum
      assert(cost <= charCost, s"doc $id: DP cost $cost > char cost $charCost")
      assert(np <= words.map(_.length.toLong).sum && np >= nw)
    }
    // perfectly separable labels -> rank AUC exactly 1e6 ppm
    val sep = ((1L to 10L).map(i => (i, "en", "alpha beta")) ++
      (11L to 20L).map(i => (i, "de", "gamma delta")))
      .toDF("doc_id", "lang", "text")
    val w = CorpusTools.perceptronFit(sep, "doc_id", "text",
      positive = col("lang") === "en", d = 64, iters = 3)
    val scored = CorpusTools.perceptronScoreWith(sep, "doc_id", "text",
      positive = col("lang") === "en", d = 64, weights = w)
    val auc = graft.operators.GraphAlgos.rankSumAuc(
        scored.select(col("score").as("s"),
          when(col("y") === 1L, 1L).otherwise(0L).as("isp")))
      .select("auc_ppm").as[Long].collect().head
    assert(auc == 1000000L)
  }

  test("curriculumOrder: easy buckets first, sources round-robin within " +
      "a bucket, ordinals deterministic under repartitioning") {
    val docs = (
      Seq((1L, "A", "w"), (2L, "A", "w"), (11L, "B", "w"), (12L, "B", "w")) ++
      Seq((21L, "A", ("w " * 10).trim), (22L, "B", ("w " * 10).trim))
    ).toDF("doc_id", "source", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusTools.curriculumOrder(d, "doc_id", "text", "source", k = 200)
        .select("doc_id", "source", "n_tokens", "bucket", "src_rank")
        .as[(Long, String, Long, Long, Long)].collect().toSeq
    val out = run(docs)
    assert(out.size == 6)
    // 1-token docs are bucket bitLen(2)=2, 10-token docs bitLen(11)=4:
    // all four short docs come first
    assert(out.take(4).forall(_._4 == 2L) && out.drop(4).forall(_._4 == 4L))
    // round-robin: rank-1 docs of BOTH sources before any rank-2 doc
    assert(out.take(2).map(_._2).toSet == Set("A", "B"))
    assert(out.take(2).forall(_._5 == 1L) && out.slice(2, 4).forall(_._5 == 2L))
    // per-(bucket,source) ordinals are 1..n
    out.groupBy(r => (r._4, r._2)).values.foreach { g =>
      assert(g.map(_._5).sorted == (1L to g.size).toSeq)
    }
    // bit-identical under physical repartitioning
    assert(run(docs.repartition(7)) == out)
  }

  test("unigram vocab costs are exact integer surprisals and Viterbi " +
      "prefers one frequent piece over char splits with fewer-pieces " +
      "tie-break") {
    // 'abcd' x10 and 'xy' x1: 13 candidate pieces, total mass
    // 10*10 + 3*1 = 103; cost(cnt=10) = bitlen(103/10=10) = 4,
    // cost(cnt=1) = bitlen(103) = 7
    val docs = ((1L to 5L).map(i => (i, "abcd abcd")) ++
      Seq((6L, "xy"), (7L, "")))
      .toDF("doc_id", "text")
    val vocab = CorpusTools.unigramVocab(docs, "text", maxLen = 4, v = 64)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(vocab.size == 13)
    assert(vocab("abcd") == (("abcd", 10L, 4L)))
    assert(vocab("a") == (("a", 10L, 4L)))
    assert(vocab("xy") == (("xy", 1L, 7L)))
    val seg = CorpusTools.unigramSegment(docs, "doc_id", "text",
        maxLen = 4, v = 64)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // 'abcd' as ONE piece (cost 4) beats any split (>= 8); equal-cost
    // ties (e.g. 'ab'+'cd' vs 'abc'+'d', both 8) can never beat it
    assert(seg(1L) == ((1L, 2L, 2L, 8L)))
    assert(seg(6L) == ((6L, 1L, 1L, 7L)))
    assert(seg(7L) == ((7L, 0L, 0L, 0L))) // empty doc: all-zero row
  }
}
