package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication operators for the training-data pipeline — exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  * All are shuffle-bounded: candidate generation always goes through an
  * inverted-index / bucket equi-join (never an O(n²) cross join), so each
  * variant scales with the number of colliding pairs, not the corpus
  * square. */
object Dedup {

  /** Exact dedup via content hash: one hash-partitioned aggregate.
    * `keep_id` is the smallest id in each duplicate group (deterministic
    * canonical representative). */
  def exact(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(md5(col(text)).as("hash"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n"))

  /** Exploded (doc_id, shingle) table. The words array is materialized as
    * its own projection BEFORE shingling: `shingles` indexes the array once
    * per position, and Catalyst's CollapseProject keeps a non-cheap
    * expression referenced many times as a separate attribute — inlining
    * `split` into every element_at would re-tokenize the document per
    * shingle position (O(n²) per doc; measured 10× the whole pipeline). */
  private def shingleTable(docs: DataFrame, id: String, text: String,
                           k: Int): DataFrame =
    docs
      .select(col(id).as("doc_id"), words(col(text)).as("ws"))
      .select(col("doc_id"), shingles(col("ws"), k).as("sh"))
      // no size()>0 guard: explode already drops empty arrays, and a guard
      // would be predicate-pushed below the projections, inlining the whole
      // shingle expression into a per-document Filter (measured 10×).
      .select(col("doc_id"), explode(col("sh")).as("s"))

  /** n-gram Jaccard near-dup: distinct word-k-shingles per doc, inverted
    * index on the shingle, pair-count aggregate, exact Jaccard filter.
    * The shingle join is the classic "documents sharing at least one
    * shingle" candidate generator — pairs never sharing a shingle (i.e.
    * Jaccard 0) are never materialized. */
  def ngramJaccard(docs: DataFrame, id: String, text: String, k: Int,
                   threshold: Double): DataFrame = {
    val sh = shingleTable(docs, id, text, k)
      // join/shuffle on a 64-bit shingle hash, not the string: ~5× less
      // shuffle data; 27k distinct shingles → collision odds ~1e-11, and a
      // collision only perturbs one pair count by 1.
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    pairs
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jac",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .where(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
  }

  /** MinHash + LSH near-dup. Signature: numHashes minima of
    * xxhash64(seed_i, shingle); banding groups rows of the signature so
    * two docs collide in a band iff that band's rows all match — the
    * standard LSH bucket join. `est_jaccard` is the fraction of matching
    * signature positions. Fully deterministic (xxhash64 is a fixed
    * function), no oracle SQL twin (DuckDB lacks xxhash64) — the driver
    * records a rows-only check; the ScalaTest spec asserts known dup pairs
    * are found and the estimate tracks exact Jaccard. */
  def minhashLsh(docs: DataFrame, id: String, text: String, k: Int = 3,
                 numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sh = shingleTable(docs, id, text, k)
    // signature: numHashes columns of min-hash — one aggregate pass
    val sigCols = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    val sig = sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    // band key: hash of the band's rows
    val banded = sig.select(col("doc_id") +: (0 until bands).map { b =>
      val rows = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      xxhash64(lit(b) +: rows: _*).as(s"band$b")
    }: _*)
    val buckets = banded.select(col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), col(s"band$b").as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verify: fraction of matching signature positions
    val matches = (0 until numHashes)
      .map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sig.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sig.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (matches.cast("double") / numHashes).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** MinHash + LSH with a DuckDB-replicable hash family: base hash =
    * the polynomial character hash (TextFunctions.fingerprint), seeds via
    * the universal family h_i(x) = (a_i·x + b_i) mod p. Same banding and
    * estimate as [[minhashLsh]], but every step has an exact SQL twin, so
    * this variant sits in the exact oracle gate (xxhash64-based
    * [[minhashLsh]] remains the production-fast path). Everything up to
    * the band self-join is a narrow per-document computation on arrays —
    * no explode, no shuffle. */
  def minhashLshPortable(docs: DataFrame, id: String, text: String,
                         k: Int = 3, numHashes: Int = 16, bands: Int = 4,
                         threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = docs
      .select(col(id).as("doc_id"), words(col(text)).as("ws"))
      .select(col("doc_id"), shingles(col("ws"), k).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), transform(col("sh"), polyHash _).as("hs"))
      .select(col("doc_id") +: MinhashSeeds.take(numHashes).zipWithIndex.map {
        case ((a, b), i) =>
          array_min(transform(col("hs"),
            h => (h * a + b) % 1000000007L)).as(s"m$i")
      }: _*)
    val banded = sig.select(
      (col("doc_id") +: (0 until numHashes).map(i => col(s"m$i"))) ++
        (0 until bands).map { bnd =>
          concat_ws(",", (0 until rows).map(r =>
            col(s"m${bnd * rows + r}")): _*).as(s"band$bnd")
        }: _*)
    val matches = (0 until numHashes)
      .map(i => when(col(s"a.m$i") === col(s"b.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    val perBand = (0 until bands).map { bnd =>
      banded.as("a").join(banded.as("b"),
          col(s"a.band$bnd") === col(s"b.band$bnd") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          (matches.cast("double") / numHashes).as("est_jaccard"))
    }
    perBand.reduce(_.unionByName(_)).distinct()
      .where(col("est_jaccard") >= threshold)
  }

  /** Fixed (a_i, b_i) universal-hash seeds shared with the SQL oracle. */
  val MinhashSeeds: Seq[(Long, Long)] =
    (0 until 32).map(i => (33L + 2 * i, 7919L * i))

  /** SimHash near-dup: 64-bit signature from per-word hash bits weighted
    * ±1, candidates via 16-bit band blocking (a pair within Hamming
    * distance d < 4 bands must collide in ≥1 band), verified with
    * bit_count(xor). Deterministic; rows-only driver check. */
  def simhash(docs: DataFrame, id: String, text: String,
              maxHamming: Int = 3): DataFrame = {
    val w = docs
      .select(col(id).as("doc_id"),
        explode(array_distinct(words(col(text)))).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val bitCols = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"bit$i"))
    val perDoc = w.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val sig = perDoc.select(col("doc_id"),
      (0 until 64).map(i =>
        when(col(s"bit$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
    val bands = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*))
        .as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup: label-blocked pair generation (the corpus'
    * natural cluster key) + exact cosine filter. At scale, swap the label
    * block for an LSH bucket (random-hyperplane sign bits) — the join
    * shape is identical. */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("label"),
      asDouble(col("embedding")).as("v"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosineFast(col("a.v"), col("b.v")).as("sim"))
      .where(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 6).as("sim"))
  }
}
