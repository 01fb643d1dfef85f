package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Duplicated-span marking — the detection stage of exact-substring
    * dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"): every n-token span whose exact text occurs more
    * than once corpus-wide (across docs or repeated within one) is
    * counted at each position it occupies. Returns per doc (doc_id,
    * n_spans, n_dup_spans, dup_ppm) — the fraction a substring-dedup
    * pass would cut.
    *
    * Scale: NO pair join anywhere — positional spans aggregate
    * corpus-wide by span text (one hash aggregate with map-side
    * combine), rejoin to positions on the same key, then per-doc counts.
    * Cost tracks corpus token volume even when one boilerplate span
    * occurs 10⁹ times — the case that detonates pairwise span dedup. The
    * span table is recomputed for the rejoin rather than cached: it is
    * corpus-sized, and the recompute is a narrow re-scan. */
  def dupSpans(docs: DataFrame, id: String, text: String,
               n: Int): DataFrame = {
    val spans = docs
      .select(col(id).as("doc_id"), words(col(text)).as("ws"))
      .select(col("doc_id"),
        explode(when(size(col("ws")) >= n,
          transform(sequence(lit(1), size(col("ws")) - (n - 1)),
            i => concat_ws(" ",
              (0 until n).map(j => element_at(col("ws"), i + j)): _*)))
          .otherwise(array().cast("array<string>"))).as("span"))
    val spanCounts = spans.groupBy(col("span")).agg(count(lit(1)).as("c"))
    spans.join(spanCounts, "span")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("c") > 1L, 1L).otherwise(0L)).as("n_dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        expr("n_dup_spans * 1000000 div n_spans").as("dup_ppm"))
  }

  /** Duplicated-span REMOVAL — the rewrite stage of exact-substring dedup
    * (Lee et al. 2022 §3: drop every duplicated occurrence, keep one
    * canonical copy). A span occurrence is removed when its exact n-token
    * text occurs more than once corpus-wide AND it is not the canonical
    * (first) occurrence — canonical = minimum of the occurrence ordinal
    * `doc_id · 2²⁰ + position` (2²⁰ exceeds any document's token count, so
    * the ordinal orders occurrences by (doc, position) in one int64).
    * Every token covered by a removed span occurrence is dropped; the
    * surviving tokens reassemble in original order. Returns per doc
    * (doc_id, n_tokens, n_kept, n_removed, text_out) — text_out is the
    * deduplicated document.
    *
    * Scale: the same no-pair-join discipline as [[dupSpans]] — span
    * statistics are ONE corpus-wide hash aggregate (count + min ordinal,
    * both map-side combinable), removed positions explode at most n rows
    * per duplicated occurrence, and reassembly sorts only within one
    * document (collect_list + array_sort bounded by doc length, the same
    * per-doc bound every tokenizer stage already carries). A boilerplate
    * span occurring 10⁹ times costs 10⁹·n position rows — linear in the
    * duplication it removes, never quadratic in the pairs it implies. */
  def removeDupSpans(docs: DataFrame, id: String, text: String,
                     n: Int): DataFrame = {
    val ord = 1L << 20
    val base = docs.select(col(id).as("doc_id"), words(col(text)).as("ws"))
    val toks = base
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos0", "word")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("word"))
    val spans = base
      .select(col("doc_id"),
        explode(when(size(col("ws")) >= n,
          transform(sequence(lit(1), size(col("ws")) - (n - 1)), i =>
            struct(i.cast("long").as("spos"),
              concat_ws(" ",
                (0 until n).map(j => element_at(col("ws"), i + j)): _*)
                .as("span"))))
          .otherwise(array().cast("array<struct<spos:bigint,span:string>>")))
          .as("sp"))
      .select(col("doc_id"), col("sp.spos").as("spos"), col("sp.span").as("span"))
    val stats = spans.groupBy(col("span"))
      .agg(count(lit(1)).as("c"),
        min(col("doc_id") * ord + col("spos")).as("min_occ"))
    val removedPos = spans.join(stats, "span")
      .where(col("c") > 1L &&
        (col("doc_id") * ord + col("spos")) =!= col("min_occ"))
      .select(col("doc_id"),
        explode(sequence(col("spos"), col("spos") + (n - 1))).as("pos"))
      .distinct()
    val kept = toks.join(removedPos, Seq("doc_id", "pos"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("word")))),
            s => s.getField("word"))).as("text_out"))
    base.select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_out"), lit("")).as("text_out"))
  }

  /** Fuzzy string self-join (entity-resolution blocking + verify): all
    * id pairs whose names are within edit distance 1, restricted to
    * same-length (substitution) matches by construction. A single
    * substitution leaves the first half OR the last half of the string
    * intact (pigeonhole), so blocking on (length, side, half-string)
    * generates every such pair as a candidate; `levenshtein` then
    * verifies exactly (for same-length strings differing in ≤1 position
    * the edit distance IS the Hamming distance). Distance-0 pairs
    * (exact name dupes) are included — this is fuzzy DEDUP, finding
    * them is the point.
    *
    * Scale: candidates come only from shared half-blocks; a degenerate
    * hot block (shared prefix across a huge slice) is dropped whole by
    * `maxBlock` — the same DF-cap discipline as [[ngramJaccard]],
    * replicated by the oracle. Returns (id_a, id_b, dist). */
  /** The (length, side, half-string) pigeonhole blocking keys shared by
    * [[fuzzyPairs]] and [[blockingQuality]]: one L and one R key per
    * entity — a single substitution leaves one half intact, so every
    * distance-≤1 same-length pair shares at least one key. Returns
    * (fid, nm, blk), materialized (two consumers downstream). */
  def halfBlocks(df: DataFrame, id: String, name: String): DataFrame =
    df.select(col(id).as("fid"), col(name).as("nm"))
      .select(col("fid"), col("nm"), explode(array(
        concat_ws("|", lit("L"), length(col("nm")),
          expr("substring(nm, 1, (length(nm) + 1) div 2)")),
        concat_ws("|", lit("R"), length(col("nm")),
          expr("substring(nm, (length(nm) + 1) div 2 + 1)")))).as("blk"))
      .localCheckpoint(true)

  def fuzzyPairs(df: DataFrame, id: String, name: String,
                 maxBlock: Int): DataFrame = {
    val keyed = halfBlocks(df, id, name)
    val hot = keyed.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
      .where(col("bn") > maxBlock).select(col("blk"))
    val ok = keyed.join(hot, Seq("blk"), "left_anti")
    ok.as("x").join(ok.as("y"),
        col("x.blk") === col("y.blk") && col("x.fid") < col("y.fid"))
      .select(col("x.fid").as("id_a"), col("y.fid").as("id_b"),
        col("x.nm").as("nm_a"), col("y.nm").as("nm_b"))
      .distinct()
      .where(levenshtein(col("nm_a"), col("nm_b")) <= 1)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("nm_a"), col("nm_b")).cast("long").as("dist"))
  }

  /** Blocking-quality audit — the two numbers every entity-resolution
    * blocking scheme is judged by (Christen, "Data Matching", 2012 —
    * public literature), computed against known ground-truth pairs:
    *
    *   - pair completeness  PC = |candidates ∩ truth| / |truth|
    *     (the recall the blocking scheme CAPS — no verifier downstream
    *      can recover a truth pair the blocks never co-locate);
    *   - reduction ratio    RR = 1 − |candidates| / (n·(n−1)/2)
    *     (how much of the quadratic all-pairs space the scheme prunes).
    *
    * Both in exact ppm. The audit is how a blocking choice (key design,
    * `maxBlock` cap) is tuned BEFORE running a 100 TB match: a capped
    * hot block trades PC for RR, and this makes the trade measurable.
    *
    * Scale: candidates come only from shared sub-cap blocks (never
    * all-pairs); the truth intersection is one equi-join on the pair
    * key; the three 1-row aggregates broadcast-join at the end.
    * One row out: (n_entities, n_truth, n_candidates, n_found, pc_ppm,
    * rr_ppm). */
  def blockingQuality(keyed: DataFrame, truth: DataFrame,
                      maxBlock: Int): DataFrame = {
    val hot = keyed.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
      .where(col("bn") > maxBlock).select(col("blk"))
    val ok = keyed.join(broadcast(hot), Seq("blk"), "left_anti")
    val cand = ok.as("x").join(ok.as("y"),
        col("x.blk") === col("y.blk") && col("x.fid") < col("y.fid"))
      .select(col("x.fid").as("id_a"), col("y.fid").as("id_b"))
      .distinct()
      .localCheckpoint(true)  // feeds both the count and the truth join
    val t = truth.select(least(col("id_a"), col("id_b")).as("id_a"),
      greatest(col("id_a"), col("id_b")).as("id_b")).distinct()
    val nEnt = keyed.select(col("fid")).distinct()
      .agg(count(lit(1)).as("n_entities"))
    val nTruth = t.agg(count(lit(1)).as("n_truth"))
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    val nFound = cand.join(t, Seq("id_a", "id_b"))
      .agg(count(lit(1)).as("n_found"))
    nEnt.join(broadcast(nTruth), lit(true))
      .join(broadcast(nCand), lit(true))
      .join(broadcast(nFound), lit(true))
      .select(col("n_entities"), col("n_truth"), col("n_candidates"),
        col("n_found"),
        expr("n_found * 1000000 div n_truth").as("pc_ppm"),
        expr("1000000 - n_candidates * 1000000 div " +
          "(n_entities * (n_entities - 1) div 2)").as("rr_ppm"))
  }

  /** n-gram Jaccard near-dup: distinct word-k-shingles per doc, inverted
    * index on the shingle, pair-count aggregate, exact Jaccard filter.
    * The shingle join is the classic "documents sharing at least one
    * shingle" candidate generator — pairs never sharing a shingle (i.e.
    * Jaccard 0) are never materialized. */
  def ngramJaccard(docs: DataFrame, id: String, text: String, k: Int,
                   threshold: Double,
                   maxDf: Long = Long.MaxValue): DataFrame = {
    // r12 opt (guide §5 re-evaluation): the shingle stream has 3-4
    // consumers below (doc counts, the DF histogram, both posting-list
    // sides) — un-materialized, each re-ran tokenize+shingle+hash over
    // the corpus. One eager checkpoint runs it once.
    val sh = shingleTable(docs, id, text, k)
      // join/shuffle on a 64-bit shingle hash, not the string: ~5× less
      // shuffle data; 27k distinct shingles → collision odds ~1e-11, and a
      // collision only perturbs one pair count by 1.
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
      .localCheckpoint(true)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // DF cap: a stop-shingle shared by a million documents would make the
    // inverted-index join quadratic in that shingle's posting list. Hot
    // keys are by definition few → broadcast anti-join. Jaccard denominators
    // (na, nb) stay pre-prune, so scores remain exact for every pair that
    // shares at least one sub-cap shingle; pairs similar ONLY through
    // ultra-common shingles are deliberately dropped (standard practice —
    // record the cap when publishing results).
    val pruned = if (maxDf == Long.MaxValue) sh else {
      val hot = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .where(col("df") > maxDf).select(col("s"))
      sh.join(broadcast(hot), Seq("s"), "left_anti")
    }
    // explicit-N repartition by the posting key (r12, guide §2.5 — the
    // GraphAlgos.spreadBy rationale): AQE sizes partitions by INPUT
    // bytes, so this small-input exploding self-join coalesced to ONE
    // task that produced the whole candidate set serially (measured: a
    // single 1.4 s task behind cluster_safe_split). The join reuses the
    // exchange; at scale it is only a parallelism floor.
    val dp = docs.sparkSession.sparkContext.defaultParallelism
    val spread = pruned.repartition(dp, col("s"))
    val pairs = spread.as("a").join(spread.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    pairs
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jac",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .where(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round6(col("jac")).as("jaccard"))
  }

  /** Asymmetric n-gram CONTAINMENT near-dup: C(A→B) = |sh(A) ∩ sh(B)| /
    * |sh(A)| — the "is this short doc substantially inside that long
    * one" question Jaccard cannot answer (a 50-shingle quote of a
    * 5000-shingle article has Jaccard ≈ 0.01 but containment ≈ 1.0;
    * Broder 1997 distinguishes "resemblance" from "containment", and
    * training-data pipelines need both: quote-farms and boilerplate
    * wrappers are containment dups, not resemblance dups).
    *
    * Same inverted-index candidate generation + hot-shingle DF cap as
    * [[ngramJaccard]] — one posting-list self-join, never all-pairs.
    * Each surviving pair reports BOTH directions (cont_a = c/|sh(A)|,
    * cont_b = c/|sh(B)|); a pair is kept when either direction clears
    * the threshold. Denominators stay pre-prune, so reported scores are
    * exact for every pair sharing a sub-cap shingle. */
  def containment(docs: DataFrame, id: String, text: String, k: Int,
                  threshold: Double,
                  maxDf: Long = Long.MaxValue): DataFrame = {
    // r12 opt: same shingle-stream checkpoint + exploding-self-join
    // spread as [[ngramJaccard]] (see the comments there)
    val sh = shingleTable(docs, id, text, k)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
      .localCheckpoint(true)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pruned = if (maxDf == Long.MaxValue) sh else {
      val hot = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .where(col("df") > maxDf).select(col("s"))
      sh.join(broadcast(hot), Seq("s"), "left_anti")
    }
    val dp = docs.sparkSession.sparkContext.defaultParallelism
    val spread = pruned.repartition(dp, col("s"))
    val pairs = spread.as("a").join(spread.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    pairs
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("ca", col("c").cast("double") / col("na"))
      .withColumn("cb", col("c").cast("double") / col("nb"))
      .where(greatest(col("ca"), col("cb")) >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round6(col("ca")).as("cont_a"), round6(col("cb")).as("cont_b"))
  }

  /** Sub-document boilerplate removal by corpus-frequency chunk dedup —
    * the CCNet/RefinedWeb "line-level dedup" stage (Wenzek et al. 2020
    * drop paragraphs seen elsewhere in the crawl; Penedo et al. 2023 do
    * it at line granularity): a document is cleaned by deleting every
    * fixed-size word chunk whose text occurs in ≥ `minDf` DISTINCT
    * documents, then re-joining the surviving chunks in order. This is
    * the frequency axis the pairwise dedups (Jaccard / containment /
    * spans) don't cover: a nav-bar repeated across 10⁶ pages never
    * clears a pairwise threshold per doc pair, but its chunk DF is 10⁶.
    *
    * Docs whose chunks are ALL boilerplate survive with kept_chunks = 0
    * and empty clean_text — the caller decides whether to drop them.
    *
    * Scale: chunking is a generator (no shuffle); the DF count is one
    * hash aggregate over (chunk, doc) with map-side combine; the hot set
    * is broadcast (boilerplate is by definition FEW DISTINCT chunks —
    * its total occurrence count is unbounded but its distinct count is
    * tiny, so the anti-join side stays small at any corpus size); the
    * reassembly is one groupBy(doc_id) whose per-doc state is the doc
    * itself — the same bound as reading it. */
  def chunkFrequencyStrip(docs: DataFrame, id: String, text: String,
                          size: Int, minDf: Long): DataFrame = {
    val chunks = CorpusTools.chunkWords(docs, id, text, size, overlap = 0)
      .select(col(id).as("doc_id"), col("chunk_idx"),
        concat_ws(" ", col("chunk_words")).as("s"))
    val hot = chunks.groupBy(col("s"))
      .agg(count_distinct(col("doc_id")).as("df"))
      .where(col("df") >= minDf).select(col("s"))
    val kept = chunks.join(broadcast(hot), Seq("s"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_chunks"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("s")))),
          c => c.getField("s"))).as("clean_text"))
    chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("total_chunks"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("total_chunks"),
        coalesce(col("kept_chunks"), lit(0L)).as("kept_chunks"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
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

  /** Rolling-combine modulus shared with the SQL oracle: shingle hash =
    * fold of word hashes h := (h·C + wh) mod p, band key = the same fold
    * over a band's minhash values. Exact int64 arithmetic in both engines
    * (p·C ≈ 1e15 < 2^63). */
  val PortableP = 1000000007L
  val PortableC = 1000003L

  /** MinHash + LSH with a DuckDB-replicable hash family. Same banding and
    * estimate as [[minhashLsh]], but every step has an exact SQL twin, so
    * this variant sits in the exact oracle gate (xxhash64-based
    * [[minhashLsh]] remains the production-fast path).
    *
    * Structure (round-2 rewrite — the round-1 form cost 43% of the whole
    * bench): each WORD is character-hashed once (polyHash, O(chars/doc)
    * total) and shingle hashes derive from word hashes by a rolling
    * combine — the round-1 form re-split every k-word shingle into
    * characters, O(k·chars/doc). Banding is ONE explode-band self-join on
    * a numeric fold key carrying only (doc_id, band, key) — the round-1
    * form ran `bands` separate self-joins on concat_ws STRING keys, each
    * dragging all `numHashes` signature columns through the shuffle. The
    * signature verify joins back against the narrow sig table, mirroring
    * [[minhashLsh]]. */
  def minhashLshPortable(docs: DataFrame, id: String, text: String,
                         k: Int = 3, numHashes: Int = 16, bands: Int = 4,
                         threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // r12 opt: sig has three consumers (band fold + both verify joins) —
    // checkpoint so the tokenize+minhash aggregate runs once, and spread
    // the exploding band self-join by its key (guide §2.5; same fix as
    // simhashPortable/ngramJaccard). Batch-only path — the streaming
    // twin (bandKeyTable) stays a pure narrow projection.
    val sig = portableSignature(docs, id, text, k, numHashes)
      .localCheckpoint(true)
    val buckets = portableBandKeys(sig, numHashes, bands)
    val dp = docs.sparkSession.sparkContext.defaultParallelism
    val spread = buckets.repartition(dp, col("band"), col("key"))
    val cand = spread.as("a").join(spread.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val matches = (0 until numHashes)
      .map(i => when(col(s"a.m$i") === col(s"b.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sig.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sig.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (matches.cast("double") / numHashes).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** The (doc_id, band, key) LSH index rows for a document table — the
    * portable signature + band fold as ONE narrow projection chain (no
    * shuffle, no materialization), so it runs identically over a BATCH
    * DataFrame or a STREAMING one. The streaming use is the ingest-time
    * dedup index: band keys of arriving docs stream-stream self-join on
    * (band, key), the join state IS the accumulated index, and every new
    * doc automatically pairs with all prior docs sharing a band — the
    * continuously-maintained form of [[minhashIncremental]]. */
  def bandKeyTable(docs: DataFrame, id: String, text: String,
                   k: Int = 3, numHashes: Int = 16,
                   bands: Int = 4): DataFrame =
    portableBandKeys(portableSignature(docs, id, text, k, numHashes),
      numHashes, bands)

  /** Fixed (a_i, b_i) universal-hash seeds shared with the SQL oracle
    * (64: enough for a full SimHash bit family). */
  val MinhashSeeds: Seq[(Long, Long)] =
    (0 until 64).map(i => (33L + 2 * i, 7919L * i))

  /** Per-doc portable MinHash signature (doc_id, m0..m{numHashes-1}):
    * words → polyHash word hashes (materialized projection — see
    * [[shingleTable]] re: inline re-evaluation) → distinct rolling
    * k-shingle hashes → numHashes minima. All narrow, no explode, no
    * shuffle. Docs shorter than k words drop out (no signature). */
  private def portableSignature(docs: DataFrame, id: String, text: String,
                                k: Int, numHashes: Int): DataFrame = {
    val p = PortableP
    val c = PortableC
    docs
      .select(col(id).as("doc_id"), words(col(text)).as("ws"))
      .where(size(col("ws")) >= k)
      .select(col("doc_id"), transform(col("ws"), polyHash _).as("wh"))
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(1), size(col("wh")) - (k - 1)), i =>
          (0 until k).foldLeft(lit(0L): Column) { (acc, j) =>
            (acc * c + element_at(col("wh"), i + j)) % p
          })).as("hs"))
      .select(col("doc_id") +: MinhashSeeds.take(numHashes).zipWithIndex.map {
        case ((a, b), i) =>
          array_min(transform(col("hs"),
            h => (h * a + b) % p)).as(s"m$i")
      }: _*)
  }

  /** LSH band keys for a [[portableSignature]] — one (doc_id, band, key)
    * row per band, key = numeric fold of that band's signature rows
    * (narrow shuffle rows, no string concat). */
  private def portableBandKeys(sig: DataFrame, numHashes: Int,
                               bands: Int): DataFrame = {
    val rows = numHashes / bands
    val c = PortableC
    val p = PortableP
    sig.select(col("doc_id"),
      explode(array((0 until bands).map { bnd =>
        val key = (0 until rows).foldLeft(lit(bnd.toLong): Column) {
          (acc, r) => (acc * c + col(s"m${bnd * rows + r}")) % p
        }
        struct(lit(bnd).as("band"), key.as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
  }

  /** Incremental near-dup screening — the ingest-time shape of
    * MinHash+LSH: a new BATCH of documents is checked against the
    * EXISTING corpus without ever joining the corpus to itself. Returns
    * one row per batch document: (doc_id, n_matches, match_id) where
    * n_matches counts verified corpus near-dups (signature agreement ≥
    * ⌈threshold·numHashes⌉) and match_id is the smallest matching corpus
    * id, −1 when the document is novel.
    *
    * Scale: band keys are computed on both sides and meet in ONE
    * equi-join — work is proportional to batch-side collisions, never
    * |corpus|². The batch side is typically orders of magnitude smaller
    * than the corpus, so AQE broadcasts it; re-ingesting the same corpus
    * day after day never re-pairs existing documents with each other
    * (the self-join the batch formulation exists to avoid). */
  def minhashIncremental(corpus: DataFrame, batch: DataFrame, id: String,
                         text: String, k: Int = 3, numHashes: Int = 16,
                         bands: Int = 4,
                         threshold: Double = 0.5): DataFrame = {
    val minMatches = math.ceil(threshold * numHashes).toLong
    val sigC = portableSignature(corpus, id, text, k, numHashes)
    val sigB = portableSignature(batch, id, text, k, numHashes)
    val cand = portableBandKeys(sigB, numHashes, bands).as("b")
      .join(portableBandKeys(sigC, numHashes, bands).as("c"),
        col("b.band") === col("c.band") && col("b.key") === col("c.key"))
      .select(col("b.doc_id").as("doc_b"), col("c.doc_id").as("doc_c"))
      .distinct()
    val matches = (0 until numHashes)
      .map(i => when(col(s"a.m$i") === col(s"s.m$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val ver = cand.join(sigB.as("a"), col("doc_b") === col("a.doc_id"))
      .join(sigC.as("s"), col("doc_c") === col("s.doc_id"))
      .where(matches >= minMatches)
      .select(col("doc_b"), col("doc_c"))
    val agg = ver.groupBy(col("doc_b").as("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("doc_c")).as("match_id"))
    batch.select(col(id).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("match_id"), lit(-1L)).as("match_id"))
  }

  /** SimHash with a DuckDB-replicable bit family: word base hash =
    * polyHash (mod p), bit i of a word = parity of the universal hash
    * (a_i·wh + b_i) mod p. Per-document signature = sign of the ±1 vote
    * sum per bit, packed as four 16-bit band keys (never a full 64-bit
    * pack — bit 63 shifts would need signed-overflow agreement across
    * engines; four positive shorts need none). Candidates = pairs
    * colliding in ≥1 band (Hamming < 4 ⇒ some band identical);
    * verify = popcount of the band-key XORs. Exact int64 throughout →
    * exact SQL twin ([[simhash]] with xxhash64 remains the fast path). */
  def simhashPortable(docs: DataFrame, id: String, text: String,
                      maxHamming: Int = 3): DataFrame = {
    val p = PortableP
    val w = docs
      .select(col(id).as("doc_id"),
        explode(array_distinct(words(col(text)))).as("w"))
      .select(col("doc_id"), polyHash(col("w")).as("h"))
    val voteCols = (0 until 64).map { i =>
      val (a, b) = MinhashSeeds(i)
      sum(when((col("h") * a + b) % p % 2 === 1, 1).otherwise(-1))
        .as(s"v$i")
    }
    val votes = w.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
    // r12 opt: sig has three consumers (the band explode + both verify
    // joins) — un-materialized, each re-ran the tokenize+vote aggregate
    // (measured: the same 0.8 MB signature exchange computed 3×, each a
    // serial single task). Checkpoint once; and spread the band self-join
    // by its key (guide §2.5 — AQE coalesced the small input to ONE task
    // that produced the whole candidate set serially, 1.7 s of the
    // query's 3.3 s).
    val sig = votes.select(col("doc_id") +: (0 until 4).map { bnd =>
      (0 until 16).map(t =>
        when(col(s"v${bnd * 16 + t}") > 0, lit(1L << t)).otherwise(lit(0L)))
        .reduce(_ + _).as(s"k$bnd")
    }: _*).localCheckpoint(true)
    val bands = sig.select(col("doc_id"),
      explode(array((0 until 4).map(bnd =>
        struct(lit(bnd).as("band"), col(s"k$bnd").as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val dp = docs.sparkSession.sparkContext.defaultParallelism
    val spread = bands.repartition(dp, col("band"), col("key"))
    val cand = spread.as("a").join(spread.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val hamming = (0 until 4).map(bnd =>
      bit_count(col(s"a.k$bnd").bitwiseXOR(col(s"b.k$bnd"))))
      .reduce(_ + _).cast("long")
    cand.join(sig.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sig.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"), hamming.as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

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
    * natural cluster key) + exact cosine filter. Demonstration variant —
    * block size is keyed to data cardinality, so a popular label goes
    * quadratic; [[embeddingNearDupLsh]] is the scale path (bounded
    * hyperplane buckets, same equi-join shape). */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("label"),
      asDouble(col("embedding")).as("v"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosineFast(col("a.v"), col("b.v")).as("sim"))
      .where(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round6(col("sim")).as("sim"))
  }

  /** Connected components over a near-dup pair list — the clustering step
    * that turns pairwise matches into dedup groups (keep one
    * representative per component). Iterative min-label propagation to a
    * fixpoint: each round every node adopts the smallest label among
    * itself and its neighbors; at convergence every node carries its
    * component's minimum doc id. Rounds = graph diameter — near-dup
    * components are short chains in practice; for adversarially long
    * chains swap in the large-star/small-star contraction (same driver
    * loop, O(log n) rounds). The driver-side convergence check is the
    * standard iterative-algorithm pattern (GraphX Pregel does the same);
    * per-round results are persisted and lineage-truncated so round k
    * does not re-execute rounds 1..k-1.
    *
    * Returns (doc_id, rep) for every node appearing in `pairs`. */
  def clusters(pairs: DataFrame, a: String = "doc_a",
               b: String = "doc_b"): DataFrame = {
    val e = pairs.select(col(a).cast("long").as("x"),
      col(b).cast("long").as("y"))
    val edges = e.union(e.select(col("y"), col("x")))
      .toDF("src", "dst").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var lbl = edges.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node"))
        .localCheckpoint(true)
      var changed = 1L
      while (changed > 0) {
        val prop = lbl.join(edges, col("node") === col("src"))
          .select(col("dst").as("node"), col("lbl"))
        // r12 opt (guide §1.2 fewer driver-sequenced jobs): the node's
        // PREVIOUS label rides through the min-aggregate (every node has
        // exactly one lbl row — max(old) ignores the prop rows' nulls),
        // so change detection becomes one narrow scan of the checkpointed
        // result instead of the old per-round next⋈lbl join job. Labels
        // per round are identical; `changed` counts the same rows.
        val next = lbl.select(col("node"), col("lbl"), col("lbl").as("old"))
          .unionByName(prop.withColumn("old", lit(null).cast("long")))
          .groupBy(col("node"))
          .agg(min(col("lbl")).as("lbl"), max(col("old")).as("old"))
          .localCheckpoint(true) // truncate lineage: round k must not
                                 // re-execute rounds 1..k-1
        changed = next.where(col("lbl") =!= col("old")).count()
        lbl.unpersist() // release the superseded round's checkpoint now,
                        // not at driver GC — O(rounds) copies otherwise
        lbl = next.select(col("node"), col("lbl"))
      }
      lbl.select(col("node").as("doc_id"), col("lbl").as("rep"))
    } finally edges.unpersist()
  }

  /** Connected components by alternating large-star / small-star
    * contraction (the map-reduce CC algorithm of Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14 — public
    * literature): large-star hooks every neighbor v > u onto u's minimum
    * neighborhood node; small-star does the same for v ≤ u. Both are one
    * aggregate + one join per round, and the edge set contracts toward
    * per-component stars in O(log n) rounds — the scale path when
    * component diameters are adversarial ([[clusters]]' min-label
    * propagation needs O(diameter) rounds). Same contract as
    * [[clusters]]: (doc_id, rep) with rep = component minimum. */
  def clustersStar(pairs: DataFrame, a: String = "doc_a",
                   b: String = "doc_b"): DataFrame = {
    val spark = pairs.sparkSession
    val e0 = pairs.select(col(a).cast("long").as("u"),
      col(b).cast("long").as("v"))
    // orient edges (large, small) and drop self-loops
    def orient(df: DataFrame): DataFrame =
      df.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
        .where(col("u") =!= col("v")).distinct()
    def largeStar(e: DataFrame): DataFrame = {
      val nb = e.select(col("u"), col("v"))
        .union(e.select(col("v"), col("u")))
      // the grouping key is directly referable in agg expressions — no
      // first() buffer needed
      val mins = nb.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      orient(nb.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }
    def smallStar(e: DataFrame): DataFrame = {
      // after orient(), every edge already has u > v
      val mins = e.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      orient(e.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(mins.select(col("u"), col("m").as("v"))))
    }
    var edges = orient(e0).localCheckpoint(true)
    // r12 opt (driver-sequenced job count — this loop runs PER MICRO-BATCH
    // inside stream_cc's foreachBatch): carry the previous round's count
    // instead of re-running edges.count() every round (one job per round
    // saved), and skip the contraction loop entirely for an empty delta
    // graph (the fixpoint of an empty set is itself — the old code spent
    // a full round discovering that). Same rounds, same fixpoint test.
    var prevN = edges.count()
    var converged = prevN == 0L
    while (!converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val n = next.count()
      // fixpoint test on the oriented edge SET
      converged = n == prevN && next.except(edges).isEmpty
      edges.unpersist() // free the superseded round eagerly
      edges = next
      prevN = n
    }
    // at the fixpoint every component is a star rooted at its minimum:
    // members point at the root, plus the root itself. Nodes appearing
    // only in self-loop pairs have no oriented edge — restore them as
    // their own representatives ([[clusters]] contract parity).
    val starMap = edges.select(col("u").as("doc_id"), col("v").as("rep"))
      .unionByName(edges.select(col("v").as("doc_id"), col("v").as("rep"))
        .distinct())
    val allNodes = e0.select(explode(array(col("u"), col("v"))).as("doc_id"))
      .distinct()
    allNodes.join(starMap, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep"))
  }

  /** Leakage-safe train/valid/test split: near-dup CLUSTERS are the
    * split unit, not documents — a near-duplicate pair straddling train
    * and eval is benchmark contamination (the reason C4/Pile-style
    * corpora dedup ACROSS splits, not just within). Every doc joins its
    * [[clusters]] representative (singletons are their own rep) and the
    * Knuth multiplicative hash of the REP picks the split, so members
    * always land together. Returns per split: (split, n_docs,
    * n_clusters, id_sum, cross_split_pairs) — the last column is the
    * leakage invariant, COUNTED from the pair list rather than assumed
    * (must be 0; a regression in rep assignment shows up here, in data).
    *
    * Scale: clusters is the min-label fixpoint (O(diameter) rounds, or
    * [[clustersStar]] for adversarial diameters); everything after is
    * one left join + narrow hash arithmetic + two aggregates. */
  def clusterSafeSplit(docs: DataFrame, id: String, pairs: DataFrame,
                       trainPct: Int = 80,
                       validPct: Int = 10): DataFrame = {
    val reps = clusters(pairs)
    // reduce mod p BEFORE the Knuth multiply: rep·2654435761 would wrap
    // int64 for ids past ~3.5e9 (snowflake-style 1e18 ids) and a wrapped
    // negative value silently lands every doc in 'train'; (p−1)·K ≈
    // 2.7e18 stays in range. Ids are non-negative by contract.
    val bucket =
      ((col("rep") % 1000000007L) * 2654435761L) % 1000000007L % 100L
    val withSplit = docs.select(col(id).as("doc_id"))
      .join(reps, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("rep"), col("doc_id")))
      .withColumn("split",
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + validPct, "valid")
          .otherwise("test"))
    val sides = withSplit.select(col("doc_id"), col("split"))
    val leaks = pairs
      .join(sides.toDF("doc_a", "sa"), "doc_a")
      .join(sides.toDF("doc_b", "sb"), "doc_b")
      .where(col("sa") =!= col("sb"))
      .groupBy(col("sa").as("split")).agg(count(lit(1)).as("leaked"))
    withSplit.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("rep")).as("n_clusters"),
        sum(col("doc_id")).as("id_sum"))
      .join(leaks, Seq("split"), "left")
      .select(col("split"), col("n_docs"), col("n_clusters"),
        col("id_sum"),
        coalesce(col("leaked"), lit(0L)).as("cross_split_pairs"))
  }

  /** Fixed seeded integer hyperplanes for [[embeddingNearDupLsh]] — small
    * pseudo-random components in [-128, 128), exact int64 arithmetic, so
    * the identical literals embed in the DuckDB oracle. */
  def hyperplanes(nbits: Int, dim: Int): Seq[Seq[Long]] =
    (0 until nbits).map { i =>
      val a = 33L + 2 * i
      val b = 7919L * i
      (0 until dim).map(j =>
        (((j + 1) * a + b) * 1103515245L + 12345L) % 1000003L % 257L - 128L)
    }

  /** Embedding near-dup at scale: random-hyperplane LSH candidate
    * generation + exact cosine verify. Embeddings are quantized to
    * integers (⌊x·1000 + ½⌋ — floor form, the engine-exactness rule from
    * `Similarity.quantized`) and dotted against [[hyperplanes]] in exact
    * int64, so the sign bits — and therefore the buckets — are
    * bit-identical across engines (a float dot product's last-ulp
    * variation could flip a sign near zero). Each band's bucket key packs
    * `nbits/bands` sign bits; candidates are pairs colliding in ≥1 band
    * (standard banded LSH: P[bit agree] = 1 − θ/π, so recall is tuned by
    * (bits, bands) — the 24/12 default finds every ≥0.4-cosine pair in
    * the test fixture). Bucket population is bounded by the bit split,
    * never by a data-dependent label, and the verify join touches only
    * candidate pairs — the label-blocked [[embeddingNearDup]]'s quadratic
    * hot block cannot occur. */
  def embeddingNearDupLsh(embeddings: DataFrame, threshold: Double,
                          nbits: Int = 24, bands: Int = 12,
                          dim: Int = 64): DataFrame = {
    require(nbits % bands == 0, "bands must divide nbits")
    val rb = nbits / bands
    val hp = hyperplanes(nbits, dim)
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // fail fast on a dimension mismatch: zip_with null-pads the shorter
    // side, which would silently null every dot product, zero every sign
    // bit, and collapse ALL vectors into one bucket — the exact quadratic
    // blowup this operator exists to prevent. The check is fused into the
    // consumed expression (a separate dropped column would be pruned away
    // by Catalyst before it could fire).
    val quant = e.select(col("vec_id"),
      when(col("v").isNull,
        raise_error(concat(lit("null embedding for vec_id "),
          col("vec_id").cast("string"))))
        .when(size(col("v")) === dim,
          transform(col("v"), x => floor(x * 1000 + 0.5).cast("long")))
        .otherwise(raise_error(concat(
          lit(s"embedding dim != $dim for vec_id "),
          col("vec_id").cast("string")))).as("q"))
    val bitCols = (0 until nbits).map { i =>
      // codegen kernel (identical null semantics to the interpreted
      // zip_with/aggregate chain it replaced; measured several × faster)
      val dot = longDot(col("q"), typedlit(hp(i)))
      when(dot >= 0, 1L).otherwise(0L).as(s"bit$i")
    }
    val bits = quant.select(col("vec_id") +: bitCols: _*)
    val buckets = bits.select(col("vec_id"),
      explode(array((0 until bands).map { b =>
        val key = (0 until rb).map(t => col(s"bit${b * rb + t}") * (1L << t))
          .reduce(_ + _)
        struct(lit(b).as("band"), key.as("key"))
      }: _*)).as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    // r12 opt: spread the exploding band self-join by its key (guide
    // §2.5 — AQE coalesced the small input to one serial task; same fix
    // as minhashLshPortable/simhashPortable)
    val dp = embeddings.sparkSession.sparkContext.defaultParallelism
    val spreadB = buckets.repartition(dp, col("band"), col("key"))
    val cand = spreadB.as("a").join(spreadB.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round6(cosineFast(col("va"), col("vb"))).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Quality-aware representative selection: instead of [[clusters]]'
    * keep-the-min-id convention, keep the BEST document of every near-dup
    * component — argmax on a caller-supplied quality column, ties to the
    * smaller id. This is how production dedup actually resolves clusters
    * (drop the truncated scrape, keep the clean copy); min-id keeps
    * whichever happened to be crawled first.
    *
    * Input: a near-dup pair list (any of the candidate generators here)
    * and the doc table carrying the quality signal. Components via
    * [[clusters]]; the per-component argmax is a window partitioned by
    * component — bounded by component size, never corpus size. Docs in
    * no component are singletons: trivially kept, reported with their own
    * id as the component. Returns (doc_id, component, q, keep). */
  def keepBest(pairs: DataFrame, docs: DataFrame, id: String,
               quality: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comp = clusters(pairs)
      .select(col("doc_id"), col("rep").as("component"))
    docs.select(col(id).as("doc_id"), quality.cast("long").as("q"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("component"))
          .orderBy(col("q").desc, col("doc_id"))))
      .select(col("doc_id"), col("component"), col("q"),
        (col("rn") === 1).as("keep"))
  }
}
