package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text retrieval over the document corpus — the search half of a
  * training-data pipeline (query-set curation, benchmark mining,
  * retrieval-augmented filtering). The reference's engine serves graphs to
  * consumers; a corpus engine at this scale must also answer "which
  * documents match this query" without a full scan per query.
  *
  * Scale design (100 TB):
  *  - The index is the classic inverted shape: one (doc, term) row per
  *    posting, built with a single explode + hash aggregate. Queries meet
  *    postings in ONE equi-join on the term — work is proportional to the
  *    matched postings, never |queries|×|docs|.
  *  - Corpus statistics (N, total length) are a 1-row aggregate broadcast
  *    back via scalar cross-join — no collect.
  *  - Ranking goes through the bounded [[TopK]] aggregate: k rows per
  *    query per partition cross the shuffle (a per-query window over all
  *    matches would sort every match of every query on one partition).
  *
  * Exactness: BM25's ln-based idf is NOT cross-engine reproducible (libm
  * vs JDK ln differ in the last ulp). This scorer keeps BM25's tf
  * saturation term verbatim but dampens the idf odds-ratio with sqrt —
  * IEEE 754 requires +, −, ×, ÷ and sqrt to be correctly rounded, so the
  * whole per-term score is bit-identical in any compliant engine. Each
  * per-term score is floored to a scaled int64 BEFORE the per-document
  * sum, making the aggregate order-independent (float sums are not).
  */
object Retrieval {

  /** BM25-shaped top-k document retrieval.
    *
    * Per matched (query, doc, term):
    * {{{
    *   w = tf·(k1+1) / (tf + k1·(1−b + b·dl·N/L))        // tf saturation
    *       · sqrt((N − df + 0.5) / (df + 0.5))           // sqrt-idf
    *   score_term = ⌊w · scale⌋                           // int64
    * }}}
    * where dl = doc length (words), N = corpus size, L = total corpus
    * length, df = term document frequency. Document score = Σ score_term
    * over the query's distinct terms; top-k per query by (score DESC,
    * doc_id ASC). The default k1/b are exact binary fractions (1.25 =
    * 2^0+2^-2, 0.75 = 2^-1+2^-2) so every literal in the score is
    * bit-identical however an engine parses it.
    *
    * @param docs       corpus with long id column `id` and text column
    * @param queryTerms (qid long, word string) — the tokenized query set,
    *                   small relative to the corpus (broadcast side)
    * @return (qid, doc_id, score, rn) with rn = 1..k
    */
  def bm25TopK(docs: DataFrame, id: String, text: String,
               queryTerms: DataFrame, k: Int,
               k1: Double = 1.25, b: Double = 0.75,
               scale: Long = 1000000L): DataFrame = {
    val ws = words(col(text))
    // postings: one row per (doc, term) with the doc length carried
    val toks = docs.select(col(id).as("doc_id"),
        size(ws).cast("long").as("dl"), explode(ws).as("word"))
    val tf = toks.groupBy(col("doc_id"), col("dl"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    // 1-row corpus stats, broadcast back — never collected
    val stats = docs.agg(count(lit(1)).as("nd"),
      sum(size(ws).cast("long")).as("tl"))
    val matched = broadcast(queryTerms.select(col("qid"), col("word"))
        .distinct())
      .join(tf, "word")
      .join(dfreq, "word")
      .crossJoin(broadcast(stats))
    // every operand explicitly double so the expression tree (and thus
    // the IEEE rounding sequence) is identical to the oracle's SQL text
    val tfd = col("tf").cast("double")
    val dld = col("dl").cast("double")
    val ndd = col("nd").cast("double")
    val tld = col("tl").cast("double")
    val dfd = col("df").cast("double")
    val w = (tfd * lit(k1 + 1.0)) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * (dld * ndd / tld))) *
      sqrt((ndd - dfd + lit(0.5)) / (dfd + lit(0.5)))
    val scored = matched
      .select(col("qid"), col("doc_id"),
        floor(w * lit(scale.toDouble)).cast("long").as("s"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("s")).as("score"))
    // int64 scores stay ≤ |query terms|·scale ≪ 2^53 — the double `ord`
    // inside TopK is exact
    TopK.perKey(scored, key = "qid", ord = "score", tiebreak = "doc_id",
        payload = "doc_id", k = k)
      .select(col("qid"), col("doc_id"),
        col("score").cast("long").as("score"), col("rn"))
  }

  /** Reciprocal-rank fusion — the standard hybrid-search combiner for a
    * lexical ranking (BM25) and a vector ranking (ANN) of the same query
    * set: RRF(q, d) = Σ over rankings r of ⌊scale / (c + rank_r(d))⌋,
    * top-k per query by (RRF desc, doc_id). The classic c = 60 damping;
    * the floor-scaled integer contribution makes the cross-ranking sum
    * order-independent and bit-identical in any engine (the textbook
    * 1/(c+rank) float sum is neither).
    *
    * Scale: inputs are already top-k rankings — ≤ k·|rankings| rows per
    * query ever exist, the fusion is one hash aggregate over them, and
    * the final ranking goes through the bounded [[TopK]] aggregate. The
    * expensive work (retrieval itself) stays in the upstream operators.
    *
    * @param rankings each with columns (qid long, doc_id long, rn long);
    *                 rn = 1-based rank within that ranking
    * @return (qid, doc_id, rrf, rn) with rn = 1..k by fused score
    */
  /** Substring search through a character-trigram inverted index — the
    * scale path for "which documents contain this literal pattern"
    * (contamination scans, PII pattern sweeps, code-corpus search):
    * instead of running `contains` over the whole corpus per pattern,
    * candidates are docs holding ALL of a pattern's distinct trigrams
    * (one posting-list equi-join + a count filter, work ∝ matched
    * postings), and only candidates pay the exact `contains`
    * verification. Patterns must be ≥ 3 chars (shorter ones would need a
    * full scan regardless — rejected up front). Returns (pattern,
    * doc_id), exactly the rows a brute contains-scan would produce —
    * which is what the oracle checks, so the gate proves the index path
    * is lossless. */
  def trigramSearch(docs: DataFrame, id: String, text: String,
                    patterns: Seq[String]): DataFrame = {
    require(patterns.forall(_.length >= 3),
      "trigramSearch patterns must be at least 3 chars")
    val spark = docs.sparkSession
    import spark.implicits._
    def tris(c: org.apache.spark.sql.Column) =
      array_distinct(transform(sequence(lit(1), length(c) - 2),
        i => c.substr(i, lit(3))))
    val corpus = docs.select(col(id).as("doc_id"), col(text).as("txt"))
      .where(length(col("txt")) >= 3)
    val postings = corpus
      .select(col("doc_id"), explode(tris(col("txt"))).as("tri"))
    val pats = patterns.toDF("pattern")
      .select(col("pattern"), explode(tris(col("pattern"))).as("tri"),
        size(tris(col("pattern"))).as("n_tri"))
    val cands = postings.join(broadcast(pats), "tri")
      .groupBy(col("pattern"), col("n_tri"), col("doc_id"))
      .agg(count(lit(1)).as("n_hit"))
      .where(col("n_hit") === col("n_tri"))
      .select(col("pattern"), col("doc_id"))
    cands.join(corpus, "doc_id")
      .where(col("txt").contains(col("pattern")))
      .select(col("pattern"), col("doc_id"))
  }

  /** Ranking-quality evaluation of a retrieved top-k list against a
    * qrel (relevance-judgment) set — the measurement half of a retrieval
    * pipeline (tuning BM25/ANN/RRF for RAG data curation needs exactly
    * this at corpus scale). All metrics are INTEGER-EXACT so the gate
    * hash-compares across engines (the repo's standing cross-engine
    * rule — no float accumulation, no log()):
    *
    *  - `mrr2520`     = 2520 / first-hit rank (2520 = lcm(1..10), so the
    *                    reciprocal rank is an exact integer for k ≤ 10;
    *                    0 when no hit)
    *  - `rr_mass2520` = Σ 2520/rank over all hits — a DCG-shaped graded
    *                    gain with exact integer weights (monotone in the
    *                    same direction as DCG's 1/log2(rank+1))
    *  - `recall_ppm`  = ⌊hits · 10⁶ / n_rel⌋, `precision_ppm` = ⌊hits ·
    *                    10⁶ / k⌋ — parts-per-million, floor division
    *
    * Scale: one equi-join of the top-k list (≤ k rows per query) against
    * the qrel set on (qid, doc_id), two hash aggregates — both sides are
    * query-proportional, never corpus-proportional.
    *
    * @param results (qid, doc_id, rn) with rn = 1..k
    * @param qrels   (qid, doc_id) judged-relevant pairs; every qid in
    *                `qrels` appears in the output (zero-hit queries too)
    */
  def rankingEval(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 10,
      "mrr2520 exactness (2520 = lcm 1..10) requires k <= 10")
    val hits = results.where(col("rn") <= k)
      .join(qrels.select(col("qid"), col("doc_id")), Seq("qid", "doc_id"))
    val perQ = hits.groupBy(col("qid")).agg(
      count(lit(1)).as("n_hits_raw"),
      min(col("rn")).as("first_rank_raw"),
      sum(expr("2520L div rn")).as("rr_raw"))
    val nRel = qrels.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    nRel.join(perQ, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        coalesce(col("n_hits_raw"), lit(0L)).as("n_hits"),
        coalesce(col("first_rank_raw"), lit(0L)).as("first_rank"),
        when(col("first_rank_raw").isNull, lit(0L))
          .otherwise(expr("2520L div first_rank_raw")).as("mrr2520"),
        coalesce(col("rr_raw"), lit(0L)).as("rr_mass2520"),
        expr("coalesce(n_hits_raw, 0L) * 1000000L div n_rel")
          .as("recall_ppm"),
        expr(s"coalesce(n_hits_raw, 0L) * 1000000L div ${k}L")
          .as("precision_ppm"))
  }

  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Long = 60L,
              scale: Long = 1000000L): DataFrame = {
    val u = rankings
      .map(_.select(col("qid"), col("doc_id"), col("rn")))
      .reduce(_.unionAll(_))
    val scored = u.groupBy(col("qid"), col("doc_id"))
      .agg(sum(expr(s"${scale}L div (${c}L + rn)")).as("rrf"))
    // rrf ≤ |rankings|·scale/(c+1) ≪ 2^53 — exact through TopK's double ord
    TopK.perKey(scored, key = "qid", ord = "rrf", tiebreak = "doc_id",
        payload = "doc_id", k = k)
      .select(col("qid"), col("doc_id"),
        col("rrf").cast("long").as("rrf"), col("rn"))
  }
}
