package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for the training-data pipeline — all
  * built from codegen'd `org.apache.spark.sql.functions` (no UDFs, so they
  * stay inside whole-stage codegen and push through Catalyst untouched).
  * Each has an exact DuckDB twin used by the oracle queries. */
object TextFunctions {

  /** Whitespace tokenization (single-space corpus). */
  def words(text: Column): Column = split(text, " ")

  /** Distinct word k-shingles, joined with single spaces. Null-safe for
    * texts shorter than k words (empty array). */
  def shingles(ws: Column, k: Int): Column =
    when(size(ws) >= k,
      array_distinct(transform(sequence(lit(1), size(ws) - (k - 1)),
        i => concat_ws(" ",
          (0 until k).map(j => element_at(ws, i + j)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Polynomial rolling hash over the character stream:
    * h := (h * 31 + ascii(c)) mod 1e9+7. Exact 64-bit integer arithmetic —
    * the DuckDB twin (list_reduce) produces the identical value. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)

  /** Count of words from `markers` present in the token array. */
  def markerScore(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(markers))).cast("long")

  /** n-gram-heuristic language id: argmax of per-language marker-word
    * scores, ties broken by the fixed language order. A real corpus would
    * use character n-gram profiles; the synthetic corpus shares one
    * vocabulary, so the heuristic's value is its deterministic, oracle-
    * checkable machinery. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "les", "et", "un"),
    "zh" -> Seq("ni", "hao", "shi", "de"))

  def langId(ws: Column): Column = {
    val scores = LangMarkers.map { case (l, m) => l -> markerScore(ws, m) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldLeft(lit(null).cast("string")) { case (acc, (l, s)) =>
      when(acc.isNotNull, acc).when(s === best, lit(l)).otherwise(acc)
    }
  }

  /** Positional (non-deduplicated) k-shingles — winnowing needs the
    * k-gram sequence, not the set. */
  def positionalShingles(ws: Column, k: Int): Column =
    when(size(ws) >= k,
      transform(sequence(lit(1), size(ws) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(ws, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** The [[fingerprint]] polynomial hash as a lambda-friendly builder. */
  def polyHash(s: Column): Column =
    aggregate(transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L), (acc, c) => (acc * 31 + c) % 1000000007L)

  /** Winnowing (local minima) document fingerprints: hash every positional
    * k-shingle, slide a window of `w` hashes, keep each window's minimum,
    * dedup. The standard MOSS-style selection — guarantees any shared run
    * of ≥ w+k-1 words yields a shared fingerprint. `hs` must be a
    * materialized column of shingle hashes (see [[shingles]] re: inline
    * re-evaluation). */
  def winnowFingerprints(hs: Column, w: Int): Column =
    when(size(hs) >= w,
      array_distinct(transform(sequence(lit(1), size(hs) - (w - 1)),
        j => array_min(slice(hs, j, lit(w))))))
      .otherwise(array().cast("array<bigint>"))

  /** BPE-ish regex token count: letter runs, single digits, single
    * punctuation marks. Same RE2-compatible pattern in the DuckDB twin. */
  val BpeTokenPattern = "[a-z]+|[0-9]|[^a-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0))).cast("long")
}
