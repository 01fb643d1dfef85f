package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fingerprint is the exact polynomial rolling hash") {
    // h("ab") = ((0*31+97) % p)*31 + 98 = 97*31+98 = 3105
    val fp = Seq("ab").toDF("t").select(fingerprint(col("t"))).as[Long].head()
    assert(fp == 3105L)
  }

  test("fingerprint distinguishes permutations (order-sensitive)") {
    val fps = Seq("ab", "ba").toDF("t")
      .select(fingerprint(col("t"))).as[Long].collect()
    assert(fps(0) != fps(1))
  }

  test("shingles produce k-grams and handle short texts") {
    val s = Seq("a b c d", "a b").toDF("t")
      .select(shingles(words(col("t")), 3)).as[Seq[String]].collect()
    assert(s(0) == Seq("a b c", "b c d"))
    assert(s(1) == Seq.empty)
  }

  test("langId scores marker words with deterministic tie-break") {
    val preds = Seq(
      "the cat and the dog",       // en markers dominate
      "el la y de la casa",        // es markers dominate
      "xyz qrs tuv"                // no markers: tie -> first lang (en)
    ).toDF("t").select(langId(words(col("t")))).as[String].collect()
    assert(preds.toSeq == Seq("en", "es", "en"))
  }

  test("bpe-ish token count splits letters, digits, punctuation") {
    val n = Seq("hello, world 42").toDF("t")
      .select(bpeTokenCount(col("t"))).as[Long].head()
    // hello | , | world | 4 | 2
    assert(n == 5L)
  }
}
