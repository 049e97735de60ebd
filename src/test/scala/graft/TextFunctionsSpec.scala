package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def evalTokens(s: String): Seq[String] =
    Seq(s).toDF("text").select(tokens($"text")).as[Seq[String]].head()

  test("tokens: lowercase, whitespace split, empties dropped") {
    assert(evalTokens("The  Fast\tkey ") === Seq("the", "fast", "key"))
    assert(evalTokens("") === Seq.empty)
    assert(evalTokens("   ") === Seq.empty)
    assert(evalTokens("one") === Seq("one"))
  }

  test("bpeTokens: space-glued runs, punctuation runs, whitespace runs") {
    def toks(s: String): Seq[String] =
      Seq(s).toDF("text").select(bpeTokens($"text")).as[Seq[String]].head()
    assert(toks("Hello world") === Seq("Hello", " world"))
    assert(toks("a1b") === Seq("a", "1", "b"))
    assert(toks("don't stop") === Seq("don", "'", "t", " stop"))
    assert(toks("x  y") === Seq("x", "  ", "y")) // double space: one greedy ws run
    assert(toks("42!!") === Seq("42", "!!"))
    assert(toks("") === Seq.empty)
  }

  test("native tokenize matches the Column HOF formulation") {
    val texts = Seq("The  Fast\tkey ", "", " a  b c ", "x", "A a A b",
      "multi   space\t\ttabs").toDF("text")
    val native = texts.select(tokens($"text").as("t"))
    val hof = texts.select(
      filter(split(lower(trim($"text")), "\\s+"), t => length(t) > 0).as("t"))
    assert(native.as[Seq[String]].collect().toSeq ===
      hof.as[Seq[String]].collect().toSeq)
  }

  test("native wordShingles matches distinct HOF shingles") {
    val texts = Seq("a b c d e", "a b", "a b c", "x x x x",
      "The quick brown fox jumps").toDF("text")
    val native = texts.select(
      graft.expressions.TextExpressions.wordShingles($"text", 3).as("s"))
    val hof = texts.select(
      array_distinct(shingles(tokens($"text"), 3)).as("s"))
    assert(native.as[Seq[String]].collect().toSeq ===
      hof.as[Seq[String]].collect().toSeq)
  }

  test("shingles: fewer tokens than n gives empty array") {
    val out = Seq("a b").toDF("text")
      .select(graft.expressions.TextExpressions.wordShingles($"text", 3))
      .as[Seq[String]].head()
    assert(out === Seq.empty)
  }

  test("sentiment ladder: positives checked first, order matters") {
    def classify(score: Int): String =
      Seq(score).toDF("s").select(sentimentType($"s")).as[String].head()
    assert(classify(4) === "strong_positive")
    assert(classify(2) === "positive")
    assert(classify(0) === "neutral")
    assert(classify(-2) === "negative")
    assert(classify(-4) === "strong_negative")
  }

  test("sentiment score: +2 per positive hit, -2 per negative hit") {
    val score = Seq("fast big slow nothing").toDF("text")
      .select(sentimentScore(tokens($"text"))).as[Int].head()
    assert(score === 2) // 2 pos * 2 - 1 neg * 2
  }

  test("langGuess: argmax with earlier-profile tie-break; unknown on no hits") {
    def guess(s: String): String =
      Seq(s).toDF("text").select(langGuess(tokens($"text"))).as[String].head()
    assert(guess("the a fast") === "en")
    assert(guess("key order table") === "es")
    assert(guess("zzz qqq") === "unknown")
    // one hit each for en ("the") and es ("key") → tie → earlier profile
    assert(guess("the key") === "en")
  }

  test("fingerprint: whitespace-insensitive, case-insensitive") {
    val fps = Seq("The fast  key", "the FAST key", "the fast key!")
      .toDF("text").select(fingerprint($"text")).as[String].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("qualityScore: in [0,1], empty doc scores stopword-free baseline") {
    val qs = Seq("the the the the", "alpha beta gamma delta", "")
      .toDF("text").select(qualityScore(tokens($"text"))).as[Double].collect()
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
    assert(qs(1) > qs(0)) // diverse non-stopword text scores higher
  }

  test("hamming_dist: codepoint-safe on supplementary-plane input") {
    import graft.expressions.TextExpressions.hammingDist
    // '𝄞' is outside the BMP: numChars 1 but java length 2 — a
    // UTF-16-unit loop would walk past 'x' and throw at runtime
    val out = Seq(("𝄞", "x"), ("𝄞a", "𝄞b"), ("ab", "ab"), ("abc", "ab"))
      .toDF("a", "b")
      .select(hammingDist($"a", $"b").as("d"))
      .collect()
    assert(out(0).getInt(0) === 1)
    assert(out(1).getInt(0) === 1)
    assert(out(2).getInt(0) === 0)
    assert(out(3).isNullAt(0)) // unequal codepoint lengths → null
  }
  test("redactPii: emails, urls, long digit runs; shorter spans kept") {
    val out = Seq(
      "mail me at jo.an+x@ex-1.example.com today",
      "docs at https://docs.example.org/a_b/c-d and more",
      "card 12345678 pin 12345 ok",
      "plain text with no pii at all"
    ).toDF("text").select(redactPii($"text")).as[String].collect()
    assert(out(0) === "mail me at <EMAIL> today")
    assert(out(1) === "docs at <URL> and more")
    assert(out(2) === "card <NUM> pin 12345 ok") // 5 digits kept
    assert(out(3) === "plain text with no pii at all")
  }
}
