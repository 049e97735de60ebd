package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Reference-parity semantics (SURVEY §7.5 #3-#4, §2.10): the
  * stringified-list parser bug-for-bug, codepoint-correct emoji strip,
  * and the full sentiment scoring/ladder. */
class ParityFunctionsSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def parse(s: String): Seq[String] =
    Seq(Option(s)).toDF("h")
      .select(parsePseudoList($"h")).as[Seq[String]].head()

  test("pseudo-list parser: normal, empty, null, quirks preserved") {
    assert(parse("['BTC', 'moon']") === Seq("BTC", "moon"))
    assert(parse("['solo']") === Seq("solo"))
    assert(parse("[]") === Seq.empty)
    assert(parse("") === Seq.empty)
    assert(parse(null) === Seq.empty)
    // reference quirk: strip-then-split breaks embedded ", "
    assert(parse("['a, b']") === Seq("a", "b"))
    // reference quirk: quotes/brackets stripped anywhere
    assert(parse("['it's']") === Seq("its"))
  }

  test("emoji strip: supplementary-plane codepoints removed, text kept") {
    val out = Seq("📍 Lima, Peru 🚀", "plain text").toDF("t")
      .select(stripEmoji($"t")).as[String].collect()
    assert(out(0) === " Lima, Peru ")
    assert(out(1) === "plain text")
  }

  private def score(s: String): Int =
    Seq(s).toDF("t").select(sentimentScoreFull($"t")).as[Int].head()
  private def stype(s: String): String =
    Seq(s).toDF("t").select(sentimentStruct($"t").getField("sentiment_type"))
      .as[String].head()

  test("sentiment scoring: emoji ±2, keywords ±1, burst penalties") {
    assert(score("to the moon 🚀") === 2)       // one pos emoji
    assert(score("fast 🚀") === 3)              // emoji +2, keyword +1
    assert(score("slow bear 😢") === -3)        // neg emoji -2, keyword -1
    assert(score("wow!!!!") === -3)             // >3 '!' burst
    assert(score("THIS IS SHOUTING") === -2)    // caps burst
    assert(score("neutral words only") === 0)
  }

  test("sentiment ladder: positives checked first (order dependency)") {
    // both strong signals present -> positive wins, as in the reference
    assert(stype("🚀🚀 😢😢") === "strong_positive")
    assert(stype("🚀 fast") === "positive")      // score 3
    assert(stype("😢😢") === "strong_negative")
    assert(stype("slow") === "negative")
    assert(stype("nothing here") === "neutral")
  }

  test("pseudo-list parser round-trips arbitrary simple-token lists (property)") {
    import org.scalacheck.Gen
    val token = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val lists = Gen.listOfN(40, Gen.listOf(token))
    val sample = lists.sample.getOrElse(List(List("BTC")))
    val formatted = sample.map { l =>
      if (l.isEmpty) "[]" else l.map(t => s"'$t'").mkString("[", ", ", "]")
    }
    val parsed = formatted.toDF("h")
      .select(parsePseudoList($"h")).as[Seq[String]].collect().toList
    assert(parsed === sample.map(_.toSeq))
  }

  test("sentiment struct carries the reference's output contract") {
    val r = Seq("🚀🚀 fast").toDF("t").select(sentimentStruct($"t").as("s"))
      .select("s.*").head()
    assert(r.getString(0) === "strong_positive")
    assert(r.getString(1) === "high")
    assert(r.getFloat(2) === 5.0f)
    assert(r.getInt(3) === 2 && r.getInt(4) === 0)
  }
}
