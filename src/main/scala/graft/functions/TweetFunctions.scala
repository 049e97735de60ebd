package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reference-domain parity functions: the tweet-analytics Column logic
  * the reference implements as per-job filter chains, re-expressed as
  * reusable (and codegen'd) Column builders. Semantics are mirrored
  * bug-for-bug — including the two DIVERGENT location cleaners, which
  * the reference maintains separately in its streaming and batch
  * pipelines (SURVEY §5.5 #6 says: resist the urge to unify).
  */
object TweetFunctions {

  // ---- location cleaning, streaming variant ----
  // reference/streaming/job4_locationsreal_time.py:132-162

  /** The streaming cleaner's 20-entry upper-case blacklist
    * (job4_locationsreal_time.py:37-42). Exact-equality matches only. */
  val StreamingLocationBlacklist: Seq[String] = Seq(
    "WORLDWIDE", "EVERYWHERE", "GLOBAL", "NOWHERE", "INTERNET",
    "MOON", "MARS", "EARTH", "SPACE", "ONLINE", "VIRTUAL",
    "CRYPTO", "BITCOIN", "ETHEREUM", "BLOCKCHAIN", "WEB3",
    "METAVERSE", "NFT", "DEFI", "WORLD", "UNIVERSE")

  /** Streaming location cleaner: emoji-strip THEN trim+UPPER-case;
    * keeps len>2, drops exact blacklist hits and HTTP/WWW./# noise.
    * Returns the cleaned value, or null when the location is filtered
    * (callers `.where(isNotNull)` — the fused form of the reference's
    * five chained filters, job4_locationsreal_time.py:136-150). */
  def cleanLocationStreaming(c: Column): Column = {
    val cleaned = upper(trim(regexp_replace(c, "[📍🌍🌎🌏🗺️]", "")))
    when(c.isNotNull && c =!= "" && c =!= "Unknown"
      && length(cleaned) > 2
      && !cleaned.isInCollection(StreamingLocationBlacklist)
      && !cleaned.contains("HTTP")
      && !cleaned.contains("WWW.")
      && !cleaned.startsWith("#"),
      cleaned)
  }

  // ---- location cleaning, batch variant ----
  // reference/batch/job1_locations.py:68-93

  /** The batch cleaner's 26 lower-case substring keywords
    * (job1_locations.py:69-74). Substring CONTAINMENT, not equality —
    * the second deliberate divergence from the streaming variant. */
  val BatchLocationKeywords: Seq[String] = Seq(
    "bitcoin", "btc", "eth", "ethereum", "crypto", "nft", "metaverse",
    "blockchain", "moon", "worldwide", "global", "earth", "online",
    "internet", "web", "digital", "virtual", "defi", "hodl", "lambo",
    "satoshi", "lightning", "network", "exchange", "trading", "wallet")

  /** Batch location cleaner: trim+LOWER-case THEN emoji-strip (note
    * the opposite order and different emoji set vs streaming), keeps
    * 3<len<100, drops [-/#-prefixes, date/time/numeric shapes, any of
    * the 26 keyword substrings, and http/www. noise
    * (job1_locations.py:75-93). Null when filtered. */
  def cleanLocationBatch(c: Column): Column = {
    val cleaned = regexp_replace(trim(lower(c)), "[📍🌍🌎🌏🚀💎]", "")
    val keywordFree =
      BatchLocationKeywords.map(k => !cleaned.contains(k)).reduce(_ && _)
    when(c.isNotNull && c =!= "" && c =!= "Unknown"
      && !cleaned.startsWith("[")
      && !cleaned.startsWith("#")
      && !cleaned.rlike("^\\d{4}-\\d{2}-\\d{2}")
      && !cleaned.rlike("^\\d{2}:\\d{2}:\\d{2}")
      && length(cleaned) > 3 && length(cleaned) < 100
      && keywordFree
      && !cleaned.rlike("^[0-9]+$")
      && !cleaned.contains("http")
      && !cleaned.contains("www."),
      cleaned)
  }

  // ---- spam flags + composite score ----
  // reference/batch/job4_spam.py:24-29, 81-199

  val SpamKeywords: Seq[String] = Seq(
    "airdrop", "giveaway", "free", "join", "pump", "profit",
    "100x", "moonshot", "win", "offer", "exclusive", "bonus",
    "referral", "affiliate", "discount", "promo", "buy now",
    "limited time", "act now", "click here", "sign up")

  /** URL flag (job4_spam.py:82-87). */
  def containsUrl(text: Column): Column = text.rlike("http[s]?://")

  /** Keyword-spam flag: the reference's per-keyword `(?i)` alternation
    * joined verbatim (job4_spam.py:89-94). */
  def isSpamKeyword(text: Column): Column =
    text.rlike(SpamKeywords.map(k => s"(?i)$k").mkString("|"))

  /** The reference's word count — bare `split(\s+)` size, NOT the
    * engine's trimming tokenizer (job4_spam.py:99-101). */
  def spamWordCount(text: Column): Column =
    size(split(text, "\\s+"))

  /** Short-tweet flag: <= 5 words (job4_spam.py:102-105). */
  def isVeryShort(text: Column): Column = spamWordCount(text) <= 5

  /** Composite 0-3 spam score: one point per raised flag
    * (job4_spam.py:179-186). High-risk = score >= 2. */
  def spamScore(text: Column): Column =
    (when(containsUrl(text), 1).otherwise(0)
      + when(isSpamKeyword(text), 1).otherwise(0)
      + when(isVeryShort(text), 1).otherwise(0))

  // ---- device / bot categorization ----
  // reference/batch/job2_historico.py:23-28, 145-158

  /** The reference's bot source list, joined UNescaped into the regex
    * exactly as the reference does — "dlvr.it"'s dot is a wildcard
    * there too (bug-compatible). */
  val KnownBots: Seq[String] = Seq(
    "IFTTT", "dlvr.it", "vaiotapi", "TweetDeck", "ContentStudio",
    "Microsoft Power Platform", "abnormal_crypto_app", "exchangewhales",
    "Hootsuite", "Buffer", "ClankApp", "Zapier", "TwinyBots",
    "Bot", "bot", "Robot", "API", "Feed")

  def isBotSource(source: Column): Column =
    lower(source).rlike(KnownBots.map(_.toLowerCase).mkString("|"))

  /** The device when-ladder, order preserved: bots win over platform
    * buckets (job2_historico.py:147-158). */
  def deviceCategory(source: Column): Column =
    when(isBotSource(source), "Bots y Automatizacion")
      .when(source.contains("Web App"), "PC Web Browser")
      .when(source.contains("Android"), "Android")
      .when(source.contains("iPhone") || source.contains("iPad")
        || source.contains("Mac"), "Apple iOS Mac")
      .otherwise("Otras Apps")

  // ---- mention extraction ----
  // reference/batch/job5_menciones.py:75-78

  /** `@mention` handles (capture group 1, @ stripped) with the
    * reference's exact pattern. */
  def extractMentions(text: Column): Column =
    regexp_extract_all(text, lit("@([A-Za-z0-9_]+)"), lit(1))
}
