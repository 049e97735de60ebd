package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's Tweet-domain alert detectors (SQ2-SQ4, SQ14),
  * re-expressed over the canonical [[Tweet]] schema. All are stateless
  * filter+project streams (reference T7) emitting the
  * [[OutputContracts.Alert]] shape (+ user_friends where the reference
  * includes it); they compose with `StreamOps.alertUnion` and
  * `StreamOps.windowedMetrics` into the SQ5 topology.
  *
  * Thresholds are the reference constants (job1_bots.py:42-46,
  * job5.py:89-90). Alert reasons mirror the reference's concatenated
  * Spanish strings verbatim — they are part of the output contract.
  */
object TweetAlerts {

  val FriendsThreshold = 2000
  val FollowersLowThreshold = 100
  val NewAccountDays = 30
  val DescriptionMinLength = 5
  val HighReachThreshold = 10000

  private val baseCols = Seq(
    "crypto_type", "alert_type", "alert_priority", "alert_reason",
    "user_name", "user_followers", "user_verified", "text", "timestamp")

  /** SQ2: friends/followers imbalance (job1_bots.py:186-214). */
  def imbalanceAlerts(tweets: DataFrame): DataFrame =
    tweets
      .where(col("user_friends") >= FriendsThreshold
        && col("user_followers") <= FollowersLowThreshold)
      .withColumn("alert_type", lit("FRIENDS_FOLLOWERS_IMBALANCE"))
      .withColumn("alert_priority", lit("MEDIUM"))
      .withColumn("alert_reason", concat(
        lit("Relación extraña friends/followers para "), col("user_name"),
        lit(" (friends: "), col("user_friends").cast("string"),
        lit(", followers: "), col("user_followers").cast("string"),
        lit(")")))
      .select((baseCols.take(6) ++ Seq("user_friends")
        ++ baseCols.drop(6)).map(col): _*)

  /** SQ3: empty/short profile description (job1_bots.py:216-242).
    * Null-description rows pass the filter (isNull branch); the reason
    * length uses coalesce to 0, exactly as the reference. */
  def emptyDescriptionAlerts(tweets: DataFrame): DataFrame =
    tweets
      .where(col("user_description").isNull
        || length(trim(col("user_description"))) < DescriptionMinLength)
      .withColumn("alert_type", lit("EMPTY_PROFILE"))
      .withColumn("alert_priority", lit("LOW"))
      .withColumn("alert_reason", concat(
        lit("Perfil vacío/corto para "), col("user_name"),
        lit(" (desc length: "),
        length(coalesce(col("user_description"), lit(""))).cast("string"),
        lit(")")))
      .select((baseCols.take(6) ++ Seq("user_friends")
        ++ baseCols.drop(6)).map(col): _*)

  /** SQ4: account younger than 30 days (job1_bots.py:244-269). The
    * reference computes age against `current_date()` — non-
    * deterministic across runs (T10); `now` is therefore injected
    * (tests pass a literal date; production passes current_date()). */
  def newAccountAlerts(tweets: DataFrame,
      now: Column = current_date()): DataFrame =
    tweets
      .where(col("user_created_dt").isNotNull)
      .withColumn("account_age_days",
        datediff(now, to_date(col("user_created_dt"))))
      .where(col("account_age_days") < NewAccountDays)
      .withColumn("alert_type", lit("NEW_ACCOUNT_SUSPICIOUS"))
      .withColumn("alert_priority", lit("MEDIUM"))
      .withColumn("alert_reason", concat(
        lit("Cuenta nueva ("), col("account_age_days").cast("string"),
        lit(" días) - "), col("user_name")))
      .select((baseCols.take(6) ++ Seq("user_friends")
        ++ baseCols.drop(6)).map(col): _*)

  /** SQ14a: viral tweets — is_retweet OR text contains "RT @"
    * (job5.py:139-168). */
  def viralAlerts(tweets: DataFrame): DataFrame =
    tweets
      .where(col("is_retweet") === true || col("text").contains("RT @"))
      .withColumn("alert_type", lit("VIRAL_TWEET"))
      .withColumn("alert_priority", lit("HIGH"))
      .withColumn("alert_reason", concat(
        lit("["), upper(col("crypto_type")),
        lit("] Tweet con potencial viral - Usuario: "), col("user_name"),
        lit(" | Seguidores: "), col("user_followers").cast("string")))
      .select(baseCols.map(col): _*)

  /** SQ14b: VIP / high-reach users with the 3-tier priority ladder —
    * verified beats the 50k-follower tier, order matters
    * (job5.py:171-205). */
  def vipAlerts(tweets: DataFrame): DataFrame =
    tweets
      .where(col("user_followers") >= HighReachThreshold)
      .withColumn("alert_type", lit("HIGH_REACH_USER"))
      .withColumn("alert_priority",
        when(col("user_verified") === true, "CRITICAL")
          .when(col("user_followers") >= 50000, "HIGH")
          .otherwise("MEDIUM"))
      .withColumn("alert_reason", concat(
        lit("["), upper(col("crypto_type")),
        lit("] Usuario VIP activo - "), col("user_name"),
        lit(" ("), col("user_followers").cast("string"),
        lit(" seguidores) - Verificado: "),
        col("user_verified").cast("string")))
      .select(baseCols.map(col): _*)

  /** Event-time + parsed account-creation promotion for a decoded
    * Tweet frame (job1_bots.py:139-140). */
  def promoted(tweets: DataFrame): DataFrame =
    tweets
      .withColumn("timestamp", to_timestamp(col("timestamp")))
      .withColumn("user_created_dt", to_timestamp(col("user_created")))

  /** SQ1: high-frequency posting detector — 60 s tumbling count per
    * (user_name, crypto_type) with the reference's alert shape
    * (job1_bots.py:144-184). The reference's `first()` carries are
    * replaced by deterministic `min()` (A6 rule); the output
    * `timestamp` is `window_time` (not the reference's bare
    * window.end) so the alert stream keeps its event-time metadata
    * and can chain into the SQ5 metrics agg (T9). */
  def highFrequencyTweetAlerts(tweets: DataFrame,
      threshold: Long = 3): DataFrame =
    tweets
      .groupBy(window(col("timestamp"), "60 seconds"),
        col("user_name"), col("crypto_type"))
      .agg(
        count(lit(1)).as("tweet_count"),
        min(col("user_followers")).as("user_followers"),
        min(col("user_friends")).as("user_friends"),
        min(col("user_verified")).as("user_verified"),
        min(col("text")).as("text"))
      .where(col("tweet_count") >= threshold)
      .withColumn("alert_type", lit("HIGH_FREQUENCY_POSTING"))
      .withColumn("alert_priority", lit("HIGH"))
      .withColumn("alert_reason", concat(
        lit("Usuario posteando mucho: "), col("user_name"), lit(" -> "),
        col("tweet_count").cast("string"), lit(" tweets en 60s")))
      .withColumn("timestamp", window_time(col("window")))
      .select(col("crypto_type"), col("alert_type"), col("alert_priority"),
        col("alert_reason"), col("user_name"), col("user_followers"),
        col("user_friends"), col("user_verified"), col("text"),
        col("timestamp"))

  /** SQ10: per-tweet sentiment classification — the reference's UDF
    * (job3_sentiment.py:154-243) as the pure-Column
    * `TextFunctions.sentimentStruct`, in the reference's alert
    * projection (job3_sentiment.py:245-272). `alert_reason` (a string
    * the UDF composes for display) is omitted; all scoring fields are
    * carried. */
  def sentimentAlerts(tweets: DataFrame): DataFrame =
    tweets
      .withColumn("sent",
        graft.functions.TextFunctions.sentimentStruct(col("text")))
      .select(
        col("crypto_type"),
        col("sent.sentiment_type").as("sentiment_type"),
        col("sent.alert_priority").as("alert_priority"),
        col("user_name"), col("user_followers"), col("user_verified"),
        col("text"), col("timestamp"),
        col("sent.score").as("sentiment_score"),
        col("sent.pos_emoji_count").as("pos_emoji_count"),
        col("sent.neg_emoji_count").as("neg_emoji_count"))

  /** SQ11: 5 m/1 m sentiment metrics incl. avg(sentiment_score)
    * (job3_sentiment.py:316-340). Input must carry the source
    * watermark. */
  def sentimentMetrics(alerts: DataFrame): DataFrame =
    alerts
      .groupBy(window(col("timestamp"), "5 minutes", "1 minute"),
        col("crypto_type"), col("sentiment_type"), col("alert_priority"))
      .agg(
        count(lit(1)).as("total_alerts"),
        approx_count_distinct(col("user_name")).as("unique_users"),
        avg(col("sentiment_score")).as("avg_score"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("crypto_type"), col("sentiment_type"), col("alert_priority"),
        col("total_alerts"), col("unique_users"), col("avg_score"))

  /** The reference's job1 topology END-TO-END (SQ1-SQ5): decode the
    * 15-field envelope → promote event time → ONE source watermark →
    * stateful SQ1 ∪ stateless SQ2-SQ4 via unionByName (U2) → 5 m/1 m
    * sliding windowed metrics (SQ5: count + HLL++ distinct users),
    * append mode — the chained-stateful T9 shape in the Tweet domain
    * (job1_bots.py:310-333, 345-418). `now` is the injected clock for
    * the SQ4 account-age detector (T10). */
  def botDetectionMetrics(raw: DataFrame,
      now: Column = current_date()): DataFrame = {
    val tweets = promoted(
      StreamOps.decodeJsonEnvelope(raw, Tweet.schema))
    val src = tweets.withWatermark("timestamp", StreamOps.WatermarkDelay)
    val alerts = StreamOps.alertUnion(Seq(
      highFrequencyTweetAlerts(src),
      imbalanceAlerts(src),
      emptyDescriptionAlerts(src),
      newAccountAlerts(src, now)))
    alerts
      .groupBy(window(col("timestamp"), "5 minutes", "1 minute"),
        col("alert_type"))
      .agg(
        count(lit(1)).as("total_alerts"),
        approx_count_distinct(col("user_name")).as("unique_users"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("alert_type"), col("total_alerts"), col("unique_users"))
  }
}
