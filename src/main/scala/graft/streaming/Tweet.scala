package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** The canonical 15-field tweet envelope (SURVEY §1.2). The reference
  * copy-pastes this StructType into every streaming job
  * (job1_bots.py:108-125, job2.py, job3_sentiment.py,
  * job4_locationsreal_time.py:97-114, job5.py); here it is defined
  * once and DERIVED from the case class, so the typed `Dataset[Tweet]`
  * view and the JSON-decode schema can never drift apart. All fields
  * are nullable, as in the reference's declaration (numerics/booleans
  * as Option). */
final case class Tweet(
    crypto_type: String,
    user_name: String,
    user_location: String,
    user_description: String,
    user_created: String,
    user_followers: Option[Int],
    user_friends: Option[Int],
    user_favourites: Option[Int],
    user_verified: Option[Boolean],
    date: String,
    text: String,
    hashtags: String,
    source: String,
    is_retweet: Option[Boolean],
    timestamp: String)

object Tweet {
  /** The declared envelope schema — pass to
    * [[StreamOps.decodeJsonEnvelope]]. */
  val schema: StructType = Encoders.product[Tweet].schema

  /** Positional column order of the producers' headerless CSV (13
    * columns — no crypto_type/timestamp, which the producer injects;
    * job4_spam.py:34-38, job1_locations.py headerless read). Feed to
    * `Sources.headerlessCsv`. */
  val csvColumns: Seq[String] = Seq(
    "user_name", "user_location", "user_description", "user_created",
    "user_followers", "user_friends", "user_favourites", "user_verified",
    "date", "text", "hashtags", "source", "is_retweet")
}

/** K4 output contracts: the index-document schemas the reference
  * declares as OpenSearch mappings — its only explicit output schemas
  * (FIXTURES.md §3). Each case class is a golden-row shape; `schema`
  * vals give the StructType for sink bootstrap / validation. */
object OutputContracts {

  /** Bot/viral/VIP alert (job1_bots.py:59-75, select :171-182;
    * job5.py:44-59). */
  final case class Alert(
      crypto_type: String, alert_type: String, alert_priority: String,
      alert_reason: String, user_name: String,
      user_followers: Option[Int], user_verified: Option[Boolean],
      text: String, timestamp: String)

  /** Windowed alert metrics (job1_bots.py:77-91, 322-331). */
  final case class WindowedAlertMetrics(
      window_start: String, window_end: String, crypto_type: String,
      alert_type: String, alert_priority: String, total_alerts: Long,
      unique_users: Long, metric_type: String, timestamp: String)

  /** Trending hashtag row (job2.py:43-71, 183-197, 248-261). */
  final case class TrendingHashtag(
      window_start: String, window_end: String, crypto_type: String,
      hashtag: String, count: Long, rank: Option[Int],
      percentage: Option[Double])

  /** Hashtag usage metrics (job2.py:73-91, 284-306). */
  final case class HashtagUsageMetrics(
      window_start: String, window_end: String, crypto_type: String,
      total_tweets: Long, total_hashtags: Long, unique_hashtags: Long,
      avg_hashtags_per_tweet: Double)

  /** Sentiment alert (job3_sentiment.py:70-88, 257-270). */
  final case class SentimentAlert(
      crypto_type: String, sentiment_type: String, alert_priority: String,
      alert_reason: String, user_name: String,
      user_followers: Option[Int], user_verified: Option[Boolean],
      text: String, timestamp: String, sentiment_score: Float,
      pos_emoji_count: Int, neg_emoji_count: Int)

  /** Cleaned location row (job4_locationsreal_time.py:54-86, 151-160). */
  final case class LocationRow(
      crypto_type: String, location_clean: String,
      original_location: String, user_name: String,
      user_followers: Option[Int], user_verified: Option[Boolean],
      tweet_text: String, timestamp: String)

  val alertSchema: StructType = Encoders.product[Alert].schema
  val windowedAlertMetricsSchema: StructType =
    Encoders.product[WindowedAlertMetrics].schema
  val trendingHashtagSchema: StructType =
    Encoders.product[TrendingHashtag].schema
  val hashtagUsageMetricsSchema: StructType =
    Encoders.product[HashtagUsageMetrics].schema
  val sentimentAlertSchema: StructType =
    Encoders.product[SentimentAlert].schema
  val locationRowSchema: StructType = Encoders.product[LocationRow].schema
}
