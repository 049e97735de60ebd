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
}
