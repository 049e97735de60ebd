package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's five streaming job topologies (SURVEY §2.12
  * SQ1-SQ14), re-expressed as compositions of StreamOps + Sinks. A
  * reference user starts the same fan-out (alerts + windowed metrics,
  * parquet + reporting sinks, per-query checkpoints) from one call.
  *
  * `events` is any decoded event stream (Kafka via [[KafkaSource]],
  * files, or MemoryStream in tests) — topologies never know the
  * source. Each `start*` returns the live queries; callers block via
  * `Sinks.awaitAny`.
  */
object StreamingJobs {

  /** job1-analog (bot detection): stateful high-frequency detector ∪
    * stateless detectors → alert sink; chained re-aggregated metrics
    * (T9) → metrics sink.
    *
    * Takes a source FACTORY: every started query instantiates its own
    * source plan — exactly how the reference topology behaves (each
    * query maintains independent Kafka offsets, SURVEY T12), and
    * required for single-consumer test sources like MemoryStream. */
  def startDetection(spark: SparkSession, events: () => DataFrame,
      outDir: String, trigger: String = "60 seconds")
      : Seq[StreamingQuery] = {
    def alertsOf(src: DataFrame) = StreamOps.alertUnion(Seq(
      StreamOps.highFrequencyAlerts(src),
      StreamOps.highValueAlerts(src),
      StreamOps.errorAlerts(src)))
    val alerts = alertsOf(StreamOps.watermarked(events()))
      .withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    val metrics = StreamOps.windowedMetrics(
      alertsOf(StreamOps.watermarked(events())))
    Seq(
      Sinks.parquetAppend(alerts,
        s"$outDir/alerts", s"$outDir/chk/alerts", trigger).start(),
      Sinks.parquetAppend(metrics,
        s"$outDir/metrics", s"$outDir/chk/metrics", trigger).start())
  }

  /** The TWEET-domain jobs from the raw 15-field envelope: job1's
    * chained bot-detection metrics (SQ1-SQ5), job5's viral/VIP alert
    * stream (SQ14), and job3's sentiment metrics (SQ10-SQ11) — each
    * query with its own source plan and checkpoint (T11/T12). */
  def startTweetPipelines(spark: SparkSession, raw: () => DataFrame,
      outDir: String, trigger: String = "60 seconds")
      : Seq[StreamingQuery] = {
    def tweetsOf(df: DataFrame) =
      TweetAlerts.promoted(StreamOps.decodeJsonEnvelope(df, Tweet.schema))
    val bot = TweetAlerts.botDetectionMetrics(raw())
    val viralVip = StreamOps.alertUnion(Seq(
      TweetAlerts.viralAlerts(tweetsOf(raw())),
      TweetAlerts.vipAlerts(tweetsOf(raw()))))
    val sentiment = TweetAlerts.sentimentMetrics(
      TweetAlerts.sentimentAlerts(
        tweetsOf(raw())
          .withWatermark("timestamp", StreamOps.WatermarkDelay)))
    Seq(
      Sinks.parquetAppend(bot,
        s"$outDir/bot_metrics", s"$outDir/chk/bot_metrics", trigger).start(),
      Sinks.parquetAppend(viralVip,
        s"$outDir/viral_vip", s"$outDir/chk/viral_vip", trigger).start(),
      Sinks.parquetAppend(sentiment,
        s"$outDir/sentiment", s"$outDir/chk/sentiment", trigger).start())
  }

  /** job4-analog (session tracking): session-window metrics. */
  def startSessions(spark: SparkSession, events: DataFrame,
      outDir: String, trigger: String = "60 seconds")
      : Seq[StreamingQuery] = {
    val metrics = StreamOps.sessionMetrics(StreamOps.watermarked(events))
    Seq(Sinks.parquetAppend(metrics,
      s"$outDir/sessions", s"$outDir/chk/sessions", trigger).start())
  }

  /** job5-analog (stream hygiene): stateful dedup pass-through. */
  def startDedup(spark: SparkSession, events: DataFrame,
      outDir: String, trigger: String = "60 seconds")
      : Seq[StreamingQuery] = {
    val deduped = StreamOps.dedupStream(
      StreamOps.watermarked(events), spark)
    Seq(Sinks.parquetAppend(deduped,
      s"$outDir/deduped", s"$outDir/chk/deduped", trigger).start())
  }
}
