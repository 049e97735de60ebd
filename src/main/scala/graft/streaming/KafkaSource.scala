package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1: Kafka stream source builder (reference: subscribe to
  * `bitcoin-tweets,ethereum-tweets`, startingOffsets=latest —
  * job2.py:128-142).
  *
  * Requires the spark-sql-kafka connector on the cluster classpath
  * (not shipped in this image). The builder chain itself IS testable:
  * [[GraftKafkaTestSource]] (`format = "graft-kafka-test"`) honors
  * the same option contract — subscribe / startingOffsets /
  * maxOffsetsPerTrigger — over an in-JVM topic registry with
  * Kafka-schema rows, so StreamingSpec drives this exact builder +
  * decode → alert end-to-end; against a real cluster only the format
  * string differs.
  *
  * Scale guards the reference lacks: `maxOffsetsPerTrigger` bounds
  * micro-batch size (SURVEY §4), `minPartitions` lets a 1000-executor
  * cluster split hot topic partitions.
  */
object KafkaSource {
  def stream(spark: SparkSession, bootstrap: String, topics: Seq[String],
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = Some(1000000L),
      minPartitions: Option[Int] = None,
      format: String = "kafka"): DataFrame = {
    var r = spark.readStream.format(format)
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
    maxOffsetsPerTrigger.foreach(v =>
      r = r.option("maxOffsetsPerTrigger", v.toString))
    minPartitions.foreach(v => r = r.option("minPartitions", v.toString))
    r.load()
  }

  /** Full source→records pipeline: Kafka envelope → declared-schema
    * JSON decode → event-time promotion. */
  def events(spark: SparkSession, bootstrap: String, topics: Seq[String],
      format: String = "kafka"): DataFrame =
    StreamOps.withEventTime(
      StreamOps.decodeJsonEnvelope(
        stream(spark, bootstrap, topics, format = format)))
}
