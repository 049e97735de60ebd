package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1: Kafka stream source builder (reference: subscribe to
  * `bitcoin-tweets,ethereum-tweets`, startingOffsets=latest —
  * job2.py:128-142).
  *
  * Requires the spark-sql-kafka connector on the cluster classpath
  * (not shipped in this image — all semantics are exercised through
  * MemoryStream + [[StreamOps.decodeJsonEnvelope]] instead, which is
  * byte-identical after the source).
  *
  * Scale guards the reference lacks: `maxOffsetsPerTrigger` bounds
  * micro-batch size (SURVEY §4), `minPartitions` lets a 1000-executor
  * cluster split hot topic partitions.
  */
object KafkaSource {
  def stream(spark: SparkSession, bootstrap: String, topics: Seq[String],
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = Some(1000000L),
      minPartitions: Option[Int] = None): DataFrame = {
    var r = spark.readStream.format("kafka")
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
  def events(spark: SparkSession, bootstrap: String,
      topics: Seq[String]): DataFrame =
    StreamOps.withEventTime(
      StreamOps.decodeJsonEnvelope(stream(spark, bootstrap, topics)))
}
