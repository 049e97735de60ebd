package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.batch.BatchJobs
import graft.streaming.{StreamOps, StreamingJobs}

/** Job-topology wiring: the reference-shaped fan-outs run end to end
  * (multi-query streaming fan-out K7/T12; batch dual-write K5/K6). */
class JobsSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def json(id: Long, ts: String, user: Long, typ: String,
      v: Double): String =
    s"""{"event_id":$id,"ts":"$ts","user_id":$user,"event_type":"$typ","value":$v}"""

  test("streaming detection job fans out alerts + chained metrics") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graftjob").toString
    val input = MemoryStream[String]
    val events = StreamOps.withEventTime(
      StreamOps.decodeJsonEnvelope(input.toDF()))
    val queries = StreamingJobs.startDetection(spark, events, dir,
      trigger = "1 seconds")
    try {
      input.addData(Seq(
        json(1, "2024-01-01 10:00:05", 1, "error", 1.0),
        json(2, "2024-01-01 10:00:40", 3, "purchase", 400.0)))
      queries.foreach(_.processAllAvailable())
      input.addData(Seq(json(9, "2024-01-01 10:30:00", 9, "view", 1.0)))
      queries.foreach(_.processAllAvailable())
      input.addData(Seq(json(10, "2024-01-01 11:00:00", 9, "view", 1.0)))
      queries.foreach(_.processAllAvailable())
    } finally queries.foreach(_.stop())
    val alerts = spark.read.parquet(s"$dir/alerts")
    assert(alerts.count() === 2)
    val metrics = spark.read.parquet(s"$dir/metrics")
    assert(metrics.count() === 10) // 2 alerts x 5 sliding windows each
    assert(new java.io.File(s"$dir/chk/alerts/offsets").exists)
    assert(new java.io.File(s"$dir/chk/metrics/offsets").exists)
  }

  test("batch job bundle writes csv + parquet report tree") {
    val dir = java.nio.file.Files.createTempDirectory("graftbatch").toString
    BatchJobs.run(spark, "/root/testdata/sf0.001", dir, "terms")
    val csv = spark.read.option("header", "true")
      .csv(s"$dir/terms/csv/q18_top_tokens")
    assert(csv.count() === 20)
    val pq = spark.read.parquet(s"$dir/terms/parquet/q27_extract_terms")
    assert(pq.count() > 0)
  }

  test("every catalog query referenced by a batch job exists") {
    val missing = BatchJobs.jobs.values.flatten.toSet -- Queries.all.keySet
    assert(missing.isEmpty, s"unknown queries: $missing")
  }
}
