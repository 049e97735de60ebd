package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics
import graft.streaming.{ScdAsof, StateStores}

/** State-store-backed SCD as-of enrichment (the big-dim regime of
  * asofEnrichScd): streaming output must equal the batch as-of join
  * over the same fact/dim history, despite out-of-order arrival of
  * dim versions across micro-batches. */
class ScdAsofSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("streaming SCD as-of equals the batch as-of join, resolves only " +
      "watermark-passed facts, and prunes superseded versions") {
    implicit val ctx = spark.sqlContext
    StateStores.useRocksDb(spark)
    try {
      val factsIn = MemoryStream[(Long, Long, String)]
      val dimsIn = MemoryStream[(Long, String, String)]
      val facts = factsIn.toDF().toDF("event_id", "user_id", "ts_s")
        .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
        .withWatermark("ts", "2 hours")
      val dims = dimsIn.toDF().toDF("user_id", "ts_s", "tier")
        .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
        .withWatermark("ts", "2 hours")

      val q = ScdAsof.asofEnrichScdState(facts, dims, spark)
        .writeStream.format("memory").queryName("scd_t")
        .outputMode("append").start()
      try {
        // batch 1: the LATER dim version arrives first, with two facts
        factsIn.addData((2L, 1L, "2024-01-01 10:30:00"),
          (3L, 1L, "2024-01-01 10:29:00"))
        dimsIn.addData((1L, "2024-01-01 10:30:00", "B"))
        q.processAllAvailable()
        // nothing resolvable yet: watermark lags 2 h behind 10:30
        assert(spark.table("scd_t").count() === 0)

        // batch 2: the EARLIER u1 version + remaining facts, all still
        // ahead of the watermark
        factsIn.addData((1L, 1L, "2024-01-01 10:05:00"),
          (5L, 2L, "2024-01-01 10:20:00"),
          (4L, 2L, "2024-01-01 10:05:00"),
          (6L, 3L, "2024-01-01 10:15:00"))
        dimsIn.addData((1L, "2024-01-01 10:00:00", "A"),
          (2L, "2024-01-01 10:10:00", "C"))
        q.processAllAvailable()

        // batch 3: watermark pushers on BOTH streams (union watermark
        // is the min) — 20:00 - 2 h = 18:00 releases every real fact
        factsIn.addData((99L, 9L, "2024-01-01 20:00:00"))
        dimsIn.addData((9L, "2024-01-01 20:00:00", "Z"))
        q.processAllAvailable()

        val got = spark.table("scd_t")
          .select(col("event_id"), col("asof_tier"))
          .as[(Long, String)].collect().toSet

        // batch replay of the same history through the batch operator
        val factsB: DataFrame = Seq(
          (1L, 1L, "2024-01-01 10:05:00"), (2L, 1L, "2024-01-01 10:30:00"),
          (3L, 1L, "2024-01-01 10:29:00"), (4L, 2L, "2024-01-01 10:05:00"),
          (5L, 2L, "2024-01-01 10:20:00"), (6L, 3L, "2024-01-01 10:15:00"))
          .toDF("event_id", "user_id", "ts_s")
          .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
        val dimsB: DataFrame = Seq(
          (1L, "2024-01-01 10:00:00", "A"), (1L, "2024-01-01 10:30:00", "B"),
          (2L, "2024-01-01 10:10:00", "C"), (9L, "2024-01-01 20:00:00", "Z"))
          .toDF("user_id", "ts_s", "tier")
          .withColumn("d_ts", to_timestamp(col("ts_s"))).drop("ts_s")
        val expected = Analytics.asofJoin(factsB, dimsB, "user_id",
          "ts", "d_ts", Seq("tier"))
          .select(col("event_id"), col("asof_tier"))
          .as[(Long, String)].collect().toSet

        assert(got === expected)
        // spot-check the semantics the set compare rests on
        assert(got.contains((2L, "B")), "inclusive <= at equal timestamps")
        assert(got.contains((3L, "A")), "10:29 predates the B version")
        assert(got.contains((6L, null)), "no version -> null, fact still emits")
        assert(!got.exists(_._1 == 99L),
          "the pusher fact is beyond the watermark and must stay pending")

        // bounded state: superseded u1 version A is pruned, so total
        // state rows stay small (latest version per key + 1 pending)
        val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        assert(stateRows > 0 && stateRows <= 16,
          s"state should stay bounded, saw $stateRows rows")
      } finally q.stop()
    } finally StateStores.useDefault(spark)
  }
}
