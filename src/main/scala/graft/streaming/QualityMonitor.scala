package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{Constraint, Constraints}

/** Streaming data-quality monitoring as a MAINTAINED METRICS TABLE —
  * the production wrapper around [[graft.operators.Constraints]]'s
  * mergeable state: each micro-batch aggregates to one tiny state row
  * per group and appends it under `batch=<id>/` (idempotent overwrite
  * per batch dir, so a foreachBatch retry never double-counts — the
  * [[PairTableStream]] archive contract). [[report]] merges every
  * batch's states and finalizes — by the monoid contract it equals
  * the batch suite over the full corpus, which StreamingSpec pins.
  *
  * The corpus itself is never re-scanned and never stored here: the
  * metrics table grows by |groups| rows per batch regardless of data
  * volume — the same reason the sketch family works at 100 TB. The
  * per-batch slice ([[batchReport]]) is what a drift monitor (PSI /
  * CUSUM, q179/q201) consumes to alarm on a single bad batch that a
  * lifetime aggregate would absorb.
  *
  * [[graft.operators.UniqueRatio]] is rejected up front (distinct
  * state does not merge); its mergeable twin
  * [[graft.operators.ApproxUniqueRatio]] (portable-HLL register
  * slice, register-wise-max merge — the q114-proven monoid) IS
  * accepted, so uniqueness is monitorable incrementally at HLL
  * precision (q220). */
object QualityMonitor {

  /** Wire a stream into a maintained metrics table at `tablePath`.
    * Start + await the returned writer.
    *
    * Crash/retry contract: the per-batch write is an idempotent
    * OVERWRITE of its own `batch=<id>/` dir, so a foreachBatch retry
    * re-running the whole batch never double-counts. In a larger
    * topology where this monitor runs beside other sinks, a crash
    * BETWEEN this state write and a sibling sink's commit simply
    * replays the batch into the same dir — a harmless re-overwrite;
    * the metrics table cannot drift from what the stream actually
    * delivered. */
  def maintain(stream: DataFrame, tablePath: String,
      cs: Seq[Constraint], groupBy: Seq[String] = Nil)
      : DataStreamWriter[Row] = {
    require(cs.forall(_.mergeable),
      "non-mergeable constraints cannot be monitored incrementally " +
        "(see UniqueRatio's doc for the sketch twin)")
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], id: Long) =>
        Constraints.state(batch.toDF(), cs, groupBy)
          .write.mode("overwrite").parquet(s"$tablePath/batch=$id")
        ()
    }
  }

  /** The lifetime report: merge all appended states, finalize. */
  def report(spark: SparkSession, tablePath: String,
      cs: Seq[Constraint], groupBy: Seq[String] = Nil): DataFrame =
    Constraints.report(
      Constraints.mergeStates(spark.read.parquet(tablePath), cs, groupBy),
      cs, groupBy)

  /** One batch's own report — the drift-monitor input granularity. */
  def batchReport(spark: SparkSession, tablePath: String, batchId: Long,
      cs: Seq[Constraint], groupBy: Seq[String] = Nil): DataFrame =
    Constraints.report(
      Constraints.mergeStates(
        spark.read.parquet(s"$tablePath/batch=$batchId"), cs, groupBy),
      cs, groupBy)
}
