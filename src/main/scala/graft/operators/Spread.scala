package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism repair for fanout-heavy operators (guide §2.5
  * "input skew: one huge unsplittable file — repartition immediately
  * after the read").
  *
  * The corpus tables arrive as a handful of parquet files; below
  * ~`maxPartitionBytes` per file the scan plans ONE task per file
  * (parquet splits at row-group granularity, and a small file is one
  * row group), so every downstream narrow stage — shingling, token
  * explodes, signature computation — runs single-threaded until the
  * first exchange. Measured at sf0.1: the shingle/posting build of the
  * mining family spent 1.2–1.4 s in one task while 31 cores idled.
  *
  * [[forFanout]] inserts a deterministic hash repartition on the given
  * key ONLY when the scan cannot occupy the worker pool: the logical
  * plan's size estimate (file bytes — no job, no RDD materialization)
  * says fewer than `defaultParallelism / 2` scan splits would result.
  * At production scale the estimate is huge, the branch is a no-op,
  * and no extra exchange enters the plan — the adaptive part is that
  * the shuffle exists exactly when the data is too small for the
  * cluster, where shuffling it is by definition cheap.
  */
object Spread {

  /** `df` repartitioned `defaultParallelism` ways by `keys` when its
    * estimated input size could not fill half the worker pool at the
    * session's `maxPartitionBytes` per scan task; `df` unchanged
    * otherwise. Hash repartition on a stable key — deterministic under
    * retries (no round-robin, see SPARK-38388). */
  def forFanout(df: DataFrame, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val maxPB = spark.sessionState.conf.filesMaxPartitionBytes
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(maxPB) * math.max(1, par / 2))
      df.repartition(par, keys: _*)
    else df
  }
}
