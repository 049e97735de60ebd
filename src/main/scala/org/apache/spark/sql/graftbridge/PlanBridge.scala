package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into the `private[sql]` plan↔Dataset converters for custom
  * logical operators ([[graft.plans.AsOfJoinPlan]]): Spark exposes no
  * public "DataFrame from LogicalPlan" since the classic/connect API
  * split — this is the same call every internal relation builder uses.
  * Lives under `org.apache.spark.sql` purely for access scope, like
  * [[ColumnBridge]]. */
object PlanBridge {

  /** Wrap a (resolved) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed plan beneath a DataFrame (resolved attributes with
    * stable expression ids — safe to reference from a parent node). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** The reliable-checkpoint directory backing a Dataset returned by
    * `df.checkpoint()`, if any. `Dataset.checkpoint` wraps the
    * materialized RDD in a [[org.apache.spark.sql.execution.LogicalRDD]];
    * for a reliable checkpoint that RDD's `getCheckpointFile` is the
    * `rdd-<id>` directory under the session checkpoint dir. Spark's
    * ContextCleaner does NOT delete those by default
    * (`spark.cleaner.referenceTracking.cleanCheckpoints=false`), so
    * callers that loop (fixpoint operators) must collect and delete
    * them — see `graft.operators.Lineage`. */
  def checkpointFile(df: DataFrame): Option[String] =
    analyzed(df) match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.getCheckpointFile
      case _ => None
    }

  /** Truncate `df`'s lineage exactly like `Dataset.checkpoint` /
    * `localCheckpoint` (copy the internal rows, checkpoint the RDD,
    * materialize, wrap in a [[org.apache.spark.sql.execution.LogicalRDD]]
    * via `fromDataset` so output partitioning/ordering survive) but
    * fold the fixpoint loops' convergence probe into the SINGLE
    * materializing job. Returns (truncated frame, exact row count,
    * probe-column true-count).
    *
    * Before (round-11 shape) every fixpoint round paid TWO driver
    * round-trips: the eager truncate's internal count and a separate
    * probe job (`.where(changed).limit(1).count()` or `.count()`),
    * each ~40–70 ms of fixed job latency at ANY scale. The probe
    * count here rides a LongAccumulator on the materializing count.
    * Accumulator semantics: task retries (and the reliable regime's
    * checkpoint-write second pass) can OVERcount, never UNDERcount a
    * non-zero value — callers must branch only on `== 0`, which is
    * exactly the convergence test. The row count is the action's
    * return value and is exact. */
  def truncateCounted(df: DataFrame, reliable: Boolean,
      probeCol: Option[String]): (DataFrame, Long, Long) = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val session = ds.sparkSession
    val acc = session.sparkContext.longAccumulator("graft.fixpoint.probe")
    val probeIdx = probeCol.map(ds.schema.fieldIndex)
    val base = ds.queryExecution.toRdd
    val internalRdd = probeIdx match {
      case Some(i) =>
        base.map { r =>
          val out = r.copy()
          if (!out.isNullAt(i) && out.getBoolean(i)) acc.add(1L)
          out
        }
      case None => base.map(_.copy())
    }
    if (reliable) internalRdd.checkpoint() else internalRdd.localCheckpoint()
    val total = internalRdd.count()
    val out = classic.Dataset.ofRows(session,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        internalRdd, ds, isStreaming = false))
    (out, total, acc.value)
  }

  /** Idempotently add an extra planner strategy to a live session —
    * the registration path for sessions built without
    * `spark.sql.extensions=graft.GraftExtensions`. */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }

  /** Idempotently add an extra optimizer rule to a live session (the
    * `experimental.extraOptimizations` batch runs after the main
    * optimizer, so rewrites here see constant-folded, predicate-pushed
    * plans). Same role as [[addStrategy]] for rule injection. */
  def addOptimization(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(r))
      exp.extraOptimizations = exp.extraOptimizations :+ r
  }
}
