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
