package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative fixpoint operators (connected
  * components, PageRank, k-means): each round's plan references the
  * previous round's twice, so without truncation the logical plan
  * doubles per round and analysis alone is O(2^rounds).
  *
  * Two regimes:
  *  - `localCheckpoint` (default): blocks live on executor local
  *    storage — fast, no distributed-FS round-trip, the right choice
  *    on local[*] and for short loops. NOT fault-tolerant: losing an
  *    executor invalidates its blocks and fails the job.
  *  - reliable `checkpoint`: used automatically when the session has a
  *    checkpoint directory configured
  *    (`spark.sparkContext.setCheckpointDir(...)`) — blocks go to the
  *    (replicated) checkpoint FS, so a 1000-executor fixpoint loop
  *    survives executor loss. The per-round write cost is the
  *    insurance premium; pay it on real clusters, skip it locally.
  *
  * Both are EAGER (materialize now): the convergence probe that
  * follows each round would otherwise recompute the plan.
  */
object Lineage {
  /** Truncate `df`'s lineage: reliable checkpoint when the session has
    * a checkpoint dir, local checkpoint otherwise. */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
