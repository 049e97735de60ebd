package graft.operators

import org.apache.spark.sql.Dataset

/** Lifecycle registry for operator-internal persisted frames.
  *
  * Dedup (and friends) persist intermediates — posting lists, band
  * tables — that must outlive the operator call: the consuming action
  * only happens when the caller materializes the returned plan. That
  * means the operator itself can never safely unpersist. Instead every
  * internal persist is tracked here, and session drivers that run many
  * catalog queries (Bench, Verify, long-lived services) release them
  * between queries via [[releaseAll]]. Without this, cached blocks
  * accumulate for the life of the session (disk-spilled blocks are not
  * LRU-evicted) and repeated catalog runs re-cache already-cached
  * plans (the `CacheManager` warnings seen in the round-1 bench log).
  */
object Caches {
  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `df` at MEMORY_AND_DISK and track it for later release. */
  def persistTracked[T](df: Dataset[T]): Dataset[T] = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    frames.add(df)
    df
  }

  /** Unpersist every tracked frame (non-blocking) and delete any
    * reliable-checkpoint files the fixpoint loops registered
    * ([[Lineage.releaseAll]]). Call after the action that consumes the
    * operator's output.
    *
    * CONTRACT NOTE — checkpoint deletion is harder than unpersist:
    * an unpersisted frame keeps its recompute path (re-consuming it is
    * merely slow), but a reliably-CHECKPOINTED fixpoint result reads
    * its checkpoint files on every recompute, so re-consuming such a
    * frame after releaseAll fails hard with a missing-file error.
    * Callers outside the between-queries harness lifecycle (Verify /
    * Bench, which fully materialize results before releasing) must
    * either finish consuming every returned frame first or defer
    * releaseAll to session close. */
  def releaseAll(): Unit = {
    var df = frames.poll()
    while (df != null) { df.unpersist(false); df = frames.poll() }
    Lineage.releaseAll()
  }
}
