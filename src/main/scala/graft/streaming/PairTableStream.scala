package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{Caches, Compaction, Dedup}

/** Durable streaming maintenance of the BUCKETED near-dup pair table —
  * the on-disk twin of the in-memory foreachBatch maintenance
  * StreamingSpec proves, and the streaming half of
  * [[graft.operators.PairTable]]'s production-composition story
  * (consumers key on id_a; the layout keeps pairs grouped by an id_a
  * bucket so a consumer scan prunes to the buckets it needs).
  *
  * Copy-on-write versioned like [[CdcStream]] (the incremental
  * re-mine must be able to DROP stored pairs when an incoming batch
  * pushes a shingle over the stop-shingle df cap, which an append-only
  * layout cannot express): each micro-batch
  *
  *  1. archives its documents idempotently under
  *     `docs/batch=<id>/` (overwrite — a foreachBatch retry rewrites
  *     the same directory, so a crash between steps never
  *     double-counts the batch in the corpus);
  *  2. computes the UPDATED full pair set via
  *     [[Dedup.incrementalJaccardPairs]] (corpus = all archived
  *     batches strictly before this id — hash-identical to a full
  *     re-mine, q116's oracle contract);
  *  3. writes it as a new version dir `v<id>/bucket=N/...` and
  *     atomically swings the `_latest` pointer ([[CdcStream]]'s
  *     exactly-once pointer mechanics, shared).
  *
  * Version dirs inherit one file per shuffle partition per bucket —
  * the fragmentation [[compactCurrent]] removes with the two-phase
  * [[Compaction]] pattern, per-bucket (each `bucket=N` dir is an
  * independent unit). [[read]] dedups on (id_a, id_b) — a no-op
  * outside compaction's write→commit window (the mine emits each pair
  * once), inside it the tolerance that makes the window harmless.
  *
  * 100 TB shape: the pair table is pairs, not documents (tiny
  * relative to the corpus); mining cost per batch is the incremental
  * candidate work; the version write shuffles once on the bucket
  * column; compaction touches one bucket dir at a time.
  */
object PairTableStream {
  val NBuckets = 16

  private def docsDir(tablePath: String) = s"$tablePath/docs"

  private def priorBatchDirs(spark: SparkSession, tablePath: String,
      id: Long): Seq[String] = {
    val root = new Path(docsDir(tablePath))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("batch="))
      .filter(_.getPath.getName.stripPrefix("batch=").toLong < id)
      .map(_.getPath.toString)
  }

  /** Wire a (doc_id, text) document stream into the maintained table.
    * Start + await the returned writer. */
  def maintain(docs: DataFrame, tablePath: String,
      n: Int = graft.operators.PairTable.ShingleN,
      threshold: Double = graft.operators.PairTable.Threshold)
      : DataStreamWriter[Row] = {
    val spark = docs.sparkSession
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], id: Long) =>
        val applied = CdcStream.latestVersion(tablePath)
        if (applied.forall(_ < id)) {
          val b = batch.toDF().select(col("doc_id"), col("text"))
          b.write.mode("overwrite")
            .parquet(s"${docsDir(tablePath)}/batch=$id")
          val prior = priorBatchDirs(spark, tablePath, id)
          val pairs =
            if (prior.isEmpty)
              Dedup.jaccardPairs(b, "doc_id", "text", n, threshold)
            else Dedup.incrementalJaccardPairs(
              spark.read.parquet(prior: _*), b, "doc_id", "text", n,
              threshold)
          // the version write stays WIDE (a corpus-scale pair set
          // cannot funnel through few tasks), keyed on id_a; wide ×
          // bucket-partitioned = one file per (task, bucket) pair —
          // exactly the per-bucket fragmentation [[compactCurrent]]
          // exists to remove
          val width = spark.conf.get("spark.sql.shuffle.partitions").toInt
          pairs.withColumn("bucket", pmod(col("id_a"), lit(NBuckets)))
            .repartition(width, col("id_a"))
            .write.mode("overwrite").partitionBy("bucket")
            .parquet(s"$tablePath/v$id")
          CdcStream.writePointer(tablePath, id)
          Caches.releaseAll()
        } // else: retry of an applied batch — skip (exactly-once)
        ()
    }
  }

  /** The maintained pair table as of the latest committed version
    * (id_a, id_b, shared, jaccard). The (id_a, id_b) dedup absorbs
    * [[compactCurrent]]'s double-visibility window; outside it every
    * pair is emitted once by the mine, so it is a no-op. */
  def read(spark: SparkSession, tablePath: String): DataFrame = {
    val v = CdcStream.latestVersion(tablePath).getOrElse(
      throw new IllegalStateException(s"$tablePath not initialized"))
    spark.read.parquet(s"$tablePath/v$v")
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), col("shared"), col("jaccard"))
  }

  /** Bucket-pruned lookup of one document's pairs — the serving-path
    * read that makes the bucketed layout pay: the `bucket` partition
    * predicate prunes the scan to ONE `bucket=N` directory
    * (PartitionFilters, asserted in StreamingSpec), so a keyed lookup
    * opens 1/NBuckets of the table's files regardless of table size.
    * Same (id_a, id_b) dedup tolerance as [[read]]. */
  def readForKey(spark: SparkSession, tablePath: String, idA: Long)
      : DataFrame = {
    val v = CdcStream.latestVersion(tablePath).getOrElse(
      throw new IllegalStateException(s"$tablePath not initialized"))
    spark.read.parquet(s"$tablePath/v$v")
      .where(col("bucket") === ((idA % NBuckets) + NBuckets) % NBuckets)
      .where(col("id_a") === idA)
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), col("shared"), col("jaccard"))
  }

  /** Two-phase per-bucket compaction of the current version — each
    * `bucket=N` dir is an independent [[Compaction]] unit. Safe under
    * concurrent maintenance ([[maintain]] writes NEW version dirs)
    * and concurrent [[read]]s (the (id_a, id_b) dedup). */
  def compactCurrent(spark: SparkSession, tablePath: String,
      targetBytes: Long = 128L << 20): Int = {
    val v = CdcStream.latestVersion(tablePath).getOrElse(
      throw new IllegalStateException(s"$tablePath not initialized"))
    Compaction.compact(spark, s"$tablePath/v$v",
      partitionPrefix = Some("bucket="), targetBytes = targetBytes)
  }
}
