package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Two-phase online small-file compaction — the maintenance step every
  * append-style streaming sink eventually needs: micro-batch appends
  * leave many small parquet files behind, and reads pay a footer-open
  * per file. First proven for the IVF vector index (round 6); factored
  * here because the SAME two phases serve any directory-per-unit
  * parquet layout (vector-index `cent_id=` buckets, the streaming pair
  * table's `bucket=` dirs, a CDC version directory as one flat unit):
  *
  *  1. write phase ([[compactWrite]]): per unit directory, SNAPSHOT
  *     the current file list, read exactly those files, write their
  *     rows back as ~`targetBytes` files into the same dir under
  *     fresh names (staged in a dot-prefixed temp dir Spark's file
  *     listing ignores, then renamed — a parquet file is visible only
  *     once complete). Appends landing meanwhile create NEW files not
  *     in the snapshot — untouched.
  *  2. commit phase ([[compactCommit]]): delete exactly the snapshot
  *     files.
  *
  * Between the phases every snapshot row is visible TWICE (old file +
  * compacted copy). The caller owns making that window harmless —
  * each adopter documents its own dedup: the vector index's probe
  * dedups (query_id, neighbor_id); [[graft.streaming.CdcStream]] and
  * [[graft.streaming.PairTableStream]] read through `dropDuplicates`
  * over rows that are unique by construction, so the dedup is a no-op
  * outside the window. This is what makes write-then-delete compaction
  * correct without a table format's manifest commit.
  *
  * 100 TB shape: each unit directory is an independent compaction
  * unit — compaction parallelizes and interleaves with ingest at unit
  * granularity, and a scheduler can spread units over maintenance
  * windows.
  */
object Compaction {

  /** Compact `dir`: with `partitionPrefix` set, every subdirectory
    * whose name starts with it is an independent unit; otherwise the
    * directory itself is one flat unit. Returns the number of files
    * replaced. */
  def compact(spark: SparkSession, dir: String,
      partitionPrefix: Option[String] = None,
      targetBytes: Long = 128L << 20): Int = {
    val snap = compactWrite(spark, dir, partitionPrefix, targetBytes)
    compactCommit(spark, dir, snap)
    snap.size
  }

  /** Phase 1: returns the snapshot of replaced file paths (the input
    * to [[compactCommit]]). Exposed so mid-compaction tests can hold
    * the window open; callers use [[compact]]. */
  private[graft] def compactWrite(spark: SparkSession, dir: String,
      partitionPrefix: Option[String], targetBytes: Long): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val units = partitionPrefix match {
      case Some(pre) => fs.listStatus(root).toSeq
        .filter(d => d.isDirectory && d.getPath.getName.startsWith(pre))
        .map(_.getPath)
      case None => Seq(root)
    }
    val replaced = Seq.newBuilder[String]
    units.foreach { d =>
      val files = fs.listStatus(d)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      val nOut = math.max(1L,
        (files.map(_.getLen).sum + targetBytes - 1) / targetBytes).toInt
      if (files.length > nOut) {
        val df = spark.read.parquet(files.map(_.getPath.toString): _*)
        val tmp = new Path(d, ".compact-tmp")
        df.coalesce(nOut).write.mode("overwrite").parquet(tmp.toString)
        fs.listStatus(tmp)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .zipWithIndex.foreach { case (f, i) =>
            fs.rename(f.getPath,
              new Path(d, s"compact-${System.nanoTime()}-$i.parquet"))
          }
        fs.delete(tmp, true)
        files.foreach(f => replaced += f.getPath.toString)
      }
    }
    replaced.result()
  }

  /** Phase 2: drop exactly the snapshot files phase 1 replaced. */
  private[graft] def compactCommit(spark: SparkSession, dir: String,
      snapshot: Seq[String]): Unit = {
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    snapshot.foreach(p => fs.delete(new Path(p), false))
  }
}
