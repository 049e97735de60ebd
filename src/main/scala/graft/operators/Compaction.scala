package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** Phase-1 result of a two-phase compaction: the exact files the
  * commit phase will delete, plus the per-unit lock files held open
  * across the window. [[commit]] (or [[Compaction.compactCommit]])
  * finishes the compaction; until then every snapshot row is visible
  * twice (original file + compacted copy) and the unit locks keep a
  * second compactor from interleaving. */
case class PendingCompaction(dir: String, replaced: Seq[String],
    locks: Seq[String]) {
  def size: Int = replaced.size
  def isEmpty: Boolean = replaced.isEmpty
  def nonEmpty: Boolean = replaced.nonEmpty
  /** Finish the compaction: delete exactly the snapshot files, then
    * release the unit locks. See [[Compaction]] for WHEN to call this
    * — the commit deletes files readers may have already listed. */
  def commit(spark: SparkSession): Unit =
    Compaction.compactCommit(spark, this)
}

/** Two-phase online small-file compaction — the maintenance step every
  * append-style streaming sink eventually needs: micro-batch appends
  * leave many small parquet files behind, and reads pay a footer-open
  * per file. First proven for the IVF vector index (round 6); factored
  * here because the SAME two phases serve any directory-per-unit
  * parquet layout (vector-index `cent_id=` buckets, the streaming pair
  * table's `bucket=` dirs, a CDC version directory as one flat unit):
  *
  *  1. write phase ([[compactWrite]]): per unit directory, take the
  *     unit's `.compact-lock` (exclusive create — a unit already being
  *     compacted is SKIPPED, so two concurrent compactions fail safe
  *     instead of interleaving), SNAPSHOT the current file list, read
  *     exactly those files, write their rows back as ~`targetBytes`
  *     files into the same dir under fresh `compact-<nonce>-*` names
  *     (staged in a nonce-suffixed dot-prefixed temp dir Spark's file
  *     listing ignores, then renamed — a parquet file is visible only
  *     once complete), then record the snapshot in the lock file (the
  *     unit's WAL — see the crash contract). Appends landing meanwhile
  *     create NEW files not in the snapshot — untouched.
  *  2. commit phase ([[compactCommit]]): delete exactly the snapshot
  *     files, then release the unit locks.
  *
  * Between the phases every snapshot row is visible TWICE (old file +
  * compacted copy). The caller owns making that window harmless —
  * each adopter documents its own dedup: the vector index's probe
  * dedups (query_id, neighbor_id); [[graft.streaming.CdcStream]] and
  * [[graft.streaming.PairTableStream]] detect the window from their
  * pinned file listing ([[pinnedListing]]) and dedup only while it is
  * open.
  *
  * THE COMMIT PHASE IS THE DANGEROUS HALF. It deletes files, so a
  * reader that planned its scan (listed files) before the commit and
  * executes after it hits FileNotFoundException — or, under
  * `spark.sql.files.ignoreMissingFiles=true`, silently drops the
  * snapshot rows (the compacted copies were not in that reader's
  * listing). The write phase is unconditionally safe under concurrent
  * reads; the commit carries the SAME contract as a table format's
  * vacuum horizon: schedule it after the deployment's maximum read
  * duration has elapsed since the write phase. [[compact]] commits
  * immediately — use it where no concurrent read can span the call
  * (maintenance windows, single-writer tests) or where reader retry
  * is an accepted cost; otherwise hold the returned
  * [[PendingCompaction]] and [[PendingCompaction.commit]] after the
  * read horizon.
  *
  * Crash contract: the lock file doubles as the unit's write-ahead
  * log, so [[recover]] can always finish or undo a dead compactor
  * deterministically —
  *  - lock EMPTY: the compactor died before writing anything; drop
  *    the lock.
  *  - lock lacks a trailing COMMIT sentinel (nonce only, or nonce +
  *    a torn partial manifest): died mid-write or mid-manifest; its
  *    partial `compact-<nonce>-*` copies and staging dir are deleted
  *    (every original is still present — a complete manifest, which
  *    alone gates any commit, was never durably written). ROLL BACK.
  *  - lock holds nonce + snapshot manifest + the COMMIT sentinel
  *    (written LAST, so its presence proves the manifest complete):
  *    the write phase finished; the commit may have partially run.
  *    The copies hold every snapshot row, so recovery deletes
  *    whatever snapshot files remain and drops the lock. ROLL
  *    FORWARD.
  * Until [[recover]] runs, the locked unit is simply skipped by later
  * compactions and the window dedup keeps readers exact.
  *
  * 100 TB shape: each unit directory is an independent compaction
  * unit — compaction parallelizes and interleaves with ingest at unit
  * granularity, and a scheduler can spread units over maintenance
  * windows.
  */
object Compaction {

  private val LockName = ".compact-lock"
  private val ManifestMark = "COMMIT"

  /** Compact `dir` and commit immediately: with `partitionPrefix` set,
    * every subdirectory whose name starts with it is an independent
    * unit; otherwise the directory itself is one flat unit. Returns
    * the number of files replaced. See the object doc for when an
    * immediate commit is safe; concurrent long reads want
    * [[compactWrite]] + a deferred [[PendingCompaction.commit]]. */
  def compact(spark: SparkSession, dir: String,
      partitionPrefix: Option[String] = None,
      targetBytes: Long = 128L << 20): Int = {
    val pending = compactWrite(spark, dir, partitionPrefix, targetBytes)
    compactCommit(spark, pending)
    pending.size
  }

  /** Phase 1: returns the pending compaction (the input to
    * [[compactCommit]] / [[PendingCompaction.commit]]). Units whose
    * lock is already held by another compactor are skipped. */
  private[graft] def compactWrite(spark: SparkSession, dir: String,
      partitionPrefix: Option[String], targetBytes: Long)
      : PendingCompaction = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return PendingCompaction(dir, Seq.empty, Seq.empty)
    val units = partitionPrefix match {
      case Some(pre) => fs.listStatus(root).toSeq
        .filter(d => d.isDirectory && d.getPath.getName.startsWith(pre))
        .map(_.getPath)
      case None => Seq(root)
    }
    def write(p: Path, content: String): Unit = {
      val out = fs.create(p, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    val replaced = Seq.newBuilder[String]
    val locks = Seq.newBuilder[String]
    units.foreach { d =>
      def dataFiles(): Array[FileStatus] = fs.listStatus(d)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      def outFiles(files: Array[FileStatus]): Long = math.max(1L,
        (files.map(_.getLen).sum + targetBytes - 1) / targetBytes)
      val probe = dataFiles()
      if (probe.length > outFiles(probe)) {
        val lock = new Path(d, LockName)
        // exclusive create — lose the race, skip the unit (fail fast,
        // never interleave two compactions of the same unit)
        if (scala.util.Try(fs.createNewFile(lock)).getOrElse(false)) {
          // re-list under the lock: a compactor that committed between
          // our probe listing and the lock acquire changed the files
          val files = dataFiles()
          if (files.length > outFiles(files)) {
            locks += lock.toString
            // WAL stage 1: the cycle nonce names this cycle's staging
            // dir and copies, so a mid-write crash is undoable
            val nonce = System.nanoTime()
            write(lock, s"$nonce\n")
            val df = spark.read.parquet(files.map(_.getPath.toString): _*)
            val tmp = new Path(d, s".compact-tmp-$nonce")
            df.coalesce(outFiles(files).toInt)
              .write.mode("overwrite").parquet(tmp.toString)
            fs.listStatus(tmp)
              .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
              .zipWithIndex.foreach { case (f, i) =>
                fs.rename(f.getPath,
                  new Path(d, s"compact-$nonce-$i.parquet"))
              }
            fs.delete(tmp, true)
            // WAL stage 2: the snapshot manifest, SENTINEL LAST — a
            // torn rewrite leaves no trailing COMMIT line, so recovery
            // can only roll forward from a manifest that is provably
            // complete (its presence is what authorizes a commit)
            val snap = files.map(_.getPath.toString)
            write(lock,
              s"$nonce\n${snap.mkString("\n")}\n$ManifestMark\n")
            snap.foreach(replaced += _)
          } else {
            // the race winner already consolidated this unit: release
            // the lock NOW — a deferred commit must not block the
            // unit's future cycles for a no-op
            fs.delete(lock, false)
          }
        }
      }
    }
    PendingCompaction(dir, replaced.result(), locks.result())
  }

  /** Phase 2: drop exactly the snapshot files phase 1 replaced, then
    * release the unit locks. Read the object doc before calling this
    * with reads in flight — deletion is what breaks late readers. */
  private[graft] def compactCommit(spark: SparkSession,
      pending: PendingCompaction): Unit = {
    val fs = new Path(pending.dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    pending.replaced.foreach(p => fs.delete(new Path(p), false))
    pending.locks.foreach(p => fs.delete(new Path(p), false))
  }

  /** Crash recovery: finish or undo every dead compactor under `dir`
    * (recursive) from its lock-file WAL — see the object doc's crash
    * contract for the three lock states. Roll-forward deletes original
    * files, so it carries the commit phase's read-horizon contract.
    * Returns (unitsRolledForward, unitsRolledBack). Only run this when
    * no live compactor holds the locks — the caller owns knowing the
    * compactor is dead (same as any single-writer maintenance lease).
    */
  def recover(spark: SparkSession, dir: String): (Int, Int) = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (0, 0)
    var forward = 0
    var back = 0
    def sweep(p: Path): Unit = fs.listStatus(p).foreach { s =>
      if (s.isDirectory) sweep(s.getPath)
      else if (s.getPath.getName == LockName) {
        val unit = s.getPath.getParent
        // readFully, not a single read(): a short read that truncated
        // the manifest would misroute a completed write to ROLL BACK —
        // deleting copies whose originals an interrupted commit may
        // already have removed
        val len = s.getLen.toInt
        val buf = new Array[Byte](len)
        val in = fs.open(s.getPath)
        try { if (len > 0) in.readFully(0, buf) } finally in.close()
        val content = new String(buf, StandardCharsets.UTF_8)
        val lines = content.split("\n").toSeq.filter(_.nonEmpty)
        // roll forward ONLY on a provably complete manifest: the
        // COMMIT sentinel is written last, so a torn rewrite cannot
        // masquerade as one
        if (lines.size >= 2 && lines.last == ManifestMark) {
          // write phase completed: the copies hold every snapshot row
          // — finish the interrupted commit
          lines.slice(1, lines.size - 1)
            .foreach(f => fs.delete(new Path(f), false))
          forward += 1
        } else {
          // died mid-write (or before writing anything): undo this
          // cycle's partial copies; every original is still present
          lines.headOption.foreach { nonce =>
            fs.listStatus(unit).foreach { f =>
              val n = f.getPath.getName
              if (n.startsWith(s"compact-$nonce-") ||
                n == s".compact-tmp-$nonce")
                fs.delete(f.getPath, true)
            }
          }
          back += 1
        }
        fs.delete(s.getPath, false)
      }
    }
    sweep(root)
    (forward, back)
  }

  /** Pinned listing of `dir`'s parquet data files (recursive; hidden
    * and `_`-prefixed names pruned, like Spark's own file index), plus
    * whether the compaction double-visibility window is OPEN — i.e.
    * whether any single unit directory currently holds both compacted
    * (`compact-*`) and original files. Readers that scan exactly the
    * returned files make the window test and the scan see the SAME
    * listing (no list-then-relist race), so the dedup that absorbs the
    * window can be applied only while it is open instead of on every
    * read — the window tolerance priced as a transient cost, not a
    * permanent one. */
  private[graft] def pinnedListing(spark: SparkSession, dir: String)
      : (Seq[String], Boolean) = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (Seq.empty, false)
    val leaves = Seq.newBuilder[FileStatus]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { s =>
      val name = s.getPath.getName
      if (s.isFile) {
        if (name.endsWith(".parquet") && !name.startsWith(".") &&
          !name.startsWith("_")) leaves += s
      } else if (!name.startsWith(".") && !name.startsWith("_"))
        walk(s.getPath)
    }
    walk(root)
    val files = leaves.result()
    // per-UNIT window test: the adopters' unit dirs are immutable once
    // written (appends land in NEW version dirs), so a unit holding
    // files of more than one GENERATION — raw originals plus a
    // compaction cycle's `compact-<nonce>-*` copies, or two cycles'
    // nonces (a recompaction of an already-compacted unit) — is
    // exactly a unit inside the write→commit window. Post-commit a
    // unit holds one generation and the dedup cost drops back to zero;
    // a global both-kinds test would instead flag the steady state
    // where some units are compacted and others fresh, forever.
    val windowOpen = files.groupBy(_.getPath.getParent).values.exists {
      unit =>
        val gens = unit.map { f =>
          val n = f.getPath.getName
          if (n.startsWith("compact-"))
            n.split("-").take(2).mkString("-")
          else "raw"
        }.toSet
        gens.size > 1 && gens.exists(_ != "raw")
    }
    (files.map(_.getPath.toString), windowOpen)
  }
}
