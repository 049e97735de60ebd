package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Compaction

/** Property pin for the generic two-phase compaction helper
  * ([[graft.operators.Compaction]]) that the vector index, the CDC
  * table, and the streaming pair table all adopt (their concrete
  * mid-compaction tests live in StreamingSpec). The helper itself is
  * swept here over random layouts:
  *
  *  - multiset equality: after a full compact() the table holds
  *    exactly the original rows, for any (units, files/unit,
  *    rows/file) regime, flat or partition-prefixed;
  *  - file consolidation actually happens: every unit ends at one
  *    file at the default target size, and the returned replaced
  *    count covers exactly the multi-file units' files;
  *  - the window contract: between compactWrite and compactCommit
  *    the ONLY anomaly is double-visibility of snapshot rows — a
  *    reader deduping a unique key sees exactly the original table;
  *  - appends landing inside the window are never lost, and never
  *    deleted by the commit (the snapshot-scoped delete).
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  /** Write `ids` as ONE parquet file appended to `dir`. */
  private def appendFile(dir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("id").coalesce(1).write.mode("append").parquet(dir)
  }

  private def readIds(dir: String): Seq[Long] = {
    import spark.implicits._
    spark.read.parquet(dir).select("id").as[Long].collect().toSeq.sorted
  }

  private def parquetFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.exists) Seq.empty
    else d.listFiles.toSeq.filter(f =>
      f.isFile && f.getName.endsWith(".parquet")).map(_.getName)
  }

  test("property: multiset equality + consolidation over random layouts") {
    import org.scalacheck.Gen
    val regime = for {
      units <- Gen.chooseNum(1, 3)
      files <- Gen.listOfN(units, Gen.chooseNum(1, 5))
      flat <- Gen.oneOf(true, false)
    } yield (files, units == 1 && flat)
    def sample(): (List[Int], Boolean) =
      Iterator.continually(regime.sample).flatten.next()

    for (trial <- 1 to 12) {
      val (filesPerUnit, flat) = sample()
      val root = GraftTestSpark.tmpDir(s"compactprop$trial")
      var next = 0L
      val unitDirs =
        if (flat) Seq(root)
        else filesPerUnit.indices.map(u => s"$root/u=$u")
      unitDirs.zip(filesPerUnit).foreach { case (d, nf) =>
        (0 until nf).foreach { _ =>
          appendFile(d, Seq(next, next + 1)); next += 2
        }
      }
      val before = readIds(root)
      val replaced = Compaction.compact(spark, root,
        partitionPrefix = if (flat) None else Some("u="))
      val after = readIds(root)
      assert(after == before,
        s"trial $trial: rows changed (files=$filesPerUnit flat=$flat)")
      unitDirs.foreach { d =>
        assert(parquetFiles(d).size == 1,
          s"trial $trial: unit $d not consolidated to one file")
      }
      val expectedReplaced = filesPerUnit.filter(_ > 1).sum
      assert(replaced == expectedReplaced,
        s"trial $trial: replaced $replaced, expected $expectedReplaced " +
          s"(files=$filesPerUnit)")
    }
  }

  test("window contract: dedup reader sees the original; mid-window " +
      "appends survive the commit") {
    val root = GraftTestSpark.tmpDir("compactwin")
    (0 until 4).foreach(i => appendFile(root, Seq(i * 2L, i * 2L + 1)))
    val before = readIds(root)

    val snapshot = Compaction.compactWrite(spark, root, None, 128L << 20)
    assert(snapshot.size == 4, "all four fragments in the snapshot")
    // inside the window: snapshot rows visible twice; the adopters'
    // unique-key dedup restores the original view
    assert(readIds(root) == (before ++ before).sorted)
    assert(spark.read.parquet(root).dropDuplicates("id")
      .count() == before.size)

    // an append lands between the phases (not in the snapshot)
    appendFile(root, Seq(100L, 101L))

    Compaction.compactCommit(spark, snapshot)
    assert(readIds(root) == (before ++ Seq(100L, 101L)).sorted,
      "commit deleted exactly the snapshot; the mid-window append survived")
  }

  test("unit lock: a concurrent compaction of a locked unit skips it " +
      "(fail-safe, no interleaving); the lock releases on commit") {
    val root = GraftTestSpark.tmpDir("compactlock")
    (0 until 3).foreach(i => appendFile(root, Seq(i * 2L, i * 2L + 1)))
    val before = readIds(root)

    val first = Compaction.compactWrite(spark, root, None, 128L << 20)
    assert(first.size == 3 && first.locks.size == 1)
    // a second compactor racing into the same unit mid-window: the
    // exclusive lock makes it a no-op instead of a double-delete
    val second = Compaction.compactWrite(spark, root, None, 128L << 20)
    assert(second.isEmpty && second.locks.isEmpty,
      "locked unit must be skipped, not compacted twice")
    Compaction.compactCommit(spark, second)

    Compaction.compactCommit(spark, first)
    assert(readIds(root) == before, "rows intact after the race")
    assert(parquetFiles(root).size == 1, "still consolidated to one file")
    // lock released: a later compaction cycle can take the unit again
    appendFile(root, Seq(50L, 51L))
    val third = Compaction.compact(spark, root)
    assert(third == 2 && readIds(root) == (before ++ Seq(50L, 51L)).sorted)
  }

  test("crash contract: recover rolls an interrupted commit FORWARD " +
      "from the lock WAL (copies hold every row; stale originals drop)") {
    val root = GraftTestSpark.tmpDir("compactfwd")
    (0 until 3).foreach(i => appendFile(root, Seq(i * 2L, i * 2L + 1)))
    val before = readIds(root)
    // write phase completed, commit never ran (the crash): lock holds
    // nonce + manifest, rows visible twice
    val crashed = Compaction.compactWrite(spark, root, None, 128L << 20)
    assert(crashed.nonEmpty)
    assert(Compaction.compact(spark, root) == 0,
      "unit stays locked after the crash (skip, don't interleave)")
    assert(Compaction.recover(spark, root) == ((1, 0)))
    assert(readIds(root) == before,
      "roll-forward finishes the commit: exactly the original rows")
    assert(parquetFiles(root).size == 1 &&
      parquetFiles(root).forall(_.startsWith("compact-")))
    // the unit is unlocked and fully maintainable again
    appendFile(root, Seq(50L, 51L))
    assert(Compaction.compact(spark, root) == 2)
    assert(readIds(root) == (before ++ Seq(50L, 51L)).sorted)
  }

  test("crash contract: recover rolls a mid-write crash BACK (partial " +
      "copies drop; every original survives)") {
    val root = GraftTestSpark.tmpDir("compactbck")
    (0 until 3).foreach(i => appendFile(root, Seq(i * 2L, i * 2L + 1)))
    val before = readIds(root)
    val originals = parquetFiles(root).toSet
    // simulate the mid-write crash state: lock holds only the nonce,
    // one partial copy landed, no manifest
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nonce = 12345L
    val out = fs.create(
      new org.apache.hadoop.fs.Path(root, ".compact-lock"), true)
    out.write(s"$nonce\n".getBytes("UTF-8")); out.close()
    appendFile(root, Seq(0L, 1L)) // stand-in rows for the partial copy
    val partial = (parquetFiles(root).toSet -- originals).head
    fs.rename(new org.apache.hadoop.fs.Path(root, partial),
      new org.apache.hadoop.fs.Path(root, s"compact-$nonce-0.parquet"))

    assert(Compaction.recover(spark, root) == ((0, 1)))
    assert(readIds(root) == before,
      "roll-back drops the partial copy; originals intact")
    assert(parquetFiles(root).toSet == originals)

    // a TORN manifest (file list present but no trailing COMMIT
    // sentinel) must also roll back — only a provably complete
    // manifest may authorize deleting originals
    val out2 = fs.create(
      new org.apache.hadoop.fs.Path(root, ".compact-lock"), true)
    out2.write(s"$nonce\nfile:$root/${originals.head}\n".getBytes("UTF-8"))
    out2.close()
    assert(Compaction.recover(spark, root) == ((0, 1)))
    assert(parquetFiles(root).toSet == originals,
      "a torn manifest must never delete the listed originals")

    assert(Compaction.compact(spark, root) == 3,
      "the unit compacts normally after recovery")
    assert(readIds(root) == before)
  }

  test("scoped window dedup: CdcStream readers pay the dedup only " +
      "while the double-visibility window is open") {
    import org.apache.spark.sql.functions._
    val tableDir = GraftTestSpark.tmpDir("compactscope")
    val base = spark.range(0, 64).select(col("id").as("doc_id"),
      concat(lit("d"), col("id")).as("text")).repartition(4)
    graft.streaming.CdcStream.init(base, tableDir)
    def snap() = graft.streaming.CdcStream.readSnapshot(spark, tableDir)
    def hasDedup(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.toString.contains("Deduplicate")

    assert(!hasDedup(snap()),
      "no compaction yet: the read must not plan a dedup shuffle")
    assert(snap().count() == 64)

    val pending = graft.streaming.CdcStream.compactCurrentDeferred(
      spark, tableDir)
    assert(pending.nonEmpty)
    assert(hasDedup(snap()),
      "window open: the pinned listing must trigger the dedup")
    assert(snap().count() == 64, "window dedup restores the exact view")

    pending.commit(spark)
    assert(!hasDedup(snap()),
      "window closed: the dedup cost must drop back to zero")
    assert(snap().count() == 64)
  }
}
