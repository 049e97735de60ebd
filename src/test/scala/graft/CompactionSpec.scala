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

    Compaction.compactCommit(spark, root, snapshot)
    assert(readIds(root) == (before ++ Seq(100L, 101L)).sorted,
      "commit deleted exactly the snapshot; the mid-window append survived")
  }
}
