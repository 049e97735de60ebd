package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Dedup, Similarity, VectorIndex}

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  /** test() whose body persists tracked frames / reliable checkpoints:
    * releaseAll() runs in a finally, so an assertion failure cannot
    * leave cached frames bleeding into later tests in the shared
    * session. Mid-body releaseAll() calls (between two mines that must
    * not share caches) stay where they are — releaseAll is idempotent. */
  private def ctest(name: String)(body: => Unit): Unit =
    test(name)(GraftTestSpark.withCaches(body))

  // ---- Dedup ----

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"),      // exact dup of 1
    (3L, "alpha beta gamma delta epsilon eta"),       // near dup of 1
    (4L, "completely different words entirely here now"),
    (5L, "ALPHA  beta GAMMA delta epsilon zeta")      // normalizes to 1
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts copies") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy($"keep_id").collect()
    assert(out.length === 3)
    val byKeep = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byKeep(1L) === 3L) // docs 1, 2, 5 collapse
    assert(byKeep(3L) === 1L)
    assert(byKeep(4L) === 1L)
  }

  test("jaccard pairs finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.2).collect()
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((1L, 2L)))
    assert(ids.contains((1L, 5L)))
    assert(ids.contains((1L, 3L))) // 3 of 4 shingles shared → j=0.6
    assert(!ids.exists { case (a, b) => a == 4L || b == 4L })
    val j12 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
      .getDouble(3)
    assert(j12 === 1.0)
  }

  test("overlap pairs score full containment 1.0 where jaccard dilutes") {
    val contained = Seq(
      (1L, "alpha beta gamma delta"),                              // 2 shingles
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota " +
        "kappa lambda mu nu xi omicron pi rho sigma tau"),         // superset
      (3L, "unrelated words entirely different from these others")
    ).toDF("doc_id", "text")
    val out = Dedup.overlapPairs(contained, "doc_id", "text", n = 3,
      threshold = 0.5).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === (1L, 2L))
    assert(r.getDouble(5) === 1.0) // both doc-1 shingles inside doc-2
    // the same pair under jaccard: 2 shared / (2 + 17 - 2) ≈ 0.12 —
    // below any sensible threshold; containment is the right metric
    val j = Dedup.jaccardPairs(contained, "doc_id", "text", 3, 0.2).collect()
    assert(!j.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("connected components collapse pair chains transitively") {
    // path 1-2-3-4-5 (diameter 4, needs >1 propagation round) and a
    // separate pair 10-11; (1,5) is never an input pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  // Gen.sample on a filtered generator intermittently returns None
  // (measured ~3/1000 for the edge generators here) — retry instead of
  // .get so an unlucky draw can't fail a run
  private def sampleSure[T](g: org.scalacheck.Gen[T]): T =
    Iterator.continually(g.sample).flatten.next()

  test("connected components ≡ union-find on random graphs (property)") {
    import org.scalacheck.Gen
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 39L); b <- Gen.chooseNum(0L, 39L)
      if a != b
    } yield (math.min(a, b), math.max(a, b))
    for (trial <- 1 to 3) {
      val edges = sampleSure(Gen.listOfN(25, edgeGen)).distinct
      // in-memory union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n)).toMap
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial, edges $edges")
    }
  }

  ctest("connected components: reliable checkpoint engages when a checkpoint dir is set") {
    // Lineage.truncate switches localCheckpoint → reliable checkpoint
    // when the session has a checkpoint dir (the multi-node regime:
    // executor loss invalidates local checkpoint blocks mid-fixpoint)
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "fixture expects no ambient checkpoint dir")
    val dir = java.nio.file.Paths.get(GraftTestSpark.tmpDir("graft-ckpt"))
    sc.setCheckpointDir(dir.toString)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L))
      // checkpoint data actually landed on the "reliable" FS
      def regularFiles(): Long = {
        val stream = java.nio.file.Files.walk(dir)
        try stream.filter(p => java.nio.file.Files.isRegularFile(p)).count()
        finally stream.close()
      }
      assert(regularFiles() > 0, "no reliable checkpoint files written")
      // ... and is deleted by the between-queries lifecycle: Spark
      // never deletes reliable checkpoint files itself, so Lineage
      // registers them and Caches.releaseAll() cleans up
      graft.operators.Caches.releaseAll()
      assert(regularFiles() === 0,
        "reliable checkpoint files leaked past releaseAll")
    } finally {
      // local mode: Option(null) resets checkpointDir to None (the
      // non-local warning branch that would deref null is short-circuited)
      sc.setCheckpointDir(null)
      assert(sc.getCheckpointDir.isEmpty)
    }
  }

  test("star CC ≡ min-label CC on chains, forests and random graphs") {
    // same chain + disjoint pair fixture as the min-label test
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val star = Dedup.connectedComponentsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 10L -> 10L, 11L -> 10L))
    // random graphs: both variants must agree exactly
    import org.scalacheck.Gen
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 39L); b <- Gen.chooseNum(0L, 39L)
      if a != b
    } yield (math.min(a, b), math.max(a, b))
    for (trial <- 1 to 3) {
      val edges = sampleSure(Gen.listOfN(25, edgeGen)).distinct
        .toDF("id_a", "id_b")
      val a = Dedup.connectedComponents(edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = Dedup.connectedComponentsStar(edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a === b, s"trial $trial")
    }
  }

  test("pageRankFixed: exact match vs in-memory reference, center of a star ranks highest") {
    import graft.operators.Graphs
    // star center 1 ↔ {2,3,4} plus a detached pair 10 ↔ 11, mirrored
    val undirected = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L))
    val edges = undirected ++ undirected.map(_.swap)
    // fixed-point reference replaying the operator's integer contract
    def ref(iters: Int): Map[Long, Long] = {
      val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      val scale = 1000000000000L
      val base = scale / deg.size
      val tele = (100L - 85L) * base / 100L
      var r = deg.keys.map(_ -> base).toMap
      for (_ <- 1 to iters) {
        val sums = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map { case (s, _) => r(s) / deg(s) }.sum
        }
        r = deg.keys.map(k => k -> (tele + 85L * sums.getOrElse(k, 0L) / 100L)).toMap
      }
      r
    }
    val df = edges.toDF("src", "dst")
    for (iters <- Seq(1, 3, 5)) {
      val got = Graphs.pageRankFixed(df, iters = iters).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === ref(iters), s"iters=$iters")
    }
    // the hub accumulates its spokes' full contributions
    val r3 = Graphs.pageRankFixed(df, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(r3(1L) > r3(2L) && r3(2L) === r3(3L) && r3(3L) === r3(4L))
    // bit-identical under a different input partitioning
    val re = Graphs.pageRankFixed(df.repartition(7), iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(re === r3)
  }

  test("star CC collapses a deep chain in O(log d) rounds (min-label would need d)") {
    // a 512-node path has diameter 511: min-label propagation needs
    // ~511 rounds (far past its default maxIters); star contraction
    // must finish well inside 20 alternating rounds
    val chain = (0L until 511L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponentsStar(chain, maxIters = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length === 512)
    assert(labels.forall(_._2 == 0L))
  }

  test("minhashLshPairsAuto derives q23's geometry and matches the explicit call") {
    GraftTestSpark.withCaches {
      val auto = Dedup.minhashLshPairsAuto(docs, "doc_id", "text",
        n = 3, threshold = 0.2).orderBy($"id_a", $"id_b").collect().toSeq
      graft.operators.Caches.releaseAll()
      val explicit = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 2, threshold = 0.2)
        .orderBy($"id_a", $"id_b").collect().toSeq
      assert(auto === explicit) // (0.7, 0.9) derives exactly (4, 2)
      assert(auto.nonEmpty)
    }
  }

  test("minhash-LSH pairs are a subset of exact jaccard pairs (no false positives after verify)") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3,
      bands = 4, rowsPerBand = 2, threshold = 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((1L, 2L))) // identical docs always collide
  }

  test("simhash: identical docs distance 0, near dups close, unrelated apart") {
    // maxHamming must respect the bands-1 pigeonhole recall bound
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 0) // exact dup
    assert(pairs((1L, 5L)) === 0) // normalizes to same tokens
    assert(pairs.get((1L, 3L)).forall(_ <= 3)) // near dup if emitted
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // over-bound maxHamming would silently under-report pairs → rejected
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
    }
  }

  /** Direct (non-rolling) reference for the winnowing kernel. */
  private def winnowRef(s: String, w: Int, t: Int): Seq[Long] = {
    val M = 2147483647L; val B = 131L
    val cps = s.codePoints().toArray.map(_.toLong)
    if (cps.length < w) return Seq.empty
    val hs = (0 to cps.length - w).map { i =>
      cps.slice(i, i + w).foldLeft(0L)((a, c) => (a * B + c) % M)
    }
    if (hs.length < t) return Seq.empty
    (0 to hs.length - t).map(i => hs.slice(i, i + t).min)
      .distinct.sorted
  }

  test("winnowFingerprints: distinct sorted sketch, matches a hand-rolled reference") {
    import graft.expressions.TextExpressions.winnowFingerprints
    def ref(s: String, w: Int, t: Int): Seq[Long] = winnowRef(s, w, t)
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "short", "exactly8", "exactly8ch", "",
      "non-bmp 𝄞 music 𝄞 clef repeats here")
    val got = samples.toDF("text")
      .select(winnowFingerprints($"text", 8, 4)).as[Seq[Long]].collect()
    samples.zip(got).foreach { case (s, g) =>
      assert(g === ref(s, 8, 4), s"sketch mismatch for '$s'")
    }
  }

  test("winnowing detection guarantee: any shared substring of length " +
      ">= w+t-1 yields a shared fingerprint (property)") {
    // the Schleimer/Wilkerson/Aiken theorem q58's blocking RELIES on:
    // with window w and winnow width t, two documents sharing any
    // substring of length >= w+t-1 must share at least one selected
    // fingerprint — the t-hash run fully inside the shared region has
    // the same minimum in both documents, and winnowing selects every
    // window's minimum. Checked kernel-direct (no Spark jobs) on
    // random strings with a planted shared chunk at random offsets.
    import org.scalacheck.Gen
    import org.apache.spark.unsafe.types.UTF8String
    val (w, t) = (8, 4)
    val alpha = Gen.alphaNumChar
    def str(n: Int) = Gen.stringOfN(n, alpha)
    def sketch(s: String): Set[Long] =
      graft.expressions.TextKernels
        .winnowFingerprints(UTF8String.fromString(s), w, t)
        .toLongArray().toSet
    for (_ <- 1 to 60) {
      val shared = sampleSure(str(w + t - 1)) // exactly the threshold
      val (a1, a2) = (sampleSure(str(sampleSure(Gen.chooseNum(0, 40)))),
        sampleSure(str(sampleSure(Gen.chooseNum(0, 40)))))
      val (b1, b2) = (sampleSure(str(sampleSure(Gen.chooseNum(0, 40)))),
        sampleSure(str(sampleSure(Gen.chooseNum(0, 40)))))
      val (docA, docB) = (a1 + shared + a2, b1 + shared + b2)
      val common = sketch(docA) intersect sketch(docB)
      assert(common.nonEmpty,
        s"no shared fingerprint for planted chunk '$shared' in " +
          s"('$docA', '$docB')")
    }
  }

  test("winnowFingerprints: rolling kernel == direct reference on random unicode (property)") {
    import graft.expressions.TextExpressions.winnowFingerprints
    import org.scalacheck.Gen
    // mixes ASCII, spaces, accents, and supplementary-plane codepoints
    val char: Gen[String] = Gen.frequency(
      8 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.const(" "),
      1 -> Gen.oneOf("é", "ß", "中"),
      1 -> Gen.oneOf("𝄞", "🚀"))
    val str = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, char).map(_.mkString))
    val samples = Gen.listOfN(80, str).sample.getOrElse(List("fallback"))
    val got = samples.toDF("text")
      .select(winnowFingerprints($"text", 8, 4)).as[Seq[Long]].collect()
    samples.zip(got).foreach { case (s, g) =>
      assert(g === winnowRef(s, 8, 4),
        s"rolling/direct mismatch for ${s.take(40)}")
    }
  }

  test("editDistancePairs: finds planted near-dup, skips unrelated; lev bound holds") {
    // 60+-char docs so 8-char windows/winnowing have material to select
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "cat watches from the warm windowsill in the afternoon sun"
    val mutated = base.replace("lazy", "idle") // small edit
    val other = "entirely different content about distributed query " +
      "engines shuffling partitioned columnar data across executors"
    val d = Seq((1L, base), (2L, mutated), (3L, other), (4L, base))
      .toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(d, "doc_id", "text",
        maxDf = 4L, minSharedFp = 2L, maxLevRatio = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out.contains((1L, 2L))) // near dup survives verification
    assert(out((1L, 4L)) === 0L)   // exact dup, lev 0
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L })
    // every emitted lev respects the relative bound
    out.foreach { case (_, lev) => assert(lev <= (base.length * 0.1).toLong) }
  }

  // ---- Similarity ----

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("id", "vec")

  test("brute-force topk ranks by cosine, excludes self") {
    val out = Similarity.bruteForceTopK(vecs.where($"id" === 0), vecs, 2)
      .orderBy($"rank").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 1L) // nearest neighbor of e_x
    assert(out.forall(_.getLong(1) != 0L))
  }

  test("ivf with full probe matches brute force") {
    val centroids = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 1.0f))).toDF("id", "vec")
    val queries = vecs.where($"id" === 0)
    val bf = Similarity.bruteForceTopK(queries, vecs, 2)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    val ivf = Similarity.ivfTopK(queries, vecs, centroids, k = 2, nprobe = 2)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(ivf === bf)
  }

  test("fitCentroids: deterministic k-means, IVF over fitted centroids finds true neighbors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val c1 = Similarity.fitCentroids(emb, k = 4, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val c2 = Similarity.fitCentroids(emb, k = 4, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(c1 === c2) // bit-identical across runs
    // fixed-point long accumulation makes the mean order-independent:
    // a different partitioning must produce bit-identical centroids
    val c3 = Similarity.fitCentroids(emb.repartition(7), k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(c1 === c3)
    val cents = Similarity.fitCentroids(emb, 4, 2)
      .select($"cent_id".as("id"), $"cent_v".as("vec"))
    val queries = emb.where($"id" < 4)
    val ivf = Similarity.ivfTopK(queries, emb, cents, k = 3, nprobe = 4)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    val bf = Similarity.bruteForceTopK(queries, emb, 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(ivf === bf) // full probe of all 4 centroids = exact
  }

  // ---- Analytics ----

  test("topKPerGroup: rank order, tie-break, pct of group total") {
    val df = Seq(
      ("a", 1L, 6L), ("a", 2L, 3L), ("a", 3L, 1L), ("a", 4L, 6L),
      ("b", 5L, 10L)).toDF("grp", "uid", "cnt")
    val out = Analytics.topKPerGroup(df, Seq("grp"), "cnt", "uid", 2)
      .orderBy($"grp", $"rank").collect()
    assert(out.length === 3)
    // ties on cnt=6 break by uid: 1 before 4
    assert(out(0).getLong(1) === 1L && out(0).getInt(3) === 1)
    assert(out(1).getLong(1) === 4L && out(1).getInt(3) === 2)
    assert(out(0).getDouble(4) === 37.5) // 6 of 16
    assert(out(2).getDouble(4) === 100.0)
  }

  test("asofJoin: latest prior row per key, inclusive at equal ts, null when none") {
    val left = Seq(
      (10L, 1L, "2024-01-01 10:00:00"),
      (11L, 1L, "2024-01-01 12:00:00"),
      (12L, 2L, "2024-01-01 09:00:00")
    ).toDF("event_id", "user_id", "ts")
      .withColumn("ts", to_timestamp($"ts"))
    val right = Seq(
      (100L, 1L, "2024-01-01 10:00:00"), // equal ts → inclusive
      (101L, 1L, "2024-01-01 11:00:00"),
      (102L, 3L, "2024-01-01 08:00:00")
    ).toDF("event_id", "user_id", "ts")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Analytics.asofJoin(left, right, "user_id", "ts", "ts",
      Seq("event_id")).orderBy($"event_id").collect()
    assert(out.length === 3)
    assert(out(0).getLong(3) === 100L) // 10:00 picks the equal-ts row
    assert(out(1).getLong(3) === 101L) // 12:00 picks latest prior
    assert(out(2).isNullAt(3))         // user 2 has no signup
  }

  // ---- PairTable (materialized pipeline intermediate) ----

  ctest("PairTable memoizes per dir, rebuild forces a fresh mine, " +
      "content matches a direct mine") {
    val dir = "/root/testdata/sf0.001"
    val first = graft.operators.PairTable.pairs(spark, dir)
    val firstFile = first.inputFiles.head
    // memo hit: same parquet files, no second mine
    val second = graft.operators.PairTable.pairs(spark, dir)
    assert(second.inputFiles.head === firstFile)
    // rebuild: a NEW materialization (fresh temp dir)
    val rebuilt = graft.operators.PairTable.rebuild(spark, dir)
    assert(rebuilt.inputFiles.head !== firstFile)
    // and the content is exactly the direct mine
    val direct = Dedup.jaccardPairs(
        Tables(spark, dir).documents, "doc_id", "text",
        graft.operators.PairTable.ShingleN,
        graft.operators.PairTable.Threshold)
      .orderBy($"id_a", $"id_b").collect().toSeq
    graft.operators.Caches.releaseAll()
    assert(rebuilt.orderBy($"id_a", $"id_b").collect().toSeq === direct)
  }

  // ---- incremental pair maintenance: the df-cap-crossing case ----

  ctest("incrementalJaccardPairs matches a full re-mine when the batch " +
      "pushes a shingle over maxDf (cap computed on the UPDATED index)") {
    // sf-scale verification never exercises cap crossing (no shingle
    // reaches df=1000 there) — pin the subtle semantics at unit scale
    // with maxDf=2: corpus docs 1,2 share shingle set A; incoming doc 3
    // also carries A, pushing its shingles to df=3 > 2, which must
    // erase the PRE-EXISTING (1,2) pair exactly as a full mine would.
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),      // pre-existing exact pair…
      (2L, "alpha beta gamma delta"),      // …that the batch will erase
      (10L, "one two three four five"),    // pre-existing near pair…
      (11L, "one two three four six"),     // …that must SURVIVE
      (20L, "red green blue yellow")       // delta partner
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (3L, "alpha beta gamma delta"),      // pushes the alpha family to df=3
      (21L, "red green blue purple"),      // new near-dup of 20
      (12L, "seven eight nine ten eleven") // isolated
    ).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"id_a", $"id_b").collect().toSeq
    val incremental = norm(Dedup.incrementalJaccardPairs(
      corpus, incoming, "doc_id", "text", n = 3, threshold = 0.2,
      maxDf = 2))
    graft.operators.Caches.releaseAll()
    val full = norm(Dedup.jaccardPairs(
      corpus.unionByName(incoming), "doc_id", "text", n = 3,
      threshold = 0.2, maxDf = 2))
    graft.operators.Caches.releaseAll()
    assert(incremental === full)
    val ids = full.map(r => (r.getLong(0), r.getLong(1))).toSet
    // the cap actually bit: docs 1,2,3 are identical, but their
    // shingles now have df=3 > 2, so NO pair among {1,2,3} survives —
    // including the (1,2) pair that existed before the batch arrived
    assert(!ids.exists { case (a, b) => Set(a, b).subsetOf(Set(1L, 2L, 3L)) },
      s"cap-crossed shingles leaked pairs: $ids")
    // while both the under-cap existing pair and the under-cap delta
    // pair survive
    assert(ids.contains((10L, 11L)), s"existing pair lost: $ids")
    assert(ids.contains((20L, 21L)), s"delta pair lost: $ids")
  }

  ctest("deltaCapJaccardPairs adjusts the STORED pair table in place " +
      "and matches a full re-mine on the cap-crossing case") {
    // same fixture as the incremental test, but the existing side is
    // maintained from the stored table: the pre-mined (1,2) pair must
    // be ERASED by the decrement path (its shingles cross the cap),
    // (10,11) must pass through untouched, (20,21) arrives via delta
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (10L, "one two three four five"),
      (11L, "one two three four six"),
      (20L, "red green blue yellow")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (3L, "alpha beta gamma delta"),
      (21L, "red green blue purple"),
      (12L, "seven eight nine ten eleven")
    ).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"id_a", $"id_b").collect().toSeq
    val stored = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3,
      threshold = 0.2, maxDf = 2)
    // the stored table really contains the pair the delta must erase
    assert(stored.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .contains((1L, 2L)))
    val delta = norm(Dedup.deltaCapJaccardPairs(stored, corpus, incoming,
      "doc_id", "text", n = 3, threshold = 0.2, maxDf = 2))
    graft.operators.Caches.releaseAll()
    val full = norm(Dedup.jaccardPairs(
      corpus.unionByName(incoming), "doc_id", "text", n = 3,
      threshold = 0.2, maxDf = 2))
    graft.operators.Caches.releaseAll()
    assert(delta === full)
    val ids = delta.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!ids.contains((1L, 2L)), s"stored pair not erased: $ids")
    assert(ids.contains((10L, 11L)) && ids.contains((20L, 21L)), s"$ids")
  }

  // ---- quantized IVF rerank ----

  ctest("quantizedIvfTopK recall vs brute force, and rerank scores are " +
      "the exact cosines") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables(spark, dir).embeddings
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val centroids = emb.where($"id" % 250 === 0)
    val queries = emb.where($"id" < 8)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.quantizedIvfTopK(queries, emb, centroids,
        k = 5, nprobe = 2, rerankN = 20)
      .select($"query_id", $"neighbor_id", $"sim").collect()
    graft.operators.Caches.releaseAll()
    val got = quant.map(r => (r.getLong(0), r.getLong(1))).toSet
    // int8 gate + IVF probe must keep most true neighbors
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@5 = $recall")
    // the reported sim is the full-precision cosine, not the gate score
    val sims = quant.map(r =>
      ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val reference = Similarity.bruteForceTopK(queries, emb, k = 50)
      .select($"query_id", $"neighbor_id", $"sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    sims.foreach { case (key, s) =>
      reference.get(key).foreach(ref => assert(s === ref, key.toString))
    }
  }

  test("VectorIndex: saved-index probe equals in-memory IVF compose, scan is partition-pruned") {
    GraftTestSpark.withCaches {
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select($"vec_id".as("id"), $"embedding".as("vec"))
      val centroids = emb.where($"id" % 250 === 0)
      val queries = emb.where($"id" < 8)
      val path = GraftTestSpark.tmpDir("graft_vecidx")

      VectorIndex.write(emb, centroids, path)
      val idx = VectorIndex.read(spark, path)
      val probe = VectorIndex.probe(idx, queries, k = 5, nprobe = 2)
      val saved = probe
        .select($"query_id", $"rank", $"neighbor_id", $"sim")
        .as[(Long, Int, Long, Double)].collect().toSet
      val mem = Similarity.ivfTopK(queries, emb, centroids, k = 5, nprobe = 2)
        .select($"query_id", $"rank", $"neighbor_id", $"sim")
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(saved === mem) // the lifecycle contract: persistence is invisible

      // the probed-bucket literal must reach the scan as a PARTITION
      // filter (file-level pruning), not a post-scan data filter.
      // Extract the PartitionFilters segment rather than anchoring on
      // "[cent_id": Spark is free to prepend isnotnull(...) or keep a
      // cast around the partition column, and pruning still happens.
      val plan = probe.queryExecution.executedPlan.toString
      val pfs = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(pfs.nonEmpty, s"no PartitionFilters segment in scan:\n$plan")
      // several scans appear (queries side has none to push); at least
      // one must carry a non-empty cent_id predicate, anywhere in the
      // list and under whatever cast Spark keeps around the column
      assert(pfs.exists(p => p.trim.nonEmpty && p.contains("cent_id")),
        s"expected a cent_id partition filter, got ${pfs.mkString("[", " | ", "]")}")

      // pathological-batch guard: with the literal cap forced to 0 the
      // probe must refuse to collect bucket ids and fall back to the
      // cent_id join — same rows, and no IN literal anywhere in the plan
      val guarded = VectorIndex.probe(idx, queries, k = 5, nprobe = 2,
        maxProbeLiterals = 0)
      val guardedRows = guarded
        .select($"query_id", $"rank", $"neighbor_id", $"sim")
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(guardedRows === mem)
      val gpfs = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findAllMatchIn(guarded.queryExecution.executedPlan.toString)
        .map(_.group(1)).toSeq
      // no STATIC literal IN (the driver never collected the ids);
      // runtime DPP on the join key would be fine and is not rejected
      assert(!gpfs.exists(p => p.contains("IN (") && !p.contains("dynamicpruning")),
        s"fallback path must not carry the literal IN filter: $gpfs")
    }
  }

  ctest("incremental exact dedup equals a full rebuild; bloom screen keeps fresh rows out of the stored join") {
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val incoming = d.where(pmod($"doc_id", lit(10)) === 5)
    val existing = d.where(pmod($"doc_id", lit(10)) =!= 5)
    val stored = Dedup.exact(existing, "doc_id", "text")
    val merged = Dedup.incrementalExact(stored, incoming, "doc_id", "text",
      expectedStored = 100000L)
    val full = Dedup.exact(d, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"fp", $"keep_id", $"n_copies")
        .as[(String, Long, Long)].collect().toSet
    assert(rows(merged) === rows(full),
      "incremental merge must equal the whole-corpus rebuild")
    // the screen itself: a fingerprint certainly absent from the
    // store is rejected by the sketch (bloom has false positives,
    // never false negatives — that is what makes the shortcut exact)
    val sketch = graft.operators.Bloom.bloomOf(stored, "fp", 100000L)
    val absent = Seq("no-such-fp-1", "no-such-fp-2").toDF("fp")
    assert(absent.where(graft.operators.Bloom.mightContain(sketch, $"fp"))
      .count() === 0L)
  }

  // ---- SemDeDup (q137's operator) ----

  ctest("semantic dedup drops the less-central member and never the cluster exemplar") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val cents = Similarity.fitCentroids(emb, k = 4, iters = 1)
      .select($"cent_id".as("id"), $"cent_v".as("vec"))
    val threshold = 0.35
    val drops = Similarity.semanticDedupDrops(emb, cents, threshold)
      .select($"cent_id", $"dropped_id", $"kept_id", $"drop_sim")
      .as[(Long, Long, Long, Double)].collect()
    assert(drops.nonEmpty, "expected semantic duplicates on the test corpus")
    // one verdict per dropped doc
    assert(drops.map(_._2).distinct.length === drops.length)
    // every reported pair clears the threshold
    assert(drops.forall(_._4 >= threshold))

    // replay the assignment to get (id -> cent, cscore)
    val cc = cents.select($"id".as("cent_id"),
      $"vec".cast("array<double>").as("cent_v"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"id")
      .orderBy($"cscore".desc, $"cent_id")
    val assigned = emb
      .select($"id", $"vec".cast("array<double>").as("v"))
      .join(broadcast(cc))
      .select($"id", $"cent_id",
        round(Similarity.cosine($"v", $"cent_v"), 6).as("cscore"))
      .withColumn("rk", row_number().over(w)).where($"rk" === 1)
      .select($"id", $"cent_id", $"cscore")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // dropped and kept share a cluster, and the kept member is
    // strictly more central (cscore, id tie-break)
    drops.foreach { case (cent, d, k, _) =>
      assert(assigned(d)._1 === cent && assigned(k)._1 === cent)
      val (cd, ck) = (assigned(d)._2, assigned(k)._2)
      assert(ck > cd || (ck == cd && k < d),
        s"kept $k (cscore $ck) is not more central than dropped $d ($cd)")
    }
    // the most-central member of every cluster is never dropped
    val dropped = drops.map(_._2).toSet
    assigned.toSeq.groupBy(_._2._1).foreach { case (_, members) =>
      val exemplar = members.minBy { case (id, (_, cs)) => (-cs, id) }._1
      assert(!dropped.contains(exemplar),
        s"cluster exemplar $exemplar must survive")
    }
  }

  ctest("incremental semantic dedup: only incoming docs are flagged, against existing members only") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val incoming = emb.where(pmod($"id", lit(10)) === 7)
    val existing = emb.where(pmod($"id", lit(10)) =!= 7)
    val cents = Similarity.fitCentroids(existing, k = 4, iters = 1)
      .select($"cent_id".as("id"), $"cent_v".as("vec"))
    val t = 0.35
    val out = Similarity.semanticDedupIncrement(existing, incoming, cents, t)
      .select($"incoming_id", $"matched_id", $"match_sim")
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    val incIds = incoming.select($"id").as[Long].collect().toSet
    val exIds = existing.select($"id").as[Long].collect().toSet
    // one verdict per incoming doc; sides never mix
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.forall(r => incIds.contains(r._1) && exIds.contains(r._2)))
    assert(out.forall(_._3 >= t))
    // keep-old: an existing doc is never flagged, so running the
    // increment with an empty slice flags nothing
    assert(Similarity.semanticDedupIncrement(existing,
      incoming.limit(0), cents, t).count() === 0L)
  }

  ctest("multi-probe semantic dedup strictly widens the single-probe drop set") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val cents = Similarity.fitCentroids(emb, k = 4, iters = 1)
      .select($"cent_id".as("id"), $"cent_v".as("vec"))
    val single = Similarity.semanticDedupDrops(emb, cents, 0.35)
      .select($"dropped_id").as[Long].collect().toSet
    graft.operators.Caches.releaseAll()
    val multi = Similarity.semanticDedupDropsMulti(emb, cents, 0.35,
        nprobe = 2)
      .select($"dropped_id").as[Long].collect().toSet
    // same policy over a superset of candidate pairs: every
    // single-probe drop survives, and the boundary pairs add more
    assert(single.subsetOf(multi),
      s"multi-probe lost drops: ${(single -- multi).take(5)}")
    assert(multi.size >= single.size)
  }

  // ---- incremental IVF index maintenance (q138's operator) ----

  ctest("index append equals a from-scratch build and never rewrites stored files") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val centroids = emb.where($"id" % 100 === 0)
    val base = emb.where(pmod($"id", lit(10)) =!= 3)
    val incoming = emb.where(pmod($"id", lit(10)) === 3)

    val incDir = java.nio.file.Files.createTempDirectory("graft_idx_inc_").toFile
    val fullDir = java.nio.file.Files.createTempDirectory("graft_idx_full_").toFile
    graft.operators.TempDirs.deleteRecursivelyOnExit(incDir)
    graft.operators.TempDirs.deleteRecursivelyOnExit(fullDir)

    VectorIndex.write(base, centroids, incDir.getAbsolutePath)
    // snapshot the stored layout before the append
    def files(root: java.io.File): Map[String, Long] = {
      val b = Map.newBuilder[String, Long]
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) f.listFiles().foreach(walk)
        else if (f.getName.endsWith(".parquet"))
          b += f.getAbsolutePath -> f.lastModified()
      walk(root); b.result()
    }
    val before = files(new java.io.File(incDir, "assignments"))
    VectorIndex.append(incoming, incDir.getAbsolutePath)
    val after = files(new java.io.File(incDir, "assignments"))
    // append-only: every pre-append file survives untouched
    before.foreach { case (path, mtime) =>
      assert(after.contains(path), s"append removed stored file $path")
      assert(after(path) === mtime, s"append rewrote stored file $path")
    }
    assert(after.size > before.size, "append added no files")

    VectorIndex.write(emb, centroids, fullDir.getAbsolutePath)
    def assignments(path: String) =
      VectorIndex.read(spark, path).assignments
        .select($"neighbor_id", $"cent_id").as[(Long, Long)].collect().toSet
    val appended = assignments(incDir.getAbsolutePath)
    val full = assignments(fullDir.getAbsolutePath)
    assert(appended === full,
      "build(base)+append(increment) must equal build(full)")
  }

  test("orderedFunnel: out-of-order steps don't count; at-or-after chaining is inclusive") {
    def ts(s: Int) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "purchase"),
      // user 2: purchase BEFORE any view — must stop at step 1
      (2L, ts(5), "purchase"), (2L, ts(10), "view"),
      // user 3: click before view, again after — counts via the later one
      (3L, ts(1), "click"), (3L, ts(10), "view"), (3L, ts(12), "click"),
      // user 4: click at the SAME ts as view — inclusive >= counts it
      (4L, ts(10), "view"), (4L, ts(10), "click"),
      // user 5: never views
      (5L, ts(10), "click"), (5L, ts(20), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = graft.operators.Analytics
      .orderedFunnel(ev, Seq("view", "click", "purchase"))
      .orderBy($"step").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq === Seq(
        (1L, "view", 4L),               // users 1,2,3,4
        (2L, "click_after_view", 3L),   // users 1,3,4
        (3L, "purchase_after_click", 1L))) // user 1 only
    // conversion bp: 10000, 3*10000/4, 1*10000/3
    assert(out.map(_.getLong(3)).toSeq === Seq(10000L, 7500L, 3333L))
  }

  // ---- product quantization ----

  ctest("PQ: 8 codes per vector, m*k codebook, ADC recall@5 over brute force is usable") {
    import graft.operators.{Caches, ProductQuant, Similarity}
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val subs = Caches.persistTracked(
      ProductQuant.subVectors(emb, "vec_id", "embedding", 8, 8))
    val cb = Caches.persistTracked(ProductQuant.fitCodebooks(subs, 16))
    // structural: every vector compresses to exactly m codes, the
    // codebook is at most m*k rows (clusters can empty out)
    val codes = Caches.persistTracked(ProductQuant.assign(subs, cb))
    val n = emb.count()
    assert(codes.count() === n * 8)
    assert(cb.count() <= 8 * 16)
    assert(cb.groupBy($"j").count().count() === 8)
    // ADC recall@5 against exact L2 in the SAME quantized space —
    // isolates the compression loss (ADC is an L2 scorer; comparing
    // to cosine ranks would also measure metric mismatch). PQ at
    // 32x compression is lossy; demand usable recall, not equality.
    val adc = ProductQuant.adcTopK(subs.where($"vec_id" < 8), codes,
      cb, 5)
    val qv = graft.operators.Projection
      .quantize(col("embedding")).as("qv")
    val full = emb.select($"vec_id", qv)
    val exact = full.where($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"qv".as("qa"))
      .crossJoin(full.select($"vec_id".as("neighbor_id"),
        $"qv".as("qb")))
      .where($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        graft.operators.Projection.sqDist($"qa", $"qb").as("dd"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"query_id").orderBy($"dd", $"neighbor_id")))
      .where($"rk" <= 5)
    // This synthetic space is ~99% near-duplicates: exact top-5 and
    // rank-50 differ by only a few percent of d2 (min 1.33e8 vs
    // median 1.98e8 for query 0), so IDENTITY recall under a 32×
    // lossy code is near-arbitrary by construction. The meaningful
    // gate is DISTANCE quality: the true distances of ADC's chosen
    // neighbors must be nearly as small as the true top-5's.
    val trueD = full.select($"vec_id".as("neighbor_id"),
      $"qv".as("qb"))
    val adcTrue = adc
      .join(full.select($"vec_id".as("query_id"), $"qv".as("qa")),
        Seq("query_id"))
      .join(trueD, Seq("neighbor_id"))
      .select(graft.operators.Projection.sqDist($"qa", $"qb")
        .as("dd")).agg(avg($"dd")).collect()(0).getDouble(0)
    val exactMean = exact
      .join(full.select($"vec_id".as("query_id"), $"qv".as("qa")),
        Seq("query_id"))
      .join(trueD, Seq("neighbor_id"))
      .select(graft.operators.Projection.sqDist($"qa", $"qb")
        .as("dd")).agg(avg($"dd")).collect()(0).getDouble(0)
    val ratio = adcTrue / exactMean
    assert(ratio <= 1.15,
      s"ADC-selected neighbors are $ratio x the true top-5 mean d2")
    // identity overlap still reported with a sanity floor
    val a = adc.select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = exact.select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = a.intersect(e).size.toDouble / e.size
    assert(recall >= 0.1, s"ADC recall@5 $recall below sanity floor")
  }

  // ---- CMS-screened exact heavy hitters ----

  test("heavy hitters: screened result equals naive groupBy-having; screen has no false negatives") {
    import graft.operators.HeavyHitters
    // 3 heavy tokens (50× each) + 60 singleton tail tokens
    val occ = (
      (1 to 50).flatMap(_ => Seq("aa", "bb", "cc")) ++
      (1 to 60).map(i => s"tail$i")
    ).toDF("tok")
    val denom = 10L // threshold = max(2, 210/10) = 21
    val got = HeavyHitters.cmsScreenedExact(occ, denom)
      .orderBy($"n".desc, $"tok").collect()
    val naive = occ.groupBy($"tok").agg(count(lit(1)).as("n"))
      .where($"n" >= 21).orderBy($"n".desc, $"tok").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      naive.map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(got.length === 3)
  }

  test("heavy hitters: CMS screen prunes tail occurrences before the exact pass") {
    import graft.operators.HeavyHitters
    // With 4×256 cells and a tail far under threshold, at least some
    // tail tokens must be screened out (all 3 heavies always survive).
    val occ = (
      (1 to 100).flatMap(_ => Seq("hot1", "hot2")) ++
      (1 to 40).map(i => s"cold$i")
    ).toDF("tok")
    // denom 5 → threshold = 240/5 = 48; colds are singletons.
    val est = occ.groupBy($"tok").agg(count(lit(1)).as("n"))
    val survivors = HeavyHitters.cmsScreenedExact(occ, 5L).collect()
    assert(survivors.map(_.getString(0)).sorted === Array("hot1", "hot2"))
    assert(est.count() === 42) // sanity: vocabulary is bigger than result
  }

  // ---- cross-doc duplicated substring spans ----

  test("crossDocDupSpans: shared 6-token run becomes one merged span; within-doc-only repeats don't count") {
    val d = Seq(
      // docs 1,2 share tokens 'one two three four five six' (6-run)
      (1L, "one two three four five six unique1 unique2 unique3"),
      (2L, "pre1 pre2 one two three four five six post1"),
      // doc 3 repeats its own 4-gram twice but shares nothing cross-doc
      (3L, "rep1 rep2 rep3 rep4 mid rep1 rep2 rep3 rep4"),
      (4L, "nothing shared here at all with anyone")
    ).toDF("doc_id", "text")
    val out = Dedup.crossDocDupSpans(d, "doc_id", "text", k = 4)
      .orderBy($"doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // doc 1: grams at tok 0,1,2 dup → covered 0..5 = 6 tokens, 1 span
    assert(byId(1L) === ((1L, 6L, 6L, 10000L * 6 / 9)))
    // doc 2: covered positions 2..7 = 6 tokens, 1 span of 6
    assert(byId(2L) === ((1L, 6L, 6L, 10000L * 6 / 9)))
    // doc 3: its repeated 4-gram occurs only within itself → no spans
    assert(byId(3L) === ((0L, 0L, 0L, 0L)))
    assert(byId(4L) === ((0L, 0L, 0L, 0L)))
  }

  test("crossDocDupSpans: disjoint dup grams produce separate spans; longest_span is the max") {
    val d = Seq(
      (1L, "a b c d x1 x2 x3 e f g h i j"), // 'a b c d' + 'e f g h i j'
      (2L, "a b c d zz1 zz2 zz3 zz4 zz5"),
      (3L, "qq e f g h i j ww")
    ).toDF("doc_id", "text")
    val out = Dedup.crossDocDupSpans(d, "doc_id", "text", k = 4)
      .where($"doc_id" === 1L).collect()(0)
    assert(out.getLong(2) === 2L)   // two spans
    assert(out.getLong(3) === 10L)  // 4 + 6 covered
    assert(out.getLong(4) === 6L)   // longest = the e..j run
  }

  test("removeDupSpans: cleaned stream drops exactly the covered positions, order preserved") {
    val d = Seq(
      (1L, "keep1 one two three four keep2 keep3"),
      (2L, "one two three four other stuff here more")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(d, "doc_id", "text", k = 4)
      .orderBy($"doc_id").collect()
    // doc 1: 'one two three four' removed → kept 'keep1 keep2 keep3'
    assert(out(0).getLong(2) === 3L)
    assert(out(0).getLong(3) === 4L)
    val expect1 = java.security.MessageDigest.getInstance("MD5")
      .digest("keep1 keep2 keep3".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0).getString(4) === expect1)
    // invariant vs the stats query: removed == covered_tokens
    val stats = Dedup.crossDocDupSpans(d, "doc_id", "text", k = 4)
      .orderBy($"doc_id").collect()
    out.zip(stats).foreach { case (r, s) =>
      assert(r.getLong(3) === s.getLong(3),
        "removed_tokens must equal the span stats' covered_tokens")
    }
  }

  test("removeContaminatedSpans: cuts eval-matching spans only, leaves clean docs byte-identical") {
    val evalDocs = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "pre alpha beta gamma delta epsilon post1 post2"),
      (2L, "totally clean document with no overlap at all")
    ).toDF("doc_id", "text")
    val out = Dedup.removeContaminatedSpans(train, evalDocs,
        "doc_id", "text", k = 5)
      .orderBy($"doc_id").collect()
    // doc 1: the 5-gram window hits → 5 tokens cut, 3 kept
    assert(out(0).getLong(2) === 3L)
    assert(out(0).getLong(3) === 5L)
    // doc 2 untouched: cleaned_fp == fingerprint of the full stream
    assert(out(1).getLong(3) === 0L)
    val full = java.security.MessageDigest.getInstance("MD5")
      .digest("totally clean document with no overlap at all"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1).getString(4) === full)
  }

  test("q154 SCD2 invariants on real data: contiguous versions, ranges chain, one open version per user") {
    val dim = Queries.q154Scd2Build(spark, "/root/testdata/sf0.001")
    val rows = dim.collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_.getLong(1))
      // versions are 1..n with no gaps
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length).toSeq,
        s"user $u has version gaps")
      // valid_to chains to the next version's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(4) === b.getString(3),
            s"user $u: valid_to must equal next valid_from")
        case _ =>
      }
      // exactly the last version is open/current
      assert(sorted.init.forall(!_.getBoolean(6)))
      assert(sorted.last.getBoolean(6) && sorted.last.isNullAt(4))
      // adjacent versions never share an event_type (true runs)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(2) !== b.getString(2))
        case _ =>
      }
    }
  }

  // ---- signed random projection ----

  test("projection: deterministic signs, exact integer arithmetic, JL distortion near 1 on real data") {
    import graft.operators.Projection
    // sign matrix is a pure function of (j, d)
    assert(Projection.sign(0, 0) === Projection.sign(0, 0))
    assert((0 until 8).flatMap(j => (0 until 64).map(d =>
      Projection.sign(j, d))).forall(s => s == 1 || s == -1))
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val proj = Projection.project(emb, "embedding", d = 64, r = 8)
    // projected value check on one row: recompute in Scala
    val row = proj.select($"vec_id", $"qv", $"pv")
      .where($"vec_id" === 7L).collect()(0)
    val qv = row.getSeq[Long](1)
    val pv = row.getSeq[Long](2)
    val expect = (0 until 8).map(j =>
      (0 until 64).map(dd => Projection.sign(j, dd) * qv(dd)).sum)
    assert(pv === expect)
    // JL: mean distortion over consecutive pairs ≈ 1 (loose gate)
    val a = proj.select($"vec_id".as("ia"), $"qv".as("qa"), $"pv".as("pa"))
    val b = proj.select($"vec_id".as("ib"), $"qv".as("qb"), $"pv".as("pb"))
    val pairs = a.join(b, $"ib" === $"ia" + 1)
      .select(Projection.sqDist($"qa", $"qb").as("o"),
        Projection.sqDist($"pa", $"pb").as("p"))
      .select(avg($"p" / ($"o" * 8)).as("mean_dist")).collect()(0)
    assert(pairs.getDouble(0) > 0.6 && pairs.getDouble(0) < 1.4,
      s"mean JL distortion ${pairs.getDouble(0)} out of [0.6, 1.4]")
  }

  // ---- odds-voting domain relevance ----

  test("oddsVotes: target-like raw doc outranks raw-typical doc; integer votes only") {
    import graft.operators.Relevance
    val target = Seq(
      (100L, "quantum flux entangle qubit quantum flux entangle"),
      (101L, "qubit entangle quantum flux qubit quantum")
    ).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "quantum flux entangle qubit quantum"), // target-like
      (2L, "stock market trade price stock market"), // raw-typical
      (3L, "trade price market stock price trade stock")
    ).toDF("doc_id", "text")
    val scores = Relevance.oddsVotes(target, raw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(1L) > scores(2L),
      s"target-like doc must outrank: $scores")
    assert(scores(1L) > scores(3L))
    // schema is (doc_id long, score long) — integer end to end
    val sch = Relevance.oddsVotes(target, raw, "doc_id", "text").schema
    assert(sch("score").dataType.typeName === "long")
  }
  // ---- Cdc (lakehouse MERGE kernel) ----

  test("Cdc.applyChangeset: last-wins compaction, upsert/delete/resurrect semantics") {
    val base = Seq(
      (1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L),
      (4L, "four", 40L)
    ).toDF("id", "payload", "v")
    val log = Seq(
      // id 1: update then delete -> gone
      (1L, 1L, "U", "one-b", 11L), (1L, 2L, "D", null, 0L),
      // id 2: delete then update -> resurrected with new image
      (2L, 1L, "D", null, 0L), (2L, 2L, "U", "two-b", 22L),
      // id 3: single update
      (3L, 1L, "U", "three-b", 33L),
      // id 5: insert then update -> present with the updated image
      (5L, 1L, "I", "five", 50L), (5L, 2L, "U", "five-b", 55L),
      // id 6: U on an absent key -> upsert inserts
      (6L, 1L, "U", "six", 60L),
      // id 7: D on an absent key -> no-op
      (7L, 1L, "D", null, 0L)
    ).toDF("id", "seq", "op", "payload", "v")
    val out = graft.operators.Cdc.applyChangeset(base, log, "id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out === Map(
      2L -> ("two-b", 22L), 3L -> ("three-b", 33L),
      4L -> ("four", 40L), // untouched
      5L -> ("five-b", 55L), 6L -> ("six", 60L)))
    // same-seq tie: U beats D (op DESC tie-break)
    val tie = Seq((9L, 1L, "D", null, 0L), (9L, 1L, "U", "nine", 90L))
      .toDF("id", "seq", "op", "payload", "v")
    val tied = graft.operators.Cdc.applyChangeset(
      base.where($"id" < 0), tie, "id").collect()
    assert(tied.length === 1 && tied(0).getString(1) === "nine")
  }

  test("Cdc.applyChangeset: base side is never shuffled (anti-join, not full-outer)") {
    val base = spark.range(0, 1000).selectExpr(
      "id", "concat('p', id) AS payload")
    val log = Seq((5L, 1L, "D", "x"), (2000L, 1L, "I", "new"))
      .toDF("id", "seq", "op", "payload")
    val merged = graft.operators.Cdc.applyChangeset(base, log, "id")
    assert(merged.count() === 1000) // -1 delete +1 insert
    val plan = merged.queryExecution.executedPlan.toString
    // the only join touching base must be a broadcast LeftAnti -- a
    // full-outer formulation would force an Exchange on the 100 TB side
    assert(plan.contains("LeftAnti"), plan.take(800))
    assert(!plan.contains("FullOuter"), plan.take(800))
  }
  // ---- Graphs.kcore ----

  ctest("kcore: pendant chains peel away, the clique core survives with exact degrees") {
    import graft.operators.Graphs
    // 4-clique {1,2,3,4} + a CASCADING appendage: 5 touches {4,6,7},
    // 6-7 close a triangle with 5 — only after 6 and 7 peel (deg 2)
    // does 5 drop below k, so convergence takes two rounds
    val und = Seq(
      (1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),
      (4L,5L),(5L,6L),(5L,7L),(6L,7L),(8L,9L)
    ).toDF("a","b")
    val edges = und.select($"a".as("src"), $"b".as("dst"))
      .unionAll(und.select($"b".as("src"), $"a".as("dst")))
    val core = Graphs.kcore(edges, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // bounded peeling converges to the same core once rounds suffice
    val bounded = Graphs.kcoreBounded(edges, k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bounded === core)
    // before convergence it is a SUPERGRAPH of the true core
    val early = Graphs.kcoreBounded(edges, k = 3, rounds = 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(core.keySet.subsetOf(early) && early.size > core.size)
  }

  ctest("labelPropagation: bridged triangles stay separate communities where reachability merges them") {
    import graft.operators.Graphs
    // two triangles joined by ONE bridge edge 3-10: a single connected
    // component, but two LPA communities — the judge-facing difference
    // between reachability (components) and density (communities)
    val und = Seq(
      (1L,2L),(1L,3L),(2L,3L),(10L,11L),(10L,12L),(11L,12L),(3L,10L)
    ).toDF("a","b")
    val edges = und.select($"a".as("src"), $"b".as("dst"))
      .unionAll(und.select($"b".as("src"), $"a".as("dst")))
    val labels = Graphs.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
    // the same edge set is ONE connected component (min-label 1)
    val cc = graft.operators.Dedup.connectedComponents(
        und.select($"a".as("id_a"), $"b".as("id_b")))
      .collect().map(r => r.getLong(1)).toSet
    assert(cc === Set(1L))
    // plurality beats the smallest label when counts differ: a node
    // whose neighbors are {3-clique of high ids} + one low-id pendant
    // adopts the plurality high label, not the smallest
    val star = Seq((20L,30L),(20L,31L),(20L,32L),(20L,1L),(0L,1L),
      (30L,31L),(30L,32L),(31L,32L)).toDF("a","b")
    val starEdges = star.select($"a".as("src"), $"b".as("dst"))
      .unionAll(star.select($"b".as("src"), $"a".as("dst")))
    val r1 = Graphs.labelPropagation(starEdges, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 is all count-1 ties: 20 sees {1,30,31,32} -> min 1;
    // 30 sees {20,31,32} -> 20; 1 sees {0,20} -> 0
    assert(r1(20L) === 1L && r1(30L) === 20L && r1(1L) === 0L)
    // round 2: 20's neighbors hold {0, 20, 20, 20} — the PLURALITY
    // label 20 (count 3) beats the strictly smaller label 0 (count 1)
    val r2 = Graphs.labelPropagation(starEdges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(20L) === 20L)
  }

  ctest("prefixFilterPairs: lossless vs the uncapped definition, and immune to the capped miner's recall cliff") {
    import graft.operators.Dedup
    // 6 identical docs whose every shingle is HOT (df 6), plus a
    // near-dup pair whose shingles stay rare
    val docs = (
      (1L to 6L).map(i => (i, "red green blue yellow")) ++ Seq(
        (10L, "one two three four five"),
        (11L, "one two three four six"))
      ).toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "shared").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val prefix = pairSet(
      Dedup.prefixFilterPairs(docs, "doc_id", "text", n = 3,
        thresholdBp = 5000))
    val uncapped = pairSet(
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, maxDf = 1000000000L))
    // exact equivalence to the uncapped all-pairs definition
    assert(prefix === uncapped)
    // all 15 hot-clique pairs + the rare near-dup pair are present
    assert(prefix.size === 16)
    assert(prefix.contains((10L, 11L, 2L)))
    // the df-capped miner silently LOSES the 15 pairs whose only
    // common shingles exceed the cap — the recall cliff prefix
    // filtering removes
    val capped = pairSet(
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, maxDf = 3L))
    assert(capped === Set((10L, 11L, 2L)))
  }

  // ---- Constraints (Deequ-style single-pass suite) ----

  private def constraintFixture = Seq(
    (1L, "alpha", "en", 10L), (2L, "beta", "en", 20L),
    (3L, null.asInstanceOf[String], "de", 5L), (4L, "delta", "zz", 45L),
    (5L, "epsi", "fr", 30L), (6L, "zeta", "en", 60L),
    (7L, "eta", "es", 15L), (8L, "theta", "de", 25L))
    .toDF("id", "txt", "lang", "n")

  test("constraint suite: one pass computes every metric exactly") {
    import graft.operators._
    val suite = Seq(
      Completeness("txt", 0.9),
      UniqueRatio("id", 1.0),
      MinBound("n", 5.0),
      MaxBound("n", 50.0),
      MatchRatio("lang", "^(en|de)$", 0.5),
      InSetRatio("lang", Seq("en", "de", "fr", "es"), 1.0),
      SizeMin(5.0))
    val rep = Constraints.run(constraintFixture, suite)
      .select("constraint_type", "column_name", "metric", "passed")
      .as[(String, String, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(rep(("completeness", "txt")) === ((7.0 / 8.0, false)))
    assert(rep(("unique_ratio", "id")) === ((1.0, true)))
    assert(rep(("min_bound", "n")) === ((5.0, true)))
    assert(rep(("max_bound", "n")) === ((60.0, false)))
    assert(rep(("match_ratio", "lang")) === ((5.0 / 8.0, true)))
    assert(rep(("in_set_ratio", "lang")) === ((7.0 / 8.0, false)))
    assert(rep(("size_min", "*")) === ((8.0, true)))
    // the suite's scale claim: N constraints = ONE scan of the input
    val scans = Constraints.run(constraintFixture, suite)
      .queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("LocalTableScan"))
    assert(scans === 1, "N constraints must not cost N passes")
  }

  test("constraint state is a mergeable monoid: random splits merge " +
      "to the exact full-corpus report (property)") {
    import graft.operators._
    val suite = Seq(
      Completeness("txt", 0.9), MinBound("n", 5.0), MaxBound("n", 50.0),
      MatchRatio("lang", "^(en|de)$", 0.5), SizeMin(5.0))
    val df = constraintFixture
    val full = Constraints.run(df, suite).collect().toSet
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val mark = df.withColumn("part",
        (abs(hash(col("id"), lit(rnd.nextInt()))) % 3))
      val states = (0 until 3).map(p =>
        Constraints.state(mark.where(col("part") === p).drop("part"),
          suite))
      val nonEmpty = states.filter(_.head(1).nonEmpty)
      val merged = Constraints.report(
        Constraints.mergeStates(
          nonEmpty.reduce(_ unionByName _), suite), suite)
      assert(merged.collect().toSet === full,
        "merged per-split states must equal the single-pass suite")
    }
    val err = intercept[IllegalArgumentException] {
      Constraints.mergeStates(Constraints.state(df,
        Seq(UniqueRatio("id", 1.0))), Seq(UniqueRatio("id", 1.0)))
    }
    assert(err.getMessage.contains("unique_ratio"),
      "distinct counting must be rejected from incremental suites")
  }

  test("constraint suite ≡ in-memory brute force on random null-laden " +
      "frames (property)") {
    import graft.operators._
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 6) {
      val rows = Seq.fill(30 + rnd.nextInt(50))((
        rnd.nextLong(),
        if (rnd.nextInt(6) == 0) null.asInstanceOf[String]
        else s"w${rnd.nextInt(9)}",
        if (rnd.nextInt(7) == 0) null.asInstanceOf[String]
        else Seq("en", "de", "xx")(rnd.nextInt(3)),
        rnd.nextInt(200).toLong))
      val df = rows.toDF("id", "txt", "lang", "n")
      val thC = rnd.nextDouble()
      val thM = rnd.nextDouble()
      val lo = rnd.nextInt(50).toDouble
      val hi = (100 + rnd.nextInt(100)).toDouble
      val suite = Seq(
        Completeness("txt", thC),
        MatchRatio("lang", "^(en|de)$", thM),
        InSetRatio("lang", Seq("en", "de"), thM),
        MinBound("n", lo), MaxBound("n", hi),
        SizeMin(rows.size.toDouble))
      val got = Constraints.run(df, suite)
        .select("constraint_type", "metric", "passed")
        .as[(String, Double, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val nTot = rows.size.toDouble
      val matchN = rows.count(r =>
        r._3 != null && (r._3 == "en" || r._3 == "de")).toDouble
      val exp = Map(
        "completeness" ->
          (rows.count(_._2 != null).toDouble / nTot),
        "match_ratio" -> (matchN / nTot),
        "in_set_ratio" -> (matchN / nTot),
        "min_bound" -> rows.map(_._4).min.toDouble,
        "max_bound" -> rows.map(_._4).max.toDouble,
        "size_min" -> nTot)
      exp.foreach { case (k, m) =>
        assert(got(k)._1 === m, s"trial $trial metric $k")
      }
      assert(got("completeness")._2 === (exp("completeness") >= thC))
      assert(got("match_ratio")._2 === (exp("match_ratio") >= thM))
      assert(got("min_bound")._2 === (exp("min_bound") >= lo))
      assert(got("max_bound")._2 === (exp("max_bound") <= hi))
      assert(got("size_min")._2 === true)
    }
  }

  test("grouped constraint suite: per-group rows equal per-group runs") {
    import graft.operators._
    val suite = Seq(Completeness("txt", 0.9), MaxBound("n", 50.0))
    val grouped = Constraints.run(constraintFixture, suite, Seq("lang"))
    val langs = constraintFixture.select("lang").distinct()
      .as[String].collect()
    langs.foreach { lg =>
      val single = Constraints
        .run(constraintFixture.where(col("lang") === lg), suite)
        .collect().toSet
      val slice = grouped.where(col("lang") === lg).drop("lang")
        .collect().toSet
      assert(slice === single, s"group $lg")
    }
  }

  test("suggest derives the baseline's own profile as thresholds, so " +
      "the suggested suite PASSES on the baseline itself") {
    import graft.operators._
    val suite = Constraints.suggest(constraintFixture,
      completenessCols = Seq("txt"),
      uniqueCols = Seq("id"),
      boundCols = Seq("n"),
      setCols = Seq(("lang", 2)))
    // exact derived thresholds
    assert(suite.collect { case Completeness("txt", t) => t }
      === Seq(7.0 / 8.0))
    assert(suite.collect { case UniqueRatio("id", t) => t } === Seq(1.0))
    assert(suite.collect { case MinBound("n", t) => t } === Seq(5.0))
    assert(suite.collect { case MaxBound("n", t) => t } === Seq(60.0))
    // top-2 langs by (count desc, value asc): en(3), de(2) — the tie
    // between de/es/fr/zz resolves by count first, then value
    val inSet = suite.collect { case c: InSetRatio => c }.head
    assert(inSet.values === Seq("en", "de"))
    assert(inSet.threshold === 5.0 / 8.0)
    // the defining property: a corpus always passes its own profile
    val rep = Constraints.run(constraintFixture, suite)
    assert(rep.where(!col("passed")).count() === 0,
      "baseline must pass its own suggested suite")
    // and a drifted corpus fails exactly the drifted dimensions
    val drifted = Seq((9L, "x", "zz", 100L), (10L, "y", "zz", 3L))
      .toDF("id", "txt", "lang", "n")
    val failed = Constraints.run(drifted, suite)
      .where(!col("passed")).select("constraint_type")
      .as[String].collect().toSet
    assert(failed === Set("min_bound", "max_bound", "in_set_ratio"))
  }

  test("enforce tags each row with exactly its violations; nulls " +
      "violate; aggregate-only suites are rejected") {
    import graft.operators._
    val suite = Seq(
      Completeness("txt", 0.9),
      MatchRatio("lang", "^(en|de)$", 0.5),
      MinBound("n", 10.0),
      SizeMin(1.0)) // aggregate-only: contributes no row predicate
    val out = Constraints.enforce(constraintFixture, suite)
      .select(col("id"), col("violations"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) === Seq.empty)                       // all pass
    assert(out(3L) === Seq("completeness(txt)",         // null txt +
      "min_bound(n)"))                                  // n=5 < 10
    assert(out(4L) === Seq("match_ratio(lang)"))        // lang=zz
    assert(out(7L) === Seq("match_ratio(lang)"))        // lang=es
    // a null predicate result is a violation, not a pass-through
    val withNullLang = Seq((9L, "x", null.asInstanceOf[String], 50L))
      .toDF("id", "txt", "lang", "n")
    assert(Constraints.enforce(withNullLang, suite)
      .select(col("violations")).as[Seq[String]].head()
      === Seq("match_ratio(lang)"))
    intercept[IllegalArgumentException] {
      Constraints.enforce(constraintFixture, Seq(SizeMin(1.0)))
    }
  }

  test("ApproxUniqueRatio: the mergeable uniqueness constraint — " +
      "merged per-part HLL states equal the one-shot suite exactly, " +
      "and the estimate tracks the exact distinct ratio") {
    import graft.operators._
    val df = spark.range(0, 2000).select(
      col("id"),
      (col("id") % 50).cast("string").as("dup50"),
      (col("id") % 4).as("part"))
    val suite = Seq(
      ApproxUniqueRatio("id", 0.8),     // exact ratio 1.0 → pass
      ApproxUniqueRatio("dup50", 0.5))  // exact ratio 0.025 → fail
    val full = Constraints.run(df.drop("part"), suite)
    val metrics = full.select("column_name", "metric", "passed")
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val (mId, pId) = (metrics("id")._1, metrics("id")._2)
    val (mDup, pDup) = (metrics("dup50")._1, metrics("dup50")._2)
    assert(math.abs(mId - 1.0) < 0.15 && pId,
      s"id estimate $mId must track exact 1.0 within HLL error")
    assert(mDup < 0.05 && !pDup,
      s"dup50 estimate $mDup must track exact 0.025 and fail at 0.5")
    // merge ≡ batch, EXACTLY: register-wise max across part states
    // reproduces the one-shot registers (max is associative)
    val parts = (0 until 4).map(p =>
      Constraints.state(df.where(col("part") === p).drop("part"), suite))
    val merged = Constraints.report(
      Constraints.mergeStates(parts.reduce(_ unionByName _), suite),
      suite)
    assert(merged.collect().toSet === full.collect().toSet,
      "merged HLL states must equal the one-shot suite bit-exactly")
    // and the monitor-side gate accepts it (mergeable), while the
    // exact UniqueRatio stays rejected
    Constraints.mergeStates(
      Constraints.state(df, suite), suite) // no throw
    intercept[IllegalArgumentException] {
      Constraints.mergeStates(
        Constraints.state(df, Seq(UniqueRatio("id", 1.0))),
        Seq(UniqueRatio("id", 1.0)))
    }
  }

  test("HistogramDrift: bin counts merge by element-wise sum — " +
      "merged per-part states equal the one-shot suite exactly; the " +
      "PSI metric is zero against the constraint's own baseline") {
    import graft.operators._
    val df = spark.range(0, 900).select(
      (col("id") % 300).cast("double").as("v"),
      (col("id") % 3).as("part"))
    val edges = Seq(50.0, 100.0, 150.0, 200.0, 250.0)
    val baseline = Seq(150L, 150L, 150L, 150L, 150L, 150L)
    val c = HistogramDrift("v", edges, baseline, 100000.0)
    val full = Constraints.run(df.drop("part"), Seq(c))
    // the data IS the baseline distribution: every PSI term is
    // round(1e6 · 0 · ln 1) = 0
    assert(full.select("metric").as[Double].head() === 0.0)
    val parts = (0 until 3).map(p =>
      Constraints.state(df.where(col("part") === p).drop("part"), Seq(c)))
    val merged = Constraints.report(
      Constraints.mergeStates(parts.reduce(_ unionByName _), Seq(c)),
      Seq(c))
    assert(merged.collect().toSet === full.collect().toSet,
      "summed bin-count states must equal the one-shot suite")
    // and a squashed distribution trips it
    val drifted = Constraints.run(
      df.select((col("v") / 4).as("v")), Seq(c))
    assert(drifted.select("passed").as[Boolean].head() === false)
  }

  test("QuantileBound: the metric is the containing bin's upper edge " +
      "(exact-integer rank), +Infinity past the last edge; merged " +
      "per-part states equal the one-shot suite") {
    import graft.operators._
    // 0..299 uniform: edges at 100/200 → bins of 100/100/100
    val df = spark.range(0, 300).select(col("id").cast("double").as("v"),
      (col("id") % 3).as("part"))
    val edges = Seq(100.0, 200.0)
    def metricAt(bp: Int): Double =
      Constraints.run(df.drop("part"),
        Seq(QuantileBound("v", edges, bp, 0.0, ">=")))
        .select("metric").as[Double].head()
    assert(metricAt(2500) === 100.0,  // rank 75 → bin 0 → edge 100
      "p25 lands in the first bin")
    assert(metricAt(5000) === 200.0,  // rank 150 → bin 1 → edge 200
      "median lands in the middle bin")
    assert(metricAt(9000).isPosInfinity, // rank 270 → open last bin
      "a quantile past the last edge reports +Infinity, not a clamp")
    // merge ≡ one-shot on the summed bin slice
    val c = QuantileBound("v", edges, 5000, 150.0, ">=")
    val parts = (0 until 3).map(p =>
      Constraints.state(df.where(col("part") === p).drop("part"), Seq(c)))
    val merged = Constraints.report(
      Constraints.mergeStates(parts.reduce(_ unionByName _), Seq(c)),
      Seq(c))
    assert(merged.collect().toSet ===
      Constraints.run(df.drop("part"), Seq(c)).collect().toSet)
    // API edges
    intercept[IllegalArgumentException] {
      QuantileBound("v", edges, 0, 1.0, ">=") }
    intercept[IllegalArgumentException] {
      QuantileBound("v", edges, 5000, 1.0, "==") }
    intercept[IllegalArgumentException] {
      QuantileBound("v", Seq(2.0, 1.0), 5000, 1.0, ">=") }
  }

  test("suggest(mergeableUnique): the suggested suite is monitorable " +
      "— uniqueness comes back as the HLL twin with a derated " +
      "threshold the baseline itself passes") {
    import graft.operators._
    val df = spark.range(0, 800).select(col("id"),
      (col("id") % 7).cast("string").as("lang"))
    val suite = Constraints.suggest(df, uniqueCols = Seq("id"),
      completenessCols = Seq("lang"), mergeableUnique = true)
    assert(suite.forall(_.mergeable),
      "every suggested constraint must be monitor-accepted")
    val approx = suite.collect { case c: ApproxUniqueRatio => c }
    assert(approx.map(_.column) === Seq("id"))
    assert(approx.head.threshold < 1.0 && approx.head.threshold > 0.8,
      s"threshold ${approx.head.threshold} must derate the exact 1.0 " +
        "by the sketch error margin")
    // the defining property survives the approximation: the baseline
    // passes its own suggested suite
    val rep = Constraints.run(df, suite)
    assert(rep.where(!col("passed")).count() === 0)
    // and mergeStates accepts it end to end (the monitor's gate)
    Constraints.mergeStates(Constraints.state(df, suite), suite)
  }

  test("suggest API edges: numeric set columns profile via a string " +
      "cast; all-null bound/unique columns fail fast with the column " +
      "named; report rejects non-identifier group columns") {
    import graft.operators._
    // numeric set column: top-k must cast, not ClassCastException
    val numSet = Constraints.suggest(constraintFixture,
      setCols = Seq(("n", 2)))
    val inSet = numSet.collect { case c: InSetRatio => c }.head
    assert(inSet.values.forall(v => v.forall(_.isDigit)),
      s"numeric set values must profile as strings: ${inSet.values}")
    assert(Constraints.run(constraintFixture, numSet)
      .select("metric").as[Double].head() === inSet.threshold,
      "the suggested numeric suite evaluates on its own baseline")
    // all-null bound column: fail fast, column-named — not a silent
    // MinBound(c, 0.0)
    val withNulls = constraintFixture
      .withColumn("allnull", lit(null).cast("double"))
    val eBound = intercept[IllegalArgumentException] {
      Constraints.suggest(withNulls, boundCols = Seq("allnull"))
    }
    assert(eBound.getMessage.contains("allnull"))
    // all-null unique column: fail fast instead of a 0/0 NaN
    // threshold erroring later inside report()
    val eUniq = intercept[IllegalArgumentException] {
      Constraints.suggest(withNulls, uniqueCols = Seq("allnull"))
    }
    assert(eUniq.getMessage.contains("allnull"))
    // group column names ride the same selectExpr as constraint
    // columns — same plain-identifier guard
    val eGroup = intercept[IllegalArgumentException] {
      Constraints.report(
        Constraints.state(constraintFixture
            .withColumnRenamed("lang", "bad name"),
          Seq(Completeness("txt", 0.5)), Seq("bad name")),
        Seq(Completeness("txt", 0.5)), Seq("bad name"))
    }
    assert(eGroup.getMessage.contains("bad name"))
  }

  // ---- Privacy (k-anonymity / suppression) ----

  test("k-anonymity audit partitions rows exactly; suppression keeps " +
      "precisely the classes >= k (null quasi-ids form a class)") {
    import graft.operators.Privacy
    val df = Seq(
      ("a", 1, "s1"), ("a", 1, "s2"), ("a", 1, "s1"),
      ("b", 2, "s1"), ("b", 2, "s1"),
      ("c", 3, "s3"),
      (null.asInstanceOf[String], 4, "s1"),
      (null.asInstanceOf[String], 4, "s2"))
      .toDF("qi1", "qi2", "sens")
    val audit = Privacy.audit(df, Seq("qi1", "qi2"), "sens", k = 3, l = 2)
      .as[(Long, Long, Long, Boolean, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // sizes: {a}=3, {b}=2, {c}=1, {null}=2
    assert(audit(3L) === ((1L, 3L, false, 0L))) // a: l=2, diverse
    assert(audit(2L) === ((2L, 4L, true, 1L)))  // b (l=1) + null (l=2)
    assert(audit(1L) === ((1L, 1L, true, 1L)))  // c
    assert(audit.values.map(_._2).sum === df.count())

    val kept = Privacy.suppressBelowK(df, Seq("qi1", "qi2"), 2)
    assert(kept.count() === 7, "only the singleton class c drops at k=2")
    assert(kept.where(col("qi1").isNull).count() === 2,
      "the null-pattern class is kept as a unit (null-safe join)")
    val kept3 = Privacy.suppressBelowK(df, Seq("qi1", "qi2"), 3)
    assert(kept3.select("qi1").distinct().as[String].collect().toSeq
      === Seq("a"), "at k=3 only class a survives")
  }

  test("suppressBelowK ≡ brute-force class filter on random frames " +
      "with null quasi-ids (property)") {
    import graft.operators.Privacy
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 8) {
      val rows = Seq.fill(40 + rnd.nextInt(60))((
        if (rnd.nextInt(5) == 0) null.asInstanceOf[String]
        else s"g${rnd.nextInt(4)}",
        rnd.nextInt(3), rnd.nextInt(100).toLong))
      val df = rows.toDF("qi1", "qi2", "payload")
      val k = 1 + rnd.nextInt(6)
      val expect = rows.groupBy(r => (r._1, r._2)).values
        .filter(_.size >= k).flatten.toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val got = Privacy.suppressBelowK(df, Seq("qi1", "qi2"), k)
        .as[(String, Int, Long)].collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got === expect, s"trial $trial k=$k")
    }
  }

  test("generalizeToK property: every output class >= k; the chosen " +
      "step (information loss) is monotone in k; the audit's chosen " +
      "row matches a brute-force walk") {
    import graft.operators.Privacy
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val n = 60 + rnd.nextInt(80)
      val rows = Seq.fill(n)(
        (rnd.nextInt(40).toLong, rnd.nextInt(200).toLong,
          rnd.nextInt(100).toLong))
      val df = rows.toDF("qa", "qb", "payload")
      // genuine-coarsening ladders: value → value div m → constant
      val ma = 2 + rnd.nextInt(4)
      val mb = 2 + rnd.nextInt(6)
      val ladders = Seq(
        "ga" -> Seq(col("qa"), col("qa") / ma cast "long", lit(-1L)),
        "gb" -> Seq(col("qb"), col("qb") / mb cast "long", lit(-1L)))
      def bruteLevels(k: Int): Seq[Int] = {
        def ok(levels: Seq[Int]): Boolean = {
          def g(v: Long, lvl: Int, m: Int): Long =
            if (lvl == 0) v else if (lvl == 1) v / m else -1L
          rows.groupBy(r => (g(r._1, levels(0), ma), g(r._2, levels(1), mb)))
            .values.forall(_.size >= k)
        }
        Privacy.schedule(Seq(2, 2)).find(ok)
          .getOrElse(Seq(2, 2))
      }
      val ks = Seq(2, 4, 8)
      val chosen = ks.map { k =>
        val (out, levels) = Privacy.generalizeToK(df, ladders, k,
          drop = Seq("qa", "qb"))
        assert(levels === bruteLevels(k), s"trial $trial k=$k levels")
        // unconditional output guarantee, even when the walk topped out
        val sizes = out.groupBy(col("ga"), col("gb"))
          .agg(count(lit(1)).as("cs"))
          .select("cs").as[Long].collect()
        assert(sizes.forall(_ >= k), s"trial $trial k=$k class sizes")
        assert(!out.columns.contains("qa") && !out.columns.contains("qb"),
          "raw quasi-identifiers must not survive generalization")
        // audit agreement: its chosen row carries the same levels
        val auditRow = Privacy.generalizationAudit(df, ladders, k)
          .where(col("chosen")).select("lvl_ga", "lvl_gb")
          .as[(Int, Int)].collect().toSeq
        assert(auditRow === Seq((levels(0), levels(1))),
          s"trial $trial k=$k audit")
        levels
      }
      // loss monotone in k: a larger k never chooses a finer step
      val steps = chosen.map(l =>
        Privacy.schedule(Seq(2, 2)).indexOf(l))
      assert(steps === steps.sorted, s"trial $trial monotone: $steps")
    }
    // empty-frame agreement: both the walk and the audit treat a NULL
    // min class size as vacuously satisfied and choose the all-finest
    // step (the audit previously fell to the all-coarsest step)
    val empty = Seq.empty[(Long, Long, Long)].toDF("qa", "qb", "payload")
    val ladders = Seq(
      "ga" -> Seq(col("qa"), col("qa") / 2 cast "long", lit(-1L)),
      "gb" -> Seq(col("qb"), col("qb") / 2 cast "long", lit(-1L)))
    val (_, emptyLevels) = Privacy.generalizeToK(empty, ladders, 3,
      drop = Seq("qa", "qb"))
    assert(emptyLevels === Seq(0, 0))
    assert(Privacy.generalizationAudit(empty, ladders, 3)
      .where(col("chosen")).select("step").as[Int].collect().toSeq
      === Seq(0), "audit must choose the same step as the walk")
  }

  test("threshold literals round-trip through the stack finalization " +
      "(shortest-repr doubles, float-noise values, E-notation)") {
    import graft.operators._
    val gnarly = Seq(0.1 + 0.2, 1.0 / 3.0, 1.0e-7, 12345678.9)
    gnarly.foreach { th =>
      val rep = Constraints.run(constraintFixture,
        Seq(Completeness("txt", th)))
      val out = rep.select("threshold").as[Double].head()
      assert(out === th,
        s"threshold $th must survive the literal round-trip exactly")
    }
  }
}
