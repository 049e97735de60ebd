package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for large-scale training-data pipelines
  * (SURVEY §7.4). All shapes are shuffle-minimal and key-partitioned:
  *
  *  - exact:     one hash-groupBy on a 128-bit fingerprint — a single
  *               shuffle keyed by the fingerprint; at 100 TB the key is
  *               near-unique so AQE balances partitions naturally.
  *  - jaccard:   shingle-inverted-index self-join (explode → join on
  *               shingle → pair-count). Never materializes the O(n²)
  *               cross product — only docs sharing ≥1 shingle meet.
  *  - minhashLsh: banded MinHash — candidate pairs only when a band
  *               collides; verification re-computes exact Jaccard on
  *               the (tiny) candidate set. This is the 100 TB path: cost
  *               is O(n·bands), not O(pairs).
  *
  * Hashes are engine-portable (md5-hex, lexicographic min) so results
  * are reproducible bit-for-bit in any SQL engine — which is also what
  * the DuckDB oracle checks.
  */
object Dedup {

  /** Exact dedup over a text column: one row per distinct fingerprint,
    * keeping the smallest id (deterministic survivor). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** Distinct word-n-gram shingle set per doc, with per-doc set size.
    *
    * Uses the native [[graft.expressions.WordShingles]] expression
    * (single-pass JVM) instead of the interpreted HOF chain, and is
    * persisted before the size filter: every downstream self-join
    * duplicates this subtree, and without materialization Catalyst
    * inlines and re-evaluates it per consumer. At 100 TB this is the
    * posting-list materialization any inverted-index build does before
    * joining.
    */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        graft.expressions.TextExpressions.wordShingles(col(textCol), n)
          .as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .withColumn("n_sh", size(col("sh")))
      .where(col("n_sh") > 0)

  /** Candidate-pair exact Jaccard via a shingle inverted index.
    * Emits pairs (a < b) with jaccard >= threshold.
    *
    * Scale note: the join key is the shingle; a hot shingle appearing in
    * f docs yields f² pair rows. Production guard: drop shingles with
    * document frequency above `maxDf` (stop-shingles), the standard
    * inverted-index trick — keeps the join output near-linear.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDf: Long = 1000L): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, n)
    val posting = sets
      .select(col("doc_id"), col("n_sh"), explode(col("sh")).as("shingle"))
    val df = posting.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
      .select(col("shingle"))
    // both sides of the self-join consume the filtered posting list;
    // materialize it once (inverted-index build step)
    val filtered = posting.join(df, Seq("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = filtered.select(col("doc_id").as("id_a"), col("n_sh").as("na"),
      col("shingle"))
    val b = filtered.select(col("doc_id").as("id_b"), col("n_sh").as("nb"),
      col("shingle"))
    a.join(b, Seq("shingle"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        round(col("shared").cast("double")
          / (col("na") + col("nb") - col("shared")), 4))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("shared"), col("jaccard"))
  }

  /** Portable MinHash signature: for seed s, the signature element is
    * the lexicographic MIN of md5(s || '|' || shingle) — identical in
    * any engine with md5, no Murmur dependency. Backed by the native
    * one-pass [[graft.expressions.MinhashSig]] (the equivalent HOF
    * formulation costs numHashes interpreted passes per row). */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    graft.expressions.TextExpressions.minhashSig(sh, numHashes)

  /** SimHash near-dup pairs: 64-bit fingerprints (as bit strings),
    * banded into 4×16-bit exact-match buckets for candidates (a
    * fingerprint pair within Hamming distance 3 shares ≥1 band by
    * pigeonhole), then verified by Hamming distance <= maxHamming.
    * One shuffle per band join; no O(n²) comparisons. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    val bits = docs
      .where(size(toks) > 0) // token-less docs have no fingerprint
      .select(col(idCol).as("doc_id"),
        graft.expressions.TextExpressions.simhashBits(toks).as("bits"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // band b = 16-bit substring [b*16+1, 16]
    val withBands = bits.select(col("doc_id"), col("bits"),
      posexplode(transform(sequence(lit(0), lit(3)), b =>
        col("bits").substr(b * 16 + 1, lit(16)))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val l = withBands.select(col("doc_id").as("id_a"),
      col("bits").as("bits_a"), col("band"), col("bucket"))
    val r = withBands.select(col("doc_id").as("id_b"),
      col("bits").as("bits_b"), col("band"), col("bucket"))
    val hamming = graft.expressions.TextExpressions.hammingDist(
      col("bits_a"), col("bits_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("bits_a"), col("bits_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming)
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Banded-LSH candidate pairs + exact-Jaccard verification.
    * numHashes = bands * rowsPerBand. Emits (id_a < id_b, jaccard)
    * for verified pairs with jaccard >= threshold. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sets = shingleSets(docs, idCol, textCol, n)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    // band value = md5 of the concatenated signature slice
    val banded = sets.select(
      col("doc_id"), col("sh"), col("n_sh"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          md5(concat_ws("#",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
      // banded is self-joined below; without materialization the 8×md5
      // signature computation would run once per join side.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = banded.select(col("doc_id").as("id_a"), col("sh").as("sh_a"),
      col("n_sh").as("na"), col("band"), col("bucket"))
    val r = banded.select(col("doc_id").as("id_b"), col("sh").as("sh_b"),
      col("n_sh").as("nb"), col("band"), col("bucket"))
    val cand = l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"),
        col("na"), col("nb"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("shared",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard",
        round(col("shared").cast("double")
          / (col("na") + col("nb") - col("shared")), 4))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("shared"), col("jaccard"))
  }
}
