package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters at sketch cost — the two-pass candidate-screen
  * pattern (Cormode & Muthukrishnan's CM-sketch, used as a *screen*
  * rather than an estimator, the way q106 uses it for estimation).
  *
  * The problem at 100 TB: `groupBy(token).count.having(n >= T)`
  * shuffles the ENTIRE distinct vocabulary — trillions of tail tokens
  * that can never clear the threshold pay full shuffle freight just to
  * be discarded. The fix is a screen with no false negatives:
  *
  *  1. Pass 1 builds a count-min sketch over the occurrence stream.
  *     The aggregation key space is the sketch CELLS (rows × width,
  *     here 4×256 = 1024), not the vocabulary — map-side combine
  *     collapses every partition to ≤1024 cells, so the shuffle is
  *     O(partitions × cells) regardless of corpus size.
  *  2. The sketch collects to the driver (1024 longs — bounded by
  *     construction, the same class as q146's bloom literal) and is
  *     folded into the plan as a map LITERAL above the scan: each
  *     occurrence is kept only if `min_r sketch[r][h_r(tok)] >= T`.
  *     CMS never undercounts, so `exact(tok) >= T` implies
  *     `est(tok) >= T` — a true heavy hitter cannot be screened out.
  *  3. Pass 2 exact-counts ONLY the survivors: the big shuffle now
  *     carries heavy candidates (true hitters + CMS false positives,
  *     bounded by the sketch's ε·N overcount), and the final
  *     `n >= T` filter kills the false positives.
  *
  * Output is EXACTLY the naive query's output — the oracle is plain
  * `GROUP BY HAVING` SQL; the sketch is invisible in the result, which
  * is the whole point of a no-false-negative screen.
  */
object HeavyHitters {

  val Rows = 4
  val Width = 256

  /** One CMS bucket per hash row (round-12: xxhash64 instead of the
    * md5-hex ladder — one 64-bit hash per cell vs a full digest +
    * string slicing + base conversion). The sketch is a
    * no-false-negative SCREEN, never an output: any hash family keeps
    * `est(tok) >= exact(tok)`, so the survivors of pass 2's exact
    * `n >= T` filter — the only thing the caller sees — are identical
    * under any bucket function. (q106, whose sketch IS the output,
    * keeps its own md5 bucket for oracle replay; this one is free to
    * be fast.) */
  private def bucket(row: Column, tok: Column): Column =
    pmod(xxhash64(row, tok), lit(Width)).cast("int")

  /** Pass 1: the CMS cells of an occurrence stream, as the flat map
    * key `hrow*Width + bucket → count`. The groupBy key space is the
    * 1024 sketch cells; partial aggregation makes the shuffle
    * corpus-size-independent, and the driver materialization is
    * bounded by construction at Rows×Width longs (cf.
    * VectorIndex.probe's guarded collect and q146's bloom literal).
    * Cells are a cell-ADD monoid: sketches of disjoint streams merge
    * by key-wise addition — the streaming-maintenance contract. */
  def buildSketch(occ: DataFrame): Map[Int, Long] = {
    val rows = (0 until Rows).map(lit(_))
    occ
      .select(col("tok"), explode(array(rows: _*)).as("hrow"))
      .select(col("hrow"), bucket(col("hrow"), col("tok")).as("b"))
      .groupBy(col("hrow"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getInt(0) * Width + r.getInt(1)) -> r.getLong(2))
      .toMap
  }

  /** Pass 2 given a sketch: screen the occurrence stream by the CMS
    * estimate (a foldable map literal, zero shuffle — every token's
    * cells exist by construction, so lookups never miss), then
    * exact-count only the survivors. Threshold =
    * max(2, totalOcc/denom), with totalOcc read off the sketch's
    * row-0 cell sum. */
  def screenedExact(occ: DataFrame, sketch: Map[Int, Long],
      denom: Long): DataFrame = {
    val total = sketch.collect { case (k, v) if k < Width => v }.sum
    val threshold = math.max(2L, total / denom)
    val sk = typedlit(sketch)
    val est = least((0 until Rows).map { r =>
      element_at(sk, lit(r * Width) + bucket(lit(r), col("tok")))
    }: _*)
    occ.where(est >= threshold)
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
  }

  /** Exact tokens with occurrence count >= max(2, totalOcc/denom),
    * computed through the CMS screen. `occ` must have a single string
    * column `tok` (one row per occurrence). Returns (tok, n). */
  def cmsScreenedExact(occ: DataFrame, denom: Long): DataFrame =
    screenedExact(occ, buildSketch(occ), denom)
}
