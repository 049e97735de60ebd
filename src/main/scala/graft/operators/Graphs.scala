package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond connected components
  * (SURVEY §7.4 extension surface). Like [[Dedup.connectedComponents]],
  * everything here is expressed as joins + keyed aggregations — all
  * shuffles are keyed on a node id, there is no driver-side graph, and
  * per-round lineage is truncated so iteration count never compounds
  * plan size.
  */
object Graphs {

  /** PageRank with fixed-point integer arithmetic.
    *
    * Ranks are scaled longs (`scale` = 1.0 of total mass / N) and every
    * step is integer math — `div` for the contribution split and the
    * damping factor `dampingPct/100`. That buys two properties floats
    * cannot give:
    *
    *  - determinism under ANY partitioning: integer sums are exact, so
    *    the result does not depend on aggregation order (the same rule
    *    as the catalog's integer-cents money sums);
    *  - engine portability: an oracle can replay the identical
    *    computation in any SQL engine with integer division (the
    *    truncation behavior is pinned by using only non-negative
    *    values, where floor and truncate coincide).
    *
    * Scale shape: per iteration one equi-join (edges ⋈ ranks, keyed on
    * src) and one keyed sum (on dst) — the standard message-passing
    * round; edges and out-degrees are materialized once and reused
    * every round ([[Caches]] lifecycle). Rank lineage is truncated
    * every 3 rounds ([[Lineage.truncate]]: reliable `checkpoint()`
    * when a checkpoint dir is set, localCheckpoint otherwise — same
    * note as [[Dedup.connectedComponents]]).
    *
    * Contract: `edges` has (`src`, `dst`) columns and EVERY node
    * appears at least once as `src` (no dangling nodes) — mirror
    * undirected pair sets before calling. Output: (id, out_deg,
    * rank_fp) where rank_fp is the scaled rank.
    */
  def pageRankFixed(edges: DataFrame, iters: Int = 3, dampingPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    val e = Caches.persistTracked(edges.select(col("src"), col("dst")))
    val deg = Caches.persistTracked(
      e.groupBy(col("src")).agg(count(lit(1)).as("out_deg")))
    // one scalar to the driver (node count) — needed to seed the
    // uniform prior; not a data-dependent collect
    val n = deg.count()
    require(n > 0, "edge set is empty")
    val base = scale / n
    val teleport = (100L - dampingPct) * base / 100L
    var ranks = deg.select(col("src").as("id"), lit(base).as("r"))
    var it = 1
    while (it <= iters) {
      val contrib = e
        .join(deg, Seq("src"))
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), expr("r div out_deg").as("c"))
      val sums = contrib.groupBy(col("id")).agg(sum(col("c")).as("s"))
      val next = deg.select(col("src").as("id"))
        .join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport)
            + expr(s"($dampingPct * coalesce(s, 0L)) div 100")).as("r"))
      ranks = if (it % 3 == 0 && it < iters) next.transform(Lineage.truncate) else next
      it += 1
    }
    ranks.join(deg.select(col("src").as("id"), col("out_deg")), Seq("id"))
      .select(col("id"), col("out_deg"), col("r").as("rank_fp"))
  }
}
