package graft

import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide physical-plan audit — the automated form of the
  * per-round scale-killer sweep. Every `SparkEntry.queries` entry is
  * PLANNED (not executed) at sf0.001 and checked:
  *
  *  1. `CartesianProduct` appears in NO query's physical plan, ever.
  *     (Current state: zero across all 224 — a data×data cartesian is
  *     unbounded at 100 TB and there is no adjudicated exception.)
  *  2. Every non-equi logical `Join` (the shapes that plan as
  *     `BroadcastNestedLoopJoin`) must carry a side whose
  *     `maxRows` proves it bounded (≤ 4096 rows — ungrouped
  *     aggregates, literal probe frames, limits). This is the
  *     broadcast tiny-frame attach idiom: grand totals, calibration
  *     constants, probe literals riding along every row.
  *  3. Queries where the bounded side is bounded by CONSTRUCTION but
  *     invisible to `maxRows` (a grouped aggregate over a bounded key
  *     domain — k-means centroids, PQ codebooks, the event-type
  *     domain) are allowlisted BY NAME with the reason; anything new
  *     that plans a nest-loop join with no provable bound fails the
  *     suite instead of shipping.
  *
  * Scope note: a `BroadcastNestedLoopJoin` string inside a reused
  * cached subplan (`InMemoryRelation`) belongs to the plan that built
  * the cache; the logical check covers each query's own join tree.
  * `graft.PlanScan` (Test/runMain) prints the adjudication table this
  * allowlist was derived from.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val boundCap = 4096L

  /** Non-equi joins whose bounded side is a grouped aggregate over a
    * key domain that is bounded by construction (maxRows can't see
    * it). Each entry names the bounded side. */
  private val boundedByConstruction: Map[String, String] = Map(
    "q115_quantized_ann" ->
      ("centroid attach (assign + probe): deterministic 1/250 subset " +
        "standing in for fixed-k sampled centroids at scale (q41 doc)"),
    "q144_semantic_dedup_increment" ->
      "centroid attach: fitCentroids(k = 6) table",
    "q162_ivf_pq_serve" ->
      ("centroid attach (assign + probe): 1/250 subset standing in for " +
        "fixed-k sampled centroids; PQ codebook is 16 codes x 8 subspaces"),
    "q188_hll_intersection" ->
      "ta < tb self-pair over the distinct event-type domain (5 values)",
    "q196_cluster_purity" ->
      "centroid attach (fit iterations + assign): fitCentroids(k = 4)",
    "q41_ann_ivf" ->
      ("centroid attach (assign + probe): deterministic 1/250 subset " +
        "standing in for fixed-k sampled centroids at scale (in-source doc)"),
    "q55_kmeans_fit" ->
      "centroid attach: fitCentroids(k = 4) fit iterations",
    "q63_sampled_fit" ->
      "sampled-fit centroid attach: fitCentroids(k = 4) on a hash sample")

  private def refsBoth(j: Join, a: Expression, b: Expression): Boolean =
    (a.references.subsetOf(j.left.outputSet) &&
      b.references.subsetOf(j.right.outputSet)) ||
    (a.references.subsetOf(j.right.outputSet) &&
      b.references.subsetOf(j.left.outputSet))

  private def hasEquiKeys(j: Join): Boolean = j.condition.exists(_.exists {
    case EqualTo(a, b) => refsBoth(j, a, b)
    case EqualNullSafe(a, b) => refsBoth(j, a, b)
    case _ => false
  })

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans without scale-killer joins") { GraftTestSpark.withCaches {
      val qe = fn(spark, dir).queryExecution
      assert(!qe.executedPlan.toString.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — unbounded at scale, no exceptions")
      val unbounded = qe.optimizedPlan.collect {
        case j: Join if !hasEquiKeys(j) &&
            !j.left.maxRows.exists(_ <= boundCap) &&
            !j.right.maxRows.exists(_ <= boundCap) => j
      }
      if (!boundedByConstruction.contains(name))
        assert(unbounded.isEmpty,
          s"$name plans ${unbounded.size} nest-loop join(s) with no " +
            "provably bounded side — verify the bound, then allowlist " +
            "with the reason:\n" +
            unbounded.map(j => s"  cond=${j.condition}").mkString("\n"))
    }}
  }
}
