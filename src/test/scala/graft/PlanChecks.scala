package graft

import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Shared plan-shape predicates for the scale-killer audit
  * ([[PlanAuditSpec]]) and its adjudication enumerator
  * ([[PlanScan]]) — one definition so the test and the table it was
  * derived from can never disagree.
  *
  * `hasEquiKeys` mirrors what Spark's `ExtractEquiJoinKeys` actually
  * extracts: an equi-key must be a TOP-LEVEL CONJUNCT of the join
  * condition. An `EqualTo` buried under `Or`/`Not` (e.g.
  * `a.x = b.x OR a.y = b.y`) does NOT make the join hash-joinable —
  * Spark plans it as a nested-loop join — so matching `EqualTo`
  * anywhere in the expression tree (the first formulation) was a
  * false NEGATIVE in the audit: a disjunctive join would have passed
  * as equi-keyed while planning as a data×data nest loop. */
object PlanChecks {
  /** Flatten a condition into its top-level AND-conjuncts (the same
    * decomposition as Catalyst's `splitConjunctivePredicates`). */
  def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def refsBoth(j: Join, a: Expression, b: Expression): Boolean =
    a.references.nonEmpty && b.references.nonEmpty &&
      ((a.references.subsetOf(j.left.outputSet) &&
        b.references.subsetOf(j.right.outputSet)) ||
      (a.references.subsetOf(j.right.outputSet) &&
        b.references.subsetOf(j.left.outputSet)))

  /** True iff the join condition carries at least one top-level
    * conjunct of the form `left-side-expr = right-side-expr` — i.e.
    * the shape `ExtractEquiJoinKeys` turns into hash-join keys. */
  def hasEquiKeys(j: Join): Boolean =
    j.condition.toSeq.flatMap(splitConjuncts).exists {
      case EqualTo(a, b) => refsBoth(j, a, b)
      case EqualNullSafe(a, b) => refsBoth(j, a, b)
      case _ => false
    }

  /** Non-equi joins (nest-loop shapes) where neither side's `maxRows`
    * proves it bounded by `cap`. */
  def unboundedNestLoops(plan: LogicalPlan, cap: Long): Seq[Join] =
    plan.collect {
      case j: Join if !hasEquiKeys(j) &&
          !j.left.maxRows.exists(_ <= cap) &&
          !j.right.maxRows.exists(_ <= cap) => j
    }

  /** The OTHER scale-killer class: window operators with an EMPTY
    * partitionSpec force every input row through ONE task (a global
    * sort + single-partition window). Legitimate only over a domain
    * bounded by construction — an aggregate frame (days, buckets,
    * partition ids, top-k output), never corpus rows. Collects each
    * such node from the optimized plan UNLESS its child's `maxRows`
    * already proves the frame bounded by `cap` (limits, ungrouped
    * aggregates). Matches both `Window` and the optimizer-inserted
    * `WindowGroupLimit`; an all-FOLDABLE partitionSpec (e.g.
    * `partitionBy(lit(1))`) is one global partition and counts as
    * empty. */
  def unboundedGlobalWindows(plan: LogicalPlan, cap: Long): Seq[UnaryNode] =
    plan.collect {
      case w: Window if w.partitionSpec.forall(_.foldable) &&
          !w.child.maxRows.exists(_ <= cap) => w
      case w: WindowGroupLimit if w.partitionSpec.forall(_.foldable) &&
          !w.child.maxRows.exists(_ <= cap) => w
    }

  /** The THIRD scale-killer class: a parquet scan that reads EVERY
    * column of a wide table. Column pruning is Catalyst's cheapest
    * win — a 100 TB scan that ships `text` to compute `count(*)` is
    * wrong regardless of how good the rest of the plan is — and it is
    * invisible to row-count reasoning, so it gets its own audit.
    * Collects, from the pre-AQE physical plan (pruning is decided by
    * `FileSourceStrategy` at planning, AQE never widens a scan), every
    * `FileSourceScanExec` whose required data schema is the ENTIRE
    * table schema, for tables wider than `minCols` columns (narrow
    * tables — region, nation, supplier, embeddings — are usually read
    * whole because the query genuinely needs every column; the audit
    * targets the wide fact/document tables where full-width is almost
    * always a missing projection). Only the CANONICAL corpus tables
    * are audited: a full-width read of a query's own materialized
    * intermediate (a sink, a pair table, a compacted unit) is correct
    * by construction — those schemas were already projected when they
    * were written. Returns (table file name, width).
    *
    * Traversal: pass the EXECUTED plan. AQE wrappers are unwrapped
    * through `inputPlan` (AQE re-plans exchanges, never widens a
    * scan), and subquery plans are followed only when already planned
    * physical — `collectWithSubqueries` on a pre-preparation plan
    * would cast a still-logical subquery to SparkPlan and throw. */
  private val auditedTables =
    Set("lineitem", "orders", "events", "documents", "customer", "part")
      .map(_ + ".parquet")

  def fullWidthScans(plan: SparkPlan, minCols: Int): Seq[(String, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    def visit(p: SparkPlan): Unit = p.foreach { node =>
      node match {
        case f: FileSourceScanExec
            if f.relation.dataSchema.length > minCols &&
              f.requiredSchema.length == f.relation.dataSchema.length &&
              f.relation.location.rootPaths.headOption
                .exists(r => auditedTables(r.getName)) =>
          out += ((f.relation.location.rootPaths.head.getName,
            f.requiredSchema.length))
        case a: AdaptiveSparkPlanExec => visit(a.inputPlan)
        // a tracked persist hides its subtree behind an
        // InMemoryRelation leaf — the cached plan's scans are still
        // this query's scans (it built the cache), so audit them too
        case imts: org.apache.spark.sql.execution.columnar
            .InMemoryTableScanExec => visit(imts.relation.cachedPlan)
        case _ => ()
      }
      node.expressions.foreach(_.foreach {
        case e: PlanExpression[_] => e.plan match {
          case sub: SparkPlan => visit(sub)
          case _ => () // still-logical subquery (pre-preparation plan)
        }
        case _ => ()
      })
    }
    visit(plan)
    out.toSeq
  }
}
