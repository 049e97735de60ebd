package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A declarative data-quality constraint over one column. Each
  * constraint contributes a fixed 4-column slice to the suite's
  * aggregate STATE — (num: long, den: long, minv: double, maxv:
  * double), unused slots null — and a finalization rule mapping that
  * slice to a (metric, threshold, passed) report row. Ratio metrics
  * finalize as ONE division of two exact longs, min/max pass through,
  * so every metric is deterministic under any partitioning (no
  * floating-point accumulation order in sight — the suite-wide
  * determinism contract Queries.scala's header documents for money).
  */
sealed trait Constraint {
  def column: String
  /** Stable report key, e.g. "completeness". */
  def constraintType: String
  def threshold: Double
  /** Pass direction: ">=" or "<=". */
  def op: String
  /** Finalization: "ratio" (num/den), "count" (num), "min", "max". */
  def kind: String
  /** Whether the state slice merges by (sum, sum, min, max) —
    * everything except distinct counting does. */
  def mergeable: Boolean = true
  /** The four state aggregates, in (num, den, minv, maxv) order. */
  private[operators] def stateAggs: (Column, Column, Column, Column)

  /** Row-level truth of this constraint for a single row, where that
    * is meaningful (completeness, pattern, set and bound constraints);
    * None for inherently aggregate constraints (uniqueness, size).
    * Used by [[Constraints.enforce]] — the expectations/quarantine
    * half of the suite. A null predicate result counts as VIOLATED
    * (a null lang neither matches a regex nor belongs to a set). */
  private[operators] def rowPredicate: Option[Column] = None

  /** Stable row-level violation tag. */
  def tag: String = s"$constraintType($column)"

  protected def nullLong: Column = max(lit(null).cast("long"))
  protected def nullDouble: Column = max(lit(null).cast("double"))
  protected def total: Column = count(lit(1))
}

/** Fraction of rows with `column` non-null >= threshold. */
case class Completeness(column: String, threshold: Double)
    extends Constraint {
  val constraintType = "completeness"; val op = ">="; val kind = "ratio"
  private[operators] def stateAggs =
    (count(col(column)), total, nullDouble, nullDouble)
  override private[operators] def rowPredicate =
    Some(col(column).isNotNull)
}

/** Fraction of rows matching `regex` (nulls count as non-matching)
  * >= threshold. */
case class MatchRatio(column: String, regex: String, threshold: Double)
    extends Constraint {
  val constraintType = "match_ratio"; val op = ">="; val kind = "ratio"
  private[operators] def stateAggs =
    (sum(when(col(column).rlike(regex), 1L).otherwise(0L)), total,
      nullDouble, nullDouble)
  override private[operators] def rowPredicate =
    Some(col(column).rlike(regex))
}

/** Fraction of rows whose value is in `values` (nulls count as
  * outside) >= threshold. */
case class InSetRatio(column: String, values: Seq[String],
    threshold: Double) extends Constraint {
  val constraintType = "in_set_ratio"; val op = ">="; val kind = "ratio"
  private[operators] def stateAggs =
    (sum(when(col(column).isin(values: _*), 1L).otherwise(0L)), total,
      nullDouble, nullDouble)
  override private[operators] def rowPredicate =
    Some(col(column).isin(values: _*))
}

/** distinct / non-null count >= threshold (1.0 = column is a key).
  * NOT mergeable: distinct state does not compose by summation — run
  * it in single-pass suites, not incremental ones (or pair it with
  * the portable-HLL sketch queries for an approximate incremental
  * twin). */
case class UniqueRatio(column: String, threshold: Double)
    extends Constraint {
  val constraintType = "unique_ratio"; val op = ">="; val kind = "ratio"
  override val mergeable = false
  private[operators] def stateAggs =
    (countDistinct(col(column)), count(col(column)),
      nullDouble, nullDouble)
}

/** min(column) >= threshold. */
case class MinBound(column: String, threshold: Double)
    extends Constraint {
  val constraintType = "min_bound"; val op = ">="; val kind = "min"
  private[operators] def stateAggs =
    (nullLong, nullLong, min(col(column)).cast("double"), nullDouble)
  override private[operators] def rowPredicate =
    Some(col(column).cast("double") >= lit(threshold))
}

/** max(column) <= threshold. */
case class MaxBound(column: String, threshold: Double)
    extends Constraint {
  val constraintType = "max_bound"; val op = "<="; val kind = "max"
  private[operators] def stateAggs =
    (nullLong, nullLong, nullDouble, max(col(column)).cast("double"))
  override private[operators] def rowPredicate =
    Some(col(column).cast("double") <= lit(threshold))
}

/** Row count >= threshold (column is reported as "*"). */
case class SizeMin(threshold: Double) extends Constraint {
  val column = "*"
  val constraintType = "size_min"; val op = ">="; val kind = "count"
  private[operators] def stateAggs =
    (total, nullLong, nullDouble, nullDouble)
}

/** Deequ-style declarative data-quality suite compiled to ONE
  * aggregation pass — N constraints over M columns cost exactly one
  * scan and one (optionally grouped) aggregate, never a pass per
  * constraint. The report row per constraint is
  * (constraint_type, column_name, metric, threshold, passed).
  *
  * Incremental monitoring: [[state]] is a mergeable monoid (per
  * group, per constraint: sum/sum/min/max over the 4-column slice),
  * so a streaming foreachBatch can append per-batch states to a
  * metrics table and [[report]] over [[mergeStates]] equals the
  * batch suite over the full corpus — the same monoid contract the
  * sketch family (CMS/HLL/Bloom) rides. [[UniqueRatio]] is the
  * documented exception (distinct does not sum); [[mergeStates]]
  * rejects it.
  *
  * 100 TB shape: one scan; the aggregate is partial (map-side
  * combine) into |groups| rows; the stack/finalize step runs on the
  * aggregated frame only. Grouped suites shuffle once on the group
  * key. All constraint predicates are codegen'd built-ins (rlike,
  * isin, count, min, max) — no UDFs in the scan.
  */
object Constraints {

  private def stateCols(cs: Seq[Constraint]): Seq[Column] =
    cs.zipWithIndex.flatMap { case (c, i) =>
      val (num, den, mn, mx) = c.stateAggs
      Seq(num.as(s"c${i}_num"), den.as(s"c${i}_den"),
        mn.as(s"c${i}_min"), mx.as(s"c${i}_max"))
    }

  /** One-pass aggregate state: one row per group, 4 columns per
    * constraint. */
  def state(df: DataFrame, cs: Seq[Constraint],
      groupBy: Seq[String] = Nil): DataFrame = {
    require(cs.nonEmpty, "empty constraint suite")
    val aggs = stateCols(cs)
    if (groupBy.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge state rows (e.g. one per micro-batch) back to one row per
    * group: sum/sum/min/max per slice. Rejects non-mergeable
    * constraints — see [[UniqueRatio]]. */
  def mergeStates(states: DataFrame, cs: Seq[Constraint],
      groupBy: Seq[String] = Nil): DataFrame = {
    val bad = cs.filter(!_.mergeable)
    require(bad.isEmpty,
      s"non-mergeable constraints in incremental suite: " +
        bad.map(c => s"${c.constraintType}(${c.column})").mkString(", "))
    val aggs = cs.indices.flatMap { i =>
      Seq(sum(col(s"c${i}_num")).as(s"c${i}_num"),
        sum(col(s"c${i}_den")).as(s"c${i}_den"),
        min(col(s"c${i}_min")).as(s"c${i}_min"),
        max(col(s"c${i}_max")).as(s"c${i}_max"))
    }
    if (groupBy.isEmpty) states.agg(aggs.head, aggs.tail: _*)
    else states.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Finalize a state frame into the report: stack the per-constraint
    * slices to rows, compute metric per kind, compare per op. Runs on
    * the aggregated frame (|groups| × |constraints| rows). */
  def report(st: DataFrame, cs: Seq[Constraint],
      groupBy: Seq[String] = Nil): DataFrame = {
    // the stack expression interpolates column names and thresholds
    // as SQL literals — fail fast on anything that couldn't be a
    // plain identifier (or "*") rather than produce a parse error
    // three operators later
    cs.foreach { c =>
      require(c.column.matches("[A-Za-z0-9_.]+|\\*"),
        s"constraint column is not a plain identifier: '${c.column}'")
      require(!c.threshold.isNaN && !c.threshold.isInfinite,
        s"non-finite threshold for ${c.tag}")
    }
    // group columns ride the same selectExpr — same guard (a name
    // needing backticks would otherwise surface as a parse error
    // three operators later, the exact failure the constraint-column
    // require closed)
    groupBy.foreach { g =>
      require(g.matches("[A-Za-z0-9_]+"),
        s"group column is not a plain identifier: '$g'")
    }
    val stackArgs = cs.zipWithIndex.map { case (c, i) =>
      s"'${c.constraintType}', '${c.column}', '${c.kind}', '${c.op}', " +
        s"c${i}_num, c${i}_den, c${i}_min, c${i}_max, " +
        s"CAST(${c.threshold} AS DOUBLE)"
    }.mkString(", ")
    val stacked = st.selectExpr(groupBy ++ Seq(
      s"stack(${cs.size}, $stackArgs) AS (constraint_type, " +
        "column_name, kind, op, num, den, minv, maxv, threshold)"): _*)
    stacked
      .withColumn("metric",
        when(col("kind") === "ratio",
          col("num").cast("double") / col("den").cast("double"))
          .when(col("kind") === "count", col("num").cast("double"))
          .when(col("kind") === "min", col("minv"))
          .otherwise(col("maxv")))
      .withColumn("passed",
        when(col("op") === ">=", col("metric") >= col("threshold"))
          .otherwise(col("metric") <= col("threshold")))
      .select((groupBy ++ Seq("constraint_type", "column_name",
        "metric", "threshold", "passed")).map(col): _*)
  }

  /** The single-pass batch suite: [[state]] then [[report]]. */
  def run(df: DataFrame, cs: Seq[Constraint],
      groupBy: Seq[String] = Nil): DataFrame =
    report(state(df, cs, groupBy), cs, groupBy)

  /** Constraint SUGGESTION — derive a suite from a baseline corpus's
    * own profile (the Deequ suggestion idea): observed completeness
    * ratios become completeness thresholds, observed min/max become
    * bounds, each set column's top-k values by frequency become a
    * membership set whose threshold is the baseline's own in-set
    * ratio, and key columns assert their observed uniqueness.
    * Evaluating the suggested suite on a LATER corpus version turns
    * "did quality drift?" into [[run]]'s pass/fail report — no
    * hand-written thresholds.
    *
    * Cost: ONE aggregate pass over the baseline for every ratio and
    * bound, plus one |distinct|-sized aggregation per set column for
    * the top-k (both collect O(columns + k) rows to the driver — a
    * threshold decision, not a data move; the q134-probe-literal
    * class). Thresholds are exact: single divisions of collected
    * longs, so the suggested suite reproduces bit-identically on any
    * partitioning. */
  def suggest(df: DataFrame,
      completenessCols: Seq[String] = Nil,
      uniqueCols: Seq[String] = Nil,
      boundCols: Seq[String] = Nil,
      setCols: Seq[(String, Int)] = Nil): Seq[Constraint] = {
    val aggs =
      (count(lit(1)).as("__n") +:
        completenessCols.map(c => count(col(c)).as(s"__c_$c"))) ++
        uniqueCols.flatMap(c => Seq(
          countDistinct(col(c)).as(s"__ud_$c"),
          count(col(c)).as(s"__un_$c"))) ++
        boundCols.flatMap(c => Seq(
          min(col(c)).cast("double").as(s"__lo_$c"),
          max(col(c)).cast("double").as(s"__hi_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def l(name: String): Long = row.getAs[Long](name)
    // fail fast, column-named, on an all-null profile column: getAs
    // would silently unbox a SQL NULL min/max to 0.0 and emit a
    // bound the baseline never exhibited (and an all-null unique
    // column would smuggle a 0/0 NaN threshold into report(), far
    // from the cause)
    def d(name: String, c: String): Double = {
      require(!row.isNullAt(row.fieldIndex(name)),
        s"cannot suggest a bound from all-null column '$c'")
      row.getAs[Double](name)
    }
    val n = l("__n")
    require(n > 0, "cannot suggest constraints from an empty baseline")
    val fromProfile: Seq[Constraint] =
      completenessCols.map(c =>
        Completeness(c, l(s"__c_$c").toDouble / n.toDouble)) ++
        uniqueCols.map { c =>
          require(l(s"__un_$c") > 0,
            s"cannot suggest uniqueness from all-null column '$c'")
          UniqueRatio(c,
            l(s"__ud_$c").toDouble / l(s"__un_$c").toDouble)
        } ++
        boundCols.flatMap(c =>
          Seq(MinBound(c, d(s"__lo_$c", c)), MaxBound(c, d(s"__hi_$c", c))))
    val fromSets: Seq[Constraint] = setCols.map { case (c, k) =>
      // top-k values by (count desc, value asc) — a deterministic
      // cut; the threshold is the baseline's OWN in-set mass, so the
      // suite asserts "no more tail drift than the baseline had".
      // The value is CAST to string so a numeric set column profiles
      // cleanly (isin compares post-cast on evaluation too) instead
      // of throwing ClassCastException at getString
      val counted = df.where(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("__v"))
        .agg(count(lit(1)).as("__cnt"))
        .orderBy(col("__cnt").desc, col("__v").asc)
        .limit(k).collect()
      val values = counted.map(_.getString(0)).toSeq
      val inSet = counted.map(_.getAs[Long]("__cnt")).sum
      InSetRatio(c, values, inSet.toDouble / n.toDouble)
    }
    fromProfile ++ fromSets
  }

  /** The expectations/quarantine half: tag every row with the array
    * of row-level constraints it VIOLATES (empty array = clean). A
    * null predicate result counts as violated — a null lang neither
    * matches a regex nor belongs to a set. Aggregate-only constraints
    * (uniqueness, size) are skipped; a require rejects a suite with
    * no row-level constraint at all. Callers route on the column:
    * `where(size(violations) === 0)` ships, the rest quarantines with
    * its reasons attached — the q78 JSON-quarantine pattern for
    * structured quality. One projection, all codegen'd predicates,
    * no second pass. */
  def enforce(df: DataFrame, cs: Seq[Constraint],
      violationsCol: String = "violations"): DataFrame = {
    val rowCs = cs.flatMap(c => c.rowPredicate.map(c.tag -> _))
    require(rowCs.nonEmpty,
      "no row-level constraints in suite (uniqueness/size are " +
        "aggregate-only)")
    val tags = rowCs.map { case (tag, pred) =>
      when(!coalesce(pred, lit(false)), lit(tag))
        .otherwise(lit(null).cast("string"))
    }
    df.withColumn(violationsCol,
      filter(array(tags: _*), x => x.isNotNull))
  }
}
