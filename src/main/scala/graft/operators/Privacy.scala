package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audit and enforcement over quasi-identifiers — the
  * governance pass a training-data pipeline runs before a corpus with
  * user-derived attributes ships: k-anonymity (every row's
  * quasi-identifier combination is shared by >= k rows) and
  * l-diversity (each such equivalence class carries >= l distinct
  * sensitive values, so membership does not leak the sensitive
  * attribute even when the class is known).
  *
  * 100 TB shape: [[classes]] is ONE keyed aggregation on the
  * quasi-identifier tuple; [[audit]] re-aggregates the class table on
  * the tiny class-size domain; [[suppressBelowK]] is the class
  * aggregation plus a semi-join back on the same keys — two shuffles
  * on the same key, and AQE reuses the exchange. Nothing driver-side,
  * nothing pairwise.
  */
object Privacy {

  /** The equivalence-class table: one row per distinct
    * quasi-identifier combination with its size and the number of
    * distinct sensitive values it carries. Null quasi-identifier
    * values form their own class (groupBy semantics — a null pattern
    * is just as linkable as any other). */
  def classes(df: DataFrame, quasiIds: Seq[String], sensitive: String)
      : DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitive)).as("l_diversity"))
  }

  /** The audit histogram: per equivalence-class size, how many
    * classes and rows sit there, whether that size violates
    * k-anonymity, and how many of those classes additionally violate
    * l-diversity. The full risk posture of a corpus in
    * O(distinct class sizes) rows. */
  def audit(df: DataFrame, quasiIds: Seq[String], sensitive: String,
      k: Int, l: Int): DataFrame =
    classes(df, quasiIds, sensitive)
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"),
        sum(when(col("l_diversity") < l, 1L).otherwise(0L))
          .as("n_low_diversity"))
      .withColumn("at_risk", col("class_size") < k)
      .select(col("class_size"), col("n_classes"), col("n_rows"),
        col("at_risk"), col("n_low_diversity"))

  /** Round-robin generalization schedule over per-column maximum
    * ladder levels: level vectors from all-finest (all 0) to
    * all-coarsest, incrementing ONE column per step in column order,
    * skipping columns already at their maximum. Deterministic, and —
    * provided each ladder level is a genuine coarsening of the
    * previous one (each coarser cell a union of finer cells) — the
    * minimum class size is NON-DECREASING along it, so the first
    * satisfying step is the canonical choice and the chosen step is
    * monotone in k. */
  private[graft] def schedule(maxLevels: Seq[Int]): Seq[Seq[Int]] = {
    val steps = Seq.newBuilder[Seq[Int]]
    val cur = maxLevels.map(_ => 0).toArray
    steps += cur.toSeq
    var i = 0
    while (!cur.sameElements(maxLevels)) {
      while (cur(i % cur.length) >= maxLevels(i % cur.length)) i += 1
      cur(i % cur.length) += 1
      i += 1
      steps += cur.toSeq
    }
    steps.result()
  }

  private def classSizes(df: DataFrame,
      ladders: Seq[(String, Seq[Column])], levels: Seq[Int]): DataFrame =
    df.select(ladders.zip(levels).map { case ((n, lad), l) =>
        lad(l).as(n) }: _*)
      .groupBy(ladders.map(l => col(l._1)): _*)
      .agg(count(lit(1)).as("class_size"))

  /** The generalization AUDIT: per schedule step, the k-anonymity
    * posture of the ladder-recoded quasi-identifiers — class count,
    * minimum class size, rows below/at-or-above k — plus which step
    * the [[generalizeToK]] walk would choose (the first satisfying
    * one, or the final all-coarsest step). Each step costs one keyed
    * aggregation re-aggregated to a handful of scalars; the
    * schedule has Σ ladder-depths + 1 steps, so the whole audit is a
    * fixed small number of scans (probe a sample first at 100 TB —
    * the choice is a threshold decision, not a data move). */
  def generalizationAudit(df: DataFrame,
      ladders: Seq[(String, Seq[Column])], k: Int): DataFrame = {
    require(ladders.nonEmpty && ladders.forall(_._2.nonEmpty),
      "need at least one quasi-identifier ladder with a level-0 expr")
    val steps = schedule(ladders.map(_._2.size - 1))
    val audits = steps.zipWithIndex.map { case (levels, si) =>
      val levelCols = levels.zip(ladders).map { case (l, (n, _)) =>
        lit(l).as(s"lvl_$n") }
      classSizes(df, ladders, levels)
        .agg(count(lit(1)).as("n_classes"),
          min(col("class_size")).as("min_class_size"),
          sum(when(col("class_size") < k, col("class_size"))
            .otherwise(0L)).as("n_rows_below_k"),
          sum(when(col("class_size") >= k, col("class_size"))
            .otherwise(0L)).as("n_rows_kept"))
        .select((lit(si).as("step") +: levelCols) ++ Seq(
          col("n_classes"), col("min_class_size"),
          col("n_rows_below_k"), col("n_rows_kept")): _*)
    }
    val all = audits.reduce(_ unionByName _)
    // chosen = first step meeting k (min class size is monotone along
    // a genuine-coarsening schedule), else the final step. A NULL min
    // class size (empty input) is vacuously satisfied — the SAME rule
    // generalizeToK's walk applies, so the audit's chosen row always
    // carries the levels the walk would return
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    all.withColumn("chosen",
      col("step") === coalesce(
        min(when(col("min_class_size") >= k ||
          col("min_class_size").isNull, col("step"))).over(w),
        max(col("step")).over(w)))
  }

  /** k-anonymization by GENERALIZATION — the standard production
    * alternative to suppression's blunt cut: walk the fixed
    * round-robin [[schedule]] of ladder levels (each level a strictly
    * coarser recoding of its quasi-identifier: balance band 1000 →
    * 5000 → suppressed, nation → region → suppressed) until every
    * class holds >= k rows, then return the recoded frame. If even
    * the all-coarsest step leaves residual classes below k (possible
    * only when the coarsest levels are not all constant), those rows
    * are suppressed, so the OUTPUT GUARANTEE is unconditional: every
    * returned class has >= k members. Returns the generalized frame
    * (original non-QI columns + one recoded column per ladder) and
    * the chosen level per ladder. `drop` names the RAW quasi-identifier
    * source columns to remove from the output — retaining them would
    * undo the recoding, so pass every column a ladder reads. Each
    * probe step is one keyed aggregation; the early-exit walk probes
    * at most Σ ladder-depths + 1 steps. */
  def generalizeToK(df: DataFrame,
      ladders: Seq[(String, Seq[Column])], k: Int,
      drop: Seq[String] = Nil): (DataFrame, Seq[Int]) = {
    require(ladders.nonEmpty && ladders.forall(_._2.nonEmpty),
      "need at least one quasi-identifier ladder with a level-0 expr")
    require(df.columns.forall(c => !ladders.exists(_._1 == c)),
      "ladder output names must not collide with input columns")
    val steps = schedule(ladders.map(_._2.size - 1))
    val chosen = steps.find { levels =>
      val mn = classSizes(df, ladders, levels)
        .agg(min(col("class_size"))).head()
      mn.isNullAt(0) || mn.getLong(0) >= k
    }.getOrElse(steps.last)
    val gen = df.select(
      df.columns.filterNot(drop.contains).map(col).toSeq ++
        ladders.zip(chosen).map { case ((n, lad), l) => lad(l).as(n) }: _*)
    val out = suppressBelowK(gen, ladders.map(_._1), k)
    (out, chosen)
  }

  /** k-anonymization by suppression: keep only rows whose
    * quasi-identifier class has >= k members. Null-safe on the join
    * keys (a null pattern class is suppressed or kept as a unit, like
    * any other). */
  def suppressBelowK(df: DataFrame, quasiIds: Seq[String], k: Int)
      : DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    require(df.columns.forall(!_.startsWith("__k_")),
      "__k_ column prefix is reserved by suppressBelowK's join")
    val keep = df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .where(col("class_size") >= k)
      .select(quasiIds.map(c => col(c).as(s"__k_$c")): _*)
    val cond = quasiIds.map(c => col(c) <=> col(s"__k_$c"))
      .reduce[Column](_ && _)
    df.join(keep, cond, "left_semi")
  }
}
