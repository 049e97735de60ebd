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
