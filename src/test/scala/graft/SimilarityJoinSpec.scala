package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.VectorExpressions
import graft.operators.Similarity
import graft.plans.{SimilarityBandedJoinExec, SimilarityBroadcastGateExec, SimilarityJoinKernels, SimilarityJoinRewrite, SimJoinRegime}

/** The cosine-threshold join extension: logical node + stats-driven
  * strategy + two physical regimes + the naive-SQL rewrite rule. */
class SimilarityJoinSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  /** 60 deterministic 8-dim vectors: 10 tight clusters of 4 near-dup
    * vectors (planted pairs, within-cluster cosine ≈ 1) + 20 spread
    * singletons. No RNG — integer formulas only. */
  private def vecs(idCol: String, vecCol: String): DataFrame = {
    val rows = (0 until 60).map { i =>
      val arr: Array[Float] =
        if (i < 40) {
          val cluster = i / 4
          val jitter = (i % 4).toFloat / 50f
          Array.tabulate(8)(d =>
            (((cluster * 7 + d * 3) % 11).toFloat - 5f) + jitter * (d % 3))
        } else {
          Array.tabulate(8)(d => (((i * 13 + d * 5) % 17).toFloat - 8f))
        }
      (i.toLong, arr)
    }
    rows.toDF(idCol, vecCol)
  }

  private def exactPairs(t: Double): Set[(Long, Long)] = {
    val l = vecs("id_a", "va")
    val r = vecs("id_b", "vb")
    l.crossJoin(r)
      .where(VectorExpressions.cosineSim(
        col("va").cast("array<double>"),
        col("vb").cast("array<double>")) >= t && col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  private def collectPairs(df: DataFrame): Seq[(Long, Long)] =
    df.where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq

  private def findExec[T <: SparkPlan](df: DataFrame)(
      pf: PartialFunction[SparkPlan, T]): Seq[T] =
    df.queryExecution.executedPlan.collect(pf)

  test("broadcast gate regime is exact and plans as the custom exec") {
    val out = Similarity.cosineJoin(vecs("id_a", "va"), vecs("id_b", "vb"),
      "va", "vb", 0.9, SimJoinRegime.Exact)
    assert(findExec(out) {
      case e: SimilarityBroadcastGateExec => e
    }.nonEmpty)
    val got = collectPairs(out)
    assert(got.toSet === exactPairs(0.9))
    assert(got.size === got.toSet.size) // no duplicate emissions
  }

  test("banded regime: subset of exact, no duplicates, high recall on " +
      "planted near-dups, stable under repartitioning") {
    val banded = Similarity.cosineJoin(
      vecs("id_a", "va"), vecs("id_b", "vb"),
      "va", "vb", 0.9, SimJoinRegime.Banded)
    assert(findExec(banded) {
      case e: SimilarityBandedJoinExec => e
    }.nonEmpty)
    val got = collectPairs(banded)
    assert(got.size === got.toSet.size,
      "first-common-band dedup must prevent duplicate pair emissions")
    val exact = exactPairs(0.9)
    assert(got.toSet.subsetOf(exact), "banded may miss pairs, never invent")
    // planted within-cluster pairs are near-identical → their band
    // signatures collide; demand ≥ 80% of the exact set
    assert(got.size >= (exact.size * 8) / 10,
      s"recall too low: ${got.size} of ${exact.size}")
    // determinism across partitionings (integer signatures)
    val repart = Similarity.cosineJoin(
      vecs("id_a", "va").repartition(7), vecs("id_b", "vb").repartition(3),
      "va", "vb", 0.9, SimJoinRegime.Banded)
    assert(collectPairs(repart).toSet === got.toSet)
  }

  test("auto regime picks broadcast for a small side, banded when " +
      "nothing is broadcastable") {
    val small = Similarity.cosineJoin(vecs("id_a", "va"),
      vecs("id_b", "vb"), "va", "vb", 0.9)
    assert(findExec(small) {
      case e: SimilarityBroadcastGateExec => e
    }.nonEmpty)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val large = Similarity.cosineJoin(vecs("id_a", "va"),
        vecs("id_b", "vb"), "va", "vb", 0.9)
      assert(findExec(large) {
        case e: SimilarityBandedJoinExec => e
      }.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("naive cosine_sim >= t join condition rewrites to the exact " +
      "operator, residual conjuncts survive as a filter") {
    PlanBridge.addOptimization(spark, SimilarityJoinRewrite)
    val cond = VectorExpressions.cosineSim(
      col("va").cast("array<double>"),
      col("vb").cast("array<double>")) >= lit(0.9) &&
      col("id_a") < col("id_b")
    val naive = vecs("id_a", "va").join(vecs("id_b", "vb"), cond)
    assert(findExec(naive) {
      case e: SimilarityBroadcastGateExec => e
    }.nonEmpty, "rewrite must fire on the naive join condition")
    assert(findExec(naive) {
      case e: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => e
    }.isEmpty, "the O(n·m) BNLJ shape must be gone")
    val got = naive.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === exactPairs(0.9))
  }

  test("kernels: quantize rounds half away from zero; signature is " +
      "invariant to array copies; firstCommonBand finds the lowest") {
    assert(SimilarityJoinKernels.quantize(1e-6) === 1L)
    assert(SimilarityJoinKernels.quantize(-1e-6) === -1L)
    assert(SimilarityJoinKernels.quantize(0.0) === 0L)
    // half-away-from-zero is symmetric (Math.round's half-UP is not)
    val half = 12.5 / 1e6
    assert(SimilarityJoinKernels.quantize(half) ===
      -SimilarityJoinKernels.quantize(-half))
    val v = Array(0.25, -1.5, 3.75, 0.0)
    assert(SimilarityJoinKernels.signature(v, 64) ===
      SimilarityJoinKernels.signature(v.clone(), 64))
    // bands are byte-wide here: a/b agree on band 0, a/c first on band 2
    val a = 0x0000000011_00_22L
    val b = 0x0000000011_99_22L
    assert(SimilarityJoinKernels.firstCommonBand(a, b, 8, 8) === 0)
    val c = 0x0000000011_99_33L
    assert(SimilarityJoinKernels.firstCommonBand(a, c, 8, 8) === 2)
    assert(SimilarityJoinKernels.firstCommonBand(1L, 2L, 1, 8) === -1)
  }
}
