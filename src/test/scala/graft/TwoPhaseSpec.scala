package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Similarity}

/** Bit-parity of the two-phase / grid decompositions against the
  * naive single-task shapes they replace: Analytics.globalRunning and
  * ntileFromRank vs literal global windows, Similarity.gridTopK vs
  * the broadcast bruteForceTopK. The decompositions exist ONLY for
  * plan shape (no single-task global sort, no corpus-fraction
  * broadcast) — outputs must be identical, not approximately equal. */
class TwoPhaseSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs() = spark.read.parquet(s"$dir/documents.parquet")

  test("globalRunning rank == global row_number (unique total order)") {
    GraftTestSpark.withCaches {
      val base = docs().select(col("doc_id"),
        col("n_chars").cast("long").as("v"))
      val naive = base.withColumn("rk",
        row_number().over(Window.orderBy(col("v").desc, col("doc_id")))
          .cast("long"))
      val two = Analytics.globalRunning(base,
        Seq(col("v").desc, col("doc_id")), rankOut = Some("rk"))
      // the Long contract holds END-TO-END: the output column is
      // LongType AND no IntegerType RowNumber feeds it anywhere in
      // the optimized plan (an Int intra rank would wrap inside a
      // >2^31-row range partition BEFORE any widening cast — the
      // round-10 finding; the intra rank must be a Long running count)
      assert(two.schema("rk").dataType ===
        org.apache.spark.sql.types.LongType)
      val rowNumbers = two.queryExecution.optimizedPlan.collect {
        case p => p.expressions.flatMap(_.collect {
          case r: org.apache.spark.sql.catalyst.expressions.RowNumber => r
        })
      }.flatten
      assert(rowNumbers.isEmpty,
        "globalRunning must not compute any rank through an " +
          "IntegerType row_number")
      assert(two.select("doc_id", "rk").except(
        naive.select("doc_id", "rk")).isEmpty)
      assert(naive.select("doc_id", "rk").except(
        two.select("doc_id", "rk")).isEmpty)
    }
  }

  test("globalRunning running sum == global running-sum window") {
    GraftTestSpark.withCaches {
      val base = docs().select(col("doc_id"),
        col("n_chars").cast("long").as("v"))
      val naive = base.withColumn("cum",
        sum(col("v")).over(Window.orderBy(col("v"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      val two = Analytics.globalRunning(base,
        Seq(col("v"), col("doc_id")), runningSums = Seq("v" -> "cum"))
      assert(two.select("doc_id", "cum").except(
        naive.select("doc_id", "cum")).isEmpty)
      assert(naive.select("doc_id", "cum").except(
        two.select("doc_id", "cum")).isEmpty)
    }
  }

  test("ntileFromRank == ntile for every n across N (incl. N < n)") {
    GraftTestSpark.withCaches {
      for (rows <- Seq(3L, 7L, 40L, 41L); n <- Seq(2, 5, 8)) {
        val base = spark.range(rows).select(col("id"))
        val naive = base.withColumn("t",
          ntile(n).over(Window.orderBy(col("id"))))
        val derived = base
          .withColumn("rk", row_number().over(Window.orderBy(col("id")))
            .cast("long"))
          .crossJoin(broadcast(base.agg(count(lit(1)).as("total"))))
          .withColumn("t", Analytics.ntileFromRank(col("rk"),
            col("total"), n))
          .select("id", "t")
        assert(derived.except(naive.select("id", "t")).isEmpty &&
          naive.select("id", "t").except(derived).isEmpty,
          s"ntile mismatch at rows=$rows n=$n")
      }
    }
  }

  test("gridTopK == bruteForceTopK (same pairs, ranks, sims)") {
    GraftTestSpark.withCaches {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = emb.where(col("id") % 7 === 0)
      val brute = Similarity.bruteForceTopK(queries, emb, k = 4)
      val grid = Similarity.gridTopK(queries, emb, k = 4,
        qBlocks = 3, cBlocks = 5)
      val cols = Seq("query_id", "rank", "neighbor_id", "sim")
      assert(grid.select(cols.map(col): _*).except(
        brute.select(cols.map(col): _*)).isEmpty)
      assert(brute.select(cols.map(col): _*).except(
        grid.select(cols.map(col): _*)).isEmpty)
    }
  }

  test("gridTopK plans an equi join on the grid cell, no broadcast " +
      "of a data-sized side") {
    GraftTestSpark.withCaches {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val plan = Similarity.gridTopK(emb, emb, k = 2)
        .queryExecution.optimizedPlan
      assert(PlanChecks.unboundedNestLoops(plan, 4096).isEmpty,
        "grid decomposition must be equi-keyed on the cell")
    }
  }
}
