package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every catalog query runs and returns rows at sf0.001, has an
  * oracle entry, and entry() works (driver t1 contract). The value-level
  * correctness gate is the DuckDB compare (tools/oracle_check.py). */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle (or is explicitly approx-only)") {
    val approxOnly = Set("q28_approx_distinct") // HLL++ is engine-specific
    val noOracle =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- approxOnly
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, dir).count() > 0)
    }
  }
}
