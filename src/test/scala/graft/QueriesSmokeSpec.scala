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

  test("q28: HLL++ approx distinct lands within its error bound of exact") {
    // the one rows-only catalog entry (no cross-engine oracle for the
    // sketch) still gets a VALUE check: approx_count_distinct's default
    // rsd is 5%; require every group within 3x that of the exact count,
    // at the bigger sf0.01 so per-group cardinalities are meaningful
    val rows = SparkEntry.queries("q28_approx_distinct")(
      spark, "/root/testdata/sf0.01").collect()
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      val relErr = math.abs(approx - exact).toDouble / exact.max(1L)
      assert(relErr <= 0.15,
        s"${r.getString(0)}: approx=$approx exact=$exact relErr=$relErr")
    }
  }

  test("q126: histogram quantile estimate lands within one bin width " +
      "of the exact percentile") {
    // the oracle proves both engines compute the same sketch; this
    // pins the APPROXIMATION claim — a fixed-bin histogram's quantile
    // estimate cannot miss the true quantile by more than the width
    // of the bin that contains it (10 value units here), at the
    // bigger sf0.01 so per-type counts are meaningful
    val rows = SparkEntry.queries("q126_histogram_quantiles")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 15) // 5 event types x 3 quantiles
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(est - exact) <= 10.0,
        s"${r.getString(0)} p${r.getInt(1)}: est=$est exact=$exact")
    }
  }
}
