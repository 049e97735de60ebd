package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{SetKernels, VectorExpressions}

/** Round-11: the merge-based sorted-intersect count must equal
  * size(array_intersect(...)) on sorted distinct arrays — the
  * pair-verification contract of prefixFilterPairs / minhashLshPairs. */
class SetKernelsSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("merge count equals array_intersect size on random sorted sets") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("i", "a", "b")
      .withColumn("merge",
        VectorExpressions.sortedIntersectCount(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(df.where(col("merge") =!= col("ref")).count() === 0)
  }

  test("kernel edge cases: empty, disjoint, identical, subset") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(xs: Long*) = ArrayData.toArrayData(xs.toArray)
    assert(SetKernels.sortedIntersectCount(arr(), arr(1L, 2L)) === 0L)
    assert(SetKernels.sortedIntersectCount(arr(1L, 3L), arr(2L, 4L)) === 0L)
    assert(SetKernels.sortedIntersectCount(arr(1L, 2L, 3L), arr(1L, 2L, 3L)) === 3L)
    assert(SetKernels.sortedIntersectCount(arr(2L, 3L), arr(1L, 2L, 3L, 9L)) === 2L)
    assert(SetKernels.sortedIntersectCount(
      arr(Long.MinValue, 0L, Long.MaxValue), arr(Long.MinValue, Long.MaxValue)) === 2L)
  }

  test("expression rejects non-long arrays") {
    val df = Seq((Seq(1.0), Seq(2.0))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(VectorExpressions.sortedIntersectCount(col("a"), col("b")))
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("sorted_intersect_count")
      || ex.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
