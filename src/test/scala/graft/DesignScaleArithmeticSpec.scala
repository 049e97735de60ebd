package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Design-scale arithmetic: the catalog's exact basis-point /
  * fixed-point expressions evaluated at operand magnitudes the 100 TB
  * design point actually produces — corpus-scale cents totals and
  * user/order counts near Long range, where a raw `long * 10000`
  * wraps negative under Spark's default non-ANSI arithmetic and
  * silently misclassifies (the round-10 q177 finding). Every
  * expression here is the literal production expression shape with
  * synthetic near-Long.MaxValue inputs; expectations are computed in
  * BigInt, so a wrap anywhere fails loudly. Under this repo's
  * sessions (Spark 4 ANSI default) the unfixed `long * 10000` ABORTS
  * the whole query at design scale; on a non-ANSI deployment it wraps
  * negative and silently misclassifies — either way the query is dead
  * at sf ≳ 40, and small-SF oracles (values ~1e10) can never catch
  * it, which is why these magnitudes get their own spec. */
class DesignScaleArithmeticSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark

  private def df1(names: (String, Long)*) = {
    val schema = StructType(names.map(n => StructField(n._1, LongType)))
    spark.createDataFrame(
      java.util.List.of(Row(names.map(_._2): _*)), schema)
  }

  // total_c at 100 TB ≈ 2.3e18 cents — ·10000 is 2.3e22, far past
  // Long.MaxValue (9.22e18). cum set to 79.99% / 95.01% of total so
  // a wrapped compare flips the class.
  private val total = 2300000000000000000L // 2.3e18
  private val cumA = (BigInt(total) * 7999 / 10000).toLong
  private val cumC = (BigInt(total) * 9501 / 10000).toLong

  test("q177 ABC classification does not wrap at corpus cents totals") {
    def cls(cum: Long): String =
      df1("cum_c" -> cum, "total_c" -> total)
        .withColumn("cls",
          when(col("cum_c").cast("decimal(38,0)") * 10000
              <= col("total_c").cast("decimal(38,0)") * 8000, "A")
            .when(col("cum_c").cast("decimal(38,0)") * 10000
              <= col("total_c").cast("decimal(38,0)") * 9500, "B")
            .otherwise("C"))
        .select("cls").head().getString(0)
    assert(cls(cumA) === "A")
    assert(cls((BigInt(total) * 9000 / 10000).toLong) === "B")
    assert(cls(cumC) === "C")
    // the pre-fix long arithmetic DOES overflow at these magnitudes
    // (ANSI default: the query aborts) — prove the magnitudes
    // exercise the failure this spec guards
    val e = intercept[Exception] {
      df1("cum_c" -> cumC, "total_c" -> total)
        .select((col("cum_c") * 10000).as("w")).head().getLong(0)
    }
    assert(e.getMessage.toLowerCase.contains("overflow"),
      s"expected raw long cum_c*10000 to overflow, got: $e")
  }

  test("q177 share_bp exact at corpus cents totals") {
    val revC = cumA // one class holding ~80% of revenue
    val got = df1("rev_c" -> revC, "total_c" -> total)
      .select(expr("cast(rev_c as decimal(38,0)) * 10000" +
        " div total_c").as("share_bp"))
      .head().getLong(0)
    assert(got === (BigInt(revC) * 10000 / BigInt(total)).toLong)
  }

  test("q175 lift_1e6 exact at corpus order counts") {
    // 1.5e11 orders (sf 1e5); a strong pair: s_ab·n·1e6 ≈ 2e28
    val n = 150000000000L
    val sAb = 40000000000L; val sA = 60000000000L
    val sB = 70000000000L
    val got = df1("s_ab" -> sAb, "n_orders" -> n, "s_a" -> sA,
        "s_b" -> sB)
      .select(expr("cast(s_ab as decimal(38,0)) * n_orders * 1000000" +
        " div (cast(s_a as decimal(38,0)) * s_b)").as("lift_1e6"))
      .head().getLong(0)
    val want = (BigInt(sAb) * n * 1000000 / (BigInt(sA) * sB)).toLong
    assert(got === want && want > 0)
  }

  test("q169 conversion predicate and lift_bp exact at corpus users") {
    val nUsers = 10000000000L // 1e10 users
    val cu = 2000000000L      // a hot user's per-type count
    val st = (BigInt(cu) * nUsers - 1).toLong // just below cu·N
    val conv = df1("cu" -> cu, "n_users" -> nUsers, "st" -> st)
      .where(col("cu").cast("decimal(38,0)") * col("n_users")
        > col("st"))
    assert(conv.count() === 1L,
      "cu·N wrapped negative and dropped the most-converted user")
    val c0 = 3000000000L; val n0 = 5000000000L
    val c1 = 4000000000L; val n1 = 5000000000L
    val got = df1("c0" -> c0, "n0" -> n0, "c1" -> c1, "n1" -> n1)
      .select(expr("(cast(c1 as decimal(38,0)) * n0 -" +
        " cast(c0 as decimal(38,0)) * n1) * 10000" +
        " div nullif(cast(c0 as decimal(38,0)) * n1, 0)").as("lift_bp"))
      .head().getLong(0)
    val want = ((BigInt(c1) * n0 - BigInt(c0) * n1) * 10000 /
      (BigInt(c0) * n1)).toLong
    assert(got === want && want > 0)
  }

  test("q197 seasonal index exact at corpus event counts") {
    val sDow = 2000000000000L; val dTotal = 3650L
    val sTotal = 9000000000000L; val dDow = 521L
    val got = df1("s_dow" -> sDow, "d_total" -> dTotal,
        "s_total" -> sTotal, "d_dow" -> dDow)
      .select(expr("cast(s_dow as decimal(38,0)) * d_total * 10000" +
        " div (cast(s_total as decimal(38,0)) * d_dow)").as("idx_bp"))
      .head().getLong(0)
    val want = (BigInt(sDow) * dTotal * 10000 /
      (BigInt(sTotal) * dDow)).toLong
    assert(got === want && want > 0)
  }

  test("q203 Lorenz shares exact at corpus segment revenue") {
    val s = 4600000000000000000L // 4.6e18 cents segment revenue
    val dx = (BigInt(s) * 37 / 100).toLong
    val got = df1("dx" -> dx, "s" -> s)
      .select(expr("cast(dx as decimal(38,0)) * 10000 div s")
        .as("share_bp"))
      .head().getLong(0)
    assert(got === (BigInt(dx) * 10000 / BigInt(s)).toLong)
    assert(got === 3700L)
  }

  test("q167 clustering coefficient exact at hub degree") {
    val deg = 50000000L // 5e7-degree hub: deg²·1e4 ≈ 2.5e19+
    val tri = BigInt(deg) * (deg - 1) / 4 // cc = 0.5 exactly
    val got = df1("deg" -> deg, "n_triangles" -> tri.toLong)
      .select(expr("2 * cast(coalesce(n_triangles, 0) as" +
        " decimal(38,0)) * 10000 div (cast(deg as decimal(38,0))" +
        " * (deg - 1))").as("cc_bp"))
      .head().getLong(0)
    assert(got === 5000L)
  }

  test("q183 transition probability exact at corpus event counts") {
    val tAb = 8000000000000L; val tA = 9200000000000L
    val got = df1("t_ab" -> tAb, "t_a" -> tA)
      .select(expr("cast(t_ab as decimal(38,0)) * 1000000 div t_a")
        .as("p_1e6"))
      .head().getLong(0)
    assert(got === (BigInt(tAb) * 1000000 / BigInt(tA)).toLong)
  }
}
