package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-contract JSON line's three emission regimes
  * (Bench.jsonLine): the driver captures only the last ~2000 chars of
  * output and a head-truncated line silently parses as null
  * (BENCH_r01/r02), so the line must degrade structurally, never
  * overflow. Parsed with Jackson (on Spark's classpath) so "parses"
  * means parses, not matches-a-regex. */
class BenchLineSpec extends AnyFunSuite {
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  test("normal regime: full per-query map, qNN keys, 2-decimal values") {
    val line = Bench.jsonLine(Seq(
      ("q01_pricing_summary", 1.234, true),
      ("q107_portable_hll", 0.5, true)), "/sf", 3)
    assert(line.length <= 1800)
    val j = om.readTree(line)
    assert(j.get("queries").get("q01").asDouble() === 1.23)
    assert(j.get("queries").get("q107").asDouble() === 0.5)
    assert(j.get("value").asDouble() === 1.734) // totals keep 3 decimals
    assert(j.get("subset43").asDouble() === 1.234) // q107 is not subset
    assert(j.get("failed").size() === 0)
    assert(j.get("n").asInt() === 3)
  }

  test("subset43_best: emitted only when a run history exists, and " +
      "survives the oversize degradation ladder") {
    val none = Bench.jsonLine(Seq(("q01_x", 1.0, true)), "/sf", 3)
    assert(om.readTree(none).get("subset43_best") === null,
      "no history: the field must be absent, not -1")
    val some = Bench.jsonLine(Seq(("q01_x", 1.5, true)), "/sf", 3,
      subsetBest = 1.2)
    assert(om.readTree(some).get("subset43_best").asDouble() === 1.2)
    val many = (1 to 300).map(i => (f"q$i%03d_some_name", 1.0, true))
    val degraded = Bench.jsonLine(many, "/sf", 3, subsetBest = 40.0)
    assert(degraded.length <= 1800)
    assert(om.readTree(degraded).get("subset43_best").asDouble() === 40.0,
      "the best-of-round gate number is headline, not per-query detail")
  }

  test("failed query: -1 in the map, named in failed, subset43 fails closed") {
    val line = Bench.jsonLine(Seq(
      ("q02_revenue", 1.0, false),
      ("q99_cross_source", 2.0, true)), "/sf", 1)
    val j = om.readTree(line)
    assert(j.get("queries").get("q02").asInt() === -1)
    assert(j.get("subset43").asDouble() === -1.0) // NOT a passers-only sum
    assert(j.get("value").asDouble() === 2.0) // passers only in total
    assert(j.get("failed").get(0).asText() === "q02")
  }

  test("oversize regime: compact positional map, headline metrics survive") {
    val many = (1 to 300).map(i => (f"q$i%03d_some_name", 1.0, true))
    val line = Bench.jsonLine(many, "/sf", 3)
    assert(line.length <= 1800)
    val j = om.readTree(line)
    // the name-keyed map no longer fits; the compact regime still
    // carries EVERY per-query number (centiseconds, results order)
    // plus the name-list hash a decoder verifies against
    val q = j.get("queries")
    assert(q.get("enc").asText() === "cs")
    assert(q.get("cs").size() === 300)
    assert(q.get("cs").get(0).asInt() === 100) // 1.0 s = 100 cs
    assert(q.get("fnv").asText() ===
      Bench.namesFnv(many.map(_._1)))
    assert(j.get("value").asDouble() === 300.0)
    assert(j.get("failed").size() === 0)
  }

  test("compact map at the real catalog size: full per-query data in budget") {
    // 205+ realistic names/durations — the BENCH_r05 failure shape:
    // the name-keyed map overflowed and the driver artifact lost its
    // per-query numbers. The compact regime must keep them AND fit.
    val many = (1 to 240).map(i =>
      (f"q$i%03d_operator_family_name", i % 13 * 0.37 + 0.05, i % 37 != 0))
    val line = Bench.jsonLine(many, "/root/testdata/sf0.1", 3,
      Some((0.04, 2.1, 98)))
    assert(line.length <= 1800, s"line is ${line.length} chars")
    val j = om.readTree(line)
    assert(j.get("queries").get("cs").size() === 240)
    // failed queries are -1 in the positional array too
    assert(j.get("queries").get("cs").get(36).asInt() === -1)
  }

  test("fullJsonLine never degrades: the detail file keeps every per-query entry") {
    val many = (1 to 300).map(i => (f"q$i%03d_some_name", 1.0, true))
    val line = Bench.fullJsonLine(many, "/sf", 3)
    val j = om.readTree(line)
    assert(j.get("queries").size() === 300)
    assert(j.get("queries").get("q001").asDouble() === 1.0)
    assert(j.get("value").asDouble() === 300.0)
  }

  test("mass-failure regime: the failed list itself degrades to a count") {
    val many = (1 to 300).map(i => (f"q$i%03d_some_name", 1.0, false))
    val line = Bench.jsonLine(many, "/sf", 3)
    assert(line.length <= 1800)
    val j = om.readTree(line)
    // the compact map (all -1s, tiny) survives; the 300-name failed
    // list is what overflowed, so IT degrades to a count
    assert(j.get("queries").get("cs").size() === 300)
    assert(j.get("queries").get("cs").get(0).asInt() === -1)
    assert(j.get("failed").size() === 0) // list degraded...
    assert(j.get("n_failed").asInt() === 300) // ...to a count
  }

  test("replay_total: the streaming-replay class gets its own subtotal") {
    val line = Bench.jsonLine(Seq(
      ("q52_chained_metrics", 4.0, true),
      ("q73_session_replay", 3.0, true),
      ("q105_dynamic_session_replay", 2.5, true),
      ("q132_attribution_outer", 10.0, true),
      ("q01_pricing_summary", 1.0, true)), "/sf", 3)
    val j = om.readTree(line)
    assert(j.get("replay_total").asDouble() === 19.5)
    assert(j.get("value").asDouble() === 20.5) // replay stays in total
    // fail-closed: a failed replay query must not shrink the subtotal
    val failedLine = Bench.jsonLine(Seq(
      ("q52_chained_metrics", 4.0, false),
      ("q73_session_replay", 3.0, true)), "/sf", 3)
    assert(om.readTree(failedLine).get("replay_total").asDouble() === -1.0)
    // not-measured: a filtered run with no replay queries reads -1
    val noneLine = Bench.jsonLine(Seq(("q01_x", 1.0, true)), "/sf", 3)
    assert(om.readTree(noneLine).get("replay_total").asDouble() === -1.0)
  }

  test("iter_total: the iterative-algorithm class gets its own subtotal " +
      "(same fail-closed/not-measured contract as replay_total)") {
    val line = Bench.jsonLine(Seq(
      ("q93_pagerank", 5.0, true),
      ("q190_greedy_coverage", 4.5, true),
      ("q192_mining_recall", 5.5, true),
      ("q01_pricing_summary", 1.0, true)), "/sf", 3)
    val j = om.readTree(line)
    assert(j.get("iter_total").asDouble() === 15.0)
    assert(j.get("value").asDouble() === 16.0) // iter stays in total
    assert(j.get("replay_total").asDouble() === -1.0)
    // fail-closed
    val failedLine = Bench.jsonLine(Seq(
      ("q93_pagerank", 5.0, false),
      ("q171_kcore", 3.0, true)), "/sf", 3)
    assert(om.readTree(failedLine).get("iter_total").asDouble() === -1.0)
    // not-measured
    val noneLine = Bench.jsonLine(Seq(("q01_x", 1.0, true)), "/sf", 3)
    assert(om.readTree(noneLine).get("iter_total").asDouble() === -1.0)
    // the full nine-query class membership is the documented one
    assert(Bench.IterClass === Set("q81", "q91", "q92", "q93", "q118",
      "q171", "q190", "q191", "q192"))
  }

  test("no subset queries ran: subset43 is -1 (not measured), never 0.000") {
    val line = Bench.jsonLine(Seq(("q99_only_new", 2.0, true)), "/sf", 1)
    assert(om.readTree(line).get("subset43").asDouble() === -1.0)
  }

  test("calib context is emitted and survives the degraded regimes") {
    val calib = Some((0.031, 0.124, 2))
    val line = Bench.jsonLine(Seq(("q01_x", 1.0, true)), "/sf", 3, calib)
    val j = om.readTree(line)
    assert(j.get("calib").get("min").asDouble() === 0.031)
    assert(j.get("calib").get("max").asDouble() === 0.124)
    assert(j.get("calib").get("drift").asDouble() === 4.0)
    assert(j.get("calib").get("reruns").asInt() === 2)
    // oversize regime: the map degrades to compact, calib must NOT
    // degrade — it is the load record that explains a slow run
    val many = (1 to 300).map(i => (f"q$i%03d_some_name", 1.0, true))
    val big = Bench.jsonLine(many, "/sf", 3, calib)
    assert(big.length <= 1800)
    val jb = om.readTree(big)
    assert(jb.get("queries").get("enc").asText() === "cs")
    assert(jb.get("calib").get("drift").asDouble() === 4.0)
    // absent calib (a unit-test caller) emits no field at all
    val none = Bench.jsonLine(Seq(("q01_x", 1.0, true)), "/sf", 3)
    assert(om.readTree(none).get("calib") === null)
  }

  test("sfDir with quotes and backslashes still yields parseable JSON") {
    val line = Bench.jsonLine(Seq(("q01_x", 1.0, true)),
      """C:\data\"sf0.1"""", 1)
    assert(om.readTree(line).get("sf").asText() === """C:\data\"sf0.1"""")
  }
}
