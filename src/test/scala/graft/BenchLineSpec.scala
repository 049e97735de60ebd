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

  test("oversize regime: per-query map drops, headline metrics survive") {
    val many = (1 to 300).map(i => (f"q$i%03d_some_name", 1.0, true))
    val line = Bench.jsonLine(many, "/sf", 3)
    assert(line.length <= 1800)
    val j = om.readTree(line)
    assert(j.get("queries").size() === 0) // map dropped
    assert(j.get("value").asDouble() === 300.0)
    assert(j.get("failed").size() === 0)
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
    assert(j.get("queries").size() === 0)
    assert(j.get("failed").size() === 0) // list degraded...
    assert(j.get("n_failed").asInt() === 300) // ...to a count
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
    // oversize regime: per-query map drops, calib must NOT — it is the
    // load record that explains a slow degraded run
    val many = (1 to 300).map(i => (f"q$i%03d_some_name", 1.0, true))
    val big = Bench.jsonLine(many, "/sf", 3, calib)
    assert(big.length <= 1800)
    val jb = om.readTree(big)
    assert(jb.get("queries").size() === 0)
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
