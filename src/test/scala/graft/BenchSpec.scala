package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's prior-cold reader — the r15 prior-laundering fix depends on
  * next round's Bench actually READING the best-evidence `prior_colds`
  * object this round writes, in preference to the raw first-pass
  * `queries` colds a debt-hit run can inflate.
  */
class BenchSpec extends AnyFunSuite {

  private def write(body: String): String = {
    val f = java.io.File.createTempFile("bench-latest", ".json")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, body.getBytes("UTF-8"))
    f.getAbsolutePath
  }

  test("priorColds prefers the best-evidence prior_colds object over the raw queries colds") {
    // q190-shaped artifact: first-pass cold 39.65 (debt-hit), best
    // evidence 9.70 — the next round must judge outliers against 9.70
    val p = write("""{"metric":"total_full","n_queries":2,""" +
      """"queries":{"q190_ppr":39.650,"q01_agg":1.200},""" +
      """"warm":{"q190_ppr":13.800,"q01_agg":0.400},""" +
      """"prior_colds":{"q190_ppr":9.700,"q01_agg":1.200},""" +
      """"telemetry":{"q190_ppr":[1.0,0.0,0.5,0.1,0.1]}}""")
    val m = Bench.priorColds(p)
    assert(m("q190_ppr") == 9.7)
    assert(m("q01_agg") == 1.2)
  }

  test("priorColds falls back to queries for pre-r15 artifacts without prior_colds") {
    val p = write("""{"metric":"total_full","n_queries":1,""" +
      """"queries":{"q146_hits":76.100,"q190_ppr":39.170},""" +
      """"warm":{"q146_hits":20.100}}""")
    val m = Bench.priorColds(p)
    assert(m("q146_hits") == 76.1 && m("q190_ppr") == 39.17)
  }

  test("priorColds: missing file or shape drift yields an empty map, never a throw") {
    assert(Bench.priorColds("/nonexistent/bench.json").isEmpty)
    assert(Bench.priorColds(write("""{"metric":"total"}""")).isEmpty)
    assert(Bench.priorColds(write("not json at all")).isEmpty)
  }

  test("priorWarms prefers prior_warms and falls back to the raw warm object") {
    val withBest = write("""{"metric":"total_full",""" +
      """"queries":{"q146_hits":16.200},""" +
      """"warm":{"q146_hits":17.329},""" +
      """"prior_warms":{"q146_hits":12.500}}""")
    assert(Bench.priorWarms(withBest)("q146_hits") == 12.5)
    val rawOnly = write("""{"metric":"total_full",""" +
      """"queries":{"q146_hits":16.200},""" +
      """"warm":{"q146_hits":17.329}}""")
    assert(Bench.priorWarms(rawOnly)("q146_hits") == 17.329)
    assert(Bench.priorWarms("/nonexistent/bench.json").isEmpty)
  }

  test("warm-prior gate: a synthetic warm inflation trips the drift verdict") {
    // r16's q146 shape: prior best-evidence warm 12.5 s, this round 17.3
    // — under the old harness this sailed through unflagged; the gate
    // must NOT trip it (1.38×), but a genuine 2× inflation must trip
    assert(!Bench.warmDrifted(17.3, Some(12.5)))   // +38%: below the gate
    assert(Bench.warmDrifted(25.1, Some(12.5)))    // 2×: trips
    assert(Bench.warmDrifted(3.1, Some(1.0)))      // 3× and >1s abs: trips
    assert(!Bench.warmDrifted(0.9, Some(0.3)))     // 3× but sub-second: no
    assert(!Bench.warmDrifted(30.0, None))         // no prior: never trips
  }

  test("GateCost: nested timed blocks count once; drain resets") {
    GateCost.drainSec()
    GateCost.timed {
      GateCost.timed { Thread.sleep(30) }
      Thread.sleep(30)
    }
    val s = GateCost.drainSec()
    assert(s >= 0.055 && s < 0.5, s)    // outer block once, not ~0.09+
    assert(GateCost.drainSec() == 0.0)  // drained
  }
}
