package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the offline spread tool (VERDICT r17 #3): the per-gate
  * cross-window statistic is ANCHOR-NORMALIZED (a gate that merely
  * tracks the window's machine band reads flat), errored gates are
  * excluded, and the entry/exit adjudication is the pinned rule with its
  * 1.4/1.3 hysteresis.
  */
class BenchSpreadSpec extends AnyFunSuite {

  test("spreads: anchor normalization flattens band-tracking gates, surfaces genuine swing") {
    // window A at ratio 1.0, window B at ratio 2.0 (twice-slow box):
    // q_track doubles WITH the anchors (flat after normalization);
    // q_vol swings 3x raw = 1.5x normalized; q_err is excluded where -1
    val recA = """{"anchor_ratio":1.0,"queries":{"q_track":1.0,""" +
      """"q_vol":1.0,"q_err":1.0},"sf":"/x/sf0.1"}"""
    val recB = """{"anchor_ratio":2.0,"queries":{"q_track":2.0,""" +
      """"q_vol":3.0,"q_err":-1},"sf":"/x/sf0.1"}"""
    val out = BenchSpread.spreads(Seq(recA, recB)).map(g => g.name -> g).toMap
    assert(out("q_track").windows === 2)
    assert(math.abs(out("q_track").spread - 1.0) < 1e-9)
    assert(math.abs(out("q_vol").spread - 1.5) < 1e-9)
    assert(math.abs(out("q_vol").minNorm - 1.0) < 1e-9)
    assert(math.abs(out("q_vol").maxNorm - 1.5) < 1e-9)
    assert(out("q_err").windows === 1, "an errored (-1) sample is excluded")
    // sorted most-volatile first
    assert(BenchSpread.spreads(Seq(recA, recB)).head.name === "q_vol")
  }

  test("adjudicate: the pinned entry/exit rule with 1.4/1.3 hysteresis and the 3-window floor") {
    def g(w: Int, spread: Double) = BenchSpread.GateSpread("q", w, 1.0, spread)
    // on-list outcomes
    assert(BenchSpread.adjudicate(g(4, 1.25), member = true)
      .startsWith("EXIT"))
    assert(BenchSpread.adjudicate(g(4, 1.35), member = true)
      .startsWith("STAY"))
    assert(BenchSpread.adjudicate(g(2, 1.05), member = true)
      .contains("too new to exit")) // the q242 case
    // off-list outcomes: the enter wire is 1.4, NOT the exit wire
    assert(BenchSpread.adjudicate(g(4, 1.45), member = false)
      .startsWith("ENTER"))
    assert(BenchSpread.adjudicate(g(4, 1.35), member = false)
      === "off-list") // in the hysteresis band: no churn
    assert(BenchSpread.adjudicate(g(2, 9.0), member = false)
      .contains("only 2 window(s)"))
    // the entry floor: a sub-0.2 s gate's spread is noise on a near-zero
    // denominator — never entered, whatever the spread reads
    val tiny = BenchSpread.GateSpread("q_tiny", 4, 0.06, 0.13)
    assert(math.abs(tiny.spread - 13.0 / 6) < 1e-9)
    assert(BenchSpread.adjudicate(tiny, member = false).contains("sub-floor"))
    // ...but the floor never blocks an EXIT
    val tinyMember = BenchSpread.GateSpread("q_tiny_m", 4, 0.06, 0.07)
    assert(BenchSpread.adjudicate(tinyMember, member = true)
      .startsWith("EXIT"))
  }

  test("an incoherent window set suppresses entries but never blocks an exit (r18)") {
    // measured on the three r17 full windows: population median spread
    // 1.54 — one uniformly-slow window the anchors under-correct put 85
    // gates over the entry wire at once. That certifies the BOX, not 85
    // gates; entries are suppressed on such a set, while a member
    // reading < 1.3 DESPITE the inflation is an extra-safe exit.
    def g(spread: Double) = BenchSpread.GateSpread("q", 3, 1.0, spread)
    assert(BenchSpread.adjudicate(g(1.45), member = false,
      coherentForEntry = false).contains("SUPPRESSED"))
    assert(BenchSpread.adjudicate(g(1.45), member = false,
      coherentForEntry = true).startsWith("ENTER"))
    assert(BenchSpread.adjudicate(g(1.25), member = true,
      coherentForEntry = false).startsWith("EXIT"))
    // the coherence statistic: median spread over FULL-coverage gates
    // only (a gate missing from one window must not dilute the median)
    val gs = Seq(
      BenchSpread.GateSpread("a", 3, 1.0, 1.1),
      BenchSpread.GateSpread("b", 3, 1.0, 1.5),
      BenchSpread.GateSpread("c", 3, 1.0, 1.6),
      BenchSpread.GateSpread("new", 1, 1.0, 9.0))
    assert(BenchSpread.populationMedianSpread(gs, 3) === Some(1.5))
    assert(BenchSpread.populationMedianSpread(Nil, 3) === None)
  }
}
