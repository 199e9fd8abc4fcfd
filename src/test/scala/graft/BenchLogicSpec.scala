package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's own guard logic — the r14 regression shipped
  * because the harness compared only totals, so the guards themselves are
  * part of the product's measurement contract and need specs like any
  * operator:
  *   - [[Bench.anchorBasis]] must classify the two MEASURED r15 windows
  *     correctly (the coherent rerun on min, the bimodal morning run on
  *     median — where the min-normalized total was a nonsense 157 s vs
  *     128 by median);
  *   - [[Bench.regressionsVsPrev]] must fire on a ×1.5+ anchor-normalized
  *     gate, honor the 0.05 s prior floor and the error exclusion, and
  *     normalize across the two records' differing anchor ratios.
  */
class BenchLogicSpec extends AnyFunSuite {

  private val refs = Map("anchor_scan_agg" -> 0.144,
    "anchor_bcast_join" -> 0.084, "anchor_shuffle_join" -> 0.369)

  test("anchorBasis: the measured r15 coherent window stays on the min basis") {
    // mins/medians/maxes reconstructed from the committed r15 record's
    // per-anchor fields (min, med, spread=(max-min)/min)
    val samples = Map(
      "anchor_scan_agg" -> List(0.1998, 0.2272, 0.1998 * 1.579),
      "anchor_bcast_join" -> List(0.1276, 0.138, 0.1276 * 1.995),
      "anchor_shuffle_join" -> List(0.4502, 0.4691, 0.4502 * 1.54))
    val (basis, ratio) = Bench.anchorBasis(samples, refs)
    assert(basis === "min")
    assert(math.abs(ratio - 1.303) < 0.01)
  }

  test("anchorBasis: the measured r15 bimodal window flips to the median basis") {
    val samples = Map(
      "anchor_scan_agg" -> List(0.1576, 0.2185, 0.1576 * 2.163),
      "anchor_bcast_join" -> List(0.1005, 0.1594, 0.1005 * 2.841),
      "anchor_shuffle_join" -> List(0.4123, 0.4449, 0.4123 * 1.72))
    val (basis, ratio) = Bench.anchorBasis(samples, refs)
    assert(basis === "median")
    // median-based ratio ≈ 0.823 / 0.597 ≈ 1.38, the number that made the
    // bimodal run's normalized total agree with the coherent one
    assert(math.abs(ratio - 1.378) < 0.02)
  }

  test("regressionsVsPrev: fires on x1.5+, honors the floor, errors, and cross-ratio normalization") {
    val prev = """{"metric":"total","value":9.9,"anchor_ratio":1.2,""" +
      """"queries":{"q_slow":1.2,"q_flat":1.2,"q_tiny":0.04,""" +
      """"q_err":1.0,"q_gone":2.0},"errors":{}}"""
    val times = Map(
      "q_slow" -> 2.0,  // prevNorm 1.0, curNorm 2.0 → ×2.0: FIRES
      "q_flat" -> 1.1,  // prevNorm 1.0, curNorm 1.1 → ×1.1: quiet
      "q_tiny" -> 0.2,  // ×5 but prior 0.04 < 0.05 floor: quiet
      "q_err" -> 9.0,   // errored this run: quiet
      "q_new" -> 5.0)   // not in prev: quiet
    val out = Bench.regressionsVsPrev(prev, times, _ == "q_err", curRatio = 1.0)
    assert(out.map(_._1) === Seq("q_slow"))
    val (_, prevNorm, curNorm, ratio) = out.head
    assert(math.abs(prevNorm - 1.0) < 1e-9) // 1.2 / 1.2
    assert(math.abs(curNorm - 2.0) < 1e-9)
    assert(math.abs(ratio - 2.0) < 1e-9)
    // a slow current WINDOW (curRatio 2.0) must suppress the false alarm:
    // same raw times, but normalized they are flat
    assert(Bench.regressionsVsPrev(prev, times, _ == "q_err", curRatio = 2.0).isEmpty)
    // and a record with no queries block contributes nothing
    assert(Bench.regressionsVsPrev("{}", times, _ => false, 1.0).isEmpty)
  }

  test("anchorBasis: one hiccup sample on one anchor does not flip the basis (r16)") {
    // measured r16 window: scan spread 2.28 from a single bad sample while
    // the other anchors ran tight (0.61 / 0.36) — the old MEAN spread
    // (1.08) flipped to the median basis and normalized a 158 s run to a
    // nonsense 82 s; the median per-anchor spread (0.61) keeps min
    val samples = Map(
      "anchor_scan_agg" -> List(0.18, 0.2668, 0.18 * 3.275),
      "anchor_bcast_join" -> List(0.1123, 0.18, 0.1123 * 1.607),
      "anchor_shuffle_join" -> List(0.5321, 0.7113, 0.5321 * 1.362))
    val (basis, ratio) = Bench.anchorBasis(samples, refs)
    assert(basis === "min")
    assert(math.abs(ratio - 1.381) < 0.01)
  }

  test("regressionsVsPrev: parses scientific-notation prior times correctly") {
    // ADVICE r15: [0-9.]+ read 5E-1 as 5 — a ×4 real regression on a
    // half-second gate would then look like ×0.4 and stay silent
    val prev = """{"anchor_ratio":1.0,"queries":{"q_sci":5E-1,"q_neg":8.5E-4}}"""
    val out = Bench.regressionsVsPrev(prev, Map("q_sci" -> 2.0, "q_neg" -> 0.04),
      _ => false, curRatio = 1.0)
    assert(out.map(_._1) === Seq("q_sci"))
    val (_, prevNorm, _, ratio) = out.head
    assert(math.abs(prevNorm - 0.5) < 1e-9)
    assert(math.abs(ratio - 4.0) < 1e-9)
    // q_neg: prior 8.5e-4 is under the 0.05 s floor — quiet even though the
    // raw ratio is ×47 (the OLD parse read it as 8.5 and was quiet for the
    // wrong reason; this pins the right one)
  }

  test("sfMatches: requires a recorded sf and normalizes only the trailing slash") {
    val rec = """{"value":1.0,"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.sfMatches(rec, "/root/testdata/sf0.1"))
    assert(Bench.sfMatches(rec, "/root/testdata/sf0.1/"))
    assert(!Bench.sfMatches(rec, "/root/testdata/sf0.01"))
    // a record MISSING the field is never compared (the old forall matched it)
    assert(!Bench.sfMatches("""{"value":1.0}""", "/root/testdata/sf0.1"))
  }
}
