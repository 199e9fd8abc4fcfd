package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Doc-drift canary — the rounds 7/8/9 verdicts each caught README gate
  * counts pinned one commit behind the contract (a gate added after the
  * bench-record commit). This spec mechanizes the rule "bench artifact +
  * README move in the same commit as the gate that grew the suite":
  *
  *   - every current-state gate-count claim in README.md must equal
  *     `SparkEntry.queries.size`;
  *   - the committed `bench_out.json` must cover exactly the declared
  *     gate set (so a new gate forces a full re-bench before the suite
  *     goes green — see the memory note: never commit a subset run);
  *   - README's pinned bench record (the LARGEST "N-query suite at T s"
  *     claim — earlier ones are historical narrative) must match that
  *     artifact's count and total.
  */
class ReadmeCanarySpec extends AnyFunSuite {

  private lazy val readme = Files.readString(Paths.get("README.md"))
  private lazy val declared = SparkEntry.queries.keySet
  private lazy val bench = Files.readString(Paths.get("bench_out.json"))

  test("README gate-count claims match SparkEntry.queries.size") {
    val n = declared.size
    val claims =
      raw"contract: (\d+) gate queries".r.findAllMatchIn(readme).map(_.group(1).toInt).toSeq ++
        raw"\((\d+) at this writing".r.findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    assert(claims.nonEmpty, "README lost its gate-count claims — keep the canary markers")
    assert(claims.forall(_ == n),
      s"README claims gate count(s) ${claims.mkString(", ")} but SparkEntry declares $n — " +
        "update README.md in the same commit as the gate change")
  }

  test("committed bench_out.json covers exactly the declared gate set") {
    val qBlock = bench.substring(bench.indexOf("\"queries\":{"))
    val inner = qBlock.substring("\"queries\":{".length, qBlock.indexOf("}"))
    val benched = raw""""(q[0-9]+[a-zA-Z0-9_]*)":""".r
      .findAllMatchIn(inner).map(_.group(1)).toSet
    val missing = declared -- benched
    val extra = benched -- declared
    def few(s: Set[String]) =
      s"${s.size} (${s.toSeq.sorted.take(5).mkString(", ")}${if (s.size > 5) ", …" else ""})"
    assert(missing.isEmpty && extra.isEmpty,
      s"bench_out.json drifted from the contract — missing=${few(missing)} " +
        s"extra=${few(extra)}; re-run the FULL graft.Bench at sf0.1 and commit " +
        "it with the README numbers (never a subset run)")
  }

  test("README's pinned bench record matches the committed artifact") {
    val records = raw"(\d+)-query suite at ([0-9.]+) s".r.findAllMatchIn(readme)
      .map(m => (m.group(1).toInt, m.group(2).toDouble)).toSeq
    assert(records.nonEmpty, "README lost its bench-record claim")
    val (cnt, total) = records.maxBy(_._1) // earlier, smaller ones are history
    assert(cnt == declared.size,
      s"README pins a $cnt-query bench record but the contract declares ${declared.size}")
    val value = raw""""value":([0-9.]+)""".r.findFirstMatchIn(bench).get.group(1).toDouble
    assert(math.abs(value - total) < 0.1,
      f"README pins the bench record at $total%.1f s but bench_out.json holds $value%.1f s")
  }

  test("README documents the r17 tripwire confirm pass and the min-of-3 entry/exit rule") {
    // VERDICT r16 #3/#4: the tripwire requires persistence (a confirm
    // re-measure) before flagging, and the min-of-3 list carries an
    // entry/exit rule with a pinned gate count. README must say both —
    // and the count it pins must BE the code's.
    assert(readme.contains("confirm"),
      "README no longer documents the tripwire confirm pass")
    val pinned = raw"min-of-3 list holds\s+(\d+)\s+gates".r
      .findFirstMatchIn(readme).map(_.group(1).toInt)
    assert(pinned.contains(Bench.volatileDefault.size),
      s"README pins the min-of-3 list at ${pinned.getOrElse("<missing>")} " +
        s"gates but Bench.volatileDefault holds ${Bench.volatileDefault.size} — " +
        "re-run the spread measurement and update both in one commit")
    assert(readme.contains("gate_median_ratio_vs_prev"),
      "README must quote the machine-computed round-over-round field")
  }

  test("README's anchor-basis thresholds match Bench.anchorBasis's boundary behavior") {
    // r15 shipped README saying the median basis engages at "≥ 1.3× the
    // mins" while Bench used 1.15 — and the measured bimodal window
    // (1.228) fell exactly between them, so the stale sentence
    // re-documented the bug the calibration commit fixed. Pin BOTH the
    // README text and the detector's actual flip points.
    assert(readme.contains("≥ 1.15× the mins"),
      "README no longer documents the 1.15 median-basis threshold")
    assert(!raw"≥ 1\.3× the mins".r.findFirstIn(readme).isDefined,
      "README still carries the stale 1.3 threshold sentence")
    val refs = Map("anchor_scan_agg" -> 0.144,
      "anchor_bcast_join" -> 0.084, "anchor_shuffle_join" -> 0.369)
    // three samples per anchor with medSum/minSum = f and avg spread = s
    def win(f: Double, s: Double) = refs.keys.map { k =>
      k -> List(0.2, 0.2 * f, 0.2 * (1 + s))
    }.toMap
    assert(Bench.anchorBasis(win(1.16, 0.85), refs)._1 === "median")
    assert(Bench.anchorBasis(win(1.14, 0.85), refs)._1 === "min",
      "median-ratio threshold drifted below the documented 1.15")
    assert(Bench.anchorBasis(win(1.16, 0.75), refs)._1 === "min",
      "spread threshold drifted below the documented 0.8")
  }
}
