package graft

/** Offline cross-window spread tool for the volatile-list audit (VERDICT
  * r17 #3). The min-of-3 list's entry/exit rule is defined on the
  * cross-window spread of a gate's ANCHOR-NORMALIZED committed values —
  * max/min across ≥ 3 same-day full windows at one SF — but through r17
  * the spreads themselves were derived by hand from the bench_out files
  * and enumerated in [[Bench.volatileDefault]]'s scaladoc. This main
  * makes the audit one command: it reads N bench records, normalizes
  * each gate by its window's `anchor_ratio`, and emits per-gate spread
  * plus the entry/exit adjudication against the CURRENT list.
  *
  * Usage: `runMain graft.BenchSpread [record.json ...]` — with no args it
  * reads every `bench_out*.json` in the working directory (byte-identical
  * duplicates — e.g. the committed `bench_out.json` and its run-stamped
  * copy — are counted ONCE: a double-counted window would inflate every
  * gate's window count past the 3-window floor). Windows are filtered to
  * full runs at the audit SF (`SPARK_GRAFT_SF_DIR`, defaulting to
  * /root/testdata/sf0.1 like [[Bench.main]]) with an `anchor_ratio`
  * present and ≥ `SPARK_GRAFT_SPREAD_MIN_GATES` gates (default 200): a
  * subset run normalizes fine but its gates would count spread windows a
  * full audit never saw. `SPARK_GRAFT_SPREAD_ALL=1` dumps every gate's
  * row — audit artifacts should use it so exit evidence is in the record.
  *
  * The adjudication applies the pinned rule (hysteresis 1.4 enter /
  * 1.3 exit; ≥ 3 windows to act; membership re-earned when touched) and
  * prints a verdict per gate that is ON the list or CROSSES the enter
  * wire — the re-earning audit is then read, not re-derived.
  */
object BenchSpread {

  /** One gate's cross-window statistics over the loaded records. */
  final case class GateSpread(name: String, windows: Int, minNorm: Double,
      maxNorm: Double) {
    def spread: Double = if (minNorm > 0) maxNorm / minNorm else Double.NaN
  }

  /** Per-gate anchor-normalized cross-window spreads — pure so the spec
    * pins the normalization (a gate whose raw times track the window's
    * anchors has spread ~1) and the min/max bookkeeping. Records without
    * an `anchor_ratio` field normalize by 1.0 upstream of [[main]]'s
    * filter; errored gates (recorded as -1) are excluded.
    */
  def spreads(records: Seq[String]): Seq[GateSpread] = {
    val perGate = scala.collection.mutable.Map.empty[String, List[Double]]
    records.foreach { json =>
      val (ratio, entries) = Bench.prevGateEntries(json)
      entries.foreach { case (name, raw) =>
        if (raw > 0)
          perGate(name) = (raw / ratio) :: perGate.getOrElse(name, Nil)
      }
    }
    perGate.toSeq.map { case (name, norms) =>
      GateSpread(name, norms.length, norms.min, norms.max)
    }.sortBy(g => (-g.spread, g.name))
  }

  /** Median cross-window spread over the gates present in every one of
    * `windows` windows — the COHERENCE statistic of the window SET
    * itself. Per-gate spread only measures the GATE when the windows
    * agree on the typical gate; when one window ran uniformly slow in a
    * way the three anchors under-correct (heavy I/O phases the anchor
    * trio doesn't exercise), every gate's spread inflates together and
    * the population median rises with it. Measured: the three r17 full
    * windows read a population median of 1.54 — 85 gates crossed the
    * 1.4 entry wire at once, which is a statement about one window's
    * machine state, not about 85 gates.
    */
  def populationMedianSpread(gs: Seq[GateSpread], windows: Int)
      : Option[Double] = {
    val full = gs.filter(_.windows == windows).map(_.spread).sorted
    if (full.isEmpty) None else Some(full(full.length / 2))
  }

  /** The entry/exit rule, applied mechanically — pure for the spec.
    * `member` = currently on [[Bench.volatileDefault]];
    * `coherentForEntry` = the window set's [[populationMedianSpread]]
    * is under 1.25 (see below).
    *
    * ENTRY additionally requires (both made explicit in r18):
    *   - the gate's minimum normalized time ≥ 0.2 s (the same floor as
    *     [[Bench.gateMedianRatioVsPrev]]): a sub-floor gate's
    *     cross-window spread is scheduler noise on a near-zero
    *     denominator — on the four r16 windows, dozens of 0.06–0.15 s
    *     gates read 1.6–2.2× while every gate the hand audits actually
    *     kept sat above the floor — and a third timing pass cannot
    *     stabilize noise that small; the tripwire's own 0.05 s prior
    *     floor already keeps them from flagging;
    *   - a COHERENT window set (population median spread < 1.25): on an
    *     incoherent set the spread measures the box, and certifying a
    *     gate as individually volatile from it would enter half the
    *     bench at once.
    * EXIT has neither guard: an incoherent set only INFLATES spreads,
    * so a member reading < 1.3 despite the inflation is an extra-safe
    * exit, and leaving the list is always recoverable (it can re-earn).
    *
    * Known asymmetry, accepted deliberately: every window set measured
    * so far (four r16 windows, three r17 windows) reads population
    * median 1.40–1.54, so under this gate the list can only shrink
    * until a coherent set exists. That is the right failure mode — the
    * list's job is one EXTRA timing sample, while the actual defense
    * against spread-driven false flags is the tripwire's confirm pass
    * plus the leverage class, which work per-gate inside ONE run and
    * need no cross-window certification. A chronically noisy box keeps
    * its flap protection either way.
    */
  def adjudicate(g: GateSpread, member: Boolean,
      coherentForEntry: Boolean = true): String =
    if (g.windows < 3)
      if (member) "STAY (only " + g.windows + " window(s) — too new to exit)"
      else "off-list (only " + g.windows + " window(s))"
    else if (member && g.spread < 1.3) "EXIT (spread < 1.3)"
    else if (member) "STAY (spread >= 1.3)"
    else if (g.spread >= 1.4 && g.minNorm >= 0.2)
      if (coherentForEntry) "ENTER (spread >= 1.4)"
      else "enter-candidate SUPPRESSED (incoherent window set)"
    else if (g.spread >= 1.4) "off-list (sub-floor: min_norm < 0.2)"
    else "off-list"

  def main(args: Array[String]): Unit = {
    val minGates = sys.env.getOrElse("SPARK_GRAFT_SPREAD_MIN_GATES", "200").toInt
    val paths: Seq[java.nio.file.Path] =
      if (args.nonEmpty) args.toSeq.map(java.nio.file.Paths.get(_))
      else {
        val cwd = java.nio.file.Paths.get(".")
        val st = java.nio.file.Files.list(cwd)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala
            .filter(_.getFileName.toString.matches("bench_out.*\\.json"))
            .toSeq.sortBy(_.getFileName.toString)
        } finally st.close()
      }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val loadedAll = paths.flatMap { p =>
      try Some((p.getFileName.toString, java.nio.file.Files.readString(p)))
      catch { case e: Exception =>
        System.err.println(s"[spread] skip $p: $e"); None
      }
    }
    // byte-identical records are ONE window (the committed bench_out.json
    // is usually also present as its run-stamped copy)
    val loaded = loadedAll.foldLeft(
        (Seq.empty[(String, String)], Set.empty[String])) {
      case ((keep, seen), (name, json)) =>
        if (seen(json)) {
          System.err.println(s"[spread] $name: byte-identical to an " +
            "already-loaded record — counted once")
          (keep, seen)
        } else (keep :+ ((name, json)), seen + json)
    }._1
    val windows = loaded.filter { case (name, json) =>
      val full = json.contains("\"anchor_ratio\":") &&
        Bench.sfMatches(json, sfDir) &&
        Bench.prevGateEntries(json)._2.count(_._2 > 0) >= minGates
      if (!full) System.err.println(s"[spread] $name: not a full window " +
        s"at $sfDir (missing anchor_ratio, other sf, or < " + minGates +
        " gates) — excluded")
      full
    }
    println(s"# ${windows.size} full sf0.1 window(s) of ${loaded.size} " +
      s"record(s): ${windows.map(_._1).mkString(", ")}")
    val gs = spreads(windows.map(_._2))
    val popMed = populationMedianSpread(gs, windows.size)
    val coherent = popMed.forall(_ < 1.25)
    println(f"# population median spread ${popMed.getOrElse(Double.NaN)}%.3f" +
      s" over gates in all ${windows.size} windows — window set is " +
      (if (coherent) "COHERENT (entries valid)"
       else "INCOHERENT (entries suppressed; exits remain extra-safe)"))
    println("gate,windows,spread,min_norm,max_norm,on_list,adjudication")
    val dumpAll = sys.env.get("SPARK_GRAFT_SPREAD_ALL").exists(_ == "1")
    gs.foreach { g =>
      val member = Bench.volatileDefault(g.name)
      val verdict = adjudicate(g, member, coherent)
      // full rows for every gate that is on the list or crosses a wire
      // (SPARK_GRAFT_SPREAD_ALL=1 dumps the rest too — e.g. to record
      // the spreads of gates that recently exited); the long flat tail
      // is otherwise summarized, not dropped silently
      if (dumpAll || member || verdict.startsWith("ENTER") ||
          verdict.startsWith("enter-candidate"))
        println(f"${g.name},${g.windows},${g.spread}%.3f,${g.minNorm}%.3f," +
          f"${g.maxNorm}%.3f,$member,$verdict")
    }
    val offList = gs.filterNot(g => Bench.volatileDefault(g.name) ||
      adjudicate(g, member = false, coherent).startsWith("ENTER") ||
      adjudicate(g, member = false, coherent).startsWith("enter-candidate"))
    println(s"# ${offList.size} further gate(s) off-list below the enter " +
      "wire (max spread " +
      (if (offList.nonEmpty) f"${offList.map(_.spread).max}%.3f" else "n/a") +
      ")")
  }
}
