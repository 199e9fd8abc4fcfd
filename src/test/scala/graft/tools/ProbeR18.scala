package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-18 optimization probes — interleaved A/B harnesses (the
  * ProbeHllForms/ProbeUpsert methodology: both arms in one JVM, alternating
  * passes, min-of-N per arm, so box drift between separate runs cannot
  * manufacture a win).
  *
  * Mode `ckpt`: six streaming gates run with Spark's IMPLICIT temp
  * checkpoint (java.io.tmpdir — a contended DISK on this box; /dev/shm is
  * the tmpfs) vs `spark.sql.streaming.checkpointLocation` defaulted onto
  * the GateTmp (tmpfs-preferring) root. The q215/q210 gates already moved
  * their EXPLICIT checkpoints for exactly this reason (VERDICT r12 #4:
  * checkpoint fsyncs measure the box's disk, not the stream); this probe
  * measures whether the gates still on the implicit path pay the same tax.
  *
  * Mode `smj`: join-heavy batch gates with the session default
  * (preferSortMergeJoin=true) vs the shuffled-hash-friendly setting
  * (preferSortMergeJoin=false — guide-recommended where build sides fit;
  * at gate scale AQE already broadcasts most joins, so this measures
  * whether the residual SMJs matter).
  */
object ProbeR18 {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "ckpt"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
    // context-level confs (e.g. spark.serializer) can't be toggled per arm
    // in one JVM — GRAFT_PROBE_CONF ("k=v;k=v") applies them at build time
    // for alternating-JVM A/Bs
    val builder = sys.env.get("GRAFT_PROBE_CONF").map(_.split(";").toSeq)
      .getOrElse(Nil).filter(_.contains("="))
      .foldLeft(builder0) { (b, kv) =>
        val i = kv.indexOf('='); b.config(kv.take(i), kv.drop(i + 1))
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // mode `plans <suffix> <k=v,...|-> <gate...>`: write each gate's
    // explain("formatted") to plans/r18/<gate>_<suffix>.txt under the given
    // session confs — the judge-checkable before/after plan artifacts.
    if (mode == "plans") {
      val suffix = args(1)
      if (args(2) != "-") args(2).split(",").foreach { kv =>
        val i = kv.indexOf('='); spark.conf.set(kv.take(i), kv.drop(i + 1))
      }
      val outDir = java.nio.file.Paths.get("plans/r18")
      java.nio.file.Files.createDirectories(outDir)
      args.drop(3).foreach { g =>
        val df = graft.SparkEntry.queries(g)(spark, sfDir)
        java.nio.file.Files.writeString(outDir.resolve(s"${g}_$suffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        println(s"[probe-plans] wrote ${g}_$suffix.txt")
      }
      spark.stop(); return
    }

    // mode `once <gate...>`: min/med-of-3 in THIS JVM (for alternating-JVM
    // A/Bs of context-level confs via GRAFT_PROBE_CONF)
    if (mode == "once") {
      val gs = args.drop(1).toSeq
      def one(n: String): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        System.gc(); Thread.sleep(100); dt
      }
      gs.foreach(one) // warmup
      val ss = scala.collection.mutable.Map.empty[String, List[Double]]
      for (_ <- 1 to 3; g <- gs) ss(g) = one(g) :: ss.getOrElse(g, Nil)
      var tot = 0.0
      gs.foreach { g =>
        val xs = ss(g); tot += xs.min
        println(f"[probe-once] $g%-28s min=${xs.min}%6.3f med=${xs.sorted.apply(xs.length / 2)}%6.3f")
      }
      println(f"[probe-once] TOTAL(min) $tot%7.3f")
      spark.stop(); return
    }

    // mode `attr <gate...>`: job-level attribution (the ProbeUpsert
    // listener) — wall time per gate pass split into Spark job time vs
    // driver/apparatus time (stream start/stop, FS protocol, planning),
    // so a gate's floor is attributable before touching its code.
    if (mode == "attr") {
      val jobTimes = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          starts.put(j.jobId, (desc, System.nanoTime())): Unit
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val e = starts.remove(j.jobId)
          if (e != null) jobTimes.add((e._1, System.nanoTime() - e._2)): Unit
        }
      })
      val gs = args.drop(1).toSeq
      gs.foreach { g => graft.SparkEntry.queries(g)(spark, sfDir).count() } // warmup
      for (pass <- 1 to 3; g <- gs) {
        jobTimes.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(g)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let listener drain
        val js = jobTimes.toArray(Array.empty[(String, Long)])
        val jobSecs = js.map(_._2 / 1e9).sum
        println(f"[probe-attr] $g%-28s pass=$pass wall=$wall%6.3f " +
          f"jobs=${js.length}%3d jobTime=$jobSecs%6.3f apparatus=${wall - jobSecs}%6.3f")
        if (pass == 3) js.sortBy(-_._2).take(12).foreach { case (d, ns) =>
          println(f"[probe-attr]    ${ns / 1e9}%6.3f  ${d.take(110)}")
        }
        System.gc(); Thread.sleep(100)
      }
      spark.stop(); return
    }

    // arm B session confs per mode (k=v pairs applied for B, unset for A)
    val (gates, armB) = mode match {
      case "ckpt" => (
        Seq("q100_stream_curation", "q132_stream_sessionize",
          "q141_stream_windowed", "q205_stream_near_dedup",
          "q212_stream_interval_join", "q213_stream_enrich"),
        Seq("spark.sql.streaming.checkpointLocation" ->
          graft.queries.GateTmp.dir("graft_probe_ckpt").toString))
      case "smj" => (
        Seq("q5_join5", "q4_join_agg", "q34_multiway_star",
          "q148_cohort_retention", "q223_pkfk_chain", "q139_source_overlap",
          "q76_contamination", "q86_recursive_sql", "q43_wcc"),
        Seq("spark.sql.join.preferSortMergeJoin" -> "false"))
      case "smj2" => (
        Seq("q5_join5", "q34_multiway_star", "q148_cohort_retention",
          "q139_source_overlap", "q76_contamination", "q86_recursive_sql",
          "q43_wcc", "q95_label_prop", "q42_pagerank", "q44_sssp",
          "q166_ppr", "q96_kcore", "q114_semantic_curation",
          "q175_pmi_bigrams", "q57_ngram_jaccard", "q68_dedup_clusters"),
        Seq("spark.sql.join.preferSortMergeJoin" -> "false",
          "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "134217728"))
      // NOTE inverted arms: A = default (spread ON, "auto"), B = disabled
      // ("0", the pre-r18 single-task shape) — B/A > 1 means spread wins.
      case "spread" => (
        Seq("q57_ngram_jaccard", "q130_repeated_ngrams", "q167_containment"),
        Seq("graft.scan.spreadWidth" -> "0"))
      case "spread2" => (
        Seq("q55_minhash_lsh", "q62_simhash_hamming", "q68_dedup_clusters",
          "q74_tfidf", "q76_contamination", "q91_curation_pipeline",
          "q101_unigram_ppl", "q103_dup_spans", "q109_ppl_filter",
          "q110_bpe_merges", "q111_bpe_encode", "q114_semantic_curation",
          "q116_cms_freq", "q122_line_dedup", "q123_bigram_ppl",
          "q129_domain_weights", "q139_source_overlap", "q147_trigram_ppl",
          "q157_edit_near_dup", "q175_pmi_bigrams", "q195_source_attribution",
          "q201_suffix_dup", "q203_domain_tilt", "q204_fertility",
          "q209_distinct_ngrams"),
        Seq("graft.scan.spreadWidth" -> "0"))
      // keepers-confirmation pass: only gates that KEPT spreadScan after
      // the spread/spread2 rollout probes (losers reverted)
      case "spread3" => (
        Seq("q57_ngram_jaccard", "q68_dedup_clusters", "q76_contamination",
          "q122_line_dedup", "q130_repeated_ngrams", "q139_source_overlap",
          "q175_pmi_bigrams", "q201_suffix_dup", "q209_distinct_ngrams"),
        Seq("graft.scan.spreadWidth" -> "0"))
      // q219: spread lineitem under the ×4 Expand of the multi-countDistinct
      case "q219" => (
        Seq("q219_full_cardinality"),
        Seq("graft.scan.spreadWidth" -> "0"))
      // q105 tripwire adjudication: did the SHJ preference change its cost?
      // A = old bench default (SMJ preferred), B = the new bench setting.
      case "q105" => (
        Seq("q105_chunk_windows", "q75_doc_repetition"),
        Seq("spark.sql.join.preferSortMergeJoin" -> "false"))
      // streaming HLL map spread (q210/q211 via Tables.streamSpreadWidth)
      case "hll" => (
        Seq("q210_stream_distinct_hll", "q211_stream_hll_p10"),
        Seq("graft.scan.spreadWidth" -> "0"))
      case "aqe" => (
        Seq("q43_wcc", "q95_label_prop", "q42_pagerank", "q44_sssp",
          "q166_ppr", "q96_kcore", "q86_recursive_sql", "q143_pca_power",
          "q94_kmeans", "q239_cbo_estimation", "q242_ivf_drift_rebuild",
          "q187_ivf_index_roundtrip", "q241_ivf_index_append"),
        Seq("spark.sql.adaptive.enabled" -> "false"))
      case other => sys.error(s"unknown probe mode $other")
    }

    def runGate(n: String): Double = {
      val fn = graft.SparkEntry.queries(n)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc(); Thread.sleep(100)
      dt
    }

    gates.foreach(runGate) // warmup, uncounted
    val samples =
      scala.collection.mutable.Map.empty[(String, String), List[Double]]
    for (pass <- 1 to 3; arm <- if (pass % 2 == 1) Seq("A", "B") else Seq("B", "A")) {
      if (arm == "B") armB.foreach { case (k, v) => spark.conf.set(k, v) }
      else armB.foreach { case (k, _) => spark.conf.unset(k) }
      for (g <- gates)
        samples((g, arm)) = runGate(g) :: samples.getOrElse((g, arm), Nil)
    }
    var (sumA, sumB) = (0.0, 0.0)
    for (g <- gates) {
      val (a, b) = (samples((g, "A")), samples((g, "B")))
      def med(xs: List[Double]) = xs.sorted.apply(xs.length / 2)
      sumA += a.min; sumB += b.min
      println(f"[probe-$mode] $g%-28s A min=${a.min}%6.3f med=${med(a)}%6.3f" +
        f"  B min=${b.min}%6.3f med=${med(b)}%6.3f  B/A=${b.min / a.min}%5.2f")
    }
    println(f"[probe-$mode] TOTAL(min) A=$sumA%7.3f B=$sumB%7.3f B/A=${sumB / sumA}%5.2f")
    spark.stop()
  }
}
