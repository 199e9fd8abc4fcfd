package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-19 optimization probes — interleaved A/B harnesses (the ProbeR18
  * methodology: both arms in one JVM, alternating passes, min-of-N per arm,
  * so box drift between separate runs cannot manufacture a win). Arm A is
  * the NEW default after this round's change; arm B restores the previous
  * shape via its A/B conf — B/A > 1 means the change wins.
  *
  * Sessions are built through [[graft.SessionDefaults]] (this round moved
  * the engine confs there), so probes measure exactly the shipped engine.
  */
object ProbeR19 {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "once"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // mode `plans <suffix> <k=v,...|-> <gate...>`: write each gate's
    // explain("formatted") to plans/r19/<gate>_<suffix>.txt under the given
    // session confs — the judge-checkable before/after plan artifacts.
    if (mode == "plans") {
      val suffix = args(1)
      if (args(2) != "-") args(2).split(",").foreach { kv =>
        val i = kv.indexOf('='); spark.conf.set(kv.take(i), kv.drop(i + 1))
      }
      val outDir = java.nio.file.Paths.get("plans/r19")
      java.nio.file.Files.createDirectories(outDir)
      args.drop(3).foreach { g =>
        // q219 materializes its counts eagerly (the gate returns a
        // LocalTableScan of four rows) — dump the INNER Expand-based
        // multi-distinct aggregate, which is where spreadScan acts
        val df = if (g == "q219_full_cardinality") {
          import org.apache.spark.sql.functions.{countDistinct, struct, col}
          val t = graft.Tables(spark, sfDir)
          val sets = Seq(Seq("l_orderkey"), Seq("l_orderkey", "l_linenumber"),
            Seq("l_returnflag", "l_linestatus"), Seq("l_suppkey"))
          val aggs = sets.zipWithIndex.map { case (s2, i) =>
            countDistinct(struct(s2.map(col): _*)).as(s"c$i") }
          graft.Tables.spreadScan(t.lineitem, "l_orderkey")
            .agg(aggs.head, aggs.tail: _*)
        } else graft.SparkEntry.queries(g)(spark, sfDir)
        java.nio.file.Files.writeString(outDir.resolve(s"${g}_$suffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        println(s"[probe-plans] wrote ${g}_$suffix.txt")
      }
      spark.stop(); return
    }

    // mode `count <k=v,...|-> <gate...>`: row counts under the given
    // session confs — correctness triage for conf-gated shapes
    if (mode == "count") {
      if (args(1) != "-") args(1).split(",").foreach { kv =>
        val i = kv.indexOf('='); spark.conf.set(kv.take(i), kv.drop(i + 1))
      }
      args.drop(2).foreach { g =>
        val n = graft.SparkEntry.queries(g)(spark, sfDir).count()
        println(s"[probe-count] $g rows=$n")
      }
      spark.stop(); return
    }

    // mode `bytes <k=v,...|-> <gate...>`: total shuffle bytes WRITTEN per
    // gate pass (listener-summed over stages) — the §2.3 artifact for
    // changes whose win is shuffle volume, not local wall time
    if (mode == "bytes") {
      val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
      val shuffleRecs = new java.util.concurrent.atomic.AtomicLong(0L)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null) {
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            shuffleRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten): Unit
          }
        }
      })
      if (args(1) != "-") args(1).split(",").foreach { kv =>
        val i = kv.indexOf('='); spark.conf.set(kv.take(i), kv.drop(i + 1))
      }
      args.drop(2).foreach { g =>
        graft.SparkEntry.queries(g)(spark, sfDir).count() // warmup
        Thread.sleep(300)
        shuffleBytes.set(0L); shuffleRecs.set(0L)
        graft.SparkEntry.queries(g)(spark, sfDir).count()
        Thread.sleep(500) // listener drain
        println(f"[probe-bytes] $g shuffleWrite=${shuffleBytes.get()}%d bytes " +
          f"records=${shuffleRecs.get()}%d")
      }
      spark.stop(); return
    }

    // mode `once <gate...>`: min/med-of-3 in THIS JVM — used for the
    // VERDICT #8 re-confirms (q237/q62/q102/q105) where there is no conf
    // arm, only "is the committed prev time reproducible on this box".
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

    // mode `attr <gate...>`: job-level attribution — wall time per gate
    // pass split into Spark job time vs driver/apparatus time, plus job
    // COUNT (a plan fact, not a box fact — the q242 claim rests on it).
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

    // mode `lm10`: the VERDICT r18 #9 crossover artifact for the LM/BPE
    // multi-branch family (q101/q123/q147 shape) — the branch re-scan
    // (tokenize per consumer) vs a materialized token table, at ×1 (gate
    // scale) and ×10 (scale-representative, the ScaleCheck replication).
    // The r16 A/B already measured materialization SLOWER at gate scale;
    // this prices both ends so the gate-code decision is scale-honest.
    if (mode == "lm10") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.DataFrame
      val docs0 = graft.Tables(spark, sfDir).documents
        .select("doc_id", "text").localCheckpoint(true)
      def scaled(factor: Int): DataFrame = {
        if (factor == 1) return docs0
        // the ScaleCheck replication: per-replica id offset + per-token
        // replica suffix, so vocabulary and bigram tables grow with the
        // corpus instead of collapsing to factor-duplicates
        docs0.crossJoin(spark.range(factor).select(col("id").as("__rep")))
          .select((col("doc_id") + col("__rep") * lit(10_000_000L)).as("doc_id"),
            array_join(transform(split(col("text"), "\\s+"),
              t => concat(t, lit("_"), col("__rep"))), " ").as("text"))
          .repartition(32).localCheckpoint(true)
      }
      // arm B: bigramLogLoss with the tokenize materialized ONCE (the
      // operator's own body, with withToks checkpointed before the three
      // consumers — model, vocab, scoring join)
      def bigramLogLossMat(df: DataFrame): DataFrame = {
        import graft.functions.TextFunctions
        val withToks = df.select(col("doc_id"),
          TextFunctions.tokens(col("text")).as("toks")).localCheckpoint(true)
        val pairs = withToks.filter(size(col("toks")) >= 2)
          .select(col("doc_id"), explode(transform(
            sequence(lit(2), size(col("toks"))),
            i => struct(element_at(col("toks"), i - 1).as("prev"),
              element_at(col("toks"), i).as("tok")))).as("p"))
          .select(col("doc_id"), col("p.prev").as("prev"), col("p.tok").as("tok"))
        val bigram = pairs.groupBy("prev", "tok").agg(count(lit(1)).cast("double").as("bc"))
        val model = bigram.join(
          bigram.groupBy("prev").agg(sum("bc").as("cc")), Seq("prev"))
        val vocab = withToks.select(explode(col("toks")).as("tok"))
          .agg(countDistinct(col("tok")).cast("double").as("v"))
        pairs.join(model, Seq("prev", "tok"))
          .crossJoin(broadcast(vocab))
          .groupBy("doc_id").agg(
            count(lit(1)).as("n_transitions"),
            round(
              sum(round(round(-log((col("bc") + 1.0) / (col("cc") + col("v"))), 6) * 1e6, 0).cast("long"))
                .cast("double") / (lit(1e6) * count(lit(1)).cast("double")),
              4).as("nll"))
      }
      for (factor <- Seq(1, 10)) {
        val docs = scaled(factor)
        def time(f: => Long): Double = {
          val t0 = System.nanoTime(); f
          val dt = (System.nanoTime() - t0) / 1e9
          System.gc(); Thread.sleep(100); dt
        }
        def armA() = time(graft.operators.Scoring
          .bigramLogLoss(docs, "text", "doc_id").count())
        def armB() = time(bigramLogLossMat(docs).count())
        armA(); armB() // warmup
        var (as, bs) = (List.empty[Double], List.empty[Double])
        for (p <- 1 to 3) {
          if (p % 2 == 1) { as ::= armA(); bs ::= armB() }
          else { bs ::= armB(); as ::= armA() }
        }
        println(f"[probe-lm10] bigram_ppl x$factor%-3d rescan(A) min=${as.min}%6.3f" +
          f"  materialized(B) min=${bs.min}%6.3f  B/A=${bs.min / as.min}%5.2f")
      }
      spark.stop(); return
    }

    // arm B session confs per mode (k=v pairs applied for B, unset for A)
    val (gates, armB) = mode match {
      // q215 source-apparatus: A = one shared ingest-dir source (new
      // default), B = the r11–r18 four-source union shape
      case "q215" => (
        Seq("q215_stream_outer_interval"),
        Seq("graft.q215.sources" -> "legacy"))
      // q215 one-vs-two sources: B = one ingest-dir source PER SIDE
      case "q215b" => (
        Seq("q215_stream_outer_interval"),
        Seq("graft.q215.sources" -> "perside"))
      // q212 shared source: B = the r18 two-source shape
      case "q212" => (
        Seq("q212_stream_interval_join"),
        Seq("graft.q212.sources" -> "two"))
      // q139 shingle-hash narrowing: B = shuffle the shingle STRING
      case "overlap" => (
        Seq("q139_source_overlap"),
        Seq("graft.overlap.hashShingles" -> "false"))
      // q175 shared-aggregate nBig: B = the raw-count scalar branch
      case "pmi" => (
        Seq("q175_pmi_bigrams"),
        Seq("graft.pmi.sharedNBig" -> "false"))
      // LM token-table materialization across the ppl family gates:
      // B = branch re-scan (the pre-r19 shape)
      case "lmgate" => (
        Seq("q101_unigram_ppl", "q109_ppl_filter", "q123_bigram_ppl",
          "q129_domain_weights", "q147_trigram_ppl", "q203_domain_tilt"),
        Seq("graft.lm.materializeTokens" -> "false"))
      // q219 spreadScan (VERDICT #7 — the r18 change that landed without
      // its A/B artifact): B = spread disabled (pre-r18 single-task scan)
      case "q219" => (
        Seq("q219_full_cardinality"),
        Seq("graft.scan.spreadWidth" -> "0"))
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
