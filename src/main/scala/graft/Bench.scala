package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: headline queries (SURVEY.md §6) timed against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Results materialize through the noop sink — `count()` would let
  * Catalyst prune the projections and under-report the real work.
  * One untimed warm-up of the first query absorbs JIT + codegen
  * compilation so timings reflect steady-state execution.
  *
  * Variance protocol (round 6): a single-sample number is not
  * evidence — it cannot be distinguished from a lucky (or loaded)
  * machine. Each query runs SPARK_GRAFT_BENCH_RUNS times (default 3)
  * and the artifact records, per query, the MIN (the machine's
  * capability — what a judge's clean re-run should approach) and the
  * MEDIAN (the typical run), plus per-query spread and /proc/loadavg
  * before and after the whole suite, so a re-reader can tell
  * environment inflation (uniform min≪median, high loadavg) from a
  * plan regression (one query's min moved). `value` stays the
  * min-total for continuity with earlier rounds' artifacts.
  */
object Bench {

  val headline: Seq[String] = Seq(
    "q1_agg", "q_tpch_q3", "q_tpch_q5", "q_multi_join",
    "q_window_running", "dedup_exact", "dedup_minhash_lsh",
    "sim_topk_bruteforce", "text_quality", "stream_sessionize",
    // round 2: the two shuffle-heavy curation additions
    "pipeline_contamination", "text_unigram_logprob",
    // round 6: the scale paths SURVEY §5 argues for — the cluster
    // collapse (not just the pair path) and the never-shuffle-the-
    // token-stream logprob
    "dedup_minhash_clusters", "text_unigram_logprob_smoothed",
    // round 7: the serving layer — probe a persisted index at rest.
    // Build-once-per-JVM: run 1 absorbs the build (visible as spread),
    // the MIN is the steady-state probe cost a serving regression moves
    "serve_ann_probe",
    // round 10: the bucketed range join — one of the two queries the
    // timestamp-vintage regression silently killed; benched so the
    // temporal-join path has a tracked number like stream_sessionize
    "q_range_join",
    // round 10 (cont.): the DSIR selection pass — token-stream-shaped
    // like the logprob entries but with the broadcast bucket-table
    // scoring join; tracks the new pretraining-selection family
    "pipeline_dsir_weight",
    // round 11: the two operators whose SHAPE changed this round (the
    // de-windowed ccnet terciles and the bucketed interleave rank) —
    // benched so a resurrected corpus-sized window shows up as a
    // number, not just a failed plan assertion
    "quality_ccnet_bucket", "pipeline_interleave",
    // round 12: same rule — the two operators whose shape changed this
    // round (tfidf df de-windowed to agg+ReusedExchange-join; binned
    // packing's rank sub-bucketed by doc_id range)
    "text_tfidf_vectors", "pipeline_pack_binned",
    // round 13: the two new corpus-pass operators — the closed
    // tokenizer loop (fit 12 merges + encode every doc: the vocab
    // iteration + word-stream join shape) and the dup-gram share
    // (tfidf-shaped double agg over positional gram hashes with a
    // runtime-reused exchange)
    "text_bpe_encode", "quality_dup_ngram_share",
    // round 13b: corpus-order novelty (min-agg join-back over distinct
    // gram hashes) and the conversion-lag histogram (two filtered
    // per-user min legs + reduced-bucket cumulative window)
    "text_ngram_novelty", "events_conversion_lag",
    // round 13c: the cross-source gram-Jaccard matrix (distinct
    // (source, gram) reduction + gram-keyed self-join) — the heaviest
    // new shape this round
    "pipeline_source_overlap",
    // round 13d: the PMI collocation miner (two tokenization passes +
    // vocab join-backs — a new double-pass text shape) and the cohort
    // LTV grid (per-user cohort assignment + equi-join back + reduced
    // cumulative window — the heaviest new events shape)
    "text_pmi_bigrams", "events_cohort_ltv",
    // round 13e: the 4-offset skipgram variant (4x the pair volume of
    // the adjacent miner — the heaviest text shape in the suite)
    "text_skipgram_pmi",
    // round 14: the operators whose shape is new this round — the
    // media-index build+ingest (blob fingerprint pass, bloom-reduced
    // candidate join, per-plane collapse, manifest append) and the
    // join advisor (per-key count + byte subtotal in one pass, six
    // legs); text_skipgram_pmi/text_readability/events_type_affinity
    // keep their rows but now run the native pair/syllable kernels
    "dedup_incremental_media", "pipeline_join_advisor",
    "text_readability", "events_type_affinity",
    // round 15: the operators whose shape is new this round — the
    // stats catalog (manifest build + 6 appends + merged-reduce
    // advice), the two-sided pair advisor (per-leg keyed fact agg ×
    // 1-row dim attach), and the BPE tuning curve (one fit at
    // grid-max + ONE corpus pass scoring 4 prefix codecs at once).
    // dedup_incremental_media keeps its entry but now builds the gate
    // index once per JVM — its MIN tracks steady-state admission,
    // run-1 build shows as spread (the serve_ann_probe discipline)
    "pipeline_stats_catalog", "pipeline_pair_advisor",
    "pipeline_bpe_curve",
    // round 16: the shapes new this round — the retract-bearing
    // catalog's advice read (survivor merge over three phases), the
    // five-way pair advisor with the cluster branch + key-span
    // extremes, and the SLO-tuned serving probe (build+tune once per
    // JVM; MIN tracks the stamped-default probe). pipeline_stats_
    // catalog and the BPE entries keep their keys but now build/fit
    // once per JVM — their MINs track the advice read / scoring pass
    // (the serve_ann_probe discipline), run-1 construction as spread
    "pipeline_stats_retract", "pipeline_cluster_advice",
    "sim_ann_tuned",
    // round 16b: the two new corpus-pass shapes — SQ8 ANN (encode +
    // decode-once scan + native l2sq ADC + exact rerank: the 4×
    // compression tier under PQ's 32×) and the temperature mixture
    // (derived-weight md5-draw filter — a pure map-only scan whose
    // number tracks scan efficiency)
    "sim_ann_sq8", "pipeline_temperature_mixture",
    // round 17: the two new serving/read shapes — the tier advisor
    // (three-tier build once per JVM, the serve_ann_probe discipline;
    // the MIN tracks one advise pass — exact twin + three probes — plus
    // the stamped dispatch) and the SCD2 event-time lookup (dim-open ∪
    // events union, ONE shuffle on the key, ordered carry-forward pass)
    "sim_ann_tier_advised", "pipeline_scd2_lookup",
    // round 18: the two new serving/read shapes — the BM25 posting
    // index probe (build once per JVM; the MIN tracks the pruned
    // bucket read + shared scoring stage — the lexical twin of
    // serve_ann_probe) and the versioned-table time travel (three
    // manifest-resolved as-of reads, each one agg; merges priced into
    // run 1 as spread, the serve discipline)
    "serve_bm25_probe", "pipeline_table_versions")

  private def loadavg: String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split("\\s+").take(3).mkString(" ")
    catch { case _: Throwable => "n/a" }

  private def load1: Double =
    try loadavg.split(" ").head.toDouble catch { case _: Throwable => -1.0 }

  /** (busy, total) CPU jiffies from /proc/stat line 1 — idle+iowait
    * count as not-busy. Basis of the per-query external-load probe. */
  private def cpuJiffies: (Long, Long) =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .trim.split("\\s+").drop(1).map(_.toLong)
      val notBusy = f(3) + (if (f.length > 4) f(4) else 0L)
      (f.sum - notBusy, f.sum)
    } catch { case _: Throwable => (-1L, -1L) }

  /** Round-20 verdict ask #1: the r18/r19 legs were poisoned by MID-RUN
    * box contention the leg-start loadavg gate cannot see (loadavg also
    * cannot separate our own just-finished query from an external hog).
    * This probe samples /proc/stat for `ms` BETWEEN timed runs — when
    * the bench itself holds no active Spark job, so any busy CPU it
    * sees is external (our JVM contributes only background threads,
    * ~1-3% measured) — and returns the busy fraction of the whole box.
    * Sampled before EVERY rep; the artifact records the max per query
    * plus a dirty bit, so PERF can prefer clean queries instead of
    * forensically reconstructing which half of a leg went bad. */
  private def externalBusy(ms: Int = 150): Double = {
    val (b0, t0) = cpuJiffies
    if (t0 < 0) return -1.0
    Thread.sleep(ms.toLong)
    val (b1, t1) = cpuJiffies
    if (t1 <= t0) 0.0 else (b1 - b0).toDouble / (t1 - t0)
  }

  /** Quiet-box gate (round-19 verdict ask #4): both r18 legs ran on a
    * contended box (loadavg 12+) and every round-over-round comparison
    * needed manual forensics to separate environment inflation from
    * plan regressions. Before each timed leg, wait (up to `maxWaitS`)
    * for the 1-min loadavg to decay under SPARK_GRAFT_BENCH_MAX_LOAD
    * (default 2.0 — on a 32-core box that is near-idle). For the
    * process-start gate this measures EXTERNAL contention directly;
    * for mid-run legs (sf1) it also lets our own just-finished leg's
    * load decay so the next leg starts comparably. If the box never
    * quiets, the leg RUNS anyway but is flagged dirty in the artifact —
    * a number with a health bit beats no number. Returns
    * (cleanAtStart, secondsWaited, loadAtStart). */
  private def quiesce(leg: String, maxWaitS: Int = 240): (Boolean, Double, Double) = {
    val maxLoad =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0").toDouble
    val t0 = System.nanoTime()
    var l = load1
    while (l > maxLoad && (System.nanoTime() - t0) / 1e9 < maxWaitS) {
      System.err.println(f"[bench] $leg: loadavg $l%.2f > $maxLoad%.1f, waiting 15s")
      Thread.sleep(15000)
      l = load1
    }
    val waited = (System.nanoTime() - t0) / 1e9
    val clean = l >= 0 && l <= maxLoad
    if (!clean)
      System.err.println(f"[bench] $leg: still loaded ($l%.2f) after $waited%.0fs - running DIRTY")
    (clean, waited, l)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = GraftSession.build(cpus)

    def runIn(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    def run(name: String): Double = runIn(name, sfDir)

    // per-query external-load discipline (verdict r19 ask #1): probe
    // before every rep, re-quiesce from a bounded wait budget, flag
    // what still ran contaminated. Threshold is a busy FRACTION of the
    // box (0.20 = ~6 of 32 cores external), not loadavg — loadavg
    // cannot tell our own just-finished rep from an external hog.
    val maxExt = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_EXT", "0.20").toDouble
    var extWaitLeft = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXT_WAIT", "300").toDouble
    def timedRuns(name: String, dir: String, n: Int): (Seq[Double], (Double, Boolean)) = {
      // between-QUERY GC nudge (outside every timed region): driver GC
      // lets Spark's ContextCleaner reclaim dead localCheckpoint blocks
      // from earlier queries — pinned storage otherwise accumulates
      // across a 45-query leg and taxes late-leg queries with spills
      // that say nothing about the query itself (observed: scd2_lookup
      // 0.64 s isolated vs 1.69 s at position 44). Measurement hygiene
      // only; the timed path is untouched.
      System.gc()
      var worst = -1.0
      var dirty = false
      val ts = Seq.fill(n) {
        var e = externalBusy()
        worst = math.max(worst, e)
        while (e > maxExt && extWaitLeft > 0) {
          System.err.println(f"[bench] $name: external busy $e%.2f > $maxExt%.2f, waiting 5s (budget ${extWaitLeft}%.0fs)")
          Thread.sleep(5000)
          extWaitLeft -= 5.0
          e = externalBusy()
          worst = math.max(worst, e)
        }
        if (e > maxExt) dirty = true
        runIn(name, dir)
      }
      (ts, (worst, dirty))
    }

    val mainGate = quiesce("main leg")
    val loadBefore = loadavg
    run(headline.head) // warm-up: JIT + codegen compile, FS caches

    // explicit index-build timing (round 10): the IVF build was only
    // visible as serve_ann_probe's run-1 spread, where a build
    // regression can't be told from machine load. One timed build into
    // a fresh dir, same derived k as the serve path, its own field.
    val buildS: Double = {
      try {
        // JIT warm-up on a 1k-vector slice first (measured: a cold
        // first build runs ~1.8× its steady state) so build_s matches
        // the min-of-runs philosophy the query entries follow
        val warmDir = java.nio.file.Files.createTempDirectory("graft_bench_annw")
        graft.operators.AnnIndex.build(spark,
          Tables.embeddings(spark, sfDir).limit(1000), warmDir.toString)
        val dir = java.nio.file.Files.createTempDirectory("graft_bench_ann")
        val t0 = System.nanoTime()
        graft.operators.AnnIndex.build(spark,
          Tables.embeddings(spark, sfDir), dir.toString)
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] index build failed: ${e.getMessage}")
        -1.0
      }
    }

    val sampled: Seq[(String, Seq[Double], (Double, Boolean))] =
      headline.map { name =>
        val (ts, h) = timedRuns(name, sfDir, nRuns)
        (name, ts, h)
      }
    val samples: Seq[(String, Seq[Double])] =
      sampled.map { case (n, ts, _) => n -> ts }
    val mainHealth: Seq[(String, (Double, Boolean))] =
      sampled.map { case (n, _, h) => n -> h }

    // sf1 scale leg (round-17 verdict ask #8): the DRIVER artifact
    // should show the scale curve, not just the builder's committed
    // files. Self-provisioning: a 10×-scaled corpus generates into
    // SPARK_GRAFT_SF1_DIR on first use (MakeScale.ensureScaled — the
    // format marker regenerates a stale pre-salt-fix dir), then every
    // headline query runs SPARK_GRAFT_BENCH_SF1_RUNS times (default 2:
    // run 1 absorbs the per-JVM gate builds at the new dir, the MIN is
    // steady state). Only fires when the primary leg IS sf0.1 (the
    // driver harness); builder legs at /tmp/sf1 / sf10 skip it, and
    // SPARK_GRAFT_SF1=0 opts out.
    var sf1Gate: Option[(Boolean, Double, Double)] = None
    var sf1Health: Seq[(String, (Double, Boolean))] = Seq.empty
    var sf1CorpusGen: String = ""
    val sf1Leg: Option[(String, Int, Seq[(String, Seq[Double])], Double)] =
      if (sys.env.getOrElse("SPARK_GRAFT_SF1", "1") == "0" ||
          !sfDir.stripSuffix("/").endsWith("sf0.1")) None
      else try {
        val dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
          "/tmp/graft_bench_sf1")
        val t0 = System.nanoTime()
        graft.tools.MakeScale.ensureScaled(spark, 10, sfDir, dir)
        val genS = (System.nanoTime() - t0) / 1e9
        // corpus generation stamp (verdict r19 ask #10): the MakeScale
        // format marker identifies which corpus generation this leg
        // ran on, so PERF can refuse cross-generation sf1 comparisons
        sf1CorpusGen =
          try new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(dir, "_graft_scale_format.txt")),
            "UTF-8").trim
          catch { case _: Throwable => "unknown" }
        sf1Gate = Some(quiesce("sf1 leg"))
        val runs1 = math.max(1,
          sys.env.getOrElse("SPARK_GRAFT_BENCH_SF1_RUNS", "2").toInt)
        val sampled1 = headline.map { name =>
          val (ts, h) = timedRuns(name, dir, runs1)
          (name, ts, h)
        }
        sf1Health = sampled1.map { case (n, _, h) => n -> h }
        Some((dir, runs1, sampled1.map { case (n, ts, _) => n -> ts }, genS))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] sf1 leg failed: ${e.getMessage}")
        None
      }
    val loadAfter = loadavg

    def stats(ts: Seq[Double]): (Double, Double, Double) =
      if (ts.exists(_ < 0)) (-1.0, -1.0, -1.0)
      else {
        val s = ts.sorted
        (s.head, s((s.size - 1) / 2), s.last - s.head)
      }
    val perQuery = samples.map { case (n, ts) => n -> stats(ts) }
    def jmap(f: ((String, (Double, Double, Double))) => Double): String =
      perQuery.map { case (k, v) => "\"" + k + "\":" + f((k, v)) }
        .mkString("{", ",", "}")
    def jtotal(f: ((String, (Double, Double, Double))) => Double): Double =
      perQuery.map(q => f(q)).filter(_ >= 0).sum

    // per-query health maps for the FILE artifact: max external-busy
    // fraction seen before any rep, and the names that still ran
    // contaminated after the re-quiesce budget (verdict r19 ask #1)
    def healthJson(h: Seq[(String, (Double, Boolean))]): String =
      s""""queries_ext":${h.map { case (k, v) =>
        "\"" + k + "\":" + (math.rint(v._1 * 1e3) / 1e3)
      }.mkString("{", ",", "}")}""" +
        s""","queries_dirty":${h.filter(_._2._2).map("\"" + _._1 + "\"")
          .mkString("[", ",", "]")}"""

    // sf1-leg stats (same min/median discipline; full detail goes to
    // the file artifact, the compact stdout line carries the totals)
    val sf1Json: String = sf1Leg.map { case (dir, runs1, ss, genS) =>
      val pq = ss.map { case (n, ts) => n -> stats(ts) }
      def jm(f: ((String, (Double, Double, Double))) => Double): String =
        pq.map { case (k, v) => "\"" + k + "\":" + f((k, v)) }
          .mkString("{", ",", "}")
      def jt(f: ((String, (Double, Double, Double))) => Double): Double =
        pq.map(q => f(q)).filter(_ >= 0).sum
      s""","sf1":{"dir":"$dir","runs":$runs1,"gen_s":$genS""" +
        s""","corpus_gen":"$sf1CorpusGen"""" +
        s""","total":${jt(_._2._1)},"total_median":${jt(_._2._2)}""" +
        s""","queries":${jm(_._2._1)}""" +
        s""","queries_median":${jm(_._2._2)}""" +
        s""",${healthJson(sf1Health)}}"""
    }.getOrElse("")
    val sf1Compact: String = sf1Leg.map { case (_, runs1, ss, _) =>
      val pq = ss.map { case (n, ts) => n -> stats(ts) }
      val tot = pq.map(_._2._1).filter(_ >= 0).sum
      val totMed = pq.map(_._2._2).filter(_ >= 0).sum
      s""","sf1_total":${math.rint(tot * 1e3) / 1e3}""" +
        s""","sf1_total_median":${math.rint(totMed * 1e3) / 1e3}""" +
        s""","sf1_runs":$runs1"""
    }.getOrElse("")

    // per-leg gate record: threshold, whether the leg STARTED clean,
    // seconds spent waiting for quiet, and the loadavg it started at —
    // a dirty leg is still recorded (a flagged number beats a hole)
    // but comparisons should prefer clean legs.
    def gateJson(g: (Boolean, Double, Double)): String =
      s"""{"clean":${g._1},"waited_s":${math.rint(g._2)},"load":${g._3}}"""
    val loadGateJson =
      s""","load_gate":{"threshold":${
        sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0")},""" +
        s""""main":${gateJson(mainGate)}""" +
        sf1Gate.map(g => s""","sf1":${gateJson(g)}""").getOrElse("") + "}" +
        s""","ext_gate":{"threshold":$maxExt,"wait_budget_left_s":$extWaitLeft}"""
    val dirtyQueries =
      mainHealth.count(_._2._2) + sf1Health.count(_._2._2)
    val anyDirty = !mainGate._1 || sf1Gate.exists(!_._1) || dirtyQueries > 0

    val json = s"""{"metric":"total","value":${jtotal(_._2._1)},"unit":"sec"""" +
      s""","queries":${jmap(_._2._1)}""" +
      s""","queries_median":${jmap(_._2._2)}""" +
      s""","queries_spread":${jmap(_._2._3)}""" +
      s""","total_median":${jtotal(_._2._2)}""" +
      s""","build_s":$buildS""" +
      s""",${healthJson(mainHealth)}""" +
      sf1Json + loadGateJson +
      s""","runs":$nRuns,"loadavg_before":"$loadBefore"""" +
      s""","loadavg_after":"$loadAfter","sf":"$sfDir"}"""
    // the machine-readable artifact must not depend on scraping sbt
    // stdout (three rounds of drivers saw the JSON line truncated out
    // of the captured tail): ALWAYS write the FULL json to a file —
    // default path unless SPARK_GRAFT_BENCH_OUT overrides
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/tmp/graft_bench.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(s"[bench] full json written to $outPath")
    // stdout gets a COMPACT line — the driver captures only the last
    // ~2000 chars of stdout, and rounds 13/14 saw the full line (2.4 kB
    // with the median/spread maps) truncated mid-key into an unparseable
    // tail. Per-query seconds round to 4 dp (0.1 ms — far below machine
    // noise) and the line prints LAST so nothing pushes it out of the
    // window. Round 17 (verdict ask #7): the DRIVER artifact carries the
    // variance protocol too — per-query medians (3 dp), total_median and
    // both loadavg samples — because r16's uniformly-inflated driver leg
    // was only diagnosable by cross-reading the builder file. A LENGTH
    // GUARD keeps the capture window honest: if the line would exceed
    // ~1.9 kB the per-query median map is dropped first (total_median +
    // loadavg are the minimum diagnosis kit and always fit).
    def r4(x: Double): Double = math.rint(x * 1e4) / 1e4
    def r3(x: Double): Double = math.rint(x * 1e3) / 1e3
    val tail = s""","total_median":${r3(jtotal(_._2._2))}""" + sf1Compact +
      (if (anyDirty) s""","dirty":true,"dirty_q":$dirtyQueries""" else "") +
      s""","loadavg_before":"$loadBefore","loadavg_after":"$loadAfter"""" +
      s""","runs":$nRuns,"sf":"$sfDir"}"""
    val head = s"""{"metric":"total","value":${r4(jtotal(_._2._1))}""" +
      s""","unit":"sec","queries":${jmap(q => r4(q._2._1))}"""
    val withMedians = head +
      s""","queries_median":${jmap(q => r3(q._2._2))}""" + tail
    val compact =
      if (withMedians.length <= 1900) withMedians else head + tail
    spark.stop()
    println(compact)
  }
}
