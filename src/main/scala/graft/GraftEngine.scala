package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sum}

/** SQL front-end with reference-dialect compatibility
  * (cite: reference src/parser, and the .slt suites in
  * tests/resources/sql).
  *
  * The reference engine accepts `SELECT … FROM 'path.parquet' AS t`.
  * Spark SQL covers the entire query surface natively; this shim only
  * rewrites the dialect differences so a reference user can run their
  * existing queries verbatim:
  *
  *   - `'path.parquet'` table refs → Spark's ``parquet.`path` `` scans
  *     (relative paths resolve against `baseDir`);
  *   - `x != NULL` / `x = NULL` → `IS [NOT] NULL` — the reference
  *     evaluates null comparisons as null *tests* (aggregates3.slt
  *     expects `where score1 != NULL` to filter null scores) instead of
  *     ANSI 3-valued logic;
  *   - boolean `XOR` → `!=` (equivalent on booleans; Spark's parser has
  *     no XOR operator — expression.rs:139 supports it natively).
  *
  * Everything downstream is stock Spark SQL: Catalyst optimizes the
  * parsed plan (pushdown, pruning, join selection) exactly as if the
  * query had been written against the DataFrame API.
  */
object GraftEngine {

  /** Run a reference-dialect SQL query. Graft's native functions
    * (minhash_buckets, text_stats, vec_cosine, …) are registered
    * idempotently so they're callable from SQL regardless of how the
    * session was built. */
  def sql(spark: SparkSession, query: String, baseDir: String = ""): DataFrame = {
    GraftExtensions.registerNativeFunctions(spark)
    spark.sql(rewrite(query, baseDir))
  }

  /** Dialect rewrite only — no planning, no optimization (Catalyst owns
    * that); pure text-level shims, exposed for tests. */
  def rewrite(query: String, baseDir: String = ""): String = {
    var s = query
    s = "'([^']+\\.parquet)'".r.replaceAllIn(s, m => {
      val p = m.group(1)
      val full = if (p.startsWith("/") || baseDir.isEmpty) p else s"$baseDir/$p"
      java.util.regex.Matcher.quoteReplacement(s"parquet.`$full`")
    })
    s = "(?i)!=\\s*null\\b".r.replaceAllIn(s, " IS NOT NULL")
    s = "(?i)(?<![!<>=])=\\s*null\\b".r.replaceAllIn(s, " IS NULL")
    s = "(?i)\\bxor\\b".r.replaceAllIn(s, "!=")
    s
  }

  /** Expose a PIPELINE operator (dedup clusters, ANN paths, quality
    * gates, sharding …) to SQL as a temp view `graft_<name>` over
    * `dataDir` — the native kernels are already SQL-registered via
    * GraftExtensions; this registers the operator *pipelines*, so a
    * SQL user reaches e.g. the MinHash cluster collapse the way a
    * DataFrame user does:
    *
    * {{{
    * GraftEngine.pipelineView(spark, "dedup_minhash_clusters", dir)
    * GraftEngine.sql(spark,
    *   "select comp, count(*) n from graft_dedup_minhash_clusters group by 1")
    * }}}
    *
    * The view holds the operator's full logical plan: later SQL
    * composes against it and Catalyst optimizes the combined plan
    * (filters/projections push into the pipeline where semantics
    * allow). Registration is ON DEMAND, one operator at a time —
    * operators whose builders do eager driver-side work (ANN index
    * fits/writes) pay it at registration, not per query, and
    * unregistered operators pay nothing. */
  def pipelineView(spark: SparkSession, name: String, dataDir: String): String =
    pipelineView(spark, name, dataDir, Map.empty[String, String])

  /** Parameterized registration: `params` overrides the operator's
    * gate defaults (k, thresholds, probe budgets, window sizes — the
    * knobs a SQL user otherwise can't reach). Values arrive as strings
    * (the REPL's `pipeline <name> [dir] [k=v ...]` syntax and any
    * config file speak strings); each builder parses them through a
    * typed [[Params]] bag that fails loudly on an unknown key — a
    * typo'd `nprobe=8` must not silently run the gate default. Only
    * operators in [[parameterized]] accept params; passing params to
    * any other name is an error (better than silently ignoring). */
  def pipelineView(spark: SparkSession, name: String, dataDir: String,
                   params: Map[String, String]): String = {
    val df =
      if (params.isEmpty)
        SparkEntry.queries.getOrElse(name,
          throw new IllegalArgumentException(
            s"unknown operator '$name' — valid names are SparkEntry.queries keys"))(
          spark, dataDir)
      else {
        val builder = parameterized.getOrElse(name,
          throw new IllegalArgumentException(
            s"operator '$name' takes no parameters — parameterizable " +
              s"operators: ${parameterized.keys.toSeq.sorted.mkString(", ")}"))
        val p = new Params(name, params)
        val out = builder(spark, dataDir, p)
        p.requireAllRead()
        out
      }
    val view = s"graft_$name"
    df.createOrReplaceTempView(view)
    view
  }

  /** Register several pipeline views at once; returns the view names. */
  def pipelineViews(spark: SparkSession, dataDir: String,
                    names: Seq[String]): Seq[String] =
    names.map(pipelineView(spark, _, dataDir))

  /** String-valued parameter bag with typed, tracked reads: after the
    * builder runs, [[requireAllRead]] rejects any key no getter
    * consumed (the typo guard). */
  final class Params(name: String, m: Map[String, String]) {
    private val read = scala.collection.mutable.Set.empty[String]
    private def get[T](key: String, dflt: T)(parse: String => T): T = {
      read += key
      m.get(key).map { v =>
        try parse(v)
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$name: parameter $key=$v is not a valid number") }
      }.getOrElse(dflt)
    }
    def int(key: String, dflt: Int): Int = get(key, dflt)(_.toInt)
    /** Raw string parameter (e.g. an index directory). */
    def str(key: String, dflt: String): String = get(key, dflt)(identity)
    def long(key: String, dflt: Long): Long = get(key, dflt)(_.toLong)
    def double(key: String, dflt: Double): Double = get(key, dflt)(_.toDouble)
    /** Comma-separated list (e.g. `terms=alpha,beta`). */
    def strings(key: String, dflt: Seq[String]): Seq[String] =
      get(key, dflt)(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    def requireAllRead(): Unit = {
      val unknown = m.keySet.diff(read)
      require(unknown.isEmpty,
        s"$name: unknown parameter(s) ${unknown.toSeq.sorted.mkString(", ")}" +
          s" — this operator reads: ${read.toSeq.sorted.mkString(", ")}")
    }
  }

  /** The parameterizable subset of the operator surface — the entries
    * whose underlying functions expose real knobs. Defaults of 0 mean
    * "derive from the corpus" wherever the DataFrame API does. */
  /** The packing family's token-count source: `tokens=bpe:<modelDir>`
    * attaches tokenizer-TRUE counts (Pretrain.bpeTokenCounts against a
    * persisted merge table) as `n_tokens` before the operator runs, so
    * shard/budget/mixture arithmetic uses real token counts instead of
    * whitespace words — the difference between a correct and a
    * wrong-by-construction budget on any non-space-delimited corpus. */
  private def docsWithTokens(s: SparkSession, d: String,
                             p: Params): DataFrame = {
    val docs = Tables.documents(s, d)
    p.str("tokens", "") match {
      case "" => docs
      case t if t.startsWith("bpe:") =>
        graft.operators.Pretrain.bpeTokenCounts(docs, t.stripPrefix("bpe:"), s)
      case other => throw new IllegalArgumentException(
        s"unknown tokens mode '$other' — expected bpe:<modelDir>")
    }
  }

  private val parameterized:
      Map[String, (SparkSession, String, Params) => DataFrame] = {
    import graft.operators.{Sharding, Similarity, TextAnalysis}
    Map(
      "pipeline_shard" -> ((s, d, p) =>
        Sharding.shardByTokenBudget(docsWithTokens(s, d, p),
          budget = p.long("budget", Sharding.TokenBudget))),
      "text_bpe_encode" -> ((s, d, p) => {
        val dir = p.str("modelDir", "")
        if (dir.isEmpty) graft.operators.Pretrain.textBpeEncode(s, d)
        else graft.operators.Pretrain.bpeEncode(Tables.documents(s, d),
          graft.operators.Pretrain.loadBpeMerges(s, dir), s)
      }),
      "sim_ann_lsh" -> ((s, d, p) =>
        Similarity.simAnnLsh(s, d, L = p.int("L", 0), b = p.int("b", 0))),
      "sim_ann_lsh_multiprobe" -> ((s, d, p) =>
        Similarity.simAnnLshMultiprobe(s, d, L = p.int("L", 12),
          b = p.int("b", 0), nProbe = p.int("nProbe", 4))),
      "sim_ann_ivf" -> ((s, d, p) =>
        Similarity.simAnnIvf(s, d, k = p.int("k", 0),
          nProbe = p.int("nProbe", 0),
          targetCellSize = p.long("targetCellSize", 64L))),
      "sim_ann_ivf_persisted" -> ((s, d, p) =>
        Similarity.simAnnIvfPersisted(s, d, k = p.int("k", 0),
          nProbe = p.int("nProbe", 0),
          targetCellSize = p.long("targetCellSize", 64L))),
      "sim_ann_pq" -> ((s, d, p) =>
        Similarity.simAnnPq(s, d, m = p.int("m", 8),
          codebookK = p.int("codebookK", 64), rerank = p.int("rerank", 0))),
      "sim_ann_ivfpq" -> ((s, d, p) =>
        Similarity.simAnnIvfPq(s, d, k = p.int("k", 0),
          nProbe = p.int("nProbe", 0), m = p.int("m", 8),
          codebookK = p.int("codebookK", 64), rerank = p.int("rerank", 0),
          targetCellSize = p.long("targetCellSize", 64L))),
      "sim_ann_sq8" -> ((s, d, p) =>
        Similarity.simAnnSq8(s, d, rerank = p.int("rerank", 0))),
      "sim_ann_ivfsq8" -> ((s, d, p) =>
        Similarity.simAnnIvfSq8(s, d, k = p.int("k", 0),
          nProbe = p.int("nProbe", 0), rerank = p.int("rerank", 0),
          targetCellSize = p.long("targetCellSize", 64L))),
      "sim_ivf_balance" -> ((s, d, p) =>
        Similarity.ivfBalance(Tables.embeddings(s, d),
          hotFactor = p.double("hotFactor", 2.0))),
      "sim_ann_tier_advised" -> ((s, d, p) =>
        Similarity.simAnnTierAdvised(s, d,
          budgetFrac = p.double("budgetFrac", 1.0),
          slo = p.double("slo", 0.9))),
      "sim_ann_tier_curve" -> ((s, d, p) =>
        Similarity.simAnnTierCurve(s, d,
          probes = p.str("probes", "1,2,4,8,16")
            .split(",").map(_.trim.toInt).toSeq)),
      "pipeline_temperature_mixture" -> ((s, d, p) =>
        Sharding.temperatureMix(docsWithTokens(s, d, p),
          alpha = p.double("alpha", 0.5), seed = p.long("seed", 42L),
          hashMode = p.str("hash", "md5"))
          .groupBy(col("lang"), col("sample_frac"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"))
          .orderBy(col("lang"))),
      "pipeline_asof_read" -> ((s, d, p) =>
        Sharding.pipelineAsofRead(s, d, v = p.long("v", 1L))),
      "sim_knn_graph" -> ((s, d, p) =>
        Similarity.simKnnGraph(s, d, k = p.int("k", 3),
          nProbe = p.int("nProbe", 4))),
      "serve_ann_probe" -> ((s, d, p) =>
        Similarity.serveAnnProbe(s, d, nProbe = p.int("nProbe", 0),
          topK = p.int("topK", 10), indexDir = p.str("indexDir", ""))),
      "sim_ann_tuned" -> ((s, d, p) =>
        Similarity.simAnnTuned(s, d, recallSLO = p.double("slo", 0.9))),
      "dedup_incremental_near" -> ((s, d, p) =>
        graft.operators.TextIndex.dedupIncrementalNear(s, d,
          indexDir = p.str("indexDir", ""))),
      "dedup_incremental_media" -> ((s, d, p) =>
        graft.operators.MediaIndex.dedupIncrementalMedia(s, d,
          indexDir = p.str("indexDir", ""))),
      "dedup_semantic" -> ((s, d, p) =>
        Similarity.dedupSemantic(s, d,
          threshold = p.double("threshold", 0.45))),
      // threshold default matches the GATE registration (0.45, the
      // synthetic-corpus twin bar — Similarity.queries), NOT the 0.9
      // production near-dup bar: overriding L must not silently move
      // the threshold too. Production callers pass threshold=0.9.
      "dedup_embed_cosine" -> ((s, d, p) =>
        Similarity.dedupEmbedCosine(s, d,
          threshold = p.double("threshold", 0.45),
          L = p.int("L", 8), b = p.int("b", 0))),
      "text_top_tokens" -> ((s, d, p) =>
        TextAnalysis.topTokens(Tables.documents(s, d), k = p.int("k", 100))),
      "text_bm25_search" -> ((s, d, p) =>
        TextAnalysis.bm25Search(Tables.documents(s, d),
          terms = p.strings("terms", Seq("vector", "stream", "window")),
          k = p.int("k", 20), k1 = p.double("k1", 1.2),
          bp = p.double("b", 0.75))),
      "serve_bm25_probe" -> ((s, d, p) =>
        graft.operators.Bm25Index.serveBm25Probe(s, d,
          terms = p.strings("terms", Seq("vector", "stream", "window")),
          k = p.int("k", 20), indexDir = p.str("indexDir", ""))),
      "pipeline_chunk" -> ((s, d, p) =>
        Sharding.chunkDocuments(Tables.documents(s, d),
          window = p.int("window", 128), overlap = p.int("overlap", 32))),
      "pipeline_pack_sequences" -> ((s, d, p) =>
        Sharding.packSequences(docsWithTokens(s, d, p),
          budget = p.long("budget", Sharding.TokenBudget))),
      "pipeline_dsir_weight" -> ((s, d, p) =>
        graft.operators.Pretrain.dsirWeight(Tables.documents(s, d),
          buckets = p.int("buckets", 8192),
          alpha = p.double("alpha", 0.5),
          targetLang = p.str("targetLang", "en"),
          hashMode = p.str("hash", "md5"))),
      "pipeline_dsir_sample" -> ((s, d, p) =>
        graft.operators.Pretrain.dsirSample(Tables.documents(s, d),
          k = p.int("k", 500), seed = p.int("seed", 42),
          hashMode = p.str("hash", "md5"))),
      // hash=md5 (gate default, oracle-replayable) | xxhash64 (the
      // production path at 100 TB — one codegen'd 64-bit hash in the
      // hot loop instead of a 128-bit digest + hex decode). Same knob
      // name across every permutation/draw operator.
      "pipeline_shuffle" -> ((s, d, p) =>
        Sharding.globalShuffle(Tables.documents(s, d),
          seed = p.long("seed", 42L), prefixLen = p.int("prefixLen", 2),
          hashMode = p.str("hash", "md5")).orderBy(col("shuffle_pos"))),
      "pipeline_split" -> ((s, d, p) =>
        Sharding.assignSplits(Tables.documents(s, d),
          seed = p.long("seed", 42L), hashMode = p.str("hash", "md5"))),
      "pipeline_mixture" -> ((s, d, p) =>
        Sharding.mixCorpus(docsWithTokens(s, d, p),
          Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.1),
          seed = p.long("seed", 42L), hashMode = p.str("hash", "md5"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"))
          .orderBy(col("lang"))),
      "pipeline_interleave" -> ((s, d, p) =>
        Sharding.sourceInterleave(Tables.documents(s, d),
          seed = p.long("seed", 42L), prefixLen = p.int("prefixLen", 2),
          hashMode = p.str("hash", "md5"))),
      "pipeline_sample_per_group" -> ((s, d, p) =>
        Sharding.samplePerGroup(Tables.documents(s, d),
          k = p.int("k", 20), seed = p.long("seed", 42L),
          hashMode = p.str("hash", "md5"))),
      "pipeline_budget_cap" -> ((s, d, p) =>
        Sharding.budgetCap(docsWithTokens(s, d, p),
          budget = p.long("budget", 1000L))),
      "pipeline_epoch_plan" -> ((s, d, p) =>
        Sharding.epochPlan(Tables.documents(s, d),
          epochs = p.int("epochs", 3), seed = p.long("seed", 42L),
          prefixLen = p.int("prefixLen", 2))),
      "text_zipf_fit" -> ((s, d, p) =>
        graft.operators.TextAnalysis.textZipfFit(s, d,
          k = p.int("k", 1000))),
      "dedup_prefix" -> ((s, d, p) =>
        graft.operators.Dedup.dedupPrefix(Tables.documents(s, d),
          k = p.int("k", 64))),
      "dedup_containment" -> ((s, d, p) =>
        graft.operators.Dedup.containmentPairs(Tables.documents(s, d),
          threshold = p.double("threshold", 0.8))),
      "events_ab_assign" -> ((s, d, p) =>
        graft.operators.Events.eventsAbAssign(s, d,
          experiment = p.str("experiment", "exp1"))),
      "text_hashed_bow" -> ((s, d, p) =>
        graft.operators.TextAnalysis.hashedBow(Tables.documents(s, d),
          dims = p.int("dims", 64))),
      "events_funnel_windowed" -> ((s, d, p) =>
        graft.operators.Events.eventsFunnelWindowed(s, d,
          windowDays = p.int("windowDays", 7))),
      "pipeline_pack_binned" -> ((s, d, p) =>
        Sharding.packBinned(Tables.documents(s, d),
          nBins = p.int("nBins", 8))),
      "pipeline_layout_plan" -> ((s, d, p) =>
        Sharding.layoutPlan(s, d,
          targetBytes = p.long("targetBytes", 1L << 20))),
      "events_value_histogram" -> ((s, d, p) =>
        graft.operators.Events.eventsValueHistogram(s, d,
          width = p.double("width", 50.0))),
      "pipeline_bpe_merges" -> ((s, d, p) =>
        graft.operators.Pretrain.bpeMerges(Tables.documents(s, d), s,
          nMerges = p.int("nMerges", 12))),
      // production tuning curve: grid=256,512,1024,2048,4096 — one
      // fit at the max, every prefix scored in one corpus pass
      "pipeline_bpe_curve" -> ((s, d, p) =>
        graft.operators.Pretrain.bpeCurve(Tables.documents(s, d), s,
          p.str("grid", "4,8,16,32").split(",").map(_.trim.toInt).toSeq)),
      // spine=sequence is the production guard for long calendar
      // spines (every recursion level is a driver-scheduled step)
      "q_recursive_cte" -> ((s, d, p) =>
        ordersDailyDense(s, d, p.str("spine", "recursive"))),
      "dedup_image_phash" -> ((s, d, p) =>
        graft.operators.Multimodal.dedupImagePhash(s, d,
          maxHamming = p.int("maxHamming", 6))),
      "dedup_audio_fp" -> ((s, d, p) =>
        graft.operators.Multimodal.dedupAudioFp(s, d,
          maxHamming = p.int("maxHamming", 6))),
      "dedup_frame_containment" -> ((s, d, p) =>
        graft.operators.Multimodal.dedupFrameContainment(s, d,
          threshold = p.double("threshold", 0.8))),
      "quality_classifier" -> ((s, d, p) =>
        graft.operators.QualityModel.qualityClassifierReport(s, d)),
      "events_forecast_baseline" -> ((s, d, p) =>
        graft.operators.Events.eventsForecastBaseline(s, d,
          splitDay = p.str("splitDay", "2024-01-22"))),
      "text_vocab_coverage" -> ((s, d, p) =>
        graft.operators.TextAnalysis.textVocabCoverage(s, d)),
      "pipeline_length_gini" -> ((s, d, p) =>
        graft.operators.Sharding.lengthGini(Tables.documents(s, d),
          bucketWidth = p.long("bucketWidth",
            graft.operators.Sharding.BucketWidth))),
      "pipeline_scd2" -> ((s, d, p) =>
        graft.operators.Sharding.pipelineScd2(s, d)),
      "events_active_streaks" -> ((s, d, p) =>
        graft.operators.Events.eventsActiveStreaks(s, d)),
      "events_conversion_lag" -> ((s, d, p) =>
        graft.operators.Events.conversionLag(Tables.events(s, d),
          fromType = p.str("from", "view"),
          toType = p.str("to", "purchase"))),
      "events_tenure_survival" -> ((s, d, p) =>
        graft.operators.Events.tenureSurvival(Tables.events(s, d))),
      "events_lifecycle_states" -> ((s, d, p) =>
        graft.operators.Events.lifecycleStates(Tables.events(s, d))),
      "events_user_concentration" -> ((s, d, p) =>
        graft.operators.Events.userConcentration(Tables.events(s, d))),
      "events_daily_dense" -> ((s, d, p) =>
        graft.operators.Events.dailyDense(Tables.events(s, d))),
      "events_cohort_ltv" -> ((s, d, p) =>
        graft.operators.Events.cohortLtv(Tables.events(s, d))),
      "text_ttr" -> ((s, d, p) =>
        graft.operators.TextAnalysis.typeTokenRatio(
          Tables.documents(s, d))),
      "sim_dim_stats" -> ((s, d, p) =>
        graft.operators.Similarity.dimStats(Tables.embeddings(s, d))),
      "text_pmi_bigrams" -> ((s, d, p) =>
        graft.operators.TextAnalysis.pmiBigrams(Tables.documents(s, d),
          minCount = p.int("minCount", 10))),
      "text_skipgram_pmi" -> ((s, d, p) =>
        graft.operators.TextAnalysis.skipgramPmi(Tables.documents(s, d),
          window = p.int("window", 4),
          minCount = p.int("minCount", 10))),
      // rel=/key= re-target the skew profile at any one table column;
      // without params the standing six-leg report runs
      "pipeline_skew_stats" -> ((s, d, p) => {
        val rel = p.str("rel", "")
        if (rel.isEmpty) graft.operators.Sharding.pipelineSkewStats(s, d)
        else {
          val key = p.str("key", "")
          require(key.nonEmpty, "pipeline_skew_stats needs key=<col>")
          graft.operators.Sharding.keySkew(Tables.byName(s, d, rel),
            rel, key)
        }
      }),
      // rel=/key= re-target the advisor at any one (table, column);
      // broadcastBytes= sets the production build-side bound (default
      // 10 MiB = Spark's autoBroadcastJoinThreshold), skewMult=/
      // maxSalt= tune the salt trigger and cap
      "pipeline_join_advisor" -> ((s, d, p) => {
        val rel = p.str("rel", "")
        val bb = p.long("broadcastBytes", 10L << 20)
        val sm = p.long("skewMult", 4L)
        val ms = p.long("maxSalt", 64L)
        if (rel.isEmpty) graft.operators.Sharding.pipelineJoinAdvisor(s, d)
        else {
          val key = p.str("key", "")
          require(key.nonEmpty, "pipeline_join_advisor needs key=<col>")
          graft.operators.Sharding.joinAdvice(Tables.byName(s, d, rel),
            rel, key, broadcastBytes = bb, skewMult = sm, maxSalt = ms)
        }
      }),
      // rel= re-targets the per-column profile at any one table;
      // without params the standing documents/events/orders report runs
      "pipeline_column_profile" -> ((s, d, p) => {
        val rel = p.str("rel", "")
        if (rel.isEmpty)
          graft.operators.Sharding.pipelineColumnProfile(s, d)
        else graft.operators.Sharding.columnProfile(
          Tables.byName(s, d, rel), rel)
      }),
      "text_readability" -> ((s, d, p) =>
        graft.operators.TextAnalysis.readability(Tables.documents(s, d))),
      "quality_near_dedup_rate" -> ((s, d, p) =>
        graft.operators.QualityRules.nearDedupRate(Tables.documents(s, d))),
      "events_wow_growth" -> ((s, d, p) =>
        graft.operators.Events.eventsWowGrowth(s, d)),
      "text_source_topterms" -> ((s, d, p) =>
        graft.operators.TextAnalysis.sourceTopTerms(Tables.documents(s, d),
          k = p.int("k", 5), minLen = p.int("minLen", 4))),
      "dedup_blob_exact" -> ((s, d, p) =>
        graft.operators.Multimodal.dedupBlobExact(s, d)),
      "events_ab_significance" -> ((s, d, p) =>
        graft.operators.Events.eventsAbSignificance(s, d,
          experiment = p.str("experiment", "exp1"))),
      "text_charclass_profile" -> ((s, d, p) =>
        graft.operators.TextAnalysis.charclassProfile(
          Tables.documents(s, d))),
      "text_source_divergence" -> ((s, d, p) =>
        graft.operators.TextAnalysis.sourceDivergence(
          Tables.documents(s, d))),
      "sim_ann_recall_curve" -> ((s, d, p) =>
        graft.operators.Similarity.annRecallCurve(s, d,
          probes = p.str("probes", "1,2,4,8,16")
            .split(",").map(_.trim.toInt).toSeq)),
      "pipeline_length_percentiles" -> ((s, d, p) =>
        graft.operators.Sharding.pipelineLengthPercentiles(s, d)),
      "dedup_cluster_size_hist" -> ((s, d, p) =>
        graft.operators.Dedup.dedupClusterSizeHist(s, d)),
      "dedup_minhash_calibration" -> ((s, d, p) =>
        graft.operators.Dedup.minhashCalibration(Tables.documents(s, d),
          nGram = p.int("n", 3))),
      "q_salted_join" -> ((s, d, p) =>
        graft.operators.ScaleJoins.qSaltedJoin(s, d)),
      "q_bloom_semi_join" -> ((s, d, p) =>
        graft.operators.ScaleJoins.qBloomSemiJoin(s, d)),
      "sim_outlier_scores" -> ((s, d, p) =>
        graft.operators.Similarity.outlierScores(Tables.embeddings(s, d))),
      "text_ngram_novelty" -> ((s, d, p) =>
        graft.operators.TextAnalysis.ngramNovelty(
          Tables.documents(s, d), n = p.int("n", 8))),
      "pipeline_source_overlap" -> ((s, d, p) =>
        graft.operators.QualityRules.sourceOverlap(
          Tables.documents(s, d), n = p.int("n", 8))),
      // scoring view over a PERSISTED model (the `model fit quality`
      // DDL's output) — the batch twin of qualityGateStream
      "quality_score" -> ((s, d, p) => {
        val dir = p.str("modelDir", "")
        require(dir.nonEmpty, "quality_score needs modelDir=<dir>")
        val (w, b) = graft.operators.QualityModel.loadModel(s, dir)
        graft.operators.QualityModel.scoreQuality(
          Tables.documents(s, d), w, b)
      })
    )
  }

  /** Calendar-day spine with zero-filled order counts — the
    * densification of events_daily_dense over orders, with a
    * selectable SPINE:
    *
    *   - `recursive` (the gate form): Spark 4 `WITH RECURSIVE` — the
    *     SQL surface under test. **PRODUCTION GUARD**: every
    *     recursion level is a DRIVER-SCHEDULED step (one UnionLoop
    *     iteration per row of the spine), so depth must stay a small
    *     CONSTANT — calendar days (~2.4k here), never corpus rows.
    *     Beyond ~10⁴ levels the driver round-trips dominate wall
    *     clock long before `MAX RECURSION LEVEL` trips; steer any
    *     longer spine to `sequence`.
    *   - `sequence`: the closed-form spine —
    *     `explode(sequence(min, max, interval 1 day))` — ONE job, no
    *     per-level scheduling; row-identical (ExtensionsSpec pins it)
    *     and the right plan at any depth. Reach it from SQL via
    *     `pipeline q_recursive_cte spine=sequence`.
    *
    * Both forms reduce the corpus to the per-day count table BEFORE
    * the spine join (a raw corpus⋈spine join would shuffle 100 TB
    * onto ~2.4k day keys — guaranteed skew), so the join is
    * #days × #days. The DuckDB oracle replays the spine with
    * generate_series (same rows, no recursion there). ExtensionsSpec
    * asserts the gate query's LEVEL COUNT equals the calendar-day
    * span and stays orders-count-independent — a regression to
    * corpus-dependent depth fails loud. */
  def ordersDailyDense(s: SparkSession, d: String,
                       spine: String = "recursive"): DataFrame = {
    require(Seq("recursive", "sequence").contains(spine),
      s"spine must be 'recursive' or 'sequence', got '$spine'")
    val spineSql =
      if (spine == "recursive")
        s"""WITH RECURSIVE days(day) MAX RECURSION LEVEL 5000 AS (
           |  SELECT min(date_trunc('day', o_orderdate))
           |  FROM '$d/orders.parquet'
           |  UNION ALL
           |  SELECT day + INTERVAL 1 DAY FROM days
           |  WHERE day < (SELECT max(date_trunc('day', o_orderdate))
           |               FROM '$d/orders.parquet')
           |)""".stripMargin
      else
        s"""WITH days AS (
           |  SELECT explode(sequence(lo, hi, INTERVAL 1 DAY)) AS day
           |  FROM (SELECT min(date_trunc('day', o_orderdate)) AS lo,
           |               max(date_trunc('day', o_orderdate)) AS hi
           |        FROM '$d/orders.parquet')
           |)""".stripMargin
    sql(s,
      s"""$spineSql,
         |per_day AS (
         |  SELECT date_trunc('day', o_orderdate) AS day,
         |         count(*) AS n
         |  FROM '$d/orders.parquet' GROUP BY 1
         |)
         |SELECT days.day AS day, coalesce(n, 0L) AS n_orders
         |FROM days LEFT JOIN per_day ON per_day.day = days.day
         |ORDER BY day""".stripMargin)
  }

  /** Driver-gate sample: the flagship aggregation written in the
    * reference dialect, run through the front-end. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_frontend" -> ((s: SparkSession, d: String) =>
      sql(s,
        s"""select l_returnflag, sum(l_quantity) as sum_qty,
           |  count(*) as n, max(l_extendedprice) as max_price
           |from '$d/lineitem.parquet'
           |where l_quantity < 30 and not l_returnflag = 'X'
           |group by l_returnflag""".stripMargin)
        .orderBy("l_returnflag")),
    "q_recursive_cte" -> ((s: SparkSession, d: String) =>
      ordersDailyDense(s, d)),
    // LATERAL correlated subquery (Spark 4): top-3 orders per market
    // segment. Catalyst decorrelates the per-row LIMIT into a ranked
    // join — the oracle replays it as the uncorrelated window form
    // (SKILL rule: correlated oracles are DuckDB-build-sensitive;
    // LATERAL is the Spark-side surface under test, not the oracle's).
    // Ties on o_totalprice break on o_orderkey so both engines agree.
    "q_lateral_join" -> ((s: SparkSession, d: String) =>
      sql(s,
        s"""SELECT c.c_mktsegment, t.o_orderkey, t.o_totalprice
           |FROM (SELECT DISTINCT c_mktsegment
           |      FROM '$d/customer.parquet') c,
           |LATERAL (
           |  SELECT o_orderkey, o_totalprice
           |  FROM '$d/orders.parquet' o JOIN '$d/customer.parquet' cu
           |    ON cu.c_custkey = o.o_custkey
           |  WHERE cu.c_mktsegment = c.c_mktsegment
           |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
           |) t
           |ORDER BY c.c_mktsegment, t.o_totalprice DESC, t.o_orderkey"""
          .stripMargin))
  )

  val oracles: Map[String, String] = Map(
    "q_sql_frontend" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  count(*) AS n, max(l_extendedprice) AS max_price
        |FROM lineitem
        |WHERE l_quantity < 30 AND NOT l_returnflag = 'X'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_recursive_cte" ->
      """WITH mm AS (
        |  SELECT date_trunc('day', min(o_orderdate)) AS lo,
        |         date_trunc('day', max(o_orderdate)) AS hi
        |  FROM orders
        |), days AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        |  FROM mm
        |), per_day AS (
        |  SELECT date_trunc('day', o_orderdate) AS day,
        |         count(*) AS n
        |  FROM orders GROUP BY 1
        |)
        |SELECT days.day AS day,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n_orders
        |FROM days LEFT JOIN per_day ON per_day.day = days.day
        |ORDER BY day""".stripMargin,
    "q_lateral_join" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
        |  SELECT cu.c_mktsegment, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY cu.c_mktsegment
        |      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
        |  FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey
        |) WHERE rk <= 3
        |ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey""".stripMargin
  )
}
