package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables._

/** Training-shard assembly operators (SURVEY.md §2.C): the step after
  * curation where a corpus becomes fixed-size training shards and
  * per-source mixtures.
  *
  * Scale shape:
  *   - token-budget packing is a two-pass distributed prefix sum: docs
  *     are range-bucketed by (lang, doc_id DIV B); pass 1 aggregates one
  *     token subtotal per bucket (partial+final HashAggregate — tiny);
  *     the sequential dependency (cumulative base per bucket) runs as a
  *     window over the SUBTOTALS frame only (#buckets rows, ~6 orders of
  *     magnitude smaller than the corpus); pass 2 broadcast-joins the
  *     bases back and computes the intra-bucket running sum with a
  *     window partitioned by (lang, bucket) — so a 100 TB English
  *     stratum spreads across #buckets tasks instead of funnelling
  *     through one.
  *   - stratified sampling is map-only: sampleBy filters rows with a
  *     per-stratum Bernoulli draw; nothing shuffles.
  */
object Sharding {

  val TokenBudget = 4096L

  /** Greedy sequential token-budget packing: docs fill shards in
    * (lang, doc_id) order; a shard's id is its starting token offset
    * divided by the budget, so shards are contiguous doc runs holding
    * ~budget tokens (± one straddling doc) and the assignment is a pure
    * function of the prefix sum — deterministic under any execution. */
  /** Docs per range bucket. floor(doc_id / width) is monotone in doc_id,
    * so per-bucket prefix sums compose into the exact sequential prefix
    * sum; the default keeps buckets well under executor memory while the
    * subtotal frame stays driver-trivial (100 TB ≈ 25 B docs → ~400k
    * bucket rows through the tiny base window). */
  val BucketWidth = 65536L

  def shardByTokenBudget(docs: DataFrame, budget: Long = TokenBudget,
                         bucketWidth: Long = BucketWidth): DataFrame =
    tokenPrefix(docs, bucketWidth)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budget.toDouble).as("shard"))
      .orderBy(col("lang"), col("doc_id"))

  /** Training sequence packing — the step between sharding and the
    * tokenizer: each doc lands in the fixed-capacity context window
    * (`budget` tokens) where its token run STARTS, with its offset
    * inside that window. Greedy contiguous packing in (lang, doc_id)
    * order, same two-pass distributed prefix sum as sharding (one
    * bucketed subtotal pass, map-only assignment); a doc straddling a
    * boundary belongs to the window it starts in (splitting is the
    * tokenizer's job). offset ∈ [0, budget) by construction. */
  def packSequences(docs: DataFrame, budget: Long = TokenBudget,
                    bucketWidth: Long = BucketWidth): DataFrame = {
    val start = col("cum") - col("n_tokens")
    tokenPrefix(docs, bucketWidth)
      .withColumn("seq_id", floor(start / budget.toDouble))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("seq_id"),
        (start - col("seq_id") * budget).as("tok_offset"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** The prefix-sum family's base-table join-back. `bases` has
    * ~n_docs/bucketWidth rows (~400k at 100 TB ≈ 25 B docs under the
    * default 65536 width) — comfortably broadcast-able, and the
    * explicit hint saves the probe-side exchange AQE's runtime
    * conversion still pays. But a HARD hint bypasses AQE's size check:
    * at ~10¹⁰⁺ docs (or a deliberately narrow bucketWidth) the driver
    * would materialize a multi-GB broadcast or die. So the hint is a
    * session knob, not a constant: `spark.graft.broadcastBases=off`
    * drops it and lets AQE choose the join strategy from the observed
    * base-table size — same results, no cliff (ScaleStress carries a
    * hint-off leg showing the family flat at 10×; ShardingSpec pins
    * output equality). Read at PLAN time, like every Spark conf. */
  private def maybeBroadcastBases(bases: DataFrame): DataFrame =
    if (bases.sparkSession.conf
        .get("spark.graft.broadcastBases", "on") == "off") bases
    else broadcast(bases)

  /** Per-doc token count for the packing/budget/mixture family: a
    * PRE-ATTACHED `n_tokens` column wins — that's how tokenizer-TRUE
    * counts arrive (Pretrain.bpeTokenCounts, reached from SQL as the
    * `tokens=bpe:<modelDir>` pipelineView knob), without which every
    * budget on a non-space-delimited corpus (CJK, code) is
    * wrong-by-construction. Otherwise: whitespace words from the
    * native single-pass kernel — byte-equivalent to
    * size(split(lower(text), "\s+")) (PropertySpec) without
    * materializing the word array per row. */
  private def tokenCountCol(docs: DataFrame): org.apache.spark.sql.Column =
    if (docs.columns.contains("n_tokens")) col("n_tokens").cast("long")
    else graft.functions.TextStats.textStats(col("text"))
      .getField("n_words").cast("long")

  /** Shared prefix-sum core: (doc_id, lang, n_tokens, cum) where cum is
    * the inclusive running token total within the lang stratum. */
  private def tokenPrefix(docs: DataFrame, bucketWidth: Long): DataFrame = {
    val withTok = docs
      .select(col("doc_id"), col("lang"),
        tokenCountCol(docs).as("n_tokens"),
        // null-safe stratum key: an equi-join on a nullable lang would
        // silently drop null-lang docs (null = null never matches),
        // where the original single-window form kept them in one stratum
        coalesce(col("lang"), lit("\u0000<null>")).as("_lk"),
        // integer DIV, not double floor: exact for the full int64 id range
        expr(s"doc_id DIV $bucketWidth").as("bkt"))
    // pass 1: one subtotal per (stratum, bucket) — partial+final agg
    val subtotals = withTok.groupBy(col("_lk"), col("bkt"))
      .agg(sum(col("n_tokens")).as("bkt_tokens"))
    // the only sequential scan runs over #buckets rows, not the corpus
    val wBase = Window.partitionBy(col("_lk")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = subtotals.select(col("_lk"), col("bkt"),
      coalesce(sum(col("bkt_tokens")).over(wBase), lit(0L)).as("base"))
    // pass 2: intra-bucket running sum (parallel across buckets) + base
    val wIn = Window.partitionBy(col("_lk"), col("bkt")).orderBy(col("doc_id"))
    withTok
      .join(maybeBroadcastBases(bases), Seq("_lk", "bkt"))
      .withColumn("cum", col("base") + sum(col("n_tokens")).over(wIn))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum"))
  }

  /** Seeded permutation/draw key as a FIXED-WIDTH lowercase hex string.
    * "md5" (the gate default): oracle-replayable — DuckDB computes the
    * identical digest, so the correctness gate replays every draw
    * decision-for-decision. "xxhash64": the production path — one
    * codegen'd 64-bit hash instead of a 128-bit digest + hex decode in
    * the hot loop. Both are uniform on the key space and share the
    * same algebra (fixed-width lowercase hex orders exactly like its
    * numeric value, so prefix bucketing and `prefix < threshold`
    * draws work unchanged). The 100 TB deployment story is one knob —
    * `hash=xxhash64` through pipelineView — not a code edit;
    * HashParitySpec pins the distribution properties of both paths. */
  def seededHex(c: org.apache.spark.sql.Column, seed: Long,
                hashMode: String): org.apache.spark.sql.Column =
    hashMode match {
      case "md5" => md5(concat(c.cast("string"), lit(":" + seed)))
      case "xxhash64" =>
        lower(lpad(hex(xxhash64(c.cast("string"), lit(seed))), 16, "0"))
      case other => throw new IllegalArgumentException(
        s"unknown hash mode '$other' — expected md5 or xxhash64")
    }

  /** Deterministic global training shuffle: every epoch pipeline needs a
    * reproducible pseudo-random permutation of the corpus. Each doc's
    * shuffle key is md5(doc_id ":" seed); its position is the doc's rank
    * in global key order.
    *
    * Scale shape: the rank is NOT a global window (that funnels the
    * corpus through one task). Docs bucket by the key's hex prefix —
    * a prefix of the sort key, so (bucket, key) order IS key order —
    * then the same two-pass prefix sum as sharding: per-bucket counts
    * (tiny agg), cumulative bases over #buckets rows, and a per-bucket
    * rank window that parallelizes across 16^prefixLen buckets. With
    * prefixLen=4 (65536 buckets) a 100 TB corpus spreads ~1.5 GB per
    * bucket task. md5 rather than xxhash64 so the oracle can replay the
    * permutation exactly (DuckDB computes the identical digest). */
  def globalShuffle(docs: DataFrame, seed: Long = 42L,
                    prefixLen: Int = 2, hashMode: String = "md5"): DataFrame = {
    val withKey = docs
      .select(col("doc_id"),
        seededHex(col("doc_id"), seed, hashMode).as("h"))
      .withColumn("bkt", substring(col("h"), 1, prefixLen))
    val counts = withKey.groupBy(col("bkt")).agg(count(lit(1)).as("n"))
    val wBase = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the only sequential window runs over #buckets rows
    val bases = counts.select(col("bkt"),
      coalesce(sum(col("n")).over(wBase), lit(0L)).as("base"))
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("h"), col("doc_id"))
    withKey
      .join(maybeBroadcastBases(bases), Seq("bkt"))
      .select(col("doc_id"),
        (col("base") + row_number().over(wIn)).as("shuffle_pos"))
  }

  // the orderBy is presentational (stable gate dump) — the operator
  // itself never sorts globally
  def pipelineShuffle(s: SparkSession, d: String): DataFrame =
    globalShuffle(documents(s, d)).orderBy(col("shuffle_pos"))

  /** Length-bucketed batching: group docs into power-of-two token-length
    * buckets (the standard trick for padding-efficient batch assembly —
    * sequences in a batch pad to the bucket cap, not the global max).
    * Reports per-bucket doc/token totals and the padding waste a
    * pad-to-cap batcher would pay. One partial+final agg, map-only
    * bucket assignment; #buckets rows out. */
  def lengthBuckets(docs: DataFrame): DataFrame = {
    val n = graft.functions.TextStats.textStats(col("text"))
      .getField("n_words").cast("long")
    docs
      .select(col("doc_id"), col("lang"), n.as("n_tokens"))
      // cap = smallest power of two >= n_tokens (n=0 maps with n=1).
      // Integer bit arithmetic, not pow(2, ceil(log2(n))): libm log2 and
      // Java's log(x)/log(2) disagree by a ULP at exact powers of two,
      // which would flip a doc across a bucket boundary engine-to-engine.
      .withColumn("_m", greatest(col("n_tokens"), lit(1L)))
      .withColumn("bucket_cap",
        when(expr("_m & (_m - 1)") === 0L, col("_m"))
          .otherwise(expr("shiftleft(1L, length(bin(_m)))")))
      .groupBy(col("bucket_cap"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("bucket_cap") - col("n_tokens")).as("pad_waste"))
      .withColumn("waste_share",
        round(col("pad_waste").cast("double") /
          (col("pad_waste") + col("n_tokens")), 6))
      .orderBy(col("bucket_cap"))
  }

  def pipelineLengthBuckets(s: SparkSession, d: String): DataFrame =
    lengthBuckets(documents(s, d))

  /** Deterministic k-per-stratum sample: the fixed-size per-language
    * eval/holdout draw. Rank docs inside each stratum by the seeded md5
    * key and keep the first k — a pure function of the data (retry- and
    * partitioning-invariant, unlike rand()), and exactly k rows per
    * stratum unlike Bernoulli sampling. The rank<=k filter compiles to
    * WindowGroupLimit, so each task keeps a k-row heap per stratum and
    * partial-limits BEFORE the shuffle — nothing like a full sort of
    * the corpus ever runs. */
  def samplePerGroup(docs: DataFrame, k: Int = 20,
                     seed: Long = 42L, hashMode: String = "md5"): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        seededHex(col("doc_id"), seed, hashMode).as("h"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("lang"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  def pipelineSamplePerGroup(s: SparkSession, d: String): DataFrame =
    samplePerGroup(documents(s, d))

  /** Deterministic train/val/test split — the eval-split assignment
    * every training corpus carries. Same md5 hex-threshold draw as the
    * mixture sampler (map-only, a pure function of doc_id: stable
    * across runs, reshards, and task retries — rand() is none of
    * these), with CUMULATIVE thresholds so the three ranges partition
    * the hash space exactly. */
  def assignSplits(docs: DataFrame,
                   fractions: Seq[(String, Double)] =
                     Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
                   seed: Long = 42L, hashMode: String = "md5"): DataFrame = {
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val draw = substring(seededHex(col("doc_id"), seed, hashMode), 1, 6)
    val cum = fractions.scanLeft(0.0) { case (a, (_, f)) => a + f }.tail
    val splitCol = fractions.init.zip(cum.init).foldRight(
      lit(fractions.last._1): org.apache.spark.sql.Column) {
      case (((name, _), c), acc) =>
        when(draw < lit("%06x".format((c * 0x1000000).toLong)), name)
          .otherwise(acc)
    }
    docs.select(col("doc_id"), col("lang"), splitCol.as("split"))
      .orderBy(col("doc_id"))
  }

  def pipelineSplit(s: SparkSession, d: String): DataFrame =
    assignSplits(documents(s, d))

  def pipelineShard(s: SparkSession, d: String): DataFrame =
    shardByTokenBudget(documents(s, d))

  def pipelinePack(s: SparkSession, d: String): DataFrame =
    packSequences(documents(s, d))

  /** Corpus composition report over (source, lang): doc counts, token
    * totals, and each cell's share of all tokens — what a curation run
    * publishes before/after each filter stage. One partial+final agg;
    * the share window runs over #groups rows, not the corpus. */
  def pipelineSourceStats(s: SparkSession, d: String): DataFrame = {
    val grouped = documents(s, d)
      .select(col("source"), col("lang"),
        graft.functions.TextStats.textStats(col("text"))
          .getField("n_words").cast("long").as("n_tokens"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    grouped
      .withColumn("token_share",
        round(col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(Window.partitionBy()), 6))
      .orderBy(col("source"), col("lang"))
  }

  /** Per-source dataset fingerprint — the versioning/drift primitive a
    * pipeline publishes with every run: identical inputs yield an
    * identical report REGARDLESS of row order or partitioning (every
    * column is an order-invariant aggregate), so two runs diff with a
    * string compare; any row edit moves n_distinct_texts, total_chars,
    * or a digest extreme. One partial+final agg over 16-byte md5
    * digests (the text column never shuffles); the distinct count is
    * Spark's two-phase expand over (source, digest) — group space
    * bounded by the corpus, same discipline as exact dedup.
    *
    * The digest extremes aggregate as LONGS (the md5's leading 60 bits
    * via conv/cast — fixed-width lowercase hex orders exactly like its
    * numeric value, so min/max over the prefix value IS min/max over
    * the digest prefix): string min/max buffers are not UnsafeRow-
    * mutable and forced the whole aggregation into SortAggregate;
    * long buffers keep it a codegen'd partial+final HashAggregate
    * (PlanRegressionSpec pins this). 60 bits of extreme still move on
    * any row edit with collision odds ~2⁻⁶⁰. */
  def pipelineFingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("source"), md5(col("text")).as("h"),
        length(col("text")).cast(LongType).as("nc"))
      .withColumn("hv", conv(substring(col("h"), 1, 15), 16, 10).cast(LongType))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_distinct_texts"),
        sum(col("nc").cast(DecimalType(18, 0))).cast(LongType).as("total_chars"),
        min(col("hv")).as("min_digest"),
        max(col("hv")).as("max_digest"))
      .orderBy(col("source"))

  /** Sliding-window document chunking — long documents become
    * fixed-size token windows with overlap (the step that turns a
    * curated corpus into context-window-sized training examples, and
    * the retrieval-index unit for RAG pipelines). Window `size` tokens,
    * stride = size − overlap; the last window is the first one whose
    * span reaches the end of the doc, so every token lands in ≥1 chunk
    * and short docs yield exactly one. Map-only: split → per-row chunk
    * count (pure arithmetic) → explode(sequence) → slice/join — the
    * text shuffles zero times and the only exchange is the
    * presentation orderBy. DuckDB replays the identical tokenization
    * (regexp \s+ split), chunk-count arithmetic, and slicing, so the
    * chunk TEXT itself hash-checks. */
  def chunkDocuments(docs: DataFrame, window: Int = 128,
                     overlap: Int = 32): DataFrame = {
    require(window > overlap && overlap >= 0, s"need window > overlap ≥ 0")
    val stride = window - overlap
    docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .withColumn("n_chunks",
        (floor((greatest(size(col("toks")) - window, lit(0))
          + lit(stride - 1)) / stride.toDouble) + 1).cast("int"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        size(slice(col("toks"), col("chunk_id") * stride + 1, lit(window)))
          .as("n_tokens"),
        array_join(slice(col("toks"), col("chunk_id") * stride + 1,
          lit(window)), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  def pipelineChunk(s: SparkSession, d: String): DataFrame =
    chunkDocuments(documents(s, d))

  /** Stratified sample: per-language keep fractions via one Bernoulli
    * draw per row (map-only, no shuffle). The correctness contract is
    * statistical (proportions), checked in ShardingSpec. */
  /** Deterministic stratified Bernoulli sample: keep a doc of stratum
    * `lang` iff the 24-bit prefix of md5(doc_id ':strat:' seed) falls
    * under floor(frac·2²⁴) — the same hash-threshold draw as
    * [[assignSplits]]/[[mixCorpus]] (salted differently, so samples
    * don't correlate with splits). A pure function of the data:
    * identical across partitionings, task retries, and cluster sizes,
    * AND exactly replayable by the DuckDB oracle — none of which holds
    * for `sampleBy`'s per-partition RNG streams. Strata absent from
    * `fractions` drop (sampleBy's contract); map-only, no shuffle. */
  def sampleStratified(docs: DataFrame,
                       fractions: Map[String, Double],
                       seed: Long = 42L): DataFrame = {
    val h = substring(md5(concat(col("doc_id").cast("string"),
      lit(s":strat:$seed"))), 1, 6)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (lang, frac)) =>
      val pass =
        if (frac >= 1.0) lit(true)
        else h < lit(f"${math.floor(frac * (1 << 24)).toLong}%06x")
      acc || (col("lang") === lang && pass)
    }
    docs.where(keep)
  }

  def pipelineSample(s: SparkSession, d: String): DataFrame =
    sampleStratified(documents(s, d),
      Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25, "es" -> 0.25, "zh" -> 0.1))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("lang"))

  /** Corpus mixture sampling: downsample each source (here: language)
    * so the output's TOKEN shares hit the target weights — the standard
    * training-mixture step (Pile/Dolma style), where shares are set in
    * tokens, not documents.
    *
    * The achievable budget without upsampling is
    * min_s(tokens_s / w_s); each source then keeps fraction
    * w_s · B / tokens_s ≤ 1 of its tokens via one seeded Bernoulli draw
    * per doc. Cost: one small agg (per-source token totals — collected
    * to the driver, #sources rows) + a map-only filter. No shuffle of
    * the corpus itself.
    *
    * The draw hashes (doc_id, seed) rather than using rand(): the
    * sample is then a pure function of the data — identical across
    * partitionings, task retries, and cluster sizes, which rand() is
    * not. */
  def mixCorpus(docs: DataFrame, weights: Map[String, Double],
                seed: Long = 42L, hashMode: String = "md5"): DataFrame = {
    val withTokens = docs.withColumn("n_tokens", tokenCountCol(docs))
    val totals = withTokens.where(col("lang").isin(weights.keys.toSeq.map(lit): _*))
      .groupBy(col("lang")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wSum = weights.values.sum
    val norm = weights.map { case (k, v) => k -> v / wSum }
    val present = norm.filter { case (k, _) => totals.getOrElse(k, 0L) > 0L }
    require(present.nonEmpty, "no weighted source present in the corpus")
    val budget = present.map { case (k, w) => totals(k) / w }.min
    val fracs = present.map { case (k, w) => k -> math.min(w * budget / totals(k), 1.0) }
    // Draw: the doc's md5(doc_id ":" seed) 6-hex-digit prefix compared
    // against the fraction's hex threshold — fixed-width lowercase hex
    // orders exactly like its numeric value, so `prefix < thr` IS
    // `uniform_draw < frac` at 24-bit resolution, and DuckDB replays
    // the identical decision (md5 + printf) for the oracle. frac ≥ 1
    // maps to "g", which every hex string sorts below (keep-all).
    val thrCol = fracs.foldLeft(lit("0")) { case (acc, (k, f)) =>
      val thr = if (f >= 1.0) "g" else "%06x".format((f * 0x1000000).toLong)
      when(col("lang") === k, lit(thr)).otherwise(acc)
    }
    val draw = substring(seededHex(col("doc_id"), seed, hashMode), 1, 6)
    withTokens
      .where(col("lang").isin(present.keys.toSeq.map(lit): _*))
      .where(draw < thrCol)
  }

  def pipelineMixture(s: SparkSession, d: String): DataFrame =
    mixCorpus(documents(s, d),
      Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.1))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("lang"))

  /** Temperature-scaled source mixture — [[mixCorpus]] with the weights
    * DERIVED from the data instead of hand-pinned: w_s ∝ t_s^α over the
    * per-stratum token totals (the mT5/XLM-R multilingual sampling rule;
    * Xue et al. 2021 §3.3, Conneau et al. 2020 §3), which flattens a
    * skewed corpus toward the small strata without the uniform-weight
    * cliff. Because weight normalization cancels in the keep fraction —
    * frac_s = w_s·min_k(t_k/w_k)/t_s = (t_min/t_s)^(1−α) — no
    * cross-stratum float SUM ever happens, and with 1−α a dyadic power
    * (α ∈ {0, 0.5, 0.75} → r, √r, √√r) every step is an IEEE
    * correctly-rounded op (exact-long→double casts, one divide, nested
    * sqrt), so DuckDB replays the fraction BIT-identically. General α
    * needs pow(), which is not correctly rounded in either engine —
    * rejected loudly rather than flaking the gate at the 2⁻²⁴ draw
    * boundary. The smallest stratum keeps everything (frac = 1);
    * sampling is without replacement, capped at 1 (true α-temperature
    * UPSAMPLING with replication is [[epochPlan]]'s territory).
    *
    * Scale shape: identical to [[mixCorpus]] — one partial+final token
    * total per stratum (#strata rows collected — bounded metadata), the
    * per-doc keep decision is the same md5(doc_id:seed) 6-hex-digit
    * draw against a literal threshold, map-only; the corpus never
    * shuffles. */
  def temperatureMix(docs: DataFrame, alpha: Double = 0.5,
                     seed: Long = 42L, hashMode: String = "md5",
                     stratum: String = "lang"): DataFrame = {
    val sqrtDepth = Map(0.0 -> 0, 0.5 -> 1, 0.75 -> 2)
    require(sqrtDepth.contains(alpha),
      s"alpha=$alpha not in {0, 0.5, 0.75} — only dyadic 1-alpha powers " +
        "replay bit-identically across engines (see scaladoc)")
    // the broadcast threshold join below attaches _stratum/_thr/
    // sample_frac; an input already carrying any of them (e.g. a
    // chained mixCorpus output, whose sample_frac survives) would
    // produce ambiguous/duplicate columns at the join — fail loudly
    // rather than let the join resolve one of the twins arbitrarily
    val clash = docs.columns.toSet
      .intersect(Set("_stratum", "_thr", "sample_frac"))
    require(clash.isEmpty,
      s"temperatureMix input already has column(s) ${clash.toSeq.sorted
        .mkString(", ")} — drop or rename them before mixing")
    val withTokens = docs.withColumn("n_tokens", tokenCountCol(docs))
    // null-safe stratum key: a fold over `col(stratum) === k` would
    // silently DROP null-stratum docs (null = k is never true) — the
    // same silent-join-drop class the shard family fixed; null strata
    // form their own stratum under an uncollidable sentinel instead
    val keyCol = coalesce(col(stratum).cast("string"), lit("\u0000"))
    val totals = withTokens.groupBy(keyCol.as("_stratum"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(totals.nonEmpty, "empty corpus — no stratum totals")
    val tMin = totals.values.min
    def frac(t: Long): Double = {
      var r = tMin.toDouble / t.toDouble
      var i = 0
      while (i < sqrtDepth(alpha)) { r = math.sqrt(r); i += 1 }
      r
    }
    val fracs = totals.map { case (k, t) => k -> frac(t) }
    // same 24-bit hex-threshold form as mixCorpus: fixed-width lowercase
    // hex orders as its numeric value; frac >= 1 maps to "g" (keep-all).
    // Thresholds attach by BROADCAST join, not a folded when-chain:
    // mixCorpus's fold is bounded by its caller-supplied weights map,
    // but here #strata is DATA-driven (a 10⁶-source corpus would build
    // a 10⁶-branch literal tree — the janino-limit pathology the
    // hyperplane kernels were built to kill). The join compares the
    // identical strings, so the oracle replay is unchanged.
    import withTokens.sparkSession.implicits._
    val thrDf = fracs.toSeq.map { case (k, f) =>
      (k, if (f >= 1.0) "g" else "%06x".format((f * 0x1000000).toLong), f)
    }.toDF("_stratum", "_thr", "sample_frac")
    val draw = substring(seededHex(col("doc_id"), seed, hashMode), 1, 6)
    withTokens.withColumn("_stratum", keyCol)
      .join(broadcast(thrDf), Seq("_stratum"))
      .where(draw < col("_thr"))
      .drop("_stratum", "_thr")
  }

  def pipelineTemperatureMixture(s: SparkSession, d: String): DataFrame =
    temperatureMix(documents(s, d))
      .groupBy(col("lang"), col("sample_frac"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .select(col("lang"), col("sample_frac"), col("n_docs"),
        col("n_tokens"))
      .orderBy(col("lang"))

  /** Per-column dataset profile — the `ANALYZE TABLE` report a
    * pipeline reads before writing partitioning/bucketing config:
    * null count, exact distinct count, and a range stat (value range
    * for numeric columns, LENGTH range for strings — the stats real
    * ANALYZE keeps; extremal full strings don't scale and aren't
    * useful) for every column, in ONE scan.
    *
    * Every aggregation buffer is numeric BY CONSTRUCTION so the whole
    * report stays in HashAggregate: string distinct counts run over
    * the md5 split into two 64-bit halves (injective on the digest, so
    * the count equals distinct-md5 — which is what the oracle counts),
    * never over raw strings, whose immutable buffers would demote the
    * multi-distinct Expand to a SortAggregate that SORTS the full text
    * column (observed; same pathology pipeline_fingerprint's digest
    * extremes hit in round 6). The sketch swap at 100 TB is
    * approx_count_distinct with the rest of the report unchanged. */
  def pipelineProfile(s: SparkSession, d: String): DataFrame =
    profileTable(documents(s, d))

  def profileTable(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, FloatType, StringType}
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val isStr = f.dataType == StringType
      // fractional values must NOT take the long-cast distinct path —
      // cast(LongType) collapses 1.2 and 1.9 into one value and
      // undercounts n_distinct (exact only for integral types)
      val isFractional = f.dataType match {
        case FloatType | DoubleType | _: DecimalType => true
        case _ => false
      }
      // three ≤48-bit hex slices cover the whole digest (injective) and
      // stay inside signed-long range — a 16-hex-char half can exceed
      // Long.MaxValue and ANSI cast throws on it
      val (d1, d2, d3) =
        if (isStr)
          (conv(substring(md5(c), 1, 11), 16, 10).cast(LongType),
            conv(substring(md5(c), 12, 11), 16, 10).cast(LongType),
            conv(substring(md5(c), 23, 10), 16, 10).cast(LongType))
        else if (isFractional)
          // the raw numeric value is its own fixed-width buffer — exact
          // distinct, still HashAggregate-friendly
          (c, lit(0L), lit(0L))
        else (c.cast(LongType), lit(0L), lit(0L))
      val v = if (isStr) length(c).cast(DoubleType) else c.cast(DoubleType)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nn_${f.name}"),
        countDistinct(d1, d2, d3).as(s"nd_${f.name}"),
        min(v).as(s"mn_${f.name}"),
        max(v).as(s"mx_${f.name}"))
    }
    val cols = fields.map(_.name)
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    one.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n_nulls, n_distinct, min_v, max_v)"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_v"), col("max_v"))
      .orderBy(col("column_name"))
  }

  /** Deterministic source-INTERLEAVED training order: within each
    * source, docs take a seeded-md5 permutation rank r (the
    * [[globalShuffle]] discipline); global position then lays rounds
    * out r=0 of every source, r=1 of every source, … — the mixture
    * scheduling that keeps every training window source-balanced
    * instead of merely globally shuffled (a run of one source can
    * still appear in a plain shuffle; never here).
    *
    * No global sort and no giant base table: rows before round r is
    * CLOSED-FORM — Σ_s min(r, |s|) — computed map-side against the
    * broadcast one-row per-source size list (an aggregate HOF), and
    * the within-round offset is a row_number over ≤#sources rows per
    * round. Two corpus scans (counts + ranked), both column-pruned;
    * the per-source size list re-aggregates the bucket counts
    * (round 20 — was a third corpus scan).
    *
    * The per-source rank r itself is the [[globalShuffle]] two-pass
    * shape applied per (source, hex-prefix bucket of h): per-bucket
    * counts (tiny agg), cumulative bases over #sources × 16^prefixLen
    * rows, then a rank window per (source, bucket) — the prefix is a
    * prefix of the sort key, so (bkt, h) order IS h order and the
    * composed rank equals the single-window rank exactly, while a
    * 100 TB source spreads across 16^prefixLen tasks instead of one
    * (the corpus-sized window partition the round-10 review flagged). */
  def sourceInterleave(docs: DataFrame, seed: Long = 42L,
                       prefixLen: Int = 2, hashMode: String = "md5"): DataFrame = {
    val withKey = docs
      .select(col("doc_id"), col("source"),
        seededHex(col("doc_id"), seed, hashMode).as("h"))
      .withColumn("bkt", substring(col("h"), 1, prefixLen))
    // pass 1: one count per (source, bucket); the sequential base scan
    // runs over #sources × #buckets rows, never the corpus
    val counts = withKey.groupBy(col("source"), col("bkt"))
      .agg(count(lit(1)).as("n"))
    val wBase = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = counts.select(col("source"), col("bkt"),
      coalesce(sum(col("n")).over(wBase), lit(0L)).as("rbase"))
    // pass 2: intra-bucket rank, parallel across (source, bucket)
    val wIn = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("h"), col("doc_id"))
    val ranked = withKey
      .join(maybeBroadcastBases(bases), Seq("source", "bkt"))
      .withColumn("r", col("rbase") + (row_number().over(wIn) - 1).cast(LongType))
    // per-source sizes re-aggregate the (source, bucket) counts —
    // round 20: Σ_bkt n ≡ |source|, and the subtree rides the counts
    // exchange instead of paying a third corpus scan (guide §2.4)
    val sizes = counts.groupBy(col("source")).agg(sum(col("n")).as("sz"))
      .agg(collect_list(struct(col("source"), col("sz"))).as("szs"))
    val wRound = Window.partitionBy(col("r")).orderBy(col("source"), col("doc_id"))
    ranked.crossJoin(broadcast(sizes))
      .withColumn("base",
        expr("aggregate(szs, 0L, (acc, x) -> acc + least(r, x.sz))"))
      .select(col("doc_id"), col("source"),
        (col("base") + row_number().over(wRound)).as("pos"))
      .orderBy(col("doc_id"))
  }

  def pipelineInterleave(s: SparkSession, d: String): DataFrame =
    sourceInterleave(documents(s, d))

  /** Per-source token-budget admission: docs enter in (source, doc_id)
    * order until the source's cumulative token count crosses `budget` —
    * the "cap every source's contribution" step of mixture curation
    * (complement of [[mixCorpus]]'s proportional sampler: hard caps,
    * deterministic order, no draw). Same two-pass distributed prefix
    * sum as sharding, keyed by (source, doc_id-range bucket): bucket
    * subtotals → cumulative bases over the tiny subtotal frame →
    * intra-bucket running sum, so a 100 TB source spreads across
    * #buckets tasks. The straddling doc is admitted (cum counts the
    * doc's own tokens; admission tests the PRE-doc offset). */
  def budgetCap(docs: DataFrame, budget: Long = 1000L,
                bucketWidth: Long = BucketWidth): DataFrame = {
    val withTok = docs
      .select(col("doc_id"), col("source"),
        tokenCountCol(docs).as("n_tokens"),
        coalesce(col("source"), lit("\u0000<null>")).as("_sk"),
        expr(s"doc_id DIV $bucketWidth").as("bkt"))
    val subtotals = withTok.groupBy(col("_sk"), col("bkt"))
      .agg(sum(col("n_tokens")).as("bkt_tokens"))
    val wBase = Window.partitionBy(col("_sk")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = subtotals.select(col("_sk"), col("bkt"),
      coalesce(sum(col("bkt_tokens")).over(wBase), lit(0L)).as("base"))
    val wIn = Window.partitionBy(col("_sk"), col("bkt")).orderBy(col("doc_id"))
    withTok
      .join(maybeBroadcastBases(bases), Seq("_sk", "bkt"))
      .withColumn("cum", col("base") + sum(col("n_tokens")).over(wIn))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum"),
        (col("cum") - col("n_tokens") < budget).as("admitted"))
      .orderBy(col("doc_id"))
  }

  def pipelineBudgetCap(s: SparkSession, d: String): DataFrame =
    budgetCap(documents(s, d))

  /** Multi-epoch training plan: epoch e orders the corpus by the
    * seed+e permutation — E independent reshuffles in ONE plan, the
    * schedule a multi-epoch run publishes up front so shard readers
    * can prefetch. The epoch fan-out is a map-only explode of the
    * already-pruned (doc_id) projection; each epoch's rank uses the
    * same hex-prefix-bucketed two-pass prefix sum as [[globalShuffle]]
    * with (epoch, bucket) as the partition key, so no epoch ever
    * funnels through one task and epochs rank in parallel. */
  def epochPlan(docs: DataFrame, epochs: Int = 3, seed: Long = 42L,
                prefixLen: Int = 2): DataFrame = {
    val withKey = docs
      .select(col("doc_id"))
      .select(col("doc_id"),
        explode(expr(s"sequence(0, ${epochs - 1})")).as("epoch"))
      // seed and epoch hash as SEPARATE delimited fields: mixing them
      // as (epoch + seed) aliases permutations across (seed, epoch)
      // pairs — seed 42 epoch 1 would equal seed 43 epoch 0, breaking
      // the independent-reshuffle guarantee for users sweeping seeds
      .withColumn("h", md5(concat(col("doc_id").cast("string"),
        lit(s":$seed:"), col("epoch").cast("string"))))
      .withColumn("bkt", substring(col("h"), 1, prefixLen))
    val counts = withKey.groupBy(col("epoch"), col("bkt"))
      .agg(count(lit(1)).as("n"))
    val wBase = Window.partitionBy(col("epoch")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = counts.select(col("epoch"), col("bkt"),
      coalesce(sum(col("n")).over(wBase), lit(0L)).as("base"))
    val wIn = Window.partitionBy(col("epoch"), col("bkt"))
      .orderBy(col("h"), col("doc_id"))
    withKey
      .join(maybeBroadcastBases(bases), Seq("epoch", "bkt"))
      .select(col("epoch"), col("doc_id"),
        (col("base") + row_number().over(wIn)).as("pos"))
      .orderBy(col("epoch"), col("pos"))
  }

  def pipelineEpochPlan(s: SparkSession, d: String): DataFrame =
    epochPlan(documents(s, d))

  /** Balanced bin packing by longest-processing-time round-robin:
    * rank docs by token length (desc) and deal them across `nBins`
    * bins — the classic LPT heuristic that keeps every training
    * worker's token total within one max-doc of balance, versus the
    * order-preserving [[shardByTokenBudget]] which optimizes
    * contiguity instead. The global length rank is the two-pass
    * prefix-sum shape keyed by (length, doc_id-range bucket) — NOT by
    * the length alone: in a truncation/chunk-dominated corpus one
    * length value (every chunked doc is exactly the chunk size) holds
    * most of the corpus, so a rank window partitioned by `n_tokens`
    * would funnel it through one task. Instead the [[shardByTokenBudget]]
    * two-level shape: cumulative bases ACROSS lengths over the
    * #distinct-lengths reduction, cumulative bases across `doc_id DIV
    * bucketWidth` sub-buckets WITHIN a length over the subtotal table
    * (windows only ever see reduced count rows).
    *
    * Round 20 (guide §2.4/§1.2): the row-level rank itself is GONE.
    * Within a (n_tokens, bkt) group every doc has the same n_tokens
    * and the group's ranks are the contiguous run base+1 … base+n, so
    * the group's contribution to bin b is closed-form counting of
    * residues (rank−1) mod nBins over [base, base+n−1]:
    * off = (b − base) mod nBins, cnt = (n−1−off) DIV nBins + 1 when
    * off < n else 0 — and its token mass is n_tokens·cnt. The old
    * shape paid a second corpus scan (branch fan-out re-ran the
    * tokenize kernel), a corpus-row broadcast join, and a corpus-wide
    * exchange for the rank window; the new shape reduces the corpus
    * ONCE to the (n_tokens, bkt) subtotals and never touches a corpus
    * row again — the only shuffles left carry count rows. Identical
    * output by construction (AnalyticsOpsSpec balance/total invariants
    * + ShardingSpec rank-parity pin). */
  def packBinned(docs: DataFrame, nBins: Int = 8,
                 bucketWidth: Long = BucketWidth): DataFrame = {
    val withTok = docs.select(col("doc_id"),
      graft.functions.TextStats.textStats(col("text"))
        .getField("n_words").cast("long").as("n_tokens"))
      .withColumn("bkt", expr(s"doc_id DIV $bucketWidth"))
    // the reduced table feeds TWO branches (len bases + bucket bases);
    // truncate so the tokenize kernel runs once — branch fan-out
    // otherwise rebuilds the corpus scan per branch (AQE exchange reuse
    // does not unify the rebuilt stages; same discipline as the PMI
    // gram kernel and ccnet scoring)
    val subtotals = Lineage.truncate(
      withTok.groupBy(col("n_tokens"), col("bkt"))
        .agg(count(lit(1)).as("n")))
    val lenCounts = subtotals.groupBy(col("n_tokens"))
      .agg(sum(col("n")).as("len_n"))
    val wLen = Window.orderBy(col("n_tokens").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val lenBases = lenCounts.select(col("n_tokens"),
      coalesce(sum(col("len_n")).over(wLen), lit(0L)).as("len_base"))
    val wBkt = Window.partitionBy(col("n_tokens")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = subtotals
      .select(col("n_tokens"), col("bkt"), col("n"),
        coalesce(sum(col("n")).over(wBkt), lit(0L)).as("bkt_base"))
      .join(lenBases, Seq("n_tokens"))
      .select(col("n_tokens"), col("n"),
        (col("len_base") + col("bkt_base")).as("base"))
    bases
      .select(col("n_tokens"), col("n"), col("base"),
        explode(expr(s"sequence(0, ${nBins - 1})")).as("bin"))
      .withColumn("off",
        pmod(col("bin").cast("long") - col("base"), lit(nBins.toLong)))
      .withColumn("cnt", when(col("off") < col("n"),
        expr(s"(n - 1 - off) DIV $nBins") + lit(1L)).otherwise(lit(0L)))
      // cnt=0 rows drop so a bin no doc lands in is ABSENT, exactly as
      // the old groupBy-over-assigned-rows shape (matters when
      // #docs < nBins; sums are unaffected)
      .where(col("cnt") > 0)
      .groupBy(col("bin"))
      .agg(sum(col("cnt")).as("n_docs"),
        sum(col("n_tokens") * col("cnt")).as("n_tokens"))
      .orderBy(col("bin"))
  }

  def pipelinePackBinned(s: SparkSession, d: String): DataFrame =
    packBinned(documents(s, d))

  /** Corpus length-concentration report: the Gini coefficient of the
    * per-doc token-count distribution — the one-number answer to "is
    * this corpus a few giant documents or many small ones", which
    * drives chunking policy and shard-balance expectations (G≈0
    * uniform lengths, G→1 a few docs hold all tokens). Uses the
    * rank-sum identity G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) with
    * ranks ascending by (n_tokens, doc_id) — and the global rank is
    * the SAME two-level bucketed prefix sum as [[packBinned]]
    * (windows only ever see count rows). Σ rank·x accumulates as
    * DECIMAL(38,0) — exact where BIGINT would overflow at 10¹²-doc
    * scale — and the final Gini is ONE double expression over exact
    * integers, mirrored verbatim by the oracle.
    *
    * Round 20 (guide §2.4/§1.2), same collapse as [[packBinned]]: a
    * (x, bkt) group's ranks are the contiguous run base+1 … base+n and
    * every row shares the same x, so
    * Σ rank·x = x·(n·base + n(n+1)/2) in closed form over the subtotal
    * table — the second corpus scan, the corpus-row join and the
    * corpus-wide rank-window exchange are gone; no corpus row survives
    * past the first reduction. The triangular term computes with the
    * even factor pre-halved ((n DIV 2)·(n+1) or n·((n+1) DIV 2)) so
    * every product stays in DECIMAL(38,0) with no 63-bit overflow.
    * ShardingSpec pins value equality incl. bucket-width invariance. */
  def lengthGini(docs: DataFrame,
                 bucketWidth: Long = BucketWidth): DataFrame = {
    val withTok = docs.select(col("doc_id"),
      graft.functions.TextStats.textStats(col("text"))
        .getField("n_words").cast("long").as("x"))
      .withColumn("bkt", expr(s"doc_id DIV $bucketWidth"))
    // truncate before the two-branch fan-out — one tokenize pass
    // (see packBinned)
    val subtotals = Lineage.truncate(
      withTok.groupBy(col("x"), col("bkt"))
        .agg(count(lit(1)).as("n")))
    val lenCounts = subtotals.groupBy(col("x")).agg(sum(col("n")).as("len_n"))
    val wLen = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lenBases = lenCounts.select(col("x"),
      coalesce(sum(col("len_n")).over(wLen), lit(0L)).as("len_base"))
    val wBkt = Window.partitionBy(col("x")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = subtotals
      .select(col("x"), col("bkt"), col("n"),
        coalesce(sum(col("n")).over(wBkt), lit(0L)).as("bkt_base"))
      .join(lenBases, Seq("x"))
      .select(col("x"), col("n"),
        (col("len_base") + col("bkt_base")).as("base"))
    val dec38 = DecimalType(38, 0)
    val tri = when(col("n") % 2 === 0,
      expr("n DIV 2").cast(dec38) * (col("n") + 1))
      .otherwise(col("n").cast(dec38) * expr("(n + 1) DIV 2"))
    bases
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_docs"),
        sum(col("x") * col("n")).as("total_tokens"),
        sum(col("x").cast(dec38) *
          (col("n").cast(dec38) * col("base") + tri)).as("srx"))
      .select(col("n_docs"), col("total_tokens"),
        ((lit(2.0) * col("srx").cast(DoubleType) -
          (col("n_docs") + 1).cast(DoubleType) *
            col("total_tokens").cast(DoubleType)) /
          (col("n_docs").cast(DoubleType) *
            col("total_tokens").cast(DoubleType))).as("gini"))
  }

  def pipelineLengthGini(s: SparkSession, d: String): DataFrame =
    lengthGini(documents(s, d))

  /** Physical-layout recommendation — the step between ANALYZE
    * ([[profileTable]]) and a write: estimated in-memory bytes per
    * table from one single-pass agg (fixed widths for numerics,
    * measured lengths for strings), then the file-count and
    * power-of-two bucket-count a writer should target. All-integer
    * arithmetic end to end (deterministic, oracle-replayed); the gate
    * default budget is 1 MiB so the recommendation VARIES at test
    * scales — production budget (128 MiB parquet row groups) is the
    * `targetBytes` knob via pipelineView. */
  /** Estimated in-memory row width: fixed widths for numerics,
    * measured lengths (+4 overhead) for strings — shared by
    * [[layoutPlan]] and [[joinAdvice]], mirrored constant-for-constant
    * by both oracles. */
  private[operators] def rowWidth(df: DataFrame): Column = {
    import org.apache.spark.sql.types.{StringType, IntegerType => IntT,
      DoubleType => DblT, LongType => LngT, TimestampType, BooleanType}
    df.schema.fields.map { f =>
      f.dataType match {
        case StringType => length(coalesce(col(f.name), lit(""))) + lit(4)
        case IntT => lit(4)
        case DblT | LngT | TimestampType => lit(8)
        case BooleanType => lit(1)
        case _ => lit(8)
      }
    }.reduce(_ + _)
  }

  /** The ONE production target-bytes default shared by the pair
    * advisor's bucket_n and the executed join's bucket count
    * ([[ScaleJoins.adviseJoin]]/[[ScaleJoins.advisedJoin]]) — 128 MiB,
    * the parquet row-group budget. A report and the execution it
    * prices must agree on this constant or the advised bucket_n
    * silently disagrees with the executed one (round-15 advice).
    * Gate entries pin targetBytes = 1 MiB explicitly so the
    * recommendation VARIES at test scales. */
  val DefaultLayoutTargetBytes: Long = 128L << 20

  def layoutPlan(s: SparkSession, d: String,
                 targetBytes: Long = 1L << 20): DataFrame = {
    def est(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          sum(rowWidth(df).cast(LongType)).as("est_bytes"))
        .select(lit(name).as("table_name"), col("n_rows"), col("est_bytes"))
    val all = Seq(
      est(lineitem(s, d), "lineitem"), est(orders(s, d), "orders"),
      est(events(s, d), "events"), est(documents(s, d), "documents"))
      .reduce(_.unionAll(_))
    all
      .withColumn("target_files",
        greatest(lit(1L), expr(s"(est_bytes + ${targetBytes - 1}) DIV $targetBytes")))
      // bucket count: smallest power of two >= target_files (bucketed
      // tables rescale by factor-of-two splits/merges)
      .withColumn("bucket_count", pow2Ceil(col("target_files")))
      .orderBy(col("table_name"))
  }

  /** CDC MERGE (upsert + delete) of a change batch into a snapshot —
    * the compaction step between [[Dedup.datasetDiff]] (what changed)
    * and the next corpus version. One shuffle on the key (full outer
    * join snapshot × changes), change wins, deletes drop; at 100 TB a
    * table format (Delta/Iceberg) does this storage-side, and this
    * operator IS that MERGE's dataflow. The gate derives a
    * deterministic change batch from the snapshot itself (ids ≡0 mod
    * 10 update, ≡7 delete, ≡3 insert under ids+10⁷) so the oracle
    * replays it. */
  def mergeUpsert(snapshot: DataFrame, changes: DataFrame): DataFrame =
    snapshot.select(col("doc_id"), col("text").as("s_text"))
      .join(changes.select(col("doc_id"), col("op"), col("c_text")),
        Seq("doc_id"), "full_outer")
      .where(coalesce(col("op"), lit("K")) =!= "D")
      .select(col("doc_id"),
        when(col("op") === "U", lit("update"))
          .when(col("op") === "I", lit("insert"))
          .otherwise(lit("keep")).as("action"),
        coalesce(col("c_text"), col("s_text")).as("text"))
      .select(col("doc_id"), col("action"),
        length(col("text")).cast(LongType).as("n_chars"),
        md5(col("text")).as("digest"))
      .orderBy(col("doc_id"))

  /** SCD Type-2 history build — the versioned companion of
    * [[mergeUpsert]] (which keeps only the latest state): apply a
    * stack of versioned change batches to a base snapshot and emit one
    * row PER (key, version) with a [valid_from, valid_to) window and
    * an is_current flag — the dimension-history table a lakehouse
    * keeps so any past training run's exact inputs stay queryable
    * ("as of version v"). Updates open a new interval and close the
    * previous one; deletes close without opening (a key ending in a
    * delete has no current row); inserts open at their version.
    * Scale shape: one union of already-keyed rows, one lead() window
    * partitioned by key — bounded by a key's own version count, never
    * the corpus — and the digest projection is map-only; text never
    * shuffles twice. */
  def scd2Build(base: DataFrame, changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("v"))
    base.select(col("doc_id"), lit(0L).as("v"), lit("U").as("op"),
        col("text"))
      .unionByName(changes.select(col("doc_id"), col("v"), col("op"),
        col("c_text").as("text")))
      .withColumn("valid_to", lead(col("v"), 1).over(w))
      .where(col("op") =!= "D")
      .select(col("doc_id"), col("v").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"),
        length(col("text")).cast(LongType).as("n_chars"),
        md5(col("text")).as("digest"))
      .orderBy(col("doc_id"), col("valid_from"))
  }

  def pipelineScd2(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d)
    // deterministic three-batch change stack: v1 edits every 10th doc
    // and inserts fresh keys, v2 re-edits half the edited and deletes
    // every doc ≡ 7 (mod 10) — exercises multi-version keys, histories
    // ending in delete, and singleton inserts
    val changes =
      base.where(col("doc_id") % 10 === 0)
        .select(col("doc_id"), lit(1L).as("v"), lit("U").as("op"),
          concat(lit("v1: "), substring(col("text"), 1, 50)).as("c_text"))
      .unionAll(base.where(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 20000000L).as("doc_id"), lit(1L).as("v"),
          lit("I").as("op"),
          concat(lit("fresh: "), substring(col("text"), 1, 40)).as("c_text")))
      .unionAll(base.where(col("doc_id") % 20 === 0)
        .select(col("doc_id"), lit(2L).as("v"), lit("U").as("op"),
          concat(lit("v2: "), substring(col("text"), 1, 30)).as("c_text")))
      .unionAll(base.where(col("doc_id") % 10 === 7)
        .select(col("doc_id"), lit(2L).as("v"), lit("D").as("op"),
          lit(null).cast("string").as("c_text")))
    scd2Build(base, changes)
  }

  /** As-of read over an SCD2 history — the TIME-TRAVEL consumer of
    * [[scd2Build]]: reconstruct the table exactly as it stood at
    * version `v` ("which rows did last month's training run actually
    * read?"). A key's row at v is the interval containing v —
    * valid_from ≤ v < valid_to (open-ended intervals are current);
    * keys first inserted after v and keys already deleted at v are
    * absent, exactly matching a rebuild over the ≤v change prefix.
    *
    * Scale shape: one map-only filter over the history table — no
    * window, no join, no shuffle beyond what building the history
    * cost; at rest (history persisted once) time travel is a
    * predicate-pushed scan, which is the entire point of keeping SCD2
    * instead of snapshots-per-version. */
  def asOfRead(scd2: DataFrame, v: Long): DataFrame =
    scd2
      .where(col("valid_from") <= v &&
        (col("valid_to").isNull || col("valid_to") > v))
      .select(col("doc_id"), col("valid_from").as("version_from"),
        col("n_chars"), col("digest"))
      .orderBy(col("doc_id"))

  def pipelineAsofRead(s: SparkSession, d: String, v: Long = 1L): DataFrame =
    asOfRead(pipelineScd2(s, d), v)

  /** SCD2 EVENT-TIME lookup — the consuming read pattern for the
    * [[scd2Build]] history (round-16 verdict ask #4): enrich each
    * event with the dimension row valid AT the event's timestamp
    * (valid_from ≤ ts < valid_to; a key deleted before ts attaches
    * nothing and the event drops — inner semantics, the oracle's
    * interval join exactly). Every CDC/feature-store user hits this:
    * "which tier was this user on WHEN they clicked", not "now".
    *
    * Plan shape — the [[Temporal.qAsofJoin]] union-and-window
    * formulation, NOT an interval join: dim-version opens and events
    * union into one stream, ONE shuffle on the key, one ordered pass
    * carries the latest open version forward (dim rows sort before
    * events at the same instant, so an event AT valid_from sees the
    * new version). This is deliberately not q_range_join's
    * interval-bucketing: that machinery assumes BOUNDED intervals
    * (views duplicate into ≤2 hour-buckets); SCD2 validity intervals
    * are open-ended and span the whole timeline (version 0 covers
    * everything before the first change), so bucketing would
    * duplicate each dim row into every bucket its interval touches —
    * unbounded. Because a key's versions PARTITION its timeline, the
    * as-of pass is exact, O(n log n) in the shuffle, and never a
    * BNLJ; the carried valid_to (null coalesced to a far-future
    * sentinel so `last(…, ignoreNulls)` cannot resurrect a PRIOR
    * version's close) prunes events past a deletion. The equi-join ⋈
    * key + interval-filter alternative (fanout = versions per key)
    * is what the DuckDB oracle runs — same rows by construction.
    *
    * The gate dim derives deterministically from the corpus itself
    * (tier upgrades at the corpus' own time terciles, exact integer-
    * second arithmetic both engines replay): every user opens bronze;
    * id ≡ 0 (mod 3) upgrades to silver at t⅓; id ≡ 0 (mod 6) to gold
    * at t⅔; id ≡ 7 (mod 10) is DELETED at t⅔ (deletion beats the
    * gold upgrade) — so the planted mid-stream changes flip the
    * attached version and the deletion tail drops, both
    * oracle-checked. */
  def scd2Lookup(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    val b = events.agg(
      unix_seconds(min(col("ts"))).as("lo"),
      unix_seconds(max(col("ts"))).as("hi")).collect().head
    if (b.isNullAt(0)) { // no events → no terciles to derive, no lookups
      import org.apache.spark.sql.types.{StructType, StructField,
        TimestampType, StringType}
      return s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType(
          Seq(StructField("event_id", LongType),
            StructField("user_id", LongType),
            StructField("ts", TimestampType),
            StructField("tier", StringType),
            StructField("tier_since", TimestampType))))
    }
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val span3 = (hi - lo) / 3
    val c1 = timestamp_seconds(lit(lo + span3))
    val c2 = timestamp_seconds(lit(lo + 2 * span3))
    val farFuture = lit("9999-12-31 00:00:00")
      .cast(org.apache.spark.sql.types.TimestampType)
    // the user-version table derives from ONE distinct + one generate:
    // a union of three filtered selects over `users` looks the same but
    // re-plans the distinct per branch (three corpus scans, three
    // shuffles — observed in the plan audit); the explode keeps the
    // single distinct exchange and everything after it map-only
    val u = col("user_id")
    val nullTs = lit(null)
      .cast(org.apache.spark.sql.types.TimestampType)
    // `ord` is the VERSION ordinal (bronze 0 < silver 1 < gold 2) —
    // the final window sort key. With a span under 3 seconds the
    // terciles coincide (span3 = 0 → c1 == c2) and multiple versions
    // of one key open at the same (t, side=0); without the ordinal
    // their order — and therefore which version last() carries past
    // that instant — is nondeterministic and can diverge from the
    // oracle's interval join. Later version wins at the same instant,
    // which is also what the interval semantics demand: a version
    // whose [from, to) interval is empty attaches nothing.
    val dimRows = events.select(u).distinct()
      .select(u, explode(array(
        struct(lit("bronze").as("tier"),
          lit("1970-01-01 00:00:00")
            .cast(org.apache.spark.sql.types.TimestampType)
            .as("valid_from"),
          when(u % 3 === 0, c1).when(u % 10 === 7, c2).as("valid_to"),
          lit(true).as("keep"), lit(0).as("ord")),
        struct(lit("silver").as("tier"), c1.as("valid_from"),
          when(u % 10 === 7, c2).when(u % 6 === 0, c2).as("valid_to"),
          (u % 3 === 0).as("keep"), lit(1).as("ord")),
        struct(lit("gold").as("tier"), c2.as("valid_from"),
          nullTs.as("valid_to"),
          (u % 6 === 0 && u % 10 =!= 7).as("keep"),
          lit(2).as("ord")))).as("v"))
      .where(col("v.keep"))
      .select(u, col("v.tier").as("tier"),
        col("v.valid_from").as("valid_from"),
        col("v.valid_to").as("valid_to"), col("v.ord").as("ord"))
    val dim = dimRows
      .select(col("user_id"), col("valid_from").as("t"), lit(0).as("side"),
        col("ord"),
        lit(null).cast(org.apache.spark.sql.types.LongType).as("event_id"),
        col("tier"), col("valid_from"),
        coalesce(col("valid_to"), farFuture).as("valid_to_s"))
    val evs = events.select(col("user_id"), col("ts").as("t"),
      lit(1).as("side"), lit(3).as("ord"), col("event_id"),
      lit(null).cast("string").as("tier"),
      lit(null).cast(org.apache.spark.sql.types.TimestampType)
        .as("valid_from"),
      lit(null).cast(org.apache.spark.sql.types.TimestampType)
        .as("valid_to_s"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("side"), col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.unionByName(evs)
      .select(col("user_id"), col("t"), col("side"), col("event_id"),
        last(col("tier"), ignoreNulls = true).over(w).as("tier"),
        last(col("valid_from"), ignoreNulls = true).over(w).as("tier_since"),
        last(col("valid_to_s"), ignoreNulls = true).over(w).as("closes"))
      .where(col("side") === 1 && col("tier").isNotNull &&
        col("t") < col("closes"))
      .select(col("event_id"), col("user_id"), col("t").as("ts"),
        col("tier"), col("tier_since"))
      .orderBy(col("event_id"))
  }

  def pipelineScd2Lookup(s: SparkSession, d: String): DataFrame =
    scd2Lookup(events(s, d))

  def pipelineMergeUpsert(s: SparkSession, d: String): DataFrame = {
    val snap = documents(s, d)
    val changes =
      snap.where(col("doc_id") % 10 === 0)
        .select(col("doc_id"), lit("U").as("op"),
          concat(lit("edited: "), substring(col("text"), 1, 50)).as("c_text"))
      .unionAll(snap.where(col("doc_id") % 10 === 7)
        .select(col("doc_id"), lit("D").as("op"),
          lit(null).cast("string").as("c_text")))
      .unionAll(snap.where(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 10000000L).as("doc_id"), lit("I").as("op"),
          concat(lit("new: "), substring(col("text"), 1, 40)).as("c_text")))
    mergeUpsert(snap, changes)
  }

  /** Key-skew profile for one (relation, key column): group-size
    * distribution reduced to the numbers a planner acts on — n_rows,
    * n_keys, the largest key's size, mean size, skew = max/mean, and
    * the heaviest key's share of all rows. This is the pre-join
    * diagnostic that decides salting / AQE skew-join / broadcast: skew
    * ≈ 1 is uniform, skew ≫ 1 means one key dominates a shuffle
    * partition at any cluster width.
    *
    * Scale shape: ONE partial+final count per key (the only pass over
    * corpus rows), then a single-row agg over the key-size table.
    * Quotients are exact-integer ratios computed in double —
    * bit-identical across engines; no window, no sort, no collect. */
  def keySkew(df: DataFrame, rel: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("n")).as("max_n"))
      .select(lit(rel).as("rel"), lit(keyCol).as("keycol"),
        col("n_rows"), col("n_keys"), col("max_n"),
        (col("n_rows").cast(DoubleType) / col("n_keys")).as("avg_n"),
        ((col("max_n").cast(DoubleType) * col("n_keys")) / col("n_rows"))
          .as("skew"),
        (col("max_n").cast(DoubleType) / col("n_rows")).as("top1_share"))

  /** Per-column completeness/cardinality profile of one relation —
    * the other half of the data-quality readout ([[keySkew]] profiles
    * group SIZES of a chosen key; this profiles every column's null
    * rate and distinct count, the schema-drift and join-key-sanity
    * check a pipeline runs before trusting a new drop).
    *
    * Scale shape: one partial+final agg PER COLUMN, each over a scan
    * pruned to exactly that column (ReadSchema shows one field per
    * leg) — legs run as independent jobs, so the profile parallelizes
    * across columns and never materializes two columns at once.
    * Quotients are exact-integer ratios in double. */
  def columnProfile(df: DataFrame, rel: String): DataFrame =
    df.columns.toSeq.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_notnull"),
        countDistinct(col(c)).as("n_distinct"))
        .select(lit(rel).as("rel"), lit(c).as("colname"),
          col("n_rows"),
          (col("n_rows") - col("n_notnull")).as("n_null"),
          col("n_distinct"),
          ((col("n_rows") - col("n_notnull")).cast(DoubleType) /
            col("n_rows")).as("null_frac"),
          (col("n_distinct").cast(DoubleType) / col("n_rows"))
            .as("distinct_frac"))
    }.reduce(_.unionAll(_))

  /** Per-source document-length quartiles (exact linear-interpolation
    * percentiles over n_chars) — the length-distribution readout the
    * packing/chunking family sizes its bins from; one exact
    * percentile agg per source group, no window, no sort beyond the
    * output ORDER BY. Exact percentile buffers a source's lengths in
    * the agg state — right up to ~10⁸ rows per group; beyond that
    * swap approx_percentile in, same plan shape. */
  def pipelineLengthPercentiles(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(expr("percentile(n_chars, 0.25D)"), 4).as("p25"),
        round(expr("percentile(n_chars, 0.5D)"), 4).as("p50"),
        round(expr("percentile(n_chars, 0.75D)"), 4).as("p75"),
        round(expr("percentile(n_chars, 0.95D)"), 4).as("p95"))
      .orderBy(col("source"))

  def pipelineColumnProfile(s: SparkSession, d: String): DataFrame =
    Seq(
      columnProfile(documents(s, d), "documents"),
      columnProfile(events(s, d), "events"),
      columnProfile(orders(s, d), "orders"))
      .reduce(_.unionAll(_))
      .orderBy(col("rel"), col("colname"))

  /** The standing skew report over the join/partition keys this
    * engine's own operators shuffle on. Six independent single-pass
    * profiles, unioned — each leg is its own scan+agg, so the report
    * parallelizes across legs and any leg can be dropped or added
    * per-deployment via [[keySkew]]. */
  def pipelineSkewStats(s: SparkSession, d: String): DataFrame =
    Seq(
      keySkew(events(s, d), "events", "user_id"),
      keySkew(events(s, d), "events", "event_type"),
      keySkew(orders(s, d), "orders", "o_custkey"),
      keySkew(lineitem(s, d), "lineitem", "l_suppkey"),
      keySkew(lineitem(s, d), "lineitem", "l_partkey"),
      keySkew(documents(s, d), "documents", "source"))
      .reduce(_.unionAll(_))
      .orderBy(col("rel"), col("keycol"))

  /** Join-strategy recommendation for one (relation, key) — the
    * report that connects the skew DIAGNOSTIC ([[keySkew]]) to its
    * TREATMENTS ([[ScaleJoins.saltedJoin]], `broadcast()`, plain
    * shuffle). Per leg: the key-size profile plus the relation's
    * estimated in-memory bytes ([[rowWidth]], the layoutPlan
    * estimator) reduce to one row with
    *
    *   - `broadcast` when the whole relation fits a build side
    *     (est_bytes ≤ broadcastBytes — skew is irrelevant if nothing
    *     shuffles),
    *   - `salt` when the hottest key exceeds skewMult × the floor
    *     average, with salt_n = the least power of two ≥ the hot
    *     key's multiple of average (capped at maxSalt) — the N that
    *     spreads the hot key's rows back to ~average-sized tasks,
    *   - `plain` otherwise.
    *
    * All-integer thresholds (the avg is an integer FLOOR ≥ 1, so the
    * ratio never needs the max_n·n_keys product that would overflow
    * BIGINT at 10¹⁰ rows) — the oracle replays every branch exactly.
    * The gate default broadcastBytes is 1 MiB so strategies VARY at
    * test scales; production (10 MiB = Spark's
    * autoBroadcastJoinThreshold default) is the knob.
    *
    * Scale shape: one partial+final agg per leg (per-key count + byte
    * subtotal in the same pass), then a single-row reduction — the
    * advice for a 100 TB table costs one scan of it. */
  def joinAdvice(df: DataFrame, rel: String, keyCol: String,
                 broadcastBytes: Long = 1L << 20,
                 skewMult: Long = 4L,
                 maxSalt: Long = 64L): DataFrame =
    adviceColumns(
      df.groupBy(col(keyCol))
        .agg(count(lit(1)).as("n"), sum(rowWidth(df).cast(LongType)).as("b"))
        .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(col("n")).as("max_n"), sum(col("b")).as("est_bytes"))
        .select(lit(rel).as("rel"), lit(keyCol).as("keycol"),
          col("n_rows"), col("n_keys"), col("max_n"), col("est_bytes")),
      broadcastBytes, skewMult, maxSalt)

  /** The strategy arithmetic of [[joinAdvice]], applied to an
    * already-reduced stats frame carrying (n_rows, n_keys, max_n,
    * est_bytes) — ONE definition shared by the live advisor, the
    * persisted [[StatsCatalog]]'s advice view, and [[joinPairAdvice]],
    * so the constants can never drift apart (the oracles mirror them
    * constant-for-constant). */
  private[operators] def adviceColumns(stats: DataFrame,
                                       broadcastBytes: Long,
                                       skewMult: Long,
                                       maxSalt: Long): DataFrame =
    stats
      .withColumn("_avg", greatest(expr("n_rows DIV n_keys"), lit(1L)))
      .withColumn("_ratio", expr("(max_n + _avg - 1) DIV _avg"))
      .withColumn("strategy",
        when(col("est_bytes") <= broadcastBytes, lit("broadcast"))
          .when(col("max_n") > col("_avg") * skewMult, lit("salt"))
          .otherwise(lit("plain")))
      .withColumn("salt_n",
        when(col("strategy") === "salt",
          least(lit(maxSalt), pow2Ceil(col("_ratio"))))
          .otherwise(lit(0L)))
      .drop("_avg", "_ratio")

  /** Smallest power of two ≥ a positive long column — the
    * factor-of-two rescale discipline shared by [[layoutPlan]]'s
    * bucket counts, salt fan-outs, and [[joinPairAdvice]]'s bucket_n. */
  private[graft] def pow2Ceil(c: Column): Column =
    when(c.bitwiseAND(c - 1) === 0L, c)
      .otherwise(call_function("shiftleft", lit(1L), length(bin(c))))

  /** [[joinAdvice]] for SEVERAL key columns of ONE relation in a
    * single scan (round 19, guide §1.2): the per-key (count, bytes)
    * reduction rides GROUPING SETS — one pass over the table, one
    * Expand-duplicated shuffle — instead of one full scan + keyed agg
    * per key. grouping_id() tags which key column each group belongs
    * to; the per-key stats and the advice arithmetic are identical to
    * N separate joinAdvice calls (adviceColumns is shared). */
  def joinAdviceMultiKey(df: DataFrame, rel: String, keys: Seq[String],
                         broadcastBytes: Long = 1L << 20,
                         skewMult: Long = 4L,
                         maxSalt: Long = 64L): DataFrame = {
    val keyCols = keys.map(col)
    val grouped = df
      .select(keyCols :+ rowWidth(df).cast(LongType).as("_w"): _*)
      .groupingSets(keys.map(k => Seq(col(k))), keyCols: _*)
      .agg(count(lit(1)).as("n"), sum(col("_w")).as("b"),
        grouping_id().as("_gid"))
    // grouping_id: bit per grouping column, 0 = grouped-by; the set
    // {k_i} has every bit set EXCEPT i's
    val gidOf = keys.indices.map { i =>
      i -> ((1 << keys.length) - 1 - (1 << (keys.length - 1 - i)))
    }.toMap
    val stats = grouped.groupBy(col("_gid"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("n")).as("max_n"), sum(col("b")).as("est_bytes"))
    val keyName = keys.indices.foldLeft(lit(null: String)) { (acc, i) =>
      when(col("_gid") === gidOf(i), lit(keys(i))).otherwise(acc)
    }
    adviceColumns(
      stats.select(lit(rel).as("rel"), keyName.as("keycol"),
        col("n_rows"), col("n_keys"), col("max_n"), col("est_bytes")),
      broadcastBytes, skewMult, maxSalt)
  }

  /** Gate key: [[joinAdvice]] over the same six (relation, key) legs
    * [[pipelineSkewStats]] profiles — the advisor a 100 TB operator
    * reads before choosing a join plan. events and lineitem each carry
    * two advised keys: their stats ride one grouping-sets scan each
    * ([[joinAdviceMultiKey]], round 19) instead of two. */
  def pipelineJoinAdvisor(s: SparkSession, d: String): DataFrame =
    Seq(
      joinAdviceMultiKey(events(s, d), "events",
        Seq("user_id", "event_type")),
      joinAdvice(orders(s, d), "orders", "o_custkey"),
      joinAdviceMultiKey(lineitem(s, d), "lineitem",
        Seq("l_suppkey", "l_partkey")),
      joinAdvice(documents(s, d), "documents", "source"))
      .reduce(_.unionAll(_))
      .orderBy(col("rel"), col("keycol"))

  /** Join-strategy recommendation for a PAIR of relations — the
    * two-sided completion of [[joinAdvice]] (which profiles one side
    * and can only see broadcast/salt/plain): with both sides' stats
    * in one row, the advisor can recommend `bucket` — co-located
    * bucketed tables, zero per-query shuffle — for the fact-fact case
    * where NEITHER side fits a build side and the key is REUSED
    * across a pipeline (bucketing pays one layout write to delete a
    * shuffle from every later join on the key; for a one-off join the
    * shuffle is cheaper, so `keyReused` is the caller's declaration,
    * not a statistic). Decision order, all-integer arithmetic, every
    * branch oracle-replayed:
    *
    *   1. `broadcast` when the dim fits a build side (skew and reuse
    *      are irrelevant if nothing shuffles),
    *   2. `bucket` when keyReused and BOTH sides exceed
    *      broadcastBytes — `bucket_n` = [[layoutPlan]]'s power-of-two
    *      file count for the LARGER side at `targetBytes` (both
    *      sides must bucket by the SAME count to co-locate),
    *   3. `cluster` when rangeQueried, the fact exceeds broadcastBytes
    *      and the key carries a numeric span (key_min non-null) — the
    *      range-clustered layout ([[graft.sources.Sources.writeClustered]])
    *      whose parquet min/max stats prune whole files for the range
    *      predicates the caller declared dominant (timestamps,
    *      prices); `cluster_n` = the fact's file count at
    *      `targetBytes` (plain, not power-of-two — range files
    *      rescale by splitting anywhere). An equi-reused key prefers
    *      the hash-co-located `bucket` layout, hence the order.
    *   4. `salt` / `plain` from the fact side's hot-key profile,
    *      exactly [[joinAdvice]].
    *
    * `key_min`/`key_max` (the fact key's numeric span, null for
    * non-numeric keys) always ride along — they are the zone-map
    * statistic the `cluster` branch decides on, persisted per key in
    * the [[StatsCatalog]] rows (min/max merge across batches).
    *
    * Scale shape: one partial+final agg per side (the fact leg keyed,
    * the dim leg a single-row reduction), joined by a 1-row×1-row
    * broadcast attach. [[ScaleJoins.advisedJoin]] executes all five
    * branches; the `broadcast_bytes`/`key_reused`/`range_queried`
    * knob columns ride along so a report over many legs stays
    * self-describing. */
  def joinPairAdvice(fact: DataFrame, factRel: String, factKey: String,
                     dim: DataFrame, dimRel: String, dimKey: String,
                     broadcastBytes: Long = 1L << 20,
                     skewMult: Long = 4L, maxSalt: Long = 64L,
                     keyReused: Boolean = false,
                     targetBytes: Long = DefaultLayoutTargetBytes,
                     rangeQueried: Boolean = false): DataFrame =
    joinPairAdviceMulti(fact, factRel, factKey, dim, dimRel, dimKey,
      Seq(PairAdviceKnobs(broadcastBytes, skewMult, maxSalt, keyReused,
        targetBytes, rangeQueried)))

  /** One advisory-knob setting for [[joinPairAdviceMulti]] — the
    * caller-declared inputs the decision depends on, as data. */
  case class PairAdviceKnobs(broadcastBytes: Long = 1L << 20,
                             skewMult: Long = 4L, maxSalt: Long = 64L,
                             keyReused: Boolean = false,
                             targetBytes: Long = DefaultLayoutTargetBytes,
                             rangeQueried: Boolean = false)

  /** [[joinPairAdvice]] for SEVERAL knob settings over ONE (fact, key,
    * dim) triple — round 19 (guide §1.2): the advisor gate keys ask the
    * same statistics question under different caller declarations
    * (broadcast bound, reuse, range), and each single-knob call paid a
    * full fact scan + keyed agg for stats that are knob-independent.
    * Here the stats compute once and the knob rows ride a tiny
    * exploded literal array, so N advisory variants cost one pass.
    * Output rows are byte-identical to N unioned joinPairAdvice calls
    * (same columns, knob order preserved). */
  def joinPairAdviceMulti(fact: DataFrame, factRel: String, factKey: String,
                          dim: DataFrame, dimRel: String, dimKey: String,
                          knobs: Seq[PairAdviceKnobs]): DataFrame = {
    val fstats = fact.groupBy(col(factKey))
      .agg(count(lit(1)).as("n"), sum(rowWidth(fact).cast(LongType)).as("b"))
      .agg(sum(col("n")).as("fact_rows"), count(lit(1)).as("fact_keys"),
        max(col("n")).as("max_n"), sum(col("b")).as("fact_bytes"),
        min(expr(s"try_cast($factKey AS double)")).as("key_min"),
        max(expr(s"try_cast($factKey AS double)")).as("key_max"))
    val dstats = dim
      .agg(count(lit(1)).as("dim_rows"),
        sum(rowWidth(dim).cast(LongType)).as("dim_bytes"))
    fstats.crossJoin(dstats)
      .select(col("*"), explode(typedlit(knobs.map(k =>
        (k.broadcastBytes, k.skewMult, k.maxSalt, k.keyReused,
          k.targetBytes, k.rangeQueried)))).as("_k"))
      .select(lit(factRel).as("fact_rel"), lit(dimRel).as("dim_rel"),
        lit(factKey).as("keycol"),
        col("fact_rows"), col("fact_keys"), col("max_n"), col("fact_bytes"),
        col("dim_rows"), col("dim_bytes"),
        col("_k._1").as("broadcast_bytes"),
        col("_k._4").as("key_reused"),
        col("_k._6").as("range_queried"),
        col("key_min"), col("key_max"),
        col("_k._2").as("_sm"), col("_k._3").as("_ms"),
        col("_k._5").as("_tb"))
      .withColumn("_avg", greatest(expr("fact_rows DIV fact_keys"), lit(1L)))
      .withColumn("_ratio", expr("(max_n + _avg - 1) DIV _avg"))
      .withColumn("strategy",
        when(col("dim_bytes") <= col("broadcast_bytes"), lit("broadcast"))
          .when(col("key_reused") &&
            col("fact_bytes") > col("broadcast_bytes") &&
            col("dim_bytes") > col("broadcast_bytes"), lit("bucket"))
          .when(col("range_queried") &&
            col("fact_bytes") > col("broadcast_bytes") &&
            col("key_min").isNotNull, lit("cluster"))
          .when(col("max_n") > col("_avg") * col("_sm"), lit("salt"))
          .otherwise(lit("plain")))
      .withColumn("salt_n",
        when(col("strategy") === "salt",
          least(col("_ms"), pow2Ceil(col("_ratio")))).otherwise(lit(0L)))
      .withColumn("bucket_n",
        when(col("strategy") === "bucket",
          pow2Ceil(greatest(lit(1L),
            expr("(greatest(fact_bytes, dim_bytes) + _tb - 1) DIV _tb"))))
          .otherwise(lit(0L)))
      .withColumn("cluster_n",
        when(col("strategy") === "cluster",
          greatest(lit(1L), expr("(fact_bytes + _tb - 1) DIV _tb")))
          .otherwise(lit(0L)))
      .drop("_avg", "_ratio", "_sm", "_ms", "_tb")
  }

  /** Gate key: [[joinPairAdvice]] over four two-sided legs chosen so
    * the gate-scale data exercises broadcast (small dim), bucket (both
    * sides past a tightened bound on a reused key), precedence
    * (broadcast beats bucket when the dim fits), and plain (no
    * treatment applies) — salt is ScaleJoinsSpec's planted branch. */
  def pipelinePairAdvisor(s: SparkSession, d: String): DataFrame =
    Seq(
      // targetBytes pinned to the 1 MiB GATE budget (so bucket_n
      // varies at test scales); the library default is the shared
      // production DefaultLayoutTargetBytes. The two l_orderkey legs
      // differ only in the declared broadcast bound — one stats pass,
      // two knob rows (joinPairAdviceMulti, round 19).
      joinPairAdvice(lineitem(s, d), "lineitem", "l_suppkey",
        supplier(s, d), "supplier", "s_suppkey",
        targetBytes = 1L << 20),
      joinPairAdviceMulti(lineitem(s, d), "lineitem", "l_orderkey",
        orders(s, d), "orders", "o_orderkey", Seq(
          PairAdviceKnobs(broadcastBytes = 1L << 18, keyReused = true,
            targetBytes = 1L << 20),
          PairAdviceKnobs(keyReused = true, targetBytes = 1L << 20))),
      joinPairAdvice(events(s, d), "events", "user_id",
        customer(s, d), "customer", "c_custkey",
        broadcastBytes = 1L << 10, targetBytes = 1L << 20))
      .reduce(_.unionAll(_))
      .orderBy(col("fact_rel"), col("keycol"), col("broadcast_bytes"))

  /** Gate key: the `cluster` branch of [[joinPairAdvice]] across four
    * legs chosen to pin its whole decision surface at gate scale —
    * (a) a range-declared numeric-key fact past the broadcast bound
    * flips to `cluster` with the advised file count, (b) the SAME leg
    * without the declaration stays on the hot-key path (rangeQueried
    * is the caller's workload knowledge, not a statistic), (c) a
    * range-declared NON-numeric key (no zone-map span) falls through
    * — min/max file skipping needs an ordered key, (d) `bucket`
    * precedence: an equi-reused key keeps the hash-co-located layout
    * even when also range-declared. */
  def pipelineClusterAdvice(s: SparkSession, d: String): DataFrame =
    Seq(
      // legs (a)+(b) share the (lineitem, l_extendedprice, orders)
      // statistics and differ only in the rangeQueried declaration —
      // one stats pass, two knob rows (joinPairAdviceMulti, round 19)
      joinPairAdviceMulti(lineitem(s, d), "lineitem", "l_extendedprice",
        orders(s, d), "orders", "o_orderkey", Seq(
          PairAdviceKnobs(broadcastBytes = 1L << 18,
            targetBytes = 1L << 20, rangeQueried = true),
          PairAdviceKnobs(broadcastBytes = 1L << 18,
            targetBytes = 1L << 20))),
      joinPairAdvice(documents(s, d), "documents", "source",
        customer(s, d), "customer", "c_custkey",
        broadcastBytes = 1L << 10, targetBytes = 1L << 20,
        rangeQueried = true),
      joinPairAdvice(lineitem(s, d), "lineitem", "l_orderkey",
        orders(s, d), "orders", "o_orderkey",
        broadcastBytes = 1L << 18, keyReused = true,
        targetBytes = 1L << 20, rangeQueried = true))
      .reduce(_.unionAll(_))
      .orderBy(col("fact_rel"), col("keycol"), col("range_queried"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_join_advisor" -> (pipelineJoinAdvisor _),
    "pipeline_pair_advisor" -> (pipelinePairAdvisor _),
    "pipeline_cluster_advice" -> (pipelineClusterAdvice _),
    "pipeline_skew_stats" -> (pipelineSkewStats _),
    "pipeline_column_profile" -> (pipelineColumnProfile _),
    "pipeline_length_percentiles" -> (pipelineLengthPercentiles _),
    "pipeline_merge_upsert" -> (pipelineMergeUpsert _),
    "pipeline_scd2" -> (pipelineScd2 _),
    "pipeline_asof_read" -> ((s: SparkSession, d: String) =>
      pipelineAsofRead(s, d)),
    "pipeline_scd2_lookup" -> (pipelineScd2Lookup _),
    "pipeline_temperature_mixture" -> (pipelineTemperatureMixture _),
    "pipeline_length_gini" -> (pipelineLengthGini _),
    "pipeline_pack_binned" -> (pipelinePackBinned _),
    "pipeline_layout_plan" -> ((s: SparkSession, d: String) =>
      layoutPlan(s, d)),
    "pipeline_budget_cap" -> (pipelineBudgetCap _),
    "pipeline_epoch_plan" -> (pipelineEpochPlan _),
    "pipeline_shuffle" -> (pipelineShuffle _),
    "pipeline_split" -> (pipelineSplit _),
    "pipeline_length_buckets" -> (pipelineLengthBuckets _),
    "pipeline_sample_per_group" -> (pipelineSamplePerGroup _),
    "pipeline_shard" -> (pipelineShard _),
    "pipeline_pack_sequences" -> (pipelinePack _),
    "pipeline_source_stats" -> (pipelineSourceStats _),
    "pipeline_fingerprint" -> (pipelineFingerprint _),
    "pipeline_sample_stratified" -> (pipelineSample _),
    "pipeline_mixture" -> (pipelineMixture _),
    "pipeline_chunk" -> (pipelineChunk _),
    "pipeline_profile" -> (pipelineProfile _),
    "pipeline_interleave" -> ((s: SparkSession, d: String) =>
      pipelineInterleave(s, d))
  )

  /** The pipeline_scd2 change-stack CTE, shared verbatim by the scd2
    * and as-of-read oracles so the history they reconstruct cannot
    * drift apart. */
  private val Scd2StackSql: String =
    """WITH base AS (
      |  SELECT doc_id, CAST(0 AS BIGINT) AS v, 'U' AS op, text
      |  FROM documents
      |), changes AS (
      |  SELECT doc_id, CAST(1 AS BIGINT) AS v, 'U' AS op,
      |    'v1: ' || substr(text, 1, 50) AS text
      |  FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 20000000, CAST(1 AS BIGINT), 'I',
      |    'fresh: ' || substr(text, 1, 40)
      |  FROM documents WHERE doc_id % 10 = 3
      |  UNION ALL
      |  SELECT doc_id, CAST(2 AS BIGINT), 'U',
      |    'v2: ' || substr(text, 1, 30)
      |  FROM documents WHERE doc_id % 20 = 0
      |  UNION ALL
      |  SELECT doc_id, CAST(2 AS BIGINT), 'D', NULL
      |  FROM documents WHERE doc_id % 10 = 7
      |), stacked AS (
      |  SELECT *, lead(v) OVER (PARTITION BY doc_id ORDER BY v)
      |    AS valid_to
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM changes)
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "pipeline_pair_advisor" -> {
      // byte estimators mirrored constant-for-constant from rowWidth
      val widths = Map(
        "events" -> "40 + length(coalesce(event_type, '')) + length(coalesce(props, ''))",
        "lineitem" -> ("76 + length(coalesce(l_returnflag, '')) " +
          "+ length(coalesce(l_linestatus, ''))"),
        "orders" -> "40 + length(coalesce(o_orderstatus, '')) + length(coalesce(o_orderpriority, ''))",
        "supplier" -> "24 + length(coalesce(s_name, ''))",
        "customer" -> ("28 + length(coalesce(c_name, '')) " +
          "+ length(coalesce(c_mktsegment, ''))"))
      def leg(factRel: String, factKey: String, dimRel: String,
              bb: Long, reused: Boolean,
              ranged: Boolean = false): String =
        s"""SELECT '$factRel' AS fact_rel, '$dimRel' AS dim_rel,
           |  '$factKey' AS keycol,
           |  f.fact_rows, f.fact_keys, f.max_n, f.fact_bytes,
           |  f.key_min, f.key_max,
           |  d.dim_rows, d.dim_bytes,
           |  CAST($bb AS BIGINT) AS broadcast_bytes,
           |  ${if (reused) "TRUE" else "FALSE"} AS key_reused,
           |  ${if (ranged) "TRUE" else "FALSE"} AS range_queried
           |FROM (SELECT CAST(sum(n) AS BIGINT) AS fact_rows,
           |        count(*) AS fact_keys, CAST(max(n) AS BIGINT) AS max_n,
           |        CAST(sum(b) AS BIGINT) AS fact_bytes,
           |        min(TRY_CAST(k AS DOUBLE)) AS key_min,
           |        max(TRY_CAST(k AS DOUBLE)) AS key_max
           |      FROM (SELECT $factKey AS k, count(*) AS n,
           |              sum(${widths(factRel)}) AS b
           |            FROM $factRel GROUP BY $factKey)) f
           |CROSS JOIN (SELECT count(*) AS dim_rows,
           |        CAST(sum(${widths(dimRel)}) AS BIGINT) AS dim_bytes
           |      FROM $dimRel) d
           |""".stripMargin
      val u = Seq(
        leg("lineitem", "l_suppkey", "supplier", 1L << 20, reused = false),
        leg("lineitem", "l_orderkey", "orders", 1L << 18, reused = true),
        leg("lineitem", "l_orderkey", "orders", 1L << 20, reused = true),
        leg("events", "user_id", "customer", 1L << 10, reused = false))
        .mkString("UNION ALL\n")
      s"""WITH u AS (
         |$u
         |), v AS (
         |  SELECT *,
         |    greatest(fact_rows // fact_keys, CAST(1 AS BIGINT)) AS avg_f
         |  FROM u
         |), w AS (
         |  SELECT *, (max_n + avg_f - 1) // avg_f AS ratio,
         |    greatest((greatest(fact_bytes, dim_bytes) + 1048575) // 1048576,
         |      CAST(1 AS BIGINT)) AS tf,
         |    CASE WHEN dim_bytes <= broadcast_bytes THEN 'broadcast'
         |         WHEN key_reused AND fact_bytes > broadcast_bytes
         |              AND dim_bytes > broadcast_bytes THEN 'bucket'
         |         WHEN range_queried AND fact_bytes > broadcast_bytes
         |              AND key_min IS NOT NULL THEN 'cluster'
         |         WHEN max_n > avg_f * 4 THEN 'salt'
         |         ELSE 'plain' END AS strategy
         |  FROM v
         |)
         |SELECT fact_rel, dim_rel, keycol, fact_rows, fact_keys, max_n,
         |  fact_bytes, dim_rows, dim_bytes, broadcast_bytes, key_reused,
         |  range_queried, key_min, key_max,
         |  strategy,
         |  CAST(CASE WHEN strategy <> 'salt' THEN 0
         |    ELSE least(64, CASE WHEN (ratio & (ratio - 1)) = 0 THEN ratio
         |      ELSE CAST(1 AS BIGINT) << length(bin(ratio)) END)
         |  END AS BIGINT) AS salt_n,
         |  CAST(CASE WHEN strategy <> 'bucket' THEN 0
         |    ELSE CASE WHEN (tf & (tf - 1)) = 0 THEN tf
         |      ELSE CAST(1 AS BIGINT) << length(bin(tf)) END
         |  END AS BIGINT) AS bucket_n,
         |  CAST(CASE WHEN strategy <> 'cluster' THEN 0
         |    ELSE greatest((fact_bytes + 1048575) // 1048576,
         |      CAST(1 AS BIGINT)) END AS BIGINT) AS cluster_n
         |FROM w ORDER BY fact_rel, keycol, broadcast_bytes""".stripMargin
    },
    "pipeline_cluster_advice" -> {
      // same advisor arithmetic as pipeline_pair_advisor, replayed
      // over the cluster-branch legs (range-declared numeric key,
      // undeclared control, non-numeric key, bucket precedence)
      val widths = Map(
        "lineitem" -> ("76 + length(coalesce(l_returnflag, '')) " +
          "+ length(coalesce(l_linestatus, ''))"),
        "orders" -> "40 + length(coalesce(o_orderstatus, '')) + length(coalesce(o_orderpriority, ''))",
        "documents" -> ("28 + length(coalesce(text, '')) " +
          "+ length(coalesce(lang, '')) + length(coalesce(source, ''))"),
        "customer" -> ("28 + length(coalesce(c_name, '')) " +
          "+ length(coalesce(c_mktsegment, ''))"))
      def leg(factRel: String, factKey: String, dimRel: String,
              bb: Long, reused: Boolean, ranged: Boolean): String =
        s"""SELECT '$factRel' AS fact_rel, '$dimRel' AS dim_rel,
           |  '$factKey' AS keycol,
           |  f.fact_rows, f.fact_keys, f.max_n, f.fact_bytes,
           |  f.key_min, f.key_max,
           |  d.dim_rows, d.dim_bytes,
           |  CAST($bb AS BIGINT) AS broadcast_bytes,
           |  ${if (reused) "TRUE" else "FALSE"} AS key_reused,
           |  ${if (ranged) "TRUE" else "FALSE"} AS range_queried
           |FROM (SELECT CAST(sum(n) AS BIGINT) AS fact_rows,
           |        count(*) AS fact_keys, CAST(max(n) AS BIGINT) AS max_n,
           |        CAST(sum(b) AS BIGINT) AS fact_bytes,
           |        min(TRY_CAST(k AS DOUBLE)) AS key_min,
           |        max(TRY_CAST(k AS DOUBLE)) AS key_max
           |      FROM (SELECT $factKey AS k, count(*) AS n,
           |              sum(${widths(factRel)}) AS b
           |            FROM $factRel GROUP BY $factKey)) f
           |CROSS JOIN (SELECT count(*) AS dim_rows,
           |        CAST(sum(${widths(dimRel)}) AS BIGINT) AS dim_bytes
           |      FROM $dimRel) d
           |""".stripMargin
      val u = Seq(
        leg("lineitem", "l_extendedprice", "orders", 1L << 18,
          reused = false, ranged = true),
        leg("lineitem", "l_extendedprice", "orders", 1L << 18,
          reused = false, ranged = false),
        leg("documents", "source", "customer", 1L << 10,
          reused = false, ranged = true),
        leg("lineitem", "l_orderkey", "orders", 1L << 18,
          reused = true, ranged = true))
        .mkString("UNION ALL\n")
      s"""WITH u AS (
         |$u
         |), v AS (
         |  SELECT *,
         |    greatest(fact_rows // fact_keys, CAST(1 AS BIGINT)) AS avg_f
         |  FROM u
         |), w AS (
         |  SELECT *, (max_n + avg_f - 1) // avg_f AS ratio,
         |    greatest((greatest(fact_bytes, dim_bytes) + 1048575) // 1048576,
         |      CAST(1 AS BIGINT)) AS tf,
         |    CASE WHEN dim_bytes <= broadcast_bytes THEN 'broadcast'
         |         WHEN key_reused AND fact_bytes > broadcast_bytes
         |              AND dim_bytes > broadcast_bytes THEN 'bucket'
         |         WHEN range_queried AND fact_bytes > broadcast_bytes
         |              AND key_min IS NOT NULL THEN 'cluster'
         |         WHEN max_n > avg_f * 4 THEN 'salt'
         |         ELSE 'plain' END AS strategy
         |  FROM v
         |)
         |SELECT fact_rel, dim_rel, keycol, fact_rows, fact_keys, max_n,
         |  fact_bytes, dim_rows, dim_bytes, broadcast_bytes, key_reused,
         |  range_queried, key_min, key_max,
         |  strategy,
         |  CAST(CASE WHEN strategy <> 'salt' THEN 0
         |    ELSE least(64, CASE WHEN (ratio & (ratio - 1)) = 0 THEN ratio
         |      ELSE CAST(1 AS BIGINT) << length(bin(ratio)) END)
         |  END AS BIGINT) AS salt_n,
         |  CAST(CASE WHEN strategy <> 'bucket' THEN 0
         |    ELSE CASE WHEN (tf & (tf - 1)) = 0 THEN tf
         |      ELSE CAST(1 AS BIGINT) << length(bin(tf)) END
         |  END AS BIGINT) AS bucket_n,
         |  CAST(CASE WHEN strategy <> 'cluster' THEN 0
         |    ELSE greatest((fact_bytes + 1048575) // 1048576,
         |      CAST(1 AS BIGINT)) END AS BIGINT) AS cluster_n
         |FROM w ORDER BY fact_rel, keycol, range_queried""".stripMargin
    },
    "pipeline_join_advisor" -> {
      // per-relation byte estimators: constant-for-constant the
      // layoutPlan widths (fixed numerics + length(string)+4)
      val widths = Map(
        "events" -> "40 + length(coalesce(event_type, '')) + length(coalesce(props, ''))",
        "orders" -> "40 + length(coalesce(o_orderstatus, '')) + length(coalesce(o_orderpriority, ''))",
        "lineitem" -> ("76 + length(coalesce(l_returnflag, '')) " +
          "+ length(coalesce(l_linestatus, ''))"),
        "documents" -> ("28 + length(coalesce(text, '')) " +
          "+ length(coalesce(lang, '')) + length(coalesce(source, ''))"))
      def leg(rel: String, keyCol: String): String =
        s"""SELECT '$rel' AS rel, '$keyCol' AS keycol,
           |  CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_keys,
           |  CAST(max(n) AS BIGINT) AS max_n,
           |  CAST(sum(b) AS BIGINT) AS est_bytes
           |FROM (SELECT count(*) AS n,
           |        sum(${widths(rel)}) AS b
           |      FROM $rel GROUP BY $keyCol)
           |""".stripMargin
      val u = Seq(("events", "user_id"), ("events", "event_type"),
        ("orders", "o_custkey"), ("lineitem", "l_suppkey"),
        ("lineitem", "l_partkey"), ("documents", "source"))
        .map { case (r, k) => leg(r, k) }
        .mkString("UNION ALL\n")
      s"""WITH u AS (
         |$u
         |), v AS (
         |  SELECT *, greatest(n_rows // n_keys, CAST(1 AS BIGINT)) AS avg_f
         |  FROM u
         |), w AS (
         |  SELECT *, (max_n + avg_f - 1) // avg_f AS ratio FROM v
         |)
         |SELECT rel, keycol, n_rows, n_keys, max_n, est_bytes,
         |  CASE WHEN est_bytes <= 1048576 THEN 'broadcast'
         |       WHEN max_n > avg_f * 4 THEN 'salt'
         |       ELSE 'plain' END AS strategy,
         |  CAST(CASE
         |    WHEN est_bytes <= 1048576 OR max_n <= avg_f * 4 THEN 0
         |    ELSE least(64, CASE WHEN (ratio & (ratio - 1)) = 0 THEN ratio
         |      ELSE CAST(1 AS BIGINT) << length(bin(ratio)) END)
         |  END AS BIGINT) AS salt_n
         |FROM w ORDER BY rel, keycol""".stripMargin
    },
    "pipeline_length_percentiles" ->
      """SELECT source, count(*) AS n_docs,
        |  round(quantile_cont(n_chars, 0.25), 4) AS p25,
        |  round(quantile_cont(n_chars, 0.5), 4) AS p50,
        |  round(quantile_cont(n_chars, 0.75), 4) AS p75,
        |  round(quantile_cont(n_chars, 0.95), 4) AS p95
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "pipeline_column_profile" -> {
      def leg(rel: String, c: String): String =
        s"""SELECT '$rel' AS rel, '$c' AS colname,
           |  count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(count(*) - count($c) AS DOUBLE) / count(*) AS null_frac,
           |  CAST(count(DISTINCT $c) AS DOUBLE) / count(*) AS distinct_frac
           |FROM $rel""".stripMargin
      val legs =
        Seq("doc_id", "text", "lang", "source", "n_chars")
          .map(leg("documents", _)) ++
        Seq("event_id", "ts", "user_id", "event_type", "value", "props")
          .map(leg("events", _)) ++
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority").map(leg("orders", _))
      legs.mkString("", "\nUNION ALL\n", "\nORDER BY rel, colname")
    },
    "pipeline_skew_stats" -> {
      def leg(rel: String, keyCol: String): String =
        s"""SELECT '$rel' AS rel, '$keyCol' AS keycol,
           |  CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_keys,
           |  CAST(max(n) AS BIGINT) AS max_n,
           |  CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) / count(*) AS avg_n,
           |  (CAST(CAST(max(n) AS BIGINT) AS DOUBLE) * count(*)) /
           |    CAST(sum(n) AS BIGINT) AS skew,
           |  CAST(CAST(max(n) AS BIGINT) AS DOUBLE) /
           |    CAST(sum(n) AS BIGINT) AS top1_share
           |FROM (SELECT count(*) AS n FROM $rel GROUP BY $keyCol)
           |""".stripMargin
      Seq(("events", "user_id"), ("events", "event_type"),
        ("orders", "o_custkey"), ("lineitem", "l_suppkey"),
        ("lineitem", "l_partkey"), ("documents", "source"))
        .map { case (r, k) => leg(r, k) }
        .mkString("", "UNION ALL\n", "ORDER BY rel, keycol")
    },
    "pipeline_length_gini" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
        |      AS x
        |  FROM documents
        |), r AS (
        |  SELECT x, row_number() OVER (ORDER BY x, doc_id) AS rk FROM t
        |)
        |SELECT count(*) AS n_docs, CAST(sum(x) AS BIGINT) AS total_tokens,
        |  (2.0 * CAST(sum(rk * x) AS DOUBLE)
        |     - CAST(count(*) + 1 AS DOUBLE) * CAST(sum(x) AS DOUBLE))
        |    / (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) AS gini
        |FROM r""".stripMargin,

    "pipeline_scd2" ->
      s"""$Scd2StackSql
        |SELECT doc_id, v AS valid_from, valid_to,
        |  valid_to IS NULL AS is_current,
        |  CAST(length(text) AS BIGINT) AS n_chars, md5(text) AS digest
        |FROM stacked WHERE op <> 'D'
        |ORDER BY doc_id, valid_from""".stripMargin,

    // same change-stack CTE as pipeline_scd2 (shared constant — the
    // as-of read must reconstruct THAT history), interval filter at v=1
    "pipeline_asof_read" ->
      s"""$Scd2StackSql
        |SELECT doc_id, v AS version_from,
        |  CAST(length(text) AS BIGINT) AS n_chars, md5(text) AS digest
        |FROM stacked WHERE op <> 'D' AND v <= 1
        |  AND (valid_to IS NULL OR valid_to > 1)
        |ORDER BY doc_id""".stripMargin,

    // the event-time lookup's oracle is the equi-join + interval-filter
    // form (fanout = versions per key) — same rows as the engine's
    // as-of union-and-window pass by construction, since a key's SCD2
    // intervals partition its timeline. Tercile cuts are exact integer
    // seconds: floor-epoch both sides, integer division pinned to
    // span3 = (hi-lo)/3 so c2 = lo + 2*span3 (NOT lo + 2*(hi-lo)/3
    // rounded differently)
    "pipeline_scd2_lookup" ->
      """WITH b AS (
        |  SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS lo,
        |         CAST(floor(epoch(max(ts))) AS BIGINT) AS hi
        |  FROM events
        |), c AS (
        |  SELECT make_timestamp((lo + (hi - lo) // 3) * 1000000) AS c1,
        |         make_timestamp((lo + 2 * ((hi - lo) // 3)) * 1000000) AS c2
        |  FROM b
        |), u AS (
        |  SELECT DISTINCT user_id FROM events
        |), dim AS (
        |  SELECT user_id, 'bronze' AS tier,
        |    TIMESTAMP '1970-01-01 00:00:00' AS valid_from,
        |    CASE WHEN user_id % 3 = 0 THEN c1
        |         WHEN user_id % 10 = 7 THEN c2 END AS valid_to
        |  FROM u CROSS JOIN c
        |  UNION ALL
        |  SELECT user_id, 'silver', c1,
        |    CASE WHEN user_id % 10 = 7 THEN c2
        |         WHEN user_id % 6 = 0 THEN c2 END
        |  FROM u CROSS JOIN c WHERE user_id % 3 = 0
        |  UNION ALL
        |  SELECT user_id, 'gold', c2, NULL
        |  FROM u CROSS JOIN c WHERE user_id % 6 = 0 AND user_id % 10 <> 7
        |)
        |SELECT e.event_id, e.user_id, e.ts, d.tier,
        |  d.valid_from AS tier_since
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |  AND d.valid_from <= e.ts
        |  AND (d.valid_to IS NULL OR e.ts < d.valid_to)
        |ORDER BY e.event_id""".stripMargin,

    // mixCorpus' md5-draw replay with the DERIVED fraction: sqrt of the
    // exact-long ratio is correctly rounded on both engines (scaladoc).
    // The threshold join mirrors the Spark side's null-stratum sentinel
    // via coalesce(lang, chr(0)): a plain `t.lang = thr.lang` would
    // silently DROP null-lang docs that the engine deliberately keeps
    // as their own stratum (and whose token total already feeds tmin in
    // both engines — GROUP BY puts nulls in one group)
    "pipeline_temperature_mixture" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |), tot AS (
        |  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS t
        |  FROM t GROUP BY lang
        |), mn AS (
        |  SELECT min(t) AS tmin FROM tot
        |), f AS (
        |  SELECT lang,
        |    sqrt(CAST(tmin AS DOUBLE) / CAST(t AS DOUBLE)) AS frac
        |  FROM tot CROSS JOIN mn
        |), thr AS (
        |  SELECT lang, frac, CASE WHEN frac >= 1.0 THEN 'g'
        |    ELSE printf('%06x', CAST(floor(frac * 16777216) AS BIGINT))
        |    END AS thr
        |  FROM f
        |)
        |SELECT t.lang, thr.frac AS sample_frac, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM t JOIN thr
        |  ON coalesce(t.lang, chr(0)) = coalesce(thr.lang, chr(0))
        |WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 6) < thr.thr
        |GROUP BY 1, 2 ORDER BY t.lang""".stripMargin,

    "pipeline_merge_upsert" ->
      """WITH c AS (
        |  SELECT doc_id, 'U' AS op,
        |    'edited: ' || substr(text, 1, 50) AS c_text
        |  FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id, 'D', NULL FROM documents WHERE doc_id % 10 = 7
        |  UNION ALL
        |  SELECT doc_id + 10000000, 'I', 'new: ' || substr(text, 1, 40)
        |  FROM documents WHERE doc_id % 10 = 3
        |), m AS (
        |  SELECT coalesce(s.doc_id, c.doc_id) AS doc_id, c.op,
        |    coalesce(c.c_text, s.text) AS text
        |  FROM documents s FULL OUTER JOIN c ON s.doc_id = c.doc_id
        |  WHERE coalesce(c.op, 'K') <> 'D'
        |)
        |SELECT doc_id,
        |  CASE op WHEN 'U' THEN 'update' WHEN 'I' THEN 'insert'
        |    ELSE 'keep' END AS action,
        |  CAST(length(text) AS BIGINT) AS n_chars, md5(text) AS digest
        |FROM m ORDER BY doc_id""".stripMargin,

    "pipeline_pack_binned" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, n_tokens,
        |    row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rank
        |  FROM t
        |)
        |SELECT CAST((rank - 1) % 8 AS INTEGER) AS bin,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM r GROUP BY 1 ORDER BY bin""".stripMargin,

    // width formulas mirror the Spark-side schema estimate exactly:
    // 8 B per bigint/double/timestamp, 4 B per int, len+4 per string
    "pipeline_layout_plan" ->
      """WITH li AS (
        |  SELECT 'lineitem' AS table_name, count(*) AS n_rows,
        |    CAST(sum(76 + length(coalesce(l_returnflag, ''))
        |      + length(coalesce(l_linestatus, ''))) AS BIGINT) AS est_bytes
        |  FROM lineitem
        |), o AS (
        |  SELECT 'orders', count(*),
        |    CAST(sum(40 + length(coalesce(o_orderstatus, ''))
        |      + length(coalesce(o_orderpriority, ''))) AS BIGINT)
        |  FROM orders
        |), e AS (
        |  SELECT 'events', count(*),
        |    CAST(sum(40 + length(coalesce(event_type, ''))
        |      + length(coalesce(props, ''))) AS BIGINT)
        |  FROM events
        |), d AS (
        |  SELECT 'documents', count(*),
        |    CAST(sum(28 + length(coalesce(text, ''))
        |      + length(coalesce(lang, ''))
        |      + length(coalesce(source, ''))) AS BIGINT)
        |  FROM documents
        |), u AS (
        |  SELECT * FROM li UNION ALL SELECT * FROM o
        |  UNION ALL SELECT * FROM e UNION ALL SELECT * FROM d
        |), f AS (
        |  SELECT table_name, n_rows, est_bytes,
        |    greatest(CAST(1 AS BIGINT),
        |      (est_bytes + 1048575) // 1048576) AS target_files
        |  FROM u
        |)
        |SELECT table_name, n_rows, est_bytes, target_files,
        |  CASE WHEN (target_files & (target_files - 1)) = 0
        |    THEN target_files
        |    ELSE CAST(1 AS BIGINT) << length(bin(target_files)) END
        |    AS bucket_count
        |FROM f ORDER BY table_name""".stripMargin,

    "pipeline_budget_cap" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |)
        |SELECT doc_id, source, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    - n_tokens < 1000 AS admitted
        |FROM t ORDER BY doc_id""".stripMargin,

    "pipeline_epoch_plan" ->
      """WITH e AS (
        |  SELECT doc_id, unnest(generate_series(0, 2)) AS epoch
        |  FROM documents
        |), k AS (
        |  SELECT doc_id, CAST(epoch AS INTEGER) AS epoch,
        |    md5(CAST(doc_id AS VARCHAR) || ':42:' ||
        |      CAST(epoch AS VARCHAR)) AS h
        |  FROM e
        |)
        |SELECT epoch, doc_id,
        |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id)
        |    AS BIGINT) AS pos
        |FROM k ORDER BY epoch, pos""".stripMargin,

    // stratified sampling is a deterministic md5-threshold draw since
    // round 12, so it replays exactly: per-stratum thresholds are
    // floor(frac·2^24) in hex — 800000 = 0.5, 400000 = 0.25,
    // 199999 = floor(0.1·2^24) — same values the Scala side formats
    "pipeline_sample_stratified" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    substr(md5(CAST(doc_id AS VARCHAR) || ':strat:42'), 1, 6) AS h
        |  FROM documents
        |)
        |SELECT lang, count(*) AS n_sampled FROM t
        |WHERE (lang = 'de' AND h < '400000')
        |   OR (lang = 'en' AND h < '800000')
        |   OR (lang = 'es' AND h < '400000')
        |   OR (lang = 'fr' AND h < '400000')
        |   OR (lang = 'zh' AND h < '199999')
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // split thresholds are literals (0.9/0.95 of the 24-bit space):
    // e66666 = floor(0.9·2^24), f33333 = floor(0.95·2^24) — same
    // values the Scala side formats
    "pipeline_split" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 6) AS h
        |  FROM documents
        |)
        |SELECT doc_id, lang,
        |  CASE WHEN h < 'e66666' THEN 'train'
        |       WHEN h < 'f33333' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM t ORDER BY doc_id""".stripMargin,

    // DuckDB replays the mixture draw decision-for-decision: same
    // totals→budget→fraction arithmetic (doubles, same association
    // order), same md5 hex-prefix threshold compare.
    "pipeline_mixture" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents WHERE lang IN ('en', 'de', 'fr', 'zh')
        |), tot AS (
        |  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS t
        |  FROM t GROUP BY lang
        |), w AS (
        |  SELECT lang, wt / (0.5 + 0.2 + 0.2 + 0.1) AS nw
        |  FROM (VALUES ('en', 0.5), ('de', 0.2), ('fr', 0.2), ('zh', 0.1))
        |    AS v(lang, wt)
        |), b AS (
        |  SELECT min(CAST(t AS DOUBLE) / nw) AS budget
        |  FROM tot JOIN w USING (lang)
        |), f AS (
        |  SELECT lang, least(nw * budget / t, 1.0) AS frac
        |  FROM tot JOIN w USING (lang) CROSS JOIN b
        |), thr AS (
        |  SELECT lang, CASE WHEN frac >= 1.0 THEN 'g'
        |    ELSE printf('%06x', CAST(floor(frac * 16777216) AS BIGINT))
        |    END AS thr
        |  FROM f
        |)
        |SELECT t.lang, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM t JOIN thr ON t.lang = thr.lang
        |WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 6) < thr.thr
        |GROUP BY t.lang ORDER BY t.lang""".stripMargin,

    // DuckDB replays the md5 permutation exactly; the oracle's single
    // global window IS the semantics the bucketed two-pass must equal.
    "pipeline_shuffle" ->
      """WITH t AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS h
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT)
        |    AS shuffle_pos
        |FROM t ORDER BY shuffle_pos""".stripMargin,

    "pipeline_length_buckets" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, n_tokens, greatest(n_tokens, 1) AS mm FROM t
        |), b AS (
        |  SELECT doc_id, n_tokens,
        |    CASE WHEN (mm & (mm - 1)) = 0 THEN mm
        |         ELSE CAST(1 AS BIGINT) << len(bin(mm)) END AS bucket_cap
        |  FROM m
        |)
        |SELECT bucket_cap, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(bucket_cap - n_tokens) AS BIGINT) AS pad_waste,
        |  round(CAST(sum(bucket_cap - n_tokens) AS DOUBLE) /
        |    (sum(bucket_cap - n_tokens) + sum(n_tokens)), 6) AS waste_share
        |FROM b GROUP BY bucket_cap ORDER BY bucket_cap""".stripMargin,

    "pipeline_sample_per_group" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    md5(CAST(doc_id AS VARCHAR) || ':42') AS h
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
        |      AS INT) AS rk
        |  FROM t
        |)
        |SELECT doc_id, lang, rk FROM r WHERE rk <= 20
        |ORDER BY lang, rk""".stripMargin,
    "pipeline_shard" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
        |  FROM t
        |)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(floor((cum - n_tokens) / $TokenBudget.0) AS BIGINT) AS shard
        |FROM c ORDER BY lang, doc_id""".stripMargin,

    "pipeline_pack_sequences" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
        |  FROM t
        |), s AS (
        |  SELECT doc_id, lang, n_tokens, cum,
        |    CAST(floor((cum - n_tokens) / $TokenBudget.0) AS BIGINT) AS seq_id
        |  FROM c
        |)
        |SELECT doc_id, lang, n_tokens, seq_id,
        |  CAST(cum - n_tokens - seq_id * $TokenBudget AS BIGINT) AS tok_offset
        |FROM s ORDER BY lang, doc_id""".stripMargin,

    "pipeline_source_stats" ->
      """WITH t AS (
        |  SELECT source, lang,
        |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |), g AS (
        |  SELECT source, lang, count(*) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |  FROM t GROUP BY 1, 2
        |)
        |SELECT source, lang, n_docs, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6)
        |    AS token_share
        |FROM g ORDER BY source, lang""".stripMargin,

    // identical tokenization (\s+ split), chunk-count arithmetic
    // ((max(n-128,0)+95) div 96 + 1), and 1-based inclusive slicing on
    // both sides, so the chunk text itself hash-checks
    "pipeline_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks
        |  FROM documents
        |), n AS (
        |  SELECT doc_id, toks,
        |    CAST(floor((greatest(len(toks) - 128, 0) + 95) / 96.0) AS INT)
        |      + 1 AS n_chunks
        |  FROM t
        |), c AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, n_chunks - 1)) AS chunk_id
        |  FROM n
        |)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  CAST(len(list_slice(toks, chunk_id*96 + 1, chunk_id*96 + 128))
        |    AS INT) AS n_tokens,
        |  array_to_string(list_slice(toks, chunk_id*96 + 1, chunk_id*96 + 128),
        |    ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "pipeline_fingerprint" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_distinct_texts,
        |  CAST(sum(CAST(length(text) AS DECIMAL(18,0))) AS BIGINT)
        |    AS total_chars,
        |  min(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT))
        |    AS min_digest,
        |  max(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT))
        |    AS max_digest
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "pipeline_profile" ->
      """WITH a AS (
        |  SELECT count(*) AS n_rows,
        |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_doc_id,
        |    count(DISTINCT doc_id) AS nd_doc_id,
        |    CAST(min(doc_id) AS DOUBLE) AS mn_doc_id,
        |    CAST(max(doc_id) AS DOUBLE) AS mx_doc_id,
        |    CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_text,
        |    count(DISTINCT md5(text)) AS nd_text,
        |    CAST(min(length(text)) AS DOUBLE) AS mn_text,
        |    CAST(max(length(text)) AS DOUBLE) AS mx_text,
        |    CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_lang,
        |    count(DISTINCT md5(lang)) AS nd_lang,
        |    CAST(min(length(lang)) AS DOUBLE) AS mn_lang,
        |    CAST(max(length(lang)) AS DOUBLE) AS mx_lang,
        |    CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_source,
        |    count(DISTINCT md5(source)) AS nd_source,
        |    CAST(min(length(source)) AS DOUBLE) AS mn_source,
        |    CAST(max(length(source)) AS DOUBLE) AS mx_source,
        |    CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_n_chars,
        |    count(DISTINCT n_chars) AS nd_n_chars,
        |    CAST(min(n_chars) AS DOUBLE) AS mn_n_chars,
        |    CAST(max(n_chars) AS DOUBLE) AS mx_n_chars
        |  FROM documents
        |)
        |SELECT 'doc_id' AS column_name, n_rows, nn_doc_id AS n_nulls,
        |  nd_doc_id AS n_distinct, mn_doc_id AS min_v, mx_doc_id AS max_v
        |FROM a
        |UNION ALL SELECT 'text', n_rows, nn_text, nd_text, mn_text, mx_text
        |FROM a
        |UNION ALL SELECT 'lang', n_rows, nn_lang, nd_lang, mn_lang, mx_lang
        |FROM a
        |UNION ALL SELECT 'source', n_rows, nn_source, nd_source, mn_source,
        |  mx_source FROM a
        |UNION ALL SELECT 'n_chars', n_rows, nn_n_chars, nd_n_chars,
        |  mn_n_chars, mx_n_chars FROM a
        |ORDER BY column_name""".stripMargin,

    // portability: no correlated scalar aggregate subquery (the most
    // decorrelation-sensitive construct across DuckDB builds — the
    // round-10 driver/judge checker divergence) — the per-round base
    // Σ_s min(r, |s|) comes from an uncorrelated DISTINCT-r × sizes
    // cross join; every sum is cast to BIGINT (DuckDB sum → HUGEINT,
    // which pandas renders as float64 and the driver's value hash
    // then diverges from Spark's int64)
    "pipeline_interleave" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    md5(CAST(doc_id AS VARCHAR) || ':42') AS h
        |  FROM documents
        |), ranked AS (
        |  SELECT doc_id, source, h,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
        |      - 1 AS BIGINT) AS r
        |  FROM t
        |), sz AS (SELECT source, count(*) AS sz FROM documents GROUP BY source),
        |bases AS (
        |  SELECT rr.r, CAST(sum(least(rr.r, sz.sz)) AS BIGINT) AS base
        |  FROM (SELECT DISTINCT r FROM ranked) rr CROSS JOIN sz
        |  GROUP BY rr.r
        |)
        |SELECT ranked.doc_id, ranked.source,
        |  CAST(bases.base
        |    + row_number() OVER (PARTITION BY ranked.r
        |        ORDER BY ranked.source, ranked.doc_id) AS BIGINT) AS pos
        |FROM ranked JOIN bases ON ranked.r = bases.r
        |ORDER BY ranked.doc_id""".stripMargin
  )
}
