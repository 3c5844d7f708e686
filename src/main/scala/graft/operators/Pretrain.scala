package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** Pretraining-corpus selection operators (SURVEY.md §2.C): importance
  * weighting (DSIR), perplexity bucketing (CCNet), a bigram language
  * model, and a character-entropy gibberish signal. These are the
  * data-SELECTION layer that sits on top of the dedup/quality gates —
  * every one keeps the 100 TB shape of its family: feature streams
  * reduce to fixed-size hashed statistics before any exchange, scoring
  * passes are map-only against broadcast tables, and float outputs
  * follow the repo-wide round-then-decimal-sum determinism discipline
  * so the DuckDB oracle matches bit-for-bit.
  */
object Pretrain {

  /** See [[Lineage.truncate]] — reliable checkpoint when a dir is
    * configured (production), localCheckpoint otherwise (local). */
  private def truncateLineage(df: DataFrame): DataFrame =
    Lineage.truncate(df)

  /** DSIR importance weight per document (Xie et al. 2023,
    * arXiv:2302.03169 "Data Selection for Language Models via
    * Importance Resampling"): score raw docs by how much their hashed
    * n-gram feature distribution looks like a TARGET corpus (here: the
    * `lang = 'en'` slice stands in for the curated target).
    *
    * log w(doc) = Σ_grams log( p_target(bucket) / p_raw(bucket) ),
    * with additive-α smoothed bucket probabilities over B=8192 hashed
    * bigram buckets.
    *
    * Scale shape — the whole point of DSIR's hashing trick: the bigram
    * stream reduces to a bucket id map-only on the scan (md5 → 24-bit →
    * mod B, replayed exactly by the oracle); raw and target counts come
    * out of ONE ≤B-row aggregation pass (count + target-indicator sum —
    * partial agg shuffles B rows per partition, not the corpus), and the
    * grand totals reduce that table, never the corpus, so the stats
    * phase is exactly one scan; the log-ratio table is ≤B rows, BROADCAST
    * onto the bucket stream, so the scoring pass never shuffles tokens —
    * per-doc weights come out of one partial+final agg keyed by doc_id.
    * At 100 TB the only corpus-wide exchange is the per-doc agg itself.
    * Docs with <2 tokens have no bigram features and are absent (they
    * carry no evidence either way; the oracle mirrors this).
    *
    * Determinism: per-bucket log-ratios round to 9 dp and sum as
    * DECIMAL per doc (order-free), final weight rounds to 6 dp. */
  def pipelineDsirWeight(s: SparkSession, d: String): DataFrame =
    dsirWeight(documents(s, d))

  def dsirWeight(docs: DataFrame, buckets: Int = 8192,
                 alpha: Double = 0.5, targetLang: String = "en",
                 hashMode: String = "md5"): DataFrame =
    dsirLogweights(docs, buckets, alpha, targetLang, hashMode)
      .select(col("doc_id"), col("n_grams"),
        // round the DECIMAL sum, then cast — no trailing division here,
        // so double-first rounding would sit exactly on 6 dp boundaries
        round(col("lw"), 6).cast(DoubleType).as("dsir_logweight"))
      .orderBy(col("doc_id"))

  /** Shared DSIR kernel: per-doc EXACT decimal log-weight `lw` (sum of
    * 9 dp-rounded bucket log-ratios) + bigram count. [[dsirWeight]]
    * reports it; [[dsirSample]] draws the resampled corpus from it.
    *
    * Round 19 (guide §1.2/§2.3): fit and score now share ONE reduced
    * (doc_id, lang, b, k) table whose exchange Catalyst deduplicates
    * (ReusedExchange — the fit subtree lives under the score side's
    * broadcast, same physical exchange), so the corpus is tokenized
    * and md5-bucketed ONCE where the old fit-then-score pair paid the
    * bigram kernel twice. Counts are identical: the fit re-aggregates
    * k by bucket, the score weighs each bucket's w by k (decimal ×
    * long is exact at scale 9, so sum(w·k) ≡ the old sum over k
    * identical w rows). */
  def dsirLogweights(docs: DataFrame, buckets: Int = 8192,
                     alpha: Double = 0.5,
                     targetLang: String = "en",
                     hashMode: String = "md5"): DataFrame = {
    val red = reducedBucketCounts(docs, buckets, hashMode)
    scoreReduced(red,
      fitFromReduced(red, docs.sparkSession, buckets, alpha, targetLang))
  }

  /** Score docs against an already-FITTED weight table — the online
    * half of the fit/score split. The weight table is the persisted
    * DSIR "model" (≤B rows — write it once, broadcast it forever);
    * scoring is one corpus pass + a broadcast join + the per-doc agg,
    * which is what lets a streaming gate (EventStreams.dsirGateStream)
    * admit micro-batches against weights fitted offline. */
  def scoreDsir(docs: DataFrame, weights: DataFrame,
                buckets: Int = 8192, hashMode: String = "md5"): DataFrame =
    scoreReduced(reducedBucketCounts(docs, buckets, hashMode), weights)

  /** The shared pre-reduction: per-(doc, lang, bucket) bigram counts —
    * the one table both the fit and the score aggregate from. Partial
    * agg collapses the bigram stream map-side; the bigram kernel (and
    * its md5 in gate mode) runs below this exchange, i.e. once. */
  private def reducedBucketCounts(docs: DataFrame, buckets: Int,
                                  hashMode: String): DataFrame =
    bucketStream(docs, buckets, hashMode)
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("k"))

  private def scoreReduced(red: DataFrame, weights: DataFrame): DataFrame =
    red.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      // k casts to DECIMAL(9,0) so w·k is DECIMAL(38,9) EXACTLY at the
      // precision cap — a bare long operand is DECIMAL(20,0), pushing
      // the product past 38 and silently dropping scale 9 → 6 (observed
      // as 1-ulp oracle drift at the 6 dp rounding boundary). k is a
      // per-(doc, bucket) bigram count, bounded far under 1e9.
      .agg(sum(col("k")).as("n_grams"),
        sum(col("w") * col("k").cast(DecimalType(9, 0))).as("lw"))

  /** The hashed-bigram feature stream: (doc_id, lang, bucket). */
  private def bucketStream(docs: DataFrame, buckets: Int,
                           hashMode: String = "md5"): DataFrame = {
    // bucket hash: md5 hex prefix for the oracle-replayable gate;
    // xxhash64+pmod (one codegen'd hash, no hex decode) in production
    val bCol = hashMode match {
      case "md5" =>
        conv(substring(md5(col("g")), 1, 6), 16, 10).cast(LongType) % buckets
      case "xxhash64" => pmod(xxhash64(col("g")), lit(buckets.toLong))
      case other => throw new IllegalArgumentException(
        s"unknown hash mode '$other' — expected md5 or xxhash64")
    }
    docs
      .select(col("doc_id"), col("lang"),
        split(lower(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"), col("lang"), explode(expr(
        "filter(transform(ws, (w, i) -> IF(i = 0, NULL, " +
          "concat(element_at(ws, i), ' ', w))), x -> x IS NOT NULL)")).as("g"))
      .select(col("doc_id"), col("lang"), bCol.as("b"))
  }

  /** Fit the DSIR model: the ≤B-row per-bucket log-ratio table.
    * Persist it with `.write.parquet(dir)` — that parquet IS the model
    * a streaming gate scores against. */
  def fitDsirWeights(docs: DataFrame, buckets: Int = 8192,
                     alpha: Double = 0.5,
                     targetLang: String = "en",
                     hashMode: String = "md5"): DataFrame =
    fitFromReduced(reducedBucketCounts(docs, buckets, hashMode),
      docs.sparkSession, buckets, alpha, targetLang)

  private def fitFromReduced(red: DataFrame, s: SparkSession,
                             buckets: Int, alpha: Double,
                             targetLang: String): DataFrame = {
    // raw + target counts in ONE aggregation pass (count + indicator
    // sum) — three separate aggs would tokenize the corpus three times;
    // the grand totals then reduce the ≤B-row count table, not the
    // corpus, so the whole stats phase is a single corpus scan.
    // The fitted model carries ALL B bucket rows — buckets unseen at
    // fit time get cr=ct=0 and smooth to ln((tr+αB)/(tt+αB)), so a
    // streaming gate scoring NOVEL content (dsirGateStream's inner
    // join on b) applies DSIR's alpha-smoothed unseen-bucket ratio
    // instead of silently dropping the evidence. Batch fit+score on
    // the same corpus is unchanged: every scored bigram's bucket has
    // cr ≥ 1 by construction, so the zero rows never join.
    val seen = red.groupBy(col("b")).agg(sum(col("k")).as("cr"),
      sum(when(col("lang") === targetLang, col("k")).otherwise(0L))
        .as("ct"))
    val cnt = s.range(buckets).toDF("b")
      .join(seen, Seq("b"), "left")
      .select(col("b"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    // grand totals via a global window over the ≤B-row count table —
    // one PARTITION of ≤8192 rows by construction. A separate
    // cnt.agg(...) branch looks cheaper but rebuilds the lineage, and
    // AQE's exchange reuse does not unify the rebuilt stats stage
    // (verified: two live corpus scans in the executed plan), so the
    // window is what actually keeps the stats phase at one scan.
    val tot = Window.partitionBy(lit(1))
    cnt
      .withColumn("tr", sum(col("cr")).over(tot))
      .withColumn("tt", sum(col("ct")).over(tot))
      .select(col("b"),
        round(log(
          ((col("ct") + alpha) / (col("tt") + alpha * buckets)) /
            ((col("cr") + alpha) / (col("tr") + alpha * buckets))), 9)
          .cast(DecimalType(28, 9)).as("w"))
  }

  /** DSIR importance RESAMPLING — the step the weights exist for (Xie
    * et al. 2023 §3: sample k docs without replacement ∝ exp(log w)).
    * Implemented as Gumbel-top-k (Vieira 2014): key_i = log w_i + G_i
    * with G_i = -ln(-ln(u_i)) and u_i a seeded md5 uniform — the top-k
    * keys ARE a weighted sample without replacement, drawn in one
    * TakeOrdered pass with no sequential draws and no driver state.
    * u_i = (h24 + 0.5) / 2^24 is exact in binary (power-of-two divisor),
    * so the oracle replays the draw decision-for-decision. */
  def pipelineDsirSample(s: SparkSession, d: String): DataFrame =
    dsirSample(documents(s, d))

  def dsirSample(docs: DataFrame, k: Int = 500, seed: Int = 42,
                 hashMode: String = "md5"): DataFrame = {
    // u_i: 24 uniform bits over a power-of-two divisor in both modes,
    // so the draw is exact in binary either way
    val u = hashMode match {
      case "md5" =>
        (conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":" + seed))), 1, 6), 16, 10).cast(DoubleType) + 0.5) /
          16777216.0
      case "xxhash64" =>
        (pmod(xxhash64(col("doc_id").cast("string"), lit(seed)),
          lit(16777216L)).cast(DoubleType) + 0.5) / 16777216.0
      case other => throw new IllegalArgumentException(
        s"unknown hash mode '$other' — expected md5 or xxhash64")
    }
    dsirLogweights(docs, hashMode = hashMode)
      .select(col("doc_id"),
        (col("lw").cast(DoubleType) - log(-log(u))).as("key"))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("key"), 6).as("sample_key"))
      .orderBy(col("doc_id"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020,
    * arXiv:1911.00359): score every doc with the in-engine unigram LM
    * ([[TextAnalysis.unigramLogprobSmoothed]] — the broadcast-head
    * shape stands in for CCNet's KenLM), then split each language into
    * head/middle/tail TERCILES of the score — the standard
    * keep-the-head curation gate.
    *
    * Scale shape: scoring is the smoothed-logprob pass (corpus tokens
    * never shuffle); the scored (doc_id, lang, mean_logprob)
    * projection — ~24 B/doc — checkpoints once ([[Lineage.truncate]])
    * so both consumers
    * read the materialized rows instead of re-running the scoring
    * pipeline (exchange reuse does not unify the rebuilt stages).
    * Tercile boundaries are EXACT but never hold a corpus-sized
    * partition: scores reduce to per-(lang, value) frequencies first —
    * mean_logprob rounds to 6 dp, so the frequency table is bounded by
    * the score grid (≤ ~10⁷ rows/lang at ANY corpus size), then one
    * weighted `percentile(score, q, cnt)` per lang reproduces the
    * whole-corpus percentile exactly (identical value→count state).
    * The ≤#langs boundary table broadcast-joins back. The round-10
    * review's corpus-sized `Window.partitionBy(lang)` is gone —
    * PlanRegressionSpec pins the window-free shape. */
  def qualityCcnetBucket(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val scored = TextAnalysis.unigramLogprobSmoothed(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .transform(truncateLineage)
    val freq = scored.groupBy(col("lang"), col("mean_logprob"))
      .agg(count(lit(1)).as("cnt"))
    // boundaries round to the SCORES' own 6-dp precision: the two
    // engines' continuous-quantile interpolations differ by 1 ulp when
    // the rank position lands ~integer, and a 6-dp score EXACTLY AT
    // the tercile then flips head/middle across engines (first seen at
    // the round-17 sf1 sweep, 3 boundary docs). Rounded to the score
    // grid, both engines compare against the identical threshold.
    val bounds = freq.groupBy(col("lang")).agg(
      round(expr("percentile(mean_logprob, 0.3333333333333333D, cnt)"), 6)
        .as("q1"),
      round(expr("percentile(mean_logprob, 0.6666666666666666D, cnt)"), 6)
        .as("q2"))
    scored
      .join(broadcast(bounds), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("mean_logprob"),
        when(col("mean_logprob") >= col("q2"), "head")
          .when(col("mean_logprob") >= col("q1"), "middle")
          .otherwise("tail").as("ppl_bucket"))
      .orderBy(col("doc_id"))
  }

  /** Conditional bigram language model: mean log p(w_i | w_{i-1}) per
    * doc under the corpus MLE bigram distribution — one order up from
    * text_unigram_logprob, and the signal that catches
    * locally-plausible-but-incoherent token soup a unigram model scores
    * as fluent.
    *
    * Scale shape mirrors the unigram path: bigrams hash to 8 bytes
    * map-only (xxhash64 chains (prev, cur) — no separator ambiguity),
    * the numerator/denominator count tables shuffle hashes with
    * map-side combine, and the scoring join carries (doc, 8-byte key)
    * rows. log p = ln(c(w1,w2) / c(w1,·)) where the denominator is the
    * bigram-PREFIX count from the same stream (so first/last-token
    * boundary effects cancel exactly). Docs with <2 tokens are absent
    * (no bigram evidence; oracle mirrors). Per-pair scores round to
    * 9 dp and sum as DECIMAL. */
  def textBigramLogprob(s: SparkSession, d: String): DataFrame =
    bigramLogprob(documents(s, d))

  def bigramLogprob(docs: DataFrame): DataFrame = {
    val bg = docs
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"), explode(expr(
        "filter(transform(ws, (w, i) -> IF(i = 0, NULL, " +
          "struct(element_at(ws, i) AS p, w AS c))), x -> x IS NOT NULL)")).as("t"))
      .select(col("doc_id"),
        xxhash64(col("t.p")).as("hp"),
        xxhash64(col("t.p"), col("t.c")).as("hb"))
    // one corpus-wide count keyed by (prefix, bigram); the prefix
    // totals come from a window over the vocab-sized pair table (same
    // lineage — a separate groupBy(hp) branch would re-tokenize the
    // corpus, AQE exchange reuse does not unify the rebuilt stage)
    val pairCnt = bg.groupBy(col("hp"), col("hb")).agg(count(lit(1)).as("cb"))
      .withColumn("cp", sum(col("cb")).over(Window.partitionBy(col("hp"))))
    bg.join(pairCnt, Seq("hp", "hb"))
      .select(col("doc_id"),
        round(log(col("cb") / col("cp")), 9).cast(DecimalType(28, 9)).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp")).cast(DoubleType) / count(lit(1)), 6)
          .as("mean_logprob"))
      .orderBy(col("doc_id"))
  }

  /** Character-entropy gibberish signal: Shannon entropy (bits) of each
    * doc's printable-ASCII byte distribution via the native
    * [[graft.functions.CharEntropy]] codegen kernel — base64/minified
    * junk scores near 6 bits, natural text ~4-4.5, degenerate repetition
    * near 0. Map-only over the scan: one histogram pass per row inside
    * whole-stage codegen, no explode, no shuffle except the final sort —
    * the cheapest-possible 100 TB quality signal. */
  def textCharEntropy(s: SparkSession, d: String): DataFrame = {
    import graft.functions.CharEntropy.charEntropy
    val st = charEntropy(col("text"))
    documents(s, d)
      // round the DECIMAL (exact HALF_UP, both engines), THEN cast:
      // the term sum has no trailing division to scramble it off 6 dp
      // boundaries, so double-first rounding would flake ~1e-3/doc
      .select(col("doc_id"),
        st.getField("n_printable").as("n_printable"),
        round(st.getField("ent"), 6).cast(DoubleType).as("char_entropy"))
      .orderBy(col("doc_id"))
  }

  /** BPE tokenizer fit (Sennrich et al. 2016, arXiv:1508.07909): learn
    * the first `nMerges` byte-pair merges of the corpus — the
    * tokenizer-training step of a pretraining pipeline, run on the
    * engine instead of a single machine.
    *
    * Standard-practice shape: the corpus reduces ONCE to the distinct
    * word-frequency table (the only corpus-wide shuffle — BPE statistics
    * are identical on (word, count) pairs); every merge iteration then
    * runs on vocab-sized data (pair explode + argmax + map-only merge
    * rewrite), so at 100 TB each of the ~30k production iterations
    * touches ~10⁸ vocab rows, never the corpus. The argmax draw is one
    * collect()ed row per step (bounded driver state, deterministic
    * tie-break count desc → pair asc). The merge rewrite is a greedy
    * leftmost `aggregate` HOF pass — "aaa" + (a,a) → [aa, a], exactly
    * reference BPE. Stops early when no pair repeats. */
  def pipelineBpeMerges(s: SparkSession, d: String): DataFrame =
    bpeMerges(documents(s, d), s)

  private def lit0(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** One greedy-leftmost merge pass over a `syms: array<string>` column:
    * every adjacent (a, b) becomes the single symbol a+b, scanning left
    * to right — "aaa" + (a,a) → [aa, a], exactly reference BPE. Shared
    * verbatim by the FIT (vocab rewrite per learned merge) and the
    * ENCODER ([[bpeEncodeVocab]]), so encode-parity with the fit's own
    * internal state holds by construction. Map-only codegen'd HOF. */
  private def mergePass(df: DataFrame, a: String, b: String): DataFrame =
    df.withColumn("syms", expr(
      s"""aggregate(syms, CAST(array() AS array<string>), (acc, x) ->
         |IF(size(acc) > 0 AND element_at(acc, -1) = ${lit0(a)}
         |     AND x = ${lit0(b)},
         |   concat(slice(acc, 1, size(acc) - 1), array(${lit0(a + b)})),
         |   concat(acc, array(x))))""".stripMargin))

  /** Whitespace word split shared by fit, encode and the whitespace
    * token counters — lowercased, empty tokens dropped. */
  private def bpeWords(text: org.apache.spark.sql.Column) =
    filter(split(lower(text), "\\s+"), w => length(w) > 0)

  /** A word as its initial character symbols. (?=.) forbids the
    * end-of-string split point — Spark split keeps trailing empties
    * (limit -1), which would plant a phantom "" symbol. */
  private def charSyms(w: org.apache.spark.sql.Column) =
    split(w, "(?!^)(?=.)")

  def bpeMerges(docs: DataFrame, spark: SparkSession,
                nMerges: Int = 12): DataFrame = {
    import spark.implicits._
    // superseded every-8-step checkpoints delete themselves (Chain):
    // a ~30k-iteration production fit would otherwise stack ~4k full
    // vocab copies on the checkpoint FS
    val fitChain = new Lineage.Chain(keep = 2)
    var vocab = docs
      .select(explode(bpeWords(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .select(charSyms(col("w")).as("syms"), col("cnt"))
      .cache()
    val merges = collection.mutable.Buffer.empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val top = vocab
        .select(explode(expr(
          "zip_with(slice(syms, 1, size(syms) - 1), " +
            "slice(syms, 2, size(syms) - 1), " +
            "(a, b) -> struct(a AS a, b AS b))")).as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .where(col("c") > 1)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((step, a, b, c))
        val old = vocab
        vocab = mergePass(old, a, b).cache()
        vocab.count() // materialize before dropping the parent cache
        old.unpersist()
        // truncate lineage periodically: each merge stacks one
        // aggregate-HOF withColumn on the logical plan, and cache only
        // substitutes InMemoryRelation at PHYSICAL planning — without
        // truncation, analyzer/optimizer cost grows linearly and the
        // docstring's ~30k production iterations hit the classic
        // iterative-lineage blowup. truncateLineage materializes the
        // vocab-sized table and restarts the plan from it (reliable
        // checkpoint when a dir is configured, local otherwise).
        if (step % 8 == 0) {
          val cp = fitChain.truncate(vocab)
          vocab.unpersist()
          vocab = cp
        }
        step += 1
      }
    }
    vocab.unpersist()
    merges.toSeq.toDF("step", "left", "right", "freq")
  }

  /** Persist a fitted merge table ([[bpeMerges]] output) — that table
    * IS the tokenizer (the DSIR-weights / ANN-quantizer discipline:
    * refit offline, swap by directory). */
  def saveBpeModel(merges: DataFrame, dir: String): Unit =
    merges.write.mode("overwrite").parquet(dir)

  /** Load the merge list in rank order. The collect is bounded by the
    * MODEL size (≤ nMerges rows — ~30k in production, the PQ-LUT
    * discipline), never the corpus. */
  def loadBpeMerges(s: SparkSession, dir: String): Seq[(String, String)] =
    s.read.parquet(dir).orderBy(col("step"))
      .select(col("left"), col("right"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))

  /** ENCODE a distinct-word table against a fitted merge list — the
    * other half of the tokenizer loop: [[bpeMerges]] FITS, this
    * APPLIES. Each word splits to character symbols, then every merge
    * runs as one greedy-leftmost [[mergePass]] in learned rank order —
    * byte-for-byte the rewrite the fit runs on its own vocab, so
    * encoding the fit corpus reproduces the fit's final vocab state
    * exactly (PretrainSpec pins this against an independent reference
    * implementation). A single pass per merge IS that merge's fixpoint
    * under greedy-leftmost: merging (a,b) into the fresh symbol a+b can
    * never create a new (a,b) adjacency.
    *
    * Scale shape: all passes run over the DISTINCT-WORD table (the
    * same vocab-sized frame the fit iterates — at 100 TB ~10⁸ rows,
    * never the corpus), map-only between lineage truncations every 64
    * merges (the fit's iterative-lineage discipline; a 12-merge gate
    * model stays one lazy plan). */
  def bpeEncodeVocab(words: DataFrame,
                     merges: Seq[(String, String)]): DataFrame = {
    val chain = new Lineage.Chain(keep = 2)
    var vocab = words.select(col("w"), charSyms(col("w")).as("syms"))
    var step = 1
    for ((a, b) <- merges) {
      vocab = mergePass(vocab, a, b)
      if (step % 64 == 0) vocab = chain.truncate(vocab)
      step += 1
    }
    vocab
  }

  /** Token-id space: a single-character symbol is its code point; the
    * output of merge step k is `BpeMergeIdBase + k` — above the
    * Unicode range (0x10FFFF), so char ids and merge ids can never
    * collide. Deterministic from the model alone; shared with the
    * native kernel ([[graft.functions.BpeCodec]]). */
  val BpeMergeIdBase: Int = graft.functions.BpeCodec.MergeIdBase

  /** (w, n_sub, ids): each distinct word's BPE token count and token
    * ids — the DECLARATIVE encode path ([[bpeEncodeVocab]] + a
    * broadcast join on the ≤nMerges-row symbol table; single chars
    * are their code point via ascii()). The corpus operators run the
    * native kernel instead ([[bpeEncode]]); this path is the
    * byte-for-byte parity oracle PretrainSpec checks the kernel
    * against, built verbatim from the fit's own rewrite. */
  def bpeEncodeVocabIds(words: DataFrame, merges: Seq[(String, String)],
                        spark: SparkSession): DataFrame = {
    import spark.implicits._
    // two different merges CAN produce the same output string ((a,ab)
    // and (aa,b) both yield "aab") — the id table must be unique per
    // symbol or the join below would duplicate vocab rows; earliest
    // step wins, deterministically
    val symTable = merges.zipWithIndex
      .map { case ((a, b), i) => (a + b, BpeMergeIdBase + i + 1) }
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).min) }
      .toSeq.toDF("sym", "_mid")
    bpeEncodeVocab(words, merges)
      .select(col("w"), posexplode(col("syms")).as(Seq("pos", "sym")))
      .join(broadcast(symTable), Seq("sym"), "left")
      .select(col("w"), col("pos"),
        coalesce(col("_mid"), ascii(col("sym"))).as("id"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_sub"),
        transform(array_sort(collect_list(struct(col("pos"), col("id")))),
          x => x.getField("id")).as("ids"))
  }

  /** Apply a fitted BPE tokenizer to documents: per doc, whitespace
    * word count, true BPE token count, and the token-id sequence in
    * document order — ONE map-only projection through the native
    * [[graft.functions.BpeEncodeDoc]] kernel (the model rides a
    * broadcast codec with a per-executor word→ids memo; a corpus'
    * Zipf head pays the merge loop once per executor). Zero shuffles
    * before the output sort — at 100 TB nothing about the encode
    * touches the network. Semantics are the fit's own greedy
    * rank-order rewrite; PretrainSpec pins kernel == the declarative
    * [[bpeEncodeVocab]] HOF path == an independent scalar reference.
    * Docs with no words encode to zero tokens. */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
                spark: SparkSession): DataFrame = {
    val bc = spark.sparkContext.broadcast(
      new graft.functions.BpeCodec(merges))
    docs
      .select(col("doc_id"),
        graft.functions.BpeFunctions.bpeEncode(col("text"), bc).as("e"))
      .select(col("doc_id"),
        col("e.n_words").as("n_words"),
        size(col("e.token_ids")).cast("long").as("n_bpe_tokens"),
        col("e.token_ids").as("token_ids"))
      .orderBy(col("doc_id"))
  }

  /** Attach tokenizer-TRUE token counts to a documents frame as
    * `n_tokens` (replacing any whitespace-word column a packing
    * operator would otherwise derive): the `tokens=bpe:<modelDir>`
    * knob of the shard/pack/budget/mixture family. Count-only through
    * the [[graft.functions.BpeTokenCount]] kernel — memo'd per-word
    * lengths, no id array ever built, map-only. */
  def bpeTokenCounts(docs: DataFrame, modelDir: String,
                     spark: SparkSession): DataFrame = {
    val bc = spark.sparkContext.broadcast(
      new graft.functions.BpeCodec(loadBpeMerges(spark, modelDir)))
    docs.drop("n_tokens")
      .withColumn("n_tokens",
        graft.functions.BpeFunctions.bpeTokenCount(col("text"), bc))
  }

  /** Once-per-JVM cache of the gate corpus' deterministic BPE fit,
    * keyed by corpus dir; the value remembers the size it was
    * REQUESTED at (an early-terminated fit can be shorter than its
    * request — re-fitting would just reproduce it). Greedy BPE's step
    * k depends only on steps 1..k−1, so `merges.take(k)` IS the
    * k-merge model — one fit at the largest requested size serves
    * every gate entry, and repeated bench calls measure the ENCODE /
    * scoring pass, not a re-fit (round-15 verdict: the
    * serve_ann_probe build-once discipline applied to the tokenizer
    * family). The fit is deterministic (count desc, a asc, b asc),
    * so the cache is oracle-invisible; PretrainSpec pins prefix
    * nesting explicitly. */
  private val fitCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Int, Seq[(String, String)])]()

  private def gateMerges(s: SparkSession, d: String,
                         nMerges: Int): Seq[(String, String)] = {
    val (_, fit) = fitCache.compute(d, (_, prev) =>
      if (prev != null && prev._1 >= nMerges) prev
      else (nMerges, bpeMerges(documents(s, d), s, nMerges)
        .orderBy(col("step")).select(col("left"), col("right"))
        .collect().toSeq.map(r => (r.getString(0), r.getString(1)))))
    fit.take(nMerges)
  }

  /** Gate entry: fit 12 merges on the corpus, then encode every doc
    * with them — the closed tokenizer loop (fit → apply) in one plan.
    * Rows-only (the fit's argmax draws are not SQL-expressible);
    * semantics pinned by PretrainSpec against an independent scalar
    * reference implementation.
    *
    * The gate projection ships `token_digest` — an xxhash64 over the
    * id sequence's string form — INSTEAD of the raw `token_ids` array:
    * the digest pins the full sequence content (any id anywhere flips
    * it) while keeping every gate column scalar. The raw array stays
    * on the API path ([[bpeEncode]], and the REPL's
    * `pipeline text_bpe_encode modelDir=` view). */
  def textBpeEncode(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val merges = gateMerges(s, d, 12)
    bpeEncode(docs, merges, s)
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        xxhash64(col("token_ids").cast(StringType)).as("token_digest"))
  }

  /** Per-source tokenizer FERTILITY (BPE tokens per whitespace word) —
    * the tokenizer-eval readout mixture design reads next to
    * source_stats: a source whose fertility spikes (no-space scripts,
    * code, OCR junk) consumes proportionally more of a token budget
    * than its word counts suggest, and fertility ≈ word length means
    * the merge table barely compresses it. Fit once on the corpus
    * (the [[textBpeEncode]] loop), then ONE map-only projection
    * through the count-only broadcast-codec kernel (BpeTokenCount —
    * no id arrays materialize) + the TextStats word count, reduced to
    * ≤#sources rows. Rows-only (the fit's argmax draws are not
    * SQL-expressible); PretrainSpec pins a planted no-space source's
    * fertility strictly above a spaced one's. */
  def pipelineBpeFertility(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val merges = gateMerges(s, d, 12)
    val bc = s.sparkContext.broadcast(new graft.functions.BpeCodec(merges))
    docs
      .select(col("source"),
        graft.functions.TextStats.textStats(col("text"))
          .getField("n_words").cast("long").as("nw"),
        graft.functions.BpeFunctions.bpeTokenCount(col("text"), bc).as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_words"),
        sum(col("nt")).as("n_bpe_tokens"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"),
        (col("n_bpe_tokens").cast(DoubleType) / col("n_words"))
          .as("fertility"))
      .orderBy(col("source"))
  }

  /** Fertility-vs-vocab-size TUNING CURVE: per-source fertility at
    * every model size in `grid`, from ONE fit's merge prefixes.
    * Merges are learned in rank order, so `merges.take(k)` IS the
    * k-merge model the fit would have produced (candidate sets nest —
    * the sim_ann_recall_curve trick), and fertility is non-increasing
    * in k BY CONSTRUCTION: encoding under k+1 merges is exactly the
    * k-merge encoding followed by one more merge pass, which can only
    * shrink a word's symbol count (PretrainSpec pins monotonicity and
    * a planted no-space source staying exactly flat — no learned
    * merge applies to an alphabet the fit never saw repeated).
    *
    * [[pipelineBpeFertility]] says WHICH sources are tokenizer-
    * expensive; this says WHAT vocab size fixes it — the knob-setting
    * readout beside it (a source whose curve stays flat needs a
    * different treatment than one that drops at 2× the merges).
    *
    * Scale shape: one fit (vocab-sized iterations), then ONE map-only
    * corpus pass scoring ALL grid points at once — |grid| count-only
    * broadcast codecs evaluated per row (each with its per-executor
    * word memo), reduced to ≤ #sources × |grid| rows. The corpus is
    * never re-read per grid point. Gate grid is {4,8,16,32}; the
    * production grid (2⁸..2¹², the verdict's ask) is the `grid` knob
    * via the pipeline view — same plan, the fit just runs longer. */
  def bpeCurve(docs: DataFrame, spark: SparkSession,
               grid: Seq[Int] = Seq(4, 8, 16, 32)): DataFrame = {
    // STRICTLY increasing: a duplicate grid value (REPL grid=4,4)
    // would mint duplicate nt_k/s_k column names and surface later as
    // an opaque ambiguous-reference AnalysisException (round-15 advice)
    requireGrid(grid)
    val merges = bpeMerges(docs, spark, nMerges = grid.max)
      .orderBy(col("step")).select(col("left"), col("right"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    bpeCurveFitted(docs, spark, grid, merges)
  }

  // STRICTLY increasing: a duplicate grid value (REPL grid=4,4) would
  // mint duplicate nt_k/s_k column names and surface later as an
  // opaque ambiguous-reference AnalysisException (round-15 advice)
  private def requireGrid(grid: Seq[Int]): Unit =
    require(grid.nonEmpty && grid.head > 0 &&
        grid.sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
      s"grid must be strictly increasing positive model sizes, got $grid")

  /** [[bpeCurve]] over an ALREADY-FITTED merge list (≥ grid.max
    * entries unless the fit terminated early — take(k) of a shorter
    * list is the terminal model, exactly what a live fit would
    * produce). The gate path rides this with the once-per-JVM
    * [[fitCache]] fit so repeated bench calls measure the one-pass
    * scoring, not grid.max re-fit iterations. */
  def bpeCurveFitted(docs: DataFrame, spark: SparkSession,
                     grid: Seq[Int],
                     merges: Seq[(String, String)]): DataFrame = {
    requireGrid(grid)
    val codecs = grid.map(k => k -> spark.sparkContext.broadcast(
      new graft.functions.BpeCodec(merges.take(k))))
    val scored = docs.select(
      col("source") +:
        graft.functions.TextStats.textStats(col("text"))
          .getField("n_words").cast("long").as("nw") +:
        codecs.map { case (k, bc) =>
          graft.functions.BpeFunctions.bpeTokenCount(col("text"), bc)
            .as(s"nt_$k")
        }: _*)
    // materialize the ≤#sources-row reduction EAGERLY so the |grid|
    // broadcast codecs can be destroyed here instead of leaking a
    // broadcast block per grid point per invocation (round-15 advice);
    // localCheckpoint truncates the lineage so the returned frame
    // never re-evaluates the codec-bearing scan
    val reduced = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_words") +:
          grid.map(k => sum(col(s"nt_$k")).as(s"s_$k")): _*)
      .localCheckpoint(true)
    codecs.foreach { case (_, bc) => bc.destroy() }
    reduced
      .select(col("source"), col("n_docs"), col("n_words"),
        explode(array(grid.map(k =>
          struct(lit(k).as("n_merges"),
            col(s"s_$k").as("n_bpe_tokens"))): _*)).as("kv"))
      .select(col("source"), col("kv.n_merges").as("n_merges"),
        col("n_docs"), col("n_words"), col("kv.n_bpe_tokens").as("n_bpe_tokens"),
        (col("kv.n_bpe_tokens").cast(DoubleType) / col("n_words"))
          .as("fertility"))
      .orderBy(col("source"), col("n_merges"))
  }

  def pipelineBpeCurve(s: SparkSession, d: String): DataFrame =
    bpeCurveFitted(documents(s, d), s, Seq(4, 8, 16, 32),
      gateMerges(s, d, 32))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_bpe_curve" -> (pipelineBpeCurve _),
    "pipeline_bpe_fertility" -> (pipelineBpeFertility _),
    "pipeline_dsir_weight" -> (pipelineDsirWeight _),
    "pipeline_dsir_sample" -> (pipelineDsirSample _),
    "pipeline_bpe_merges" -> (pipelineBpeMerges _),
    "text_bpe_encode" -> (textBpeEncode _),
    "quality_ccnet_bucket" -> (qualityCcnetBucket _),
    "text_bigram_logprob" -> (textBigramLogprob _),
    "text_char_entropy" -> (textCharEntropy _)
  )

  val oracles: Map[String, String] = Map(
    "pipeline_dsir_weight" ->
      """WITH bg AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x', substr(md5(g), 1, 6)) AS BIGINT) % 8192 AS b
        |  FROM (
        |    SELECT doc_id, lang, ws[i] || ' ' || ws[i+1] AS g
        |    FROM (SELECT doc_id, lang,
        |            regexp_split_to_array(lower(text), '\s+') AS ws
        |          FROM documents), UNNEST(range(1, len(ws))) AS u(i)
        |  )
        |), cr AS (SELECT b, count(*) AS cr FROM bg GROUP BY b),
        |ct AS (SELECT b, count(*) AS ct FROM bg WHERE lang = 'en' GROUP BY b),
        |tot AS (SELECT count(*) AS tr,
        |          sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tt FROM bg),
        |w AS (
        |  SELECT cr.b,
        |    CAST(round(ln(
        |      ((COALESCE(ct.ct, 0) + 0.5) / (tt + 0.5 * 8192)) /
        |      ((cr.cr + 0.5) / (tr + 0.5 * 8192))), 9) AS DECIMAL(28,9)) AS w
        |  FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN tot
        |)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(round(sum(w.w), 6) AS DOUBLE) AS dsir_logweight
        |FROM bg JOIN w ON bg.b = w.b
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "pipeline_dsir_sample" ->
      """WITH bg AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x', substr(md5(g), 1, 6)) AS BIGINT) % 8192 AS b
        |  FROM (
        |    SELECT doc_id, lang, ws[i] || ' ' || ws[i+1] AS g
        |    FROM (SELECT doc_id, lang,
        |            regexp_split_to_array(lower(text), '\s+') AS ws
        |          FROM documents), UNNEST(range(1, len(ws))) AS u(i)
        |  )
        |), cr AS (SELECT b, count(*) AS cr FROM bg GROUP BY b),
        |ct AS (SELECT b, count(*) AS ct FROM bg WHERE lang = 'en' GROUP BY b),
        |tot AS (SELECT count(*) AS tr,
        |          sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tt FROM bg),
        |w AS (
        |  SELECT cr.b,
        |    CAST(round(ln(
        |      ((COALESCE(ct.ct, 0) + 0.5) / (tt + 0.5 * 8192)) /
        |      ((cr.cr + 0.5) / (tr + 0.5 * 8192))), 9) AS DECIMAL(28,9)) AS w
        |  FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN tot
        |), lw AS (
        |  SELECT doc_id, sum(w.w) AS lw
        |  FROM bg JOIN w ON bg.b = w.b GROUP BY doc_id
        |), keyed AS (
        |  SELECT doc_id,
        |    CAST(lw AS DOUBLE) - ln(-ln(
        |      (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':42'),
        |        1, 6)) AS BIGINT) + 0.5) / 16777216.0)) AS key
        |  FROM lw
        |)
        |SELECT doc_id, round(key, 6) AS sample_key
        |FROM (SELECT * FROM keyed ORDER BY key DESC, doc_id LIMIT 500)
        |ORDER BY doc_id""".stripMargin,
    "quality_ccnet_bucket" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |  FROM documents
        |), head AS (
        |  SELECT w, count(*) AS cf FROM tok GROUP BY w HAVING count(*) > 5
        |), total AS (SELECT count(*) AS t FROM tok),
        |scored AS (
        |  SELECT doc_id,
        |    round(CAST(sum(CAST(round(ln(coalesce(cf, 5) / t), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS mean_logprob
        |  FROM tok LEFT JOIN head USING (w), total
        |  GROUP BY doc_id
        |), sl AS (
        |  SELECT s.doc_id, d.lang, s.mean_logprob
        |  FROM scored s JOIN documents d USING (doc_id)
        |), b AS (
        |  SELECT lang,
        |    round(quantile_cont(mean_logprob, 0.3333333333333333), 6) AS q1,
        |    round(quantile_cont(mean_logprob, 0.6666666666666666), 6) AS q2
        |  FROM sl GROUP BY lang
        |)
        |SELECT sl.doc_id, sl.lang, sl.mean_logprob,
        |  CASE WHEN mean_logprob >= q2 THEN 'head'
        |       WHEN mean_logprob >= q1 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM sl JOIN b USING (lang) ORDER BY sl.doc_id""".stripMargin,
    "text_bigram_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id, ws[i] AS p, ws[i] || ' ' || ws[i+1] AS g
        |  FROM t, UNNEST(range(1, len(ws))) AS u(i)
        |), cb AS (SELECT g, count(*) AS cb FROM bg GROUP BY g),
        |cp AS (SELECT p, count(*) AS cp FROM bg GROUP BY p)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(CAST(round(ln(cb / cp), 9) AS DECIMAL(28,9)))
        |    AS DOUBLE) / count(*), 6) AS mean_logprob
        |FROM bg JOIN cb USING (g) JOIN cp USING (p)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    regexp_replace(text, '[^\x20-\x7e]', '', 'g'), '')) AS c
        |  FROM documents
        |), hist AS (
        |  SELECT doc_id, c, count(*) AS n FROM ch WHERE c <> ''
        |  GROUP BY doc_id, c
        |), tot AS (SELECT doc_id, sum(n) AS t FROM hist GROUP BY doc_id),
        |ent AS (
        |  SELECT hist.doc_id,
        |    sum(CAST(round(-((n / t) * (ln(n / t) / ln(2))), 9)
        |      AS DECIMAL(28,9))) AS e
        |  FROM hist JOIN tot USING (doc_id) WHERE n < t
        |  GROUP BY hist.doc_id
        |)
        |SELECT d.doc_id,
        |  CAST(COALESCE(tot.t, 0) AS INTEGER) AS n_printable,
        |  CAST(round(COALESCE(ent.e, CAST(0 AS DECIMAL(28,9))), 6) AS DOUBLE)
        |    AS char_entropy
        |FROM documents d
        |LEFT JOIN tot ON d.doc_id = tot.doc_id
        |LEFT JOIN ent ON d.doc_id = ent.doc_id
        |ORDER BY d.doc_id""".stripMargin
  )
}
