package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._
import graft.functions.TextFunctions._

/** Text-analysis operators for corpus curation (SURVEY.md §2.C):
  * language ID, quality scoring, token counting. All pure per-row
  * column expressions (codegen'd, embarrassingly parallel — the ideal
  * 100 TB shape: map-only over the scan, no shuffle except final aggs).
  */
object TextAnalysis {

  // single source of truth for the stop lists: the native kernel
  private val enStops = graft.functions.LangStatsKernel.enStops

  /** DuckDB CTE computing the text_quality `quality` column per doc —
    * shared with oracles that rank by quality (dedup_canonical), so
    * the formula cannot drift from the text_quality gate's. */
  private[operators] lazy val qualityCteSql: String =
    s"""qual AS (
      |  SELECT doc_id,
      |    (CAST(len(list_filter(w, x -> x IN (${inList(enStops)}))) AS DOUBLE)
      |       / len(w)) * 0.4
      |    + (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) * 0.3
      |    + least((CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
      |       / len(w)) / 10.0, 1.0) * 0.3 AS quality
      |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w,
      |          text FROM documents)
      |)""".stripMargin
  private val deStops = graft.functions.LangStatsKernel.deStops
  private val frStops = graft.functions.LangStatsKernel.frStops
  private val esStops = graft.functions.LangStatsKernel.esStops

  private def inList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString(", ")

  /** n-gram/stopword-heuristic language ID, evaluated against the
    * corpus's `lang` ground truth: output is the (lang, pred) confusion
    * matrix. CJK codepoints short-circuit to zh; otherwise argmax of
    * per-language stopword hits with a deterministic tie order. All
    * scores come from the single-pass native LangStats kernel (was: 4
    * interpreted HOF filter passes + an rlike per row); the DuckDB
    * oracle pins parity with the original composition. */
  def textLangid(s: SparkSession, d: String): DataFrame = {
    import graft.functions.LangStats.langStats
    val st = langStats(col("text"))
    val (sEn, sDe, sFr, sEs) = (st.getField("s_en"), st.getField("s_de"),
      st.getField("s_fr"), st.getField("s_es"))
    val pred = when(st.getField("cjk"), "zh")
      .when(sDe > sEn && sDe >= sFr && sDe >= sEs, "de")
      .when(sFr > sEn && sFr >= sEs, "fr")
      .when(sEs > sEn, "es")
      .otherwise("en")
    documents(s, d)
      .select(col("lang"), pred.as("pred"))
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("lang"), col("pred"))
  }

  /** Per-SOURCE language-label quality: for each paying source, how
    * many docs the langid heuristic agrees with the declared `lang`
    * on — the label-audit readout next to [[textLangid]]'s global
    * confusion matrix (a source whose match share craters is shipping
    * mislabeled text; its lang-filtered mixtures inherit the damage).
    * Same single-pass native LangStats kernel, one partial+final agg
    * to #sources rows; the share is an unrounded exact-integer
    * quotient. */
  def textLangidBySource(s: SparkSession, d: String): DataFrame = {
    import graft.functions.LangStats.langStats
    val st = langStats(col("text"))
    val (sEn, sDe, sFr, sEs) = (st.getField("s_en"), st.getField("s_de"),
      st.getField("s_fr"), st.getField("s_es"))
    val pred = when(st.getField("cjk"), "zh")
      .when(sDe > sEn && sDe >= sFr && sDe >= sEs, "de")
      .when(sFr > sEn && sFr >= sEs, "fr")
      .when(sEs > sEn, "es")
      .otherwise("en")
    documents(s, d)
      .select(col("source"), (pred === col("lang")).as("ok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("ok"), 1)).as("n_match"))
      .select(col("source"), col("n_docs"), col("n_match"),
        (col("n_match").cast(DoubleType) / col("n_docs")).as("match_share"))
      .orderBy(col("source"))
  }

  /** Per-document quality features + a weighted score: word count,
    * average word length, stopword ratio, lexical diversity. All four
    * raw counts come from the single-pass native TextStats kernel (one
    * codegen'd call per row) instead of materializing the word array
    * three times; the kernel is byte-equivalent to the
    * split/array_distinct/filter composition (PropertySpec). */
  def textQuality(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextStats.textStats
    documents(s, d)
      .select(col("doc_id"), textStats(col("text")).as("st"))
      .select(
        col("doc_id"),
        col("st.n_words").as("n_words"),
        col("st.n_alpha").as("n_alpha"),
        col("st.n_distinct").as("n_distinct"),
        col("st.n_stop").as("n_stop"))
      .select(
        col("doc_id"), col("n_words"), col("n_alpha"), col("n_distinct"),
        (col("n_alpha").cast(DoubleType) / col("n_words")).as("avg_wlen"),
        (col("n_stop").cast(DoubleType) / col("n_words")).as("stop_ratio"),
        (col("n_distinct").cast(DoubleType) / col("n_words")).as("distinct_ratio"))
      .select(
        col("doc_id"), col("n_words"), col("n_alpha"), col("n_distinct"),
        col("avg_wlen"), col("stop_ratio"), col("distinct_ratio"),
        (col("stop_ratio") * 0.4 + col("distinct_ratio") * 0.3
          + least(col("avg_wlen") / 10.0, lit(1.0)) * 0.3).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex tokenization
    * (letter runs / digit runs / single punctuation). */
  def textTokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"), col("lang"),
        size(split(lower(col("text")), "\\s+")).as("n_ws"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"))
          .as("n_bpe"))
      .orderBy(col("doc_id"))

  /** Winnowed Rabin-Karp rolling-hash fingerprints (native Catalyst
    * expression, see graft.functions.RollingHash) — per doc: the
    * fingerprint count plus a stable 64-bit digest of the set. */
  def textFingerprint(s: SparkSession, d: String): DataFrame = {
    import graft.functions.HashFunctions.rollingFingerprint
    documents(s, d)
      .select(col("doc_id"), rollingFingerprint(col("text")).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_fp"),
        xxhash64(to_json(struct(col("fp")))).as("fp_digest"))
      .orderBy(col("doc_id"))
  }

  /** Corpus vocabulary head: top-100 whitespace tokens by frequency
    * (ties broken by token). The classic shuffle-heavy vocab build —
    * partial+final count on the token key, then a global top-k that
    * Spark plans as TakeOrderedAndProject (per-partition heaps, never a
    * full sort). */
  def textTopTokens(s: SparkSession, d: String): DataFrame =
    topTokens(documents(s, d))

  def topTokens(docs: DataFrame, k: Int = 100): DataFrame =
    docs
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Unigram language-model score per document: mean log probability of
    * its tokens under the corpus unigram distribution — the classic
    * cheap fluency/quality signal (high = common fluent text, low =
    * gibberish or rare-token soup). Two passes: (1) vocabulary build
    * (partial+final count — the only corpus-wide shuffle), (2) token →
    * frequency join + per-doc aggregation. Per-token log probs round to
    * 9 dp and sum as DECIMAL so partial-aggregation order cannot flip
    * the result (same discipline as dsum). At 100 TB the vocabulary
    * head (df > ~5) is small enough to broadcast and the tail can be
    * floored to a smoothing constant without changing ranking. */
  def textUnigramLogprob(s: SparkSession, d: String): DataFrame =
    unigramLogprob(documents(s, d))

  def unigramLogprob(docs: DataFrame): DataFrame = {
    // tokens reduce to 64-bit hashes immediately: the vocab groupBy and
    // the frequency join both shuffle 8-byte keys instead of raw token
    // strings (same discipline as exact dedup / ngram_hashes; counts are
    // collision-safe at 64 bits for any real vocabulary).
    // (Round 20 A/B note: a (doc, w, k) pre-reduction — the DSIR shape —
    // was tried and REGRESSED sf1 1.03 → 1.25 s: this operator's per-doc
    // agg already ships one partial row per (doc, partition), so the
    // reduction replaced cheap re-tokenizes with a full distinct-pair
    // shuffle. Reverted; only the vocab-total reuse below survived.)
    val tok = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("w"))
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("cf"))
    // lazy one-row total off the VOCAB reduction (round 20, §2.4):
    // Σ cf ≡ corpus token count, so the total rides the vocab exchange
    // (ReusedExchange at runtime) instead of a THIRD tokenize pass
    val total = vocab.agg(sum(col("cf")).cast("double").as("t"))
    tok.join(vocab, Seq("w"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(log(col("cf") / col("t")), 9)
          .cast(DecimalType(28, 9)).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round((sum(col("lp")).cast(DoubleType) / count(lit(1))), 6)
          .as("mean_logprob"))
      .orderBy(col("doc_id"))
  }

  /** The 100 TB shape of [[unigramLogprob]]: the scoring pass never
    * shuffles the corpus token stream. Pass 1 builds the vocabulary HEAD
    * (df > dfMin) — the only corpus-wide shuffle, and it moves 8-byte
    * hashes with map-side combine; Zipf puts the overwhelming share of
    * token OCCURRENCES in the head, so the head table stays broadcastable
    * (df > 5 cuts the hapax/rare tail that dominates vocabulary SIZE).
    * Pass 2 is map-only: broadcast-left-join the head onto the token
    * stream and floor missing (tail) tokens to the smoothing constant
    * log(dfMin/total); the per-doc agg then shuffles one partial row per
    * (doc, partition), never per token. Tail flooring perturbs scores
    * only for rare-token-heavy documents — exactly the ones the signal
    * exists to flag — and preserves ranking (log is monotone; the floor
    * upper-bounds every floored prob at the head boundary). */
  def textUnigramLogprobSmoothed(s: SparkSession, d: String): DataFrame =
    unigramLogprobSmoothed(documents(s, d))

  def unigramLogprobSmoothed(docs: DataFrame, dfMin: Long = 5L): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("w"))
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("cf"))
    val head = vocab.where(col("cf") > dfMin)
    // the head filter and the corpus total both re-aggregate the ONE
    // vocab reduction (round 20, §2.4): Σ cf ≡ corpus token count, so
    // the total rides the vocab exchange (ReusedExchange at runtime)
    // instead of a THIRD tokenize pass of the corpus
    val total = vocab.agg(sum(col("cf")).cast("double").as("t"))
    tok.join(broadcast(head), Seq("w"), "left")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(log(coalesce(col("cf"), lit(dfMin)) / col("t")), 9)
          .cast(DecimalType(28, 9)).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round((sum(col("lp")).cast(DoubleType) / count(lit(1))), 6)
          .as("mean_logprob"))
      .orderBy(col("doc_id"))
  }

  /** BM25 relevance search (Robertson et al., Okapi BM25; k1=1.2,
    * b=0.75) for a literal query-term set over the corpus — the lexical
    * retrieval twin of the embedding ANN path (a training-data pipeline
    * uses both: ANN for semantic, BM25 for exact-term eval-set mining).
    *
    * Scale shape: the token stream filters to the query terms BEFORE
    * any exchange — non-matching tokens die on the scan (map-only), so
    * the tf shuffle carries only (doc, matched-term) rows: |Q| ≈ a few
    * terms means orders of magnitude under the corpus token count. df
    * and the (N, avgdl) corpus stats are one-row/|Q|-row aggregates,
    * lazily broadcast — no driver collect. Top-k compiles to
    * TakeOrderedAndProject. Per-(doc, term) scores round to 9 dp and
    * sum as DECIMAL (order-free), same discipline as the logprob
    * scores; the arithmetic mirrors the DuckDB oracle expression for
    * expression so the doubles match bit-for-bit. */
  def textBm25Search(s: SparkSession, d: String): DataFrame =
    bm25Search(documents(s, d), Seq("vector", "stream", "window"))

  def bm25Search(docs: DataFrame, terms: Seq[String], k: Int = 20,
                 k1: Double = 1.2, bp: Double = 0.75): DataFrame = {
    val base = docs
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"), col("ws"),
        size(col("ws")).cast(DoubleType).as("dl"))
    val stats = base.agg(
      count(lit(1)).cast(DoubleType).as("n_docs"),
      (sum(col("dl").cast(DecimalType(18, 2))).cast(DoubleType) /
        count(lit(1))).as("avgdl"))
    val matched = base
      .select(col("doc_id"), col("dl"), explode(col("ws")).as("w"))
      .where(col("w").isin(terms: _*))
    val tf = matched.groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).cast(DoubleType).as("tf"))
    val dfreq = tf.groupBy(col("w"))
      .agg(count(lit(1)).cast(DoubleType).as("df"))
    bm25Score(tf, dfreq, stats, k, k1, bp)
  }

  /** The BM25 scoring stage over prepared inputs — shared by the live
    * corpus-scan path ([[bm25Search]]) and the index-at-rest serving
    * path ([[Bm25Index.search]]), so the two produce bit-identical
    * scores by construction (Bm25IndexSpec asserts row equality).
    * `tf`: (doc_id, dl, w, tf double); `dfreq`: (w, df double);
    * `stats`: one row (n_docs double, avgdl double). */
  private[operators] def bm25Score(tf: DataFrame, dfreq: DataFrame,
                                   stats: DataFrame, k: Int,
                                   k1: Double, bp: Double): DataFrame =
    tf.join(broadcast(dfreq), Seq("w"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * (k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1 - bp) + lit(bp) * col("dl") / col("avgdl"))),
          9).cast(DecimalType(28, 9)).as("sc"))
      .groupBy(col("doc_id"))
      .agg(sum(col("sc")).cast(DoubleType).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)

  /** Per-source document-length distribution — the report a curation
    * run reads before choosing truncation/packing budgets. Exact p50/p90
    * (oracle-checkable baseline; q_approx_percentile is the documented
    * sketch path at 100 TB) + decimal-exact mean over the single-pass
    * TextStats word count. One partial+final agg; percentile's per-group
    * state stays on the reducers, #sources rows out. */
  def textLengthStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("source"),
        graft.functions.TextStats.textStats(col("text"))
          .getField("n_words").cast("long").as("w"))
      .groupBy(col("source"))
      .agg(
        round(expr("percentile(w, 0.5)"), 4).as("p50"),
        round(expr("percentile(w, 0.9)"), 4).as("p90"),
        round(sum(col("w").cast(DecimalType(18, 2))).cast(DoubleType) /
          count(lit(1)), 6).as("mean_words"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("source"))

  /** Top-k TF-IDF terms per document — the sparse lexical "embedding"
    * (keyword extraction, lexical retrieval features, the classic
    * BM25-precursor representation). One tokenization pass: tf comes
    * from the (doc, term) groupBy; df is a `groupBy(term).agg` over
    * that SAME reduced table joined back — NOT a per-term window: a
    * stopword's term-partition is ~every doc in the corpus buffered
    * through one task, while the agg gets partial map-side combine and
    * bounded state, and ReuseExchange serves both branches from the
    * one (doc, term) shuffle so the corpus still tokenizes once; N
    * broadcasts as a metadata-only count(*) one-row agg. Per-doc top-k
    * ranks the ROUNDED score with a total tie-break, so the cut is
    * oracle-stable. */
  def textTfidfVectors(s: SparkSession, d: String): DataFrame =
    tfidfVectors(documents(s, d))

  def tfidfVectors(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // count(when(tf >= 1, 1)), not count(1): tf is a count, so every
    // row passes and the value is identical — but the (unfoldable)
    // reference to tf keeps the df branch's (doc, term) aggregate
    // structurally IDENTICAL to the tf branch's, so ReuseExchange
    // serves both from ONE shuffle and the corpus tokenizes once.
    // (count(1) — or count(tf), which the optimizer rewrites to
    // count(1) over the non-nullable column — lets column pruning
    // strip tf, de-unifying the exchanges: a second full scan+explode
    // of the corpus, observed in the executed plan.)
    val dfCounts = tf.groupBy(col("term"))
      .agg(count(when(col("tf") >= 1L, 1)).as("df"))
    val n = docs.agg(count(lit(1)).cast(DoubleType).as("n"))
    tf.join(dfCounts, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n") / col("df")), 6).as("tfidf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Per-language vocabulary concentration: vocab size, hapax count
    * (terms occurring exactly once), and the hapax share — the
    * vocabulary-growth signal that separates natural text (hapax-heavy,
    * Heaps-law growth) from template/boilerplate corpora (tiny closed
    * vocabularies). The corpus reduces to the (lang, term) count table
    * in one pass (partial+final agg — tokens shuffle once as counts);
    * everything after runs on vocab-sized data. */
  def textHapaxShare(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("vocab_size"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("hapax_share", round(
        col("n_hapax").cast(DoubleType) / col("vocab_size"), 6))
      .orderBy(col("lang"))

  /** Zipf-law fit per language: least-squares slope of ln(freq) on
    * ln(rank) over the top-`k` tokens — natural language sits near −1;
    * strong deviation flags synthetic/templated text. The corpus
    * reduces once to (lang, term) counts; ranking windows over the
    * vocab-sized table (rank ≤ k partial-limits via WindowGroupLimit);
    * the regression consumes per-row ROUNDED decimal terms so the
    * per-lang sums are order-free and DuckDB replays them exactly, with
    * the one float division at the very end. */
  /** Vocabulary coverage curve: what share of the corpus' TOKEN mass
    * the top-k vocabulary entries cover, at the standard checkpoints —
    * the number that sizes a tokenizer's vocab (BPE merge budget) and
    * predicts OOV rates. Scale shape: the corpus reduces once to the
    * (term, cnt) vocab table (partial+final agg — tokens shuffle as
    * counts); the global head comes from `TakeOrderedAndProject`
    * (per-partition max(k)-row heaps merged on the driver — the
    * topTokens shape, NOT a global rank window, whose final pass
    * would funnel partitions×10 k rows through one task); the rank
    * then windows over that ≤10 k-row result, checkpoints fan out of
    * it map-only, and the one-row token total broadcasts. Coverage
    * ships as an unrounded quotient of exact BIGINTs (bit-identical
    * both engines). */
  def textVocabCoverage(s: SparkSession, d: String,
                        ks: Seq[Int] = Seq(10, 100, 1000, 10000)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = documents(s, d)
      .select(explode(split(lower(col("text")), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val top = tf
      .orderBy(col("cnt").desc, col("term")).limit(ks.max)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("term"))))
    val total = tf.agg(sum(col("cnt")).as("total_tokens"))
    top
      .crossJoin(broadcast(total))
      .select(explode(lit(ks.toArray)).as("k"), col("rk"), col("cnt"),
        col("total_tokens"))
      .where(col("rk") <= col("k"))
      .groupBy(col("k"))
      .agg(sum(col("cnt")).as("covered_tokens"),
        max(col("total_tokens")).as("total_tokens"))
      .select(col("k"), col("covered_tokens"), col("total_tokens"),
        (col("covered_tokens").cast(DoubleType) /
          col("total_tokens")).as("coverage"))
      .orderBy(col("k"))
  }

  def textZipfFit(s: SparkSession, d: String, k: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = documents(s, d)
      .select(col("lang"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("cnt"))
    val ranked = tf
      .withColumn("rk", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("term"))))
      .where(col("rk") <= k)
    val dec = DecimalType(28, 9)
    val x = log(col("rk"))
    val y = log(col("cnt"))
    val terms = ranked.select(col("lang"),
      round(x, 9).cast(dec).as("x"),
      round(y, 9).cast(dec).as("y"),
      round(x * y, 9).cast(dec).as("xy"),
      round(x * x, 9).cast(dec).as("xx"))
    terms.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("xy")).as("sxy"), sum(col("xx")).as("sxx"))
      .select(col("lang"), col("n_terms"),
        round(
          (col("n_terms") * col("sxy").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
          (col("n_terms") * col("sxx").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sx").cast(DoubleType)),
          6).as("zipf_slope"))
      .orderBy(col("lang"))
  }

  /** Sentence segmentation stats per doc: sentence count (terminator-
    * run split — the whitespace-tokenizer-grade heuristic; a real
    * segmenter is a model, not an engine op) and exact words-per-
    * sentence. Map-only over the scan; the quotient of two exact
    * integers ships UNROUNDED (one IEEE division, bit-identical in
    * both engines — the round-11 determinism rule). */
  def textSentences(s: SparkSession, d: String): DataFrame = {
    val nSent = size(split(col("text"), "[.!?]+\\s+")).cast(LongType)
    val nWords = graft.functions.TextStats.textStats(col("text"))
      .getField("n_words").cast(LongType)
    documents(s, d)
      .select(col("doc_id"), nSent.as("n_sentences"), nWords.as("n_words"))
      .withColumn("words_per_sentence",
        col("n_words").cast(DoubleType) / col("n_sentences"))
      .orderBy(col("doc_id"))
  }

  /** Feature-hashed bag-of-words (Weinberger et al. 2009, the hashing
    * trick): each term hashes to one of `dims` buckets, per-doc bucket
    * counts form the sparse fixed-width "embedding" a linear
    * classifier or DSIR-style selector consumes — no vocabulary table,
    * no OOV, byte-stable across corpora. Map-only hash + ONE
    * partial+final agg; all-integer, so the oracle is exact. Sparse
    * (doc_id, dim, cnt) rows out; the dense assembly is a per-doc
    * collect the CONSUMER does (a dense 64-long array per doc would
    * be corpus × dims cells through the shuffle for no information). */
  def hashedBow(docs: DataFrame, dims: Int = 64): DataFrame =
    docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .select(col("doc_id"),
        (conv(substring(md5(col("term")), 1, 6), 16, 10).cast(LongType)
          % dims).as("dim"))
      .groupBy(col("doc_id"), col("dim")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("doc_id"), col("dim"))

  def textHashedBow(s: SparkSession, d: String): DataFrame =
    hashedBow(documents(s, d))

  /** Per-doc DEFLATE compression ratio — the cheap redundancy signal
    * real curation stacks run next to perplexity (CCNet's companions;
    * Dolma ships one): boilerplate/template spam compresses far below
    * natural prose (ratio → 0.1), random token soup barely compresses
    * (ratio → 1). Native [[graft.functions.DeflateRatio]] kernel: one
    * tight zlib loop per row inside whole-stage codegen, map-only at
    * any corpus size, zero shuffles before the output sort. Rows-only
    * (DuckDB has no deflate); semantics pinned by ScalaTest
    * (repetitive < prose < gibberish ordering, empty-doc identity,
    * determinism). */
  def textCompressionRatio(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        octet_length(col("text")).cast(LongType).as("n_text_bytes"),
        round(graft.functions.DeflateRatio.deflateRatio(col("text")), 6)
          .as("deflate_ratio"))
      .orderBy(col("doc_id"))

  /** Per-document n-gram NOVELTY in corpus order (doc_id = ingestion
    * order): the share of a doc's distinct word-8-grams first seen in
    * THIS doc (corpus-wide min doc_id == this doc). The curve answers
    * the crawl-growth question dedup rates can't — how much genuinely
    * new content each increment contributes vs re-shuffled boilerplate
    * (the marginal-utility diagnostic of Muennighoff et al. 2023,
    * arXiv:2305.16264's repeated-data regime).
    *
    * Scale shape (round 19, guide §2.3/§2.4): grams reduce to 8-byte
    * hashes map-side via the native distinct-gram kernel (no gram
    * strings materialize). The corpus-wide first-doc table is a min()
    * agg — and because the kernel emits DISTINCT grams per doc, a gram
    * is "novel" for EXACTLY ONE doc (its min), so per-doc novel counts
    * come from re-aggregating that table by first_doc (#docs rows) —
    * the old join-back of every (doc, gram) row against the df-sized
    * first-doc table (a full gram-stream join + a second full shuffle
    * into the per-doc agg) is gone. The per-doc denominator never
    * touches the gram stream at all: it is size(kernel) on a map-only
    * pass. One full shuffle total (the min agg), then two #docs-row
    * tables join. min(doc_id) is an ORDER-INSENSITIVE agg, so "first
    * seen" needs no sort and no window anywhere. novelty ships as the
    * unrounded quotient of two exact ints. Oracle replays the
    * definition with string grams (agreement modulo 64-bit collisions,
    * the contamination exposure). */
  def ngramNovelty(docs: DataFrame, n: Int = 8): DataFrame = {
    import graft.functions.HashFunctions.ngramHashes
    val perDoc = docs.select(col("doc_id"),
      size(ngramHashes(col("text"), n)).cast(LongType)
        .as("n_distinct_grams"))
    val novel = docs
      .select(col("doc_id"), explode(ngramHashes(col("text"), n)).as("ng"))
      .groupBy(col("ng")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc")).agg(count(lit(1)).as("nn"))
    perDoc.join(novel, perDoc("doc_id") === novel("first_doc"), "left")
      .select(perDoc("doc_id"), col("n_distinct_grams"),
        coalesce(col("nn"), lit(0L)).as("n_novel"),
        (coalesce(col("nn"), lit(0L)).cast(DoubleType) /
          col("n_distinct_grams")).as("novelty"))
      .orderBy(col("doc_id"))
  }

  def textNgramNovelty(s: SparkSession, d: String): DataFrame =
    ngramNovelty(documents(s, d))

  /** Pointwise mutual information over adjacent token pairs — the
    * collocation miner ("new york" vs "the the"): PMI =
    * ln(p(ab) / (p(a)·p(b))) with unigram/bigram MLE over the whole
    * corpus, reported for every pair seen ≥ minCount times. PMI ≫ 0
    * flags multi-word expressions a tokenizer or stopword list should
    * treat as units; PMI < 0 flags pairs rarer than chance.
    *
    * Scale shape: [[pmiFromGrams]] at window 1 — ONE map-only gram
    * emission over the scan (unigrams + adjacent pairs in the same
    * native kernel pass; no corpus-row shuffle carries raw text),
    * reduced by one partial+final count; the unigram join-backs key
    * on the token string against the ≤vocab-sized slice of that
    * reduction (AQE broadcasts it when small); the min-count filter
    * prunes the pair tail before the joins. */
  /** Shared PMI assembly over the single-pass gram stream (round 20,
    * guide §1.2/§2.3): ONE native [[graft.functions.PairFunctions.skipgramGrams]]
    * emission carries unigram markers (b IS NULL) and windowed pairs
    * together, reduced by ONE partial+final count keyed (a, b) — where
    * the split emissions cost the corpus two tokenize+count passes
    * (plus three more when runtime exchange reuse missed a branch).
    * Unigram counts, pair counts, and BOTH totals then re-slice that
    * vocab+pair-sized reduction. The reduction CHECKPOINTS
    * ([[Lineage.truncate]], the ccnet discipline) before fan-out:
    * filter-pushdown splits anything less — the optimizer rewrites a
    * branch's tb-null test straight through the aggregate and under
    * the Generate, rebuilding one corpus pass per branch (observed:
    * `when(tb.isNotNull, n).isNotNull` simplified to `isnotnull(tb)`
    * and pushed; runtime exchange reuse then can't unify the three
    * filter-divergent subtrees). The PMI ratio is assembled in ONE
    * double expression with identical association order on both
    * engines, one ln() call, rounded to 9 dp (the logprob-family
    * discipline). */
  /** The one corpus pass: gram-marker counts keyed (a, b), b IS NULL ⇔
    * unigram. Package-private so PlanRegressionSpec can witness the
    * single kernel Generate that [[pmiFromGrams]] checkpoints away. */
  private[graft] def pmiGramCounts(docs: DataFrame, window: Int): DataFrame =
    docs
      .select(explode(graft.functions.PairFunctions.skipgramGrams(
        split(lower(col("text")), "\\s+"), window)).as("t"))
      .groupBy(col("t.a").as("ta"), col("t.b").as("tb"))
      .agg(count(lit(1)).as("n"))

  private def pmiFromGrams(docs: DataFrame, window: Int, minCount: Int,
                           totalName: String): DataFrame = {
    val grams = Lineage.truncate(pmiGramCounts(docs, window))
    val uni = grams.where(col("tb").isNull)
      .select(col("ta").as("token"), col("n").as("cu"))
    val pairs = grams.where(col("tb").isNotNull)
      .select(col("ta").as("token_a"), col("tb").as("token_b"),
        col("n").as("n_ab"))
    val totals = grams.agg(
      sum(when(col("tb").isNull, col("n"))).as("n_uni"),
      sum(when(col("tb").isNotNull, col("n"))).as(totalName))
    pairs
      .where(col("n_ab") >= minCount)
      .join(uni.select(col("token").as("token_a"), col("cu").as("c_a")),
        Seq("token_a"))
      .join(uni.select(col("token").as("token_b"), col("cu").as("c_b")),
        Seq("token_b"))
      .crossJoin(broadcast(totals))
      .select(col("token_a"), col("token_b"), col("n_ab"),
        round(log(
          ((col("n_ab").cast(DoubleType) * col("n_uni")) * col("n_uni")) /
            ((col("c_a").cast(DoubleType) * col("c_b")) * col(totalName))),
          9).as("pmi"))
      .orderBy(col("token_a"), col("token_b"))
  }

  def pmiBigrams(docs: DataFrame, minCount: Int = 10): DataFrame =
    pmiFromGrams(docs, window = 1, minCount = minCount, totalName = "n_bi")

  def textPmiBigrams(s: SparkSession, d: String): DataFrame =
    pmiBigrams(documents(s, d))

  /** Windowed-co-occurrence PMI (skipgram association, the
    * word2vec/GloVe statistic): pairs are (w_i, w_{i+o}) for every
    * offset 1 ≤ o ≤ window, not just adjacent — collocations that
    * tolerate an intervening word ("new … york city") surface here
    * and not in [[pmiBigrams]].
    *
    * Scale shape: identical to the bigram miner — [[pmiFromGrams]]
    * over the native [[graft.functions.SkipgramGrams]] generator
    * kernel (≤ (window+1)·|doc| structs per doc, one tight loop
    * inside whole-stage codegen — the equivalent lambda-HOF emission
    * is CodegenFallback and stays the parity oracle in
    * PairFunctionsSpec; no self-join on position, which would shuffle
    * the corpus's exploded token table TWICE), then ONE partial+final
    * count, min-count pruning before the unigram join-backs, one
    * ln() at 9 dp. */
  def skipgramPmi(docs: DataFrame, window: Int = 4,
                  minCount: Int = 10): DataFrame =
    pmiFromGrams(docs, window = window, minCount = minCount,
      totalName = "n_pair")

  def textSkipgramPmi(s: SparkSession, d: String): DataFrame =
    skipgramPmi(documents(s, d))

  /** Pairwise Jensen-Shannon divergence between per-source unigram
    * distributions — the redundancy matrix behind mixture design: two
    * sources with JS ≈ 0 are interchangeable (sampling both buys no
    * diversity); JS → ln 2 means disjoint vocabularies. Exact over the
    * full vocabularies: the inner join covers shared tokens, and each
    * side's UNSHARED probability mass contributes exactly
    * 0.5·(1−Σ_shared p)·ln 2 (its M-mixture is p/2), so nothing is
    * dropped.
    *
    * Scale shape: one tokenize pass reduced to the (source, token)
    * count table; the pair terms come from a token-keyed self-join of
    * that REDUCED table (≤ vocab·sources rows — never the corpus), and
    * the output is #source-pairs rows. Per-row JS terms are doubles
    * with identical association order both engines, summed as
    * DECIMAL(38,18) so partial-agg order can't move a digit; final
    * assembly is one double expression, 9 dp. */
  def sourceDivergence(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
    val totals = tok.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val t = tok.join(totals, Seq("source"))
    val a = t.select(col("source").as("src_a"), col("token"),
      col("c").as("ca"), col("n").as("na"))
    val b = t.select(col("source").as("src_b"), col("token"),
      col("c").as("cb"), col("n").as("nb"))
    val pa = col("ca").cast(DoubleType) / col("na")
    val pb = col("cb").cast(DoubleType) / col("nb")
    // per-row KL terms are transcendental (ln), so rounding to 12 dp
    // never lands on a decimal boundary where the two engines' round()
    // could split; the shared/unshared MASS sums stay INTEGER (exact,
    // order-free) and divide once per group
    val term = round(
      pa * log((pa * 2.0) / (pa + pb)) + pb * log((pb * 2.0) / (pa + pb)),
      12)
    a.join(b, Seq("token")).where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"),
        sum(term.cast(DecimalType(38, 12))).as("s"),
        sum(col("ca")).as("ca_sh"), sum(col("cb")).as("cb_sh"),
        max(col("na")).as("na"), max(col("nb")).as("nb"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        round(
          col("s").cast(DoubleType) * 0.5 +
            ((lit(1.0) - col("ca_sh").cast(DoubleType) / col("na")) +
              (lit(1.0) - col("cb_sh").cast(DoubleType) / col("nb"))) *
              (0.5 * math.log(2.0)),
          9).as("js_divergence"))
      .orderBy(col("src_a"), col("src_b"))
  }

  def textSourceDivergence(s: SparkSession, d: String): DataFrame =
    sourceDivergence(documents(s, d))

  /** Flesch-Kincaid grade level per document — the classic
    * readability score every curation stack carries beside the Gopher
    * ratios: 0.39·(words/sentence) + 11.8·(syllables/word) − 15.59.
    * Syllables use the standard vowel-group heuristic (runs of
    * [aeiou], min 1 per word) — crude but monotone in real syllable
    * count and EXACTLY replayable in SQL, which a dictionary method
    * is not.
    *
    * Scale shape: entirely map-only — the syllable sum is the native
    * [[graft.functions.SyllableCount]] kernel (one char walk per row
    * inside whole-stage codegen; the equivalent `aggregate` HOF is
    * CodegenFallback and is kept only as the parity oracle in
    * PairFunctionsSpec), sentence/word counts are the
    * text_sentences rules; one per-row double expression, identical
    * association order both engines, 6 dp. */
  def readability(docs: DataFrame): DataFrame = {
    val nSent = size(split(col("text"), "[.!?]+\\s+")).cast(LongType)
    val nWords = size(split(lower(col("text")), "\\s+")).cast(LongType)
    val nSyll = graft.functions.PairFunctions.syllableCount(col("text"))
    docs
      .select(col("doc_id"), nSent.as("n_sentences"),
        nWords.as("n_words"), nSyll.as("n_syllables"))
      .withColumn("fk_grade", round(
        (col("n_words").cast(DoubleType) / col("n_sentences")) * 0.39 +
          (col("n_syllables").cast(DoubleType) / col("n_words")) * 11.8 -
          15.59, 6))
      .orderBy(col("doc_id"))
  }

  def textReadability(s: SparkSession, d: String): DataFrame =
    readability(documents(s, d))

  /** Top distinctive terms PER SOURCE by source-level tf-idf — "what
    * is each source about" (text_tfidf_vectors answers the per-DOC
    * version; this is the corpus-catalog card). tf counts per
    * (source, term); df = how many SOURCES carry the term, so a term
    * every source shares scores ~0 no matter how frequent.
    *
    * Scale shape: one tokenize reduced to the (source, term) table;
    * df is a partial+final agg over that REDUCED table; the top-k
    * rank partitions by source and is WindowGroupLimit'd (per-task
    * heaps — a source's vocab never buffers through one task). Score
    * rounds to 9 dp BEFORE the rank so tie order is identical on both
    * engines. */
  def sourceTopTerms(docs: DataFrame, k: Int = 5,
                     minLen: Int = 4): DataFrame = {
    val tf = docs
      .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("term"))
      .where(length(col("term")) >= minLen)
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nSrc = tf.select(col("source")).distinct()
      .agg(count(lit(1)).as("n_sources"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, Seq("term")).crossJoin(broadcast(nSrc))
      .withColumn("tfidf", round(
        col("tf").cast(DoubleType) *
          log((lit(1.0) + col("n_sources")) / (lit(1.0) + col("df"))), 9))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("source"), col("rank"), col("term"), col("tf"),
        col("df"), col("tfidf"))
      .orderBy(col("source"), col("rank"))
  }

  def textSourceTopTerms(s: SparkSession, d: String): DataFrame =
    sourceTopTerms(documents(s, d))

  /** Character-class profile per language — mean per-doc shares of
    * letters / digits / whitespace / other (the cheap script-sanity
    * readout: mojibake, binary spill, and markup-heavy docs all move
    * `other`; a lang whose letter share collapses is mislabeled or
    * corrupted). Per-doc shares are exact-integer quotients (class
    * counts via regexp strip — map-only, codegen); the per-lang means
    * ride the 9-dp-round → DECIMAL-sum discipline so partial-agg
    * order can't move a digit. */
  def charclassProfile(docs: DataFrame): DataFrame = {
    def share(pattern: String): Column =
      round((length(col("text")) -
        length(regexp_replace(col("text"), pattern, ""))).cast(DoubleType) /
        length(col("text")), 9)
    val per = docs.where(length(col("text")) > 0)
      .select(col("lang"),
        share("[a-zA-Z]").as("s_alpha"),
        share("[0-9]").as("s_digit"),
        share("\\s").as("s_space"))
      .withColumn("s_other",
        round(lit(1.0) - col("s_alpha") - col("s_digit") - col("s_space"), 9))
    def m(c: String): Column =
      round(sum(col(c).cast(DecimalType(28, 9))).cast(DoubleType) /
        count(lit(1)), 9).as("mean_" + c.drop(2))
    per.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        m("s_alpha"), m("s_digit"), m("s_space"), m("s_other"))
      .orderBy(col("lang"))
  }

  def textCharclassProfile(s: SparkSession, d: String): DataFrame =
    charclassProfile(documents(s, d))

  /** Type-token ratio per document — lexical diversity (n_types /
    * n_tokens): the cheap vocabulary-richness feature next to entropy
    * and hapax share in every quality stack; near 0 = loops of the
    * same words (boilerplate, keyword stuffing), near 1 = no reuse.
    *
    * Scale shape: ENTIRELY map-only — tokenize, size, array_distinct
    * size, one division, all inside whole-stage codegen; no shuffle,
    * no explode (the token array never leaves its row). The ratio is
    * an unrounded exact-integer quotient. */
  def typeTokenRatio(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        split(lower(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(array_distinct(col("ws"))).cast("long").as("n_types"))
      .withColumn("ttr",
        col("n_types").cast(DoubleType) / col("n_tokens"))
      .orderBy(col("doc_id"))

  def textTtr(s: SparkSession, d: String): DataFrame =
    typeTokenRatio(documents(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_ttr" -> (textTtr _),
    "text_pmi_bigrams" -> (textPmiBigrams _),
    "text_skipgram_pmi" -> (textSkipgramPmi _),
    "text_source_divergence" -> (textSourceDivergence _),
    "text_charclass_profile" -> (textCharclassProfile _),
    "text_source_topterms" -> (textSourceTopTerms _),
    "text_readability" -> (textReadability _),
    "text_ngram_novelty" -> (textNgramNovelty _),
    "text_compression_ratio" -> (textCompressionRatio _),
    "text_hashed_bow" -> (textHashedBow _),
    "text_sentences" -> (textSentences _),
    "text_hapax_share" -> (textHapaxShare _),
    "text_zipf_fit" -> ((s: SparkSession, d: String) => textZipfFit(s, d)),
    "text_vocab_coverage" -> ((s: SparkSession, d: String) =>
      textVocabCoverage(s, d)),
    "text_length_stats" -> (textLengthStats _),
    "text_langid" -> (textLangid _),
    "text_langid_by_source" -> (textLangidBySource _),
    "text_quality" -> (textQuality _),
    "text_tokens" -> (textTokens _),
    "text_fingerprint" -> (textFingerprint _),
    "text_top_tokens" -> (textTopTokens _),
    "text_unigram_logprob" -> (textUnigramLogprob _),
    "text_unigram_logprob_smoothed" -> (textUnigramLogprobSmoothed _),
    "text_bm25_search" -> (textBm25Search _),
    "text_tfidf_vectors" -> (textTfidfVectors _)
  )

  val oracles: Map[String, String] = Map(
    "text_ttr" ->
      """SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_types,
        |  CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS ttr
        |FROM (SELECT doc_id,
        |        regexp_split_to_array(lower(text), '\s+') AS ws
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "text_pmi_bigrams" ->
      """WITH t AS (
        |  SELECT regexp_split_to_array(lower(text), '\s+') AS ws
        |  FROM documents
        |), uni AS (
        |  SELECT w AS token, count(*) AS cu
        |  FROM (SELECT unnest(ws) AS w FROM t) GROUP BY 1
        |), tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n_uni FROM uni),
        |bg AS (
        |  SELECT ws[i] AS token_a, ws[i+1] AS token_b
        |  FROM t, UNNEST(range(1, len(ws))) AS u(i)
        |), pr AS (
        |  SELECT token_a, token_b, count(*) AS n_ab
        |  FROM bg GROUP BY 1, 2
        |), totb AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_bi FROM pr)
        |SELECT p.token_a, p.token_b, p.n_ab,
        |  round(ln(((CAST(p.n_ab AS DOUBLE) * n_uni) * n_uni) /
        |    ((CAST(a.cu AS DOUBLE) * b.cu) * n_bi)), 9) AS pmi
        |FROM pr p
        |JOIN uni a ON p.token_a = a.token
        |JOIN uni b ON p.token_b = b.token
        |CROSS JOIN tot CROSS JOIN totb
        |WHERE p.n_ab >= 10
        |ORDER BY p.token_a, p.token_b""".stripMargin,
    "text_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(text, '[.!?]+\s+')) AS BIGINT)
        |      AS n_sentences,
        |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
        |      AS n_words,
        |    CAST(list_sum(list_transform(
        |      regexp_split_to_array(lower(text), '\s+'),
        |      w -> greatest(len(regexp_split_to_array(w, '[aeiou]+')) - 1,
        |        1))) AS BIGINT) AS n_syllables
        |  FROM documents
        |)
        |SELECT doc_id, n_sentences, n_words, n_syllables,
        |  round((CAST(n_words AS DOUBLE) / n_sentences) * 0.39 +
        |    (CAST(n_syllables AS DOUBLE) / n_words) * 11.8 - 15.59, 6)
        |    AS fk_grade
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_source_topterms" ->
      """WITH tf AS (
        |  SELECT source, term, count(*) AS tf
        |  FROM (SELECT source,
        |          unnest(regexp_split_to_array(lower(text), '\s+')) AS term
        |        FROM documents)
        |  WHERE length(term) >= 4
        |  GROUP BY 1, 2
        |), df AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), ns AS (
        |  SELECT count(DISTINCT source) AS n_sources FROM tf
        |), scored AS (
        |  SELECT tf.source, tf.term, tf.tf, df.df,
        |    round(CAST(tf.tf AS DOUBLE) *
        |      ln((1.0 + n_sources) / (1.0 + df.df)), 9) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN ns
        |), ranked AS (
        |  SELECT source, term, tf, df, tfidf,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY tfidf DESC, term) AS rank
        |  FROM scored
        |)
        |SELECT source, rank, term, tf, df, tfidf FROM ranked
        |WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin,
    "text_charclass_profile" ->
      """WITH per AS (
        |  SELECT lang,
        |    round(CAST(length(text) -
        |      length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / length(text), 9) AS s_alpha,
        |    round(CAST(length(text) -
        |      length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        |      / length(text), 9) AS s_digit,
        |    round(CAST(length(text) -
        |      length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |      / length(text), 9) AS s_space
        |  FROM documents WHERE length(text) > 0
        |), p2 AS (
        |  SELECT lang, s_alpha, s_digit, s_space,
        |    round(1.0 - s_alpha - s_digit - s_space, 9) AS s_other
        |  FROM per
        |)
        |SELECT lang, count(*) AS n_docs,
        |  round(CAST(sum(CAST(s_alpha AS DECIMAL(28,9))) AS DOUBLE)
        |    / count(*), 9) AS mean_alpha,
        |  round(CAST(sum(CAST(s_digit AS DECIMAL(28,9))) AS DOUBLE)
        |    / count(*), 9) AS mean_digit,
        |  round(CAST(sum(CAST(s_space AS DECIMAL(28,9))) AS DOUBLE)
        |    / count(*), 9) AS mean_space,
        |  round(CAST(sum(CAST(s_other AS DECIMAL(28,9))) AS DOUBLE)
        |    / count(*), 9) AS mean_other
        |FROM p2 GROUP BY lang ORDER BY lang""".stripMargin,
    "text_source_divergence" ->
      """WITH tok AS (
        |  SELECT source, unnest(regexp_split_to_array(lower(text), '\s+'))
        |    AS token
        |  FROM documents
        |), cnt AS (
        |  SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2
        |), tot AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1
        |), t AS (
        |  SELECT cnt.source, token, c, n FROM cnt JOIN tot USING (source)
        |), sh AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(a.c AS DOUBLE) / a.n AS pa,
        |    CAST(b.c AS DOUBLE) / b.n AS pb,
        |    a.c AS ca, b.c AS cb, a.n AS na, b.n AS nb
        |  FROM t a JOIN t b ON a.token = b.token AND a.source < b.source
        |)
        |SELECT src_a, src_b, count(*) AS n_shared,
        |  round(
        |    CAST(sum(CAST(round(
        |      pa * ln((pa * 2.0) / (pa + pb)) +
        |      pb * ln((pb * 2.0) / (pa + pb)), 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) * 0.5 +
        |    ((1.0 - CAST(CAST(sum(ca) AS BIGINT) AS DOUBLE) / max(na)) +
        |     (1.0 - CAST(CAST(sum(cb) AS BIGINT) AS DOUBLE) / max(nb))) *
        |      (0.5 * ln(2)),
        |    9) AS js_divergence
        |FROM sh GROUP BY src_a, src_b
        |ORDER BY src_a, src_b""".stripMargin,
    "text_skipgram_pmi" ->
      """WITH t AS (
        |  SELECT regexp_split_to_array(lower(text), '\s+') AS ws
        |  FROM documents
        |), uni AS (
        |  SELECT w AS token, count(*) AS cu
        |  FROM (SELECT unnest(ws) AS w FROM t) GROUP BY 1
        |), tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n_uni FROM uni),
        |sg AS (
        |  SELECT ws[i] AS token_a, ws[i+o] AS token_b
        |  FROM t, UNNEST(range(1, len(ws))) AS u(i),
        |       UNNEST([1, 2, 3, 4]) AS v(o)
        |  WHERE i + o <= len(ws)
        |), pr AS (
        |  SELECT token_a, token_b, count(*) AS n_ab
        |  FROM sg GROUP BY 1, 2
        |), totp AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_pair FROM pr)
        |SELECT p.token_a, p.token_b, p.n_ab,
        |  round(ln(((CAST(p.n_ab AS DOUBLE) * n_uni) * n_uni) /
        |    ((CAST(a.cu AS DOUBLE) * b.cu) * n_pair)), 9) AS pmi
        |FROM pr p
        |JOIN uni a ON p.token_a = a.token
        |JOIN uni b ON p.token_b = b.token
        |CROSS JOIN tot CROSS JOIN totp
        |WHERE p.n_ab >= 10
        |ORDER BY p.token_a, p.token_b""".stripMargin,
    "text_ngram_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) >= 8
        |    THEN list_transform(generate_series(1, len(w) - 7),
        |         i -> array_to_string(list_slice(w, i, i + 7), ' '))
        |    ELSE [array_to_string(w, ' ')] END)) AS ng
        |  FROM t
        |), f AS (
        |  SELECT ng, min(doc_id) AS first_doc FROM g GROUP BY ng
        |)
        |SELECT g.doc_id, count(*) AS n_distinct_grams,
        |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS novelty
        |FROM g JOIN f USING (ng)
        |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin,
    "text_vocab_coverage" ->
      """WITH tf AS (
        |  SELECT term, count(*) AS cnt FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term
        |    FROM documents
        |  ) WHERE length(term) > 0 GROUP BY term
        |), top AS (
        |  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rk
        |  FROM tf
        |), tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM tf
        |), ks AS (
        |  SELECT unnest([10, 100, 1000, 10000]) AS k
        |)
        |SELECT CAST(k AS INTEGER) AS k,
        |  CAST(sum(cnt) AS BIGINT) AS covered_tokens,
        |  max(total_tokens) AS total_tokens,
        |  CAST(sum(cnt) AS DOUBLE) / max(total_tokens) AS coverage
        |FROM ks, top, tot WHERE rk <= k
        |GROUP BY k ORDER BY k""".stripMargin,

    "text_hashed_bow" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(text), '\s+')) AS term
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(concat('0x', substr(md5(term), 1, 6)) AS BIGINT) % 64 AS dim,
        |  count(*) AS cnt
        |FROM t WHERE length(term) > 0
        |GROUP BY 1, 2 ORDER BY doc_id, dim""".stripMargin,

    "text_sentences" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(text, '[.!?]+\s+')) AS BIGINT)
        |    AS n_sentences,
        |  CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
        |    AS n_words,
        |  CAST(len(regexp_split_to_array(lower(text), '\s+')) AS DOUBLE)
        |    / len(regexp_split_to_array(text, '[.!?]+\s+'))
        |    AS words_per_sentence
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_hapax_share" ->
      """WITH tf AS (
        |  SELECT lang, term, count(*) AS cnt FROM (
        |    SELECT lang,
        |      unnest(regexp_split_to_array(lower(text), '\s+')) AS term
        |    FROM documents
        |  ) WHERE length(term) > 0 GROUP BY 1, 2
        |)
        |SELECT lang, count(*) AS vocab_size,
        |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS hapax_share
        |FROM tf GROUP BY lang ORDER BY lang""".stripMargin,

    "text_zipf_fit" ->
      """WITH tf AS (
        |  SELECT lang, term, count(*) AS cnt FROM (
        |    SELECT lang,
        |      unnest(regexp_split_to_array(lower(text), '\s+')) AS term
        |    FROM documents
        |  ) WHERE length(term) > 0 GROUP BY 1, 2
        |), r AS (
        |  SELECT lang, cnt,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY cnt DESC, term) AS rk
        |  FROM tf QUALIFY rk <= 1000
        |), t AS (
        |  SELECT lang,
        |    CAST(round(ln(rk), 9) AS DECIMAL(28,9)) AS x,
        |    CAST(round(ln(cnt), 9) AS DECIMAL(28,9)) AS y,
        |    CAST(round(ln(rk) * ln(cnt), 9) AS DECIMAL(28,9)) AS xy,
        |    CAST(round(ln(rk) * ln(rk), 9) AS DECIMAL(28,9)) AS xx
        |  FROM r
        |)
        |SELECT lang, count(*) AS n_terms,
        |  round((count(*) * CAST(sum(xy) AS DOUBLE)
        |      - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
        |    / (count(*) * CAST(sum(xx) AS DOUBLE)
        |      - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)), 6)
        |    AS zipf_slope
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "text_length_stats" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
        |      AS w
        |  FROM documents
        |)
        |SELECT source,
        |  round(quantile_cont(w, 0.5), 4) AS p50,
        |  round(quantile_cont(w, 0.9), 4) AS p90,
        |  round(CAST(sum(CAST(w AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
        |    AS mean_words,
        |  count(*) AS n_docs
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    "text_langid_by_source" ->
      s"""WITH t AS (
        |  SELECT source, lang,
        |    regexp_split_to_array(lower(text), '\\s+') AS w, text
        |  FROM documents
        |), sc AS (
        |  SELECT source, lang,
        |    len(list_filter(w, x -> x IN (${inList(enStops)}))) AS s_en,
        |    len(list_filter(w, x -> x IN (${inList(deStops)}))) AS s_de,
        |    len(list_filter(w, x -> x IN (${inList(frStops)}))) AS s_fr,
        |    len(list_filter(w, x -> x IN (${inList(esStops)}))) AS s_es,
        |    regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS cjk
        |  FROM t
        |), p AS (
        |  SELECT source, lang,
        |    CASE WHEN cjk THEN 'zh'
        |      WHEN s_de > s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
        |      WHEN s_fr > s_en AND s_fr >= s_es THEN 'fr'
        |      WHEN s_es > s_en THEN 'es'
        |      ELSE 'en' END AS pred
        |  FROM sc
        |)
        |SELECT source, count(*) AS n_docs,
        |  CAST(count(CASE WHEN pred = lang THEN 1 END) AS BIGINT)
        |    AS n_match,
        |  CAST(count(CASE WHEN pred = lang THEN 1 END) AS DOUBLE)
        |    / count(*) AS match_share
        |FROM p GROUP BY source ORDER BY source""".stripMargin,
    "text_langid" ->
      s"""WITH t AS (
        |  SELECT lang, regexp_split_to_array(lower(text), '\\s+') AS w, text
        |  FROM documents
        |), sc AS (
        |  SELECT lang,
        |    len(list_filter(w, x -> x IN (${inList(enStops)}))) AS s_en,
        |    len(list_filter(w, x -> x IN (${inList(deStops)}))) AS s_de,
        |    len(list_filter(w, x -> x IN (${inList(frStops)}))) AS s_fr,
        |    len(list_filter(w, x -> x IN (${inList(esStops)}))) AS s_es,
        |    regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS cjk
        |  FROM t
        |)
        |SELECT lang,
        |  CASE WHEN cjk THEN 'zh'
        |    WHEN s_de > s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
        |    WHEN s_fr > s_en AND s_fr >= s_es THEN 'fr'
        |    WHEN s_es > s_en THEN 'es'
        |    ELSE 'en' END AS pred,
        |  count(*) AS cnt
        |FROM sc GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin,

    "text_quality" ->
      s"""WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w, text
        |  FROM documents
        |), f AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS INTEGER) AS n_words,
        |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS INTEGER) AS n_alpha,
        |    CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct,
        |    len(list_filter(w, x -> x IN (${inList(enStops)}))) AS n_stop
        |  FROM t
        |), r AS (
        |  SELECT doc_id, n_words, n_alpha, n_distinct,
        |    CAST(n_alpha AS DOUBLE) / n_words AS avg_wlen,
        |    CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
        |    CAST(n_distinct AS DOUBLE) / n_words AS distinct_ratio
        |  FROM f
        |)
        |SELECT doc_id, n_words, n_alpha, n_distinct, avg_wlen, stop_ratio,
        |  distinct_ratio,
        |  stop_ratio * 0.4 + distinct_ratio * 0.3
        |    + least(avg_wlen / 10.0, 1.0) * 0.3 AS quality
        |FROM r ORDER BY doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id, lang,
        |  CAST(len(regexp_split_to_array(lower(text), '\s+')) AS INTEGER) AS n_ws,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
        |    AS INTEGER) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_top_tokens" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin,

    "text_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |  FROM documents
        |), vocab AS (
        |  SELECT w, count(*) AS cf FROM tok GROUP BY w
        |), total AS (SELECT count(*) AS t FROM tok)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(CAST(sum(CAST(round(ln(cf / t), 9) AS DECIMAL(28,9)))
        |    AS DOUBLE) / count(*), 6) AS mean_logprob
        |FROM tok JOIN vocab USING (w), total
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_unigram_logprob_smoothed" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |  FROM documents
        |), head AS (
        |  SELECT w, count(*) AS cf FROM tok GROUP BY w HAVING count(*) > 5
        |), total AS (SELECT count(*) AS t FROM tok)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(CAST(sum(CAST(round(ln(coalesce(cf, 5) / t), 9)
        |    AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS mean_logprob
        |FROM tok LEFT JOIN head USING (w), total
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // literal arithmetic mirrors the Spark expression term for term
    // ((1.2 + 1), not 2.2 — the two parse to DIFFERENT doubles)
    "text_bm25_search" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws
        |  FROM documents
        |), b2 AS (
        |  SELECT doc_id, ws, CAST(len(ws) AS DOUBLE) AS dl FROM base
        |), stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |    CAST(sum(CAST(dl AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avgdl
        |  FROM b2
        |), matched AS (
        |  SELECT doc_id, dl, unnest(ws) AS w FROM b2
        |), m2 AS (
        |  SELECT * FROM matched WHERE w IN ('vector', 'stream', 'window')
        |), tf AS (
        |  SELECT doc_id, dl, w, CAST(count(*) AS DOUBLE) AS tf
        |  FROM m2 GROUP BY 1, 2, 3
        |), dfreq AS (
        |  SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
        |), sc AS (
        |  SELECT doc_id,
        |    CAST(round(
        |      ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
        |        (tf * (1.2 + 1)) /
        |        (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)),
        |      9) AS DECIMAL(28,9)) AS sc
        |  FROM tf JOIN dfreq USING (w), stats
        |)
        |SELECT doc_id, CAST(sum(sc) AS DOUBLE) AS bm25,
        |  count(*) AS n_terms_hit
        |FROM sc GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    "text_tfidf_vectors" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        |), x AS (
        |  SELECT doc_id, term, tf,
        |    count(*) OVER (PARTITION BY term) AS df
        |  FROM tf
        |), n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |sc AS (
        |  SELECT doc_id, term, round(tf * ln(n / df), 6) AS tfidf
        |  FROM x CROSS JOIN n
        |), r AS (
        |  SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, term) AS rank
        |  FROM sc
        |)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tfidf
        |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin
  )
}
