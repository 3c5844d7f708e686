package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._
import graft.functions.TextFunctions._

/** Rule-based corpus curation beyond scoring (SURVEY.md §2.C): PII
  * redaction, heuristic quality gates in the style of the Gopher rules
  * (Rae et al. 2021, arXiv:2112.11446 table A1), C4-style boilerplate
  * paragraph detection (Raffel et al. 2020, arXiv:1910.10683 §2.2), and
  * benchmark-contamination screening by n-gram overlap (GPT-3 appendix C
  * shape). These are the filters an LLM training pipeline runs between
  * raw crawl and tokenization.
  *
  * Scale shape: PII redaction and the quality gate are pure per-row
  * column expressions — map-only over the scan, the ideal 100 TB shape.
  * Paragraph boilerplate is one shuffle of 16-byte digests (never raw
  * paragraphs; same rationale as exact dedup). Contamination is an
  * inverted-index join on 8-gram hashes: the eval side is tiny by
  * construction (benchmarks are ~1e5 docs, broadcast-able), so the join
  * is a broadcast semi-match at any corpus size; a postings cap
  * (Dedup.MaxPostings) applies if an eval set ever carries boilerplate
  * n-grams.
  */
object QualityRules {

  // Regex patterns shared verbatim by Spark (Java regex) and the DuckDB
  // oracle (RE2) — restricted to the common dialect: no lookaround, no
  // backrefs, ASCII word boundaries only.
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val LongNumPat = "\\b\\d{9,}\\b"

  /** PII redaction: emails, IPv4 addresses, and ≥9-digit runs (SSN /
    * phone-shaped) replaced by typed placeholder tokens, applied in
    * fixed order (email first — emails contain digits). Output keeps
    * per-type match counts (counted on the raw text, so the numbers are
    * auditable independent of replacement order) and a digest of the
    * redacted text rather than the text itself — the gate compares
    * 16 bytes/row, and at corpus scale the redacted text would be
    * written to the curated output, not shuffled. */
  /** The redaction expression itself, for reuse in pipelines that keep
    * the text (the gate query ships a digest instead). */
  def redactPii(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPat, "[EMAIL]"),
        Ipv4Pat, "[IP]"),
      LongNumPat, "[NUM]")

  def textPiiRedact(s: SparkSession, d: String): DataFrame = {
    val redacted = redactPii(col("text"))
    documents(s, d).select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailPat)).as("n_email"),
      regexp_count(col("text"), lit(Ipv4Pat)).as("n_ip"),
      regexp_count(col("text"), lit(LongNumPat)).as("n_num"),
      md5(redacted).as("red_digest"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style heuristic quality gate: per-doc rule flags plus the
    * conjunction. Thresholds are scaled to the synthetic corpus (docs
    * are short) but the rule set is the published one: word-count
    * bounds, mean-word-length band, numeric-word ceiling, alpha-word
    * floor, and a common-stopword floor ("has common words"). Ratios
    * are int/int divisions — bit-identical in Spark and DuckDB, no
    * rounding needed. */
  def qualityGopherRules(s: SparkSession, d: String): DataFrame =
    gopherRules(documents(s, d))

  def gopherRules(docs: DataFrame): DataFrame =
    gopherFlags(docs).orderBy(col("doc_id"))

  /** The five rule statistics as column expressions over `text` —
    * single source of truth for the batch gate, the flag report, and
    * the streaming ingest gate. */
  private def ruleCols(text: org.apache.spark.sql.Column) = {
    val w = split(lower(text), "\\s+")
    val nWords = size(w)
    val nAlphaW = size(filter(w, x => x.rlike("[a-z]")))
    val nNumW = size(filter(w, x => x.rlike("^[0-9]+$")))
    val nStopW = size(filter(w,
      x => x.isin("the", "and", "of", "to", "in")))
    val meanWlen = length(regexp_replace(text, "\\s+", ""))
      .cast(DoubleType) / nWords
    (nWords, meanWlen, nNumW.cast(DoubleType) / nWords,
      nAlphaW.cast(DoubleType) / nWords, nStopW)
  }

  /** The admission conjunction as one column expression — for pipelines
    * that need the verdict inline (e.g. a streaming filter, which can
    * neither sort nor re-join an unbounded input). */
  def gopherKeep(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val (nWords, meanWlen, numRatio, alphaRatio, nStop) = ruleCols(text)
    nWords.between(10, 100000) && meanWlen.between(2.0, 12.0) &&
      numRatio < 0.3 && alphaRatio > 0.7 && nStop >= 1
  }

  /** The map-only rule columns (no sort) — shared by the batch gate and
    * the streaming ingest gate, which cannot sort an unbounded input. */
  def gopherFlags(docs: DataFrame): DataFrame = {
    val (nWords, meanWlen, numRatio, alphaRatio, nStop) = ruleCols(col("text"))
    docs.select(
      col("doc_id"), nWords.as("n_words"), meanWlen.as("mean_wlen"),
      numRatio.as("num_ratio"), alphaRatio.as("alpha_ratio"),
      nStop.as("n_stop"))
      .withColumn("keep",
        col("n_words").between(10, 100000) &&
          col("mean_wlen").between(2.0, 12.0) &&
          col("num_ratio") < 0.3 &&
          col("alpha_ratio") > 0.7 &&
          col("n_stop") >= 1)
  }

  /** Gopher-style INTRA-document repetition signals (Rae et al. 2021,
    * table A1's repetition rows): fraction of n-gram occurrences taken
    * by the most frequent 2-gram / 3-gram, and the fraction of 5-gram
    * occurrences that are duplicated — the "same phrase looping"
    * pathology that word-level rules (gopherRules) cannot see. Docs
    * under 5 words have no 5-grams and are excluded (they are the
    * word-count rule's territory). keep = top2 ≤ 0.20 ∧ top3 ≤ 0.18 ∧
    * dup5 ≤ 0.15, the published thresholds.
    *
    * Scale shape: grams reduce to 64-bit hashes before the per-(doc,
    * level, gram) count (8-byte shuffle keys, the unigram-logprob
    * discipline; the DuckDB twin groups the raw strings — same counts
    * either way); all three levels ride one scan/Generate and fold
    * through one partial+final count and one per-(doc, level)
    * aggregate, pivoted per doc. Fractions are int/int → double,
    * rounded 6 dp — order-free. */
  def qualityRepetition(s: SparkSession, d: String): DataFrame =
    repetitionStats(documents(s, d))

  def repetitionStats(docs: DataFrame): DataFrame = {
    // all three gram levels ride ONE scan and ONE Generate as tagged
    // (level, gram) structs — three separate explode+count passes would
    // read the 100 TB text column three times and shuffle six times;
    // this shape pays one read, one (doc, level, gram) count and one
    // (doc, level) fold, then a 3-way conditional pivot per doc
    val w = split(lower(col("text")), "\\s+")
    def gramsOf(n: Int) =
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => struct(lit(n).as("n"), array_join(slice(w, i, lit(n)), " ").as("g")))
    def lvl(n: Int, c: org.apache.spark.sql.Column) = max(when(col("n") === n, c))
    docs.where(size(w) >= 5)
      .select(col("doc_id"),
        explode(flatten(array(gramsOf(2), gramsOf(3), gramsOf(5)))).as("t"))
      .select(col("doc_id"), col("t.n").as("n"), xxhash64(col("t.g")).as("g"))
      .groupBy(col("doc_id"), col("n"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n"))
      .agg(max(col("c")).as("top"), sum(col("c")).as("tot"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup"))
      .groupBy(col("doc_id"))
      .agg(
        round(lvl(2, col("top")).cast(DoubleType) / lvl(2, col("tot")), 6)
          .as("top2_frac"),
        round(lvl(3, col("top")).cast(DoubleType) / lvl(3, col("tot")), 6)
          .as("top3_frac"),
        round(lvl(5, col("dup")).cast(DoubleType) / lvl(5, col("tot")), 6)
          .as("dup5_frac"))
      .withColumn("keep",
        col("top2_frac") <= 0.20 && col("top3_frac") <= 0.18 &&
          col("dup5_frac") <= 0.15)
      .orderBy(col("doc_id"))
  }

  /** C4-style boilerplate paragraph detection: sentence-split, normalize
    * (lower + trim), drop short fragments, and surface every span
    * appearing in ≥2 documents with its document frequency and first
    * occurrence. Downstream removal is a map-only anti-join against this
    * (small) list. Only 16-byte digests shuffle — raw spans never do. */
  def dedupParagraph(s: SparkSession, d: String): DataFrame =
    boilerplateParagraphs(documents(s, d))

  def boilerplateParagraphs(docs: DataFrame): DataFrame = {
    val para = docs
      .select(col("doc_id"),
        explode(split(col("text"), "\\.\\s+")).as("p"))
      .select(col("doc_id"), lower(trim(col("p"))).as("p"))
      .where(length(col("p")) > 20)
    para
      .groupBy(md5(col("p")).as("para_digest"))
      .agg(count(lit(1)).as("df"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= 2)
      .orderBy(col("df").desc, col("para_digest"))
  }

  /** Benchmark-contamination screen: distinct word-8-gram overlap
    * between each corpus doc and a designated eval set (here: doc_id ≡ 0
    * mod 97 stands in for the benchmark table). Corpus docs sharing ≥1
    * 8-gram with any eval doc come back with their overlap count — the
    * list a pipeline drops or flags before training. The eval side is
    * distinct-hashed and broadcast; the corpus side is map-only explode
    * + semi-match, no corpus-side self-join. */
  def pipelineContamination(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    contaminationScreen(
      docs.where(col("doc_id") % 97 =!= 0),
      docs.where(col("doc_id") % 97 === 0))
  }

  /** Overlap counts of `corpus` docs against the `evalSet` benchmark.
    * Both sides reduce text to 64-bit 8-gram hashes via the one-pass
    * native `ngram_hashes` kernel (no gram strings ever materialize —
    * the interpreted HOF shingle builder was 94% of the query's time on
    * the 10× stress), the broadcast table and every comparison carry
    * 8 bytes, and a 64-bit space makes screening collisions negligible
    * at any corpus size. */
  def contaminationScreen(corpus: DataFrame, evalSet: DataFrame): DataFrame = {
    import graft.functions.HashFunctions.ngramHashes
    val evalSide = evalSet
      .select(explode(ngramHashes(col("text"), 8)).as("ng")).distinct()
    corpus
      .select(col("doc_id"), explode(ngramHashes(col("text"), 8)).as("ng"))
      .join(broadcast(evalSide), Seq("ng"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("ng")).as("n_contam"))
      .orderBy(col("doc_id"))
  }

  /** Duplicate n-gram share per document (the Gopher/RefinedWeb
    * "duplicated n-gram fraction" quality rule, Rae et al. 2021
    * table A1; Penedo et al. 2023 §4.2): the share of a doc's
    * positional word-8-grams that occur ≥2 times CORPUS-WIDE
    * (occurrence-level, so a doc repeating its own boilerplate counts
    * against itself too). High share = template spam / boilerplate
    * farms that per-doc rules can't see.
    *
    * Scale shape — the tfidf discipline: the gram stream reduces to
    * 8-byte hashes map-side via the native positional kernel (no gram
    * strings materialize), aggregates once to (doc, gram, k), and the
    * corpus-wide df table is a groupBy over that SAME reduced table
    * (one tokenize, ReusedExchange). The join-back is df-FILTERED
    * (round-19 shape fix): only df≥2 grams decide the numerator, and
    * the denominator `n_grams` is computable from the reduced table
    * alone — so the big (doc, gram) stream joins only against the
    * duplicated-gram subset (in a natural corpus the large majority of
    * distinct grams are hapax and drop out), and the two #docs-row
    * aggregates meet in a final cheap doc-keyed left join. On the 100
    * TB path — where crawl duplication makes the gram table enormous —
    * this shrinks the one heavy join by the unique-gram fraction; at
    * sf1 on the v4-salted corpus it cut the key from 12.7 s to the
    * pre-salt band. Same answer by construction: sum(k) over all grams
    * == sum(k | df≥2) + sum(k | df=1) and only the first term was ever
    * df-dependent. The oracle replays the definition with string
    * grams; counts agree modulo 64-bit collisions, the same exposure
    * pipeline_contamination carries. dup_share ships as the unrounded
    * quotient of two exact ints — bit-identical in IEEE. */
  def dupNgramShare(docs: DataFrame, n: Int = 8): DataFrame = {
    import graft.functions.HashFunctions.ngramHashesPos
    val red = docs
      .select(col("doc_id"), explode(ngramHashesPos(col("text"), n)).as("ng"))
      .groupBy(col("doc_id"), col("ng")).agg(count(lit(1)).as("k"))
    // denominator straight off the kernel (round 19): n_grams per doc
    // IS the positional array's size — a map-only pass over the
    // column-pruned scan (the ngramNovelty denominator discipline).
    // A/B-measured at sf1 against re-aggregating the reduced table:
    // 1.77 s vs 2.62 s min-of-5 — the second tokenize is cheaper than
    // re-reading the full reduced exchange into a per-doc agg, and it
    // removes one shuffle from the plan.
    val totals = docs.select(col("doc_id"),
      size(ngramHashesPos(col("text"), n)).cast(LongType).as("n_grams"))
    val dupGrams = red.groupBy(col("ng")).agg(sum(col("k")).as("df"))
      .where(col("df") >= 2).select(col("ng"))
    val dups = red.join(dupGrams, Seq("ng"))
      .groupBy(col("doc_id")).agg(sum(col("k")).as("nd"))
    totals.join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("nd"), lit(0L)).as("n_dup_grams"),
        (coalesce(col("nd"), lit(0L)).cast(DoubleType) / col("n_grams"))
          .as("dup_share"))
      .orderBy(col("doc_id"))
  }

  def qualityDupNgramShare(s: SparkSession, d: String): DataFrame =
    dupNgramShare(documents(s, d))

  /** Domain-level quality gate (RefinedWeb/Dolma style): a document's
    * admission depends on its whole SOURCE's mean quality, not just its
    * own — boilerplate farms produce individually-plausible docs. Pass
    * 1 aggregates one mean-words row per source (partial+final, #sources
    * rows); pass 2 broadcast-joins the verdicts back — the corpus itself
    * never shuffles. Mean computed in decimal so partial-agg order
    * cannot flip a source sitting exactly on the threshold. */
  def domainGate(docs: DataFrame, minMeanWords: Double = 53.0): DataFrame = {
    val withW = docs.select(col("doc_id"), col("source"),
      graft.functions.TextStats.textStats(col("text"))
        .getField("n_words").cast("long").as("w"))
    val verdict = withW.groupBy(col("source"))
      .agg((sum(col("w").cast(DecimalType(18, 2))).cast(DoubleType) /
        count(lit(1))).as("mean_w"))
      .where(col("mean_w") >= minMeanWords)
      .select(col("source"), round(col("mean_w"), 6).as("source_mean_words"))
    withW.join(broadcast(verdict), Seq("source"))
      .select(col("doc_id"), col("source"), col("source_mean_words"))
      .orderBy(col("doc_id"))
  }

  def qualityDomainGate(s: SparkSession, d: String): DataFrame =
    domainGate(documents(s, d))

  /** Per-source exact-duplication rate — the corpus-health report that
    * decides WHERE dedup effort goes (a source at 40% dup rate gets a
    * crawl fix, not just a filter). One hash-agg scan: distinct texts
    * count over md5 long-slices (numeric buffers, same discipline as
    * pipeline_profile), never raw strings. */
  def qualityDedupRate(s: SparkSession, d: String): DataFrame =
    graft.Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(
          conv(substring(md5(col("text")), 1, 11), 16, 10).cast("long"),
          conv(substring(md5(col("text")), 12, 11), 16, 10).cast("long"),
          conv(substring(md5(col("text")), 23, 10), 16, 10).cast("long"))
          .as("n_distinct"),
        round((lit(1.0) - countDistinct(
          conv(substring(md5(col("text")), 1, 11), 16, 10).cast("long"),
          conv(substring(md5(col("text")), 12, 11), 16, 10).cast("long"),
          conv(substring(md5(col("text")), 23, 10), 16, 10).cast("long"))
          .cast("double") / count(lit(1))), 6).as("dup_rate"))
      .orderBy(col("source"))

  /** Per-source NEAR-dup rate — the MinHash twin of
    * [[qualityDedupRate]] (exact byte-identity misses every
    * reformatted mirror; this reports what the near-dup collapse
    * would actually remove, attributed to the source that pays it).
    * Keeper = min doc_id of each star-edge component; singletons keep
    * themselves. Components are the audited iterative
    * pointer-jumping; everything after is two shrinking aggs. */
  def nearDedupRate(docs: DataFrame): DataFrame = {
    val comps = graft.operators.Components
      .connectedComponents(graft.operators.Dedup.minhashLshEdges(docs))
      .select(col("id").as("doc_id"), col("comp"))
    val tagged = docs.select(col("doc_id"), col("source"))
      .join(comps, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
    val keep = tagged.groupBy(col("comp"))
      .agg(min(col("doc_id")).as("keep_id"))
    tagged.join(keep, Seq("comp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") === col("keep_id"), 1L).otherwise(0L))
          .as("n_kept"))
      .withColumn("near_dup_rate",
        lit(1.0) - col("n_kept").cast(DoubleType) / col("n_docs"))
      .orderBy(col("source"))
  }

  def qualityNearDedupRate(s: SparkSession, d: String): DataFrame =
    nearDedupRate(graft.Tables.documents(s, d))

  /** Cross-source n-gram overlap matrix: distinct-word-8-gram Jaccard
    * for every source pair — the re-crawl detector (a pair at
    * Jaccard 0.9 is one crawl mirrored twice; per-source dup rates
    * can't see it because each copy is internally clean). The report
    * every mixture decision should consult before weighting "two"
    * sources that are one.
    *
    * Scale shape (round 19, guide §2.3/§3.3): the corpus reduces ONCE
    * to the per-gram SOURCE SET — one partial+final collect_set agg
    * keyed on the 8-byte gram hash (map-side set dedup absorbs the
    * dominant within-source duplication before the exchange; raw grams
    * never shuffle). That single reduced table feeds everything: pair
    * intersections expand in place (sorted-set combinations via
    * codegen HOFs — work ∝ emitted pairs, bounded by #sources² per
    * gram with sources ~1e2-1e3 at any corpus size) and partial+final
    * count to #pairs rows; per-source sizes re-aggregate the same
    * table (explode + count, partial+final to #sources rows). The old
    * shape's gram-keyed SELF-JOIN of the distinct (source, gram) table
    * — two more full exchanges of the gram stream — is gone. The full
    * #pairs grid comes from a broadcast self-cross of the tiny size
    * table, so zero-overlap pairs report too. jaccard ships as the
    * unrounded quotient of exact ints via inclusion-exclusion. Oracle
    * replays with string grams (64-bit-collision exposure, the
    * contamination discipline). */
  def sourceOverlap(docs: DataFrame, n: Int = 8): DataFrame = {
    import graft.functions.HashFunctions.ngramHashes
    val perGram = docs
      .select(col("source"), explode(ngramHashes(col("text"), n)).as("ng"))
      .groupBy(col("ng"))
      .agg(array_sort(collect_set(col("source"))).as("ss"))
    val sizes = perGram
      .select(explode(col("ss")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val ov = perGram
      .where(size(col("ss")) >= 2)
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(
          slice(col("ss"), i + lit(2),
            greatest(size(col("ss")) - i - 1, lit(0))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("source_a"), col("p.b").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    val grid = broadcast(sizes).as("s1")
      .join(broadcast(sizes).as("s2"), col("s1.source") < col("s2.source"))
      .select(col("s1.source").as("source_a"), col("s2.source").as("source_b"),
        col("s1.n").as("grams_a"), col("s2.n").as("grams_b"))
    grid.join(ov, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        col("grams_a"), col("grams_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast(DoubleType) /
          (col("grams_a") + col("grams_b") -
            coalesce(col("n_common"), lit(0L)))).as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def pipelineSourceOverlap(s: SparkSession, d: String): DataFrame =
    sourceOverlap(documents(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_source_overlap" -> (pipelineSourceOverlap _),
    "quality_domain_gate" -> (qualityDomainGate _),
    "pipeline_waterfall" -> (pipelineWaterfall _),
    "text_pii_redact" -> (textPiiRedact _),
    "quality_gopher_rules" -> (qualityGopherRules _),
    "quality_repetition" -> (qualityRepetition _),
    "dedup_paragraph" -> (dedupParagraph _),
    "pipeline_contamination" -> (pipelineContamination _),
    "quality_dedup_rate" -> (qualityDedupRate _),
    "quality_near_dedup_rate" -> (qualityNearDedupRate _),
    "quality_dup_ngram_share" -> (qualityDupNgramShare _)
  )

  /** Curation WATERFALL: cumulative survival through the quality gates
    * per source — the report every curation run publishes (how many
    * docs does each successive gate cost, and where). Gates compose
    * the operators already in the engine: (1) the Gopher rule
    * conjunction, (2) exact-dup keeper-ship (doc is the min-id of its
    * text-digest group — the dedup_exact discipline: only the 16-byte
    * digest shuffles), (3) PII-free (zero email/IP/long-number
    * matches). ONE corpus scan feeds the flag projection; the keeper
    * map is a digest-keyed agg joined back; final report is one
    * partial+final agg to #sources rows, shares as unrounded exact
    * quotients. */
  def pipelineWaterfall(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val keepers = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keeper"))
    val flagged = docs
      .select(col("doc_id"), col("source"), col("text"),
        md5(col("text")).as("h"), gopherKeep(col("text")).as("g1"))
      .join(keepers, Seq("h"))
      .withColumn("g2", col("g1") && col("doc_id") === col("keeper"))
      .withColumn("g3", col("g2") &&
        regexp_count(col("text"), lit(EmailPat)) +
        regexp_count(col("text"), lit(Ipv4Pat)) +
        regexp_count(col("text"), lit(LongNumPat)) === 0)
    flagged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("g1"), 1L).otherwise(0L)).as("n_gopher"),
        sum(when(col("g2"), 1L).otherwise(0L)).as("n_unique"),
        sum(when(col("g3"), 1L).otherwise(0L)).as("n_clean"))
      .withColumn("survival_rate",
        col("n_clean").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_total"))
      .orderBy(col("source"))
  }

  val oracles: Map[String, String] = Map(
    "pipeline_source_overlap" ->
      """WITH t AS (
        |  SELECT source, regexp_split_to_array(lower(text), '\s+') AS w
        |  FROM documents
        |), g AS (
        |  SELECT DISTINCT source, unnest(list_distinct(CASE WHEN len(w) >= 8
        |    THEN list_transform(generate_series(1, len(w) - 7),
        |         i -> array_to_string(list_slice(w, i, i + 7), ' '))
        |    ELSE [array_to_string(w, ' ')] END)) AS ng
        |  FROM t
        |), sz AS (
        |  SELECT source, count(*) AS n FROM g GROUP BY source
        |), ov AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS n_common
        |  FROM g a JOIN g b USING (ng) WHERE a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT s1.source AS source_a, s2.source AS source_b,
        |  CAST(s1.n AS BIGINT) AS grams_a, CAST(s2.n AS BIGINT) AS grams_b,
        |  CAST(COALESCE(ov.n_common, 0) AS BIGINT) AS n_common,
        |  CAST(COALESCE(ov.n_common, 0) AS DOUBLE) /
        |    (s1.n + s2.n - COALESCE(ov.n_common, 0)) AS jaccard
        |FROM sz s1 JOIN sz s2 ON s1.source < s2.source
        |LEFT JOIN ov ON ov.source_a = s1.source AND ov.source_b = s2.source
        |ORDER BY source_a, source_b""".stripMargin,
    "pipeline_waterfall" ->
      s"""WITH t AS (
        |  SELECT doc_id, source, text,
        |    regexp_split_to_array(lower(text), '\\s+') AS w,
        |    md5(text) AS h
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, source, text, h,
        |    (CAST(len(w) AS INTEGER) BETWEEN 10 AND 100000)
        |    AND (CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
        |         / len(w) BETWEEN 2.0 AND 12.0)
        |    AND CAST(len(list_filter(w, x -> regexp_matches(x, '^[0-9]+$$')))
        |        AS DOUBLE) / len(w) < 0.3
        |    AND CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
        |        AS DOUBLE) / len(w) > 0.7
        |    AND len(list_filter(w, x -> x IN ('the','and','of','to','in')))
        |        >= 1 AS g1
        |  FROM t
        |), k AS (
        |  SELECT h, min(doc_id) AS keeper FROM t GROUP BY h
        |), g AS (
        |  SELECT f.source, f.g1,
        |    f.g1 AND f.doc_id = k.keeper AS g2,
        |    f.g1 AND f.doc_id = k.keeper
        |      AND len(regexp_extract_all(f.text, '$EmailPat'))
        |        + len(regexp_extract_all(f.text, '$Ipv4Pat'))
        |        + len(regexp_extract_all(f.text, '$LongNumPat')) = 0 AS g3
        |  FROM f JOIN k USING (h)
        |), a AS (
        |  SELECT source, count(*) AS n_total,
        |    CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher,
        |    CAST(sum(CASE WHEN g2 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |    CAST(sum(CASE WHEN g3 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
        |  FROM g GROUP BY source
        |)
        |SELECT source, n_total, n_gopher, n_unique, n_clean,
        |  CAST(n_clean AS DOUBLE) / n_total AS survival_rate
        |FROM a ORDER BY source""".stripMargin,

    "quality_repetition" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |  FROM documents
        |), d5 AS (
        |  SELECT * FROM d WHERE len(w) >= 5
        |), g2 AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS g FROM d5
        |), c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        |f2 AS (
        |  SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top2_frac
        |  FROM c2 GROUP BY 1
        |), g3 AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
        |    i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS g FROM d5
        |), c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
        |f3 AS (
        |  SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top3_frac
        |  FROM c3 GROUP BY 1
        |), g5 AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 4),
        |    i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS g FROM d5
        |), c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2),
        |f5 AS (
        |  SELECT doc_id,
        |    round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
        |      / sum(c), 6) AS dup5_frac
        |  FROM c5 GROUP BY 1
        |)
        |SELECT doc_id, top2_frac, top3_frac, dup5_frac,
        |  (top2_frac <= 0.20 AND top3_frac <= 0.18 AND dup5_frac <= 0.15)
        |    AS keep
        |FROM f2 JOIN f3 USING (doc_id) JOIN f5 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "quality_domain_gate" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
        |      AS w
        |  FROM documents
        |), v AS (
        |  SELECT source,
        |    CAST(sum(CAST(w AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |      AS mean_w
        |  FROM t GROUP BY source
        |)
        |SELECT doc_id, t.source,
        |  round(mean_w, 6) AS source_mean_words
        |FROM t JOIN v ON t.source = v.source
        |WHERE mean_w >= 53.0 ORDER BY doc_id""".stripMargin,

    "text_pii_redact" ->
      s"""SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '$EmailPat')) AS INTEGER) AS n_email,
        |  CAST(len(regexp_extract_all(text, '$Ipv4Pat')) AS INTEGER) AS n_ip,
        |  CAST(len(regexp_extract_all(text, '$LongNumPat')) AS INTEGER) AS n_num,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '$EmailPat', '[EMAIL]', 'g'),
        |    '$Ipv4Pat', '[IP]', 'g'),
        |    '$LongNumPat', '[NUM]', 'g')) AS red_digest
        |FROM documents ORDER BY doc_id""".stripMargin,

    "quality_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w, text
        |  FROM documents
        |), f AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS INTEGER) AS n_words,
        |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |      / len(w) AS mean_wlen,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '^[0-9]+$')))
        |      AS DOUBLE) / len(w) AS num_ratio,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
        |      AS DOUBLE) / len(w) AS alpha_ratio,
        |    CAST(len(list_filter(w, x -> x IN ('the','and','of','to','in')))
        |      AS INTEGER) AS n_stop
        |  FROM t
        |)
        |SELECT doc_id, n_words, mean_wlen, num_ratio, alpha_ratio, n_stop,
        |  (n_words BETWEEN 10 AND 100000) AND (mean_wlen BETWEEN 2.0 AND 12.0)
        |    AND num_ratio < 0.3 AND alpha_ratio > 0.7 AND n_stop >= 1 AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "dedup_paragraph" ->
      """WITH p0 AS (
        |  SELECT doc_id,
        |    lower(trim(unnest(regexp_split_to_array(text, '\.\s+')))) AS p
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, p FROM p0 WHERE length(p) > 20
        |)
        |SELECT md5(p) AS para_digest,
        |  count(*) AS df,
        |  count(DISTINCT doc_id) AS n_docs,
        |  min(doc_id) AS first_doc
        |FROM p GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY df DESC, para_digest""".stripMargin,

    "quality_dup_ngram_share" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(CASE WHEN len(w) >= 8
        |    THEN list_transform(generate_series(1, len(w) - 7),
        |         i -> array_to_string(list_slice(w, i, i + 7), ' '))
        |    ELSE [array_to_string(w, ' ')] END) AS ng
        |  FROM t
        |), d AS (
        |  SELECT ng, count(*) AS df FROM g GROUP BY ng
        |)
        |SELECT g.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_grams,
        |  CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS dup_share
        |FROM g JOIN d USING (ng)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "pipeline_contamination" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) >= 8
        |    THEN list_transform(generate_series(1, len(w) - 7),
        |         i -> array_to_string(list_slice(w, i, i + 7), ' '))
        |    ELSE [array_to_string(w, ' ')] END)) AS ng
        |  FROM t
        |), ev AS (
        |  SELECT DISTINCT ng FROM g WHERE doc_id % 97 = 0
        |)
        |SELECT g.doc_id, count(DISTINCT g.ng) AS n_contam
        |FROM g JOIN ev USING (ng)
        |WHERE g.doc_id % 97 <> 0
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "quality_dedup_rate" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_distinct,
        |  round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*), 6)
        |    AS dup_rate
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
