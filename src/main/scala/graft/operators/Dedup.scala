package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._
import graft.functions.TextFunctions._
import graft.functions.HashFunctions.{minhashBuckets, minhashSignature, simhash64}

/** Deduplication operators for a training-data pipeline (SURVEY.md §2.C).
  *
  * Scale design (the part that matters at 100 TB):
  *   - exact dedup groups by a 128-bit digest of the text, never the raw
  *     text — the shuffle carries 16 bytes + ids per row.
  *   - MinHash / SimHash signatures are native scalar expressions
  *     (graft.functions.SignatureKernels): one codegen'd pass per
  *     document during the scan, no explode, no wide aggregate — the
  *     only shuffle is the (band, bucket, id) tuples, ~16 small rows
  *     per document.
  *   - candidate pairs come from grouping by bucket and expanding
  *     in-bucket combinations — never a self-join (which would read and
  *     hash the corpus twice) and never O(n²) across buckets.
  *   - degenerate buckets (boilerplate/empty docs collapse to one
  *     signature) are capped: a bucket with >MaxBucket members is
  *     non-discriminative and skew-bombs the expansion, so it's dropped,
  *     matching standard LSH practice.
  *   - exact Jaccard runs as an inverted-index join on distinct shingles
  *     (pairs sharing ≥1 shingle only), the standard set-similarity-join
  *     shape, with a postings cap: a shingle present in more than
  *     MaxPostings documents (boilerplate) would emit O(df²) intermediate
  *     pairs while carrying no discriminative signal, so it is dropped
  *     before the self-join — the same rationale as MaxBucket, mirrored
  *     in the DuckDB oracle.
  */
object Dedup {

  private val NumPerms = 128
  private val Bands = 16 // 16 bands x 8 rows: s-curve midpoint ~ (1/16)^(1/8) ≈ 0.71
  private val Rows = NumPerms / Bands
  private val MaxBucket = 1000
  val MaxPostings = 256L

  /** Exact dedup: md5(text) groups; keep the smallest doc_id.
    * (md5 used over xxhash64 so the DuckDB oracle computes the same
    * digest; a pure-Spark pipeline would use xxhash64 twice over
    * different seeds for 128 collision-safe bits.) */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy(col("keeper"))

  /** Incremental-ingest exact dedup — the daily-crawl step: admit only
    * batch docs whose text is (a) absent from the standing corpus and
    * (b) first-of-its-kind within the batch (smallest doc_id wins).
    *
    * Scale shape: both sides reduce to 16-byte digests BEFORE anything
    * shuffles — the corpus contributes a digest set (at 100 TB this is
    * the persisted digest table from prior ingests, ~2% of corpus
    * bytes; text is never rescanned), the batch pre-aggregates
    * per-digest map-side, and membership is an anti join on the digest
    * with the corpus side bloom-reduced to ~|batch| rows before any
    * exchange (ScaleJoins.bloomReducedAntiJoin): the standing corpus
    * never shuffles, only the survivors of the batch-keyed bloom do —
    * and AQE broadcasts those. `expectedBatchDigests` sizes the bloom
    * filter; a loose upper bound is fine. */
  def incrementalIngest(corpus: DataFrame, batch: DataFrame,
                        expectedBatchDigests: Long = 1L << 20): DataFrame = {
    val batchAgg = batch
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_in_batch"))
    ScaleJoins.bloomReducedAntiJoin(batchAgg,
        corpus.select(md5(col("text")).as("h")).distinct(), "h",
        expectedBatchDigests)
      .select(col("doc_id"), col("n_in_batch"))
      .orderBy(col("doc_id"))
  }

  /** Gate entry: deterministic corpus/batch split (doc_id % 10) so the
    * oracle replays it. */
  def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    val all = documents(s, d)
    incrementalIngest(
      all.where(col("doc_id") % 10 =!= 0),
      all.where(col("doc_id") % 10 === 0))
  }

  /** Snapshot diff — the audit step between two corpus versions (what
    * did this curation run add/remove/rewrite?). Both snapshots reduce
    * to (doc_id, 16-byte digest) map-side; one full-outer sort-merge
    * join on doc_id classifies every id; text never shuffles. Emits
    * per-doc rows for the changed surface and keeps `unchanged` out of
    * the output (at 100 TB the unchanged mass is the overwhelming
    * majority — the report is the delta, not the corpus). */
  def datasetDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("doc_id"), md5(col("text")).as("h_old"))
    val n = newSnap.select(col("doc_id"), md5(col("text")).as("h_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .where(col("status") =!= "unchanged")
      .orderBy(col("doc_id"))
  }

  /** Gate entry: deterministic synthetic snapshots — "old" misses ids
    * ≡0 (mod 7), "new" misses ids ≡0 (mod 5) and rewrites ids ≡0
    * (mod 3) — so all three statuses appear. */
  def dedupSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val all = documents(s, d)
    datasetDiff(
      all.where(col("doc_id") % 7 =!= 0),
      all.where(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" [edited]"))).otherwise(col("text"))))
  }

  /** (doc_id, sig: array<long>) MinHash signatures — map-only: the
    * native kernel folds all shingles into the 128-slot signature in one
    * pass inside whole-stage codegen. */
  def minhashSignatures(docs: DataFrame, nGram: Int = 3): DataFrame =
    docs.select(col("doc_id"),
      minhashSignature(shingles(col("text"), nGram)).as("sig"))

  /** LSH band buckets: (doc_id, band, bucket) — bucket is a hash of the
    * band's slice of the signature. */
  def lshBuckets(sigs: DataFrame): DataFrame = {
    val bands = (0 until Bands).map { j =>
      struct(lit(j).as("band"),
        xxhash64(slice(col("sig"), j * Rows + 1, Rows)).as("bucket"))
    }
    sigs.select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** All ordered in-bucket pairs of a sorted array: (xs[i], xs[j]) i<j,
    * via higher-order functions — stays inside codegen, work is exactly
    * the number of emitted candidate pairs. */
  private def pairCombos(sorted: Column): Column =
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + lit(2), greatest(size(sorted) - i - 1, lit(0))),
        y => struct(x.as("a"), y.as("b")))))

  /** Near-dup candidate pairs via MinHash-LSH (Jaccard ≳ 0.7). */
  def dedupMinhashLsh(s: SparkSession, d: String): DataFrame =
    minhashLshPairs(documents(s, d))

  def minhashLshPairs(docs: DataFrame): DataFrame =
    docs
      // one codegen'd pass: text → 16 band-bucket hashes, nothing else
      // materializes; posexplode tags each bucket with its band index
      .select(col("doc_id"),
        posexplode(minhashBuckets(col("text"), 3, Bands)).as(Seq("band", "bucket")))
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .where(size(col("ids")).between(2, MaxBucket))
      .select(explode(pairCombos(array_sort(col("ids")))).as("p"))
      .select(col("p.a").as("id1"), col("p.b").as("id2"))
      .distinct()
      .orderBy(col("id1"), col("id2"))

  /** Star-edge form of the LSH bucket graph — the clustering-scale
    * variant of [[minhashLshPairs]]: every bucket contributes (doc →
    * bucket-min) edges, and a star has the same connected components
    * as the clique, so downstream cluster collapse is IDENTICAL while
    * edge volume is LINEAR in bucket size (n−1 edges, not n(n−1)/2
    * pairs). The degenerate-bucket cap becomes unnecessary on this
    * path: a boilerplate mega-bucket costs n edges. No bucket ever
    * materializes as a list — roots come from a partial+final min agg
    * and edges from a join back on the same (band, bucket) key, so the
    * exchange is reused. The pairs form remains the
    * candidate-verification surface; this is the collapse surface. */
  def minhashLshEdges(docs: DataFrame): DataFrame = {
    val tagged = docs.select(col("doc_id"),
      posexplode(minhashBuckets(col("text"), 3, Bands)).as(Seq("band", "bucket")))
    val roots = tagged.groupBy(col("band"), col("bucket"))
      .agg(min(col("doc_id")).as("root"))
    tagged.join(roots, Seq("band", "bucket"))
      .where(col("doc_id") =!= col("root"))
      .select(col("doc_id").as("id1"), col("root").as("id2"))
      .distinct()
  }

  /** Near-dup cluster ids over the star-edge graph — the end-to-end
    * 100 TB collapse: text → band buckets → star edges → iterative
    * components. Probabilistic like the pairs path (same buckets). */
  def dedupMinhashClusters(s: SparkSession, d: String): DataFrame =
    Components.connectedComponents(minhashLshEdges(documents(s, d)))
      .select(col("id").as("doc_id"), col("comp"))
      .orderBy(col("doc_id"))

  /** MinHash calibration report — per LSH candidate pair, the
    * ESTIMATED Jaccard (share of agreeing signature slots, the number
    * the banding threshold is derived from) next to the TRUE n-gram
    * Jaccard (exact over the distinct shingle-hash sets) and their
    * absolute error. This is the tuning readout for the whole LSH
    * family: if |est − true| drifts, the band/row split no longer sits
    * at the advertised ~0.7 s-curve midpoint and the dedup rate the
    * pipeline reports is wrong.
    *
    * Scale shape: candidates come from the banded pair path (never
    * all-pairs); each doc contributes ONE compact feature row (128
    * longs of signature + its distinct shingle-hash array) and the
    * pair table joins that features table twice on doc id; both
    * Jaccards compute in place via zip_with/array_intersect inside
    * codegen — no re-explosion, no per-shingle shuffle. */
  def minhashCalibration(docs: DataFrame, nGram: Int = 3): DataFrame = {
    val features = docs.select(col("doc_id"),
      minhashSignature(shingles(col("text"), nGram)).as("sig"),
      graft.functions.HashFunctions.ngramHashes(col("text"), nGram).as("hs"))
    minhashLshPairs(docs)
      .join(features.select(col("doc_id").as("id1"),
        col("sig").as("sig1"), col("hs").as("h1")), Seq("id1"))
      .join(features.select(col("doc_id").as("id2"),
        col("sig").as("sig2"), col("hs").as("h2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        (expr("size(filter(zip_with(sig1, sig2, (a, b) -> a = b), x -> x))")
          .cast(DoubleType) / size(col("sig1"))).as("est_jaccard"),
        (size(array_intersect(col("h1"), col("h2"))).cast(DoubleType) /
          (size(col("h1")) + size(col("h2")) -
            size(array_intersect(col("h1"), col("h2")))))
          .as("true_jaccard"))
      .withColumn("abs_err", abs(col("est_jaccard") - col("true_jaccard")))
      .orderBy(col("id1"), col("id2"))
  }

  def dedupMinhashCalibration(s: SparkSession, d: String): DataFrame =
    minhashCalibration(documents(s, d))

  /** Duplicate-cluster size histogram — the shape report on top of the
    * exact-Jaccard components (how MUCH boilerplate, and in what
    * chunks: many pairs vs one mega-cluster drive opposite curation
    * responses). Two shrinking hash-agg levels over the component ids
    * (#docs-in-clusters → #clusters → #sizes rows); the recursive
    * cluster oracle makes the histogram itself oracle-checkable. */
  def dedupClusterSizeHist(s: SparkSession, d: String): DataFrame =
    Components.connectedComponents(ngramJaccardPairs(documents(s, d)))
      .groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
      .orderBy(col("cluster_size"))

  /** Exact n-gram Jaccard join: inverted index on distinct shingles →
    * intersection counts → |A∩B| / (|A|+|B|-|A∩B|) ≥ threshold. */
  def dedupNgramJaccard(s: SparkSession, d: String): DataFrame =
    ngramJaccardPairs(documents(s, d))

  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.7,
                        maxDf: Long = MaxPostings): DataFrame = {
    // shingles reduce to 64-bit hashes via the one-pass native kernel:
    // Jaccard only needs equality and counts, which hashes preserve
    // (collision-free in practice at 64 bits), and every downstream
    // shuffle — the df cap, the inverted-index self-join — carries
    // 8-byte keys with no gram strings ever materialized
    val g0 = docs
      .select(col("doc_id"),
        explode(graft.functions.HashFunctions.ngramHashes(col("text"), 3)).as("sh"))
    // postings cap: blocked = boilerplate shingles (df > maxDf). The df
    // agg is partial+final (skewed shingles combine map-side); blocked is
    // small by construction, and the anti-join shuffles on the same key
    // the inverted-index join needs, so the exchange is reused.
    val dfs = g0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val blocked = dfs.where(col("df") > maxDf).select(col("sh"))
    val g = g0.join(blocked, Seq("sh"), "left_anti")
    val sizes = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // prefix filtering (Chaudhuri et al. SSJoin / Xiao et al. ppjoin):
    // under a global shingle order (rarest first), any pair with
    // J ≥ t must share an element within each set's first
    // n − ceil(t·n) + 1 shingles — so ONLY those prefixes enter the
    // inverted-index join. A naive postings self-join emits up to df²
    // pairs per shingle (260 s at the 10× stress); prefixes shrink the
    // index to ~30% of postings and candidates by orders of magnitude.
    // Exactness is preserved: candidates are verified below against the
    // FULL postings, so output pairs are identical either way.
    val ranked = g.join(dfs, Seq("sh"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
      .join(sizes, Seq("doc_id"))
    // df ≥ 2 is LOSSLESS for the candidate join: a df = 1 shingle's
    // only posting is its own doc, so in the self-join it can only
    // meet itself (killed by id1 < id2) — but rarest-first ordering
    // puts exactly those shingles at the front of every prefix, so
    // without the filter the join shuffles mostly dead rows (the
    // majority of a deduplicated corpus' shingles are unique)
    val prefix = ranked
      .where(col("rk") <= col("n") - ceil(col("n") * threshold) + 1)
      .where(col("df") >= 2)
      .select(col("doc_id"), col("sh"))
    val cand = prefix.select(col("doc_id").as("id1"), col("sh"))
      .join(prefix.select(col("doc_id").as("id2"), col("sh")), Seq("sh"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    // exact verification, map-only per candidate: each doc's capped
    // shingle-hash set rides as ONE sorted array row, candidates join
    // the two compact array tables (#docs rows — broadcast/shuffle-hash
    // on doc id) and |A∩B| computes in place via array_intersect. The
    // alternative — re-exploding postings and shuffling
    // (candidate × shingle) rows — moved ~1e9 rows through an exchange
    // for the same answer on the 10× stress.
    val docArrs = g.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("sh"))).as("arr"),
        count(lit(1)).as("n"))
    cand
      .join(docArrs.select(col("doc_id").as("id1"),
        col("arr").as("a1"), col("n").as("n1")), Seq("id1"))
      .join(docArrs.select(col("doc_id").as("id2"),
        col("arr").as("a2"), col("n").as("n2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        size(array_intersect(col("a1"), col("a2"))).cast("long").as("c"),
        col("n1"), col("n2"))
      .select(col("id1"), col("id2"),
        (col("c").cast(DoubleType) / (col("n1") + col("n2") - col("c"))).as("jac"))
      .where(col("jac") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  /** Directional n-gram CONTAINMENT pairs: |A∩B| / |A| ≥ t — the
    * subset-duplicate detector symmetric Jaccard misses (a doc pasted
    * inside a longer one scores high containment but low Jaccard).
    * Same machinery as [[ngramJaccardPairs]] — hashed shingles, df
    * cap, rarest-first prefix filter, array verification — with the
    * containment-form prefix bound (only the CONTAINED side prunes to
    * a prefix; the container side keeps full postings, since a huge B
    * cannot lower c(A→B)), and the asymmetric score is an unrounded
    * exact-integer quotient. */
  def containmentPairs(docs: DataFrame, threshold: Double = 0.8,
                       maxDf: Long = MaxPostings): DataFrame =
    containmentOver(
      docs.select(col("doc_id"),
        explode(graft.functions.HashFunctions.ngramHashes(col("text"), 3)).as("sh")),
      threshold, maxDf)

  /** The containment engine behind [[containmentPairs]], over ANY
    * (doc_id, sh) token-hash table — text n-grams, video frame
    * signatures ([[Multimodal.dedupFrameContainment]]), whatever hashes
    * to 8 bytes. Directional subset detection with the SSJoin-style
    * prefix filter on the contained side; see containmentPairs for the
    * scale argument. */
  private[graft] def containmentOver(g0: DataFrame, threshold: Double,
                                     maxDf: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dfs = g0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val blocked = dfs.where(col("df") > maxDf).select(col("sh"))
    val g = g0.join(blocked, Seq("sh"), "left_anti")
    val sizes = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val ranked = g.join(dfs, Seq("sh"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
      .join(sizes, Seq("doc_id"))
    // df ≥ 2: lossless here too — a df = 1 shingle's only posting in g
    // is the prefix row's own doc (killed by id1 =!= id2); see the
    // Jaccard path's rationale
    val prefixA = ranked
      .where(col("rk") <= col("n") - ceil(col("n") * threshold) + 1)
      .where(col("df") >= 2)
      .select(col("doc_id").as("id1"), col("sh"))
    val cand = prefixA
      .join(g.select(col("doc_id").as("id2"), col("sh")), Seq("sh"))
      .where(col("id1") =!= col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val docArrs = g.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("sh"))).as("arr"),
        count(lit(1)).as("n"))
    cand
      .join(docArrs.select(col("doc_id").as("id1"), col("arr").as("a1"),
        col("n").as("n1")), Seq("id1"))
      .join(docArrs.select(col("doc_id").as("id2"), col("arr").as("a2")),
        Seq("id2"))
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("a1"), col("a2"))).cast("long")
          .cast(DoubleType) / col("n1")).as("containment"))
      .where(col("containment") >= threshold)
      .select(col("id1").as("contained_id"), col("id2").as("container_id"),
        col("containment"))
      .orderBy(col("contained_id"), col("container_id"))
  }

  def dedupContainment(s: SparkSession, d: String): DataFrame =
    containmentPairs(documents(s, d))

  /** Exact-substring duplicated-span detection (Lee et al. 2021,
    * arXiv:2107.06499) at k-token window resolution: a token is part of
    * a duplicated span iff it sits inside some k-token window whose text
    * occurs in ≥2 distinct documents; overlapping/contiguous duplicated
    * windows merge into maximal spans. Per doc: duplicated-window count,
    * merged-span count, covered-token count and fraction.
    *
    * Spark-first scale shape (the paper builds one suffix array over the
    * concatenated corpus — inherently single-machine): the positional
    * ngram kernel emits one 8-byte hash per window inside the scan (no
    * gram strings ever materialize), "duplicated" is one partial+final
    * count-distinct on the hash, membership is a semi join on the same
    * 8-byte key, and span merging is a per-document lag window bounded
    * by doc length. Nothing in the plan is super-linear in corpus size,
    * and nothing shuffles text. */
  def dedupSubstring(s: SparkSession, d: String): DataFrame =
    substringSpans(documents(s, d))

  def substringSpans(docs: DataFrame, k: Int = 8): DataFrame = {
    import graft.functions.HashFunctions.ngramHashesPos
    val grams = docs.select(col("doc_id"),
      posexplode(ngramHashesPos(col("text"), k)).as(Seq("pos", "g")))
    // windows seen in >=2 DISTINCT docs (within-doc repeats alone are
    // not duplication between documents)
    val dup = grams.groupBy(col("g"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2)
      .select(col("g"))
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val marked = grams.join(dup, Seq("g"), "left_semi")
      .withColumn("prev", lag(col("pos"), 1).over(byPos))
    // window at pos covers tokens [pos, pos+k-1]; a successor at
    // pos' <= pos+k overlaps or touches it (merge), else a new span
    val isNew = col("prev").isNull || (col("pos") - col("prev") > k)
    val spans = marked.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_dup_windows"),
      sum(when(isNew, 1L).otherwise(0L)).as("n_spans"),
      sum(when(isNew, lit(k.toLong))
        .otherwise((col("pos") - col("prev")).cast(LongType))).as("cov"))
    docs
      .select(col("doc_id"),
        size(split(lower(col("text")), "\\s+")).cast(LongType).as("n_words"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        // a shorter-than-k doc's single whole-doc window covers only its
        // own words, hence the cap
        least(coalesce(col("cov"), lit(0L)), col("n_words")).as("dup_tokens"))
      .withColumn("dup_frac",
        round(col("dup_tokens").cast(DoubleType) / col("n_words"), 6))
      .orderBy(col("doc_id"))
  }

  /** (doc_id, simhash) — map-only via the native tf-weighted kernel. */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), simhash64(words(col("text"))).as("simhash"))

  /** SimHash near-dup pairs: 4 bands of 16 bits for candidates, then
    * exact Hamming distance ≤ maxHamming via bit_count(xor). */
  def dedupSimhash(s: SparkSession, d: String, maxHamming: Int = 6): DataFrame =
    simhashPairs(documents(s, d), maxHamming)

  /** 4 × 16-bit band slices of a 64-bit hash column — the shared
    * bucket key of the pairs (verification) and star-edge (collapse)
    * paths, for any 64-bit Hamming-space fingerprint (text simhash,
    * image phash). */
  private def bands64(c: Column): Seq[Column] =
    (0 until 4).map { j =>
      struct(lit(j).as("band"),
        shiftrightunsigned(c, j * 16).bitwiseAND(0xFFFFL).as("bucket"))
    }

  private def simhashBands: Seq[Column] = bands64(col("simhash"))

  /** Hamming-verified star edges over any 64-bit fingerprint column:
    * band into 4 × 16-bit buckets, link each id to its bucket-min root,
    * and keep only edges whose EXACT Hamming distance is ≤ `maxHamming`
    * (bit_count of xor — the verification [[simhashEdges]] deliberately
    * skips for text, where bucket-sharing is the cluster relation;
    * fingerprints with common degenerate bands, like image hashes with
    * flat regions, need it or buckets over-merge). Never all-pairs: a
    * mega-bucket of n members costs n candidate edges. Verification is
    * per-edge, so two near-dups of each other that BOTH differ from
    * their bucket root by > maxHamming link through another shared
    * band, not this one — recall comes from the 4 independent bands
    * (a pair within Hamming 6 of each other agrees exactly on ≥1 of 4
    * 16-bit bands whenever its differing bits cluster, and the root is
    * itself within tolerance transitively for tight clusters). */
  def hamming64StarEdges(hashes: DataFrame, idCol: String, hashCol: String,
                         maxHamming: Int = 6): DataFrame = {
    val tagged = hashes
      .select(col(idCol).as("_id"), col(hashCol).as("_h"))
      .select(col("_id"), col("_h"), explode(array(bands64(col("_h")): _*)).as("bb"))
      .select(col("_id"), col("_h"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val roots = tagged.groupBy(col("band"), col("bucket"))
      .agg(min(struct(col("_id"), col("_h"))).as("r"))
    tagged.join(roots, Seq("band", "bucket"))
      .where(col("_id") =!= col("r._id") &&
        bit_count(col("_h").bitwiseXOR(col("r._h"))) <= maxHamming)
      .select(col("_id").as("id1"), col("r._id").as("id2"))
      .distinct()
  }

  def simhashPairs(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val sh = simhash(docs)
    val bands = simhashBands
    sh.select(explode(array(bands: _*)).as("bb"),
        struct(col("doc_id"), col("simhash")).as("e"))
      .groupBy(col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .agg(collect_list(col("e")).as("es"))
      .where(size(col("es")).between(2, MaxBucket))
      .select(explode(pairCombos(array_sort(col("es")))).as("p"))
      .select(col("p.a.doc_id").as("id1"), col("p.b.doc_id").as("id2"),
        bit_count(col("p.a.simhash").bitwiseXOR(col("p.b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy(col("id1"), col("id2"))
  }

  /** Star-edge form of the simhash band-bucket graph — the same
    * collapse shape as [[minhashLshEdges]], so simhash clusters collapse
    * cap-free: every (band, bucket) contributes (doc → bucket-min)
    * edges, a star has the same connected components as the bucket
    * clique, and a boilerplate mega-bucket costs n edges instead of
    * n(n−1)/2 pairs. No bucket materializes as a list — roots come from
    * a partial+final min agg, edges from a join back on the same
    * (band, bucket) key (exchange reused). Bucket-sharing (16 identical
    * bits) IS the cluster relation here, exactly as band-bucket sharing
    * is for the minhash clusters path; the hamming-verified
    * [[simhashPairs]] remains the candidate-verification surface, and
    * every pair it emits co-clusters on this graph by construction
    * (a verified pair shares a bucket). */
  def simhashEdges(docs: DataFrame): DataFrame = {
    val tagged = simhash(docs)
      .select(col("doc_id"), explode(array(simhashBands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    val roots = tagged.groupBy(col("band"), col("bucket"))
      .agg(min(col("doc_id")).as("root"))
    tagged.join(roots, Seq("band", "bucket"))
      .where(col("doc_id") =!= col("root"))
      .select(col("doc_id").as("id1"), col("root").as("id2"))
      .distinct()
  }

  /** SimHash near-dup cluster ids over the star-edge graph — text →
    * simhash → band buckets → star edges → iterative components.
    * Probabilistic like the pairs path (same buckets). */
  def dedupSimhashClusters(s: SparkSession, d: String): DataFrame =
    Components.connectedComponents(simhashEdges(documents(s, d)))
      .select(col("id").as("doc_id"), col("comp"))
      .orderBy(col("doc_id"))

  /** Duplicate clusters: connected components over the exact-Jaccard
    * pair graph — (doc_id, comp) with comp = min doc_id of the cluster.
    * Oracle-checked: DuckDB reproduces the components via a recursive-CTE
    * transitive closure over the same (deterministic) pair list. */
  def dedupClusters(s: SparkSession, d: String): DataFrame =
    Components.connectedComponents(ngramJaccardPairs(documents(s, d)))
      .select(col("id").as("doc_id"), col("comp"))
      .orderBy(col("doc_id"))

  /** Canonical selection per duplicate cluster — what a curation run
    * actually does with the cluster ids: instead of the arbitrary
    * keep-min-id rule, each exact-Jaccard duplicate cluster keeps its
    * HIGHEST-QUALITY member (text_quality score; ties break to the
    * lower doc_id). Composition of two oracle-green building blocks —
    * the recursive-closure cluster oracle and the text_quality formula
    * (shared CTE, so the ranking can't drift) — which makes the argmax
    * itself oracle-checkable. One row per cluster: the survivor, its
    * quality, and how many members it displaced. Scale shape: the
    * quality pass is map-only (single-pass TextStats kernel), the
    * argmax is one WindowGroupLimit-style top-1 per cluster, and the
    * member count is a `groupBy(comp).agg` joined back AFTER the top-1
    * cut (one count row per cluster meets one survivor row) — not a
    * full-partition count window, which would buffer a boilerplate
    * mega-cluster of millions of identical docs through one task. */
  def dedupCanonical(s: SparkSession, d: String): DataFrame = {
    val clusters = Components.connectedComponents(
        ngramJaccardPairs(documents(s, d)))
      .select(col("id").as("doc_id"), col("comp"))
    val quality = TextAnalysis.textQuality(s, d)
      .select(col("doc_id"), col("quality"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("comp"))
    val members = clusters.join(quality, Seq("doc_id"))
    val sizes = members.groupBy(col("comp"))
      .agg(count(lit(1)).as("n_members"))
    members
      .withColumn("rn", row_number().over(
        w.orderBy(col("quality").desc, col("doc_id"))))
      .where(col("rn") === 1)
      .join(sizes, Seq("comp"))
      // quality passes through UNROUNDED: the per-row double is
      // bit-identical across engines (text_quality proves it at every
      // scale), while round(x, 6) is NOT portable — the quality ratios
      // produce exact .5e-6 ties (dyadic denominators), and Spark
      // rounds the shortest decimal repr (BigDecimal.valueOf → 0.2509375
      // → HALF_UP up) where DuckDB rounds the binary value (…49999998 →
      // down). Caught by the sf1 oracle run.
      .select(col("comp"), col("doc_id").as("keep_id"),
        col("quality"), col("n_members"))
      .orderBy(col("comp"))
  }

  /** Shared-prefix duplicate groups: docs whose first `k` characters
    * are identical — the boilerplate-header signature of scraped
    * corpora (same template preamble, different tails), which full-text
    * exact dedup misses and near-dup passes pay MinHash for. The
    * shuffle carries the 16-byte digest of the PREFIX (never text);
    * groups come from a partial+final agg, and membership attaches
    * with a second pruned scan joined on the digest — an agg + join,
    * NOT a window partitioned by the digest: a boilerplate prefix
    * shared by millions of docs is exactly the skewed partition a
    * per-group window would funnel through one task. */
  def dedupPrefix(docs: DataFrame, k: Int = 64): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      md5(substring(col("text"), 1, k)).as("ph"))
    val groups = keyed.groupBy(col("ph"))
      .agg(count(lit(1)).as("group_size"),
        min(col("doc_id")).as("prefix_group"))
      .where(col("group_size") > 1)
    keyed.join(groups, Seq("ph"))
      .select(col("doc_id"), col("prefix_group"), col("group_size"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_prefix" -> ((s: SparkSession, d: String) =>
      dedupPrefix(documents(s, d))),
    "dedup_canonical" -> (dedupCanonical _),
    "dedup_exact" -> (dedupExact _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_snapshot_diff" -> (dedupSnapshotDiff _),
    "dedup_minhash_lsh" -> ((s: SparkSession, d: String) => dedupMinhashLsh(s, d)),
    "dedup_minhash_clusters" -> (dedupMinhashClusters _),
    "dedup_minhash_calibration" -> (dedupMinhashCalibration _),
    "dedup_cluster_size_hist" -> (dedupClusterSizeHist _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_containment" -> (dedupContainment _),
    "dedup_substring" -> (dedupSubstring _),
    "dedup_simhash" -> ((s: SparkSession, d: String) => dedupSimhash(s, d)),
    "dedup_simhash_clusters" -> (dedupSimhashClusters _),
    "dedup_clusters" -> (dedupClusters _)
  )

  /** Shared CTE text: the exact-Jaccard pair list (DuckDB dialect),
    * reused by the pair oracle and the cluster oracle. */
  private val jaccardPairsCtes: String =
    s"""t AS (
      |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
      |  FROM documents
      |), g0 AS (
      |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) >= 3
      |    THEN list_transform(generate_series(1, len(w) - 2),
      |         i -> array_to_string(list_slice(w, i, i + 2), ' '))
      |    ELSE [array_to_string(w, ' ')] END)) AS sh
      |  FROM t
      |), g AS (  -- postings cap mirrored from ngramJaccardPairs
      |  SELECT doc_id, sh FROM g0
      |  WHERE sh NOT IN (
      |    SELECT sh FROM g0 GROUP BY sh HAVING count(*) > $MaxPostings)
      |), sz AS (
      |  SELECT doc_id, count(*) AS n FROM g GROUP BY 1
      |), inter AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
      |  FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT id1, id2,
      |    CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jac
      |  FROM inter
      |  JOIN sz sa ON sa.doc_id = id1
      |  JOIN sz sb ON sb.doc_id = id2
      |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.7
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_prefix" ->
      """WITH k AS (
        |  SELECT doc_id, md5(substr(text, 1, 64)) AS ph FROM documents
        |), g AS (
        |  SELECT ph, count(*) AS group_size, min(doc_id) AS prefix_group
        |  FROM k GROUP BY ph HAVING count(*) > 1
        |)
        |SELECT doc_id, prefix_group, group_size
        |FROM k JOIN g USING (ph) ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin,

    "dedup_incremental" ->
      """WITH corpus AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents
        |  WHERE doc_id % 10 <> 0
        |), b AS (
        |  SELECT md5(text) AS h, min(doc_id) AS doc_id,
        |    count(*) AS n_in_batch
        |  FROM documents WHERE doc_id % 10 = 0 GROUP BY 1
        |)
        |SELECT doc_id, n_in_batch FROM b
        |WHERE h NOT IN (SELECT h FROM corpus)
        |ORDER BY doc_id""".stripMargin,

    "dedup_snapshot_diff" ->
      """WITH o AS (
        |  SELECT doc_id, md5(text) AS h_old FROM documents
        |  WHERE doc_id % 7 <> 0
        |), n AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 3 = 0 THEN text || ' [edited]'
        |        ELSE text END) AS h_new
        |  FROM documents WHERE doc_id % 5 <> 0
        |)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN h_old IS NULL THEN 'added'
        |       WHEN h_new IS NULL THEN 'removed'
        |       WHEN h_old <> h_new THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |WHERE CASE WHEN h_old IS NULL THEN 'added'
        |       WHEN h_new IS NULL THEN 'removed'
        |       WHEN h_old <> h_new THEN 'changed'
        |       ELSE 'unchanged' END <> 'unchanged'
        |ORDER BY doc_id""".stripMargin,

    // The window-gram stream replays in DuckDB as 8-token slice strings
    // (same tokenization as the kernel, incl. the lower() and the
    // short-doc whole-text gram via greatest(len-7, 1) + slice
    // truncation); grouping by the string is equivalent to grouping by
    // the kernel's collision-free 64-bit gram hash.
    "dedup_substring" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, pos,
        |    array_to_string(list_slice(w, pos, pos + 7), ' ') AS gram
        |  FROM (SELECT doc_id, w,
        |          unnest(generate_series(1, greatest(len(w) - 7, 1))) AS pos
        |        FROM t)
        |), dup AS (
        |  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
        |), m AS (
        |  SELECT doc_id, pos,
        |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |  FROM g WHERE gram IN (SELECT gram FROM dup)
        |), a AS (
        |  SELECT doc_id,
        |    CAST(count(*) AS BIGINT) AS n_dup_windows,
        |    CAST(sum(CASE WHEN prev IS NULL OR pos - prev > 8
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
        |    CAST(sum(CASE WHEN prev IS NULL OR pos - prev > 8
        |      THEN 8 ELSE pos - prev END) AS BIGINT) AS cov
        |  FROM m GROUP BY doc_id
        |)
        |SELECT t.doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |  coalesce(n_dup_windows, 0) AS n_dup_windows,
        |  coalesce(n_spans, 0) AS n_spans,
        |  least(coalesce(cov, 0), CAST(len(w) AS BIGINT)) AS dup_tokens,
        |  round(CAST(least(coalesce(cov, 0), CAST(len(w) AS BIGINT)) AS DOUBLE)
        |    / len(w), 6) AS dup_frac
        |FROM t LEFT JOIN a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // Exact Jaccard is SQL-expressible in DuckDB with list lambdas; the
    // MinHash/SimHash queries are probabilistic candidate generators and
    // are covered by ScalaTest with planted duplicates instead.
    "dedup_containment" ->
      s"""WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
        |  FROM documents
        |), g0 AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w) - 2),
        |         i -> array_to_string(list_slice(w, i, i + 2), ' '))
        |    ELSE [array_to_string(w, ' ')] END)) AS sh
        |  FROM t
        |), g AS (
        |  SELECT doc_id, sh FROM g0
        |  WHERE sh NOT IN (
        |    SELECT sh FROM g0 GROUP BY sh HAVING count(*) > $MaxPostings)
        |), sz AS (
        |  SELECT doc_id, count(*) AS n FROM g GROUP BY 1
        |), inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
        |  FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id1 AS contained_id, id2 AS container_id,
        |  CAST(c AS DOUBLE) / s1.n AS containment
        |FROM inter JOIN sz s1 ON inter.id1 = s1.doc_id
        |WHERE CAST(c AS DOUBLE) / s1.n >= 0.8
        |ORDER BY contained_id, container_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH $jaccardPairsCtes
        |SELECT id1, id2, jac FROM pairs
        |ORDER BY id1, id2""".stripMargin,

    // Connected components as a recursive transitive closure: UNION
    // (not UNION ALL) dedups rows each step, so the recursion reaches a
    // fixpoint once every reachable (a, b) has been seen.
    "dedup_cluster_size_hist" ->
      s"""WITH RECURSIVE $jaccardPairsCtes,
        |edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION
        |  SELECT id2 AS a, id1 AS b FROM pairs
        |), reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        |), comps AS (
        |  SELECT a AS doc_id, least(a, min(b)) AS comp
        |  FROM reach GROUP BY a
        |), sizes AS (
        |  SELECT comp, count(*) AS cluster_size FROM comps GROUP BY comp
        |)
        |SELECT cluster_size, count(*) AS n_clusters,
        |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs
        |FROM sizes GROUP BY cluster_size
        |ORDER BY cluster_size""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE $jaccardPairsCtes,
        |edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION
        |  SELECT id2 AS a, id1 AS b FROM pairs
        |), reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        |)
        |SELECT a AS doc_id, least(a, min(b)) AS comp
        |FROM reach GROUP BY a
        |ORDER BY doc_id""".stripMargin,

    "dedup_canonical" ->
      s"""WITH RECURSIVE $jaccardPairsCtes,
        |edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION
        |  SELECT id2 AS a, id1 AS b FROM pairs
        |), reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        |), comps AS (
        |  SELECT a AS doc_id, least(a, min(b)) AS comp
        |  FROM reach GROUP BY a
        |), ${graft.operators.TextAnalysis.qualityCteSql},
        |ranked AS (
        |  SELECT comp, c.doc_id, quality,
        |    count(*) OVER (PARTITION BY comp) AS n_members,
        |    row_number() OVER (PARTITION BY comp
        |      ORDER BY quality DESC, c.doc_id) AS rn
        |  FROM comps c JOIN qual USING (doc_id)
        |)
        |SELECT comp, doc_id AS keep_id, quality,
        |  n_members
        |FROM ranked WHERE rn = 1 ORDER BY comp""".stripMargin
  )
}
