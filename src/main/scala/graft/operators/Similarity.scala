package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables._
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.C).
  *
  * Scale design:
  *   - brute-force is the correctness baseline: the (small) query set is
  *     broadcast, scoring is map-only over the corpus scan, and only the
  *     scored rows shuffle once on q_id for the per-query top-k. At 100 TB
  *     the LSH path below replaces the full scan.
  *   - LSH ANN: L independent random-hyperplane tables of b bits each;
  *     a vector lands in L buckets (map-only signature computation), the
  *     query's buckets are joined (broadcast — the query side is tiny),
  *     and exact rescoring touches only in-bucket candidates. Work scales
  *     with bucket occupancy, not corpus size.
  *
  * Corpus-scaled parameters (round-3): when a caller does not pin them,
  * `b` (bucket bits) derives from the corpus count so expected bucket
  * occupancy stays ~constant as the corpus grows (b ≈ log2(n/target)),
  * and `L` (tables) derives from the standard LSH recall identity
  * 1−(1−p^b)^L ≥ R with p = 1 − θ/π the per-bit sign-agreement
  * probability at the expected neighbor cosine. The corpus count is one
  * metadata-only parquet count — the only eager job in these builders,
  * and unavoidable: b/L parameterize literal hyperplanes at plan time.
  * Every ANN result row carries BOTH `recall` (quality) and `cand_frac`
  * (cost: candidates examined / corpus) so the gate sees the trade.
  *
  * Geometry note: the synthetic corpus is near-isotropic (top-10
  * neighbors at cosine ≈ 0.3, background ≈ 0) — the hardest regime for
  * LSH; the default `neighborCos = 0.3` reproduces the tuned (L=12, b=4)
  * at gate scale. Real embedding corpora have neighbors at cosine ≥ 0.7,
  * where the same derivation yields deep codes (large b) with few tables
  * — candidate sets shrink to ~L·n/2^b while recall holds. When the
  * neighbor/background gap is NARROW and n is huge, the identity demands
  * more tables than the clamp allows: that is LSH's real limit (IVF
  * below degrades more gracefully there), and the emitted cand_frac
  * makes the failure visible instead of silent.
  */
object Similarity {

  private val K = 10
  private val NumQueries = 10

  /** Degenerate-bucket cap, same rationale as Dedup.MaxBucket: a bucket
    * holding more than this many vectors is non-discriminative (at any
    * corpus size the DERIVED b keeps expected occupancy ~64, so only
    * pathological mass — e.g. a constant embedding column — trips it)
    * and would make the in-bucket pair expansion quadratic. Dropped,
    * with the recall loss documented; the clustering-scale collapse for
    * such degenerate mass is the components path, not pairwise output. */
  private val MaxBucket = 1000L

  private def ceilLog2(x: Long): Int =
    if (x <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x - 1)

  private def clamp(lo: Int, hi: Int, v: Int): Int = math.min(hi, math.max(lo, v))

  /** Corpus size — metadata-only count over the (column-pruned) scan. */
  private def corpusCount(emb: DataFrame): Long = emb.count()

  /** b so that expected occupancy n/2^b ≈ targetOccupancy. */
  private def derivedBits(n: Long, targetOccupancy: Long,
                          minB: Int, maxB: Int): Int =
    clamp(minB, maxB, ceilLog2(math.max(1L, n / targetOccupancy)))

  /** L from the recall identity 1−(1−p^b)^L ≥ targetRecall, where
    * p = 1 − arccos(neighborCos)/π. Clamped: past the cap more tables
    * stop paying (cand_frac exposes the resulting recall shortfall). */
  private def derivedTables(b: Int, neighborCos: Double,
                            targetRecall: Double, maxL: Int = 48): Int = {
    derivedTablesImpl(b, neighborCos, targetRecall, maxL)
  }

  /** Reporting twin of the in-operator LSH derivation (AnnStress prints
    * what simAnnLsh will actually use at a given corpus size). */
  private[graft] def lshParams(n: Long, neighborCos: Double = 0.3,
                               targetRecall: Double = 0.8): (Int, Int) = {
    val b = derivedBits(n, 256L, 4, 16)
    (b, derivedTablesImpl(b, neighborCos, targetRecall, 48))
  }

  /** Derived cell count shared by IVF (targetCellSize=64) and SemDeDup
    * (targetCellSize=1024) — one formula, used by the operators and
    * reported by AnnStress so the two can't drift. */
  private[graft] def ivfK(n: Long, targetCellSize: Long): Int =
    clamp(32, 512, math.ceil(n.toDouble / targetCellSize).toInt)

  /** Derived probe count: ~6% of cells, floor 8 (= the hand-tuned probe
    * at the k=32 clamp floor), cap 64 — constant examined fraction as k
    * derives upward (see simAnnIvf doc). */
  private[graft] def ivfNProbe(k: Int): Int =
    clamp(8, 64, math.ceil(k * 0.06).toInt)

  /** Derived PQ rerank budget: ~0.25% of the corpus, floor 50 — a FIXED
    * short list quantization-displaces true neighbors out as n grows
    * (ε-rate approx-distance impostors scale with n, so the list must
    * too; AnnStress measured recall 0.57 → 0.30 going 20 k → 100 k at a
    * pinned 50). Constant fraction holds recall flat while the exact
    * rescore stays ~400× under brute force. */
  private[graft] def pqRerank(n: Long): Int =
    clamp(50, 5000, math.ceil(n * 0.0025).toInt)

  private def derivedTablesImpl(b: Int, neighborCos: Double,
                                targetRecall: Double, maxL: Int): Int = {
    val p = 1.0 - math.acos(neighborCos) / math.Pi
    val perTable = math.pow(p, b)
    clamp(6, maxL, math.ceil(math.log(1 - targetRecall) / math.log1p(-perTable)).toInt)
  }

  /** Deterministic random hyperplanes: L tables × b bits × dim coords. */
  private def planes(L: Int, b: Int, dim: Int): Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(42)
    Array.fill(L, b, dim)(rng.nextGaussian())
  }

  /** Per-table bucket codes for one embedding column (array<long>,
    * index = table): bit j of a table's bucket is the sign of the
    * projection onto hyperplane j. One native matrix kernel — the
    * earlier unrolled when(dot(v, literal)) tree blew janino's 64 KB
    * method limit (whole-stage codegen fell back to interpreted rows)
    * as soon as the DERIVED L·b left the clamp floor; the kernel emits
    * bit-identical codes at any L·b·dim (AnnStress proves both). */
  private[graft] def buckets(v: Column, L: Int, b: Int, dim: Int): Column =
    hyperplaneCodes(v, planes(L, b, dim).flatten.flatten, L, b, dim)

  private def queriesSet(emb: DataFrame): DataFrame =
    emb.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  /** Exact cosine top-k per query vector: broadcast queries, map-side
    * scoring, one shuffle on q_id for the ranking window. */
  def simTopkBruteforce(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val scored = emb.crossJoin(broadcast(queriesSet(emb)))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("score"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("vec_id"))))
      .where(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), col("score"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Exact cosine RANGE search: every corpus vector within `threshold`
    * of each query — the radius form of [[simTopkBruteforce]] (recall
    * mining, policy screens: "give me EVERYTHING this close", where a
    * top-k budget would truncate dense neighborhoods arbitrarily). Same
    * broadcast-queries map-side scoring, but the range predicate makes
    * the shuffle carry only matches — output-bound, not k·|Q|-bound.
    * The LSH/IVF family is the sub-linear scale path (bucket, probe,
    * exact-rescore ≥ threshold); this exact form is its
    * oracle-checkable twin, bit-stable cosine like the top-k path. */
  def simRangeSearch(s: SparkSession, d: String,
                     threshold: Double = 0.4): DataFrame = {
    val emb = embeddings(s, d)
    emb.crossJoin(broadcast(queriesSet(emb)))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("score"))
      .where(col("score") >= threshold)
      .orderBy(col("q_id"), col("vec_id"))
  }

  /** Append per-query recall vs the exact brute-force top-k, so the ANN
    * quality number is driver-visible in the gate output (not just row
    * counts). Diagnostic join: the exact twin runs at test scale; at
    * corpus scale recall is measured the same way but over a sampled
    * query set, never the full corpus. Passes `cand_frac` (cost twin of
    * recall) through untouched. */
  private def annWithRecall(s: SparkSession, d: String, ann: DataFrame,
                            costCols: Seq[String] = Seq("cand_frac")): DataFrame = {
    val exact = simTopkBruteforce(s, d)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    ann.join(exact, Seq("q_id", "vec_id"), "left")
      .withColumn("recall",
        round(sum(coalesce(col("hit"), lit(0)))
          .over(Window.partitionBy(col("q_id"))) / K.toDouble, 4))
      .select((Seq("q_id", "rank", "vec_id", "score", "recall")
        ++ costCols).map(col): _*)
      .orderBy(col("q_id"), col("rank"))
  }

  /** ANN top-k via random-hyperplane LSH: candidates are vectors sharing
    * ≥1 (table, bucket) with the query; exact cosine rescoring on the
    * candidate set only. L and b derive from the corpus count when not
    * pinned (see object doc); at n=500 the derivation reproduces the
    * hand-tuned (L=12, b=4). */
  def simAnnLsh(s: SparkSession, d: String,
                L: Int = 0, b: Int = 0, dim: Int = 64,
                neighborCos: Double = 0.3,
                targetRecall: Double = 0.8): DataFrame = {
    val emb = embeddings(s, d)
    val n = corpusCount(emb)
    val bEff = if (b > 0) b else derivedBits(n, 256L, 4, 16)
    val lEff = if (L > 0) L else derivedTables(bEff, neighborCos, targetRecall)
    val corpus = emb
      .select(col("vec_id"), col("embedding"),
        posexplode(buckets(col("embedding"), lEff, bEff, dim))
          .as(Seq("table", "bucket")))
    val qs = queriesSet(emb)
      .select(col("q_id"), col("q_emb"),
        posexplode(buckets(col("q_emb"), lEff, bEff, dim))
          .as(Seq("table", "bucket")))
    // score first, dedupe after: the (q_id, vec_id) aggregate then
    // carries one double — a codegen'd HashAggregate — instead of
    // dragging embedding arrays through a SortAggregate-forcing
    // dropDuplicates. A vector hit by k tables rescans its cosine k≤L
    // times, which is cheaper than per-partition sorts of wide rows.
    val deduped = corpus.join(broadcast(qs), Seq("table", "bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("score"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(max(col("score")).as("score"))
    // cand_frac = distinct candidates rescored / corpus — the cost this
    // query actually paid, next to the recall it bought. Same partition
    // key as the rank window: one exchange serves both.
    val wq = Window.partitionBy(col("q_id"))
    deduped
      .withColumn("cand_frac",
        round(count(lit(1)).over(wq) / lit(n.toDouble), 4))
      .withColumn("rank", row_number().over(
        wq.orderBy(col("score").desc, col("vec_id"))))
      .where(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), col("score"), col("cand_frac"))
      .transform(annWithRecall(s, d, _))
  }

  /** Multi-probe LSH ANN (Lv et al. 2007): the corpus keeps ONE code
    * per table but each query also probes the nProbe−1 buckets reached
    * by flipping its lowest-|projection|-margin bits — the buckets a
    * true neighbor most likely landed in when one low-confidence sign
    * disagreed. Why it matters at 100 TB: the bucketed index (and the
    * per-vector signature compute at ingest) costs ∝ L, and the
    * standard derivation clamps at L=48 on hard geometry; multi-probe
    * buys the recall of many tables with L/4 of the index — probing is
    * a QUERY-side cost and queries are tiny by definition. Candidate
    * volume stays ≈ (L·nProbe) buckets of derived occupancy, the same
    * trade the single-probe path pays with 4× the tables. AnnStress
    * compares the two head-to-head at 10×/50×. */
  def simAnnLshMultiprobe(s: SparkSession, d: String,
                          L: Int = 12, b: Int = 0, nProbe: Int = 4,
                          dim: Int = 64): DataFrame = {
    val emb = embeddings(s, d)
    val n = corpusCount(emb)
    val bEff = if (b > 0) b else derivedBits(n, 256L, 4, 16)
    val flatPlanes = planes(L, bEff, dim).flatten.flatten
    val corpus = emb
      .select(col("vec_id"), col("embedding"),
        posexplode(buckets(col("embedding"), L, bEff, dim))
          .as(Seq("table", "bucket")))
    val qs = queriesSet(emb)
      .select(col("q_id"), col("q_emb"),
        posexplode(graft.functions.VectorFunctions.hyperplaneProbes(
          col("q_emb"), flatPlanes, L, bEff, dim, nProbe))
          .as(Seq("pos", "bucket")))
      .select(col("q_id"), col("q_emb"),
        (col("pos") / nProbe).cast("int").as("table"), col("bucket"))
    val deduped = corpus.join(broadcast(qs), Seq("table", "bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("score"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(max(col("score")).as("score"))
    val wq = Window.partitionBy(col("q_id"))
    deduped
      .withColumn("cand_frac",
        round(count(lit(1)).over(wq) / lit(n.toDouble), 4))
      .withColumn("rank", row_number().over(
        wq.orderBy(col("score").desc, col("vec_id"))))
      .where(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), col("score"), col("cand_frac"))
      .transform(annWithRecall(s, d, _))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed candidate
    * generation (same hyperplane tables as ANN) + exact cosine
    * rescoring ≥ threshold. The strict-threshold variant of similarity
    * search — near-identical vectors agree on nearly all hyperplane
    * signs, so b runs finer than the ANN derivation (target occupancy
    * 64) and candidates stay sparse at corpus scale. */
  def dedupEmbedCosine(s: SparkSession, d: String, threshold: Double = 0.9,
                       L: Int = 8, b: Int = 0, dim: Int = 64): DataFrame =
    embedCosinePairs(embeddings(s, d), threshold, L, b, dim)

  /** Round-3 scale shape (replaces the collect_list-of-embeddings
    * aggregate, which held whole buckets in one aggregation buffer —
    * a hot bucket OOM'd it and the in-list expansion was O(n²)):
    *
    *   1. bucket membership stays ROWS — embeddings never aggregate;
    *   2. degenerate buckets (> maxBucket members) are dropped up front
    *      by a count agg + semi join on the same (table, bucket) key the
    *      pair join shuffles on, so the exchange is reused;
    *   3. candidates come from the capped bucketed self-join — a
    *      streaming sort-merge/shuffle-hash join whose per-bucket work
    *      is bounded by maxBucket², never corpus-shaped;
    *   4. score-then-dedupe, as in simAnnLsh: cosine computes per
    *      bucket-collision, then the (id1, id2) groupBy carries one
    *      double through a codegen'd HashAggregate.
    *
    * b derives from the corpus count (occupancy ~64) when not pinned. */
  def embedCosinePairs(emb: DataFrame, threshold: Double = 0.9,
                       L: Int = 8, b: Int = 0, dim: Int = 64,
                       maxBucket: Long = MaxBucket): DataFrame = {
    val bEff = if (b > 0) b else derivedBits(corpusCount(emb), 64L, 6, 20)
    val bucketed = emb
      .select(col("vec_id"), col("embedding"),
        posexplode(buckets(col("embedding"), L, bEff, dim))
          .as(Seq("table", "bucket")))
    val liveBuckets = bucketed.groupBy(col("table"), col("bucket"))
      .agg(count(lit(1)).as("bn"))
      .where(col("bn").between(2L, maxBucket))
      .select(col("table"), col("bucket"))
    val pruned = bucketed.join(liveBuckets, Seq("table", "bucket"), "left_semi")
    val a = pruned.select(col("table"), col("bucket"),
      col("vec_id").as("id1"), col("embedding").as("e1"))
    val bSide = pruned.select(col("table"), col("bucket"),
      col("vec_id").as("id2"), col("embedding").as("e2"))
    a.join(bSide, Seq("table", "bucket"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosine(col("e1"), col("e2")).as("cos"))
      .where(col("cos") >= threshold)
      .groupBy(col("id1"), col("id2"))
      .agg(max(col("cos")).as("cos"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Exact embedding near-dup pairs — the correctness baseline twin of
    * [[dedupEmbedCosine]]: all-pairs exact cosine at a threshold low
    * enough to exercise real rows on the synthetic corpus, DuckDB
    * oracle-checked bit-exact. The all-pairs join (an intentional
    * broadcast nested-loop at test scale) exists to pin the semantics;
    * at corpus scale the LSH-bucketed variant IS the plan. */
  def dedupEmbedExact(s: SparkSession, d: String,
                      threshold: Double = 0.45): DataFrame = {
    val e = embeddings(s, d)
    val a = e.select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("id2"), col("embedding").as("e2"))
    a.join(broadcast(b), col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosine(col("e1"), col("e2")).as("cos"))
      .where(col("cos") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  /** ANN top-k via IVF (inverted-file index): k-means coarse quantizer
    * assigns every vector to a cell (one sample fit + one map-only
    * transform); each query probes its `nProbe` nearest cells and
    * rescores exactly only inside them. k derives from the corpus count
    * (cells of ~64 vectors) when not pinned, and nProbe derives WITH it
    * (~6% of cells, floor 8): a fixed probe count tuned at the k=32
    * clamp floor probes 25% of cells there but 2.5% at k=313, and
    * AnnStress measured exactly that recall collapse (0.58 → 0.34) on
    * the isotropic corpus. Probing a constant cell fraction keeps
    * per-query cost a constant fraction of the corpus — still ~16×
    * under brute force — with recall degrading only with geometry, not
    * with n. On real embedding corpora (neighbors at cos ≥ 0.7)
    * neighbors concentrate in the query's own cell and recall rides
    * well above this isotropic floor (the planted-twin spec pins the
    * concentrated regime at 100%). The sample-fit stays sound up to
    * the k clamp (≥8 sample points per cell at 4096). At corpus scale
    * assignments persist with the data and only the probe runs per
    * query. Centroids are tiny (k × dim) and ride along as a codegen
    * reference object inside the native nearest_cells kernel — no
    * shuffle to probe, no unrolled literal tree to break codegen at
    * the k=512 cap. */
  def simAnnIvf(s: SparkSession, d: String,
                k: Int = 0, nProbe: Int = 0,
                targetCellSize: Long = 64L): DataFrame = {
    val emb = embeddings(s, d)
    val n = corpusCount(emb)
    val kEff = if (k > 0) k else ivfK(n, targetCellSize)
    val nProbeEff = if (nProbe > 0) nProbe else ivfNProbe(kEff)
    // coarse quantizer fit on a bounded driver-side sample — the honest
    // pattern at corpus scale too (k-means converges on a sample; only
    // the assignment pass touches all data). Plain Lloyd's keeps the
    // engine free of serialization-fragile deps on the query path.
    val sample = fitSample(emb)
    val centroids = lloyds(sample, kEff, iters = 10, seed = 42)
    val assigned = emb.select(col("vec_id"), col("embedding"),
      nearestCell(col("embedding"), centroids).as("cell"))

    // per-query probe list: the nProbe nearest cells by L2, straight
    // from the native centroid-matrix kernel
    val qs = queriesSet(emb)
      .select(col("q_id"), col("q_emb"),
        explode(graft.functions.VectorFunctions.nearestCells(
          col("q_emb"), centroids.flatten, kEff,
          centroids.head.length, nProbeEff)).as("cell"))
    val wq = Window.partitionBy(col("q_id"))
    assigned.join(broadcast(qs), Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("score"))
      .withColumn("cand_frac",
        round(count(lit(1)).over(wq) / lit(n.toDouble), 4))
      .withColumn("rank", row_number().over(
        wq.orderBy(col("score").desc, col("vec_id"))))
      .where(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), col("score"), col("cand_frac"))
      .transform(annWithRecall(s, d, _))
  }

  /** IVF tuning curve — mean recall and mean candidate fraction as a
    * function of nProbe, on one shared coarse quantizer (same seed,
    * same sample fit, so per-query candidate sets NEST across levels
    * and recall is monotone by construction). This is the knob-setting
    * readout an ANN deployment publishes: pick the leftmost point on
    * the curve meeting the recall SLO and you've also picked its cost.
    * n_queries is per row because a query whose probed cells are empty
    * at nProbe=1 has no candidates and drops from that level. */
  def annRecallCurve(s: SparkSession, d: String,
                     probes: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame =
    probes.map { p =>
      simAnnIvf(s, d, nProbe = p)
        .select(col("q_id"), col("recall"), col("cand_frac")).distinct()
        .agg(round(avg(col("recall")), 4).as("mean_recall"),
          round(avg(col("cand_frac")), 4).as("mean_cand_frac"),
          count(lit(1)).as("n_queries"))
        .select(lit(p).as("nprobe"), col("mean_recall"),
          col("mean_cand_frac"), col("n_queries"))
    }.reduce(_.unionAll(_)).orderBy(col("nprobe"))

  def simAnnRecallCurve(s: SparkSession, d: String): DataFrame =
    annRecallCurve(s, d)

  /** IVF with the index AT REST — the 100 TB serving layout of
    * [[simAnnIvf]]. The cell assignments persist PARTITIONED BY CELL
    * (one directory per coarse cell, the on-disk twin of a FAISS
    * inverted list); a query then reads `embeddings` back through the
    * partition column, so the `cell IN (probe list)` filter prunes at
    * the DIRECTORY level — the scan touches ~nProbe/k of the files on
    * disk before a single row deserializes (PlanRegressionSpec proves
    * PartitionFilters + file-count pruning). This is the difference
    * between "the join discards non-probed cells" (simAnnIvf — still
    * reads the corpus once per query batch) and "the I/O never
    * happens" — at 100 TB the index is written once, re-probed
    * forever, and each query batch pays only its probed cells.
    * Results are bit-identical to simAnnIvf by construction (same
    * sample fit, same kernel assignment, same probe list — the spec
    * asserts row equality). Index dir is content-keyed by corpus path
    * so gate re-runs overwrite idempotently. */
  def simAnnIvfPersisted(s: SparkSession, d: String,
                         k: Int = 0, nProbe: Int = 0,
                         targetCellSize: Long = 64L): DataFrame = {
    val emb = embeddings(s, d)
    val n = corpusCount(emb)
    val kEff = if (k > 0) k else ivfK(n, targetCellSize)
    val nProbeEff = if (nProbe > 0) nProbe else ivfNProbe(kEff)
    // full lifecycle in AnnIndex: build persists assignments +
    // centroids + fit meta (so later batches can APPEND against the
    // same geometry — AnnIndex.append/maintain); query turns the
    // driver-computed probe lists (tiny online side, same kernel as
    // the build) into a STATIC `cell IN (...)` predicate — the scan
    // prunes partition DIRECTORIES at plan time, no dynamic-pruning
    // machinery in the loop
    val indexDir = ivfIndexDir(d, kEff)
    AnnIndex.build(s, emb, indexDir, k = kEff)
    AnnIndex.query(s, indexDir, queriesSet(emb), nProbeEff, K,
        candFracOver = n)
      .transform(annWithRecall(s, d, _))
  }

  /** Persisted-index serving probe — the headline-bench form of the
    * serving layer: the index is built ONCE per JVM (write-once /
    * probe-forever, the actual serving deployment shape) and every
    * subsequent call pays only the probe — driver-side cell
    * assignment for the tiny query set, then a scan of the probed
    * cell DIRECTORIES via the static partition filter. Under the
    * bench variance protocol the first run absorbs the build and the
    * MIN across runs measures steady-state serving cost, which is
    * exactly what BENCH_r{N}.json should track round over round (a
    * serving regression — pruning lost, tombstone join gone wide —
    * moves the min; build cost drift is visible as spread instead).
    * No recall join here, unlike the sim_ann_* gate entries: recall
    * is pinned by spec (equality with simAnnIvfPersisted, whose
    * recall the AnnStress legs measure); computing it per bench run
    * would time the brute-force twin, not the serving path. */
  def serveAnnProbe(s: SparkSession, d: String,
                    nProbe: Int = 0, topK: Int = K,
                    indexDir: String = ""): DataFrame = {
    val emb = embeddings(s, d)
    val n = corpusCount(emb)
    val kEff = ivfK(n, 64L)
    // explicit indexDir (the REPL DDL flow: `index build ann <dir>`,
    // then `pipeline serve_ann_probe indexDir=<dir>`) probes THAT
    // committed index; otherwise a derived per-corpus dir, built on
    // first touch
    val dirEff = if (indexDir.nonEmpty) indexDir
                 else ivfIndexDir(d, kEff, "serve")
    if (!AnnIndex.hasIndex(s, dirEff))
      AnnIndex.build(s, emb, dirEff, k = kEff)
    AnnIndex.query(s, dirEff, queriesSet(emb), nProbe = nProbe, topK = topK)
  }

  /** SLO-tuned serving probe — [[serveAnnProbe]] with the probe count
    * picked by [[AnnIndex.tune]] instead of the derived heuristic:
    * build + tune once per JVM (the recall curve is maintenance work,
    * priced with the build), then every call probes with the STAMPED
    * default (nProbe = 0 → the tune stamp), so the bench MIN tracks
    * SLO-serving cost. Output carries the stamp and its measured
    * recall so the gate artifact shows WHICH knob the SLO bought.
    * Rows-only (recall thresholds aren't SQL-expressible);
    * AnnIndexSpec pins minimal-grid-point selection, stamp honoring
    * by query/queryPq, and rebuild retirement. */
  def simAnnTuned(s: SparkSession, d: String,
                  recallSLO: Double = 0.9): DataFrame = {
    val emb = embeddings(s, d)
    val n = corpusCount(emb)
    val kEff = ivfK(n, 64L)
    val dirEff = ivfIndexDir(d, kEff, "tuned", s"slo=$recallSLO")
    if (!AnnIndex.hasIndex(s, dirEff)) {
      AnnIndex.build(s, emb, dirEff, k = kEff)
      AnnIndex.tune(s, dirEff, queriesSet(emb), recallSLO)
    }
    val t = s.read.parquet(s"$dirEff/tuned").collect().head
    AnnIndex.query(s, dirEff, queriesSet(emb), nProbe = 0, topK = K)
      .withColumn("tuned_nprobe", lit(t.getAs[Int]("n_probe")))
      .withColumn("tuned_recall",
        round(lit(t.getAs[Double]("recall")), 4))
  }

  /** The gate's shared three-tier index (raw 1× / SQ8 4× / PQ 32× over
    * one corpus, one coarse geometry) — built ONCE per JVM, the
    * serve_ann_probe discipline: [[simAnnTierAdvised]] and
    * [[simAnnTierCurve]] both read it, so the advice and the curve
    * are measurements of the SAME artifacts a deployment would hold. */
  private def tiersDir(s: SparkSession, d: String): String = {
    val emb = embeddings(s, d)
    val kEff = ivfK(corpusCount(emb), 64L)
    val dir = ivfIndexDir(d, kEff, "tiers")
    if (!AnnIndex.hasIndex(s, s"$dir/raw"))
      AnnIndex.buildTiers(s, emb, dir, k = kEff)
    dir
  }

  /** SURVEY §5's tier decision rule EXECUTED as a serving default
    * (round-16 verdict ask #1): [[AnnIndex.adviseTier]] measures every
    * tier's at-rest bytes and recall at its serving probe count, picks
    * the LEAST-compressed tier fitting the byte budget and recall SLO
    * (compression is a cost paid only when I/O forces it), stamps it
    * generation-keyed, and [[AnnIndex.queryAdvised]] dispatches on the
    * stamp — the caller states budget + SLO once and never names a
    * tier. Output rows are the dispatched probe results with the
    * decision's evidence attached (tier, bytes_frac, measured recall).
    * Rows-only (recall joins and byte measurements aren't
    * SQL-expressible); AnnIndexSpec pins the budget-flip
    * (raw→sq8→pq as the budget tightens), dispatch-equals-direct-
    * query, stale-stamp rejection, and the recall floor. */
  def simAnnTierAdvised(s: SparkSession, d: String,
                        budgetFrac: Double = 1.0,
                        slo: Double = 0.9): DataFrame = {
    val emb = embeddings(s, d)
    val dir = tiersDir(s, d)
    val qs = queriesSet(emb)
    // measured once per (budget, SLO, generation): later calls — every
    // bench run after the first — dispatch on the live stamp, so the
    // MIN tracks serving cost, advise cost shows as run-1 spread
    val advice = AnnIndex.adviseTierIfNeeded(s, dir, qs, emb,
      budgetFrac, slo)
    val m = advice.measures.find(_.tier == advice.tier).get
    AnnIndex.queryAdvised(s, dir, qs, emb, topK = K)
      .withColumn("budget_frac", lit(budgetFrac))
      .withColumn("slo", lit(slo))
      .withColumn("bytes_frac", round(lit(m.bytesFrac), 4))
      .withColumn("tier_recall", round(lit(m.recall), 4))
  }

  /** Tier × nProbe tuning surface from ONE shared build (round-16
    * verdict ask #2): per (tier, probe count) — mean recall vs the
    * exact twin, mean candidate fraction (probed-cell scan cost), and
    * the tier's at-rest bytes fraction. Because all three tiers share
    * the coarse geometry (same sample, k, seed — see
    * [[AnnIndex.buildTiers]]) and probe lists NEST across grid levels,
    * the columns separate cleanly: cand_frac moves with nProbe only,
    * bytes_frac with tier only, and recall shows exactly what each
    * compression level costs at equal probes — the committed,
    * re-checkable form of §6's "4× is free" claim. n_queries per row
    * as in [[annRecallCurve]] (a query whose probed cells are all
    * empty at nProbe=1 drops from that level). Rows-only;
    * AnnIndexSpec pins per-tier monotonicity, sq8-matches-raw recall
    * at equal probes, and the bytes ordering. */
  def simAnnTierCurve(s: SparkSession, d: String,
                      probes: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame = {
    import s.implicits._
    val emb = embeddings(s, d)
    val n = corpusCount(emb)
    val dir = tiersDir(s, d)
    val qs = queriesSet(emb)
    val exact = AnnIndex.exactTopK(emb, qs, K, excludeSelf = true)
    val rawBytes = AnnIndex.tierBytes(s, dir, "raw")
    val rows = for {
      t <- AnnIndex.Tiers
      p <- probes
    } yield {
      val res = AnnIndex.tierQuery(s, dir, t, qs, emb, nProbe = p,
          topK = K, candFracOver = n, excludeSelf = true)
        .select(col("q_id"), col("vec_id"), col("cand_frac"))
        .collect()
      val got = res.map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall =
        if (exact.isEmpty) 1.0
        else got.intersect(exact).size.toDouble / exact.size
      val perQ = res.map(r => (r.getLong(0), r.getDouble(2))).distinct
      val meanCand =
        if (perQ.isEmpty) 0.0 else perQ.map(_._2).sum / perQ.length
      (t, p, math.rint(recall * 1e4) / 1e4,
        math.rint(meanCand * 1e4) / 1e4,
        math.rint(AnnIndex.tierBytes(s, dir, t).toDouble / rawBytes * 1e4) / 1e4,
        perQ.length.toLong)
    }
    rows.toDF("tier", "nprobe", "mean_recall", "mean_cand_frac",
        "bytes_frac", "n_queries")
      .orderBy(col("tier"), col("nprobe"))
  }

  /** ANN via IVF×PQ — the FAISS IVFPQ serving composition (Jégou et
    * al. 2011 §V): PQ codes live INSIDE the persisted IVF's cell
    * directories, so the ADC scan — flat PQ's one remaining full pass
    * (simAnnPq cross-joins every code) — prunes to the probed cells'
    * directories before a single code deserializes. Per 100 TB query
    * batch the I/O is nProbe/k of a corpus that is ALREADY 32×
    * compressed: the two scale paths compose multiplicatively.
    *
    * Residual coding, as in the paper: each vector quantizes
    * x − centroid[cell] (the native cell_residual kernel), so the
    * shared codebooks only cover within-cell displacements — a much
    * tighter distribution than raw vectors, recovering most of the
    * precision the coarse quantizer absorbed. The query side mirrors
    * it: per (query, probed cell), the ADC lookup table is built from
    * the query's residual against THAT cell (driver-side — queries
    * are tiny by definition — and carried as an array column on the
    * broadcast side of the cell join). approx_d2 = Σ_j lut[j][code_j]
    * is m array lookups per candidate inside whole-stage codegen.
    *
    * The probe budget TRIPLES vs plain IVF (nProbe = 3×ivfNProbe): PQ
    * inside the cells compounds the probe stage's misses with
    * quantization noise, so the probe stage must hold enough recall
    * headroom to match the flat-PQ twin (which never misses a cell) —
    * the standard practice of raising nprobe when PQ is on, sized
    * here for the near-isotropic worst case the synthetic corpus
    * models (measured: 2× probes recall 0.76 vs flat PQ's 0.90 at the
    * gate; 3× closes it). Concentrated real-world corpora hold the
    * same recall at far lower multiples; the emitted cand_frac makes
    * the paid fraction visible either way. Exact rerank budget
    * derives with n as in flat PQ.
    * Cost columns: cand_frac = ADC-scanned candidates / n (the probed
    * cells' population — what flat PQ pays 1.0 for), rerank_frac =
    * exact-rescored fraction. */
  def simAnnIvfPq(s: SparkSession, d: String,
                  k: Int = 0, nProbe: Int = 0, m: Int = 8,
                  codebookK: Int = 64, rerank: Int = 0,
                  targetCellSize: Long = 64L): DataFrame = {
    val emb = embeddings(s, d)
    val n = corpusCount(emb)
    val kEff = if (k > 0) k else ivfK(n, targetCellSize)
    val nProbeEff =
      if (nProbe > 0) nProbe else math.min(kEff, 3 * ivfNProbe(kEff))
    val rerankEff = if (rerank > 0) rerank else pqRerank(n)
    // the full PQ lifecycle lives in AnnIndex: buildPq persists the
    // encoded inverted lists (cell-partitioned PQ codes), centroids,
    // residual codebooks, and fit meta — so later batches APPEND
    // through appendPq against the same quantizers; queryPq turns the
    // probe lists into a static partition filter over the code
    // directories, ADC-scores with per-(query, cell) residual LUTs on
    // the broadcast side, and exact-reranks against the raw corpus
    val indexDir = ivfIndexDir(d, kEff, "ivfpq", s"m=$m,cb=$codebookK")
    AnnIndex.buildPq(s, emb, indexDir, k = kEff, m = m,
      codebookK = codebookK)
    AnnIndex.queryPq(s, indexDir, queriesSet(emb),
        emb.select(col("vec_id"), col("embedding")),
        nProbeEff, rerankEff, K, candFracOver = n)
      .transform(annWithRecall(s, d, _, Seq("cand_frac", "rerank_frac")))
  }

  /** ANN via IVF×SQ8 — the middle compression tier of the persisted
    * family (raw IVF 1× / THIS 4× / IVFPQ 32×): byte codes inside the
    * IVF's cell directories, so a probe reads nProbe/k of a corpus
    * that is ¼ the raw bytes, with NONE of PQ's probe-budget headroom
    * (SQ8's in-cell ranking is near-exact — max recon error step/2 —
    * so probe misses dominate exactly as in raw IVF and the default
    * nProbe stays plain IVF's). Rides [[AnnIndex]]'s full lifecycle:
    * build/append under pinned quantizers, tombstones, targeted
    * compact, partition-filter probe pruning. Cost columns as the
    * other ANN paths. */
  def simAnnIvfSq8(s: SparkSession, d: String,
                   k: Int = 0, nProbe: Int = 0, rerank: Int = 0,
                   targetCellSize: Long = 64L): DataFrame = {
    val emb = embeddings(s, d)
    val n = corpusCount(emb)
    val kEff = if (k > 0) k else ivfK(n, targetCellSize)
    val nProbeEff = if (nProbe > 0) nProbe else ivfNProbe(kEff)
    val rerankEff = if (rerank > 0) rerank else pqRerank(n)
    val indexDir = ivfIndexDir(d, kEff, "ivfsq8")
    AnnIndex.buildSq8(s, emb, indexDir, k = kEff)
    AnnIndex.querySq8(s, indexDir, queriesSet(emb),
        emb.select(col("vec_id"), col("embedding")),
        nProbeEff, rerankEff, K, candFracOver = n)
      .transform(annWithRecall(s, d, _, Seq("cand_frac", "rerank_frac")))
  }

  /** ANN via product quantization (Jégou et al. 2011, IEEE TPAMI
    * 33(1), "Product quantization for nearest neighbor search") — the
    * MEMORY-bound scale path, orthogonal to IVF's I/O pruning: the
    * corpus compresses from dim doubles to m subspace codes (64 floats
    * → 8 bytes at the defaults, 32×), so a 100 TB embedding column
    * scans as ~3 TB of codes. Encoding is map-only — the same
    * nearest_cells kernel, once per subspace over a slice. Queries
    * (tiny by definition) collect driver-side and carry their ADC
    * lookup table lut[j][c] = ‖q_j − codebook_j[c]‖² as an array
    * column on the broadcast side; the asymmetric-distance score is m
    * codegen'd array lookups per (vector, query) — no dim-wide
    * arithmetic ever touches the corpus at query time. The approx
    * top-`rerank` short list then rescores EXACTLY against the raw
    * embeddings (a semi-join-sized read), which caps quantization
    * error at the ranking boundary. Cost columns: `cand_frac` = 1.0 —
    * flat PQ ADC-scans EVERY code (32× cheaper per row, but the whole
    * corpus), so the field means the same thing it means in the
    * LSH/IVF paths (candidates examined / corpus) and cross-variant
    * comparisons stay apples-to-apples; the exact-rescored fraction
    * rides separately as `rerank_frac` = rerank/n. */
  def simAnnPq(s: SparkSession, d: String, m: Int = 8,
               codebookK: Int = 64, rerank: Int = 0): DataFrame = {
    val emb = embeddings(s, d)
    val n = corpusCount(emb)
    val rerankEff = if (rerank > 0) rerank else pqRerank(n)
    val sample = fitSample(emb)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val sub = dim / m
    val codebooks: Seq[Array[Array[Double]]] = (0 until m).map { j =>
      lloyds(sample.map(_.slice(j * sub, (j + 1) * sub)), codebookK,
        iters = 10, seed = 42L + j)
    }
    val codes = (0 until m).map { j =>
      element_at(graft.functions.VectorFunctions.nearestCells(
        slice(col("embedding"), j * sub + 1, sub), codebooks(j).flatten,
        codebookK, sub, 1), 1).as(s"c$j")
    }
    val encoded = emb.select((col("vec_id") +: codes): _*)
    val qlut: Seq[(Long, Seq[Seq[Double]])] = queriesSet(emb).collect()
      .toSeq.map { r =>
        val q = r.getSeq[Float](1).map(_.toDouble).toArray
        val lut = (0 until m).map { j =>
          val qj = q.slice(j * sub, (j + 1) * sub)
          codebooks(j).map { c =>
            var s2 = 0.0; var i = 0
            while (i < sub) { val dd = qj(i) - c(i); s2 += dd * dd; i += 1 }
            s2
          }.toSeq
        }
        (r.getLong(0), lut)
      }
    import s.implicits._
    val qs = qlut.toDF("q_id", "lut")
    val wq = Window.partitionBy(col("q_id"))
    val shortList = encoded.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (0 until m).map(j =>
            element_at(element_at(col("lut"), j + 1), col(s"c$j") + 1))
          .reduce(_ + _).as("approx_d2"))
      .withColumn("arank", row_number().over(
        wq.orderBy(col("approx_d2").asc, col("vec_id"))))
      .where(col("arank") <= rerankEff)
    shortList
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queriesSet(emb)), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("score"))
      .withColumn("rank", row_number().over(
        wq.orderBy(col("score").desc, col("vec_id"))))
      .where(col("rank") <= K)
      .withColumn("cand_frac", lit(1.0))
      .withColumn("rerank_frac", round(lit(rerankEff / n.toDouble), 4))
      .select(col("q_id"), col("rank"), col("vec_id"), col("score"),
        col("cand_frac"), col("rerank_frac"))
      .transform(annWithRecall(s, d, _, Seq("cand_frac", "rerank_frac")))
  }

  /** ANN via 8-bit scalar quantization (SQ8 — the faiss
    * ScalarQuantizer QT_8bit baseline): each dimension maps linearly
    * onto [0, 255] against per-dimension [min, max] ranges, one byte
    * per coordinate packed 8-per-long — a TRUE 4× at-rest compression
    * vs float32 that is NEAR-lossless (max reconstruction error is
    * half a quantization step per dimension), where PQ's 32× is lossy.
    * The fit is ONE #dim-row min/max aggregate (a bounded metadata
    * read) instead of PQ's m k-means runs, so SQ8 is the compression
    * tier to reach for first: when the corpus still fits the I/O
    * budget at 4×, it buys the shrink without PQ's recall tax or
    * codebook maintenance.
    *
    * Scale shape: encoding is map-only (two zip_with passes + the
    * 8-codes-per-long pack); candidates score PER PAIR with the
    * inline-decoding native sq8_l2sq kernel against the broadcast
    * query set — decode lives INSIDE the distance call, because a
    * decode *projection* gets CollapseProject-inlined into the
    * per-pair expression and re-runs per candidate pair (the measured
    * 20× defect; see VectorKernels.sq8L2sq). The compression pays at
    * the SCAN (¼ the bytes off disk), not in arithmetic, which is the
    * honest SQ8 trade on a JVM engine (faiss buys SIMD-on-codes too;
    * Spark's win is the I/O). Flat scan like simAnnPq (cand_frac =
    * 1.0); the approx top-`rerank` short list rescores exactly against
    * the raw embeddings. Composition with IVF's directory pruning is
    * the same step as PQ→IVFPQ and rides the identical index layout.
    *
    * Rows-only (recall joins aren't SQL-expressible); SimilaritySpec
    * pins pack/unpack identity, the step/2 reconstruction bound,
    * recall ≥ 0.9 (vs flat PQ's 0.7 floor — SQ8 keeps 8 bits/dim),
    * and determinism. */
  def simAnnSq8(s: SparkSession, d: String, rerank: Int = 0): DataFrame = {
    val emb = embeddings(s, d)
    // round 19 (guide §1.2): corpus count rides the fit aggregate —
    // one scan+job where count() + fit used to pay two
    val (mn, step, n) = sq8FitRangesN(emb)
    val rerankEff = if (rerank > 0) rerank else pqRerank(n)
    val encoded = sq8Encode(emb, mn, step)
    val qs = queriesSet(emb)
    val wq = Window.partitionBy(col("q_id"))
    // per-pair scoring decodes INSIDE the native kernel — the HOF
    // decode-as-a-projection alternative gets CollapseProject-inlined
    // into the distance call and re-decodes per PAIR (73 s → ~2 s at
    // 20 k; see VectorKernels.sq8L2sq)
    // nulls LAST: sq8_l2sq yields null on a q_emb/packed dim mismatch
    // (a ragged/corrupt embedding), and plain asc sorts nulls FIRST —
    // a corrupt row would silently crowd the top of the rerank short
    // list (degraded recall) instead of falling out of it
    val shortList = encoded.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        sq8L2sq(col("q_emb"), col("packed"),
          mn.toArray, step.toArray).as("approx_d2"))
      .withColumn("arank", row_number().over(
        wq.orderBy(col("approx_d2").asc_nulls_last, col("vec_id"))))
      .where(col("arank") <= rerankEff)
    shortList
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(qs), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("score"))
      .withColumn("rank", row_number().over(
        wq.orderBy(col("score").desc, col("vec_id"))))
      .where(col("rank") <= K)
      .withColumn("cand_frac", lit(1.0))
      .withColumn("rerank_frac", round(lit(rerankEff / n.toDouble), 4))
      .select(col("q_id"), col("rank"), col("vec_id"), col("score"),
        col("cand_frac"), col("rerank_frac"))
      .transform(annWithRecall(s, d, _, Seq("cand_frac", "rerank_frac")))
  }

  /** SQ8 range fit: per-dimension (min, step) from the CORPUS min/max
    * — ONE #dim-row aggregate (a bounded metadata read; exact beats a
    * sample here, since a clipped outlier costs rank accuracy on
    * every later query). Shared by the flat path and
    * [[AnnIndex.buildSq8]]. */
  private[graft] def sq8FitRanges(emb: DataFrame): (Seq[Double], Seq[Double]) = {
    val (mn, step, _) = sq8FitRangesN(emb)
    (mn, step)
  }

  /** Fit + corpus count in ONE aggregate (round 19): every embedding
    * contributes one row per dimension, so count(pos=any)/1 IS the
    * corpus size — callers that need both (the flat SQ8 path's rerank
    * sizing) save a full count() scan and its job. */
  private[graft] def sq8FitRangesN(
      emb: DataFrame): (Seq[Double], Seq[Double], Long) = {
    val mmRows = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "e")))
      .groupBy(col("pos"))
      .agg(min(col("e").cast(DoubleType)).as("mn"),
        max(col("e").cast(DoubleType)).as("mx"),
        count(lit(1)).as("n"))
      .orderBy(col("pos")).collect()
    val dim = mmRows.length
    require(dim % 8 == 0, s"dim $dim must pack 8 codes per long")
    (mmRows.map(_.getDouble(1)).toSeq,
      mmRows.map(r => (r.getDouble(2) - r.getDouble(1)) / 255.0).toSeq,
      mmRows.headOption.map(_.getLong(3)).getOrElse(0L))
  }

  /** SQ8 encode: (vec_id, packed) with one byte per dimension packed
    * little-endian 8-per-long. Clamped round-to-nearest; a dead
    * dimension (step ≤ 0) codes to 0 and decodes to its min. */
  private[graft] def sq8Encode(emb: DataFrame, mn: Seq[Double],
                               step: Seq[Double]): DataFrame =
    sq8WithPacked(emb, mn, step).select(col("vec_id"), col("packed"))

  /** Adds `packed` (SQ8 codes, 8-per-long) to a frame carrying
    * `embedding`, preserving every other column — the shared encode
    * core of [[simAnnSq8]] and [[AnnIndex.buildSq8]]'s cell writes.
    * Out-of-range values (an append batch can exceed the fit-time
    * ranges) CLAMP to the range edge, the standard SQ trade. */
  private[graft] def sq8WithPacked(df: DataFrame, mn: Seq[Double],
                                   step: Seq[Double]): DataFrame = {
    val dim = mn.length
    // each code folds straight off element_at(embedding, i) (an
    // ATTRIBUTE) and the two literal range arrays — round 19: the old
    // staged form built a `_sq8codes` array column that CollapseProject
    // inlined into every one of the 64 element_at references in the
    // pack fold, re-evaluating the whole zip_with chain per DIMENSION
    // (measured 3.4 s to encode 2 k vectors; this form is ~60×
    // cheaper). Inline references recompute nothing: attributes and
    // literals are free, and every code expression is referenced
    // exactly once. Semantics unchanged: clamped round-to-nearest,
    // dead dimension (step ≤ 0) codes to 0, nulls propagate.
    df
      .withColumn("_sq8mn", typedlit(mn))
      .withColumn("_sq8st", typedlit(step))
      // whole-null embedding → null packed (round 20): the r19 inline
      // rewrite silently flipped this edge to all-zero codes (Spark's
      // `greatest` SKIPS null arguments), diverging from the staged
      // form it replaced and from this scaladoc. The explicit IF
      // restores propagation; EdgeCaseSpec pins it.
      .withColumn("packed", expr(
        "IF(embedding IS NULL, CAST(NULL AS ARRAY<BIGINT>), " +
          s"transform(sequence(0, ${dim / 8 - 1}), g -> " +
          "aggregate(sequence(0, 7), 0L, (acc, j) -> acc + shiftleft(" +
          "IF(element_at(_sq8st, g * 8 + j + 1) <= 0D, 0L, " +
          "least(255L, greatest(0L, CAST(round(" +
          "(CAST(element_at(embedding, g * 8 + j + 1) AS DOUBLE) - " +
          "element_at(_sq8mn, g * 8 + j + 1)) / " +
          "element_at(_sq8st, g * 8 + j + 1)) AS LONG)))), j * 8))))"))
      .drop("_sq8mn", "_sq8st")
  }

  /** SQ8 decode: reconstruct (vec_id, recon array<double>) from the
    * packed codes. SPEC-SUPPORT helper (roundtrip / step-2 bound
    * assertions) — the query paths never decode as a projection; they
    * score per pair through the inline-decoding sq8_l2sq kernel. */
  private[graft] def sq8Decode(encoded: DataFrame, mn: Seq[Double],
                               step: Seq[Double]): DataFrame =
    sq8WithRecon(encoded, mn, step)
      .select(col("vec_id"), col("packed"), col("recon"))

  /** Adds `recon` (decoded array<double>) to a frame carrying
    * `packed`, preserving every other column. SPEC-SUPPORT only (the
    * reconstruction-bound tests): no query path uses it —
    * [[AnnIndex.querySq8]] and [[simAnnSq8]] score per pair through
    * the inline-decoding sq8_l2sq kernel instead (a decode projection
    * would be CollapseProject-inlined and re-run per pair). */
  private[graft] def sq8WithRecon(df: DataFrame, mn: Seq[Double],
                                  step: Seq[Double]): DataFrame = {
    val dim = mn.length
    df
      .withColumn("_sq8mn", typedlit(mn))
      .withColumn("_sq8st", typedlit(step))
      .withColumn("recon", expr(
        s"transform(sequence(0, ${dim - 1}), i -> " +
          "element_at(_sq8mn, i + 1) + element_at(_sq8st, i + 1) * " +
          "CAST(shiftright(element_at(packed, CAST(i div 8 AS INT) + 1), " +
          "(i % 8) * 8) & 255L AS DOUBLE))"))
      .drop("_sq8mn", "_sq8st")
  }

  /** IVF cell-occupancy balance — the load report over the coarse
    * quantizer's assignment (here the label centroids, the same
    * E-step as [[simClusterAssign]]): per cell, its population, corpus
    * share, and load factor (population ÷ the balanced-cell ideal
    * n/k). This is the probe-LATENCY skew readout for IVF serving —
    * a query probing a cell at load factor 8 pays 8× the balanced
    * scan, so the tail latency of the whole ANN tier is this table's
    * max — and the rebalance trigger (split hot cells / re-fit
    * centroids) that [[AnnIndex.maintain]]'s drift check complements:
    * maintain catches the DISTRIBUTION moving, this catches a
    * quantizer that was never balanced to begin with. The join-key
    * twin is [[Sharding.keySkew]]; cells are to probes what keys are
    * to shuffle partitions.
    *
    * Scale shape: centroids reduce to (#cells × dim) and BROADCAST;
    * assignment is the map-only argmax scan (per-vector window over
    * #cells rows); the report aggregates #cells groups, and the 1-row
    * totals attach by broadcast. Quotients are exact-long→double
    * casts with one correctly-rounded divide each — bit-identical in
    * DuckDB. */
  def ivfBalance(emb: DataFrame, hotFactor: Double = 2.0): DataFrame = {
    val cvec = centroids(emb)
      .groupBy(col("label")).agg(
        expr("transform(array_sort(collect_list(struct(dim, centroid)))," +
          " x -> x.centroid)").as("cv"))
      .select(col("label").as("c_label"), col("cv"))
    val dot = (a: String, b: String) =>
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
    val assigned = emb
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ev"))
      .crossJoin(broadcast(cvec))
      .withColumn("score",
        dot("ev", "cv") / (sqrt(dot("ev", "ev")) * sqrt(dot("cv", "cv"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("score").desc, col("c_label"))))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("c_label").as("cell"))
    val occ = assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
    val tot = cvec.agg(count(lit(1)).as("n_cells"))
      .crossJoin(assigned.agg(count(lit(1)).as("n_total")))
    occ.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_vecs"),
        (col("n_vecs").cast(DoubleType) / col("n_total")).as("share"),
        ((col("n_vecs") * col("n_cells")).cast(DoubleType) /
          col("n_total")).as("load_factor"))
      .withColumn("is_hot", col("load_factor") > hotFactor)
      .orderBy(col("cell"))
  }

  def simIvfBalance(s: SparkSession, d: String): DataFrame =
    ivfBalance(embeddings(s, d))

  /** Exact k-NN graph — each vector's top-k neighbors over the WHOLE
    * corpus (not a query set): the primitive under SemDeDup-style
    * graph clustering, label propagation, and diversity filtering.
    * All-pairs at test scale (the correctness twin, broadcast
    * nested-loop by design — [[simKnnGraph]] is the scale path);
    * per-vector ranking compiles to a partial WindowGroupLimit, so
    * even the exact form never sorts the full pair stream. */
  def simKnnGraphExact(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    val e = embeddings(s, d)
    val n = e.count()
    // bound each task's pair slice: the per-src top-k compiles to a
    // partial WindowGroupLimit, which still SORTS its task's slice
    // locally before cutting to k — with few wide input partitions a
    // task's slice is (its src rows) × n pairs, and at 200k vectors /
    // 32 partitions that is a 600M-row × 32-way concurrent sort that
    // spilled >70 GB at the sf10 sweep. Splitting the src side so a
    // task crosses ~24M pairs keeps every local sort in memory; each
    // src lives in exactly one task, so the partial limit still cuts
    // the shuffle to k rows per src. Work stays O(n²) cosines BY
    // DESIGN (this is the correctness twin; simKnnGraph is the scale
    // path) — the split fixes the memory shape, not the arithmetic.
    // clamped: above n≈2.3e8 the unclamped quotient exceeds Int.MaxValue
    // and a raw .toInt would go negative (repartition throws); 1<<20
    // tasks is already far past any sane local sort budget. The sizing
    // count() is one column-less scan — accepted for the correctness
    // twin (the scale path simKnnGraph never counts).
    val parts = math.min(1L << 20, math.max(32L, (n * n) / 24000000L)).toInt
    val a = e.select(col("vec_id").as("src"), col("embedding").as("e1"))
      .repartition(parts, col("src"))
    val b = e.select(col("vec_id").as("dst"), col("embedding").as("e2"))
    a.join(broadcast(b), col("src") =!= col("dst"))
      .select(col("src"), col("dst"), cosine(col("e1"), col("e2")).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("score").desc, col("dst"))))
      .where(col("rank") <= k)
      .select(col("src"), col("rank"), col("dst"), col("score"))
      .orderBy(col("src"), col("rank"))
  }

  /** LSH-bucketed k-NN graph — the corpus-scale form: candidates come
    * from shared hyperplane buckets (the same derivation and
    * degenerate-bucket guard as [[embedCosinePairs]]), each candidate
    * pair scores once (groupBy max over table collisions — one
    * codegen'd HashAggregate), and both directions of the undirected
    * collision feed each endpoint's top-k window. Work scales with
    * bucket occupancy, not n²; recall is probabilistic (spec measures
    * it against the exact twin; planted twins rank first).
    *
    * Multi-probe (Lv et al. 2007, as in [[simAnnLshMultiprobe]]): every
    * vector is simultaneously index entry AND query, so the src side
    * additionally probes the nProbe−1 buckets reached by flipping its
    * lowest-|projection|-margin bits — the buckets a true neighbor
    * most likely landed in when one low-confidence sign disagreed. The
    * index side keeps ONE code per table (the at-rest bytes don't
    * grow); candidate volume scales to L·nProbe buckets of derived
    * occupancy — still occupancy-bound, never n² (AnnStress measures
    * the 10×/50× growth). Gate default nProbe=4 lifts graph recall to
    * the ≥0.7 band at the same index size (SimilaritySpec measures it
    * against the exact twin). */
  def simKnnGraph(s: SparkSession, d: String, k: Int = 3,
                  nProbe: Int = 4): DataFrame =
    knnGraph(embeddings(s, d), k, nProbe = nProbe)

  def knnGraph(emb: DataFrame, k: Int = 3,
               L: Int = 8, b: Int = 0, dim: Int = 64,
               maxBucket: Long = MaxBucket, nProbe: Int = 1): DataFrame = {
    val bEff = if (b > 0) b else derivedBits(corpusCount(emb), 64L, 4, 20)
    val bucketed = emb
      .select(col("vec_id"), col("embedding"),
        posexplode(buckets(col("embedding"), L, bEff, dim))
          .as(Seq("table", "bucket")))
    // a singleton home bucket pairs with nothing under single probe,
    // but an EXTERNAL probe can still reach its lone member — the
    // lower occupancy bound only applies when nobody probes
    val minOcc = if (nProbe > 1) 1L else 2L
    val liveBuckets = bucketed.groupBy(col("table"), col("bucket"))
      .agg(count(lit(1)).as("bn"))
      .where(col("bn").between(minOcc, maxBucket))
      .select(col("table"), col("bucket"))
    val pruned = bucketed.join(liveBuckets, Seq("table", "bucket"), "left_semi")
    val aa =
      if (nProbe <= 1)
        pruned.select(col("table"), col("bucket"),
          col("vec_id").as("src"), col("embedding").as("e1"))
      else emb.select(col("vec_id").as("src"), col("embedding").as("e1"),
          posexplode(graft.functions.VectorFunctions.hyperplaneProbes(
            col("embedding"), planes(L, bEff, dim).flatten.flatten,
            L, bEff, dim, nProbe))
            .as(Seq("pos", "bucket")))
        .select(col("src"), col("e1"),
          (col("pos") / nProbe).cast("int").as("table"), col("bucket"))
    val bb = pruned.select(col("table"), col("bucket"),
      col("vec_id").as("dst"), col("embedding").as("e2"))
    aa.join(bb, Seq("table", "bucket"))
      .where(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), cosine(col("e1"), col("e2")).as("score"))
      .groupBy(col("src"), col("dst"))
      .agg(max(col("score")).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("score").desc, col("dst"))))
      .where(col("rank") <= k)
      .select(col("src"), col("rank"), col("dst"), col("score"))
      .orderBy(col("src"), col("rank"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dup
    * pairs via cluster-then-compare — k-means cells bound the pair
    * search to semantic neighborhoods, so the all-pairs comparison runs
    * per cell, never across the corpus. Same sample-fit quantizer and
    * map-only assignment as IVF; the in-cell self-join shuffles once on
    * the cell id and emits pairs above the cosine threshold (keep-rule:
    * smallest id per pair survives, same as the other dedup paths).
    *
    * Round-3 scale fixes: k scales with the corpus when not pinned
    * (k ≈ n/targetCellSize, as in the paper — with FIXED k the in-cell
    * self-join is O(n²/k) = O(n²); with scaled k it is O(n·cellSize)),
    * and a per-cell guard drops cells that still exceed `maxCellSize`
    * (degenerate mass, e.g. a constant embedding — same rationale and
    * trade as Dedup.MaxBucket; the components path is the collapse
    * surface for such mass). Probabilistic recall (boundary pairs split
    * across cells) — spec plants near-identical vectors; the exact twin
    * is dedupEmbedExact. */
  def semanticDedupPairs(emb: DataFrame, k: Int = 0,
                         threshold: Double = 0.95,
                         targetCellSize: Long = 1024L,
                         maxCellSize: Long = 10000L): DataFrame = {
    val kEff = if (k > 0) k else ivfK(corpusCount(emb), targetCellSize)
    val sample = fitSample(emb)
    val centroids = lloyds(sample, kEff, iters = 10, seed = 42)
    val assigned = emb.select(col("vec_id"), col("embedding"),
      nearestCell(col("embedding"), centroids).as("cell"))
    val liveCells = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("cn"))
      .where(col("cn").between(2L, maxCellSize))
      .select(col("cell"))
    val pruned = assigned.join(liveCells, Seq("cell"), "left_semi")
    val a = pruned.select(col("cell"), col("vec_id").as("id1"),
      col("embedding").as("e1"))
    val b = pruned.select(col("cell"), col("vec_id").as("id2"),
      col("embedding").as("e2"))
    a.join(b, Seq("cell")).where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosine(col("e1"), col("e2")).as("cos"))
      .where(col("cos") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  def dedupSemantic(s: SparkSession, d: String,
                    threshold: Double = 0.45): DataFrame =
    // default threshold tuned to the synthetic corpus's near-isotropic
    // geometry (planted twins sit at cos ≈ 1; background pairs ≈ 0.3)
    semanticDedupPairs(embeddings(s, d), threshold = threshold)

  /** Content-keyed index directory for the persisted IVF family: the
    * FULL md5 of (corpus path, k, flavor, extra params) — a 32-bit
    * `hashCode` suffix collides across datasets (two corpora whose
    * paths hash-collide race overwrite-vs-read and a reader can see
    * rows assigned from the other corpus' centroids), and two configs
    * of the SAME corpus (e.g. the spec's k=64 run next to the gate's
    * derived k, or two IVFPQ runs differing only in m/codebookK — the
    * `params` argument) would overwrite each other mid-session. The
    * directory name also carries the JVM's pid: the digest only
    * disambiguates WITHIN a process, and two concurrent JVMs on the
    * same corpus/config (a test suite next to a gate or bench run)
    * would still race overwrite-vs-read on a shared path. Within a
    * process, re-runs of the same config overwrite idempotently (same
    * fit → same files); the per-pid directories are ordinary tmpdir
    * litter, reclaimed by the OS policy like every other temp file. */
  private[graft] def ivfIndexDir(d: String, k: Int,
                                 flavor: String = "ivf",
                                 params: String = ""): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d:$k:$flavor:$params".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val pid = ProcessHandle.current().pid()
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${flavor}_index_${key}_p$pid").toString
  }

  /** Bounded UNIFORM sample for the quantizer fit. A bare
    * `limit(size)` takes whatever rows the scan returns first — a
    * corpus PREFIX, so on any sorted / source-partitioned / Z-ordered
    * layout (exactly what a 100 TB corpus looks like) the fit centers
    * on the head shard and recall silently collapses for the tail
    * (SimilaritySpec's sorted-corpus case demonstrates the
    * mis-centering). Ordering by a seeded hash of the row id instead
    * makes every row equally likely at any position regardless of the
    * physical layout, is deterministic under retries / partition
    * reshuffles (unlike `sample()`, whose per-partition RNG shifts
    * when the file split changes), and compiles to
    * TakeOrderedAndProject: each scan task keeps its local top-`size`
    * by hash, the driver merges — no global sort, no full shuffle. */
  private[graft] def fitSample(emb: DataFrame,
                                   size: Int = 4096): Array[Array[Double]] =
    emb.select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id"), lit(42L)), col("vec_id"))
      .limit(size)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** Nearest centroid id via the native (k × dim) matrix kernel — the
    * per-centroid struct array_min it replaces unrolled k vec_l2sq
    * calls into one expression tree, which left codegen's 64 KB method
    * budget once the DERIVED k reached its 512 cap (AnnStress). */
  private def nearestCell(v: Column, centroids: Array[Array[Double]]): Column =
    element_at(graft.functions.VectorFunctions.nearestCells(
      v, centroids.flatten, centroids.length, centroids.head.length, 1), 1)

  /** Plain Lloyd's iterations on an in-memory sample, deterministic. */
  private[graft] def lloyds(points: Array[Array[Double]], k: Int,
                                iters: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means needs a non-empty sample")
    val dim = points.head.length
    val rng = new scala.util.Random(seed)
    val centers = Array.tabulate(k)(i => points(
      if (points.length >= k) (rng.nextInt(points.length) + i) % points.length
      else i % points.length).clone())
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val e = a(i) - b(i); s += e * e; i += 1 }
      s
    }
    // assignment is O(sample × k × dim) per iteration — ~8e9 mul-adds
    // at the k=313/dim=64 sf1 derivation and the dominant build_s cost.
    // Parallelize over FIXED point chunks and merge partial (sums,
    // counts) in chunk-index order: deterministic under any thread
    // schedule (each chunk's float-sum order is fixed, and so is the
    // merge order), unlike a naive shared-accumulator parallel loop.
    val nChunks = math.min(
      Runtime.getRuntime.availableProcessors, math.max(1, points.length / 64))
    val chunkSize = (points.length + nChunks - 1) / nChunks
    for (_ <- 0 until iters) {
      val partials = java.util.stream.IntStream.range(0, nChunks).parallel()
        .mapToObj { c =>
          val sums = Array.fill(k)(new Array[Double](dim))
          val counts = new Array[Int](k)
          var pi = c * chunkSize
          val end = math.min(points.length, pi + chunkSize)
          while (pi < end) {
            val p = points(pi)
            var best = 0; var bd = Double.MaxValue; var j = 0
            while (j < k) { val dd = d2(p, centers(j)); if (dd < bd) { bd = dd; best = j }; j += 1 }
            counts(best) += 1
            var i = 0
            while (i < dim) { sums(best)(i) += p(i); i += 1 }
            pi += 1
          }
          (sums, counts)
        }.toArray(n => new Array[(Array[Array[Double]], Array[Int])](n))
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      partials.foreach { case (ps, pc) =>
        var j = 0
        while (j < k) {
          counts(j) += pc(j)
          var i = 0
          while (i < dim) { sums(j)(i) += ps(j)(i); i += 1 }
          j += 1
        }
      }
      for (j <- 0 until k if counts(j) > 0; i <- 0 until dim)
        centers(j)(i) = sums(j)(i) / counts(j)
    }
    centers
  }

  /** Per-label centroids — the cluster-summary step of semantic curation
    * (SemDeDup-style: cluster, then prune within clusters; centroids are
    * the cluster state that persists between runs).
    *
    * Cross-row float sums are order-sensitive, so each coordinate sums
    * in DECIMAL(18,6) (exact, association-free) and divides as double —
    * same on the DuckDB side, so the gate hash-matches. Scale shape:
    * posexplode fans each row ×dim map-side, then one partial+final agg
    * shuffles only (#labels × dim) group slots — never the vectors. */
  def centroids(emb: DataFrame): DataFrame =
    emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "e")))
      .groupBy(col("label"), (col("pos") + 1).as("dim"))
      .agg((sum(col("e").cast("double").cast(DecimalType(18, 6)))
        .cast("double") / count(lit(1))).as("centroid"),
        count(lit(1)).as("n"))
      .orderBy(col("label"), col("dim"))

  def simCentroids(s: SparkSession, d: String): DataFrame =
    centroids(embeddings(s, d))

  /** Per-dimension distribution profile of the embedding space — mean,
    * std, min, max per coordinate: the normalization readout that
    * decides whitening, PQ subspace balance, and whether cosine vs dot
    * is safe (a dimension with runaway variance dominates every
    * distance; a dead dimension wastes an index byte).
    *
    * Scale shape: posexplode is map-only (corpus rows × dim, never
    * shuffled raw — partial aggregation combines per partition before
    * the #dims-row shuffle); ONE partial+final agg keyed by dim holds
    * all five moments. Sums go through DECIMAL (exact, order-free);
    * mean/std assemble in double with the identical association order
    * on both engines — IEEE mult/div/sqrt are correctly rounded, so
    * the unrounded outputs are bit-identical. */
  def dimStats(emb: DataFrame): DataFrame =
    emb
      .select(posexplode(col("embedding")).as(Seq("pos", "e")))
      .select((col("pos") + 1).as("dim"),
        col("e").cast(DoubleType).as("e"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("e").cast(DecimalType(18, 6))).as("s1"),
        sum((col("e") * col("e")).cast(DecimalType(28, 12))).as("s2"),
        min(col("e")).as("min_v"), max(col("e")).as("max_v"))
      .select(col("dim"), col("n"),
        (col("s1").cast(DoubleType) / col("n")).as("mean_v"),
        // sample std needs n>1; ANSI mode turns the n=1 divisor into a
        // hard error, so the undefined case is an explicit NaN
        when(col("n") > 1,
          sqrt((col("s2").cast(DoubleType) -
            (col("s1").cast(DoubleType) * col("s1").cast(DoubleType)) /
              col("n")) / (col("n") - 1)))
          .otherwise(lit(Double.NaN)).as("std_v"),
        col("min_v"), col("max_v"))
      .orderBy(col("dim"))

  def simDimStats(s: SparkSession, d: String): DataFrame =
    dimStats(embeddings(s, d))

  /** K-means E-step against the label centroids: assign every vector to
    * its nearest centroid by cosine and report the fit — the clustering
    * health check of semantic curation (a vector whose nearest centroid
    * is not its own label is in the wrong cluster, the SemDeDup prune
    * candidate). Scale shape: the centroid table is (#labels × dim)
    * rows rebuilt into #labels vectors and BROADCAST; scoring is
    * map-only over the corpus (explode ×#labels); the per-vector argmax
    * is a row_number window over #labels rows per partition. Cosine
    * follows the repo's bit-stable discipline: left-to-right IEEE
    * double accumulation, identical in DuckDB's list_dot_product. */
  def simClusterAssign(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val cvec = centroids(emb)
      .groupBy(col("label")).agg(
        expr("transform(array_sort(collect_list(struct(dim, centroid)))," +
          " x -> x.centroid)").as("cv"))
      .select(col("label").as("c_label"), col("cv"))
    val dot = (a: String, b: String) =>
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
    val scored = emb
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ev"))
      .crossJoin(broadcast(cvec))
      .withColumn("score",
        dot("ev", "cv") / (sqrt(dot("ev", "ev")) * sqrt(dot("cv", "cv"))))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("score").desc, col("c_label"))
    scored
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("label"), col("c_label").as("assigned"),
        col("score"), (col("c_label") === col("label")).as("label_match"))
      .orderBy(col("vec_id"))
  }

  /** Embedding outlier scores — each vector's cosine to its OWN label
    * centroid, z-scored against that label's score distribution: the
    * mislabeled/noise detector of semantic curation (SemDeDup prunes
    * near-DUPLICATES; this prunes the opposite tail — vectors that
    * barely belong to their cluster at all). z < −2 flags the outlier.
    *
    * Scale shape: centroids reduce to (#labels × dim) and BROADCAST;
    * scoring is map-only over the corpus; the per-label moment table
    * (#labels rows, decimal sums of 9-dp-rounded scores — exact and
    * order-free) broadcast-joins back; no window anywhere. z assembles
    * in double with identical association order on both engines. */
  def outlierScores(emb: DataFrame): DataFrame = {
    val cvec = centroids(emb)
      .groupBy(col("label")).agg(
        expr("transform(array_sort(collect_list(struct(dim, centroid)))," +
          " x -> x.centroid)").as("cv"))
    val dot = (a: String, b: String) =>
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
    val scored = emb
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ev"))
      .join(broadcast(cvec), Seq("label"))
      .withColumn("score", round(
        dot("ev", "cv") / (sqrt(dot("ev", "ev")) * sqrt(dot("cv", "cv"))),
        9))
    val stats = scored.groupBy(col("label")).agg(
        count(lit(1)).as("n"),
        sum(col("score").cast(DecimalType(28, 9))).as("s1"),
        sum((col("score") * col("score")).cast(DecimalType(38, 18)))
          .as("s2"))
      .select(col("label"),
        (col("s1").cast(DoubleType) / col("n")).as("mu"),
        when(col("n") > 1,
          sqrt((col("s2").cast(DoubleType) -
            (col("s1").cast(DoubleType) * col("s1").cast(DoubleType)) /
              col("n")) / (col("n") - 1)))
          .otherwise(lit(Double.NaN)).as("sigma"))
    scored
      .join(broadcast(stats), Seq("label"))
      .select(col("vec_id"), col("label"), col("score"),
        round((col("score") - col("mu")) / col("sigma"), 9).as("z"))
      .withColumn("is_outlier", col("z") < -2.0)
      .orderBy(col("vec_id"))
  }

  def simOutlierScores(s: SparkSession, d: String): DataFrame =
    outlierScores(embeddings(s, d))

  /** Cluster-separation report — the health metric on top of the
    * E-step: per label, the mean cosine of members to their OWN
    * centroid vs the mean of each member's BEST other centroid; the
    * margin says whether the labels are separable at all (the gate
    * corpus measures ≈ 0, which is exactly what AnalyticsOpsSpec's
    * ~37 % self-assignment showed — now it's a number the operator
    * reports instead of a surprise). Same broadcast-centroid map-only
    * scan as [[simClusterAssign]]; per-vector cosines round to 9 dp
    * DECIMAL before the per-label mean (order-free sums), one agg. */
  def simLabelSeparation(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val cvec = centroids(emb)
      .groupBy(col("label")).agg(
        expr("transform(array_sort(collect_list(struct(dim, centroid)))," +
          " x -> x.centroid)").as("cv"))
      .select(col("label").as("c_label"), col("cv"))
    val dot = (a: String, b: String) =>
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
    val dec = DecimalType(28, 9)
    emb
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ev"))
      .crossJoin(broadcast(cvec))
      .withColumn("score",
        dot("ev", "cv") / (sqrt(dot("ev", "ev")) * sqrt(dot("cv", "cv"))))
      .groupBy(col("vec_id"), col("label"))
      .agg(
        round(max(when(col("c_label") === col("label"), col("score"))), 9)
          .cast(dec).as("own"),
        round(max(when(col("c_label") =!= col("label"), col("score"))), 9)
          .cast(dec).as("other"))
      .groupBy(col("label"))
      // UNROUNDED quotients (the round-11 determinism rule): the
      // decimal sums are exactly representable doubles, so one IEEE
      // division/subtraction is bit-identical in both engines —
      // round() is the only operation that can diverge
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("own")).cast("double") / count(lit(1)))
          .as("mean_own_cos"),
        (sum(col("other")).cast("double") / count(lit(1)))
          .as("mean_best_other_cos"))
      .withColumn("margin",
        col("mean_own_cos") - col("mean_best_other_cos"))
      .orderBy(col("label"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_label_separation" -> (simLabelSeparation _),
    "sim_cluster_assign" -> (simClusterAssign _),
    "sim_dim_stats" -> (simDimStats _),
    "sim_outlier_scores" -> (simOutlierScores _),
    "sim_ann_recall_curve" -> (simAnnRecallCurve _),
    "sim_centroids" -> (simCentroids _),
    "sim_topk_bruteforce" -> (simTopkBruteforce _),
    "sim_ann_lsh" -> ((s: SparkSession, d: String) => simAnnLsh(s, d)),
    "sim_ann_lsh_multiprobe" -> ((s: SparkSession, d: String) =>
      simAnnLshMultiprobe(s, d)),
    "sim_ann_ivf" -> ((s: SparkSession, d: String) => simAnnIvf(s, d)),
    "sim_ann_ivf_persisted" -> ((s: SparkSession, d: String) =>
      simAnnIvfPersisted(s, d)),
    "serve_ann_probe" -> ((s: SparkSession, d: String) => serveAnnProbe(s, d)),
    "sim_ann_tuned" -> ((s: SparkSession, d: String) => simAnnTuned(s, d)),
    "sim_ann_pq" -> ((s: SparkSession, d: String) => simAnnPq(s, d)),
    "sim_ann_sq8" -> ((s: SparkSession, d: String) => simAnnSq8(s, d)),
    "sim_ann_ivfsq8" -> ((s: SparkSession, d: String) => simAnnIvfSq8(s, d)),
    "sim_ann_ivfpq" -> ((s: SparkSession, d: String) => simAnnIvfPq(s, d)),
    "sim_ivf_balance" -> (simIvfBalance _),
    // gate entry runs at the exact twin's threshold so the rows-only
    // check exercises real output on the synthetic corpus (no 0.9-cosine
    // twins exist there; the 0.9 default is the production near-dup bar,
    // spec-covered with planted dups)
    "dedup_embed_cosine" -> ((s: SparkSession, d: String) =>
      dedupEmbedCosine(s, d, threshold = 0.45)),
    "dedup_semantic" -> ((s: SparkSession, d: String) => dedupSemantic(s, d)),
    "dedup_embed_exact" -> ((s: SparkSession, d: String) => dedupEmbedExact(s, d)),
    "sim_knn_graph_exact" -> ((s: SparkSession, d: String) =>
      simKnnGraphExact(s, d)),
    "sim_knn_graph" -> ((s: SparkSession, d: String) => simKnnGraph(s, d)),
    "sim_range_search" -> ((s: SparkSession, d: String) => simRangeSearch(s, d)),
    "sim_ann_tier_advised" -> ((s: SparkSession, d: String) =>
      simAnnTierAdvised(s, d)),
    "sim_ann_tier_curve" -> ((s: SparkSession, d: String) =>
      simAnnTierCurve(s, d))
  )

  val oracles: Map[String, String] = Map(
    "sim_outlier_scores" ->
      """WITH t AS (
        |  SELECT label,
        |    unnest(generate_series(1, len(embedding))) AS dim,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS e
        |  FROM embeddings
        |), c AS (
        |  SELECT label, dim,
        |    CAST(sum(CAST(e AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |      AS centroid
        |  FROM t GROUP BY 1, 2
        |), cv AS (
        |  SELECT label AS c_label, list(centroid ORDER BY dim) AS cv
        |  FROM c GROUP BY label
        |), s AS (
        |  SELECT e.vec_id, e.label,
        |    round(list_dot_product(ev, cv.cv)
        |      / (sqrt(list_dot_product(ev, ev))
        |         * sqrt(list_dot_product(cv.cv, cv.cv))), 9) AS score
        |  FROM (SELECT vec_id, label,
        |          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |        FROM embeddings) e
        |  JOIN cv ON cv.c_label = e.label
        |), st AS (
        |  SELECT label, count(*) AS n,
        |    sum(CAST(score AS DECIMAL(28,9))) AS s1,
        |    sum(CAST(score * score AS DECIMAL(38,18))) AS s2
        |  FROM s GROUP BY label
        |), m AS (
        |  SELECT label, CAST(s1 AS DOUBLE) / n AS mu,
        |    sqrt((CAST(s2 AS DOUBLE) -
        |      (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / n) / (n - 1))
        |      AS sigma
        |  FROM st
        |)
        |SELECT s.vec_id, s.label, s.score,
        |  round((s.score - m.mu) / m.sigma, 9) AS z,
        |  round((s.score - m.mu) / m.sigma, 9) < -2.0 AS is_outlier
        |FROM s JOIN m USING (label)
        |ORDER BY s.vec_id""".stripMargin,
    "sim_dim_stats" ->
      """WITH t AS (
        |  SELECT CAST(unnest(generate_series(1, len(embedding)))
        |    AS INT) AS dim,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE)))
        |      AS e
        |  FROM embeddings
        |), a AS (
        |  SELECT dim, count(*) AS n,
        |    sum(CAST(e AS DECIMAL(18,6))) AS s1,
        |    sum(CAST(e * e AS DECIMAL(28,12))) AS s2,
        |    min(e) AS min_v, max(e) AS max_v
        |  FROM t GROUP BY dim
        |)
        |SELECT dim, n, CAST(s1 AS DOUBLE) / n AS mean_v,
        |  sqrt((CAST(s2 AS DOUBLE) -
        |    (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / n) / (n - 1))
        |    AS std_v,
        |  min_v, max_v
        |FROM a ORDER BY dim""".stripMargin,
    "sim_centroids" ->
      """WITH t AS (
        |  SELECT label,
        |    unnest(generate_series(1, len(embedding))) AS dim,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS e
        |  FROM embeddings
        |)
        |SELECT label, CAST(dim AS INT) AS dim,
        |  CAST(sum(CAST(e AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |    AS centroid,
        |  count(*) AS n
        |FROM t GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,

    // same centroid + cosine CTEs as sim_cluster_assign; 9 dp decimal
    // per-vector rounds, then UNROUNDED mean quotients (exactly-
    // representable decimal sums → bit-identical IEEE division)
    "sim_label_separation" ->
      """WITH t AS (
        |  SELECT label,
        |    unnest(generate_series(1, len(embedding))) AS dim,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS e
        |  FROM embeddings
        |), c AS (
        |  SELECT label, dim,
        |    CAST(sum(CAST(e AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |      AS centroid
        |  FROM t GROUP BY 1, 2
        |), cv AS (
        |  SELECT label AS c_label, list(centroid ORDER BY dim) AS cv
        |  FROM c GROUP BY label
        |), s AS (
        |  SELECT e.vec_id, e.label, cv.c_label,
        |    list_dot_product(ev, cv.cv)
        |      / (sqrt(list_dot_product(ev, ev))
        |         * sqrt(list_dot_product(cv.cv, cv.cv))) AS score
        |  FROM (SELECT vec_id, label,
        |          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |        FROM embeddings) e
        |  CROSS JOIN cv
        |), pv AS (
        |  SELECT vec_id, label,
        |    CAST(round(max(CASE WHEN c_label = label THEN score END), 9)
        |      AS DECIMAL(28,9)) AS own,
        |    CAST(round(max(CASE WHEN c_label <> label THEN score END), 9)
        |      AS DECIMAL(28,9)) AS other
        |  FROM s GROUP BY 1, 2
        |), a AS (
        |  SELECT label, count(*) AS n_vecs,
        |    CAST(sum(own) AS DOUBLE) / count(*) AS mean_own_cos,
        |    CAST(sum(other) AS DOUBLE) / count(*) AS mean_best_other_cos
        |  FROM pv GROUP BY label
        |)
        |SELECT label, n_vecs, mean_own_cos, mean_best_other_cos,
        |  mean_own_cos - mean_best_other_cos AS margin
        |FROM a ORDER BY label""".stripMargin,

    // same centroid + argmax CTEs as sim_cluster_assign, then a #cells
    // occupancy agg; quotients are exact-long→double casts with one
    // correctly-rounded divide each
    "sim_ivf_balance" ->
      """WITH t AS (
        |  SELECT label,
        |    unnest(generate_series(1, len(embedding))) AS dim,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS e
        |  FROM embeddings
        |), c AS (
        |  SELECT label, dim,
        |    CAST(sum(CAST(e AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |      AS centroid
        |  FROM t GROUP BY 1, 2
        |), cv AS (
        |  SELECT label AS c_label, list(centroid ORDER BY dim) AS cv
        |  FROM c GROUP BY label
        |), s AS (
        |  SELECT e.vec_id, cv.c_label,
        |    list_dot_product(ev, cv.cv)
        |      / (sqrt(list_dot_product(ev, ev))
        |         * sqrt(list_dot_product(cv.cv, cv.cv))) AS score
        |  FROM (SELECT vec_id,
        |          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |        FROM embeddings) e
        |  CROSS JOIN cv
        |), a AS (
        |  SELECT vec_id, c_label AS cell FROM (
        |    SELECT vec_id, c_label,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY score DESC, c_label) AS rk
        |    FROM s) WHERE rk = 1
        |), occ AS (
        |  SELECT cell, count(*) AS n_vecs FROM a GROUP BY cell
        |), tot AS (
        |  SELECT (SELECT count(*) FROM cv) AS n_cells,
        |         (SELECT count(*) FROM a) AS n_total
        |)
        |SELECT cell, n_vecs,
        |  CAST(n_vecs AS DOUBLE) / n_total AS share,
        |  CAST(n_vecs * n_cells AS DOUBLE) / n_total AS load_factor,
        |  CAST(n_vecs * n_cells AS DOUBLE) / n_total > 2.0 AS is_hot
        |FROM occ CROSS JOIN tot ORDER BY cell""".stripMargin,

    // same DECIMAL(18,6)-summed centroids as sim_centroids, same
    // bit-stable left-to-right cosine as sim_topk_bruteforce
    "sim_cluster_assign" ->
      """WITH t AS (
        |  SELECT label,
        |    unnest(generate_series(1, len(embedding))) AS dim,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS e
        |  FROM embeddings
        |), c AS (
        |  SELECT label, dim,
        |    CAST(sum(CAST(e AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |      AS centroid
        |  FROM t GROUP BY 1, 2
        |), cv AS (
        |  SELECT label AS c_label, list(centroid ORDER BY dim) AS cv
        |  FROM c GROUP BY label
        |), s AS (
        |  SELECT e.vec_id, e.label, cv.c_label,
        |    list_dot_product(ev, cv.cv)
        |      / (sqrt(list_dot_product(ev, ev))
        |         * sqrt(list_dot_product(cv.cv, cv.cv))) AS score
        |  FROM (SELECT vec_id, label,
        |          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |        FROM embeddings) e
        |  CROSS JOIN cv
        |), r AS (
        |  SELECT vec_id, label, c_label, score,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY score DESC, c_label) AS rk
        |  FROM s
        |)
        |SELECT vec_id, label, c_label AS assigned, score,
        |  c_label = label AS label_match
        |FROM r WHERE rk = 1 ORDER BY vec_id""".stripMargin,

    // Bit-stable vs Spark: both sides accumulate the dot product
    // left-to-right in IEEE double (floats widen exactly), so the raw
    // doubles hash-match without rounding.
    "sim_topk_bruteforce" ->
      s"""WITH q AS (
        |  SELECT vec_id AS q_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
        |  FROM embeddings WHERE vec_id < $NumQueries
        |), s AS (
        |  SELECT q_id, e.vec_id,
        |    list_dot_product(qe, list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
        |      / (sqrt(list_dot_product(qe, qe))
        |         * sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
        |                                 list_transform(e.embedding, x -> CAST(x AS DOUBLE))))) AS score
        |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q_id
        |), r AS (
        |  SELECT q_id, vec_id, score,
        |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
        |  FROM s
        |)
        |SELECT q_id, CAST(rank AS INTEGER) AS rank, vec_id, score
        |FROM r WHERE rank <= $K ORDER BY q_id, rank""".stripMargin,

    "sim_range_search" ->
      s"""WITH q AS (
        |  SELECT vec_id AS q_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
        |  FROM embeddings WHERE vec_id < $NumQueries
        |), s AS (
        |  SELECT q_id, e.vec_id,
        |    list_dot_product(qe, list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
        |      / (sqrt(list_dot_product(qe, qe))
        |         * sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
        |                                 list_transform(e.embedding, x -> CAST(x AS DOUBLE))))) AS score
        |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q_id
        |)
        |SELECT q_id, vec_id, score FROM s
        |WHERE score >= 0.4 ORDER BY q_id, vec_id""".stripMargin,
    // sim_ann_lsh is probabilistic — covered by the recall-vs-bruteforce
    // ScalaTest instead of a SQL oracle.

    // same bit-stable cosine formulation as sim_topk_bruteforce /
    // dedup_embed_exact, ranked per SOURCE vector over the full corpus
    "sim_knn_graph_exact" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), s AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst,
        |    list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v))
        |         * sqrt(list_dot_product(b.v, b.v))) AS score
        |  FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id
        |), r AS (
        |  SELECT src, dst, score,
        |    row_number() OVER (PARTITION BY src ORDER BY score DESC, dst)
        |      AS rank
        |  FROM s
        |)
        |SELECT src, CAST(rank AS INTEGER) AS rank, dst, score
        |FROM r WHERE rank <= 3 ORDER BY src, rank""".stripMargin,

    "dedup_embed_exact" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |)
        |SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v))
        |       * sqrt(list_dot_product(b.v, b.v))) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v))
        |       * sqrt(list_dot_product(b.v, b.v))) >= 0.45
        |ORDER BY id1, id2""".stripMargin
  )
}
