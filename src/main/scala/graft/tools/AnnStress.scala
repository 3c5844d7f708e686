package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev tool: exercise the DERIVED ANN/SemDeDup parameters off their
  * clamp floors (SURVEY.md §6). At the gate scales (≤2k vectors) every
  * derivation clamps to its floor (b=4, k=32), so the adaptive path —
  * the whole point of corpus-scaled parameters — never runs under the
  * gates. This replicates the sf0.1 embeddings 10×/50× and checks:
  *
  *   - LSH: bEff/lEff leave the floor (b=7@20k, b=9@100k), recall vs
  *     the exact brute-force top-k holds, and cand_frac SHRINKS as n
  *     grows (constant bucket occupancy — the scale claim itself);
  *   - IVF: kEff derives (313@20k) and hits its 512 cap (@100k) — the
  *     k×dim literal centroid tree at its worst case — with recall and
  *     cand_frac ≈ nProbe/k bounds plus wall-time sanity for the
  *     codegen of the 512-branch nearestCell/probe expressions;
  *   - SemDeDup: kEff derives (98@100k) and every planted twin pair
  *     (cos ≈ 1, same cell by construction) is recovered.
  *
  * Scaled corpus construction (deterministic, seed-free at runtime):
  * copy 0 keeps the original vectors, copy 1 plants a jittered twin of
  * every vector (±0.5% per coordinate — SemDeDup recall ground truth),
  * copies ≥2 get fresh hash-uniform vectors so the corpus stays in the
  * near-isotropic hard regime instead of degenerating into clone sets.
  * `sbt "runMain graft.tools.AnnStress [factor ...]"` (default 10 50). */
object AnnStress {
  private val Shift = 100000000L
  private val Dim = 64

  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(10, 50)
    val spark = graft.GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val candFracs = factors.map(f => runOne(spark, "/root/testdata/sf0.1", f))
    if (factors.size >= 2)
      check("LSH cand_frac shrinks as n grows (constant-occupancy claim)",
        candFracs.sliding(2).forall { case Seq(a, b) => b < a })
    spark.stop()
  }

  /** Hash-uniform coordinate array in [-1, 1]^Dim — fresh geometry per
    * (vec_id, salt), deterministic under retries. */
  private def freshVec(salt: Column): Column =
    transform(sequence(lit(0), lit(Dim - 1)), i =>
      ((pmod(xxhash64(col("vec_id"), i, salt), lit(2001L)) - lit(1000L))
        .cast("double") / 1000.0).cast("float"))

  /** freshVec projected onto the unit sphere — the corpus vectors are
    * unit-normalized (‖v‖ = 1.0 exactly), and IVF assignment is L2:
    * un-normalized fill (norm ≈ √(Dim/3) ≈ 4.6) would push every
    * original+twin into a handful of near-origin cells and fake a
    * pathological cand_frac. LSH is sign-scale-invariant either way. */
  private def freshUnitVec(salt: Column): Column = {
    val raw = freshVec(salt)
    val n = sqrt(graft.functions.VectorFunctions.dot(raw, raw))
    transform(raw, x => (x / n).cast("float"))
  }

  private def check(name: String, ok: Boolean): Unit = {
    println(s"${if (ok) "PASS" else "FAIL"}  $name")
    if (!ok) sys.exit(1)
  }

  /** Returns the LSH avg cand_frac (for the cross-factor shrink check). */
  def runOne(spark: SparkSession, src: String, factor: Int): Double = {
    val base = java.nio.file.Files.createTempDirectory(s"graft_ann_$factor").toString
    val emb = graft.Tables.embeddings(spark, src)
    val copies = spark.range(factor.toLong).select(col("id").as("_copy"))
    emb.crossJoin(copies)
      .withColumn("vec_id", col("vec_id") + col("_copy") * Shift)
      .withColumn("embedding",
        when(col("_copy") === 0, col("embedding"))
          .when(col("_copy") === 1, // planted twin of the copy-0 vector
            zip_with(col("embedding"), freshVec(lit(-1L)),
              (x, n) => x + n * lit(0.005f)))
          .otherwise(freshUnitVec(col("_copy"))))
      .drop("_copy")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val n = spark.read.parquet(s"$base/embeddings.parquet").count()
    val (bEff, lEff) = Similarity.lshParams(n)
    val kIvf = Similarity.ivfK(n, 64L)
    val kSem = Similarity.ivfK(n, 1024L)
    println(s"\n=== factor=$factor n=$n derived: LSH(b=$bEff, L=$lEff) " +
      s"IVF(k=$kIvf) SemDeDup(k=$kSem) ===")
    check(s"LSH b off the clamp floor (b=$bEff > 4)", bEff > 4)
    check(s"IVF k off the clamp floor (k=$kIvf > 32)", kIvf > 32)

    def timed[T](name: String)(x: => T): T = {
      val t0 = System.nanoTime()
      val r = x
      println(f"$name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // ANN quality/cost stats ride on every result row (driver-visible by
    // design); one aggregate collapse forces the full compute.
    def annStats(name: String, df: DataFrame,
                 costCol: String = "cand_frac"): (Double, Double, Double) = {
      val r = timed(name)(df
        .agg(min(col("recall")), avg(col("recall")), avg(col(costCol)))
        .collect().head)
      val (mn, av, cf) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      println(f"  recall min=$mn%.3f avg=$av%.3f  $costCol avg=$cf%.4f")
      (mn, av, cf)
    }

    val (_, lshAvg, lshCf) = annStats("sim_ann_lsh", Similarity.simAnnLsh(spark, base))
    // multi-probe head-to-head: L/4 tables (12 vs the derivation's 48
    // clamp), 4 probes per table — the corpus-side index shrinks 4×;
    // recall must stay within reach of the full-table run
    val (_, mpAvg, mpCf) = annStats("  multiprobe L=12",
      Similarity.simAnnLshMultiprobe(spark, base, L = 12, nProbe = 4))
    check(f"multi-probe recall ≥ 0.55 with a 4× smaller index (got $mpAvg%.3f" +
      f" vs full-table $lshAvg%.3f)", mpAvg >= 0.55)
    check(f"multi-probe cand_frac ≤ full-table's (got $mpCf%.4f vs $lshCf%.4f)",
      mpCf <= lshCf * 1.1)
    // every query's planted twin shares all hyperplane signs, so rank 1
    // is near-guaranteed; bulk recall bound is the derivation's own
    // target minus the clamp shortfall the object doc documents
    check(f"LSH avg recall ≥ 0.55 (got $lshAvg%.3f)", lshAvg >= 0.55)
    // the near-isotropic corpus (neighbors at cos ≈ 0.3) is LSH's
    // documented worst regime: L clamps at 48 and candidates stay fat
    // (~0.34 at 20k). The per-factor bound only guards against
    // quadratic blowup; the real scale claim is the cross-factor
    // SHRINK check in main (constant occupancy → cand_frac ∝ 1/n).
    check(f"LSH cand_frac ≤ 0.45 (got $lshCf%.4f)", lshCf <= 0.45)

    val (ivfMin, ivfAvg, ivfCf) = annStats("sim_ann_ivf", Similarity.simAnnIvf(spark, base))
    val pIvf = Similarity.ivfNProbe(kIvf)
    val ivfCfBound = 3.0 * pIvf / kIvf // ~3× the ideal nProbe/k occupancy
    // isotropic-floor recall at a ~6% probed fraction; every query's
    // planted twin must land in the probed set (min ≥ 1 hit of 10)
    check(f"IVF avg recall ≥ 0.3 at nProbe=$pIvf/$kIvf (got $ivfAvg%.3f)",
      ivfAvg >= 0.3)
    check(f"IVF min recall ≥ 0.1 — twin found (got $ivfMin%.3f)", ivfMin >= 0.1)
    check(f"IVF cand_frac ≤ 3×nProbe/k = $ivfCfBound%.4f (got $ivfCf%.4f)",
      ivfCf <= ivfCfBound)

    // PQ: 32× code compression, ADC scoring over ALL codes + a DERIVED
    // exact-rerank budget (~0.25% of n — a pinned 50 measured recall
    // 0.57 → 0.30 going 20 k → 100 k as ε-rate approx-distance
    // impostors outgrew the fixed list). Recall is floored on the
    // isotropic worst case; the planted twin quantizes to its
    // original's exact code cells, so ADC ranks it first and the
    // rerank confirms: min recall ≥ 1/10.
    val (pqMin, pqAvg, pqCf) = annStats("sim_ann_pq",
      Similarity.simAnnPq(spark, base), costCol = "rerank_frac")
    val rr = Similarity.pqRerank(n)
    check(f"PQ avg recall ≥ 0.4 at rerank=$rr (got $pqAvg%.3f)", pqAvg >= 0.4)
    check(f"PQ min recall ≥ 0.1 — twin found (got $pqMin%.3f)", pqMin >= 0.1)
    check(f"PQ rerank_frac = rerank/n ≤ ${3.0 * rr / n}%.4f (got $pqCf%.4f)",
      pqCf <= 3.0 * rr / n)

    // IVFPQ: the serving composition — ADC scans only PROBED cells'
    // codes (cand_frac ≈ probed-cell population, not 1.0), recall must
    // hold against the flat-PQ twin at the same derived rerank even
    // though flat PQ never misses a cell.
    val (ipqMin, ipqAvg, ipqCf) = annStats("sim_ann_ivfpq",
      Similarity.simAnnIvfPq(spark, base))
    val pIvfPq = math.min(kIvf, 3 * Similarity.ivfNProbe(kIvf))
    val ipqBound = 3.0 * pIvfPq / kIvf
    check(f"IVFPQ avg recall within 0.1 of flat PQ (got $ipqAvg%.3f vs $pqAvg%.3f)",
      ipqAvg >= pqAvg - 0.1)
    check(f"IVFPQ min recall ≥ 0.1 — twin found (got $ipqMin%.3f)", ipqMin >= 0.1)
    check(f"IVFPQ cand_frac ∝ probed cells ≤ 3×nProbe/k = $ipqBound%.4f " +
      f"(got $ipqCf%.4f)", ipqCf <= ipqBound)

    // SQ8: the 4× tier — codes are near-lossless (step/2 per dim), so
    // at the SAME derived rerank the approx ordering feeds the rerank a
    // better short list than PQ's 32× codes: recall must dominate PQ's.
    val (sq8Min, sq8Avg, _) = annStats("sim_ann_sq8",
      Similarity.simAnnSq8(spark, base), costCol = "rerank_frac")
    check(f"SQ8 avg recall ≥ flat PQ's (got $sq8Avg%.3f vs $pqAvg%.3f)",
      sq8Avg >= pqAvg)
    check(f"SQ8 min recall ≥ 0.1 — twin found (got $sq8Min%.3f)",
      sq8Min >= 0.1)

    // IVF×SQ8: identical probe lists to raw IVF (same coarse quantizer,
    // PLAIN IVF probe budget — no PQ headroom) and near-exact in-cell
    // ranking: recall must track raw IVF's at the same cell geometry.
    val (isqMin, isqAvg, isqCf) = annStats("sim_ann_ivfsq8",
      Similarity.simAnnIvfSq8(spark, base))
    val isqBound = 3.0 * pIvf / kIvf
    check(f"IVFSQ8 avg recall within 0.05 of raw IVF (got $isqAvg%.3f vs " +
      f"$ivfAvg%.3f)", isqAvg >= ivfAvg - 0.05)
    check(f"IVFSQ8 min recall ≥ 0.1 — twin found (got $isqMin%.3f)",
      isqMin >= 0.1)
    check(f"IVFSQ8 cand_frac ≤ 3×nProbe/k = $isqBound%.4f (got $isqCf%.4f)",
      isqCf <= isqBound)

    // kNN graph — the one ANN-family operator with corpus-sized OUTPUT
    // (top-k per EVERY vector): work must stay occupancy-bound, and
    // every copy-0 vector's jittered twin (cos ≈ 1, same buckets in
    // all tables) must surface as its rank-1 neighbor.
    val scaledEmb = spark.read.parquet(s"$base/embeddings.parquet")
    val nBase = emb.count()
    val knnTwinHits = timed("sim_knn_graph mp4")(
      Similarity.knnGraph(scaledEmb, nProbe = 4)
        .where(col("rank") === 1 && col("src") < Shift &&
          col("dst") === col("src") + Shift)
        .count())
    check(s"kNN graph (multi-probe 4) rank-1 = planted twin for ≥ 90% of " +
      s"originals ($knnTwinHits/$nBase)", knnTwinHits >= (nBase * 0.9).toLong)
    // the occupancy-bound claim must SURVIVE probing: 4 probes/table
    // multiply the candidate stream by ≤ nProbe (each probe pays one
    // bucket of derived occupancy), never by n — the cross-factor
    // timing above is the evidence (printed per factor; 10×/50× runs
    // stay near-flat like the single-probe round-6 leg)
    val knnSingle = timed("  single-probe")(
      Similarity.knnGraph(scaledEmb)
        .where(col("rank") === 1 && col("src") < Shift &&
          col("dst") === col("src") + Shift)
        .count())
    check(s"multi-probe keeps ≥ single-probe twin hits " +
      s"($knnTwinHits vs $knnSingle)", knnTwinHits >= knnSingle)

    // SemDeDup ground truth: every copy-0 vector has its jittered twin
    // at cos ≈ 1 ≥ 0.95; (id, id+Shift) pair ids are the plant itself.
    val planted = timed("dedup_semantic")(
      Similarity.semanticDedupPairs(scaledEmb)
        .where(col("id2") === col("id1") + Shift).count())
    println(s"  planted twins recovered: $planted / $nBase")
    check(s"SemDeDup planted-twin recall ≥ 0.9 ($planted/$nBase)",
      planted >= (nBase * 0.9).toLong)
    lshCf
  }
}
