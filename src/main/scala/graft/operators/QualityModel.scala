package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables._

/** Model-based quality scoring — the CLASSIFIER leg of the quality
  * triad (heuristic rules: quality_gopher_rules; perplexity buckets:
  * quality_ccnet_bucket; learned model: this), i.e. the
  * CCNet/fastText production pattern (Wenzek et al. 2020,
  * arXiv:1911.00359 §4.4; Joulin et al. 2016, arXiv:1607.01759):
  * train a cheap linear classifier once on labeled exemplars, then
  * score the whole corpus map-only.
  *
  * Here the labels are DISTILLED from the engine's own gate — docs
  * the Gopher rule conjunction admits are positives, rejects are
  * negatives — so the classifier learns a smooth, thresholdable
  * surrogate of the hard rules (the usual reason to distill: one
  * dot product per doc instead of five regex scans, a tunable
  * operating point instead of a fixed conjunction, and scores that
  * rank borderline docs the binary rules cannot).
  *
  * Scale shape — the whole point of the split design:
  *   - FIT runs once over a deterministic hash-drawn sample
  *     (md5-threshold per class, the sampleStratified discipline —
  *     reshard/retry-stable), through spark.ml LogisticRegression.
  *     Fit vectors are assembled FROM THE SAME declarative
  *     (doc, dim, tf) aggregate the scorer uses — one small vector-
  *     assembly UDF confined to the ≤2·perClass-row fit sample (NOT
  *     HashingTF, whose murmur3 variant differs from SQL `hash` —
  *     using it would train on features the scorer can't reproduce).
  *     Only the coefficient ARRAY leaves the fit.
  *   - SCORING is pure declarative SQL: tokens hash to dims via
  *     `pmod(hash(term), dims)` — identical to the fit features by
  *     construction — the ≤dims-row weight table broadcast-joins onto
  *     the (doc, dim, tf) aggregate, and the score is
  *     sigmoid(intercept + Σ w·tf) from one partial+final agg.
  *     No UDF, no vector types, nothing but codegen in the corpus
  *     path; the token stream shuffles once as (doc, dim) counts.
  */
object QualityModel {

  val Dims = 1024

  private def terms(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** (doc_id, dim, tf) — the hashed bag-of-words both fit and scoring
    * agree on. */
  private def hashedTf(docs: DataFrame, dims: Int): DataFrame =
    docs.select(col("doc_id"), explode(terms(col("text"))).as("term"))
      .select(col("doc_id"), pmod(hash(col("term")), lit(dims)).as("dim"))
      .groupBy(col("doc_id"), col("dim")).agg(count(lit(1)).as("tf"))

  /** Fit the distilled quality model: weak labels from the Gopher
    * conjunction, a deterministic per-class hash sample of
    * ~`perClass` docs, L2 logistic regression over the SAME hashed
    * (doc, dim, tf) features the scorer computes. Returns (weights
    * table as a DataFrame(dim, w), intercept) — the model IS that
    * ≤dims-row table, persistable like the DSIR weights or the ANN
    * quantizers. */
  def fitQualityLr(docs: DataFrame, dims: Int = Dims,
                   perClass: Int = 2000, maxIter: Int = 25,
                   seed: Long = 42L): (DataFrame, Double) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val labeled = docs
      .select(col("doc_id"), col("text"),
        when(QualityRules.gopherKeep(col("text")), 1.0).otherwise(0.0)
          .as("label"))
    // deterministic draw: per-class md5 threshold sized from the class
    // counts (≤2 numbers to the driver), so the sample is stable
    // across partitionings and scales like every other draw here
    val counts = labeled.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // a single-class weak-label corpus (all docs pass, or all fail, the
    // Gopher gate) has nothing to distill: LR returns a degenerate
    // ±Infinity-intercept model that would silently admit or reject
    // EVERYTHING downstream — fail loudly instead of persisting it
    require(counts.keySet == Set(0.0, 1.0),
      s"quality-model fit needs both weak-label classes present; " +
        s"Gopher gate produced only " +
        s"${counts.keys.toSeq.sorted.mkString("{", ",", "}")} " +
        "(class -> count: " +
        counts.toSeq.sortBy(_._1).map { case (k, v) => s"$k -> $v" }
          .mkString(", ") + ")")
    def thr(label: Double): String = {
      val n = counts.getOrElse(label, 0L)
      val frac = if (n == 0) 1.0 else math.min(1.0, perClass.toDouble / n)
      if (frac >= 1.0) "ffffff"
      else f"${math.floor(frac * (1 << 24)).toLong}%06x"
    }
    val h = substring(md5(concat(col("doc_id").cast("string"),
      lit(s":qlr:$seed"))), 1, 6)
    val sample = labeled.where(
      (col("label") === 1.0 && h <= lit(thr(1.0))) ||
        (col("label") === 0.0 && h <= lit(thr(0.0))))
    // assemble ml vectors from the scorer's own feature table — the
    // one fit-side UDF, over ≤2·perClass rows, never the corpus
    val entries = hashedTf(sample.select(col("doc_id"), col("text")), dims)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("dim"), col("tf"))).as("es"))
    val toVec = udf { (es: Seq[org.apache.spark.sql.Row]) =>
      val pairs = es.map(e => (e.getInt(0), e.getLong(1).toDouble))
        .sortBy(_._1).toArray
      org.apache.spark.ml.linalg.Vectors.sparse(
        dims, pairs.map(_._1), pairs.map(_._2))
    }
    val fitInput = sample.select(col("doc_id"), col("label"))
      .join(entries, Seq("doc_id"), "left")
      .select(col("label"),
        toVec(coalesce(col("es"),
          array().cast("array<struct<dim:int,tf:bigint>>"))).as("features"))
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setRegParam(1e-3).setLabelCol("label")
    val model = lr.fit(fitInput)
    val w = model.coefficients.toArray
    val weights = w.zipWithIndex.collect {
      case (wi, i) if wi != 0.0 => (i, wi)
    }.toSeq.toDF("dim", "w")
    (weights, model.intercept)
  }

  /** Score docs against a fitted (weights, intercept) model —
    * q_score = sigmoid(b + Σ_dims w·tf), all declarative: one hashed
    * (doc, dim, tf) aggregate, a broadcast join on the ≤dims-row
    * weight table, one partial+final sum per doc. Docs with no terms
    * (or no weighted terms) score sigmoid(b) via the left join. */
  def scoreQuality(docs: DataFrame, weights: DataFrame,
                   intercept: Double, dims: Int = Dims): DataFrame = {
    val dots = hashedTf(docs, dims)
      .join(broadcast(weights), Seq("dim"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w") * col("tf")).as("dot"))
    docs.select(col("doc_id"))
      .join(dots, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("dot"), lit(0.0)) + intercept))))
          .as("q_score"))
  }

  /** Persist the fitted model: one parquet table of (dim, w) rows plus
    * the intercept as the reserved dim = −1 row — that table IS the
    * model (refit offline and swap by directory: the DSIR-weights /
    * ANN-quantizer discipline, consumed by the streaming gate).
    *
    * Layout: `dir/weights` (the model) and, when `fitDocs` is given,
    * `dir/snapshot` — the score-distribution histogram of the fit
    * corpus (20 fixed buckets over [0,1]), the reference [[maintain]]
    * compares live traffic against. The snapshot costs one scoring
    * pass at save time (broadcast join + one agg — the same plan the
    * scorer runs anyway) and is ≤20 rows on disk. */
  def saveModel(weights: DataFrame, intercept: Double, dir: String,
                fitDocs: Option[DataFrame] = None): Unit = {
    val spark = weights.sparkSession
    import spark.implicits._
    weights.select(col("dim").cast("int"), col("w").cast("double"))
      .unionByName(Seq((-1, intercept)).toDF("dim", "w"))
      .write.mode("overwrite").parquet(s"$dir/weights")
    fitDocs.foreach { docs =>
      scoreHistogram(scoreQuality(docs, weights, intercept))
        .write.mode("overwrite").parquet(s"$dir/snapshot")
    }
  }

  def loadModel(s: SparkSession, dir: String): (DataFrame, Double) = {
    val t = s.read.parquet(s"$dir/weights")
    val b = t.where(col("dim") === -1).select(col("w"))
      .collect()(0).getDouble(0)
    (t.where(col("dim") =!= -1), b)
  }

  /** 20-bucket histogram of q_score shares — the distribution
    * fingerprint both the snapshot and [[maintain]]'s live side use.
    * Scale shape: one partial+final agg over ≤21 keys (bucket 20 is
    * the exact q_score = 1.0 edge, folded into 19). */
  private def scoreHistogram(scored: DataFrame): DataFrame = {
    val b = least(floor(col("q_score") * 20).cast("int"), lit(19))
    scored.groupBy(b.as("bucket")).agg(count(lit(1)).as("n"))
  }

  final case class MaintainReport(drift: Double, threshold: Double,
                                  refitNeeded: Boolean,
                                  nLive: Long, nFit: Long)

  /** Drift check — the [[AnnIndex.maintain]] twin for the quality
    * model: score `docs` (live traffic) with the persisted model,
    * histogram the scores, and compare against the fit-time snapshot
    * by total-variation distance (½ Σ |share_live − share_fit| over
    * the 20 buckets, ∈ [0,1]). TVD above `threshold` means the score
    * distribution the 0.5 operating point was chosen against no
    * longer describes the traffic — refit. Cost: one scoring pass
    * over `docs` + two ≤20-row tables to the driver; the corpus never
    * re-reads the fit sample. */
  def maintain(s: SparkSession, dir: String, docs: DataFrame,
               threshold: Double = 0.15): MaintainReport = {
    val (w, b) = loadModel(s, dir)
    val snapPath = s"$dir/snapshot"
    require(new java.io.File(snapPath).exists ||
      snapPath.contains("://"), // object-store paths can't File-probe
      s"no fit snapshot at $snapPath — refit with saveModel(fitDocs=...)")
    def shares(h: DataFrame): (Map[Int, Double], Long) = {
      val rows = h.collect().map(r => r.getInt(0) -> r.getLong(1))
      val total = rows.map(_._2).sum
      (rows.map { case (k, n) => k -> n.toDouble / total }.toMap, total)
    }
    val (fitShares, nFit) = shares(s.read.parquet(snapPath))
    val (liveShares, nLive) = shares(scoreHistogram(scoreQuality(docs, w, b)))
    val drift = (0 until 20).map { k =>
      math.abs(liveShares.getOrElse(k, 0.0) - fitShares.getOrElse(k, 0.0))
    }.sum / 2.0
    MaintainReport(drift, threshold, drift > threshold, nLive, nFit)
  }

  /** Gate report: fit on the corpus' own weak labels, score every doc,
    * and summarize per (lang, weak label) — mean learned score and the
    * share the 0.5 operating point would admit. The separation between
    * the label rows IS the distillation quality. Rows ≤ 2·|langs|. */
  def qualityClassifierReport(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val (weights, b) = fitQualityLr(docs)
    val labeled = docs.select(col("doc_id"), col("lang"),
      when(QualityRules.gopherKeep(col("text")), 1L).otherwise(0L)
        .as("rule_keep"))
    scoreQuality(docs, weights, b)
      .join(labeled, Seq("doc_id"))
      .groupBy(col("lang"), col("rule_keep"))
      .agg(count(lit(1)).as("n"),
        avg(col("q_score")).as("mean_q"),
        (sum(when(col("q_score") >= 0.5, 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1))).as("admit_share"))
      .orderBy(col("lang"), col("rule_keep"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_classifier" -> (qualityClassifierReport _)
  )

  // The fit is an iterative LBFGS optimization — not SQL-expressible;
  // pinned by ScalaTest (feature parity with HashingTF, planted
  // separation, scoring-plan shape) instead of a DuckDB oracle.
  val oracles: Map[String, String] = Map.empty
}
