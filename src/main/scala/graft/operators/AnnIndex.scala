package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Persisted IVF index lifecycle — the serving-layer state machine a
  * continuously-ingesting 100 TB corpus needs around the one-shot
  * index write in [[Similarity.simAnnIvfPersisted]]:
  *
  *   - [[build]]: fit the coarse quantizer, assign every vector, and
  *     persist THREE things — the cell-partitioned assignments (the
  *     FAISS inverted lists at rest), the centroids, and fit metadata
  *     (corpus size and quantizer distortion at fit time). Persisting
  *     the centroids is what makes the index maintainable: assignment
  *     is a pure function of (vector, centroids), so later batches can
  *     join the same geometry without a refit.
  *   - [[append]]: assign a new batch with the PERSISTED centroids and
  *     append into the existing cell directories — map-only, touches
  *     no standing data. Because assignment is pure,
  *     build(A)+append(B) holds exactly the same (vec_id, cell) set
  *     as build(A∪B) under the same centroids (AnnIndexSpec proves
  *     query-result equality), which is why a wholesale rebuild per
  *     ingest batch (`mode("overwrite")`) is never needed.
  *   - [[query]]: probe-cells per query become a static partition
  *     filter over the cell directories — the scan prunes at the
  *     directory level, identical to the one-shot persisted path.
  *   - [[maintain]]: the documented RE-FIT trigger. Appending never
  *     degrades correctness (every vector lands in its true nearest
  *     cell) but it degrades BALANCE: if the ingest distribution
  *     drifts, new mass crowds into few cells and probe cost rises.
  *     The decision reads two cheap signals — (a) appended fraction
  *     (appended rows / rows at fit): past ~1× the quantizer was fit
  *     on a minority of the data; (b) distortion ratio (new batch's
  *     mean d² to its nearest persisted centroid vs the same statistic
  *     at fit time): a ratio ≫ 1 means the batch lives where the
  *     centroids aren't. Either past its threshold → refit. The text
  *     side of the same pipeline watches content drift the same way
  *     via pipeline_fingerprint's per-source digests (Sharding.scala);
  *     this is the embedding-space twin of that check.
  *
  * Layout under `dir`: `cells/` (parquet partitioned by cell:
  * vec_id, embedding), `centroids/` (cell, centroid), `meta/`
  * (k, dim, n_at_fit, avg_d2_at_fit).
  */
object AnnIndex {

  case class Meta(k: Int, dim: Int, nAtFit: Long, avgD2AtFit: Double)

  /** Mean squared distance of `points` to their nearest centroid —
    * the quantizer-distortion statistic stored at fit time and
    * recomputed per batch by [[maintain]]. Driver-side over a bounded
    * sample (≤ fitSample's 4096 rows). */
  private def meanD2(points: Array[Array[Double]],
                     centroids: Array[Array[Double]]): Double = {
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val e = a(i) - b(i); s += e * e; i += 1 }
      s
    }
    if (points.isEmpty) 0.0
    else points.map(p => centroids.map(c => d2(p, c)).min).sum / points.length
  }

  private def nearestCellCol(v: org.apache.spark.sql.Column,
                             centroids: Array[Array[Double]]) =
    element_at(VectorFunctions.nearestCells(
      v, centroids.flatten, centroids.length, centroids.head.length, 1), 1)

  /** Fit (or adopt `pinnedCentroids`) and persist the full index.
    * Returns the centroids it wrote. */
  def build(s: SparkSession, emb: DataFrame, dir: String, k: Int = 0,
            targetCellSize: Long = 64L,
            pinnedCentroids: Option[Array[Array[Double]]] = None): Array[Array[Double]] = {
    import s.implicits._
    val n = emb.count()
    val sample = Similarity.fitSample(emb)
    val centroids = pinnedCentroids.getOrElse {
      val kEff = if (k > 0) k else Similarity.ivfK(n, targetCellSize)
      Similarity.lloyds(sample, kEff, iters = 10, seed = 42)
    }
    emb.select(col("vec_id"), col("embedding"),
        nearestCellCol(col("embedding"), centroids).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    Seq((centroids.length, centroids.head.length, n, meanD2(sample, centroids)))
      .toDF("k", "dim", "n_at_fit", "avg_d2_at_fit")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    centroids
  }

  def readCentroids(s: SparkSession, dir: String): Array[Array[Double]] =
    s.read.parquet(s"$dir/centroids").orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)

  def readMeta(s: SparkSession, dir: String): Meta = {
    val r = s.read.parquet(s"$dir/meta").collect().head
    Meta(r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))
  }

  /** Assign `newVecs` with the PERSISTED centroids and append into the
    * existing cell directories. Map-only: no standing data moves, no
    * refit, no shuffle beyond the dynamic-partition write. */
  def append(s: SparkSession, newVecs: DataFrame, dir: String): Unit = {
    val centroids = readCentroids(s, dir)
    newVecs.select(col("vec_id"), col("embedding"),
        nearestCellCol(col("embedding"), centroids).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/cells")
  }

  /** Exact-rescored top-k probe against the index at rest: the probe
    * lists (tiny query side, driver-computed through the same kernel
    * the build ran) become a static `cell IN (...)` partition filter —
    * only probed directories are ever read. Returns
    * (q_id, rank, vec_id, score[, cand_frac when `candFracOver` — the
    * corpus size — is set]). */
  def query(s: SparkSession, dir: String, queries: DataFrame,
            nProbe: Int = 0, topK: Int = 10,
            candFracOver: Long = 0L): DataFrame = {
    import s.implicits._
    val meta = readMeta(s, dir)
    val centroids = readCentroids(s, dir)
    val nProbeEff = if (nProbe > 0) nProbe else Similarity.ivfNProbe(meta.k)
    val flat = centroids.flatten
    val probes: Seq[(Long, Seq[Float], Int)] = queries
      .select(col("q_id"), col("q_emb")).collect().toSeq.flatMap { r =>
        val qe = r.getSeq[Float](1)
        graft.functions.VectorKernels.nearestCells(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(qe.toArray),
            true, flat, meta.k, meta.dim, nProbeEff)
          .toIntArray().toSeq.map(c => (r.getLong(0), qe, c))
      }
    val probeCells = probes.map(_._3).distinct
    val qs = probes.toDF("q_id", "q_emb", "cell")
    val wq = Window.partitionBy(col("q_id"))
    val scored = s.read.parquet(s"$dir/cells")
      .where(col("cell").isin(probeCells: _*))
      .join(broadcast(qs), Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        VectorFunctions.cosine(col("q_emb"), col("embedding")).as("score"))
    val withCost =
      if (candFracOver > 0L) scored.withColumn("cand_frac",
        round(count(lit(1)).over(wq) / lit(candFracOver.toDouble), 4))
      else scored
    val ranked = withCost
      .withColumn("rank", row_number().over(
        wq.orderBy(col("score").desc, col("vec_id"))))
      .where(col("rank") <= topK)
    val cols = Seq("q_id", "rank", "vec_id", "score") ++
      (if (candFracOver > 0L) Seq("cand_frac") else Nil)
    ranked.select(cols.map(col): _*).orderBy(col("q_id"), col("rank"))
  }

  /** Compact the cell directories in place. Every [[append]] leaves
    * one file set per batch in each touched cell — after k ingests a
    * cell holds k small files, and at 100 TB the probe scan's cost
    * becomes file-open-bound instead of byte-bound (the classic
    * streaming small-file problem). Rewrites each cell's rows into
    * ~one file per shuffle partition of its size (repartition on the
    * partition column co-locates each cell) via a staging directory +
    * atomic swap, because Spark cannot overwrite a path it is reading.
    * Query results are unchanged — same rows, fewer files. Returns
    * (files before, files after). */
  def compact(s: SparkSession, dir: String): (Long, Long) = {
    def countFiles: Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(new java.io.File(s"$dir/cells"))
    }
    val before = countFiles
    val staged = s"$dir/cells_compacting"
    s.read.parquet(s"$dir/cells")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(staged)
    val cells = new java.io.File(s"$dir/cells")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(cells)
    require(new java.io.File(staged).renameTo(cells),
      s"atomic swap failed: $staged -> $cells")
    (before, countFiles)
  }

  case class MaintainDecision(appendedFrac: Double, distortionRatio: Double,
                              refitNeeded: Boolean)

  /** Drift check for an incoming batch BEFORE appending it: compares
    * the batch's quantizer distortion against the fit-time statistic
    * and the index's growth against its fit-time size. Thresholds:
    * appended fraction ≥ 1.0 (the quantizer has seen a minority of
    * the data) or distortion ratio ≥ `maxDistortionRatio` (the batch
    * lives where the centroids aren't). */
  def maintain(s: SparkSession, dir: String, batch: DataFrame,
               maxDistortionRatio: Double = 1.5): MaintainDecision = {
    val meta = readMeta(s, dir)
    val centroids = readCentroids(s, dir)
    val indexed = s.read.parquet(s"$dir/cells").count()
    val appendedFrac =
      math.max(0L, indexed - meta.nAtFit).toDouble / meta.nAtFit
    val batchD2 = meanD2(Similarity.fitSample(batch), centroids)
    val ratio = if (meta.avgD2AtFit > 0) batchD2 / meta.avgD2AtFit
                else Double.PositiveInfinity
    MaintainDecision(appendedFrac, ratio,
      appendedFrac >= 1.0 || ratio >= maxDistortionRatio)
  }
}
