package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *   - [[delete]]: tombstone removal — a takedown/recrawl drops ids
  *     from every subsequent query WITHOUT rewriting the cell
  *     directories (the whole point of the lifecycle is never paying
  *     a corpus rewrite per mutation). Tombstones are a tiny parquet
  *     id list; the query paths anti-join it on the already-pruned
  *     candidate set, and [[compact]] folds it away physically.
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
  * (k, dim, n_at_fit, avg_d2_at_fit), and — once [[delete]] has run —
  * `tombstones/` (vec_id) until the next [[compact]] folds it away.
  *
  * Concurrency contract (see [[IndexFiles]]): [[compact]] holds
  * `compact.lock` for its critical section and heals a crashed swap
  * on entry; [[append]]/[[appendPq]]/[[delete]] fail fast while the
  * lock exists (a tombstone written mid-compact would be cleared
  * without being folded — a silently resurrected takedown). A STRICT
  * exactly-once deployment additionally pauses its ingest streams
  * around compact — a batch that passed the lock check before the
  * lock appeared can still land between compact's staging read and
  * its swap and would be swept into the retired copy. */
object AnnIndex {

  case class Meta(k: Int, dim: Int, nAtFit: Long, avgD2AtFit: Double)

  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val e = a(i) - b(i); s += e * e; i += 1 }
    s
  }

  private def nearestIdx(p: Array[Double],
                         centroids: Array[Array[Double]]): Int =
    centroids.indices.minBy(i => (d2(p, centroids(i)), i))

  /** Mean squared distance of `points` to their nearest centroid —
    * the quantizer-distortion statistic stored at fit time and
    * recomputed per batch by [[maintain]]. Driver-side over a bounded
    * sample (≤ fitSample's 4096 rows). */
  private def meanD2(points: Array[Array[Double]],
                     centroids: Array[Array[Double]]): Double =
    if (points.isEmpty) 0.0
    else points.map(p => centroids.map(c => d2(p, c)).min).sum / points.length

  private def nearestCellCol(v: Column,
                             centroids: Array[Array[Double]]) =
    element_at(VectorFunctions.nearestCells(
      v, centroids.flatten, centroids.length, centroids.head.length, 1), 1)

  /** Cell assignment with a WRITE-PATH dim guard. The kernel returns an
    * empty probe list on a dim mismatch, and under non-ANSI SQL
    * `element_at(empty, 1)` is NULL — without the guard a
    * schema-drifted ingest batch would land under
    * `cell=__HIVE_DEFAULT_PARTITION__`, a directory no probe list ever
    * selects, i.e. the batch would vanish from the index with no error
    * (the query side has its own `require`; this is the corpus-side
    * twin). `raise_error` keeps the check inside codegen — no extra
    * pass over the batch. */
  private def guardedCell(dim: Int,
                          centroids: Array[Array[Double]]): Column =
    when(size(col("embedding")) === dim, nearestCellCol(col("embedding"), centroids))
      .otherwise(raise_error(concat(
        lit(s"embedding dim != $dim for vec_id="), col("vec_id").cast("string"))))

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
        guardedCell(centroids.head.length, centroids).as("cell"))
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
    * refit, no shuffle beyond the dynamic-partition write. Fails fast
    * while a [[compact]] is in flight (see the concurrency contract in
    * the object doc). */
  def append(s: SparkSession, newVecs: DataFrame, dir: String): Unit = {
    IndexFiles.requireNoCompactInFlight(s, dir)
    // heal a crashed swap BEFORE writing: the dynamic-partition append
    // would otherwise create a fresh cells/ holding only this batch,
    // stranding the standing index in cells_retired (recovery only
    // fires while cells/ is missing)
    recoverCells(s, dir)
    val centroids = readCentroids(s, dir)
    newVecs.select(col("vec_id"), col("embedding"),
        guardedCell(centroids.head.length, centroids).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/cells")
  }

  /** Tombstone `ids`: they stop appearing in [[query]]/[[queryPq]]
    * results (and therefore in every streaming probe — the stream
    * rides the same code path) from the next call on, without touching
    * the cell directories. Physical removal happens at the next
    * [[compact]]. Append-mode write: successive takedowns accumulate;
    * the query-side anti-join is idempotent under duplicate ids.
    * Fails fast while a compact is in flight — compact reads the
    * tombstone list once and clears it at the end, so a tombstone
    * written mid-compact would be cleared WITHOUT being folded and the
    * takedown would silently resurrect. */
  def delete(s: SparkSession, dir: String, ids: Seq[Long]): Unit = {
    import s.implicits._
    delete(s, dir, ids.toDF("vec_id").coalesce(1))
  }

  /** Takedown list as a DataFrame (first column = ids, cast to long) —
    * the corpus-scale shape: a recrawl diff or right-to-be-forgotten
    * list is itself data, not a driver-side Seq. The write is
    * distributed; the query-side anti-join plans by SIZE (no forced
    * broadcast — see [[IndexFiles.dropTombstoned]]). */
  def delete(s: SparkSession, dir: String, ids: DataFrame): Unit =
    IndexFiles.appendTombstones(s, dir, ids, "vec_id")

  private def dropTombstoned(s: SparkSession, dir: String,
                             df: DataFrame): DataFrame =
    IndexFiles.dropTombstoned(s, dir, df, "vec_id")

  /** Heal a crashed compact swap before reading `dir/cells` (cheap
    * exists() probe; see [[IndexFiles.recoverRetired]]). */
  private def recoverCells(s: SparkSession, dir: String): Unit = {
    val cells = new Path(s"$dir/cells")
    IndexFiles.recoverRetired(IndexFiles.fsFor(s, cells), cells)
  }

  /** Exact-rescored top-k probe against the index at rest: the probe
    * lists (tiny query side, driver-computed through the same kernel
    * the build ran) become a static `cell IN (...)` partition filter —
    * only probed directories are ever read. Returns
    * (q_id, rank, vec_id, score[, cand_frac when `candFracOver` — the
    * corpus size — is set]).
    *
    * `excludeSelf` drops candidates whose vec_id equals the query's
    * q_id — correct when queries are drawn from the corpus id space
    * (the gate paths: a vector must not be its own neighbor). A
    * serving deployment whose query ids live in a DIFFERENT id space
    * passes false: a numeric collision between an external q_id and an
    * unrelated corpus vec_id would otherwise silently drop that vector
    * from that query's top-k. */
  def query(s: SparkSession, dir: String, queries: DataFrame,
            nProbe: Int = 0, topK: Int = 10,
            candFracOver: Long = 0L,
            excludeSelf: Boolean = true): DataFrame = {
    import s.implicits._
    recoverCells(s, dir)
    val meta = readMeta(s, dir)
    val centroids = readCentroids(s, dir)
    val nProbeEff = if (nProbe > 0) nProbe else Similarity.ivfNProbe(meta.k)
    val flat = centroids.flatten
    val probes: Seq[(Long, Seq[Float], Int)] = queries
      .select(col("q_id"), col("q_emb")).collect().toSeq.flatMap { r =>
        val qe = r.getSeq[Float](1)
        // fail LOUDLY on a dim-mismatched query — the kernel would
        // return an empty probe list and the q_id would silently
        // vanish from the output, indistinguishable from "no
        // neighbors" (queries are the tiny online side; an error is
        // the right surface, same contract as the corpus-side guards)
        require(qe.size == meta.dim,
          s"query ${r.getLong(0)} has dim ${qe.size}, index expects ${meta.dim}")
        graft.functions.VectorKernels.nearestCells(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(qe.toArray),
            true, flat, meta.k, meta.dim, nProbeEff)
          .toIntArray().toSeq.map(c => (r.getLong(0), qe, c))
      }
    val probeCells = probes.map(_._3).distinct
    val qs = probes.toDF("q_id", "q_emb", "cell")
    val wq = Window.partitionBy(col("q_id"))
    val candidates = dropTombstoned(s, dir,
        s.read.parquet(s"$dir/cells").where(col("cell").isin(probeCells: _*)))
      .join(broadcast(qs), Seq("cell"))
    val scored = (if (excludeSelf) candidates.where(col("vec_id") =!= col("q_id"))
                  else candidates)
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

  // ------------------------------------------------------------------
  // PQ variant of the lifecycle — the IVFPQ index at rest
  // (Similarity.simAnnIvfPq rides this). Same directory contract plus
  // `codebooks/` (subspace, code, vector); `cells/` holds (vec_id,
  // c0..c{m-1}) PQ codes instead of raw embeddings — the 32×-smaller
  // inverted lists. Encoding is a pure function of (vector, centroids,
  // codebooks), so append == rebuild under pinned quantizers, exactly
  // as the raw lifecycle's assignment purity (spec-pinned for both).
  // ------------------------------------------------------------------

  case class PqQuantizers(centroids: Array[Array[Double]],
                          codebooks: Seq[Array[Array[Double]]])

  /** Fit (or adopt) the coarse + residual-PQ quantizers and persist
    * the fully-encoded index. Returns the quantizers it wrote. */
  def buildPq(s: SparkSession, emb: DataFrame, dir: String, k: Int = 0,
              m: Int = 8, codebookK: Int = 64, targetCellSize: Long = 64L,
              pinned: Option[PqQuantizers] = None): PqQuantizers = {
    import s.implicits._
    val n = emb.count()
    val sample = Similarity.fitSample(emb)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val sub = dim / m
    val qz = pinned.getOrElse {
      val kEff = if (k > 0) k else Similarity.ivfK(n, targetCellSize)
      val cents = Similarity.lloyds(sample, kEff, iters = 10, seed = 42)
      // residual codebooks: the sample's displacement from its own
      // coarse cell — the distribution the corpus codes draw from
      val residuals = sample.map { p =>
        val c = cents(nearestIdx(p, cents))
        Array.tabulate(dim)(i => p(i) - c(i))
      }
      PqQuantizers(cents, (0 until m).map { j =>
        Similarity.lloyds(residuals.map(_.slice(j * sub, (j + 1) * sub)),
          codebookK, iters = 10, seed = 42L + j)
      })
    }
    writeEncoded(s, emb, dir, qz, "overwrite")
    qz.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    qz.codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (v, c) => (j, c, v.toSeq) }
    }.toDF("subspace", "code", "vector")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    Seq((qz.centroids.length, qz.centroids.head.length, n,
        meanD2(sample, qz.centroids)))
      .toDF("k", "dim", "n_at_fit", "avg_d2_at_fit")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    qz
  }

  def readQuantizers(s: SparkSession, dir: String): PqQuantizers = {
    val cents = readCentroids(s, dir)
    val rows = s.read.parquet(s"$dir/codebooks")
      .orderBy(col("subspace"), col("code")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toArray))
    val cbs: Seq[Array[Array[Double]]] =
      rows.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2))
    PqQuantizers(cents, cbs)
  }

  /** Encode `newVecs` with the PERSISTED quantizers and append into
    * the cell directories — map-only, nothing standing moves. Fails
    * fast while a [[compact]] is in flight. */
  def appendPq(s: SparkSession, newVecs: DataFrame, dir: String): Unit = {
    IndexFiles.requireNoCompactInFlight(s, dir)
    recoverCells(s, dir) // same stranded-retired hazard as [[append]]
    writeEncoded(s, newVecs, dir, readQuantizers(s, dir), "append")
  }

  /** cell + residual PQ codes via the native kernels, written
    * partitioned by cell. Same write-path dim guard as the raw
    * lifecycle (see [[guardedCell]]). */
  private def writeEncoded(s: SparkSession, emb: DataFrame, dir: String,
                           qz: PqQuantizers, mode: String): Unit = {
    val kEff = qz.centroids.length
    val dim = qz.centroids.head.length
    val m = qz.codebooks.length
    val sub = dim / m
    val withRes = emb
      .select(col("vec_id"), col("embedding"),
        guardedCell(dim, qz.centroids).as("cell"))
      .withColumn("_res", VectorFunctions.cellResidual(
        col("embedding"), col("cell"), qz.centroids.flatten, kEff, dim))
    val codes = (0 until m).map { j =>
      element_at(VectorFunctions.nearestCells(
        slice(col("_res"), j * sub + 1, sub), qz.codebooks(j).flatten,
        qz.codebooks(j).length, sub, 1), 1).as(s"c$j")
    }
    withRes.select((col("vec_id") +: col("cell") +: codes): _*)
      .write.mode(mode).partitionBy("cell").parquet(s"$dir/cells")
  }

  /** ADC + exact-rerank top-k against the PQ index at rest: per
    * (query, probed cell) residual lookup tables ride the broadcast
    * side of the cell join; the probe list prunes code directories at
    * plan time; the approx top-`rerank` short list rescores exactly
    * against `rawEmb` (vec_id, embedding). With `candFracOver` set
    * (the corpus size) the result carries cand_frac (ADC-scanned
    * fraction) and rerank_frac (exact-rescored fraction).
    *
    * The default rerank budget derives from the corpus the index
    * actually HOLDS, not a fixed constant — a fixed default is the
    * fixed-budget recall collapse AnnStress measured (recall 0.57 →
    * 0.30 going 20 k → 100 k at a pinned 50). Sizing: max of the
    * fit-time count in meta and the caller's `candFracOver` (gate and
    * serving paths already pass the LIVE corpus size there for cost
    * accounting, so a grown index gets a grown budget for free).
    * Between refits with no candFracOver the fit-time number can lag
    * the live size, but [[maintain]]'s appendedFrac ≥ 1.0 trigger
    * bounds that staleness to 2× — within pqRerank's linear law, a
    * ≤2× budget shortfall, repaired at the refit the trigger demands.
    * `excludeSelf` as in [[query]]. */
  def queryPq(s: SparkSession, dir: String, queries: DataFrame,
              rawEmb: DataFrame, nProbe: Int = 0, rerank: Int = 0,
              topK: Int = 10, candFracOver: Long = 0L,
              excludeSelf: Boolean = true): DataFrame = {
    import s.implicits._
    recoverCells(s, dir)
    val meta = readMeta(s, dir)
    val qz = readQuantizers(s, dir)
    val kEff = qz.centroids.length
    val dim = qz.centroids.head.length
    val m = qz.codebooks.length
    val sub = dim / m
    val flat = qz.centroids.flatten
    val nProbeEff =
      if (nProbe > 0) nProbe
      else math.min(kEff, 3 * Similarity.ivfNProbe(kEff))
    val rerankEff =
      if (rerank > 0) rerank
      else Similarity.pqRerank(math.max(meta.nAtFit, candFracOver))
    val probes: Seq[(Long, Int, Seq[Seq[Double]])] = queries
      .select(col("q_id"), col("q_emb")).collect().toSeq.flatMap { r =>
        val qId = r.getLong(0)
        val q = r.getSeq[Float](1).map(_.toDouble).toArray
        require(q.length == dim,
          s"query $qId has dim ${q.length}, index expects $dim")
        graft.functions.VectorKernels.nearestCells(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(q),
            false, flat, kEff, dim, nProbeEff).toIntArray().toSeq.map { c =>
          val rq = Array.tabulate(dim)(i => q(i) - qz.centroids(c)(i))
          val lut = (0 until m).map { j =>
            val rj = rq.slice(j * sub, (j + 1) * sub)
            qz.codebooks(j).map(cb => d2(rj, cb)).toSeq
          }
          (qId, c, lut)
        }
      }
    val probeCells = probes.map(_._2).distinct
    val qs = probes.toDF("q_id", "cell", "lut")
    val wq = Window.partitionBy(col("q_id"))
    val candidates = dropTombstoned(s, dir,
        s.read.parquet(s"$dir/cells").where(col("cell").isin(probeCells: _*)))
      .join(broadcast(qs), Seq("cell"))
    val adc = (if (excludeSelf) candidates.where(col("vec_id") =!= col("q_id"))
               else candidates)
      .select(col("q_id"), col("vec_id"),
        (0 until m).map(j =>
            element_at(element_at(col("lut"), j + 1), col(s"c$j") + 1))
          .reduce(_ + _).as("approx_d2"))
    val withCost =
      if (candFracOver > 0L) adc.withColumn("cand_frac",
        round(count(lit(1)).over(wq) / lit(candFracOver.toDouble), 4))
      else adc
    val shortList = withCost
      .withColumn("arank", row_number().over(
        wq.orderBy(col("approx_d2").asc, col("vec_id"))))
      .where(col("arank") <= rerankEff)
    val reranked = shortList
      .join(rawEmb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries.select(col("q_id"), col("q_emb"))), Seq("q_id"))
      .select((Seq(col("q_id"), col("vec_id"),
        VectorFunctions.cosine(col("q_emb"), col("embedding")).as("score"))
        ++ (if (candFracOver > 0L) Seq(col("cand_frac")) else Nil)): _*)
      .withColumn("rank", row_number().over(
        wq.orderBy(col("score").desc, col("vec_id"))))
      .where(col("rank") <= topK)
    val costCols = if (candFracOver > 0L)
      Seq(col("cand_frac"),
        round(lit(rerankEff / candFracOver.toDouble), 4).as("rerank_frac"))
    else Nil
    reranked
      .select((Seq(col("q_id"), col("rank"), col("vec_id"), col("score"))
        ++ costCols): _*)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Compact the cell directories in place. Every [[append]] leaves
    * one file set per batch in each touched cell — after k ingests a
    * cell holds k small files, and at 100 TB the probe scan's cost
    * becomes file-open-bound instead of byte-bound (the classic
    * streaming small-file problem). Rewrites each cell's rows into
    * ~one file per shuffle partition of its size (repartition on the
    * partition column co-locates each cell) via a staging directory +
    * rename-aside swap, because Spark cannot overwrite a path it is
    * reading. Tombstoned ids are dropped in the rewrite and the
    * tombstone list is cleared — the delete becomes physical here.
    * Query results are unchanged — same live rows, fewer files.
    *
    * Holds `compact.lock` throughout (concurrent appends fail fast —
    * see the object doc; STRICT deployments pause ingest) and heals a
    * previously crashed swap on entry. Returns (files before, files
    * after). */
  def compact(s: SparkSession, dir: String): (Long, Long) = {
    val cells = new Path(s"$dir/cells")
    val fs = IndexFiles.fsFor(s, cells)
    IndexFiles.recoverRetired(fs, cells)
    IndexFiles.withCompactLock(s, dir) {
      val before = IndexFiles.countParquetFiles(fs, cells)
      val staged = IndexFiles.stagingOf(cells)
      dropTombstoned(s, dir, s.read.parquet(cells.toString))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(staged.toString)
      IndexFiles.swapInstall(fs, cells)
      IndexFiles.clearTombstones(fs, dir)
      (before, IndexFiles.countParquetFiles(fs, cells))
    }
  }

  case class MaintainDecision(appendedFrac: Double, distortionRatio: Double,
                              refitNeeded: Boolean)

  /** Drift check for an incoming batch BEFORE appending it: compares
    * the batch's quantizer distortion against the fit-time statistic
    * and the index's growth against its fit-time size. Thresholds:
    * appended fraction ≥ 1.0 (the quantizer has seen a minority of
    * the data) or distortion ratio ≥ `maxDistortionRatio` (the batch
    * lives where the centroids aren't). Tombstoned-but-uncompacted
    * rows still count toward the growth signal — they still occupy
    * probe I/O until [[compact]] folds them, which is exactly what
    * the maintenance decision prices. */
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
