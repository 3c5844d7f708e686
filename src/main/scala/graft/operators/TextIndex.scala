package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.HashFunctions.minhashBuckets

/** Persisted MinHash band-bucket index — the TEXT twin of
  * [[AnnIndex]]: near-dup state at rest, so a continuously-ingesting
  * corpus admits each day's crawl against yesterday's index instead
  * of re-MinHashing 100 TB of standing text per batch.
  *
  * The index holds (doc_id, band, bucket) — 16 band hashes per doc
  * (~16×16 B rows), ~0.1% of corpus bytes; the text itself is never
  * read again after its buckets are written. Bucket codes are a pure
  * function of the text (the same native minhash_buckets kernel the
  * batch LSH paths run), so append parity with a rebuild holds by
  * construction, exactly as AnnIndex.append's assignment purity does.
  *
  * [[admit]] is the ingest-admission decision (three stages, each
  * with the 100 TB shape):
  *   1. CORPUS screen: batch docs sharing ≥1 (band, bucket) with the
  *      index are near-dups of standing documents (a band collision
  *      fires at ~J^8, ≈0.66 at Jaccard 0.95, ~1 for exact/boilerplate
  *      repeats — the same trade nearDedupStream documents) and are
  *      rejected. The index side bloom-reduces to ~|batch buckets|
  *      BEFORE any exchange (ScaleJoins.bloomReducedSemiJoin) — the
  *      standing index never shuffles, only its batch-colliding rows.
  *   2. IN-BATCH collapse: survivors that are near-dups of each other
  *      keep one representative (star edges → components → min id,
  *      the proven dedup_minhash_clusters path, bounded by |batch|).
  *   3. The decision is PURE — [[ingest]] commits it by appending the
  *      admitted docs' buckets (map-only write).
  *
  * Admission is intentionally one-sided: borderline pairs whose bands
  * all miss defer to the periodic batch LSH pass over the corpus —
  * the stream/batch split every production dedup pipeline makes.
  *
  * [[delete]] is the takedown verb (the twin of AnnIndex.delete): a
  * removed doc's buckets stop screening future batches immediately —
  * a RE-INGEST of equivalent text is admitted again — and [[compact]]
  * folds the tombstones away physically (plus the per-batch small
  * files every append leaves). Same concurrency contract as AnnIndex:
  * compact holds `compact.lock`, appends fail fast under it, and a
  * crashed swap heals on the next lifecycle entry ([[IndexFiles]]). */
object TextIndex {

  /** (doc_id, band, bucket) — map-only, one codegen'd kernel pass. */
  def bucketsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(minhashBuckets(col("text"))).as(Seq("band", "bucket")))

  def build(s: SparkSession, docs: DataFrame, dir: String): Unit =
    bucketsOf(docs).write.mode("overwrite").parquet(s"$dir/buckets")

  def append(s: SparkSession, docs: DataFrame, dir: String): Unit = {
    IndexFiles.requireNoCompactInFlight(s, dir)
    // heal a crashed compact swap first — otherwise this append would
    // create a fresh buckets/ holding only this batch and strand the
    // standing index in buckets_retired (recovery only fires while
    // buckets/ is missing)
    val buckets = new org.apache.hadoop.fs.Path(s"$dir/buckets")
    IndexFiles.recoverRetired(IndexFiles.fsFor(s, buckets), buckets)
    bucketsOf(docs).write.mode("append").parquet(s"$dir/buckets")
  }

  /** Tombstone `ids`: their buckets stop screening batches from the
    * next [[admit]] on (so equivalent text re-ingests cleanly after a
    * takedown); [[compact]] removes them physically. Fails fast while
    * a compact is in flight — same silently-resurrected-takedown
    * hazard as AnnIndex.delete. */
  def delete(s: SparkSession, dir: String, ids: Seq[Long]): Unit = {
    import s.implicits._
    delete(s, dir, ids.toDF("doc_id").coalesce(1))
  }

  /** Takedown list as a DataFrame (first column = ids, cast to long) —
    * the corpus-scale shape, as in AnnIndex.delete: a takedown/recrawl
    * list is data, not a driver-side Seq. */
  def delete(s: SparkSession, dir: String, ids: DataFrame): Unit =
    IndexFiles.appendTombstones(s, dir, ids, "doc_id")

  private def liveBucketRows(s: SparkSession, dir: String): DataFrame =
    IndexFiles.dropTombstoned(s, dir,
      s.read.parquet(s"$dir/buckets"), "doc_id")

  /** Fold the per-append small files and drop tombstoned docs'
    * buckets physically (staging rewrite + rename-aside swap, compact
    * lock held — see [[IndexFiles]]). Returns (files before, after). */
  def compact(s: SparkSession, dir: String): (Long, Long) = {
    val buckets = new org.apache.hadoop.fs.Path(s"$dir/buckets")
    val fs = IndexFiles.fsFor(s, buckets)
    IndexFiles.recoverRetired(fs, buckets)
    IndexFiles.withCompactLock(s, dir) {
      val before = IndexFiles.countParquetFiles(fs, buckets)
      liveBucketRows(s, dir).coalesce(
          math.max(1, (before / 16).toInt))
        .write.mode("overwrite")
        .parquet(IndexFiles.stagingOf(buckets).toString)
      IndexFiles.swapInstall(fs, buckets)
      IndexFiles.clearTombstones(fs, dir)
      (before, IndexFiles.countParquetFiles(fs, buckets))
    }
  }

  /** The pure admission decision: batch docs that are near-dup-free
    * against the index AND first-of-their-cluster within the batch.
    * `expectedBatchBuckets` sizes the bloom (≈ 16 × batch docs; a
    * loose upper bound is fine). */
  def admit(s: SparkSession, batch: DataFrame, dir: String,
            expectedBatchBuckets: Long = 1L << 20): DataFrame = {
    IndexFiles.recoverRetired(IndexFiles.fsFor(s,
      new org.apache.hadoop.fs.Path(s"$dir/buckets")),
      new org.apache.hadoop.fs.Path(s"$dir/buckets"))
    val idx = liveBucketRows(s, dir)
    val bb = bucketsOf(batch)
    val collided = ScaleJoins
      .bloomReducedSemiJoin(bb, idx, Seq("band", "bucket"),
        expectedBatchBuckets)
      .select(col("doc_id")).distinct()
    val fresh = batch.join(collided, Seq("doc_id"), "left_anti")
    // in-batch collapse: non-root cluster members drop; singletons
    // (absent from the component labels) pass untouched
    val nonRoots = Components
      .connectedComponents(Dedup.minhashLshEdges(fresh))
      .where(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    fresh.join(nonRoots, Seq("doc_id"), "left_anti")
  }

  /** Admit + commit: append the admitted docs' buckets so the NEXT
    * batch screens against them too. Returns the admitted docs.
    *
    * The admission decision materializes ONCE (localCheckpoint):
    * without it, the append would run the full pipeline — bloom probe,
    * semi/anti joins, component collapse — and the caller's use of the
    * returned frame would run it all AGAIN, doubling the hot streaming
    * path and racing the index the append just grew. Batches are
    * bounded by construction (a crawl window), so holding one
    * materialized batch is safe. */
  def ingest(s: SparkSession, batch: DataFrame, dir: String,
             expectedBatchBuckets: Long = 1L << 20): DataFrame = {
    val admitted = admit(s, batch, dir, expectedBatchBuckets).localCheckpoint()
    append(s, admitted, dir)
    admitted
  }

  /** Gate entry: same deterministic corpus/batch split as
    * dedup_incremental (corpus = doc_id % 10 ≠ 0, batch ≡ 0 mod 10).
    * The synthetic corpus carries exact-duplicate text groups, so
    * batch docs whose text repeats a corpus doc collide on every band
    * and are rejected; genuinely new docs are admitted. Probabilistic
    * near-dup semantics → rows-only (TextIndexSpec pins rejection/
    * admission/in-batch collapse on planted docs). */
  def dedupIncrementalNear(s: SparkSession, d: String): DataFrame = {
    val all = documents(s, d)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_textindex_gate").toString
    build(s, all.where(col("doc_id") % 10 =!= 0), dir)
    ingest(s, all.where(col("doc_id") % 10 === 0), dir)
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_incremental_near" -> (dedupIncrementalNear _)
  )

  val oracles: Map[String, String] = Map.empty
}
