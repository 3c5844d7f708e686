package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Filesystem plumbing shared by the two persisted-index lifecycles
  * ([[AnnIndex]] cells/, [[TextIndex]] buckets/): crash-safe in-place
  * rewrites, the compact↔writer mutual exclusion, and the tombstone
  * list both DELETE verbs ride.
  *
  * The swap protocol is rename-aside, never delete-then-rename — at no
  * instant is the live directory the ONLY copy deleted: either `live`
  * or `live_retired` holds a complete index. The residual hazard is a
  * crash BETWEEN the two renames (live already retired, staging not
  * yet installed): [[recoverRetired]] heals that on the next lifecycle
  * entry by renaming the retired copy back — but ONLY while no
  * `compact.lock` exists. A LIVE compact passes through the same
  * missing-live state mid-swap; healing it from a concurrent reader
  * would break the install rename (or, on rename-into-existing
  * filesystems, nest the staging copy inside the healed directory and
  * double every row). A crashed compact leaves its lock behind, so the
  * recovery path is: remove the stale lock (the error message says so),
  * and the next lifecycle entry heals. Readers that race a live
  * compact's swap window instead fail loudly on the missing path —
  * data-safe, and exactly why STRICT deployments pause probes/ingest
  * around compact (the docstring contract on both compacts).
  *
  * Concurrency: a compact holds `compact.lock` for its whole critical
  * section; writers ([[AnnIndex.append]], [[TextIndex.append]]) AND
  * delete verbs fail fast while the lock exists — compact's rewrite
  * reads the tombstone list once and clears it at the end, so a
  * tombstone written mid-compact would be cleared without ever being
  * folded (a silently resurrected takedown). This is advisory FS-level
  * exclusion — it serializes the single-cluster deployment (one
  * maintenance job, N ingest streams) without a coordination service;
  * a batch that passed the check before the lock appeared can still
  * land between the staging read and the swap, hence the STRICT
  * pause-around-compact contract above.
  *
  * Filesystem contract: the atomicity claims hold where the Hadoop
  * FileSystem gives real atomic rename and create-exclusive — HDFS and
  * local file://. S3A provides NEITHER (createNewFile is
  * check-then-PUT, directory rename is per-object copy+delete), so on
  * S3A the lock can race and a mid-swap crash can leave BOTH live and
  * retired partially populated, which [[recoverRetired]] cannot heal.
  * Deployments on object stores need an external mutex (the scheduler
  * that already serializes maintenance jobs) or an HDFS-backed index
  * root; the code does not pretend otherwise. */
private[operators] object IndexFiles {

  def fsFor(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  def countParquetFiles(fs: FileSystem, dir: Path): Long = {
    val it = fs.listFiles(dir, true)
    var n = 0L
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** Heal a crash between compact's two renames: `live` missing but a
    * complete retired copy present → rename it back. No-op otherwise,
    * and no-op while a compact.lock exists — the missing-live state is
    * then a LIVE compact's swap window, not a crash (see object doc). */
  def recoverRetired(fs: FileSystem, live: Path): Unit = {
    val retired = retiredOf(live)
    if (!fs.exists(lockPathFor(live)) &&
        !fs.exists(live) && fs.exists(retired)) {
      require(fs.rename(retired, live),
        s"recovery failed: could not rename $retired back to $live")
    }
  }

  def retiredOf(live: Path): Path =
    new Path(live.getParent, live.getName + "_retired")

  def stagingOf(live: Path): Path =
    new Path(live.getParent, live.getName + "_compacting")

  /** The lock lives at the index ROOT (`<dir>/compact.lock`), one
    * level above the live data directory (`<dir>/cells` or
    * `<dir>/buckets`). */
  private def lockPathFor(live: Path): Path =
    new Path(live.getParent, "compact.lock")

  private def lockPath(indexDir: String): Path =
    new Path(s"$indexDir/compact.lock")

  /** Writers AND delete verbs call this before touching the index:
    * fail fast while a compact is in flight (its staging read must not
    * race a concurrent mutation — an appended batch would be swept
    * into the retired copy and deleted; a tombstone would be cleared
    * without being folded). */
  def requireNoCompactInFlight(s: SparkSession, indexDir: String): Unit = {
    val lock = lockPath(indexDir)
    require(!fsFor(s, lock).exists(lock),
      s"compact in progress on $indexDir (lock file $lock) — pause ingest " +
        "until it completes, or remove a stale lock left by a crashed compact")
  }

  /** Run `body` holding the compact lock; the lock is created
    * atomically (a second concurrent compact fails fast) and removed
    * on every exit path. */
  def withCompactLock[T](s: SparkSession, indexDir: String)(body: => T): T = {
    val lock = lockPath(indexDir)
    val fs = fsFor(s, lock)
    require(fs.createNewFile(lock),
      s"another compact holds $lock (or a crashed one left it) — " +
        "remove the lock file if no compact is running")
    try body finally fs.delete(lock, false)
  }

  /** Install `staging` as `live` via rename-aside, then drop the
    * retired copy. Call with the compact lock held. */
  def swapInstall(fs: FileSystem, live: Path): Unit = {
    val retired = retiredOf(live)
    val staging = stagingOf(live)
    if (fs.exists(retired)) fs.delete(retired, true)
    require(fs.rename(live, retired), s"swap failed retiring $live")
    require(fs.rename(staging, live), s"swap failed installing $staging")
    fs.delete(retired, true)
  }

  // ---- tombstones (shared by both DELETE verbs) --------------------

  def tombstonePath(indexDir: String): Path =
    new Path(s"$indexDir/tombstones")

  /** Append a takedown list (first column = ids, cast to long and
    * normalized to `idCol`). Fails fast under a live compact — see
    * [[requireNoCompactInFlight]]. */
  def appendTombstones(s: SparkSession, indexDir: String,
                       ids: DataFrame, idCol: String): Unit = {
    requireNoCompactInFlight(s, indexDir)
    ids.select(col(ids.columns.head).cast("long").as(idCol))
      .write.mode("append").parquet(tombstonePath(indexDir).toString)
  }

  /** Drop tombstoned ids from `df` (anti join on `idCol`) — no-op when
    * no delete has ever run. No broadcast HINT: the list is a parquet
    * read with known stats, so Catalyst auto-broadcasts the (typical)
    * tiny-takedown case and falls back to a shuffled anti join when a
    * bulk recrawl diff outgrows the threshold — a forced hint would
    * OOM exactly there. */
  def dropTombstoned(s: SparkSession, indexDir: String,
                     df: DataFrame, idCol: String): DataFrame = {
    val p = tombstonePath(indexDir)
    if (fsFor(s, p).exists(p))
      df.join(s.read.parquet(p.toString).select(col(idCol)),
        Seq(idCol), "left_anti")
    else df
  }

  /** Clear the tombstone list — call only from compact, after the
    * rewrite that folded it has been installed. */
  def clearTombstones(fs: FileSystem, indexDir: String): Unit = {
    val p = tombstonePath(indexDir)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
