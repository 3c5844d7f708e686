package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem plumbing shared by the two persisted-index lifecycles
  * ([[AnnIndex]] cells/, [[TextIndex]] buckets/): crash-safe in-place
  * rewrites and the compact↔append mutual exclusion.
  *
  * The swap protocol is rename-aside, never delete-then-rename — at no
  * instant is the live directory the ONLY copy deleted: either `live`
  * or `live_retired` holds a complete index. The residual hazard is a
  * crash BETWEEN the two renames (live already retired, staging not
  * yet installed): [[recoverRetired]] heals that on the next lifecycle
  * entry by renaming the retired copy back, so readers and a compact
  * re-run find a live directory without manual surgery.
  *
  * Concurrency: a compact holds `compact.lock` (atomic
  * `createNewFile`) for its whole critical section; writers
  * ([[AnnIndex.append]], [[TextIndex.append]]) fail fast while the
  * lock exists. This is advisory FS-level exclusion — it serializes
  * the single-cluster deployment (one maintenance job, N ingest
  * streams) without a coordination service; a batch that passed the
  * check before the lock appeared can still land between the staging
  * read and the swap, so a STRICT deployment pauses its ingest streams
  * around compact (the docstring contract on both compacts). Hadoop FS
  * API throughout: the index lives wherever Spark wrote it (HDFS, S3A,
  * or local). */
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
    * complete retired copy present → rename it back. No-op otherwise. */
  def recoverRetired(fs: FileSystem, live: Path): Unit = {
    val retired = retiredOf(live)
    if (!fs.exists(live) && fs.exists(retired)) {
      require(fs.rename(retired, live),
        s"recovery failed: could not rename $retired back to $live")
    }
  }

  def retiredOf(live: Path): Path =
    new Path(live.getParent, live.getName + "_retired")

  def stagingOf(live: Path): Path =
    new Path(live.getParent, live.getName + "_compacting")

  private def lockPath(indexDir: String): Path =
    new Path(s"$indexDir/compact.lock")

  /** Writers call this before appending: fail fast while a compact is
    * in flight (its staging read must not race a concurrent append —
    * the appended batch would be swept into the retired copy and
    * silently deleted). */
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
}
