package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation that upgrades with the deployment.
  *
  * Iterative operators (connected components, BPE merges) and
  * consumed-twice projections (CCNet scoring, index admission) must
  * cut the logical plan periodically or analyzer/optimizer cost grows
  * linearly with iterations. `localCheckpoint()` does that but stores
  * blocks ONLY on executors with no lineage to recompute — fine for a
  * single-JVM local run, but at the 100 TB deployment scale the
  * docstrings target, one lost executor fails the job irrecoverably.
  *
  * So: when a reliable checkpoint dir is configured
  * (`sc.setCheckpointDir` — HDFS/object store on a real cluster), use
  * `checkpoint()`, whose blocks live on the checkpoint FS and survive
  * executor loss; otherwise fall back to `localCheckpoint()`.
  * Production jobs set the dir; tests and local runs need nothing.
  * Both variants are eager — the upstream job runs at
  * DataFrame-construction time by design (every caller immediately
  * consumes the materialized table, usually more than once).
  *
  * CLEANUP: Spark never deletes reliable checkpoints on its own
  * (`spark.cleaner.referenceTracking.cleanCheckpoints` defaults to
  * false, and even enabled it only fires on driver GC), so an
  * iterative loop would accumulate one full table copy per truncation
  * on the checkpoint FS. Loops therefore truncate through a [[Chain]],
  * which deletes a superseded checkpoint's files once NEWER ones have
  * materialized — keeping the last two alive, because a loop's
  * convergence check may still read the previous iteration (the
  * Components done-probe joins next against labels).
  */
private[graft] object Lineage {
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Delete the reliable-checkpoint files behind `df` (no-op for local
    * checkpoints — their blocks die with RDD GC — and on any FS
    * error: cleanup must never fail the job that outgrew the file). */
  private def removeCheckpoint(df: DataFrame): Unit =
    for (path <- org.apache.spark.sql.graft.GraftInternals.checkpointFile(df))
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(
          df.sparkSession.sparkContext.hadoopConfiguration)
        fs.delete(p, true)
        ()
      } catch { case _: Exception => () }

  /** Truncation chain for iterative loops: each call truncates, then
    * deletes checkpoints more than `keep` truncations old — bounded
    * checkpoint-FS footprint no matter how many iterations run. The
    * LAST `keep` checkpoints stay alive for the caller (the final
    * result usually IS one of them). */
  final class Chain(keep: Int = 2) {
    private val live = scala.collection.mutable.Queue.empty[DataFrame]
    def truncate(df: DataFrame): DataFrame = {
      val cur = Lineage.truncate(df)
      live.enqueue(cur)
      while (live.size > keep) removeCheckpoint(live.dequeue())
      cur
    }
  }
}
