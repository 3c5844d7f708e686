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
  */
private[graft] object Lineage {
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
