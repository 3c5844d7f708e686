package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the cluster
  * collapse step for near-dup dedup (candidate pairs → clusters → one
  * survivor per cluster). A single min-id propagation round only merges
  * direct neighbors; transitive chains (A≈B, B≈C, A̸≈C) need the full
  * component.
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Each round every node takes the min label over itself and its
  * neighbors (one shuffle join + one partial-aggregated min), then
  * labels contract through themselves (comp := comp(comp)), which
  * roughly halves the remaining propagation distance — convergence in
  * O(log diameter) rounds rather than O(diameter).
  *
  * Scale notes (100 TB path):
  *   - only `min` aggregates — partially aggregatable, so hub nodes
  *     (boilerplate docs have huge degree in near-dup graphs) combine
  *     map-side instead of skewing one reducer; no collect_list of
  *     neighborhoods anywhere (unlike the large-star/small-star
  *     formulation, which materializes per-node neighbor lists and
  *     skew-bombs on exactly those hubs).
  *   - every iteration ends in [[Lineage.truncate]]: lineage is cut
  *     so the plan stays O(1) per round instead of growing with the
  *     iteration count — reliable checkpoint() when a checkpoint dir
  *     is configured (the production path: blocks survive executor
  *     loss), localCheckpoint() otherwise.
  *   - dup-graph diameters are small in practice (clusters are
  *     near-cliques); maxIter bounds adversarial chains — with jumping,
  *     30 rounds covers ~2^29-length paths, ≫ any realistic dup chain
  *     (ScaleStress exercises a 200k-node pure chain).
  */
object Components {

  /** Components of the undirected graph given by `pairs(src, dst)`.
    * Returns (id, comp) for every node appearing in at least one pair,
    * where comp = min node id of the node's component. */
  def connectedComponents(pairs: DataFrame, src: String = "id1",
      dst: String = "id2", maxIter: Int = 30): DataFrame = {
    val s = col(src).cast("long")
    val t = col(dst).cast("long")
    val edges = pairs.select(s.as("a"), t.as("b"))
      .union(pairs.select(t.as("a"), s.as("b")))
      .where(col("a") =!= col("b"))
      .distinct()
      .transform(Lineage.truncate)

    // iteration checkpoints clean up behind themselves (keep=2: the
    // done-probe below still reads the PREVIOUS round's labels); the
    // edges checkpoint above is NOT chained — every round reads it
    val chain = new Lineage.Chain(keep = 2)
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .transform(chain.truncate)

    var done = edges.isEmpty
    var i = 0
    while (!done && i < maxIter) {
      // candidate labels: every neighbor's current comp, plus own
      val viaNeighbors = edges
        .join(labels.select(col("id").as("b"), col("comp")), "b")
        .select(col("a").as("id"), col("comp"))
      // not checkpointed: the pointer-jump self-join reuses the
      // aggregate's exchange (ReusedExchange), so materializing here
      // measured slower at the 200k-chain stress
      val stepped = viaNeighbors.union(labels)
        .groupBy("id").agg(min("comp").as("comp"))
      // pointer jump: comp := comp(comp) — labels are node ids, so the
      // label's own label is always defined
      val next = stepped
        .join(stepped.select(col("id").as("comp"), col("comp").as("jump")),
          Seq("comp"), "left")
        .select(col("id"), coalesce(col("jump"), col("comp")).as("comp"))
        .transform(chain.truncate)
      done = next
        .join(labels.withColumnRenamed("comp", "prev"), "id")
        .where(col("comp") =!= col("prev"))
        .isEmpty
      labels = next
      i += 1
    }
    labels
  }
}
