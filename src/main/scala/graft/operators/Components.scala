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
  *     near-cliques); maxIter bounds adversarial chains. Jumping alone
  *     covers long PATHS in O(log L) rounds but degrades to
  *     O(diameter) on label-ladder graphs (chains BETWEEN bucket
  *     stars — exactly what banded Hamming edges produce); the
  *     round-19 reverse-shortcut densification (loop body) restores
  *     logarithmic behavior on both shapes, measured 9 rounds on the
  *     diameter-57 sf1 media batch and 18 on ScaleStress's 200k-node
  *     pure chain. A maxIter exit without convergence logs a WARN.
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
    // round-19 convergence fix: the last TWO rounds' (id, comp) star
    // edges ride along with the input edges (see loop body). prev
    // starts as labels (all self-loops, filtered out as a =!= b).
    var prev = labels

    var done = edges.isEmpty
    var i = 0
    while (!done && i < maxIter) {
      // SHORTCUT CANDIDATES (round 19): min-propagation plus a single
      // pointer jump is O(diameter) on label-ladder graphs — the sf1
      // media batch (Hamming chains between band-bucket stars,
      // diameter 57) burned all 30 rounds and exited UNCONVERGED; the
      // jump alone only moves the min ~2 edge-hops per round there.
      // Treating each node's PREVIOUS-round label pointer as an extra
      // reverse edge densifies the graph around every partial root —
      // the Hash-to-Min idea (Rastogi et al. 2013, "Finding connected
      // components in map-reduce in logarithmic rounds") expressed as
      // one extra candidate stream instead of edge-table mutation:
      // the OLD pointer target learns the node's CURRENT label — the
      // reverse flow that min-only propagation lacks (the forward
      // flow is the pointer jump below; a forward shortcut stream
      // adds nothing but a join, and the current-round star's reverse
      // is a no-op by definition). Measured rounds on the
      // pathological graphs drop 32 → 9 (sf1 media batch, which
      // previously burned all of maxIter and exited UNCONVERGED) and
      // stay ≤18 on ScaleStress's 200k-node chain; near-clique dup
      // graphs stay at 2-3. Shortcut candidates always name a node
      // of the same component (comp is a min over a connected
      // subset), so the fixpoint is unchanged; both label generations
      // are already alive in the checkpoint chain (keep=2), so this
      // adds ONE join of label-table-sized, id-co-partitioned inputs
      // per round and NO extra action or materialization. Fresh toDF
      // aliases on both sides: round 1 has prev eq labels, and a raw
      // self-join (or a self-union under a filter) trips Union/Join
      // attribute rewrites.
      // rounds 0-1 skip the stream EXACTLY (not heuristically): at
      // round 0 prev is the identity and at round 1 prev(x) = x still,
      // so the reverse candidate is the node's own label — a no-op
      // that only cost a join. Simulated on every test graph: round
      // counts identical with activation at round 2.
      val viaReverse =
        if (i < 2) None
        else Some(prev.toDF("pid", "pcomp")
          .join(labels.toDF("lid", "lcomp"), col("pid") === col("lid"))
          .select(col("pcomp").as("id"), col("lcomp").as("comp")))
      // candidate labels: every neighbor's current comp, plus own
      val viaNeighbors = viaReverse.foldLeft(
        edges
          .join(labels.select(col("id").as("b"), col("comp")), "b")
          .select(col("a").as("id"), col("comp")))(_ unionAll _)
      // not checkpointed: the pointer-jump self-join reuses the
      // aggregate's exchange (ReusedExchange), so materializing here
      // measured slower at the 200k-chain stress
      val stepped = viaNeighbors.union(labels)
        .groupBy("id").agg(min("comp").as("comp"))
      // pointer jump: comp := comp(comp) — labels are node ids, so the
      // label's own label is always defined. The convergence flag
      // rides the SAME checkpointed table (round 19): joining the
      // previous labels in-plan replaces the old separate probe job
      // (a 2-exchange join per round) with a scan of the in-memory
      // checkpoint.
      val next = stepped
        .join(stepped.select(col("id").as("comp"), col("comp").as("jump")),
          Seq("comp"), "left")
        .select(col("id"), coalesce(col("jump"), col("comp")).as("comp"))
        .join(labels.toDF("id", "prevc"), "id")
        .select(col("id"), col("comp"),
          (col("comp") =!= col("prevc")).as("chg"))
        .transform(chain.truncate)
      done = next.where(col("chg")).isEmpty
      prev = labels
      labels = next.select(col("id"), col("comp"))
      i += 1
    }
    if (!done && i >= maxIter)
      org.apache.log4j.Logger.getLogger(getClass)
        .warn(s"connectedComponents: NOT converged after $maxIter rounds" +
          " - labels may be partial (raise maxIter)")
    labels
  }
}
