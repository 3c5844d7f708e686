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

    // iteration checkpoints clean up behind themselves (keep=2: round
    // N+1's candidate stream reads round N's table while the new one
    // materializes); the edges checkpoint above is NOT chained — every
    // round reads it
    val chain = new Lineage.Chain(keep = 2)
    // the round table carries (id, comp) and, from round 1 on, prevc =
    // the label one round earlier — the SAME table serves the next
    // round's reverse-shortcut stream, the done probe, and the label
    // lookup, so no round ever joins two label generations (round 20:
    // the old shape paid a prev⋈labels join for the shortcut stream
    // and a labels join for the convergence flag, every round)
    var round = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .transform(chain.truncate)

    var done = edges.isEmpty
    var i = 0
    val nullL = lit(null).cast("long")
    while (!done && i < maxIter) {
      val labels = round.select(col("id"), col("comp"))
      // SHORTCUT CANDIDATES (round 19): min-propagation plus a single
      // pointer jump is O(diameter) on label-ladder graphs — the sf1
      // media batch (Hamming chains between band-bucket stars,
      // diameter 57) burned all 30 rounds and exited UNCONVERGED; the
      // jump alone only moves the min ~2 edge-hops per round there.
      // Treating each node's PREVIOUS-round label pointer as an extra
      // reverse edge densifies the graph around every partial root —
      // the Hash-to-Min idea (Rastogi et al. 2013, "Finding connected
      // components in map-reduce in logarithmic rounds") expressed as
      // one extra candidate stream: the OLD pointer target learns the
      // node's CURRENT label — the reverse flow that min-only
      // propagation lacks. Measured rounds on the pathological graphs
      // drop 32 → 9 (sf1 media batch) and stay ≤18 on ScaleStress's
      // 200k-node chain; near-clique dup graphs stay at 2-3. Shortcut
      // candidates always name a node of the same component (comp is
      // a min over a connected subset), so the fixpoint is unchanged.
      // Round 20: the stream is a plain projection (prevc, comp) of
      // the checkpointed round table — the old prev⋈labels join
      // recomputed exactly this pairing from two label generations.
      // rounds 0-1 skip the stream EXACTLY (not heuristically): at
      // round 0 prevc does not exist (identity labels) and at round 1
      // prevc(x) = x still, so the reverse candidate is the node's own
      // label — a no-op. Simulated on every test graph: round counts
      // identical with activation at round 2.
      val viaReverse =
        if (i < 2) None
        else Some(round.select(col("prevc").as("id"), col("comp"),
          nullL.as("prev")))
      // candidate labels: every neighbor's current comp, plus own (the
      // own-label row doubles as the prevc carrier — max(prev) sees
      // exactly one non-null per id, so the convergence flag and next
      // round's shortcut source ride the SAME aggregation instead of a
      // post-jump join). Round 0 EXACTLY: labels are the identity, so
      // label(b) = b and the neighbor join is the plain (a, b)
      // projection — the edge table crosses the network once (into the
      // groupBy) instead of twice (join by b, then groupBy by id), and
      // the labels-side exchange disappears.
      val viaNeighbors =
        if (i == 0) edges.select(col("a").as("id"), col("b").as("comp"),
          nullL.as("prev"))
        else edges
          .join(labels.select(col("id").as("b"), col("comp")), "b")
          .select(col("a").as("id"), col("comp"), nullL.as("prev"))
      val stream = viaReverse.foldLeft(viaNeighbors)(_ unionAll _)
        .union(labels.select(col("id"), col("comp"),
          col("comp").as("prev")))
      // not checkpointed: the pointer-jump self-join reuses the
      // aggregate's exchange (ReusedExchange), so materializing here
      // measured slower at the 200k-chain stress
      val stepped = stream.groupBy("id")
        .agg(min("comp").as("comp"), max("prev").as("prevc"))
      // pointer jump: comp := comp(comp) — labels are node ids, so the
      // label's own label is always defined
      val next = stepped
        .join(stepped.select(col("id").as("comp"), col("comp").as("jump")),
          Seq("comp"), "left")
        .select(col("id"), coalesce(col("jump"), col("comp")).as("comp"),
          col("prevc"))
        .transform(chain.truncate)
      done = next.where(col("comp") =!= col("prevc")).isEmpty
      round = next
      i += 1
    }
    if (!done && i >= maxIter)
      org.apache.log4j.Logger.getLogger(getClass)
        .warn(s"connectedComponents: NOT converged after $maxIter rounds" +
          " - labels may be partial (raise maxIter)")
    round.select(col("id"), col("comp"))
  }
}
