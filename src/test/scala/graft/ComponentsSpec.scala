package graft

import graft.operators.Components

/** Connected components must equal the classic union-find answer —
  * including transitive chains a one-round min-propagation would miss. */
class ComponentsSpec extends SparkSpec {

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference union-find with min-id representatives. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val m = math.min(ra, rb); parent(ra) = m; parent(rb) = m }
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  test("a 50-node chain collapses to one component (transitivity)") {
    val m = comps((0L until 49L).map(i => (i, i + 1)))
    assert(m.size == 50)
    assert(m.values.toSet == Set(0L), s"chain not fully collapsed: $m")
  }

  test("disjoint cliques keep distinct min-id labels") {
    val k1 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val k2 = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val m = comps(k1 ++ k2)
    assert((0L to 3L).forall(m(_) == 0L))
    assert((10L to 13L).forall(m(_) == 10L))
  }

  test("star with a high-id hub labels by the min leaf") {
    // hub 100 connects leaves 1..9 — comp must be 1, not the hub
    val m = comps((1L to 9L).map(l => (100L, l)))
    assert(m.values.toSet == Set(1L))
    assert(m.size == 10)
  }

  test("empty and self-loop-only inputs yield no components") {
    assert(comps(Seq.empty).isEmpty)
    assert(comps(Seq((5L, 5L))).isEmpty)
  }

  test("random graphs match union-find exactly") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { _ =>
      val n = 40 + rnd.nextInt(40)
      val nEdges = 10 + rnd.nextInt(50)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(comps(edges) == unionFind(edges))
    }
  }

  test("label-ladder graph (chains between bucket stars) converges " +
      "within maxIter — the round-19 shortcut-star regression") {
    // the sf1 media batch's shape in miniature: a depth-40 chain whose
    // every node is also the min of its own 20-leaf star. Min-label
    // propagation + jump alone moves the global min ~2 hops per round
    // (O(diameter)) and exited maxIter=30 UNCONVERGED on the real sf1
    // batch (diameter 57); the shortcut stars restore convergence.
    val chain = (0L until 40L).map(i => (i, i + 1))
    val leaves = for (i <- 0L until 40L; j <- 0L until 20L)
      yield (i, 1000L + 20L * i + j)
    val m = comps(chain ++ leaves)
    assert(m.values.toSet == Set(0L),
      s"ladder not fully collapsed: ${m.values.toSet.size} labels")
    assert(m.size == 41 + 800)
  }

  test("deep chain converges within the 30-round budget (jump + " +
      "shortcut stars, not O(diameter))") {
    // 3000-node path: plain min-propagation needs 3000 rounds; the
    // jump+shortcut combination must land it inside maxIter=30 with
    // every node labeled by the path min.
    val m = comps((0L until 2999L).map(i => (i, i + 1)))
    assert(m.size == 3000)
    assert(m.values.toSet == Set(0L), "deep chain not fully collapsed")
  }

  test("Lineage.truncate upgrades to reliable checkpointing when a dir is configured") {
    import spark.implicits._
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "suite precondition: no checkpoint dir configured yet")
    // no dir → localCheckpoint; rows intact either way
    val local = graft.operators.Lineage.truncate(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(local.count() == 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    sc.setCheckpointDir(dir)
    try {
      val reliable = graft.operators.Lineage.truncate(
        Seq((3L, "c"), (4L, "d")).toDF("id", "v"))
      assert(reliable.count() == 2)
      // the production contract: blocks live ON THE CHECKPOINT FS (they
      // survive executor loss), not merely in executor block managers
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else Option(f.listFiles()).toSeq.flatten.flatMap(files)
      assert(files(new java.io.File(dir)).nonEmpty,
        s"reliable checkpoint wrote nothing under $dir")
      // components still converge with reliable checkpoints in the loop
      val m = comps(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
      assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    } finally sc.setCheckpointDir(null) // Option(null) = None: restore
  }

  test("superseded iteration checkpoints delete themselves — bounded FS footprint") {
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_gc").toString
    sc.setCheckpointDir(dir)
    try {
      // a 40-node chain forces several pointer-jumping rounds — each
      // truncates; without the Chain cleanup every round would leave a
      // full labels copy on the checkpoint FS forever
      val m = comps((0L until 39L).map(i => (i, i + 1)))
      assert(m.size == 40 && m.values.toSet == Set(0L))
      def rddDirs(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles()).toSeq.flatten
          .flatMap(c => if (c.getName.startsWith("rdd-")) Seq(c)
                        else rddDirs(c))
      val left = rddDirs(new java.io.File(dir))
      // edges (unchained — read every round) + the Chain's keep=2
      assert(left.size <= 3,
        s"superseded checkpoints not cleaned: ${left.size} rdd dirs left")
    } finally sc.setCheckpointDir(null)
  }
}
