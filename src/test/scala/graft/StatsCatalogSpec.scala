package graft

import org.apache.spark.sql.functions._

import graft.operators.{ScaleJoins, Sharding, StatsCatalog}

/** The persisted stats catalog: append ≡ rebuild (per-key subtotals
  * are the mergeable level), catalog advice == live advice on the
  * same data, advice answers WITHOUT scanning the profiled relation
  * (the round-14 per-call-fact-scan fix), staleness flips on
  * append-dominated legs, and the executed advisedJoin consults the
  * catalog with a live fallback. */
class StatsCatalogSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_statscat").toString

  private def adviceRows(dir: String) =
    StatsCatalog.advice(spark, dir)
      .select("rel", "keycol", "n_rows", "n_keys", "max_n", "est_bytes",
        "strategy", "salt_n")
      .collect().map(_.toSeq).toSeq

  test("build + appends == one rebuild over the union, key-exactly") {
    val docs = Tables.documents(spark, Sf)
    val ev = Tables.events(spark, Sf)
    // incremental: build on a third, append the rest in TWO batches —
    // the same source key appears in all three phases, so the per-key
    // merge must SUM subtotals, not overwrite them
    val inc = freshDir()
    StatsCatalog.build(spark, inc, Seq(
      StatsCatalog.Leg(docs.where(col("doc_id") % 3 === 0),
        "documents", "source"),
      StatsCatalog.Leg(ev.where(col("event_id") % 3 === 0),
        "events", "user_id")))
    StatsCatalog.append(spark, inc, docs.where(col("doc_id") % 3 === 1),
      "documents", "source")
    StatsCatalog.append(spark, inc, docs.where(col("doc_id") % 3 === 2),
      "documents", "source")
    StatsCatalog.append(spark, inc, ev.where(col("event_id") % 3 =!= 0),
      "events", "user_id")
    val full = freshDir()
    StatsCatalog.build(spark, full, Seq(
      StatsCatalog.Leg(docs, "documents", "source"),
      StatsCatalog.Leg(ev, "events", "user_id")))
    assert(adviceRows(inc) == adviceRows(full),
      "append-maintained advice must equal one-shot rebuild advice")
    // and the advice equals the LIVE advisor over the same relations
    val live = Seq(
      Sharding.joinAdvice(docs, "documents", "source"),
      Sharding.joinAdvice(ev, "events", "user_id"))
      .reduce(_.unionAll(_))
      .select("rel", "keycol", "n_rows", "n_keys", "max_n", "est_bytes",
        "strategy", "salt_n")
      .orderBy("rel", "keycol").collect().map(_.toSeq).toSeq
    assert(adviceRows(inc) == live,
      "catalog advice must equal the live single-scan advisor")
  }

  test("cataloged advice answers with the source relation GONE") {
    import spark.implicits._
    val base = freshDir()
    val pad = "x" * 200
    // planted hot fact (needs salt) + a dim too big to broadcast
    (1L to 5000L).map(i => (if (i <= 4000) 1L else i, pad))
      .toDF("k", "payload")
      .write.mode("overwrite").parquet(s"$base/fact.parquet")
    (1L to 5000L).map(i => (i, pad)).toDF("k", "name")
      .write.mode("overwrite").parquet(s"$base/dim.parquet")
    val fact = spark.read.parquet(s"$base/fact.parquet")
    val dim = spark.read.parquet(s"$base/dim.parquet")
    val cat = freshDir()
    StatsCatalog.build(spark, cat, Seq(
      StatsCatalog.Leg(fact, "fact", "k"), StatsCatalog.Leg(dim, "dim", "k")))
    // the catalog decision must equal the live one...
    val live = ScaleJoins.adviseJoin(fact, dim, "k", broadcastBytes = 1024L)
    val cataloged = ScaleJoins.adviseJoinCataloged(spark, cat,
      "fact", "dim", "k", broadcastBytes = 1024L)
    assert(cataloged.contains(live), s"$cataloged vs $live")
    assert(live._1 == "salt" && live._2 == 64L, live.toString)
    // ...and still answer after the profiled relations are DELETED —
    // the operational proof that cataloged advice never scans them
    def rmdir(p: String): Unit = {
      val d = new java.io.File(p)
      Option(d.listFiles()).foreach(_.foreach(f => f.delete()))
      d.delete()
    }
    rmdir(s"$base/fact.parquet"); rmdir(s"$base/dim.parquet")
    assert(ScaleJoins.adviseJoinCataloged(spark, cat, "fact", "dim", "k",
      broadcastBytes = 1024L).contains(("salt", 64L, 0L)))
    // constructing the cataloged advisedJoin plans WITHOUT reading
    // either side (the decision phase is catalog-only; the join plan
    // itself carries no aggregate — scans happen only on execution)
    val planned = ScaleJoins.advisedJoin(fact, dim, "k",
      broadcastBytes = 1024L, statsDir = cat, factRel = "fact",
      dimRel = "dim")
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    assert(planned.queryExecution.optimizedPlan
      .collect { case a: Aggregate => a }.isEmpty,
      "cataloged advisedJoin must plan a pure join, no stats aggregate")
  }

  test("uncataloged legs fall back to live stats") {
    import spark.implicits._
    val fact = (1L to 100L).map(i => (i % 10, "p")).toDF("k", "v")
    val dim = (0L to 9L).map(i => (i, "d")).toDF("k", "name")
    val cat = freshDir()
    StatsCatalog.build(spark, cat, Seq(StatsCatalog.Leg(fact, "fact", "k")))
    // dim leg missing → None → advisedJoin falls back to live advice
    assert(ScaleJoins.adviseJoinCataloged(spark, cat, "fact", "dim", "k")
      .isEmpty)
    val viaFallback = ScaleJoins.advisedJoin(fact, dim, "k",
      statsDir = cat, factRel = "fact", dimRel = "dim")
      .agg(count(lit(1))).collect()(0).getLong(0)
    assert(viaFallback == fact.join(dim, Seq("k")).count())
    // a statsDir with NO catalog at all behaves the same
    assert(ScaleJoins.adviseJoinCataloged(spark, freshDir(),
      "fact", "dim", "k").isEmpty)
  }

  test("staleness flips when appends dominate the build") {
    val docs = Tables.documents(spark, Sf)
    val cat = freshDir()
    StatsCatalog.build(spark, cat, Seq(
      StatsCatalog.Leg(docs.where(col("doc_id") % 10 === 0),
        "documents", "source")))
    def staleOf(): (Double, Boolean) = {
      val r = StatsCatalog.staleness(spark, cat).collect()(0)
      (r.getAs[Double]("appended_frac"), r.getAs[Boolean]("stale"))
    }
    val (f0, s0) = staleOf()
    assert(f0 == 0.0 && !s0, s"fresh build must not be stale: $f0")
    // append 9× the build volume → appended fraction ≈ 0.9 > 0.5
    StatsCatalog.append(spark, cat, docs.where(col("doc_id") % 10 =!= 0),
      "documents", "source")
    val (f1, s1) = staleOf()
    assert(f1 > 0.5 && s1, s"append-dominated leg must flip stale: $f1")
    // a rebuild re-baselines
    StatsCatalog.build(spark, cat, Seq(
      StatsCatalog.Leg(docs, "documents", "source")))
    val (f2, s2) = staleOf()
    assert(f2 == 0.0 && !s2)
  }

  test("cataloged layout advice is row-identical to the live layoutPlan") {
    val cat = freshDir()
    // one leg per relation suffices: per-key byte subtotals sum to the
    // whole relation's bytes regardless of which key partitions them
    StatsCatalog.build(spark, cat, Seq(
      StatsCatalog.Leg(Tables.lineitem(spark, Sf), "lineitem", "l_suppkey"),
      StatsCatalog.Leg(Tables.orders(spark, Sf), "orders", "o_custkey"),
      StatsCatalog.Leg(Tables.events(spark, Sf), "events", "user_id"),
      StatsCatalog.Leg(Tables.documents(spark, Sf), "documents", "source")))
    val viaCatalog = StatsCatalog.layoutAdvice(spark, cat)
      .collect().map(_.toSeq).toSeq
    val live = Sharding.layoutPlan(spark, Sf)
      .collect().map(_.toSeq).toSeq
    assert(viaCatalog == live,
      "catalog layout advice must equal the live one-scan layoutPlan")
    // a second leg of the same relation under a DIFFERENT key agrees
    // (per-key subtotals sum to the same relation totals) — the
    // per-relation reduce is stable under extra legs
    StatsCatalog.append(spark, cat, Tables.lineitem(spark, Sf),
      "lineitem", "l_partkey")
    assert(StatsCatalog.layoutAdvice(spark, cat)
      .collect().map(_.toSeq).toSeq == live)
  }

  test("merge law holds under every mod-m residue split, m in 2..5") {
    val docs = Tables.documents(spark, Sf).cache()
    try {
      // any residue partition of the rows must reduce to the
      // full-table advice — the per-key-subtotal merge law, beyond
      // the gate's fixed mod-3 split (and at m batches, not just 2)
      val full = freshDir()
      StatsCatalog.build(spark, full,
        Seq(StatsCatalog.Leg(docs, "documents", "source")))
      val expect = adviceRows(full)
      for (m <- 2 to 5) {
        val inc = freshDir()
        StatsCatalog.build(spark, inc, Seq(StatsCatalog.Leg(
          docs.where(col("doc_id") % m === 0), "documents", "source")))
        (1 until m).foreach { r =>
          StatsCatalog.append(spark, inc,
            docs.where(col("doc_id") % m === r), "documents", "source")
        }
        assert(adviceRows(inc) == expect, s"merge law broke at m=$m")
      }
    } finally docs.unpersist()
  }

  test("retract merge law: build + append - retract == rebuild over the survivors") {
    val docs = Tables.documents(spark, Sf)
    val retracted = col("doc_id") % 3 =!= 0 && col("doc_id") % 5 === 0
    val inc = freshDir()
    StatsCatalog.build(spark, inc, Seq(StatsCatalog.Leg(
      docs.where(col("doc_id") % 3 === 0), "documents", "source")))
    StatsCatalog.append(spark, inc, docs.where(col("doc_id") % 3 =!= 0),
      "documents", "source")
    StatsCatalog.retract(spark, inc, docs.where(retracted),
      "documents", "source")
    val full = freshDir()
    StatsCatalog.build(spark, full, Seq(StatsCatalog.Leg(
      docs.where(!retracted), "documents", "source")))
    assert(adviceRows(inc) == adviceRows(full),
      "retraction-corrected advice must equal a rebuild over survivors")
  }

  test("retraction counts as drift; a fully retracted key vanishes") {
    import spark.implicits._
    val base = ((1 to 60).map(i => ("a", i)) ++ (1 to 40).map(i => ("b", i)))
      .toDF("k", "v")
    val drop = (1 to 50).map(i => ("c", i)).toDF("k", "v")
    val cat = freshDir()
    StatsCatalog.build(spark, cat, Seq(StatsCatalog.Leg(base, "t", "k")))
    StatsCatalog.append(spark, cat, drop, "t", "k")
    // take down HALF the drop: net rows barely move, but the leg's
    // distribution was rewritten under it — drift must count BOTH
    // directions while appended_frac alone stays under the bar
    StatsCatalog.retract(spark, cat, drop.where(col("v") <= 25), "t", "k")
    val r = StatsCatalog.staleness(spark, cat).collect()(0)
    assert(r.getAs[Long]("n_rows") == 125L)
    assert(r.getAs[Long]("appended_rows") == 50L)
    assert(r.getAs[Long]("retracted_rows") == 25L)
    assert(r.getAs[Double]("appended_frac") == 0.4)
    assert(r.getAs[Double]("drift_frac") == 0.6)
    assert(r.getAs[Boolean]("stale"),
      "a retract-heavy leg must flip stale even when appends alone wouldn't")
    // retract the remainder: key c's net count hits zero and it drops
    // from the catalog view entirely, as a rebuild over the survivors
    // would drop it (its churn leaves the drift base WITH it)
    StatsCatalog.retract(spark, cat, drop.where(col("v") > 25), "t", "k")
    val red = StatsCatalog.reducedStats(spark, cat).collect()(0)
    assert(red.getAs[Long]("n_keys") == 2L)
    assert(red.getAs[Long]("n_rows") == 100L)
    assert(red.getAs[Long]("max_n") == 60L)
    // and the corrected catalog equals a rebuild on the survivors
    val full = freshDir()
    StatsCatalog.build(spark, full, Seq(StatsCatalog.Leg(base, "t", "k")))
    assert(adviceRows(cat) == adviceRows(full))
  }

  test("key span (key_min/key_max) merges across phases; full retraction shrinks it") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (i, "p")).toDF("k", "v")
    val cat = freshDir()
    StatsCatalog.build(spark, cat, Seq(StatsCatalog.Leg(
      rows.where(col("k") <= 50), "t", "k")))
    StatsCatalog.append(spark, cat, rows.where(col("k") > 50), "t", "k")
    def span(): (Double, Double, Long) = {
      val r = StatsCatalog.reducedStats(spark, cat).collect()(0)
      (r.getAs[Double]("key_min"), r.getAs[Double]("key_max"),
        r.getAs[Long]("n_keys"))
    }
    assert(span() == ((1.0, 100.0, 100L)),
      "span must merge across build and append batches")
    // retracting every row of the top keys drops them from the view,
    // and the span SHRINKS with them — tighter than a classical
    // zone map, which can only ever widen
    StatsCatalog.retract(spark, cat, rows.where(col("k") > 75), "t", "k")
    assert(span() == ((1.0, 75.0, 75L)))
  }

  test("keyAs catalogs a dim under the fact's key name — no pre-rename needed") {
    import spark.implicits._
    val pad = "x" * 200
    val fact = (1L to 5000L).map(i => (i % 100, pad)).toDF("jk", "payload")
    val dim = (0L to 99L).map(i => (i, pad)).toDF("dk", "name")
    // native-name build misses the lookup (the round-15 documented
    // aliasing gap): the advisor falls back to live stats
    val miss = freshDir()
    StatsCatalog.build(spark, miss, Seq(
      StatsCatalog.Leg(fact, "fact", "jk"),
      StatsCatalog.Leg(dim, "dim", "dk")))
    assert(ScaleJoins.adviseJoinCataloged(spark, miss, "fact", "dim", "jk",
      broadcastBytes = 1024L).isEmpty)
    // keyAs catalogs the SAME dim under the join-time name
    val hit = freshDir()
    StatsCatalog.build(spark, hit, Seq(
      StatsCatalog.Leg(fact, "fact", "jk"),
      StatsCatalog.Leg(dim, "dim", "dk", keyAs = "jk")))
    val viaAlias = ScaleJoins.adviseJoinCataloged(spark, hit,
      "fact", "dim", "jk", broadcastBytes = 1024L)
    assert(viaAlias.isDefined)
    // ...and answers exactly what a pre-renamed build would
    val renamed = freshDir()
    StatsCatalog.build(spark, renamed, Seq(
      StatsCatalog.Leg(fact, "fact", "jk"),
      StatsCatalog.Leg(dim.select(col("dk").as("jk"), col("name")),
        "dim", "jk")))
    assert(viaAlias == ScaleJoins.adviseJoinCataloged(spark, renamed,
      "fact", "dim", "jk", broadcastBytes = 1024L))
  }

  test("compact persists a version-stamped reduced snapshot; writes retire it") {
    val docs = Tables.documents(spark, Sf)
    val cat = freshDir()
    StatsCatalog.build(spark, cat, Seq(StatsCatalog.Leg(
      docs.where(col("doc_id") % 3 === 0), "documents", "source")))
    (1 until 3).foreach { r =>
      StatsCatalog.append(spark, cat, docs.where(col("doc_id") % 3 === r),
        "documents", "source")
    }
    val pre = adviceRows(cat)
    val staleBefore = StatsCatalog.staleness(spark, cat)
      .collect().map(_.toSeq).toSeq
    StatsCatalog.compact(spark, cat)
    assert(adviceRows(cat) == pre,
      "snapshot-served advice must equal the live reduce")
    // OBSERVABLE: the snapshot really serves — delete every per-key
    // stats file and the read verbs still answer (a live reduce would
    // throw on the missing manifest-listed files)
    val statsDir = new java.io.File(s"$cat/stats")
    statsDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.delete()))
    assert(adviceRows(cat) == pre)
    assert(StatsCatalog.staleness(spark, cat)
      .collect().map(_.toSeq).toSeq == staleBefore)
    assert(StatsCatalog.layoutAdvice(spark, cat).collect().nonEmpty)
    // retirement: on a parallel catalog, a post-compact append bumps
    // the version — the stale snapshot is ignored and the live reduce
    // (now including the new batch) answers, equal to a full rebuild
    val cat2 = freshDir()
    StatsCatalog.build(spark, cat2, Seq(StatsCatalog.Leg(
      docs.where(col("doc_id") % 2 === 0), "documents", "source")))
    StatsCatalog.append(spark, cat2, docs.where(col("doc_id") % 4 === 1),
      "documents", "source")
    StatsCatalog.compact(spark, cat2)
    StatsCatalog.append(spark, cat2, docs.where(col("doc_id") % 4 === 3),
      "documents", "source")
    val full = freshDir()
    StatsCatalog.build(spark, full,
      Seq(StatsCatalog.Leg(docs, "documents", "source")))
    assert(adviceRows(cat2) == adviceRows(full),
      "a post-compact write must retire the snapshot, not be masked by it")
  }

  test("two racing appends both land (writer lock + conditional commit)") {
    val docs = Tables.documents(spark, Sf)
    val cat = freshDir()
    StatsCatalog.build(spark, cat, Seq(
      StatsCatalog.Leg(docs.where(col("doc_id") % 3 === 0),
        "documents", "source")))
    // the ingest-batch verb from two writers at once — the writer
    // lock serializes the physical-listing diff and the conditional
    // commit serializes the manifest; neither batch may vanish
    val batches = Seq(1, 2).map(r => docs.where(col("doc_id") % 3 === r))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(batches.map(b => Future {
      StatsCatalog.append(spark, cat, b, "documents", "source")
    })), 120.seconds)
    val full = freshDir()
    StatsCatalog.build(spark, full,
      Seq(StatsCatalog.Leg(docs, "documents", "source")))
    assert(adviceRows(cat) == adviceRows(full),
      "a racing append must not be lost or double-committed")
  }

  test("compact collapses append litter; advice, layout and staleness unchanged") {
    val docs = Tables.documents(spark, Sf)
    val cat = freshDir()
    // mod 3: coprime with the corpus' source count, so every batch
    // re-mentions every source and the per-key duplication is real
    StatsCatalog.build(spark, cat, Seq(
      StatsCatalog.Leg(docs.where(col("doc_id") % 3 === 0),
        "documents", "source")))
    (1 until 3).foreach { r =>
      StatsCatalog.append(spark, cat, docs.where(col("doc_id") % 3 === r),
        "documents", "source")
    }
    val adviceBefore = adviceRows(cat)
    val layoutBefore = StatsCatalog.layoutAdvice(spark, cat)
      .collect().map(_.toSeq).toSeq
    val staleBefore = StatsCatalog.staleness(spark, cat)
      .collect().map(_.toSeq).toSeq
    val rowsBefore = StatsCatalog.liveStats(spark, cat).count()
    val (before, after) = StatsCatalog.compact(spark, cat)
    assert(after < before,
      s"compact must shrink the live file set: $before -> $after")
    // hot keys' subtotal rows collapse to one per (key, phase-pair)
    val rowsAfter = StatsCatalog.liveStats(spark, cat).count()
    assert(rowsAfter < rowsBefore,
      s"duplicate per-key rows must merge: $rowsBefore -> $rowsAfter")
    assert(adviceRows(cat) == adviceBefore, "advice must be unchanged")
    assert(StatsCatalog.layoutAdvice(spark, cat)
      .collect().map(_.toSeq).toSeq == layoutBefore)
    assert(StatsCatalog.staleness(spark, cat)
      .collect().map(_.toSeq).toSeq == staleBefore,
      "phases must survive compaction (staleness keeps its meaning)")
    // replaced litter sweeps; further appends still land
    assert(StatsCatalog.vacuum(spark, cat) > 0L)
    StatsCatalog.append(spark, cat, docs.limit(0), "documents", "source")
    assert(adviceRows(cat) == adviceBefore)
  }

  test("gate entry merges phases to the full-table advice") {
    val out = StatsCatalog.pipelineStatsCatalog(spark, Sf)
      .select("rel", "keycol", "n_rows", "n_keys", "max_n", "est_bytes",
        "strategy", "salt_n")
      .collect().map(_.toSeq).toSeq
    val live = Sharding.pipelineJoinAdvisor(spark, Sf)
      .select("rel", "keycol", "n_rows", "n_keys", "max_n", "est_bytes",
        "strategy", "salt_n")
      .collect().map(_.toSeq).toSeq
    assert(out == live,
      "split-built catalog must reduce to the full-table advisor rows")
  }
}
