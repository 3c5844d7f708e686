package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleJoins

/** Salted joins must agree with plain joins; bucketed tables must join
  * without a shuffle on the join key. */
class ScaleJoinsSpec extends SparkSpec {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // one pathologically hot key (90% of rows) + a long tail
    val skewed = (1 to 2000).map(i => (if (i <= 1800) 1L else i.toLong, i))
      .toDF("k", "payload")
    val dim = (1 to 2000).map(i => (i.toLong, s"name$i")).toDF("k", "name")
    val plain = skewed.join(dim, "k").agg(count(lit(1)), sum("payload"))
      .collect()(0)
    val salted = ScaleJoins.saltedJoin(skewed, dim, "k", nSalts = 8)
      .agg(count(lit(1)), sum("payload")).collect()(0)
    assert(salted == plain)
  }

  test("advised join picks the expected branch and every branch equals the plain join") {
    import spark.implicits._
    val pad = "x" * 100
    // hot fact (91% one key) + a dim too big to broadcast at the test bound
    val fact = (1L to 10000L).map(i =>
      (if (i <= 9100) 1L else i, pad)).toDF("k", "payload")
    val dim = (1L to 10000L).map(i => (i, pad)).toDF("k", "name")
    val plain = fact.join(dim, "k")
      .agg(count(lit(1)), count(col("name"))).collect()(0)

    // tiny bound → dim can't broadcast, hot fact → salt, with the
    // advisor's own N
    assert(ScaleJoins.adviseFor(fact, dim, "k", broadcastBytes = 1024L)
      == ("salt", 64L))
    val salted = ScaleJoins.advisedJoin(fact, dim, "k", broadcastBytes = 1024L)
      .agg(count(lit(1)), count(col("name"))).collect()(0)
    assert(salted == plain)

    // uniform fact at the same bound → plain
    val flat = (1L to 10000L).map(i => (i % 1000, pad)).toDF("k", "payload")
    assert(ScaleJoins.adviseFor(flat, dim, "k", broadcastBytes = 1024L)
      == ("plain", 0L))
    val viaPlain = ScaleJoins.advisedJoin(flat, dim, "k", broadcastBytes = 1024L)
      .agg(count(lit(1)), count(col("name"))).collect()(0)
    assert(viaPlain == flat.join(dim, "k")
      .agg(count(lit(1)), count(col("name"))).collect()(0))

    // default 10 MiB bound → the dim fits a build side: broadcast wins
    // even over the hot fact (nothing shuffles, skew is irrelevant)
    assert(ScaleJoins.adviseFor(fact, dim, "k") == ("broadcast", 0L))
    val bcast = ScaleJoins.advisedJoin(fact, dim, "k")
    assert(bcast.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(bcast.agg(count(lit(1)), count(col("name"))).collect()(0) == plain)
  }

  test("advised bucket branch: two big sides on a reused key, row-identical to plain") {
    import spark.implicits._
    val pad = "x" * 200
    // both sides past the bound, fact NOT skewed, key declared reused
    val fact = (1L to 8000L).map(i => (i % 400, pad)).toDF("k", "payload")
    val dim = (1L to 8000L).map(i => (i % 400, pad)).toDF("k", "name")
    val advice = ScaleJoins.adviseJoin(fact, dim, "k",
      broadcastBytes = 1024L, keyReused = true, targetBytes = 1L << 20)
    assert(advice._1 == "bucket" && advice._3 >= 1L, advice.toString)
    // without the reuse declaration the same stats stay plain — the
    // layout write only pays off across repeated joins
    assert(ScaleJoins.adviseJoin(fact, dim, "k",
      broadcastBytes = 1024L)._1 == "plain")
    val plain = fact.join(dim, Seq("k"))
      .agg(count(lit(1)), count(col("name"))).collect()(0)
    val bucketed = ScaleJoins.advisedJoin(fact, dim, "k",
      broadcastBytes = 1024L, keyReused = true, targetBytes = 1L << 20)
    assert(bucketed.agg(count(lit(1)), count(col("name"))).collect()(0)
      == plain, "bucket branch must be row-identical to the plain join")
    // co-located: the join itself re-shuffles neither side on the key
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(k#"),
      s"bucketed advised join still shuffles on the key:\n$plan")
  }

  test("driver pow2 ceil mirrors the declarative pow2Ceil bit-for-bit") {
    import spark.implicits._
    // the executed path (bucketN/saltN on collected stats) and the
    // declarative advisors share the factor-of-two discipline; pin the
    // two implementations against each other across the range shapes
    // that matter (powers, power±1, 1, large)
    val xs = Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L, 63L, 64L, 65L,
      1023L, 1024L, 1025L, (1L << 40) - 1, 1L << 40)
    val viaSql = xs.toDF("x")
      .select(graft.operators.Sharding.pow2Ceil(col("x")).as("p"))
      .collect().map(_.getLong(0)).toSeq
    val viaDriver = xs.map { x =>
      val h = java.lang.Long.highestOneBit(x)
      if (h == x) x else h << 1
    }
    assert(viaSql == viaDriver, s"$viaSql vs $viaDriver")
  }

  test("salted left join preserves unmatched skewed rows") {
    import spark.implicits._
    val skewed = Seq((1L, "a"), (1L, "b"), (99L, "c")).toDF("k", "v")
    val dim = Seq((1L, "x")).toDF("k", "name")
    val df = ScaleJoins.saltedJoin(skewed, dim, "k", 4, "left")
    assert(df.columns.toSeq == Seq("k", "v", "name"))
    val out = df.orderBy("v").collect()
    assert(out.length == 3)
    assert(out.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    assert(out(2).isNullAt(2)) // unmatched key 99 keeps a null dim side
  }

  test("bucketed tables join with no shuffle on the join key") {
    val orders = Tables.orders(spark, Sf)
    val lineitem = Tables.lineitem(spark, Sf)
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the join itself must not re-shuffle either side
    val joinSection = plan.substring(0, plan.length)
    assert(!"Exchange hashpartitioning\\((o_orderkey|l_orderkey)".r
      .findFirstIn(joinSection).isDefined,
      s"bucketed join still shuffles on the join key:\n$plan")
    assert(joined.count() > 0)
  }

  test("executed layout advice: catalog -> layoutAdvice -> applyLayout -> shuffle-free bucket join") {
    import spark.implicits._
    import graft.operators.StatsCatalog
    import graft.sources.Sources
    val pad = "x" * 200
    // equal-size sides so each table's own layout row advises the SAME
    // power-of-two bucket count — the co-location precondition
    val fact = (1L to 8000L).map(i => (i % 400, pad)).toDF("k", "payload")
    val dim = (1L to 8000L).map(i => (i % 400, pad)).toDF("k", "name")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_layout_exec").toString
    StatsCatalog.build(spark, dir, Seq(
      StatsCatalog.Leg(fact, "fact", "k"), StatsCatalog.Leg(dim, "dim", "k")))
    val lay = StatsCatalog.layoutAdvice(spark, dir)
      .collect().map(r => r.getAs[String]("table_name") -> r).toMap
    assert(lay.keySet == Set("fact", "dim"))
    assert(lay("fact").getAs[Long]("bucket_count")
      == lay("dim").getAs[Long]("bucket_count"))
    // the pair advisor's executed bucket_n agrees with the layout rows
    // (the one shared targetBytes constant — round-15 advice)
    val advice = ScaleJoins.adviseJoinCataloged(spark, dir, "fact", "dim",
      "k", broadcastBytes = 1024L, keyReused = true,
      targetBytes = 1L << 20).get
    assert(advice._1 == "bucket", advice.toString)
    assert(advice._3 == lay("fact").getAs[Long]("bucket_count"),
      s"advised bucket_n ${advice._3} != layout row ${lay("fact")}")
    // EXECUTE the advice rows on disk, then join the written layouts
    val fb = Sources.applyLayout(fact, lay("fact"), key = "k",
      name = "graft_spec_layout_fact")
    val db = Sources.applyLayout(dim, lay("dim"), key = "k",
      name = "graft_spec_layout_dim")
    val joined = fb.join(db, Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), count(col("name")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!"Exchange hashpartitioning\\(k#".r.findFirstIn(plan).isDefined,
      s"advised layout join still shuffles on the key:\n$plan")
    val plain = fact.join(dim, Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), count(col("name")))
    assert(joined.orderBy("k").collect().toSeq
      == plain.orderBy("k").collect().toSeq,
      "layout-applied join must be row-identical to the plain join")
    // file layout half: target_files parquet files land on disk
    val outPath = java.nio.file.Files
      .createTempDirectory("graft_layout_files").toString + "/fact"
    val flat = Sources.applyLayout(fact.select("k"),
      lay("fact"), path = outPath)
    assert(flat.count() == 8000L)
    assert(flat.inputFiles.length
      == lay("fact").getAs[Long]("target_files").toInt)
  }

  test("advisedJoin consults the CATALOG, not live stats, and decides without scanning") {
    import spark.implicits._
    import graft.operators.StatsCatalog
    val pad = "x" * 100
    // catalog built from a pathologically skewed snapshot...
    val skewed = (1L to 10000L).map(i =>
      (if (i <= 9100) 1L else i, pad)).toDF("k", "payload")
    val dim = (1L to 10000L).map(i => (i, pad)).toDF("k", "name")
    val src = java.nio.file.Files
      .createTempDirectory("graft_catjoin_src").toString
    skewed.write.mode("overwrite").parquet(src)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_catjoin_cat").toString
    StatsCatalog.build(spark, dir, Seq(
      StatsCatalog.Leg(spark.read.parquet(src), "fact", "k"),
      StatsCatalog.Leg(dim, "dim", "k")))
    val live = ScaleJoins.adviseJoin(skewed, dim, "k",
      broadcastBytes = 1024L)
    // ...answers AFTER the profiled source is deleted: the decision
    // provably never scans the relation (the round-15 verdict pin)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(src)).iterator()
      .asScala.toSeq.reverse.foreach(p => java.nio.file.Files.delete(p))
    val cataloged = ScaleJoins.adviseJoinCataloged(spark, dir,
      "fact", "dim", "k", broadcastBytes = 1024L).get
    assert(cataloged == live, s"cataloged $cataloged != live $live")
    assert(cataloged._1 == "salt")
    // the catalog is AUTHORITATIVE in the executed join: run advisedJoin
    // with a UNIFORM live fact under the cataloged (skewed) rel names —
    // live stats would say plain; the cataloged decision salts, which
    // is visible as the salt scatter in the executed plan
    val uniform = (1L to 10000L).map(i => (i % 1000, pad))
      .toDF("k", "payload")
    val viaCatalog = ScaleJoins.advisedJoin(uniform, dim, "k",
      broadcastBytes = 1024L, statsDir = dir,
      factRel = "fact", dimRel = "dim")
    assert(viaCatalog.queryExecution.optimizedPlan.toString
      .contains("_salt"),
      "executed join ignored the cataloged salt decision")
    assert(viaCatalog.agg(count(lit(1)), count(col("name"))).collect()(0)
      == uniform.join(dim, Seq("k"))
        .agg(count(lit(1)), count(col("name"))).collect()(0))
  }

  test("advised cluster branch: range-declared key lands a file-skipping layout, row-identical") {
    import spark.implicits._
    import graft.operators.StatsCatalog
    val pad = "x" * 200
    // numeric key spread over a wide span; both sides past the bound
    val fact = (1L to 8000L).map(i => (i % 2000, pad)).toDF("k", "payload")
    val dim = (0L to 1999L).map(i => (i, pad)).toDF("k", "name")
    // the declaration gates the branch: same stats, no declaration ->
    // the hot-key path (this fact is uniform -> plain)
    assert(ScaleJoins.adviseJoin(fact, dim, "k",
      broadcastBytes = 1024L)._1 == "plain")
    val advice = ScaleJoins.adviseJoin(fact, dim, "k",
      broadcastBytes = 1024L, targetBytes = 1L << 20, rangeQueried = true)
    assert(advice._1 == "cluster" && advice._3 >= 1L, advice.toString)
    // the cataloged decision agrees (span read from the persisted rows)
    val cat = java.nio.file.Files
      .createTempDirectory("graft_cluster_cat").toString
    StatsCatalog.build(spark, cat, Seq(
      StatsCatalog.Leg(fact, "fact", "k"), StatsCatalog.Leg(dim, "dim", "k")))
    assert(ScaleJoins.adviseJoinCataloged(spark, cat, "fact", "dim", "k",
      broadcastBytes = 1024L, targetBytes = 1L << 20,
      rangeQueried = true).contains(advice))
    // a NON-numeric key has no zone-map span: the catalog stores a
    // null span and the branch falls through
    val sfact = (1L to 8000L).map(i => (s"k${i % 2000}", pad))
      .toDF("k", "payload")
    StatsCatalog.append(spark, cat, sfact, "sfact", "k")
    StatsCatalog.append(spark, cat, dim.select(col("k").cast("string")
      .as("k"), col("name")), "sdim", "k")
    assert(ScaleJoins.adviseJoinCataloged(spark, cat, "sfact", "sdim", "k",
      broadcastBytes = 1024L, rangeQueried = true).get._1 != "cluster")
    // EXECUTED: row-identical to the plain join, and the written
    // layout's range scan prunes files via parquet min/max stats
    val layout = java.nio.file.Files
      .createTempDirectory("graft_cluster_lay").toString + "/fact"
    val joined = ScaleJoins.clusteredJoin(fact, dim, "k",
      nFiles = 8, layoutPath = layout)
    val plain = fact.join(dim, Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)), count(col("name")))
    assert(joined.groupBy(col("k")).agg(count(lit(1)), count(col("name")))
      .orderBy("k").collect().toSeq
      == plain.orderBy("k").collect().toSeq)
    val scan = spark.read.parquet(layout).where(col("k").between(0, 100))
    scan.collect()
    val scanned = scan.queryExecution.executedPlan.collectLeaves()
      .head.metrics("numOutputRows").value
    assert(scanned < 8000 / 4,
      s"advised cluster layout not skipping: scanned $scanned of 8000")
    // advisedJoin executes the branch end-to-end
    assert(ScaleJoins.advisedJoin(fact, dim, "k", broadcastBytes = 1024L,
      targetBytes = 1L << 20, rangeQueried = true)
      .groupBy(col("k")).agg(count(lit(1)), count(col("name")))
      .orderBy("k").collect().toSeq == plain.orderBy("k").collect().toSeq)
  }

  test("bucketedJoin table names are unique per call: an earlier frame survives a later call") {
    import spark.implicits._
    val fact1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val dim1 = Seq((1L, "x"), (2L, "y")).toDF("k", "name")
    val j1 = ScaleJoins.bucketedJoin(fact1, dim1, "k", 2)
    assert(j1.count() == 2)
    // a second call on the SAME key with different data must not
    // repoint j1 (round-15 advice: fixed key-derived names did)
    val fact2 = Seq((9L, "z")).toDF("k", "v")
    val dim2 = Seq((9L, "w")).toDF("k", "name")
    val j2 = ScaleJoins.bucketedJoin(fact2, dim2, "k", 2)
    assert(j2.collect().map(_.getLong(0)).toSeq == Seq(9L))
    assert(j1.orderBy("k").collect().map(_.getString(1)).toSeq
      == Seq("a", "b"), "earlier bucketedJoin frame was repointed")
  }

  test("layout lifecycle: layouts() enumerates persisted bucketed tables, dropLayout retires catalog + bytes") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("k", "name")
    val before = ScaleJoins.layouts(spark)
      .where(col("layout") === "lifecycle17").count()
    assert(before == 0L)
    assert(ScaleJoins.bucketedJoin(fact, dim, "k", 2,
      layoutName = "lifecycle17").count() == 2)
    val listed = ScaleJoins.layouts(spark)
      .where(col("layout") === "lifecycle17").collect()
    assert(listed.length == 2, s"fact + dim tables expected: ${listed.toSeq}")
    assert(listed.map(_.getAs[String]("table_name")).sorted.toSeq ==
      Seq("graft_bucketed_dim_lifecycle17", "graft_bucketed_fact_lifecycle17"))
    assert(listed.forall(r => r.getAs[Long]("bytes") > 0L &&
      r.getAs[Long]("files") > 0L && r.getAs[Long]("modified_ms") > 0L),
      s"layout rows must carry real at-rest bytes: ${listed.toSeq}")
    // retirement drops BOTH tables and their warehouse bytes
    assert(ScaleJoins.dropLayout(spark, "lifecycle17") == 2)
    assert(ScaleJoins.layouts(spark)
      .where(col("layout") === "lifecycle17").count() == 0L)
    assert(!spark.catalog.tableExists("graft_bucketed_fact_lifecycle17"))
    // a typo'd / already-retired tag is visible (0), not fatal
    assert(ScaleJoins.dropLayout(spark, "lifecycle17") == 0)
    // the REPL lifecycle verbs ride the same surface
    assert(ScaleJoins.bucketedJoin(fact, dim, "k", 2,
      layoutName = "lifecycle17b").count() == 2)
    assert(Repl.eval(spark, "stats layout list", ".")
      .contains("lifecycle17b"))
    assert(Repl.eval(spark, "stats layout drop name=lifecycle17b", ".")
      .contains("dropped 2"))
    assert(!Repl.eval(spark, "stats layout list", ".")
      .contains("lifecycle17b"))
  }

  test("bloom-reduced anti join is row-identical to the plain anti join") {
    import spark.implicits._
    // batch keys: some in the corpus (dups), some genuinely new
    val batch = (1 to 500).map(i => (s"k$i", i)).toDF("h", "payload")
    val corpus = (250 to 10000).map(i => s"k$i").toDF("h")
    val plain = batch.join(corpus, Seq("h"), "left_anti")
      .orderBy("payload").collect().toSeq
    val bloomed = ScaleJoins
      .bloomReducedAntiJoin(batch, corpus, "h", expectedItems = 1000)
      .orderBy("payload").collect().toSeq
    assert(bloomed == plain)
    assert(plain.length == 249) // k1..k249 are the genuinely-new keys
    // empty batch: Spark's bloomFilter aggregate yields a null buffer
    // over zero rows — the reduction must short-circuit, not NPE
    val empty = Seq.empty[(String, Int)].toDF("h", "payload")
    assert(ScaleJoins.bloomReducedAntiJoin(empty, corpus, "h", 10)
      .collect().isEmpty)
    assert(ScaleJoins.bloomReducedSemiJoin(empty, corpus, Seq("h"), 10)
      .collect().isEmpty)
  }

  test("bloom reduction prunes the big side before the anti join") {
    import spark.implicits._
    val batch = (1 to 100).map(i => s"b$i").toDF("h")
    val corpus = (1 to 50000).map(i => s"c$i").toDF("h") // zero overlap
    val df = ScaleJoins.bloomReducedAntiJoin(batch, corpus, "h", 200, 0.01)
    assert(df.count() == 100) // nothing eliminated
    // with ~1% fpp over 50k disjoint keys, the filter passes only a few
    // hundred corpus rows into the join — the reduction is real, not
    // just plan-shape cosmetics
    val bf = batch.stat.bloomFilter("h", 200, 0.01)
    val survivors = corpus.collect().count(r => bf.mightContainString(r.getString(0)))
    assert(survivors < 2500, s"bloom passed $survivors of 50000 corpus rows")
  }
}
