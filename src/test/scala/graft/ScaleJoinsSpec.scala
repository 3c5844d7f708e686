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
