package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: replicate the sf0.1 tables N× in-flight (ids re-keyed per
  * copy so join fan-outs stay realistic) and run the headline queries —
  * evidence that plan shapes hold an order of magnitude past the bench
  * scale without OOM or shuffle explosion.
  * `sbt "runMain graft.tools.ScaleStress [factor]"`. */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val skewOnly = args.contains("skew")
    val coreOnly = args.contains("core") // skip the slow skew case
    val factor = args.filterNot(Set("skew", "core"))
      .headOption.map(_.toInt).getOrElse(10)
    val sf = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def rep(df: DataFrame, keyCols: Seq[String], shift: Long): DataFrame = {
      val copies = spark.range(factor).select(col("id").as("_copy"))
      keyCols.foldLeft(df.crossJoin(copies)) { (d, k) =>
        d.withColumn(k, col(k) + col("_copy") * shift)
      }.drop("_copy")
    }

    val shift = 100000000L
    // materialize replicas to parquet first: timings must measure the
    // query, not the replication lineage
    val base = java.nio.file.Files.createTempDirectory("graft_stress").toString
    def mat(name: String, df: DataFrame): DataFrame = {
      df.write.mode("overwrite").parquet(s"$base/$name")
      spark.read.parquet(s"$base/$name")
    }
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    if (!skewOnly) {
    // replicas only materialize for the core cases — skew-only runs
    // would otherwise pay minutes of writes they never read
    val lineitem = mat("lineitem",
      rep(graft.Tables.lineitem(spark, sf), Seq("l_orderkey"), shift))
    val orders = mat("orders",
      rep(graft.Tables.orders(spark, sf), Seq("o_orderkey"), shift))
    // perturb cloned doc text: otherwise every clone set is mutual
    // near-dups and candidate pairs grow quadratically by construction
    val docs = mat("documents",
      rep(graft.Tables.documents(spark, sf), Seq("doc_id"), shift)
        .withColumn("text", concat(col("text"), lit(" salt"), col("doc_id"))))
    println(s"stress factor=$factor: lineitem=${lineitem.count()}, docs=${docs.count()}")
    time("q1-style agg")(
      lineitem.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), avg(col("l_extendedprice")), count(lit(1))))
    time("orders⋈lineitem agg")(
      orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")), count(lit(1))))
    time("minhash dedup")(graft.operators.Dedup.minhashLshPairs(docs))
    time("minhash cluster edges")(graft.operators.Dedup.minhashLshEdges(docs))
    time("exact dedup")(
      docs.groupBy(md5(col("text"))).agg(min(col("doc_id")), count(lit(1))))

    // connected components on an adversarial graph: 200k-node chains
    // (worst-case diameter for label propagation — pointer jumping must
    // converge in O(log n) rounds, not 200k) + dense clique noise
    val chainN = 200000L * factor / 10
    val chain = spark.range(chainN - 1)
      .select(col("id").as("id1"), (col("id") + 1).as("id2"))
    val cliques = spark.range(chainN, chainN + 10000)
      .select(col("id").as("id1"),
        (col("id") - (col("id") % 100)).as("id2")) // 100-node stars
    time(s"connected comps ${chainN / 1000}k-chain") {
      val c = graft.operators.Components
        .connectedComponents(chain.union(cliques))
      // fold to one row so noop write doesn't skip the iteration work
      c.groupBy(lit(1)).agg(countDistinct(col("comp")), count(lit(1)))
    }
    time("token-budget sharding")(
      graft.operators.Sharding.shardByTokenBudget(docs))
    // prefixLen=3: 4096 buckets so the rank windows stay many-task
    time("global shuffle")(
      graft.operators.Sharding.globalShuffle(docs, prefixLen = 3))
    // the same prefix-sum family with the hard broadcast hint DISABLED
    // (spark.graft.broadcastBases=off): AQE picks the join strategy
    // from observed sizes — the no-cliff path for ≫10¹⁰-doc corpora
    // must stay flat vs the hinted legs above
    spark.conf.set("spark.graft.broadcastBases", "off")
    try {
      time("token sharding (no hint)")(
        graft.operators.Sharding.shardByTokenBudget(docs))
      time("global shuffle (no hint)")(
        graft.operators.Sharding.globalShuffle(docs, prefixLen = 3))
      time("pack binned (no hint)")(
        graft.operators.Sharding.packBinned(docs))
    } finally spark.conf.unset("spark.graft.broadcastBases")
    time("length buckets")(
      graft.operators.Sharding.lengthBuckets(docs))
    time("exact jaccard pairs")(
      graft.operators.Dedup.ngramJaccardPairs(docs))
    time("boilerplate paragraphs")(
      graft.operators.QualityRules.boilerplateParagraphs(docs))
    time("contamination screen")(
      graft.operators.QualityRules.contaminationScreen(
        docs.where(col("doc_id") % 97 =!= 0),
        docs.where(col("doc_id") % 97 === 0)))
    time("unigram logprob")(
      graft.operators.TextAnalysis.unigramLogprob(docs))
    // cross-source gram Jaccard: the clone salt keeps texts distinct
    // but sources repeat per copy, so the pair grid and the per-gram
    // source lists stay realistic as the corpus grows
    time("source overlap")(
      graft.operators.QualityRules.sourceOverlap(docs))
    time("ngram novelty")(
      graft.operators.TextAnalysis.ngramNovelty(docs))
    time("dsir weights")(
      graft.operators.Pretrain.dsirWeight(docs))
    time("bigram logprob")(
      graft.operators.Pretrain.bigramLogprob(docs))
    time("pmi bigrams")(
      graft.operators.TextAnalysis.pmiBigrams(docs))
    time("skipgram pmi")(
      graft.operators.TextAnalysis.skipgramPmi(docs))
    time("readability")(
      graft.operators.TextAnalysis.readability(docs))
    time("media signatures")(
      graft.operators.MediaIndex.signaturesOf(
        graft.operators.Multimodal.withBlobs(docs)))
    time("source divergence")(
      graft.operators.TextAnalysis.sourceDivergence(docs))
    // round 15: the stats catalog at 10× — build two legs over the
    // replicated fact, append a drop, read the advice (the whole
    // point: the advice read touches only the catalog)
    time("stats catalog cycle") {
      val cdir = s"$base/statscat"
      graft.operators.StatsCatalog.build(spark, cdir, Seq(
        graft.operators.StatsCatalog.Leg(lineitem, "lineitem", "l_suppkey"),
        graft.operators.StatsCatalog.Leg(docs, "documents", "source")))
      graft.operators.StatsCatalog.append(spark, cdir,
        lineitem.where(col("l_orderkey") % 97 === 0), "lineitem", "l_suppkey")
      graft.operators.StatsCatalog.advice(spark, cdir)
    }
    time("column profile")(
      graft.operators.Sharding.columnProfile(docs, "documents"))
    time("minhash calibration")(
      graft.operators.Dedup.minhashCalibration(docs))
    time("z-order write") {
      graft.sources.Sources.writeZOrdered(
        orders, s"$base/orders_z.parquet",
        Seq("o_custkey", "o_totalprice"), nFiles = 64)
      spark.read.parquet(s"$base/orders_z.parquet").limit(1)
    }
    }
    if (coreOnly) { spark.stop(); return }

    // planted 90%-one-key skew join + groupBy on the join key, against a
    // side too big to broadcast (the regime saltedJoin exists for: a
    // broadcast-able dim never skews, and AQE's skew split can't fire
    // when the join output must keep its hashpartitioning for the
    // downstream agg). Plain: both sides shuffle on k and one task eats
    // 90% of the fact. Salted: the hot key scatters across 32 sub-keys;
    // the mid side replicates 32× but spreads evenly.
    val skewN = 200000000L * factor / 10
    val hot = mat("skew_fact", spark.range(skewN).select(
      when(col("id") % 10 < 9, lit(1L)).otherwise(col("id")).as("k"),
      (col("id") % 1000).as("payload")))
    val mid = mat("skew_mid", spark.range(5000000).select(
      col("id").as("k"), (col("id") * 2).as("w")))
    time("skew join plain")(
      hot.join(mid, "k").groupBy("k")
        .agg(sum(col("payload") + col("w")), count(lit(1))))
    time("skew join salted x32")(
      graft.operators.ScaleJoins.saltedJoin(hot, mid, "k", nSalts = 32)
        .groupBy("k").agg(sum(col("payload") + col("w")), count(lit(1))))
    spark.stop()
  }
}
