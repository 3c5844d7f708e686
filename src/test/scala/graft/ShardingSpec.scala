package graft

import org.apache.spark.sql.functions._
import graft.operators.Sharding

/** Shard packing must produce contiguous, budget-bounded shards;
  * stratified sampling must hit its per-stratum fractions. */
class ShardingSpec extends SparkSpec {

  test("every shard stays within budget plus one straddling doc") {
    val shards = Sharding.shardByTokenBudget(Tables.documents(spark, Sf))
    val maxDoc = shards.agg(max(col("n_tokens"))).collect()(0).getLong(0)
    val perShard = shards.groupBy(col("lang"), col("shard"))
      .agg(sum(col("n_tokens")).as("total")).collect()
    perShard.foreach { r =>
      assert(r.getLong(2) <= Sharding.TokenBudget + maxDoc,
        s"shard ${r.get(0)}/${r.get(1)} overflows: ${r.getLong(2)}")
    }
    // shards fill in doc_id order: within a (lang, shard) the doc ids
    // are a contiguous run of that language's docs
    val rows = shards.collect().map(r =>
      (r.getString(1), r.getLong(3), r.getLong(0)))
    rows.groupBy(t => (t._1, t._2)).foreach { case ((lang, _), gs) =>
      val ids = gs.map(_._3).sorted
      val langIds = rows.filter(_._1 == lang).map(_._3)
        .filter(i => i >= ids.head && i <= ids.last).sorted
      assert(ids.sameElements(langIds), s"non-contiguous shard in $lang")
    }
  }

  test("bucketed prefix sum equals the sequential prefix sum across strata") {
    val docs = Tables.documents(spark, Sf)
    // one bucket per language = the plain sequential window
    val seq = Sharding.shardByTokenBudget(docs, bucketWidth = Long.MaxValue)
      .collect().toSeq
    // tiny width → many buckets per language, so >1 task per stratum
    val bucketed = Sharding.shardByTokenBudget(docs, bucketWidth = 16L)
    val nBuckets = docs.selectExpr("lang", "doc_id DIV 16 AS bkt")
      .distinct().groupBy("lang").count().collect()
    assert(nBuckets.forall(_.getLong(1) > 1L),
      "stress width must split every language into multiple buckets")
    assert(bucketed.collect().toSeq == seq,
      "distributed prefix sum must be bit-identical to the sequential one")
  }

  test("sequence packing: offsets bounded by the budget and consistent with shards") {
    val docs = Tables.documents(spark, Sf)
    val packed = Sharding.packSequences(docs).collect()
    assert(packed.length == docs.count())
    packed.foreach { r =>
      val off = r.getLong(4)
      assert(off >= 0L && off < Sharding.TokenBudget,
        s"offset $off outside [0, ${Sharding.TokenBudget}): $r")
    }
    // seq_id must equal the shard id from shardByTokenBudget — packing
    // is sharding plus the in-window offset
    val shards = Sharding.shardByTokenBudget(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    packed.foreach(r => assert(r.getLong(3) == shards(r.getLong(0))))
  }

  test("null-lang docs keep their shard assignment (no silent join drop)") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some("en"), "one two three four five"),
      (2L, None, "alpha beta gamma delta"),
      (3L, None, "more nullable language text here"),
      (4L, Some("de"), "eins zwei drei"))
      .toDF("doc_id", "lang", "text")
    val out = Sharding.shardByTokenBudget(docs, budget = 10L, bucketWidth = 2L)
      .collect()
    assert(out.length == 4, s"every doc must be sharded, got ${out.length}")
    val nullRows = out.filter(_.isNullAt(1))
    assert(nullRows.length == 2, "null-lang docs form their own stratum")
    assert(nullRows.map(_.getLong(3)).forall(_ >= 0L))
  }

  test("corpus mixture hits target token shares without upsampling") {
    val docs = Tables.documents(spark, Sf)
    val weights = Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.1)
    val mixed = Sharding.mixCorpus(docs, weights, seed = 11)
    val tokens = mixed.groupBy("lang").agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = tokens.values.sum.toDouble
    assert(total > 0)
    // the dominant constraint source is exact; others statistical
    weights.foreach { case (lang, w) =>
      val got = tokens.getOrElse(lang, 0L) / total
      assert(math.abs(got - w) < 0.1,
        s"$lang token share $got, want ~$w (tokens=$tokens)")
    }
    // never upsamples: the mixed corpus is a subset of the input
    val inIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val outIds = mixed.select("doc_id").collect().map(_.getLong(0))
    assert(outIds.length == outIds.distinct.length)
    assert(outIds.forall(inIds.contains))
    // hash-based draw: identical sample under a different partitioning
    val repart = Sharding.mixCorpus(docs.repartition(7), weights, seed = 11)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repart == outIds.toSet, "sample must not depend on partitioning")
  }

  test("stratified sample approximates its fractions and is seeded") {
    val docs = Tables.documents(spark, Sf)
    val fr = Map("en" -> 0.5, "de" -> 0.2)
    val a = Sharding.sampleStratified(docs, fr, seed = 7)
    val b = Sharding.sampleStratified(docs, fr, seed = 7)
    val aIds = a.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(aIds == b.select("doc_id").collect().map(_.getLong(0)).toSet,
      "same seed must give the same sample")
    // round 12: the draw is a hash of the data, not an RNG stream —
    // identical sample under a different partitioning (sampleBy's
    // per-partition RNG fails exactly this)
    val repart = Sharding.sampleStratified(docs.repartition(7), fr, seed = 7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repart == aIds, "sample must not depend on partitioning")
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = a.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fr.foreach { case (lang, f) =>
      val n = base.getOrElse(lang, 0L)
      if (n >= 50) { // only assert where the law of large numbers applies
        val ratio = got.getOrElse(lang, 0L).toDouble / n
        assert(math.abs(ratio - f) < 0.15, s"$lang: got $ratio want ~$f")
      }
    }
    assert(got.keySet.subsetOf(fr.keySet), "unsampled strata must drop out")
  }

  test("scd2 history: windows chain, deletes close, inserts open, one current per live key") {
    import spark.implicits._
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("doc_id", "text")
    val changes = Seq(
      (1L, 1L, "U", "one-v1"), (1L, 2L, "U", "one-v2"), // two edits
      (2L, 1L, "D", null),                              // delete
      (9L, 1L, "I", "nine")                             // insert
    ).toDF("doc_id", "v", "op", "c_text")
    val rows = graft.operators.Sharding.scd2Build(base, changes)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))
    val byKey = rows.groupBy(_._1)
    // key 1: three versions chaining 0->1->2->current
    assert(byKey(1L).sortBy(_._2).map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((0L, Some(1L), false), (1L, Some(2L), false), (2L, None, true)))
    // key 2: base version closed by the delete, NO current row
    assert(byKey(2L).toSeq == Seq((2L, 0L, Some(1L), false)))
    // key 3: untouched base row stays current
    assert(byKey(3L).toSeq == Seq((3L, 0L, None, true)))
    // key 9: insert opens at its version, current
    assert(byKey(9L).toSeq == Seq((9L, 1L, None, true)))
    // invariant: every key has at most one current row
    rows.groupBy(_._1).values.foreach(g => assert(g.count(_._4) <= 1))
  }

  test("binned packing closed form equals the explicit rank-deal assignment") {
    import spark.implicits._
    // many ties per length + a bucketWidth smaller than the corpus so
    // every closed-form branch (multi-bucket lengths, base offsets that
    // wrap the bin modulus, cnt=0 bins within a group) is exercised
    val docs = (1L to 157L).map { i =>
      (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val got = Sharding.packBinned(docs, nBins = 5, bucketWidth = 16L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // brute force the spec: rank by (n_tokens desc, doc_id asc), deal
    // rank-1 mod nBins — the assignment the pre-round-20 window shape
    // materialized row by row
    val ranked = (1L to 157L).map(i => (i, i % 7 + 1)).sortBy {
      case (id, len) => (-len, id)
    }.zipWithIndex
    val expect = ranked.groupBy { case (_, rk) => (rk % 5).toInt }
      .map { case (b, xs) => (b, xs.size.toLong, xs.map(_._1._2).sum) }
      .toSeq.sortBy(_._1)
    assert(got == expect, s"got $got want $expect")
    // and the gini closed form matches the explicit rank-sum identity
    // on the same corpus
    val g = Sharding.lengthGini(docs, bucketWidth = 16L).collect()(0)
    val asc = (1L to 157L).map(i => (i, i % 7 + 1)).sortBy {
      case (id, len) => (len, id)
    }.zipWithIndex
    val n = asc.size.toDouble
    val sx = asc.map(_._1._2).sum.toDouble
    val srx = asc.map { case ((_, x), rk) => (rk + 1).toDouble * x }.sum
    val wantG = (2.0 * srx - (n + 1) * sx) / (n * sx)
    assert(g.getLong(0) == 157L && g.getLong(1) == sx.toLong)
    assert(math.abs(g.getDouble(2) - wantG) < 1e-12,
      s"gini ${g.getDouble(2)} want $wantG")
  }

  test("length gini: 0 for uniform lengths, near 1 for extreme concentration") {
    import spark.implicits._
    val uniform = (1L to 100L).map(i => (i, "a b c d e"))
      .toDF("doc_id", "text")
    val gU = graft.operators.Sharding.lengthGini(uniform)
      .collect()(0).getDouble(2)
    assert(math.abs(gU) < 1e-12, s"uniform corpus must have gini 0: $gU")
    // 99 one-word docs + one 10000-word doc: nearly all mass in one doc
    val skewed = ((1L to 99L).map(i => (i, "w")) :+
      (100L, Seq.fill(10000)("w").mkString(" "))).toDF("doc_id", "text")
    val gS = graft.operators.Sharding.lengthGini(skewed)
      .collect()(0).getDouble(2)
    assert(gS > 0.95, s"concentrated corpus must have gini near 1: $gS")
    // bucketed rank invariance: a different bucket width gives the
    // same statistic (the rank decomposition is exact, not approximate)
    val gS2 = graft.operators.Sharding.lengthGini(skewed, bucketWidth = 7L)
      .collect()(0).getDouble(2)
    assert(gS == gS2, s"gini must not depend on bucketing: $gS vs $gS2")
  }

  test("global shuffle is a permutation and the bucketed rank equals the global rank") {
    val docs = Tables.documents(spark, Sf)
    val out = Sharding.globalShuffle(docs).collect()
    val n = docs.count()
    assert(out.length == n)
    val pos = out.map(_.getLong(1)).sorted
    assert(pos.sameElements(1L to n), "positions must be exactly 1..n")
    // the two-pass bucketed rank must equal one global hash-order window
    val h = md5(concat(col("doc_id").cast("string"), lit(":42")))
    val global = docs.select(col("doc_id"), h.as("h"))
      .withColumn("shuffle_pos", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("h"), col("doc_id"))))
      .select("doc_id", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    out.foreach(r => assert(r.getLong(1) == global(r.getLong(0))))
    // seeded: a different seed is a different permutation
    val other = Sharding.globalShuffle(docs, seed = 7L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.exists(r => other(r.getLong(0)) != r.getLong(1)))
  }

  test("per-group sample: exactly min(k, |stratum|) rows, deterministic across partitionings") {
    val docs = Tables.documents(spark, Sf)
    val k = 5
    val out = Sharding.samplePerGroup(docs, k = k).collect()
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val per = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    sizes.foreach { case (lang, n) =>
      assert(per.getOrElse(lang, 0) == math.min(k.toLong, n),
        s"$lang: want min($k, $n)")
    }
    val repart = Sharding.samplePerGroup(docs.repartition(7), k = k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(repart == out.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet,
      "sample must not depend on partitioning")
  }

  test("split assignment partitions every doc, holds fractions, survives repartition") {
    val docs = Tables.documents(spark, Sf)
    val out = Sharding.assignSplits(docs).collect()
    assert(out.length == docs.count())
    val counts = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    val n = out.length.toDouble
    assert(math.abs(counts("train") / n - 0.9) < 0.06,
      s"train share ${counts("train") / n} far from 0.9")
    val repart = Sharding.assignSplits(docs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    out.foreach(r => assert(repart(r.getLong(0)) == r.getString(2)))
  }

  test("chunking covers every token with the declared overlap; short docs yield one chunk") {
    import spark.implicits._
    val mk = (n: Int) => (1 to n).map(i => s"t$i").mkString(" ")
    // 300 tokens at window 128 / stride 96: chunks start at 0/96/192 —
    // ceil((300-128)/96)+1 = 3; 128-token doc → exactly 1; 10-token → 1
    val docs = Seq((1L, mk(300)), (2L, mk(128)), (3L, mk(10)))
      .toDF("doc_id", "text")
    val out = Sharding.chunkDocuments(docs, window = 128, overlap = 32)
      .collect().groupBy(_.getLong(0))
    assert(out(1L).length == 3 && out(2L).length == 1 && out(3L).length == 1,
      out.view.mapValues(_.length).toMap.toString)
    // every token of doc 1 appears in some chunk, consecutive chunks
    // share exactly `overlap` tokens, and no chunk exceeds the window
    val chunks = out(1L).sortBy(_.getInt(1)).map(_.getString(3).split(" ").toSeq)
    assert(chunks.flatten.toSet == (1 to 300).map(i => s"t$i").toSet)
    chunks.sliding(2).foreach { w =>
      assert(w(0).takeRight(32) == w(1).take(32),
        "consecutive chunks must share exactly the overlap window")
    }
    assert(chunks.forall(_.length <= 128))
    // the final chunk reaches the last token
    assert(chunks.last.last == "t300")
  }

  test("tokenizer-true counts move a shard boundary whitespace counting misses") {
    import spark.implicits._
    import graft.operators.Pretrain
    // planted CJK stand-in: doc 2 is ONE whitespace word but six real
    // tokens — under whitespace counts doc 3 still fits in shard 0;
    // under bpe counts doc 2's true mass pushes doc 3 over the budget
    val docs = Seq(
      (1L, "x x x", "en"),
      (2L, "abcabcabcabcabcabc", "en"), // 1 word, 6 bpe tokens (abc×6)
      (3L, "y y y", "en")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft_bpeshard").toString
    val fit = Seq((1L, "abcabc abcabc abc abc abc")).toDF("doc_id", "text")
    Pretrain.saveBpeModel(
      Pretrain.bpeMerges(fit, spark, nMerges = 2), s"$dir/model")
    def shards(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Sharding.shardByTokenBudget(d, budget = 8L).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    val ws = shards(docs)
    assert(ws == Map(1L -> 0L, 2L -> 0L, 3L -> 0L),
      s"whitespace counts (3+1+3=7 <= 8) must keep one shard: $ws")
    val bpe = shards(Pretrain.bpeTokenCounts(docs, s"$dir/model", spark))
    assert(bpe == Map(1L -> 0L, 2L -> 0L, 3L -> 1L),
      s"bpe counts (3+6=9 > 8) must push doc 3 into shard 1: $bpe")
    // the same boundary move through the SQL-facing knob end-to-end
    docs.write.mode("overwrite").parquet(s"$dir/data/documents.parquet")
    GraftEngine.pipelineView(spark, "pipeline_shard", s"$dir/data",
      Map("tokens" -> s"bpe:$dir/model", "budget" -> "8"))
    val viaKnob = spark.table("graft_pipeline_shard").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    assert(viaKnob == bpe, s"pipelineView knob drifted: $viaKnob != $bpe")
  }

  test("broadcastBases=off drops the hard hint, keeps results identical") {
    val docs = Tables.documents(spark, Sf)
    def run(): (Seq[(Long, Long)], org.apache.spark.sql.DataFrame) = {
      val df = Sharding.shardByTokenBudget(docs)
      (df.collect().toSeq.map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")), df)
    }
    val (withHint, dfHint) = run()
    assert(dfHint.queryExecution.analyzed.collectFirst {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }.isDefined, "default plan must carry the broadcast hint")
    spark.conf.set("spark.graft.broadcastBases", "off")
    try {
      val (noHint, dfNo) = run()
      assert(dfNo.queryExecution.analyzed.collectFirst {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.isEmpty, "hint-off plan must leave the join strategy to AQE")
      assert(noHint == withHint, "hint knob changed results")
    } finally spark.conf.unset("spark.graft.broadcastBases")
  }

  test("length buckets: caps are powers of two covering every doc") {
    val docs = Tables.documents(spark, Sf)
    val out = Sharding.lengthBuckets(docs).collect()
    assert(out.nonEmpty)
    var totalDocs = 0L
    out.foreach { r =>
      val cap = r.getLong(0)
      assert(cap > 0 && (cap & (cap - 1)) == 0L, s"cap $cap not a power of two")
      totalDocs += r.getLong(1)
      assert(r.getLong(3) >= 0L, "padding waste cannot be negative")
      // every doc in the bucket fits under the cap: waste < n_docs * cap
      assert(r.getLong(3) + r.getLong(2) == r.getLong(1) * cap,
        "waste + tokens must equal docs * cap exactly")
    }
    assert(totalDocs == docs.count())
  }

  test("join advisor: a planted hot key flips the recommendation to salt with the right N") {
    import spark.implicits._
    // 10,000 rows, 901 keys, key 1 holds 9,100 rows (~91% — the skew
    // regime saltedJoin exists for); a long payload pushes est_bytes
    // past the 1 KiB broadcast bound so the salt branch is reachable
    val pad = "x" * 100
    val hot = (1L to 10000L).map(i =>
      (if (i <= 9100) 1L else i, pad)).toDF("k", "payload")
    val advHot = Sharding.joinAdvice(hot, "t", "k",
      broadcastBytes = 1024L).collect()(0)
    assert(advHot.getAs[String]("strategy") == "salt", s"$advHot")
    // avg floor = 10000 DIV 901 = 11; ratio = ceil(9100/11) = 828 →
    // next pow2 1024 → capped at 64
    assert(advHot.getAs[Long]("salt_n") == 64L, s"$advHot")
    // the same shape WITHOUT the hot key: uniform 10 rows/key → plain
    val flat = (1L to 10000L).map(i => (i % 1000, pad)).toDF("k", "payload")
    val advFlat = Sharding.joinAdvice(flat, "t", "k",
      broadcastBytes = 1024L).collect()(0)
    assert(advFlat.getAs[String]("strategy") == "plain", s"$advFlat")
    assert(advFlat.getAs[Long]("salt_n") == 0L, s"$advFlat")
    // and a table under the broadcast bound never salts, however skewed
    val tiny = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"))
      .toDF("k", "payload")
    val advTiny = Sharding.joinAdvice(tiny, "t", "k").collect()(0)
    assert(advTiny.getAs[String]("strategy") == "broadcast", s"$advTiny")
    // mild skew (hot key = 2× avg on a big table) stays plain: salting
    // pays a replication cost that 2× never justifies
    val mild = ((1L to 9000L).map(i => (i % 1000, pad)) ++
      (1L to 10L).map(_ => (1L, pad))).toDF("k", "payload")
    val advMild = Sharding.joinAdvice(mild, "t", "k",
      broadcastBytes = 1024L).collect()(0)
    assert(advMild.getAs[String]("strategy") == "plain", s"$advMild")
  }

  test("as-of read reconstructs exactly the rebuild over the <=v change prefix") {
    val full = Sharding.pipelineScd2(spark, Sf)
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_chars", "digest").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // v=0: exactly the base table (no change applied yet)
    val base = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("n_chars"), md5(col("text")).as("digest"))
    assert(keyset(Sharding.asOfRead(full, 0L)) == keyset(base))
    // v=1: equals CURRENT rows of a history rebuilt from only the v<=1
    // changes — the semantics time travel promises
    val baseTx = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val v1changes = baseTx.where(col("doc_id") % 10 === 0)
      .select(col("doc_id"), lit(1L).as("v"), lit("U").as("op"),
        concat(lit("v1: "), substring(col("text"), 1, 50)).as("c_text"))
      .unionAll(baseTx.where(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 20000000L).as("doc_id"), lit(1L).as("v"),
          lit("I").as("op"),
          concat(lit("fresh: "), substring(col("text"), 1, 40)).as("c_text")))
    val prefix = Sharding.scd2Build(baseTx, v1changes).where(col("is_current"))
    assert(keyset(Sharding.asOfRead(full, 1L)) == keyset(prefix))
    // a key deleted at v=2 is visible at v=1, gone at v=2
    val delKey = Tables.documents(spark, Sf)
      .where(col("doc_id") % 10 === 7).select(min(col("doc_id")))
      .collect()(0).getLong(0)
    assert(Sharding.asOfRead(full, 1L)
      .where(col("doc_id") === delKey).count() == 1)
    assert(Sharding.asOfRead(full, 2L)
      .where(col("doc_id") === delKey).count() == 0)
  }

  test("temperature mixture: smallest stratum kept whole, fracs follow (tmin/t)^(1-alpha)") {
    val docs = Tables.documents(spark, Sf)
    val totals = docs
      .withColumn("n_tokens",
        graft.functions.TextStats.textStats(col("text"))
          .getField("n_words").cast("long"))
      .groupBy(col("lang")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tMin = totals.values.min
    val out = Sharding.temperatureMix(docs, alpha = 0.5)
      .groupBy(col("lang"), col("sample_frac"))
      .agg(count(lit(1)).as("n_docs")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // fracs are exactly sqrt(tmin/t) per stratum
    totals.foreach { case (lang, t) =>
      val expected = math.sqrt(tMin.toDouble / t.toDouble)
      assert(out.contains(lang), s"stratum $lang vanished from the mix")
      assert(out(lang)._1 == expected,
        s"$lang frac ${out(lang)._1} != sqrt(tmin/t) $expected")
    }
    // the smallest stratum keeps EVERY doc (frac = 1 → keep-all "g")
    val minLang = totals.minBy(_._2)._1
    val minLangDocs = docs.where(col("lang") === minLang).count()
    assert(out(minLang)._1 == 1.0 && out(minLang)._2 == minLangDocs)
    // alpha = 0 flattens fully: frac = tmin/t exactly
    val flat = Sharding.temperatureMix(docs, alpha = 0.0)
      .groupBy(col("lang"), col("sample_frac")).agg(count(lit(1)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    totals.foreach { case (lang, t) =>
      assert(flat(lang) == tMin.toDouble / t.toDouble) }
    // non-dyadic alpha is rejected loudly (pow() is not portable)
    intercept[IllegalArgumentException] {
      Sharding.temperatureMix(docs, alpha = 0.3)
    }
  }

  test("scd2 event-time lookup: attached version flips at the planted cuts; deleted keys drop") {
    val ev = Tables.events(spark, Sf)
    val b = ev.agg(unix_seconds(min(col("ts"))).as("lo"),
      unix_seconds(max(col("ts"))).as("hi")).collect().head
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val span3 = (hi - lo) / 3
    val (c1, c2) = (lo + span3, lo + 2 * span3)
    val evRows = ev.select(col("event_id"), col("user_id"),
        unix_seconds(col("ts")).as("sec")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the closed-form dim rule, replayed per event
    def expected(u: Long, sec: Long): Option[String] = {
      val deleted = u % 10 == 7 && sec >= c2
      if (deleted) None
      else if (u % 6 == 0 && sec >= c2) Some("gold")
      else if (u % 3 == 0 && sec >= c1) Some("silver")
      else Some("bronze")
    }
    val got = Sharding.scd2Lookup(ev).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    evRows.foreach { case (eid, u, sec) =>
      expected(u, sec) match {
        case Some(t) => assert(got.get(eid).contains(t),
          s"event $eid (user $u, sec $sec): got ${got.get(eid)}, want $t")
        case None => assert(!got.contains(eid),
          s"event $eid of deleted user $u must drop, got ${got.get(eid)}")
      }
    }
    // the planted changes actually exercise all transitions: some user
    // flips bronze->silver across c1, some silver/gold exists past c2,
    // and at least one deleted-tail event dropped
    val tiers = got.values.toSet
    assert(tiers.contains("bronze") && tiers.contains("silver"),
      s"corpus must exercise a mid-stream flip, got $tiers")
    assert(evRows.exists { case (_, u, sec) => u % 10 == 7 && sec >= c2 },
      "corpus must contain a deleted-tail event for the drop case")
    assert(got.size ==
      evRows.count { case (_, u, sec) => expected(u, sec).isDefined })
  }

  test("scd2 event-time lookup: empty and sub-3-second event spans degrade deterministically") {
    import spark.implicits._
    val schema = Tables.events(spark, Sf).select(
      col("event_id"), col("user_id"), col("ts")).schema
    // empty events: no terciles exist to derive a dim from — must
    // return an empty frame with the lookup schema, not NPE on the
    // null min/max (round-17 advice)
    val empty = Sharding.scd2Lookup(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    assert(empty.count() == 0)
    assert(empty.columns.toSeq ==
      Seq("event_id", "user_id", "ts", "tier", "tier_since"))
    // a 2-second span: span3 = 0 so both cuts coincide at lo and a
    // key's versions open at the SAME instant — the version ordinal
    // must order them so the LATEST version wins, exactly the
    // interval-join semantics (empty [c, c) intervals attach nothing).
    // user 6 (≡0 mod 3 and mod 6): bronze[epoch,lo) silver[lo,lo)
    // gold[lo,∞) → every event is gold. user 7 (≡7 mod 10): deleted
    // at c2=lo → every event drops. user 1: bronze forever.
    def t(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    val tiny = Seq(
      (1L, 6L, t(0)), (2L, 6L, t(1)), (3L, 6L, t(2)),
      (4L, 7L, t(0)), (5L, 7L, t(2)),
      (6L, 1L, t(0)), (7L, 1L, t(2)))
      .toDF("event_id", "user_id", "ts")
    val out = Sharding.scd2Lookup(tiny).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "gold", 2L -> "gold", 3L -> "gold",
      6L -> "bronze", 7L -> "bronze"),
      s"degenerate-span lookup must be deterministic: $out")
    // replay: same instant, same answer — no nondeterministic carry
    val again = Sharding.scd2Lookup(tiny).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again == out, "degenerate-span lookup must replay identically")
  }

  test("temperature mixture: input already carrying threshold-join columns fails loudly") {
    val docs = Tables.documents(spark, Sf)
    // chained-mix shape: mixCorpus-style output keeps sample_frac; the
    // broadcast threshold join would otherwise create duplicate columns
    val chained = Sharding.temperatureMix(docs)
    val e = intercept[IllegalArgumentException] {
      Sharding.temperatureMix(chained)
    }
    assert(e.getMessage.contains("sample_frac"))
    intercept[IllegalArgumentException] {
      Sharding.temperatureMix(docs.withColumn("_thr", lit("g")))
    }
  }
}
