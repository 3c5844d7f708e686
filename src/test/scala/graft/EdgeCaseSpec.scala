package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, QualityRules, TextAnalysis}

/** Hostile inputs the 100 TB corpus will certainly contain: empty
  * documents, whitespace-only, single-word, CJK (no whitespace at all),
  * and byte-identical boilerplate. Nothing may throw; semantics must
  * stay sane. */
class EdgeCaseSpec extends SparkSpec {

  private lazy val hostile = {
    import spark.implicits._
    Seq(
      (1L, ""), (2L, "   "), (3L, "word"),
      (4L, "数据处理引擎没有空格的文本"),
      (5L, "exact duplicate boilerplate text"),
      (6L, "exact duplicate boilerplate text"),
      (7L, "a\tb\nc  d")
    ).toDF("doc_id", "text")
  }

  test("minhash pipeline survives hostile docs and pairs the boilerplate") {
    val pairs = Dedup.minhashLshPairs(hostile)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((5L, 6L)), "identical docs must share all buckets")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L),
      s"unrelated docs paired: $pairs")
  }

  test("simhash + jaccard survive hostile docs") {
    val sh = Dedup.simhash(hostile).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(5L) == sh(6L))
    val jac = Dedup.ngramJaccardPairs(hostile).collect()
    assert(jac.exists(r => r.getLong(0) == 5L && r.getLong(1) == 6L
      && r.getDouble(2) == 1.0))
  }

  test("rolling fingerprints survive hostile docs") {
    import graft.functions.HashFunctions.rollingFingerprint
    val fps = hostile.select(col("doc_id"), rollingFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(1L).isEmpty)          // empty doc → empty fingerprint
    assert(fps(5L) == fps(6L))       // identical docs → identical prints
    assert(fps(4L).nonEmpty)         // CJK bytes fingerprint fine
  }

  test("rule-based curation survives hostile docs") {
    // gopher gate: a row per doc, hostile docs simply fail the gate
    val gate = QualityRules.gopherRules(hostile).collect()
    assert(gate.length == 7)
    assert(!gate.filter(r => Set(1L, 2L, 3L).contains(r.getLong(0)))
      .exists(_.getBoolean(6)), "degenerate docs must not pass the gate")
    // PII redaction: empty and CJK text pass through untouched
    val red = hostile.select(col("doc_id"),
      QualityRules.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) == "" && red(4L) == "数据处理引擎没有空格的文本")
    // boilerplate spans: the duplicated text surfaces, nothing throws
    val spans = QualityRules.boilerplateParagraphs(hostile).collect()
    assert(spans.length == 1 && spans(0).getLong(2) == 2L)
    // contamination screen against a hostile eval set: no crash, and
    // the boilerplate doc is flagged against its twin
    val contam = QualityRules.contaminationScreen(
      hostile.where(col("doc_id") =!= 6L), hostile.where(col("doc_id") === 6L))
      .collect().map(_.getLong(0)).toSet
    assert(contam == Set(5L), s"expected only the twin flagged: $contam")
  }

  test("BM25 on hostile docs: no query hits → empty result, no crash") {
    val none = TextAnalysis.bm25Search(hostile, Seq("vector", "stream"))
    assert(none.collect().isEmpty, "no doc contains the query terms")
    // a hit among hostile docs still scores; empty/CJK docs never NaN
    val hit = TextAnalysis.bm25Search(hostile, Seq("word")).collect()
    assert(hit.map(_.getLong(0)).toSeq == Seq(3L))
    assert(!hit.head.getDouble(1).isNaN && hit.head.getDouble(1) > 0)
  }

  test("text quality ratios stay finite or null, never crash") {
    // empty/whitespace docs divide by a zero-ish word count — the
    // operator must produce rows for every doc without throwing
    val out = TextAnalysis.textQuality(spark, Sf)
    assert(out.count() == Tables.documents(spark, Sf).count())
  }

  test("chunking survives hostile docs: every doc yields >= 1 chunk, nothing throws") {
    val out = graft.operators.Sharding.chunkDocuments(hostile).collect()
    val perDoc = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    // one short chunk each — empty/whitespace/CJK included
    hostile.collect().foreach { r =>
      assert(perDoc.getOrElse(r.getLong(0), 0) == 1,
        s"doc ${r.getLong(0)} must yield exactly one chunk: $perDoc")
    }
    assert(out.forall(_.getInt(2) <= 128), "no chunk may exceed the window")
  }

  test("text index admission survives hostile docs and an empty batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tihostile").toString
    graft.operators.TextIndex.build(spark, hostile, dir)
    // empty batch: admits nothing, throws nothing
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.TextIndex.ingest(spark, empty, dir).collect().isEmpty)
    // a batch repeating hostile boilerplate is rejected; fresh admits
    val batch = Seq(
      (100L, "exact duplicate boilerplate text"),
      (101L, "completely novel content that shares no shingles with anything here")
    ).toDF("doc_id", "text")
    val admitted = graft.operators.TextIndex.ingest(spark, batch, dir)
      .collect().map(_.getLong(0)).toSet
    assert(!admitted.contains(100L) && admitted.contains(101L), admitted.toString)
  }

  test("pretraining-selection operators survive hostile docs") {
    import graft.operators.Pretrain
    val withLang = hostile.withColumn("lang",
      when(col("doc_id") <= 3, "en").otherwise("zh"))
    // DSIR: empty/whitespace/single-word docs carry no bigram and drop;
    // the rest score without throwing
    val w = Pretrain.dsirWeight(withLang).collect()
    assert(w.nonEmpty && w.forall(r => !r.isNullAt(2)))
    // bigram LM: only multi-token docs appear
    val bg = Pretrain.bigramLogprob(hostile).collect().map(_.getLong(0)).toSet
    assert(!bg.contains(1L) && !bg.contains(3L))
    // char entropy: CJK-only doc degrades to (0, 0.0), nothing throws
    val ce = Pretrain.textCharEntropy(spark, Sf)
    assert(ce.columns.length == 3)
    val hostileEnt = hostile.select(col("doc_id"),
        graft.functions.CharEntropy.charEntropy(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_printable"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hostileEnt(4L) == 0 && hostileEnt(1L) == 0)
    // BPE on hostile corpus: single-char and CJK words fit, no throw
    val merges = Pretrain.bpeMerges(hostile, spark, nMerges = 3).collect()
    assert(merges.length <= 3)
  }

  test("profile/interleave reports survive hostile docs incl. nulls") {
    import spark.implicits._
    import graft.operators.Sharding
    val docs = Seq(
      (1L, "", Some("s1")), (2L, "abc", None), (3L, "abc", Some("s2")))
      .toDF("doc_id", "text", "source")
    val prof = Sharding.profileTable(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(prof("source") == ((1L, 2L))) // 1 null, 2 distinct non-null
    assert(prof("text")._2 == 2L)        // "" and "abc"
    val il = Sharding.sourceInterleave(
        docs.na.fill("s0", Seq("source")))
      .collect().map(_.getLong(2)).sorted
    assert(il.toSeq == Seq(1L, 2L, 3L)) // positions are a permutation
  }

  test("shuffle/bucket/sample operators survive hostile docs incl. null lang") {
    import spark.implicits._
    import graft.operators.Sharding
    val docs = Seq(
      (1L, "", Option("en")), (2L, "   ", Option("en")),
      (3L, "word", None), (4L, "数据处理引擎没有空格的文本", Option("zh")),
      (5L, "a b c d e", None)
    ).toDF("doc_id", "text", "lang")
    val shuf = Sharding.globalShuffle(docs).collect()
    assert(shuf.map(_.getLong(1)).sorted.sameElements(1L to 5L))
    val lb = Sharding.lengthBuckets(docs).collect()
    // empty/whitespace docs land in the cap=1 bucket, never crash
    assert(lb.map(_.getLong(1)).sum == 5L)
    assert(lb.forall(r => { val c = r.getLong(0); c > 0 && (c & (c - 1)) == 0L }))
    val smp = Sharding.samplePerGroup(docs, k = 2).collect()
    // null lang is its own stratum; every stratum contributes min(k, n)
    assert(smp.count(_.isNullAt(1)) == 2)
    assert(smp.length == 2 + 2 + 1)
    val inc = Dedup.incrementalIngest(
      docs.where(col("doc_id") <= 2), docs.where(col("doc_id") > 2)).collect()
    assert(inc.length == 3, "distinct hostile texts all admitted")
  }

  test("round-11 operators survive hostile docs incl. nulls") {
    import spark.implicits._
    import graft.operators.{Sharding, TextAnalysis}
    val docs = Seq(
      (1L, "", Some("s1"), Some("en")),
      (2L, "   ", None, Some("en")),
      (3L, "word", Some("s2"), None),
      (4L, "数据处理引擎没有空格的文本", Some("s1"), Some("zh")),
      (5L, "exact duplicate boilerplate text here now", Some("s2"), Some("en")),
      (6L, "exact duplicate boilerplate text here now", Some("s2"), Some("en"))
    ).toDF("doc_id", "text", "source", "lang")
    // budget cap: null source is its own stratum, every doc reported,
    // admission never throws
    val bc = Sharding.budgetCap(docs, budget = 3L).collect()
    assert(bc.length == 6)
    assert(bc.map(_.getLong(0)).sorted.sameElements(1L to 6L))
    // binned packing: token totals preserved across hostile docs
    val pb = Sharding.packBinned(docs, nBins = 3)
    assert(pb.agg(sum("n_docs")).collect()(0).getLong(0) == 6L)
    // epoch plan: permutations survive empty/CJK docs
    val ep = Sharding.epochPlan(docs, epochs = 2).collect()
    assert(ep.count(_.getInt(0) == 0) == 6 && ep.count(_.getInt(0) == 1) == 6)
    // prefix dedup: the byte-identical pair groups; nothing throws
    val dp = Dedup.dedupPrefix(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dp.get(5L).contains(5L) && dp.get(6L).contains(5L))
    // containment: exact dups contain each other at 1.0
    val ct = Dedup.containmentPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ct.exists(t => t._1 == 5L && t._2 == 6L && t._3 > 0.999))
    // sentences: empty text yields 1 "sentence", no divide-by-zero NaN
    val sent = docs.select(col("doc_id"),
      size(split(col("text"), "[.!?]+\\s+")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sent(1L) == 1)
    // zipf/hapax: null-lang docs form their own stratum, no throw
    assert(TextAnalysis.textHapaxShare(spark, Sf).count() > 0)
    val hz = docs.select(col("lang"),
      explode(split(lower(col("text")), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("lang"), col("term")).count()
    assert(hz.count() > 0)
    // merge upsert: hostile snapshot merges without throwing
    val merged = Sharding.mergeUpsert(
      docs.select(col("doc_id"), col("text")),
      Seq((3L, "U", Option("rewritten")), (4L, "D", None),
        (99L, "I", Option("fresh")))
        .toDF("doc_id", "op", "c_text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!merged.contains(4L) && merged(99L) == "insert"
      && merged(3L) == "update" && merged(5L) == "keep")
  }

  test("round-12 analytics survive hostile docs and degenerate streams") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""), (2L, "   "), (3L, "word"),
      (4L, "数据处理引擎没有空格的文本"),
      (5L, "same text here"), (6L, "same text here")
    ).toDF("doc_id", "text")
    // gini: hostile lengths produce a finite statistic in [0, 1)
    val g = graft.operators.Sharding.lengthGini(docs).collect()(0)
    assert(g.getLong(0) == 6L)
    assert(!g.getDouble(2).isNaN && g.getDouble(2) >= 0.0 && g.getDouble(2) < 1.0)
    // scd2 with an EMPTY change set: every base row current at v0
    val noChanges = Seq.empty[(Long, Long, String, String)]
      .toDF("doc_id", "v", "op", "c_text")
    val hist = graft.operators.Sharding.scd2Build(docs, noChanges).collect()
    assert(hist.length == 6 && hist.forall(_.getBoolean(3)))
    // streaks for a single-event user: one 1-day island
    val oneEv = Seq((1L, java.sql.Timestamp.valueOf("2024-01-05 10:00:00"),
      7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val base = java.nio.file.Files.createTempDirectory("graft_streak1").toString
    oneEv.write.mode("overwrite").parquet(s"$base/events.parquet")
    // reuse the events loader contract via a direct frame instead:
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    val islands = oneEv
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
      .withColumn("gap", when(datediff(col("day"),
        lag(col("day"), 1).over(w)) === 1, 0L).otherwise(1L))
      .groupBy(col("user_id")).agg(sum(col("gap")).as("n_islands"),
        count(lit(1)).as("n_days"))
      .collect()
    assert(islands.length == 1 && islands(0).getLong(1) == 1L &&
      islands(0).getLong(2) == 1L)
  }

  test("round-12 multimodal dedup survives hostile blobs") {
    import spark.implicits._
    import graft.operators.Multimodal
    // empty blob, 1-byte blob, truncated PNG magic, 1×1 real PNG,
    // extreme-aspect real PNG (narrower than the 8-block grid), WAV
    // with a zero-length data chunk, WAV whose declared data length
    // overruns the blob
    val one = {
      val img = new java.awt.image.BufferedImage(
        1, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    val wide = {
      val img = new java.awt.image.BufferedImage(
        100, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 100) { img.setRGB(x, 0, 0xffffff); img.setRGB(x, 1, 0) }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    def wavHdr(dataLen: Int, actual: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(8000)
        .putShort(1).putShort(8)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      bb.array() ++ Array.fill(actual)(0x40.toByte)
    }
    val blobs = Seq(
      (1L, Array.empty[Byte]), (2L, Array[Byte](0x42)),
      (3L, Array[Byte](0x89.toByte, 'P', 'N')), (4L, one), (5L, wide),
      (6L, wavHdr(0, 0)), (7L, wavHdr(5000, 10))
    ).toDF("doc_id", "blob")
    // image path: only the two real PNGs hash; nothing throws
    val ph = Multimodal.imagePhashes(blobs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ph.keySet == Set(4L, 5L), s"unexpected image hashes: $ph")
    // audio path: the zero-length data chunk fingerprints (silence —
    // all-zero energies, bits all set by the >= tie rule), the
    // overrunning chunk is rejected by the bounds check, not read OOB
    assert(Multimodal.audioFp64(wavHdr(0, 0)).isDefined)
    assert(Multimodal.audioFp64(wavHdr(5000, 10)).isEmpty)
    val af = Multimodal.audioFingerprints(blobs)
      .collect().map(_.getLong(0)).toSet
    assert(af == Set(6L), s"unexpected audio fingerprints: $af")
    // frame slicing: empty blob yields no frames, short blobs hash
    // their padded tail slice; nothing throws and ids stay sane
    val fs = Multimodal.frameSignatures(blobs)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!fs.contains(1L) && fs.contains(2L), s"frame ids: $fs")
    // star edges over a single-row hash table: no self-edges
    val edges = graft.operators.Dedup.hamming64StarEdges(
      Multimodal.imagePhashes(blobs), "doc_id", "phash")
    assert(edges.where(col("id1") === col("id2")).isEmpty,
      "star edges must never contain self-edges")
  }

  test("round-13 text operators survive hostile docs") {
    import spark.implicits._
    // BPE encode with an empty merge table = codepoint-level ids:
    // nothing throws, CJK encodes per codepoint where whitespace
    // word-counting collapses to one "word", identical docs agree
    val enc = graft.operators.Pretrain.bpeEncode(hostile, Seq.empty, spark)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Int](3)))).toMap
    assert(enc.size == 7)
    assert(enc(4L)._1 == 1L, "no-space CJK is ONE whitespace word")
    assert(enc(4L)._2 == 13L, "13 codepoints -> 13 unmerged ids")
    assert(enc(5L) == enc(6L), "identical docs must encode identically")
    assert(enc(3L)._3 == "word".map(_.toInt).toSeq)
    // dup-gram share: empty and whitespace-only docs collapse to the
    // same whole-doc gram (the split edge artifact) -> both duplicated;
    // byte-identical boilerplate pair -> share exactly 1.0
    val ds = QualityRules.dupNgramShare(hostile)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ds.size == 7 && ds.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(ds(1L) == 1.0 && ds(2L) == 1.0 && ds(5L) == 1.0 && ds(6L) == 1.0)
    assert(ds(4L) == 0.0, "unique CJK doc shares nothing")
    // deflate ratio: identity on empty, finite positive on CJK
    val cr = hostile.select(col("doc_id"),
      graft.functions.DeflateRatio.deflateRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cr(1L) == 1.0)
    assert(cr.values.forall(v => v > 0.0 && !v.isNaN && !v.isInfinite))
    // novelty: every doc reports, shares bounded, the repeat pair is
    // first-new then all-old
    val nv = TextAnalysis.ngramNovelty(hostile)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(nv.size == 7 && nv.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(nv(5L) == 1.0 && nv(6L) == 0.0)
  }

  test("conversion lag on degenerate streams: no views / no purchases / empty") {
    import spark.implicits._
    def ev(rows: Seq[(Long, String, Long, String)]) =
      rows.map { case (id, t, u, et) =>
        (id, java.sql.Timestamp.valueOf(t), u, et, 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val noPurch = ev(Seq((1L, "2024-01-01 10:00:00", 1L, "view")))
    assert(graft.operators.Events.conversionLag(noPurch).isEmpty)
    val noViews = ev(Seq((1L, "2024-01-01 10:00:00", 1L, "purchase")))
    assert(graft.operators.Events.conversionLag(noViews).isEmpty)
    assert(graft.operators.Events.conversionLag(
      ev(Seq.empty)).isEmpty)
  }

  test("lifecycle/concentration/dense on degenerate streams; PMI and skew on hostile inputs") {
    import spark.implicits._
    def ev(rows: Seq[(Long, String, Long)]) =
      rows.map { case (id, t, u) =>
        (id, java.sql.Timestamp.valueOf(t), u, "view", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val empty = ev(Seq.empty)
    assert(graft.operators.Events.lifecycleStates(empty).isEmpty)
    assert(graft.operators.Events.userConcentration(empty).isEmpty)
    assert(graft.operators.Events.dailyDense(empty).isEmpty)
    // one user, one event: new/active 1, churn 0; concentration trivially 1
    val one = ev(Seq((1L, "2024-01-03 10:00:00", 9L)))
    val lc = graft.operators.Events.lifecycleStates(one).collect()
    assert(lc.length == 1 &&
      (lc(0).getLong(1), lc(0).getLong(2), lc(0).getLong(5)) ==
        ((1L, 1L, 0L)))
    val uc = graft.operators.Events.userConcentration(one).collect()
    assert(uc.length == 1 && uc(0).getDouble(2) == 1.0 &&
      uc(0).getDouble(3) == 1.0)
    assert(graft.operators.Events.dailyDense(one).count() == 1)
    // PMI on the hostile corpus: min-count floor filters everything
    // (each pair rare) at the default, nothing throws; at minCount=1
    // the repeated boilerplate pairs surface with finite PMI
    assert(TextAnalysis.pmiBigrams(
      hostile.withColumn("lang", lit("en"))).isEmpty)
    val p1 = TextAnalysis.pmiBigrams(
      hostile.withColumn("lang", lit("en")), minCount = 1).collect()
    assert(p1.nonEmpty &&
      p1.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    // skew on a null-bearing key column: nulls form their own group,
    // report stays a single exact row
    val nk = Seq(Some("a"), Some("a"), None, Some("b"))
      .toDF("k")
    val sk = graft.operators.Sharding.keySkew(nk, "t", "k").collect()(0)
    assert(sk.getLong(2) == 4L && sk.getLong(3) == 3L &&
      sk.getLong(4) == 2L, sk.toString)
    // dim stats on a single vector: std is n-1 undefined -> NaN, not a crash
    val oneVec = Seq((1L, Array(0.5f, -0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val ds = graft.operators.Similarity.dimStats(oneVec).collect()
    assert(ds.length == 2 && ds.forall(r => r.getDouble(3).isNaN))
  }

  test("late-wave text operators survive hostile docs") {
    import spark.implicits._
    val h = hostile.withColumn("lang", lit("en"))
      .withColumn("source", concat(lit("s"), (col("doc_id") % 2)))
    // skipgram: single-word and CJK docs emit no pairs; boilerplate
    // pairs surface at minCount=1 with finite PMI
    val sg = TextAnalysis.skipgramPmi(h, window = 3, minCount = 1).collect()
    assert(sg.nonEmpty &&
      sg.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    assert(!sg.exists(r => r.getString(0) == "word" &&
      r.getString(1) == "word"), "a 1-token doc cannot self-pair")
    // source divergence: two identically-distributed sources diverge 0
    val same = Seq((1L, "x y z", "a"), (2L, "x y z", "b"))
      .toDF("doc_id", "text", "source")
    val dv = TextAnalysis.sourceDivergence(same).collect()
    assert(dv.length == 1 && math.abs(dv(0).getDouble(3)) < 1e-12)
    assert(TextAnalysis.sourceDivergence(h).collect()
      .forall(r => !r.getDouble(3).isNaN), "hostile divergence NaN'd")
    // charclass: empty docs drop (not a divide-by-zero); CJK text is
    // 100% 'other'
    val cc = TextAnalysis.charclassProfile(
      Seq((1L, "数据引擎", "zh"), (2L, "", "zh")).toDF("doc_id", "text", "lang"))
      .collect()
    assert(cc.length == 1 && cc(0).getLong(1) == 1L &&
      cc(0).getDouble(5) == 1.0, cc.mkString(","))
    // per-source top terms: min-length floor drops the junk; ranks
    // stay 1..k dense per source, nothing throws
    val tt = TextAnalysis.sourceTopTerms(h, k = 3, minLen = 4).collect()
    assert(tt.groupBy(_.getString(0)).values
      .forall(rs => rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length)))
  }

  test("late-wave profile/calibration/outlier operators survive degenerate input") {
    import spark.implicits._
    // column profile: an all-null column reports null_frac 1, 0 distinct
    val nulls = Seq((1L, Option.empty[String]), (2L, None))
      .toDF("id", "v")
    val cp = graft.operators.Sharding.columnProfile(nulls, "t")
      .collect().map(r => r.getString(1) -> r).toMap
    assert(cp("v").getLong(3) == 2L && cp("v").getLong(4) == 0L &&
      cp("v").getDouble(5) == 1.0)
    assert(cp("id").getLong(3) == 0L && cp("id").getDouble(6) == 1.0)
    // minhash calibration: byte-identical boilerplate calibrates to
    // est = true = 1.0 with zero error
    val cal = Dedup.minhashCalibration(hostile).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (e56, t56, err56) = cal((5L, 6L))
    assert(e56 == 1.0 && t56 == 1.0 && err56 == 0.0, cal.toString)
    // outlier scores: a single-member label has undefined sigma — its
    // z is NaN and it must NOT flag (NaN < -2 is false), no throw
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f), 1)  // lone member of label 1
    ).toDF("vec_id", "embedding", "label")
    val oz = graft.operators.Similarity.outlierScores(emb).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(oz(3L)._1.isNaN && !oz(3L)._2, oz.toString)
  }

  test("round-14 operators survive hostile and degenerate input") {
    import spark.implicits._
    // join advice on a 1-row table: avg floor clamps to 1, no div-zero,
    // and a single key is never "skewed" past its own average
    val one = Seq((1L, "x")).toDF("k", "v")
    val a1 = graft.operators.Sharding.joinAdvice(one, "t", "k").collect()(0)
    assert(a1.getAs[String]("strategy") == "broadcast" &&
      a1.getAs[Long]("salt_n") == 0L, a1.toString)
    // all-null key column: one null group, still one clean row
    val nullKeys = Seq((Option.empty[java.lang.Long], "a"),
      (Option.empty[java.lang.Long], "b")).toDF("k", "v")
    val an = graft.operators.Sharding.joinAdvice(nullKeys, "t", "k").collect()
    assert(an.length == 1 && an(0).getAs[Long]("n_keys") == 1L)
    // advised join with an EMPTY dim: broadcast branch, zero rows, no throw
    val emptyDim = Seq.empty[(Long, String)].toDF("k", "name")
    assert(graft.operators.ScaleJoins
      .advisedJoin(one, emptyDim, "k").count() == 0L)
    // media signatures on hostile blobs: empty → no row; truncated PNG
    // header → container fallback, never a throw
    val hostileBlobs = Seq(
      (1L, Array.empty[Byte]),
      (2L, Array[Byte](0x89.toByte, 'P', 'N', 'G')),
      (3L, "RIFFxxxxWAVE".getBytes("US-ASCII")),
      (4L, Array.tabulate(200)(_.toByte))).toDF("doc_id", "blob")
    val sigs = graft.operators.MediaIndex.signaturesOf(hostileBlobs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!sigs.contains(1L), "empty blob must yield no signature")
    assert(sigs.get(2L).contains("video"),
      "truncated PNG header falls back to the container plane")
    assert(!sigs.contains(3L),
      "a RIFF/WAVE sniff with no fmt chunk must yield no audio signature")
    assert(sigs.get(4L).contains("video"))
    // media admit against an EMPTY index dir state: everything passes
    // the corpus screen, in-batch collapse still applies — and the
    // UN-FINGERPRINTABLE blobs (1: empty, 3: fmt-less RIFF) pass
    // through ADMITTED by the documented policy (they can collide
    // with nothing, so screening them is vacuous)
    val dir = java.nio.file.Files.createTempDirectory("graft_mi_edge").toString
    graft.operators.MediaIndex.build(spark,
      Seq.empty[(Long, Array[Byte])].toDF("doc_id", "blob"), dir)
    val admitted = graft.operators.MediaIndex
      .admit(spark, hostileBlobs, dir).collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1L, 2L, 3L, 4L), admitted.toString)
    // fertility on a words-free corpus source: n_words >= 1 by the
    // split quirk ("" -> [""]), so the quotient never divides by zero
    val langDir = java.nio.file.Files.createTempDirectory("graft_f_edge").toString
    Seq((1L, "", "empty"), (2L, "   ", "blank"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$langDir/documents.parquet")
    val fert = graft.operators.Pretrain.pipelineBpeFertility(spark, langDir)
      .collect()
    assert(fert.length == 2 && fert.forall(r => !r.getDouble(4).isNaN))
    // langid-by-source over the same degenerate corpus: one row per
    // source, match share well-defined
    val lid = graft.operators.TextAnalysis.textLangidBySource(spark, langDir)
      .collect()
    assert(lid.length == 2 && lid.forall(r => !r.getDouble(3).isNaN))
  }

  test("round-15 operators survive hostile and degenerate input") {
    import spark.implicits._
    import graft.operators.{Pretrain, ScaleJoins, Sharding, StatsCatalog}
    val one = Seq((1L, "x")).toDF("k", "v")
    val emptyF = Seq.empty[(Long, String)].toDF("k", "v")
    val emptyD = Seq.empty[(Long, String)].toDF("k", "name")
    // pair advice on EMPTY sides: one clean row, no throw, no NaN
    // arithmetic crash — an empty dim reads as trivially broadcastable
    val pe = Sharding.joinPairAdvice(one, "f", "k", emptyD, "d", "k")
      .collect()
    assert(pe.length == 1, pe.mkString)
    val pf = Sharding.joinPairAdvice(emptyF, "f", "k", one.toDF("k", "name"),
      "d", "k").collect()
    assert(pf.length == 1)
    // executed: empty fact × big dim and one-row fact × empty dim both
    // produce zero rows through whatever branch fires
    assert(ScaleJoins.advisedJoin(emptyF, one.toDF("k", "name"), "k",
      keyReused = true).count() == 0L)
    assert(ScaleJoins.advisedJoin(one, emptyD, "k",
      keyReused = true).count() == 0L)
    // stats catalog over an EMPTY relation: build commits, the leg is
    // simply absent (no row to reduce), every read verb answers clean
    val cat = java.nio.file.Files.createTempDirectory("graft_sc_edge").toString
    StatsCatalog.build(spark, cat, Seq(StatsCatalog.Leg(emptyF, "f", "k")))
    assert(StatsCatalog.advice(spark, cat).collect().isEmpty)
    assert(StatsCatalog.staleness(spark, cat).collect().isEmpty)
    assert(StatsCatalog.layoutAdvice(spark, cat).collect().isEmpty)
    assert(StatsCatalog.legStats(spark, cat, "f", "k").isEmpty)
    assert(StatsCatalog.compact(spark, cat)._2 <= 1L)
    // bpe curve on a corpus where NO pair ever repeats (the fit stops
    // at zero merges): every grid point emits, fertility exactly flat
    val flatDocs = Seq((1L, "ab cd", "s1"), (2L, "ef gh", "s1"))
      .toDF("doc_id", "text", "source")
    val curve = Pretrain.bpeCurve(flatDocs, spark, Seq(2, 4))
      .collect().map(r => (r.getInt(1), r.getDouble(5)))
    assert(curve.length == 2 && curve.map(_._2).distinct.length == 1,
      s"zero-merge corpus must be flat across the grid: ${curve.toSeq}")
    // and on an all-whitespace doc (1 empty word, 0-char symbols)
    val ws = Pretrain.bpeCurve(
      Seq((1L, "   ", "s")).toDF("doc_id", "text", "source"),
      spark, Seq(2)).collect()
    assert(ws.length == 1)
  }

  test("round-16 operators survive hostile and degenerate input") {
    import spark.implicits._
    import graft.operators.{AnnIndex, Pretrain, ScaleJoins, StatsCatalog}
    val rows = (1L to 20L).map(i => (i % 5, s"p$i")).toDF("k", "v")
    val emptyF = Seq.empty[(Long, String)].toDF("k", "v")
    // retract of an EMPTY batch is a committed no-op (advice unchanged)
    val cat = java.nio.file.Files
      .createTempDirectory("graft_r16_edge").toString
    StatsCatalog.build(spark, cat, Seq(StatsCatalog.Leg(rows, "t", "k")))
    val before = StatsCatalog.advice(spark, cat).collect().map(_.toSeq).toSeq
    StatsCatalog.retract(spark, cat, emptyF, "t", "k")
    assert(StatsCatalog.advice(spark, cat).collect().map(_.toSeq).toSeq
      == before)
    // OVER-retraction (retracting a batch twice) drives keys net-
    // negative: they drop from the view rather than crash or go
    // negative in any reduced number
    StatsCatalog.retract(spark, cat, rows, "t", "k")
    StatsCatalog.retract(spark, cat, rows, "t", "k")
    assert(StatsCatalog.reducedStats(spark, cat).collect().isEmpty,
      "over-retracted keys must vanish, not go negative")
    assert(StatsCatalog.legStats(spark, cat, "t", "k").isEmpty)
    // layout execution on an EMPTY relation: both halves land and read
    // back as zero rows, the bucketed join answers empty
    val eb = graft.sources.Sources.applyBucketLayout(emptyF, 2, "k",
      "graft_edge_empty_bucket")
    assert(eb.count() == 0L)
    val ep = java.nio.file.Files
      .createTempDirectory("graft_r16_edge_files").toString + "/e"
    assert(graft.sources.Sources.applyFileLayout(emptyF, 3, ep).count() == 0L)
    assert(ScaleJoins.clusteredJoin(emptyF, rows.toDF("k", "name"), "k",
      nFiles = 4).count() == 0L)
    // tune input guards fail loudly: duplicate grid, out-of-range SLO
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r16_edge_ann").toString
    AnnIndex.build(spark, Tables.embeddings(spark, Sf), dir, k = 8)
    val qs = Tables.embeddings(spark, Sf).where(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    intercept[IllegalArgumentException] {
      AnnIndex.tune(spark, dir, qs, recallSLO = 0.9, grid = Seq(4, 4))
    }
    intercept[IllegalArgumentException] {
      AnnIndex.tune(spark, dir, qs, recallSLO = 1.5)
    }
    // an unreachable SLO stamps the largest grid point and reports the
    // shortfall instead of looping or throwing
    val (nP, rec) = AnnIndex.tune(spark, dir, qs, recallSLO = 1.0,
      grid = Seq(1))
    assert(nP == 1 && rec <= 1.0)
    // bpeCurveFitted with an EMPTY merge list is the character model:
    // rows emit, fertility is the chars-per-word ratio at every size
    val c = Pretrain.bpeCurveFitted(
      Seq((1L, "ab ab", "s")).toDF("doc_id", "text", "source"),
      spark, Seq(2, 4), Seq.empty).collect()
    assert(c.length == 2 && c.map(_.getDouble(5)).distinct.length == 1)
    // duplicate grid rejected on the fitted path too
    intercept[IllegalArgumentException] {
      Pretrain.bpeCurveFitted(rows.toDF("doc_id", "text")
        .withColumn("source", lit("s")), spark, Seq(4, 4), Seq.empty)
    }
  }

  test("round-16b operators survive hostile and degenerate input") {
    import spark.implicits._
    import graft.operators.{Sharding, Similarity}
    // temperature mixture: empty corpus fails loudly; a single stratum
    // keeps everything at frac 1; a NULL-stratum doc forms its own
    // stratum instead of silently dropping (the shard family's
    // null-key contract)
    intercept[IllegalArgumentException] {
      Sharding.temperatureMix(
        Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang"))
        .count()
    }
    val single = Seq((1L, "a b c", "en"), (2L, "d e", "en"))
      .toDF("doc_id", "text", "lang")
    val singleOut = Sharding.temperatureMix(single).collect()
    assert(singleOut.length == 2 &&
      singleOut.forall(_.getAs[Double]("sample_frac") == 1.0))
    val withNull = Seq((1L, "a b c", "en"), (2L, "d e", null),
        (3L, "f g h i j k l m n o p q r s t u v w x y z a b c d e f", "en"))
      .toDF("doc_id", "text", "lang")
    val nullKept = Sharding.temperatureMix(withNull)
      .where(col("lang").isNull).collect()
    // the null stratum is the SMALLEST (2 tokens) → frac 1, kept whole
    assert(nullKept.length == 1 &&
      nullKept.head.getAs[Double]("sample_frac") == 1.0,
      s"null-stratum doc dropped or downsampled: ${nullKept.toSeq}")
    // as-of read: v before every version is empty, v past every
    // version equals the current rows — no throw at either extreme
    val hist = Sharding.pipelineScd2(spark, Sf)
    assert(Sharding.asOfRead(hist, -1L).count() == 0L)
    val current = hist.where(col("is_current")).count()
    assert(Sharding.asOfRead(hist, Long.MaxValue).count() == current)
    // IVF balance: empty corpus answers empty (no throw); a single
    // label is one cell at load factor exactly 1.0, not hot
    val emptyEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.ivfBalance(emptyEmb).count() == 0L)
    val oneLabel = Tables.embeddings(spark, Sf)
      .withColumn("label", lit(0))
    val ob = Similarity.ivfBalance(oneLabel).collect()
    assert(ob.length == 1 && ob.head.getAs[Double]("load_factor") == 1.0
      && !ob.head.getAs[Boolean]("is_hot"))
    // SQ8 on a corpus with a CONSTANT dimension: the dead dim's step is
    // 0, codes are 0, decode returns its min — roundtrip exact, kernel
    // parity holds (the IF(st <= 0D) guard)
    val deadDim = Seq(
      (1L, Array(1.0f, 0.5f, 0.25f, 0.5f, 1.0f, 2.0f, 3.0f, 0.125f)),
      (2L, Array(1.0f, 0.75f, 0.5f, 0.25f, 2.0f, 1.0f, 0.5f, 0.25f)),
      (3L, Array(1.0f, 0.25f, 1.0f, 0.75f, 3.0f, 0.5f, 2.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val (mn8, st8) = Similarity.sq8FitRanges(deadDim)
    assert(st8.head == 0.0, "constant dim must fit step 0")
    val dec = Similarity.sq8Decode(
      Similarity.sq8Encode(deadDim, mn8, st8), mn8, st8)
    val firstCoord = dec.select(element_at(col("recon"), 1)).collect()
    assert(firstCoord.forall(_.getDouble(0) == 1.0),
      "dead dim must decode to its min")
    val parity = dec.crossJoin(
        deadDim.where(col("vec_id") === 1L)
          .select(col("embedding").as("q_emb")))
      .select(
        graft.functions.VectorFunctions.sq8L2sq(
          col("q_emb"), col("packed"), mn8.toArray, st8.toArray)
          .as("kern"),
        graft.functions.VectorFunctions.l2sq(col("q_emb"), col("recon"))
          .as("hof"))
      .where(col("kern") =!= col("hof")).count()
    assert(parity == 0L, "kernel diverges from decode path on dead dims")
  }

  test("sq8 encode: whole-null embedding packs to NULL, never zero codes") {
    import spark.implicits._
    import graft.operators.Similarity
    // round-19 verdict nit: the inline pack rewrite made greatest()
    // swallow the null (greatest(0L, NULL) = 0) so a null embedding
    // encoded as an all-zero vector — indistinguishable from a real
    // all-min vector downstream. The contract is null-in → null-out.
    val rows = Seq(
      (1L, Option(Array(1.0f, 0.5f, 0.25f, 0.5f, 1.0f, 2.0f, 3.0f, 0.125f))),
      (2L, Option.empty[Array[Float]])
    ).toDF("vec_id", "embedding")
    val mn = Seq.fill(8)(0.0)
    val st = Seq.fill(8)(0.01)
    val got = Similarity.sq8Encode(rows, mn, st)
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!got(1L), "non-null embedding must pack to non-null codes")
    assert(got(2L), "null embedding must pack to NULL, not zero codes")
  }
}
