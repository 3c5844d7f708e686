package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Structured Streaming plans run against the events parquet through a
  * memory sink and must agree with the batch forms. */
class StreamingSpec extends SparkSpec {

  test("streaming window agg matches the batch window agg") {
    val q = EventStreams.windowAgg(EventStreams.eventStream(spark, Sf))
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("win_agg")
      .select(col("w_start"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.operators.Events.streamWindowAgg(spark, Sf)
      .select(col("w_start"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState running spend matches batch totals") {
    val q = EventStreams.runningSpend(EventStreams.eventStream(spark, Sf))
      .writeStream.format("memory").queryName("spend")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val finalPerUser = spark.table("spend")
      .groupBy(col("user_id"))
      .agg(max(col("n_purchases")).as("n"), max(col("total_spend")).as("total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val batch = Tables.events(spark, Sf)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(finalPerUser.keySet == batch.keySet)
    finalPerUser.foreach { case (u, (n, total)) =>
      assert(n == batch(u)._1, s"user $u purchase count")
      assert(math.abs(total - batch(u)._2) < 1e-6, s"user $u total spend")
    }
  }

  test("streaming dedup collapses duplicated events") {
    // duplicate every row inside the stream (same batch): a watermark
    // dedup must always collapse these; cross-batch late duplicates are
    // allowed through by the watermark contract and aren't asserted
    val doubled = EventStreams.eventStream(spark, Sf)
      .withColumn("_copy", explode(array(lit(1), lit(2))))
      .drop("_copy")
    val q = EventStreams.dedupStream(doubled)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dedup_stream").count()
    assert(got == Tables.events(spark, Sf).count(),
      "every event must survive exactly once")
  }

  test("streaming near-dedup collapses near-exact repeats, keeps distinct docs") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_nds").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // doc 2 is doc 1 under case + whitespace noise — same MinHash
    // signature by the kernel's normalization (PropertySpec), so the
    // single-band collapse is deterministic; higher-Jaccard-but-
    // shingle-changing edits fire with probability J^8 instead
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "The  quick BROWN fox jumps  over the lazy  dog again and AGAIN"),
      (3L, "a completely different document about distributed query engines"),
      (4L, "numbers and tables and joins are the heart of analytics work")
    ).toDF("doc_id", "text").withColumn("ts", lit(ts))
    docs.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$base/in")
    val q = EventStreams.nearDedupStream(stream)
      .writeStream.format("memory").queryName("near_dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("near_dedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.intersect(Set(1L, 2L)).size == 1,
      s"near-exact pair must collapse to one survivor, kept=$kept")
    assert(kept.contains(3L) && kept.contains(4L), s"distinct docs dropped: $kept")
  }

  test("streaming embedding near-dedup collapses re-ingested vectors, keeps distinct ones") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_eds").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rng = new scala.util.Random(7)
    val v1 = Array.fill(64)(rng.nextGaussian().toFloat)
    // vec 2 = vec 1 under float-noise perturbation (1e-6 — every
    // projection sign agrees), vec 3 an unrelated direction
    val v2 = v1.map(x => x + 1e-6f)
    val v3 = Array.fill(64)(rng.nextGaussian().toFloat)
    val vecs = Seq((1L, v1), (2L, v2), (3L, v3))
      .toDF("vec_id", "embedding").withColumn("ts", lit(ts))
    vecs.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(vecs.schema).parquet(s"$base/in")
    val q = EventStreams.embedDedupStream(stream)
      .writeStream.format("memory").queryName("embed_dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("embed_dedup").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.intersect(Set(1L, 2L)).size == 1,
      s"perturbed twin must collapse to one survivor, kept=$kept")
    assert(kept.contains(3L), s"distinct vector dropped: $kept")
  }

  test("embedding dedup does not collapse dim-mismatched vectors into bucket 0") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_edsz").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rng = new scala.util.Random(13)
    // vectors 1/2/3 are DISTINCT but arrive at dim 32 while the stream
    // is keyed for dim 64: the hyperplane kernel codes them all 0, so an
    // unguarded key would keep one and silently drop the other two
    val shortVecs = (1L to 3L).map(i =>
      (i, Array.fill(32)(rng.nextGaussian().toFloat)))
    // vector 4 is a well-formed dim-64 row that must flow through too
    val ok = Seq((4L, Array.fill(64)(rng.nextGaussian().toFloat)))
    val vecs = (shortVecs ++ ok)
      .toDF("vec_id", "embedding").withColumn("ts", lit(ts))
    vecs.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(vecs.schema).parquet(s"$base/in")
    val q = EventStreams.embedDedupStream(stream)
      .writeStream.format("memory").queryName("embed_dedup_sz")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("embed_dedup_sz").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L),
      s"dim-mismatched vectors must not dedupe against each other: $kept")
  }

  test("source budget admits greedily per source and stops at the quota") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_budget").toString
    // srcA: 3 docs x 4 tokens (quota 10 admits 2); srcB: 1 doc x 6
    val docs = Seq(
      (1L, "a b c d", "srcA"), (2L, "e f g h", "srcA"),
      (3L, "i j k l", "srcA"), (4L, "m n o p q r", "srcB")
    ).toDF("doc_id", "text", "source")
    docs.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$base/in")
    val q = EventStreams.sourceBudget(stream, quota = 10L)
      .writeStream.format("memory").queryName("source_budget")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("source_budget").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // srcA admitted two docs (8 <= 10, third would hit 12), srcB fits
    assert(out.keySet.intersect(Set(1L, 2L, 3L)).size == 2,
      s"srcA must admit exactly 2 docs: $out")
    assert(!out.contains(3L) || !out.contains(2L) || !out.contains(1L))
    assert(out.contains(4L), "srcB under quota must be admitted")
    val aCum = out.filterKeys(Set(1L, 2L, 3L)).values.max
    assert(aCum <= 10L, s"srcA cumulative $aCum exceeds quota")
  }

  test("source budget under tokens=bpe counts tokenizer-true tokens and flips the cutoff") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_budget_bpe").toString
    // fit a tiny merge table on a corpus sharing no characters with
    // the planted docs, so their BPE token count is their char count
    val fit = Seq((1L, "the cat sat on the mat the cat sat on the mat"))
      .toDF("doc_id", "text")
    graft.operators.Pretrain.bpeMerges(fit, spark)
      .write.mode("overwrite").parquet(s"$base/model")
    // doc 1 is ONE whitespace word but EIGHT tokenizer tokens — the
    // exact wrongness of a word-counted cutoff on a no-space script
    val docs = Seq(
      (1L, "xxxxxxxx", "srcA"),
      (2L, "q w z", "srcA"),
      (3L, "q w z q", "srcB")).toDF("doc_id", "text", "source")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$base/in")
    def run(tokens: String, name: String): Map[Long, Long] = {
      val stream = spark.readStream.schema(docs.schema).parquet(s"$base/in")
      val q = EventStreams.sourceBudget(stream, quota = 5L, tokens = tokens)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> n_tokens
    }
    // whitespace mode admits everything (srcA: 1 + 3 = 4 ≤ 5)
    val words = run("", "budget_words")
    assert(words.keySet == Set(1L, 2L, 3L), s"words mode: $words")
    // tokenizer-true mode rejects the no-space doc (8 > 5), which in
    // turn leaves room for doc 2 — the cutoff POINT moved, not just a
    // count column
    val bpe = run(s"bpe:$base/model", "budget_bpe")
    assert(bpe.keySet == Set(2L, 3L), s"bpe mode: $bpe")
    // batch parity: the stream's per-doc counts equal the batch
    // packing knob's (same kernel, same broadcast codec discipline)
    val batch = graft.operators.Pretrain
      .bpeTokenCounts(docs, s"$base/model", spark)
      .select("doc_id", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    bpe.foreach { case (id, n) =>
      assert(n == batch(id), s"doc $id: stream $n != batch ${batch(id)}")
    }
  }

  test("streaming ingest gate filters low-quality and contaminated docs statelessly") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(0L)
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val good = "the quick brown fox jumps over the lazy dog and keeps on running to the hills"
    val evalText = "benchmark question eight gram overlap detection target phrase continues here today"
    val docs = Seq(
      (1L, good),                                  // clean → admitted
      (2L, "1 2 3 4 5 6 7 8 9 10 11 12"),          // numeric junk → dropped
      (3L, s"lead in words $evalText")             // contaminated → dropped
    ).toDF("doc_id", "text").withColumn("ts", lit(ts))
    docs.write.mode("overwrite").parquet(s"$base/in")
    val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$base/in")
    val q = EventStreams.ingestGate(stream, evalDocs)
      .writeStream.format("memory").queryName("ingest_gate")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("ingest_gate").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"expected only the clean doc, kept=$kept")
    // plan hygiene: the eval grams must ride as a broadcast handle, not
    // a plan literal — plan size must stay O(1) in the eval-suite size
    val gated = EventStreams.ingestGate(stream, evalDocs)
    val analyzed = gated.queryExecution.analyzed
    val gramLiterals = analyzed.expressions.flatMap(_.collect {
      case l: org.apache.spark.sql.catalyst.expressions.Literal
        if l.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] => l
    })
    assert(gramLiterals.isEmpty,
      s"eval grams inlined as plan literal(s): $gramLiterals")
    assert(analyzed.expressions.exists(_.collectFirst {
      case e: graft.functions.AnyLongInBroadcast => e
    }.isDefined), "broadcast-set membership kernel missing from the plan")
  }

  test("streaming image dedup drops rotated/re-encoded twins, keeps distinct images") {
    import spark.implicits._
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // NOT epoch 0: dropDuplicatesWithinWatermark's initial watermark is
    // 0 ms, and rows at eventTime <= it are silently suppressed as late
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val base = java.nio.file.Files.createTempDirectory("graft_imgdedup").toString
    val blobs = Seq(
      (1L, png((x, _) => if (x < 32) 0x000000 else 0xffffff)),     // original
      (2L, png((_, y) => if (y < 32) 0x000000 else 0xffffff)),     // 90° twin
      (3L, png((x, _) => if (x < 32) 0x202020 else 0xe0e0e0)),     // dim twin
      (4L, png((x, y) => if (x + y < 64) 0x000000 else 0xffffff)), // distinct
      (5L, "not an image".getBytes("UTF-8")),                      // passthrough
      (6L, "not an image".getBytes("UTF-8")),                      // exact repeat
      (7L, "another non-image".getBytes("UTF-8"))
    ).toDF("doc_id", "blob").withColumn("ts", lit(ts))
    blobs.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(blobs.schema).parquet(s"$base/in")
    val gated = EventStreams.imageDedupStream(stream)
    // plan hygiene: the codec rides the native expression, not a UDF
    assert(!gated.queryExecution.analyzed.toString.contains("UDF"),
      "image hash left the declarative plan")
    val q = gated.writeStream.format("memory").queryName("img_dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("img_dedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // one survivor among {1,2,3} (identical canonical hash — order
    // within a micro-batch is not contractual), 4 kept (distinct),
    // one survivor among the byte-identical {5,6}, 7 kept
    assert(kept.intersect(Set(1L, 2L, 3L)).size == 1,
      s"twins must collapse to one survivor: $kept")
    assert(kept.contains(4L), s"distinct image dropped: $kept")
    assert(kept.intersect(Set(5L, 6L)).size == 1,
      s"byte-identical non-images must collapse: $kept")
    assert(kept.contains(7L), s"distinct non-image dropped: $kept")
    // batch parity on the canonical hash: the stream's survivor set
    // keys exactly like the batch phash table
    val ph = graft.operators.Multimodal.imagePhashes(blobs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ph(1L) == ph(2L) && ph(1L) == ph(3L) && ph(1L) != ph(4L),
      s"batch hashes disagree with the stream's collapse: $ph")
  }

  test("streaming video dedup drops frame-reordered cuts, keeps distinct clips") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def frame(): Array[Byte] = { val b = new Array[Byte](64); rnd.nextBytes(b); b }
    val (f1, f2, f3, f4) = (frame(), frame(), frame(), frame())
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val base = java.nio.file.Files.createTempDirectory("graft_viddedup").toString
    val blobs = Seq(
      (1L, f1 ++ f2 ++ f3),            // original clip
      (2L, f1 ++ f2 ++ f3),            // byte-identical re-ingest
      (3L, f3 ++ f1 ++ f2),            // frame-REORDERED cut: same set
      (4L, f4 ++ f2 ++ f3),            // distinct clip (new frame)
      (5L, Array.empty[Byte]),         // empty blob passthrough
      (6L, Array.empty[Byte])          // exact empty repeat
    ).toDF("doc_id", "blob").withColumn("ts", lit(ts))
    blobs.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(blobs.schema).parquet(s"$base/in")
    val gated = EventStreams.videoDedupStream(stream)
    assert(!gated.queryExecution.analyzed.toString.contains("UDF"),
      "frame hashing left the declarative plan")
    val q = gated.writeStream.format("memory").queryName("vid_dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("vid_dedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.intersect(Set(1L, 2L, 3L)).size == 1,
      s"same-frame-set clips must collapse to one survivor: $kept")
    assert(kept.contains(4L), s"distinct clip dropped: $kept")
    assert(kept.intersect(Set(5L, 6L)).size == 1,
      s"empty blobs must collapse to one survivor: $kept")
    // batch parity: the stream's key IS the min of the batch
    // frame-signature table — the two planes cannot drift
    val mins = graft.operators.Multimodal.frameSignatures(blobs)
      .groupBy(col("doc_id"))
      .agg(org.apache.spark.sql.functions.min(col("sh")).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mins(1L) == mins(2L) && mins(1L) == mins(3L) &&
      mins(1L) != mins(4L),
      s"batch min frame hash disagrees with the stream's collapse: $mins")
  }

  test("streaming DSIR gate admits against persisted weights, matches the batch twin") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_dsirgate").toString
    val fit = ((1 to 20).map(i => (i.toLong, "the cat sat on the mat", "en")) ++
      (21 to 40).map(i => (i.toLong, "der hund lief durch den wald", "de")))
      .toDF("doc_id", "text", "lang")
    graft.operators.Pretrain.fitDsirWeights(fit)
      .write.mode("overwrite").parquet(s"$base/weights")
    val in = Seq(
      (101L, "the cat sat on the mat", "en"),   // target-like → admitted
      (102L, "der hund lief durch den wald", "de"), // off-target → dropped
      (103L, "x", "en"))                        // no bigram evidence → dropped
      .toDF("doc_id", "text", "lang")
    in.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(in.schema).parquet(s"$base/in")
    val q = EventStreams.dsirGateStream(stream, s"$base/weights",
      s"$base/out", s"$base/ckpt", minLogweight = 0.0)
    try q.processAllAvailable() finally q.stop()
    val admitted = spark.read.parquet(s"$base/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(101L), s"expected only the target-like doc: $admitted")
    // online/offline can't drift: the batch twin on the same weights
    val w = spark.read.parquet(s"$base/weights")
    val batchAdmit = graft.operators.Pretrain.scoreDsir(in, w)
      .where(round(col("lw"), 6).cast("double") >= 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == batchAdmit, s"stream $admitted != batch $batchAdmit")
  }

  test("foreachBatch sink lands every event exactly once, idempotently") {
    val base = java.nio.file.Files.createTempDirectory("graft_febs").toString
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val dedup = EventStreams.dedupStream(EventStreams.eventStream(spark, Sf))
    val q = EventStreams.foreachBatchSink(dedup, out, ckpt)
    try q.processAllAvailable() finally q.stop()
    val landed = spark.read.parquet(s"$out/batch_id=*")
    assert(landed.count() == Tables.events(spark, Sf).count())
    // restart from the same checkpoint with no new input: no batch
    // replays, nothing duplicates — the committed offsets hold
    val q2 = EventStreams.foreachBatchSink(
      EventStreams.dedupStream(EventStreams.eventStream(spark, Sf)), out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$out/batch_id=*").count() ==
      Tables.events(spark, Sf).count(), "restart duplicated rows")
  }

  test("stream-stream click-after-view join matches the batch join") {
    val q = EventStreams.clickAfterView(EventStreams.eventStream(spark, Sf))
      .writeStream.format("memory").queryName("cav")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("cav")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      .toSet
    val e = Tables.events(spark, Sf)
    val batch = e.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
      .join(e.where(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("click_ts")),
        col("user_id") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("view_ts"), col("click_ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      .toSet
    assert(streamed == batch,
      s"stream join must equal batch join: ${streamed.size} vs ${batch.size} pairs")
    assert(batch.nonEmpty, "corpus must exercise the join")
  }

  test("streaming sessionization produces bounded sane sessions") {
    val q = EventStreams.sessionize(EventStreams.eventStream(spark, Sf))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("sessions").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (start, end) = (r.getTimestamp(1), r.getTimestamp(2))
      assert(!end.before(start))
      assert(r.getLong(3) >= 1)
    }
    val nEvents = rows.map(_.getLong(3)).sum
    assert(nEvents == Tables.events(spark, Sf).count())
  }

  test("streaming ANN ingest survives a concurrent compact: batches wait, none fail, none lost") {
    val emb = Tables.embeddings(spark, Sf)
    val standing = emb.where(col("vec_id") % 2 === 0)
    val arriving = emb.where(col("vec_id") % 2 =!= 0)
      .select("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ingest_compact").toString
    graft.operators.AnnIndex.build(spark, standing, dir, k = 16)

    // a "compact" holds the writer lock while the stream's first batch
    // arrives — the batch must WAIT (round 7 killed the stream here)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$dir/writer.lock")
    assert(fs.createNewFile(lock))

    val base = java.nio.file.Files
      .createTempDirectory("graft_ingest_compact_io").toString
    arriving.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(arriving.schema).parquet(s"$base/in")
    val q = EventStreams.annIngestStream(stream, dir, s"$base/ckpt")
    try {
      // the micro-batch is inside the bounded lock wait: still alive,
      // no exception, nothing committed yet
      Thread.sleep(3000)
      assert(q.isActive, "stream died while a compact held the writer lock")
      assert(q.exception.isEmpty,
        s"micro-batch failed under the lock: ${q.exception}")
      fs.delete(lock, false)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"batch failed after lock release: ${q.exception}")
    } finally q.stop()

    // zero lost appends: the stream-grown index holds every vector
    val got = graft.operators.AnnIndex.liveRows(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val want = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == want,
      s"lost appends across the compact: missing ${(want -- got).take(5)}")
  }

  test("streaming stats ingest: N micro-batches equal one batch append") {
    import spark.implicits._
    import graft.operators.StatsCatalog
    val rows = (1L to 300L).map(i => (i % 30, s"payload$i"))
    val standing = rows.filter(_._1 < 10).toDF("k", "v")
    val arriving = rows.filter(_._1 >= 10)
    def fresh(tag: String): String = java.nio.file.Files
      .createTempDirectory(s"graft_statstream_$tag").toString
    val streamCat = fresh("s"); val oneCat = fresh("o")
    Seq(streamCat, oneCat).foreach(c => StatsCatalog.build(spark, c,
      Seq(StatsCatalog.Leg(standing, "t", "k"))))
    // reference: the whole drop folded as ONE batch append
    StatsCatalog.append(spark, oneCat, arriving.toDF("k", "v"), "t", "k")
    // same drop as THREE micro-batches through the stream — per-key
    // subtotals sum, so the merged catalog must be advice-identical
    // (keys deliberately straddle batch boundaries: 100-row slices of
    // a 20-key tail re-mention every key in every slice)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = graft.streaming.EventStreams.statsIngestStream(
      ms.toDF().toDF("k", "v"), streamCat, "t", "k", fresh("ckpt"))
    try {
      arriving.grouped(100).foreach { slice =>
        ms.addData(slice)
        q.processAllAvailable()
      }
      assert(q.exception.isEmpty, s"stats ingest stream failed: ${q.exception}")
    } finally q.stop()
    def red(c: String) = StatsCatalog.reducedStats(spark, c)
      .orderBy("rel", "keycol").collect().map(_.toSeq).toSeq
    assert(red(streamCat) == red(oneCat),
      "streamed per-key deltas must merge to the one-batch append")
    // and the streamed catalog answers the same advice
    assert(StatsCatalog.advice(spark, streamCat).collect().map(_.toSeq).toSeq
      == StatsCatalog.advice(spark, oneCat).collect().map(_.toSeq).toSeq)
  }

  test("streaming BM25 ingest: N micro-batches equal one-shot build, REPL-observable") {
    import spark.implicits._
    import graft.operators.{Bm25Index, TextAnalysis}
    // distinct docs with enough term overlap that df/N/avgdl all move
    // with every batch — a stats-row or posting-loss regression flips
    // scores, not just row counts
    val all: Seq[(Long, String)] = (1L to 60L).map(i =>
      (i, s"doc $i mentions vector things and stream shard${i % 7} " +
        s"window payload token$i ${"filler " * (i % 5).toInt}"))
    val (standing, arriving) = all.splitAt(20)
    def fresh(tag: String): String = java.nio.file.Files
      .createTempDirectory(s"graft_bm25stream_$tag").toString
    val streamed = fresh("s"); val oneShot = fresh("o")
    Bm25Index.build(spark, standing.toDF("doc_id", "text"), streamed)
    Bm25Index.build(spark, all.toDF("doc_id", "text"), oneShot)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = graft.streaming.EventStreams.bm25IngestStream(
      ms.toDF().toDF("doc_id", "text"), streamed, fresh("ckpt"))
    try {
      arriving.grouped(15).foreach { slice =>
        ms.addData(slice)
        q.processAllAvailable()
      }
      assert(q.exception.isEmpty, s"bm25 ingest stream failed: ${q.exception}")
    } finally q.stop()
    val terms = Seq("vector", "stream", "window")
    def scores(dir: String) = Bm25Index.search(spark, dir, terms, k = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    // N micro-batches ≡ one-shot build of the union corpus...
    assert(scores(streamed) === scores(oneShot))
    // ...≡ the live corpus-scan path (the shared-scoring contract)
    assert(scores(streamed) === TextAnalysis
      .bm25Search(all.toDF("doc_id", "text"), terms, k = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq)
    // the stream-grown index is REPL-reachable: status shows the
    // appended commits, and the probe verb serves from it
    val st = Repl.eval(spark, s"index status bm25 $streamed", ".")
    assert(st.contains("version=") && st.contains("liveDataFiles="))
    assert(Repl.eval(spark,
      s"pipeline serve_bm25_probe indexDir=$streamed", Sf).nonEmpty)
  }

  test("quality gate stream admits like the batch scorer on the persisted model") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_qgate").toString
    val rng = new scala.util.Random(17)
    val good = (1L to 40L).map { i =>
      (i, s"the quick brown fox number $i jumps over the lazy dog and " +
        s"then runs to the woods in the morning light of day $i")
    }
    val bad = (101L to 140L).map { i =>
      (i, Seq.fill(20)(rng.nextInt(100000).toString).mkString(" "))
    }
    val docs = (good ++ bad).toDF("doc_id", "text")
    // fit OFFLINE, persist, gate ONLINE against the directory
    val (w, b) = graft.operators.QualityModel.fitQualityLr(docs, perClass = 100)
    graft.operators.QualityModel.saveModel(w, b, s"$base/model")
    docs.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$base/in")
    val q = EventStreams.qualityGateStream(stream, s"$base/model",
      s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val admitted = spark.read.parquet(s"$base/out/batch_id=*")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // online/offline parity on the persisted model
    val (w2, b2) = graft.operators.QualityModel.loadModel(spark, s"$base/model")
    val batchAdmitted = graft.operators.QualityModel.scoreQuality(docs, w2, b2)
      .where(col("q_score") >= 0.5).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admitted == batchAdmitted, s"stream $admitted != batch $batchAdmitted")
    // and the gate actually separates: every good doc in, gibberish out
    assert(good.map(_._1).toSet.subsetOf(admitted), "good docs rejected")
    assert(bad.map(_._1).toSet.intersect(admitted).isEmpty, "gibberish admitted")
  }

  test("anomaly gate stream alerts like the batch twin on the same baseline") {
    // ... even when the planted burst DAY is fragmented across 3
    // micro-batches: the gate's watermarked daily window must
    // accumulate the fragments in state and score the CLOSED day once
    // with the full count — per-batch scoring would see three
    // sub-threshold fragments and never alert (the round-11 caveat,
    // now composed into the operator instead of documented).
    val base = java.nio.file.Files.createTempDirectory("graft_anom").toString
    val ev = Tables.events(spark, Sf)
    EventStreams.fitAnomalyBaseline(ev)
      .write.mode("overwrite").parquet(s"$base/baseline")
    import spark.implicits._
    val corpus: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)] = ev.select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .collect().toSeq.map(r => (r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
    val burst: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)] = Seq.tabulate(5000) { i =>
      (9000000L + i, java.sql.Timestamp.valueOf("2024-06-15 12:00:00"),
        1L, "view", 1.0, "{}")
    }
    // a lone far-future event advances the watermark past every real
    // day so all of them close; its own day stays open and unscored
    val sentinel = (9999999L,
      java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 1L, "view", 1.0, "{}")
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)](spark)
    val stream = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStreams.anomalyGateStream(stream, s"$base/baseline",
      s"$base/out", s"$base/ckpt")
    try {
      val slices = burst.grouped(2000).toSeq // 2000 + 2000 + 1000
      assert(slices.size == 3)
      ms.addData(corpus ++ slices(0)); q.processAllAvailable()
      ms.addData(slices(1)); q.processAllAvailable()
      ms.addData(slices(2)); q.processAllAvailable()
      ms.addData(Seq(sentinel)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$base/out/batch_id=*")
      .select("event_type", "day", "cnt").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    // the burst day alert carries the FULL day count across all 3
    // fragments (plus any corpus events on that day — none at this SF)
    assert(streamed.exists { case (t, d, c) =>
      t == "view" && d.toString.startsWith("2024-06-15") && c == 5000L },
      s"fragmented burst day not alerted at full count: $streamed")
    // online/offline parity: batch twin over the same events (sans the
    // never-closed sentinel day) on the same baseline
    val batchIn = (corpus ++ burst).toSeq
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batch = EventStreams.scoreAnomaly(batchIn,
      spark.read.parquet(s"$base/baseline"))
      .select("event_type", "day", "cnt").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
  }

  test("streaming audio dedup drops re-mastered twins, keeps distinct clips") {
    import spark.implicits._
    def wav(f: Int => Int): Array[Byte] = {
      val n = 65536
      val bb = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(8000)
        .putShort(1).putShort(8)
        .put("data".getBytes("US-ASCII")).putInt(n)
      bb.array() ++ Array.tabulate(n)(i => f(i).toByte)
    }
    def burst(amp: Int)(i: Int): Int = {
      val a = if ((i / 1024) % 2 == 0) amp else amp / 10
      128 + (a * math.sin(i / 3.0)).toInt
    }
    val orig = wav(burst(100))
    val remaster = wav(burst(40))                     // volume rescale
    val distinct = wav(i => burst(100)(i + 1024))     // opposite contour
    // preconditions the stream key relies on: identical fp for the
    // re-master, a DIFFERENT first band for the distinct contour
    val fo = graft.operators.Multimodal.audioFp64(orig).get
    assert(graft.operators.Multimodal.audioFp64(remaster).get == fo)
    val fd = graft.operators.Multimodal.audioFp64(distinct).get
    assert((fd & 0xffffL) != (fo & 0xffffL),
      f"planted contours share a band — pick another contour: $fo%016x $fd%016x")
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val base = java.nio.file.Files.createTempDirectory("graft_auddedup").toString
    val blobs = Seq(
      (1L, orig), (2L, remaster), (3L, distinct),
      (4L, "not audio".getBytes("UTF-8")),
      (5L, "not audio".getBytes("UTF-8")),            // exact byte repeat
      (6L, "другой blob".getBytes("UTF-8"))
    ).toDF("doc_id", "blob").withColumn("ts", lit(ts))
    blobs.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(blobs.schema).parquet(s"$base/in")
    val gated = EventStreams.audioDedupStream(stream)
    assert(!gated.queryExecution.analyzed.toString.contains("UDF"),
      "audio fingerprint left the declarative plan")
    val q = gated.writeStream.format("memory").queryName("aud_dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("aud_dedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.intersect(Set(1L, 2L)).size == 1,
      s"re-mastered twin must collapse to one survivor: $kept")
    assert(kept.contains(3L), s"distinct clip dropped: $kept")
    assert(kept.intersect(Set(4L, 5L)).size == 1,
      s"byte-identical non-audio must collapse: $kept")
    assert(kept.contains(6L), s"distinct non-audio dropped: $kept")
  }
}
