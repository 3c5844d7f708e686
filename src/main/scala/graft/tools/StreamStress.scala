package graft.tools

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Dev tool: throughput + bounded-state evidence for the streaming
  * ingest path (SURVEY.md §6): ingestGate (stateless quality +
  * contamination admission) → nearDedupStream (watermarked MinHash-band
  * dedup) over a 10× replica of the sf0.1 documents with synthetic
  * event time — 1 doc/second, ~14 h of stream, 2 h watermark.
  *
  * The input lands as `slices` sequential time-ordered parquet files
  * read with maxFilesPerTrigger=1, so the watermark ADVANCES across
  * micro-batches and state eviction actually runs (a single batch would
  * never evict — processAllAvailable would finish before the watermark
  * moves). Checks:
  *   - rows/sec over the whole pipeline (gate + dedup + state store);
  *   - final state rows ≤ rows inside (watermark + one-batch lag) —
  *     state is f(watermark), NOT f(stream length): a 10× longer
  *     stream holds the same state;
  *   - peak state rows never approach the input row count.
  * `sbt "runMain graft.tools.StreamStress [factor] [slices]"`.
  *
  * Extra modes (round-17 verdict ask #7 — the 100× legs):
  *   `serve [factor]`  — index-serving streams (ANN probe, text ingest)
  *   `budget [factor]` — per-source token-budget gate state at factor×
  *   `join [slices]`   — stream-stream join (clickAfterView) over the
  *                       sf10 events corpus, watermark-bounded state
  * The default dedup leg at `100 50` is the third 100× leg. */
object StreamStress {

  /** All modes build through here: raise the progress-retention window
    * far above any leg's micro-batch count — `q.recentProgress` keeps
    * only the last ~100 updates by default, so a 100+-slice leg could
    * silently under-observe its true state peak (ADVICE r18). The
    * empty-progress case is guarded at each check site (clean FAIL,
    * not a NoSuchElementException out of `.max`). */
  private def stressSession(): org.apache.spark.sql.SparkSession = {
    val s = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    s.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    s
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("serve")) {
      serve(args.lift(1).map(_.toInt).getOrElse(10))
      return
    }
    if (args.headOption.contains("budget")) {
      budget(args.lift(1).map(_.toInt).getOrElse(100))
      return
    }
    if (args.headOption.contains("join")) {
      join(args.lift(1).map(_.toInt).getOrElse(100))
      return
    }
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val slices = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = stressSession()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val base = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val inDir = s"$base/in"

    // 10× docs, clone text salted (un-salted clones are mutual near-dups
    // by construction and the dedup rate stops meaning anything), event
    // time = 1 doc/second in doc order.
    val docs = graft.Tables.documents(spark, src)
    val copies = spark.range(factor.toLong).select(col("id").as("_copy"))
    val scaled = docs.crossJoin(copies)
      .withColumn("doc_id", col("doc_id") + col("_copy") * 100000000L)
      .withColumn("text",
        when(col("_copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" salt"), col("doc_id"))))
      .drop("_copy")
      .withColumn("_idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))) - 1)
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("_idx")))
    val total = scaled.count()
    val sliceRows = (total + slices - 1) / slices
    // sequential single-file writes: file mod-times order the stream the
    // same way event time does, so each micro-batch is one time slice
    (0 until slices).foreach { i =>
      scaled.where(col("_idx") >= i * sliceRows && col("_idx") < (i + 1) * sliceRows)
        .drop("_idx").coalesce(1)
        .write.mode("append").parquet(inDir)
    }
    println(s"input: $total docs over ${total}s of event time, $slices slices")

    val evalDocs = graft.Tables.documents(spark, "/root/testdata/sf0.01").limit(100)
    val stream = spark.readStream.schema(
        spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val piped = EventStreams.nearDedupStream(
      EventStreams.ingestGate(stream, evalDocs))
    val t0 = System.nanoTime()
    val q = piped.writeStream.format("noop")
      .option("checkpointLocation", s"$base/ckpt").start()
    try q.processAllAvailable() finally q.stop()
    val wallSec = (System.nanoTime() - t0) / 1e9

    val progress = q.recentProgress.toSeq
    val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
    val admitted = progress.map(_.sink.numOutputRows).filter(_ >= 0).sum
    println(f"wall ${wallSec}%.1f s  throughput ${total / wallSec}%.0f rows/sec " +
      f"(input) / ${admitted / wallSec}%.0f rows/sec (admitted past gate)")
    println(s"state rows per batch: ${stateRows.mkString(", ")}")

    def check(name: String, ok: Boolean): Unit = {
      println(s"${if (ok) "PASS" else "FAIL"}  $name")
      if (!ok) sys.exit(1)
    }
    // watermark bound: state holds ≤ (2 h watermark + one slice of lag —
    // the watermark only advances at batch boundaries) of admitted rows
    val bound = 2 * 3600 + sliceRows
    check(s"captured streaming progress (${stateRows.size} state samples)",
      stateRows.nonEmpty)
    check(s"final state ${stateRows.last} ≤ watermark+lag bound $bound",
      stateRows.last <= bound)
    check(s"peak state ${stateRows.max} ≤ bound $bound (never stream-length-shaped)",
      stateRows.max <= bound)
    check(s"state is a small fraction of input (${stateRows.max} < ${total / 3})",
      stateRows.max < total / 3)
    spark.stop()
  }

  /** `serve` mode: evidence for the INDEX-SERVING streaming paths at
    * scale — annProbeStream querying a persisted IVF index built over
    * factor× embeddings (each micro-batch pays only its probed cell
    * directories), and textIngestStream admitting document batches
    * against a persisted MinHash index that GROWS across micro-batches
    * (batch i+1's repeats of batch i's fresh docs must be rejected).
    * `sbt "runMain graft.tools.StreamStress serve [factor]"`. */
  def serve(factor: Int): Unit = {
    val spark = stressSession()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{AnnIndex, TextIndex}
    def check(name: String, ok: Boolean): Unit = {
      println(s"${if (ok) "PASS" else "FAIL"}  $name")
      if (!ok) sys.exit(1)
    }
    val base = java.nio.file.Files.createTempDirectory("graft_serve").toString

    // ---- ANN probe serving over a factor× index ----
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val copies = spark.range(factor.toLong).select(col("id").as("_copy"))
    val scaled = emb.crossJoin(copies)
      .withColumn("vec_id", col("vec_id") + col("_copy") * 100000000L)
      .drop("_copy").repartition(32)
    val n = scaled.count()
    val idxDir = s"$base/annidx"
    val t0 = System.nanoTime()
    AnnIndex.build(spark, scaled, idxDir)
    println(f"ANN index: $n vectors, built in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val nBatches = 5
    val qPerBatch = 20
    (0 until nBatches).foreach { i =>
      emb.where(col("vec_id") < qPerBatch)
        .select((col("vec_id") + i * 1000L).as("q_id"),
          col("embedding").as("q_emb"))
        .coalesce(1).write.mode("append").parquet(s"$base/qin")
    }
    val qStream = spark.readStream
      .schema(spark.read.parquet(s"$base/qin").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/qin")
    val t1 = System.nanoTime()
    val pq = graft.streaming.EventStreams.annProbeStream(
      qStream, idxDir, s"$base/qout", s"$base/qckpt")
    try pq.processAllAvailable() finally pq.stop()
    val probeWall = (System.nanoTime() - t1) / 1e9
    val served = spark.read.parquet(s"$base/qout")
    val answered = served.select("q_id").distinct().count()
    println(f"probe serving: ${nBatches * qPerBatch} queries in $probeWall%.1f s " +
      f"(${nBatches * qPerBatch / probeWall}%.1f q/s) against $n vectors")
    check(s"every streamed query answered with a full top-k " +
      s"($answered of ${nBatches * qPerBatch})",
      answered == nBatches * qPerBatch &&
        served.count() == nBatches * qPerBatch * 10L)

    // ---- text ingest with a growing index ----
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val tIdx = s"$base/textidx"
    TextIndex.build(spark, docs, tIdx)
    // batch i = 100 fresh docs + batch i−1's fresh docs re-sent: only
    // the fresh half may admit once the index has absorbed batch i−1.
    // Every token carries (wave, doc, position) so distinct fresh docs
    // share NO shingle (they must not in-batch collapse as near-dups);
    // an exact re-send still collides on every band.
    def fresh(i: Int) = spark.range(100)
      .select((lit(500000000L + i * 1000L) + col("id")).as("doc_id"),
        array_join(transform(sequence(lit(0), lit(24)),
          j => concat(lit(s"w${i}d"), col("id"), lit("t"), j)), " ")
          .as("text"))
    (0 until nBatches).foreach { i =>
      val b = if (i == 0) fresh(0)
              else fresh(i).unionByName(fresh(i - 1))
      b.coalesce(1).write.mode("append").parquet(s"$base/din")
    }
    val dStream = spark.readStream
      .schema(spark.read.parquet(s"$base/din").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/din")
    val t2 = System.nanoTime()
    val tq = graft.streaming.EventStreams.textIngestStream(
      dStream, tIdx, s"$base/dout", s"$base/dckpt")
    try tq.processAllAvailable() finally tq.stop()
    val ingestWall = (System.nanoTime() - t2) / 1e9
    val admitted = spark.read.parquet(s"$base/dout")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    println(f"text ingest: ${nBatches * 100 * 2 - 100} docs in $ingestWall%.1f s, " +
      s"${admitted.size} admitted")
    check(s"every fresh doc admitted exactly once (${admitted.size} of ${nBatches * 100})",
      admitted.size == nBatches * 100)
    check("no re-sent doc admitted twice — the index grew across micro-batches",
      admitted.size == spark.read.parquet(s"$base/dout").count())
    spark.stop()
  }

  /** `budget` mode: per-source token-quota gate state at factor× — the
    * live-crawl cutoff's bounded-state proof. State per source is ONE
    * long, so the store must hold exactly #sources rows no matter how
    * long the stream runs: a 100× longer stream leaves the state store
    * byte-identical in cardinality. Also asserts the admission
    * semantics survived the scale-up: no source's admitted token total
    * exceeds the quota, and every source stops admitting once full. */
  def budget(factor: Int): Unit = {
    val spark = stressSession()
    spark.sparkContext.setLogLevel("ERROR")
    def check(name: String, ok: Boolean): Unit = {
      println(s"${if (ok) "PASS" else "FAIL"}  $name")
      if (!ok) sys.exit(1)
    }
    val base = java.nio.file.Files.createTempDirectory("graft_budget").toString
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val copies = spark.range(factor.toLong).select(col("id").as("_copy"))
    val scaled = docs.crossJoin(copies)
      .withColumn("doc_id", col("doc_id") + col("_copy") * 100000000L)
      .drop("_copy")
    val total = scaled.count()
    val nSources = scaled.select("source").distinct().count()
    val slices = 20
    // slice by doc_id mod — arrival order; the budget gate is
    // arrival-ordered and needs no event time at all (NoTimeout state)
    val sliced = scaled.withColumn("_slice",
      pmod(col("doc_id"), lit(slices.toLong)))
    (0 until slices).foreach { i =>
      sliced.where(col("_slice") === i).drop("_slice")
        .coalesce(1).write.mode("append").parquet(s"$base/in")
    }
    val quota = 50000L // trips mid-stream at every factor ≥ 10
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$base/in").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
    val t0 = System.nanoTime()
    val q = EventStreams.sourceBudget(stream, quota)
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt").start()
    try q.processAllAvailable() finally q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
    val stateBytes = progress.flatMap(_.stateOperators.map(_.memoryUsedBytes))
    val out = spark.read.parquet(s"$base/out")
    val perSource = out.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tok"), count(lit(1)).as("docs"))
    val maxTok = perSource.agg(max(col("tok"))).collect()(0).getLong(0)
    val admitted = out.count()
    println(f"input $total docs ($factor×, $slices slices), $nSources sources, " +
      f"quota $quota tokens/source: admitted $admitted docs in $wall%.1f s " +
      f"(${total / wall}%.0f rows/sec input)")
    println(s"state rows per batch: ${stateRows.mkString(", ")}")
    println(s"peak state bytes: ${if (stateBytes.isEmpty) 0L else stateBytes.max}")
    check(s"captured streaming progress (${stateRows.size} state samples)",
      stateRows.nonEmpty)
    check(s"state rows == #sources ($nSources) at every batch, " +
      s"never stream-length-shaped (peak ${stateRows.max} on $total input rows)",
      stateRows.max <= nSources)
    check(s"no source exceeds its quota (max admitted $maxTok ≤ $quota)",
      maxTok <= quota)
    check(s"the cutoff actually tripped (admitted $admitted < input $total)",
      admitted < total)
    spark.stop()
    ()
  }

  /** `join` mode: stream-stream inner join (clickAfterView — clicks
    * attributed to a view by the same user within 30 min, 2 h
    * watermarks both sides) over the FULL sf10 events corpus streamed
    * in time-ordered slices. The state stores must hold only rows
    * younger than watermark + band + one slice of lag — f(watermark ×
    * arrival rate), never f(stream length): the bound is computed from
    * the corpus' own tail-window row count, so it scales with rate and
    * stays put as the stream lengthens. */
  def join(slices: Int): Unit = {
    val spark = stressSession()
    spark.sparkContext.setLogLevel("ERROR")
    def check(name: String, ok: Boolean): Unit = {
      println(s"${if (ok) "PASS" else "FAIL"}  $name")
      if (!ok) sys.exit(1)
    }
    MakeScale.ensureScaled(spark, 100, "/root/testdata/sf0.1", "/tmp/sf10")
    val base = java.nio.file.Files.createTempDirectory("graft_ssjoin").toString
    val ev = spark.read.parquet("/tmp/sf10/events.parquet")
      .where(col("event_type").isin("view", "click"))
      .select("event_id", "user_id", "event_type", "ts", "value")
    val b = ev.agg(unix_seconds(min(col("ts"))).as("lo"),
      unix_seconds(max(col("ts"))).as("hi")).collect()(0)
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val span = hi - lo + 1
    val sliceSec = (span + slices - 1) / slices
    // time-range slices written in order: file mod-times make each
    // micro-batch one contiguous window, so both watermarks advance
    (0 until slices).foreach { i =>
      ev.where(unix_seconds(col("ts")) >= lo + i * sliceSec &&
          unix_seconds(col("ts")) < lo + (i + 1) * sliceSec)
        .coalesce(1).write.mode("append").parquet(s"$base/in")
    }
    val total = ev.count()
    println(s"input: $total view/click events over ${span}s in $slices slices " +
      s"(${sliceSec}s per slice)")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$base/in").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
    val t0 = System.nanoTime()
    val q = EventStreams.clickAfterView(stream)
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt").start()
    try q.processAllAvailable() finally q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
    val stateBytes = progress.flatMap(_.stateOperators.map(_.memoryUsedBytes))
    val attributed = spark.read.parquet(s"$base/out").count()
    // bound: rows whose ts sits inside (2 h watermark + 30 min band +
    // 2 slices of advance lag) of ANY instant — the widest window the
    // stores may retain. Rate is uniform-ish, so the corpus' densest
    // such window ≈ window_sec × (total/span) with 1.5× slack.
    val windowSec = 2 * 3600 + 30 * 60 + 2 * sliceSec
    val bound = (windowSec * total * 3L) / (span * 2L) // 1.5× uniform-rate mass
    println(f"wall $wall%.1f s  throughput ${total / wall}%.0f rows/sec; " +
      f"$attributed attributed pairs")
    println(s"state rows per batch: ${stateRows.mkString(", ")}")
    println(s"peak state bytes: ${if (stateBytes.isEmpty) 0L else stateBytes.max}")
    check(s"attribution produced pairs ($attributed > 0)", attributed > 0)
    check(s"captured streaming progress (${stateRows.size} state samples)",
      stateRows.nonEmpty)
    check(s"peak state ${stateRows.max} ≤ watermark-window bound $bound",
      stateRows.max <= bound)
    check(s"peak state is a small fraction of input (${stateRows.max} < ${total / 10})",
      stateRows.max < total / 10)
    spark.stop()
    ()
  }
}
