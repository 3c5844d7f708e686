package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Similarity}

/** Persisted IVF index lifecycle: append-equals-rebuild under a fixed
  * quantizer, and the drift signals that decide a re-fit. */
class AnnIndexSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_annidx_$tag").toString

  test("append-then-query equals rebuild-then-query under the same centroids") {
    val emb = Tables.embeddings(spark, Sf)
    // split the corpus into the standing part and an ingest batch
    val standing = emb.where(col("vec_id") % 5 =!= 0)
    val batch = emb.where(col("vec_id") % 5 === 0)
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

    // the invariant under test: assignment is a pure function of
    // (vector, centroids), so appending a batch into an existing index
    // yields the same index a wholesale rebuild over the union would —
    // pin the quantizer to make that exact (a refit would move cells)
    val centroids = AnnIndex.build(spark, standing, freshDir("fit"), k = 32)

    val incDir = freshDir("inc")
    AnnIndex.build(spark, standing, incDir,
      pinnedCentroids = Some(centroids))
    AnnIndex.append(spark, batch, incDir)

    val fullDir = freshDir("full")
    AnnIndex.build(spark, emb, fullDir, pinnedCentroids = Some(centroids))

    // identical (vec_id, cell) assignment sets...
    val incCells = spark.read.parquet(s"$incDir/cells")
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val fullCells = spark.read.parquet(s"$fullDir/cells")
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(incCells == fullCells,
      s"append diverged from rebuild: ${incCells.diff(fullCells).take(3)} / " +
        s"${fullCells.diff(incCells).take(3)}")

    // ...and identical query results
    val incRes = AnnIndex.query(spark, incDir, queries, nProbe = 8).collect().toSeq
    val fullRes = AnnIndex.query(spark, fullDir, queries, nProbe = 8).collect().toSeq
    assert(incRes == fullRes,
      s"append-then-query diverged: ${incRes.take(3)} vs ${fullRes.take(3)}")
    assert(incRes.nonEmpty, "query returned no rows")
  }

  test("streaming probe equals the batch query against the same persisted index") {
    val emb = Tables.embeddings(spark, Sf)
    val dir = freshDir("stream")
    AnnIndex.build(spark, emb, dir, k = 32)
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // the batch twin: same index, same probe budget
    val expected = AnnIndex.query(spark, dir, queries, nProbe = 8)
      .collect().toSet

    val base = freshDir("streamio")
    queries.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(queries.schema).parquet(s"$base/in")
    val q = graft.streaming.EventStreams.annProbeStream(
      stream, dir, s"$base/out", s"$base/ckpt", nProbe = 8)
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.parquet(s"$base/out").drop("batch_id")
      .collect().toSet
    assert(got == expected,
      s"streaming probe diverged from batch twin: got ${got.size} rows, " +
        s"expected ${expected.size}")
    assert(got.nonEmpty, "streaming probe returned no rows")
  }

  test("PQ append-then-query equals rebuild-then-query under pinned quantizers") {
    val emb = Tables.embeddings(spark, Sf)
    val standing = emb.where(col("vec_id") % 5 =!= 0)
    val batch = emb.where(col("vec_id") % 5 === 0)
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val raw = emb.select("vec_id", "embedding")

    // fit once on the standing corpus; pin for both index variants —
    // encoding is a pure function of (vector, centroids, codebooks)
    val qz = AnnIndex.buildPq(spark, standing, freshDir("pqfit"), k = 32)

    val incDir = freshDir("pqinc")
    AnnIndex.buildPq(spark, standing, incDir, pinned = Some(qz))
    AnnIndex.appendPq(spark, batch, incDir)
    val fullDir = freshDir("pqfull")
    AnnIndex.buildPq(spark, emb, fullDir, pinned = Some(qz))

    // identical encoded rows...
    def codes(dir: String) = spark.read.parquet(s"$dir/cells")
      .collect().map(_.toSeq).toSet
    assert(codes(incDir) == codes(fullDir),
      "PQ append diverged from rebuild under the same quantizers")
    // ...and identical query answers (ADC + exact rerank end to end)
    val inc = AnnIndex.queryPq(spark, incDir, queries, raw,
      nProbe = 8, rerank = 50).collect().toSeq
    val full = AnnIndex.queryPq(spark, fullDir, queries, raw,
      nProbe = 8, rerank = 50).collect().toSeq
    assert(inc == full && inc.nonEmpty,
      s"PQ append-then-query diverged: ${inc.take(3)} vs ${full.take(3)}")
  }

  test("streaming ingest grows the index to parity with a batch build; compact folds the files") {
    val emb = Tables.embeddings(spark, Sf)
    val standing = emb.where(col("vec_id") % 2 === 0)
    val arriving = emb.where(col("vec_id") % 2 =!= 0)
      .select("vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

    val incDir = freshDir("ingest")
    val centroids = AnnIndex.build(spark, standing, incDir, k = 32)
    val base = freshDir("ingestio")
    arriving.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(arriving.schema).parquet(s"$base/in")
    val q = graft.streaming.EventStreams.annIngestStream(
      stream, incDir, s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()

    val fullDir = freshDir("ingestfull")
    AnnIndex.build(spark, emb, fullDir, pinnedCentroids = Some(centroids))
    val inc = AnnIndex.query(spark, incDir, queries, nProbe = 8).collect().toSeq
    val full = AnnIndex.query(spark, fullDir, queries, nProbe = 8).collect().toSeq
    assert(inc == full,
      s"stream-grown index diverged from the batch build: ${inc.take(3)} vs ${full.take(3)}")

    // compaction folds the per-batch file litter without changing results
    val (before, after) = AnnIndex.compact(spark, incDir)
    assert(after <= before, s"compact must not grow the file count: $before -> $after")
    val again = AnnIndex.query(spark, incDir, queries, nProbe = 8).collect().toSeq
    assert(again == full, "compaction changed query results")
  }

  test("maintain flags a drifted batch for refit, passes an in-distribution one") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, Sf)
    val dir = freshDir("drift")
    AnnIndex.build(spark, emb, dir, k = 32)

    // in-distribution batch: a re-draw of the same corpus (different
    // ids) — distortion ratio ~1, tiny appended fraction → no refit
    val sameDist = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      col("embedding")).limit(100)
    val ok = AnnIndex.maintain(spark, dir, sameDist)
    assert(!ok.refitNeeded,
      s"in-distribution batch must not trigger a refit: $ok")
    assert(ok.distortionRatio < 1.5, s"ratio unexpectedly high: $ok")

    // drifted batch: mass far outside the fit distribution (corpus
    // vectors are unit-norm; this blob sits at radius 10)
    val rng = new scala.util.Random(5)
    val drifted = (0 until 100).map(i =>
      (2000000L + i, Array.fill(64)(10.0f + rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val bad = AnnIndex.maintain(spark, dir, drifted)
    assert(bad.refitNeeded && bad.distortionRatio >= 1.5,
      s"drifted batch must trigger a refit: $bad")

    // growth alone also triggers: append more rows than the fit saw
    AnnIndex.append(spark, emb.select((col("vec_id") + 3000000L).as("vec_id"),
      col("embedding")), dir)
    AnnIndex.append(spark, emb.select((col("vec_id") + 4000000L).as("vec_id"),
      col("embedding")), dir)
    val grown = AnnIndex.maintain(spark, dir, sameDist)
    assert(grown.refitNeeded && grown.appendedFrac >= 1.0,
      s"2x growth must trigger a refit: $grown")
  }
}
