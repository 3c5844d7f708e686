package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Similarity}

/** Persisted IVF index lifecycle: append-equals-rebuild under a fixed
  * quantizer, and the drift signals that decide a re-fit. */
class AnnIndexSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_annidx_$tag").toString

  /** Physical parquet files under `dir` as (relative path, size,
    * mtime) — the byte-identity fingerprint for cold-file checks. */
  private def physicalParquetFiles(dir: String): Set[(String, Long, Long)] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Set.empty
    val it = fs.listFiles(root, true)
    val out = Set.newBuilder[(String, Long, Long)]
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet"))
        out += ((st.getPath.toUri.getPath.stripPrefix(
          fs.makeQualified(root).toUri.getPath), st.getLen,
          st.getModificationTime))
    }
    out.result()
  }

  test("build writes one file per cell regardless of input partitioning") {
    // the scale property that broke at sf1 (round 10): without cell
    // co-location the build fans every scan partition into every cell
    // dir — k × partitions splinter files whose open cost dominates
    // the probe. A 16-partition input must still land one file/cell.
    val dir = freshDir("layout")
    AnnIndex.build(spark, Tables.embeddings(spark, Sf).repartition(16),
      dir, k = 8)
    val byCell = physicalParquetFiles(dir)
      .filter(_._1.contains("cell="))
      .groupBy(_._1.split("/").find(_.startsWith("cell=")).get)
    assert(byCell.nonEmpty)
    byCell.foreach { case (cell, fs) =>
      assert(fs.size == 1, s"$cell has ${fs.size} files — build must co-locate")
    }
  }

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

  test("SQ8 append-then-query equals rebuild-then-query; full probe recalls the exact top-k") {
    val emb = Tables.embeddings(spark, Sf)
    val standing = emb.where(col("vec_id") % 5 =!= 0)
    val batch = emb.where(col("vec_id") % 5 === 0)
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val raw = emb.select("vec_id", "embedding")

    // fit once on the standing corpus; pin for both variants —
    // encoding is a pure function of (vector, centroids, ranges)
    val qz = AnnIndex.buildSq8(spark, standing, freshDir("sq8fit"), k = 32)

    val incDir = freshDir("sq8inc")
    AnnIndex.buildSq8(spark, standing, incDir, pinned = Some(qz))
    AnnIndex.appendSq8(spark, batch, incDir)
    val fullDir = freshDir("sq8full")
    AnnIndex.buildSq8(spark, emb, fullDir, pinned = Some(qz))

    def codes(dir: String) = spark.read.parquet(s"$dir/cells")
      .collect().map(_.toSeq).toSet
    assert(codes(incDir) == codes(fullDir),
      "SQ8 append diverged from rebuild under the same quantizers")
    val inc = AnnIndex.querySq8(spark, incDir, queries, raw,
      nProbe = 8, rerank = 50).collect().toSeq
    val full = AnnIndex.querySq8(spark, fullDir, queries, raw,
      nProbe = 8, rerank = 50).collect().toSeq
    assert(inc == full && inc.nonEmpty,
      s"SQ8 append-then-query diverged: ${inc.take(3)} vs ${full.take(3)}")

    // probing EVERY cell makes the candidate set complete, so the
    // decode+rerank pipeline must recover the exact top-k almost
    // perfectly (8 bits/dim + exact rerank — the near-lossless claim)
    val exact = Similarity.simTopkBruteforce(spark, Sf)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val allCells = AnnIndex.querySq8(spark, fullDir, queries, raw,
        nProbe = 32, rerank = 50)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = allCells.map { case (q, got) =>
      got.intersect(exact(q)).size.toDouble / exact(q).size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"SQ8 full-probe mean recall $mean < 0.9")

    // the probe list prunes cell DIRECTORIES at plan time, as raw IVF
    val pruned = AnnIndex.querySq8(spark, fullDir, queries, raw,
      nProbe = 2, rerank = 50)
    val scan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(scan).isDefined,
      "SQ8 probe did not prune cell directories")

    // tune dispatches on the SQ8 layout (codes, not vectors — rawEmb
    // required) and querySq8 at nProbe=0 honors the stamp
    intercept[IllegalArgumentException] {
      AnnIndex.tune(spark, fullDir, queries, recallSLO = 0.3)
    }
    val (nP, rec) = AnnIndex.tune(spark, fullDir, queries,
      recallSLO = 0.3, rawEmb = Some(raw))
    assert(rec >= 0.3, s"tune could not meet a 0.3 SLO (got $rec)")
    val stamped = AnnIndex.querySq8(spark, fullDir, queries, raw,
      nProbe = 0, rerank = 50).collect().toSeq
    val explicit = AnnIndex.querySq8(spark, fullDir, queries, raw,
      nProbe = nP, rerank = 50).collect().toSeq
    assert(stamped == explicit, "querySq8 at nProbe=0 must honor the stamp")
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

  test("delete-then-query equals rebuild-without-deleted; compact folds tombstones physically") {
    val emb = Tables.embeddings(spark, Sf)
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val dir = freshDir("del")
    val centroids = AnnIndex.build(spark, emb, dir, k = 32)

    // take down exactly the current rank-1 answers — the ids whose
    // removal MUST visibly change the results
    val doomed = AnnIndex.query(spark, dir, queries, nProbe = 8)
      .where(col("rank") === 1).select("vec_id")
      .collect().map(_.getLong(0)).distinct.toSeq
    assert(doomed.nonEmpty)
    AnnIndex.delete(spark, dir, doomed)

    // the contract: delete-then-query == rebuild-without-deleted
    // (pinned centroids make the remaining assignment identical)
    val twinDir = freshDir("deltwin")
    AnnIndex.build(spark, emb.where(!col("vec_id").isin(doomed: _*)),
      twinDir, pinnedCentroids = Some(centroids))
    val afterDel = AnnIndex.query(spark, dir, queries, nProbe = 8).collect().toSeq
    val rebuilt = AnnIndex.query(spark, twinDir, queries, nProbe = 8).collect().toSeq
    assert(afterDel == rebuilt,
      s"delete diverged from rebuild-without-deleted: ${afterDel.take(3)} vs ${rebuilt.take(3)}")
    assert(afterDel.nonEmpty &&
      !afterDel.map(_.getLong(2)).exists(doomed.toSet),
      "a tombstoned id surfaced in query results")

    // tombstones are invisible to the streaming probe (same code path)
    val base = freshDir("delstream")
    queries.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(queries.schema).parquet(s"$base/in")
    val q = graft.streaming.EventStreams.annProbeStream(
      stream, dir, s"$base/out", s"$base/ckpt", nProbe = 8)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(s"$base/out")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(streamed.nonEmpty && streamed.intersect(doomed.toSet).isEmpty,
      "a tombstoned id surfaced in the streaming probe")

    // compact makes the delete physical: tombstone list empty in the
    // committed snapshot, rows gone from the folded files, results
    // unchanged; vacuum then reclaims the replaced files so even a raw
    // directory read agrees
    AnnIndex.compact(spark, dir)
    assert(AnnIndex.status(spark, dir).liveTombstoneFiles == 0,
      "compact must clear the folded tombstone list")
    AnnIndex.vacuum(spark, dir)
    val remaining = spark.read.parquet(s"$dir/cells")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(remaining.intersect(doomed.toSet).isEmpty,
      "compact must remove tombstoned rows physically")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(physicalParquetFiles(s"$dir/tombstones").isEmpty,
      "vacuum must reclaim the folded tombstone files")
    assert(AnnIndex.query(spark, dir, queries, nProbe = 8).collect().toSeq
      == afterDel, "compacting the delete changed query results")
  }

  test("PQ delete-then-query equals rebuild-without-deleted") {
    val emb = Tables.embeddings(spark, Sf)
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val raw = emb.select("vec_id", "embedding")
    val dir = freshDir("pqdel")
    val qz = AnnIndex.buildPq(spark, emb, dir, k = 32)
    val doomed = AnnIndex.queryPq(spark, dir, queries, raw, nProbe = 8,
        rerank = 50)
      .where(col("rank") === 1).select("vec_id")
      .collect().map(_.getLong(0)).distinct.toSeq
    // the DataFrame overload — a takedown list is DATA (corpus-scale
    // shape); column name/type normalize on write
    AnnIndex.delete(spark, dir,
      { import spark.implicits._
        doomed.map(_.toInt).toDF("some_id_col") })
    val twinDir = freshDir("pqdeltwin")
    val kept = emb.where(!col("vec_id").isin(doomed: _*))
    AnnIndex.buildPq(spark, kept, twinDir, pinned = Some(qz))
    // rawEmb for the delete side keeps the full corpus — the rerank
    // join must not resurrect a tombstoned id either
    val afterDel = AnnIndex.queryPq(spark, dir, queries, raw,
      nProbe = 8, rerank = 50).collect().toSeq
    val rebuilt = AnnIndex.queryPq(spark, twinDir, queries,
      kept.select("vec_id", "embedding"), nProbe = 8, rerank = 50)
      .collect().toSeq
    assert(afterDel == rebuilt && afterDel.nonEmpty,
      s"PQ delete diverged from rebuild-without-deleted")
    assert(!afterDel.map(_.getLong(2)).exists(doomed.toSet))
  }

  test("targeted compact: hot cells fold, cold cells stay byte-identical, results unchanged") {
    import spark.implicits._
    // four orthogonal pinned centroids → deterministic cell assignment,
    // so the test controls exactly which cell takes append litter
    val dim = 64
    def axis(i: Int, id: Long) = Array.tabulate(dim)(j =>
      (if (j == i) 1.0f else 0.0f) +
        (if (j == ((id % 32) + 32).toInt) 0.01f else 0.0f))
    val cents = Array.tabulate(4)(i =>
      Array.tabulate(dim)(j => if (j == i) 1.0 else 0.0))
    def vecs(cell: Int, ids: Seq[Long]) =
      ids.map(id => (id, axis(cell, id)))
    val corpus = (vecs(0, 0L until 40L) ++ vecs(1, 100L until 140L) ++
      vecs(2, 200L until 240L) ++ vecs(3, 300L until 340L))
      .toDF("vec_id", "embedding").coalesce(1)
    val dir = freshDir("targeted")
    AnnIndex.build(spark, corpus, dir, pinnedCentroids = Some(cents))
    // four append batches, ALL landing in cell 0 → litter in one cell
    (1 to 4).foreach { b =>
      AnnIndex.append(spark,
        vecs(0, (1000L * b) until (1000L * b + 3L)).toDF("vec_id", "embedding")
          .coalesce(1), dir)
    }
    val queries = (vecs(0, Seq(9000L)) ++ vecs(1, Seq(9001L)) ++
      vecs(2, Seq(9002L)) ++ vecs(3, Seq(9003L)))
      .toDF("q_id", "q_emb")
    val expected = AnnIndex.query(spark, dir, queries, nProbe = 4)
      .collect().toSeq
    assert(expected.nonEmpty)

    // no compact has run yet → physical layout == live set
    val coldBefore = (1 to 3).map(c => physicalParquetFiles(s"$dir/cells/cell=$c"))
    assert(physicalParquetFiles(s"$dir/cells/cell=0").size == 5,
      "setup: cell 0 must hold the build file plus 4 litter files")
    assert(coldBefore.forall(_.size == 1), "setup: cold cells hold one file")

    val (before, after) = AnnIndex.compact(spark, dir, maxFilesPerCell = 2)
    assert(before == 8 && after == 4,
      s"only cell 0 must fold (5 files -> 1): $before -> $after")
    // cold cells: not rewritten, not moved — same names, sizes, mtimes
    val coldAfter = (1 to 3).map(c => physicalParquetFiles(s"$dir/cells/cell=$c"))
    assert(coldAfter == coldBefore,
      "a cold cell's files changed — compact must be O(litter), not O(index)")
    assert(AnnIndex.query(spark, dir, queries, nProbe = 4).collect().toSeq
      == expected, "targeted compact changed query results")
    // vacuum reclaims the folded litter; cold cells still untouched
    AnnIndex.vacuum(spark, dir)
    assert(physicalParquetFiles(s"$dir/cells/cell=0").size == 1)
    assert((1 to 3).map(c => physicalParquetFiles(s"$dir/cells/cell=$c"))
      == coldBefore)

    // a takedown in a COLD, under-threshold cell: the dirty-file probe
    // must pull exactly that cell's file into the rewrite set
    AnnIndex.delete(spark, dir, Seq(200L))
    val cold13 = Seq(1, 3).map(c => physicalParquetFiles(s"$dir/cells/cell=$c"))
    val (b2, a2) = AnnIndex.compact(spark, dir, maxFilesPerCell = 99)
    assert(b2 == 4 && a2 == 4, s"one dirty file swaps for one folded file: $b2 -> $a2")
    assert(Seq(1, 3).map(c => physicalParquetFiles(s"$dir/cells/cell=$c"))
      == cold13, "cells without the tombstoned id must stay byte-identical")
    AnnIndex.vacuum(spark, dir)
    assert(!spark.read.parquet(s"$dir/cells").select("vec_id")
      .collect().map(_.getLong(0)).contains(200L),
      "the takedown must be physical after compact+vacuum")
    assert(AnnIndex.query(spark, dir, queries, nProbe = 4).collect()
      .forall(_.getLong(2) != 200L))
  }

  test("serving probes reuse cached quantizers within a build generation") {
    val emb = Tables.embeddings(spark, Sf)
    val dir = freshDir("qzcache")
    AnnIndex.build(spark, emb, dir, k = 16)
    val queries = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def loads = AnnIndex.quantizerLoads.get()
    val l0 = loads
    AnnIndex.query(spark, dir, queries, nProbe = 4).collect()
    assert(loads == l0 + 1, "first probe loads the quantizers once")
    AnnIndex.query(spark, dir, queries, nProbe = 4).collect()
    assert(loads == l0 + 1,
      "second probe must NOT re-read centroids/meta — generation unchanged")
    // appends change the manifest version but not the build generation:
    // the cache stays valid (assignment geometry is immutable)
    AnnIndex.append(spark, emb.limit(5)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding")), dir)
    AnnIndex.query(spark, dir, queries, nProbe = 4).collect()
    assert(loads == l0 + 1, "an append must not invalidate the quantizer cache")
    // a rebuild is a NEW generation → exactly one reload
    AnnIndex.build(spark, emb, dir, k = 16)
    AnnIndex.query(spark, dir, queries, nProbe = 4).collect()
    assert(loads == l0 + 2, "a rebuild must reload quantizers exactly once")
  }

  test("a dim-mismatched ingest batch fails loudly on the write path") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, Sf)
    val dir = freshDir("dimguard")
    AnnIndex.build(spark, emb, dir, k = 32)
    // 32 floats against a 64-dim index: without the write-path guard
    // this row would land under cell=__HIVE_DEFAULT_PARTITION__ and
    // silently never be probed
    val bad = Seq((9999999L, Array.fill(32)(0.1f)))
      .toDF("vec_id", "embedding")
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    val e = intercept[Throwable] { AnnIndex.append(spark, bad, dir) }
    assert(messages(e).contains("embedding dim != 64"),
      s"expected the dim guard to fire, got: ${messages(e)}")
    val ePq = intercept[Throwable] {
      val pqDir = freshDir("dimguardpq")
      AnnIndex.buildPq(spark, emb, pqDir, k = 32)
      AnnIndex.appendPq(spark, bad, pqDir)
    }
    assert(messages(ePq).contains("embedding dim != 64"))
  }

  test("external-id serving keeps a numerically colliding corpus vector (excludeSelf=false)") {
    val emb = Tables.embeddings(spark, Sf)
    val dir = freshDir("extid")
    AnnIndex.build(spark, emb, dir, k = 32)
    // an external query whose id happens to equal corpus vec_id 7 and
    // whose embedding IS vector 7: with self-exclusion the index's
    // best answer (vector 7 itself, score 1.0) silently disappears
    val q = emb.where(col("vec_id") === 7)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val served = AnnIndex.query(spark, dir, q, nProbe = 8,
      excludeSelf = false).collect()
    assert(served.head.getLong(2) == 7L && served.head.getDouble(3) > 0.999,
      "excludeSelf=false must keep the colliding corpus vector")
    val gated = AnnIndex.query(spark, dir, q, nProbe = 8).collect()
    assert(!gated.map(_.getLong(2)).contains(7L),
      "the default (corpus-id queries) must still self-exclude")
  }

  test("queryPq's default rerank budget derives from the index's fit-time size") {
    val emb = Tables.embeddings(spark, Sf)
    val raw = emb.select("vec_id", "embedding")
    val dir = freshDir("rerankmeta")
    AnnIndex.buildPq(spark, emb, dir, k = 32)
    val meta = AnnIndex.readMeta(spark, dir)
    val n = raw.count()
    // rerank omitted → the budget must be pqRerank(meta.n_at_fit),
    // observable through the emitted rerank_frac cost column
    val expectedFrac = BigDecimal(
        graft.operators.Similarity.pqRerank(meta.nAtFit).toDouble / n)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = AnnIndex.queryPq(spark, dir,
        emb.where(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        raw, candFracOver = n)
      .select("rerank_frac").distinct().collect()
    assert(got.length == 1 && math.abs(got.head.getDouble(0) - expectedFrac) < 1e-9,
      s"default rerank must derive from n_at_fit: got ${got.toSeq}, expected $expectedFrac")
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

  test("tune stamps the minimal SLO-meeting nProbe; query and queryPq honor it; rebuild retires it") {
    val emb = Tables.embeddings(spark, Sf)
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val dir = freshDir("tune")
    AnnIndex.build(spark, emb, dir, k = 32)
    // probe-all IS the exact twin over the index (same kernel, same
    // tie-break) — the reference every grid level is measured against
    def annSet(p: Int): Set[(Long, Long)] =
      AnnIndex.query(spark, dir, queries, nProbe = p)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = annSet(32)
    def recallOf(p: Int): Double =
      annSet(p).intersect(exact).size.toDouble / exact.size
    val grid = Seq(1, 2, 4, 8, 16, 32)
    val (nP, rec) = AnnIndex.tune(spark, dir, queries,
      recallSLO = 0.9, grid = grid)
    assert(rec >= 0.9, s"tune must meet the SLO on a probe-all-capable grid: $rec")
    assert(math.abs(recallOf(nP) - rec) < 1e-12,
      "tune's reported recall must match an independent re-measure")
    grid.filter(_ < nP).foreach { p =>
      assert(recallOf(p) < 0.9,
        s"nProbe=$p already meets the SLO — tune did not pick the minimum")
    }
    // the stamp IS the serving default now
    assert(AnnIndex.query(spark, dir, queries).collect().toSeq
      == AnnIndex.query(spark, dir, queries, nProbe = nP).collect().toSeq,
      "query(nProbe=0) must serve the stamped probe count")
    // a PQ index honors its own stamp through queryPq
    val pqDir = freshDir("tunepq")
    AnnIndex.buildPq(spark, emb, pqDir, k = 32)
    val (nPq, _) = AnnIndex.tune(spark, pqDir, queries, recallSLO = 0.7,
      grid = grid, rawEmb = Some(emb))
    assert(AnnIndex.queryPq(spark, pqDir, queries, emb).collect().toSeq
      == AnnIndex.queryPq(spark, pqDir, queries, emb, nProbe = nPq)
        .collect().toSeq,
      "queryPq(nProbe=0) must serve the stamped probe count")
    // a rebuild changes the generation: the old stamp is retired and
    // the derived heuristic takes over until the next tune
    AnnIndex.build(spark, emb, dir, k = 32)
    val stampGen = spark.read.parquet(s"$dir/tuned")
      .collect().head.getAs[String]("built")
    assert(stampGen != AnnIndex.status(spark, dir).built,
      "rebuild must mint a new generation the old stamp cannot match")
    assert(AnnIndex.query(spark, dir, queries).collect().toSeq
      == AnnIndex.query(spark, dir, queries,
        nProbe = graft.operators.Similarity.ivfNProbe(32)).collect().toSeq,
      "an untuned generation must fall back to the derived default")
  }

  test("tier advisor: planted byte budgets flip raw -> sq8 -> pq; dispatch honors the stamp; stale stamp rejected") {
    // 20k vectors (40 id-shifted copies of the gate corpus): at 500
    // rows the parquet FILE METADATA dominates and PQ at rest is
    // BIGGER than SQ8 — the compression ordering the advisor ranks on
    // only emerges once data dominates overhead, so the advisor is
    // tested at the scale its decision is about
    val base = Tables.embeddings(spark, Sf)
    // per-row deterministic jitter so no two float pages are
    // byte-identical — EXACT copies let snappy fold the raw tier ~7x
    // and the at-rest ratios stop meaning anything
    val emb = (0 until 40).map(o =>
        base.select((col("vec_id") + lit(o * 10000L)).as("vec_id"),
          col("embedding")))
      .reduce(_.unionByName(_))
      .select(col("vec_id"), expr(
        "transform(embedding, (x, j) -> CAST(x + " +
          "(CAST((vec_id * 7 + j * 13) % 31 AS DOUBLE) - 15.0) / 1000.0 " +
          "AS FLOAT))").as("embedding"))
    val dir = freshDir("tiers")
    AnnIndex.buildTiers(spark, emb, dir, k = 32)
    val queries = base.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val rawB = AnnIndex.tierBytes(spark, dir, "raw").toDouble
    val fS = AnnIndex.tierBytes(spark, dir, "sq8") / rawB
    val fP = AnnIndex.tierBytes(spark, dir, "pq") / rawB
    assert(fP < fS && fS < 1.0,
      s"compression tiers must actually shrink at rest: pq=$fP sq8=$fS")

    // budgets planted BETWEEN the measured fractions, so each one
    // admits exactly the tiers below it; slo low enough that recall
    // never vetoes — the budget alone drives the flip
    val a1 = AnnIndex.adviseTier(spark, dir, queries, emb,
      byteBudgetFrac = 1.0, recallSLO = 0.5)
    assert(a1.tier == "raw", s"budget 1.0 must keep the exact tier: $a1")
    val a2 = AnnIndex.adviseTier(spark, dir, queries, emb,
      byteBudgetFrac = (fS + 1.0) / 2, recallSLO = 0.5)
    assert(a2.tier == "sq8", s"a sub-raw budget must pick sq8: $a2")
    val a3 = AnnIndex.adviseTier(spark, dir, queries, emb,
      byteBudgetFrac = (fP + fS) / 2, recallSLO = 0.5)
    assert(a3.tier == "pq", s"a sub-sq8 budget must pick pq: $a3")
    // every stamped choice carries its measured evidence
    assert(a3.measures.map(_.tier) == Seq("raw", "sq8", "pq"))
    assert(a3.measures.forall(_.recall >= 0.5),
      s"all tiers must clear the floor here: ${a3.measures}")

    // the steady-state form re-uses a live matching stamp without
    // re-measuring (stamp file untouched); a different budget re-advises
    val stampFiles = physicalParquetFiles(dir + "/tier")
    val cached = AnnIndex.adviseTierIfNeeded(spark, dir, queries, emb,
      byteBudgetFrac = (fP + fS) / 2, recallSLO = 0.5)
    assert(cached.tier == "pq" &&
      cached.measures.toSet == a3.measures.toSet)
    assert(physicalParquetFiles(dir + "/tier") == stampFiles,
      "a live matching stamp must not be re-measured")

    // dispatch-by-stamp is EXACTLY the direct query of the chosen tier
    val advised = AnnIndex.queryAdvised(spark, dir, queries, emb)
    assert(advised.select("tier").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("pq"))
    assert(advised.drop("tier").collect().toSeq ==
      AnnIndex.queryPq(spark, dir + "/pq", queries, emb).collect().toSeq,
      "advised dispatch must equal the direct pq query")

    // the recall SLO vetoes a budget-fitting tier: demand more recall
    // than the stamped pq measurement delivers and the advisor must
    // fall back to the best-recall tier inside the budget (still pq —
    // it is the only one fitting — with achieved numbers stamped)
    val pqRec = a3.measures.find(_.tier == "pq").get.recall
    if (pqRec < 1.0) {
      val a5 = AnnIndex.adviseTier(spark, dir, queries, emb,
        byteBudgetFrac = (fP + fS) / 2,
        recallSLO = math.min(1.0, pqRec + 1e-6))
      assert(a5.tier == "pq",
        s"only budget-fitting tier must still be stamped (alarmed): $a5")
    }

    // the stamp answers ONE question — re-asking with a different
    // topK (grid, excludeSelf) must re-measure, never hand back the
    // other question's numbers (round-17 advice)
    val stampBefore = physicalParquetFiles(dir + "/tier")
    AnnIndex.adviseTierIfNeeded(spark, dir, queries, emb,
      byteBudgetFrac = (fP + fS) / 2, recallSLO = 0.5, topK = 5)
    assert(physicalParquetFiles(dir + "/tier") != stampBefore,
      "a different topK must re-measure, not reuse the stamp")
    val st5 = AnnIndex.readTierStamp(spark, dir).get
    assert(st5.topK == 5 && st5.budgetFrac == (fP + fS) / 2,
      s"the stamp must persist the question it answered: $st5")

    // a rebuild of the chosen tier mints a new generation: the STRICT
    // form fails loudly; the default re-measures through the stamp's
    // own persisted question and serves with no manual step (round-17
    // verdict ask #4 — maintenance must not strand a stamped
    // deployment)
    AnnIndex.buildPq(spark, emb, dir + "/pq", k = 32)
    val err = intercept[IllegalStateException] {
      AnnIndex.queryAdvised(spark, dir, queries, emb, readvise = false)
    }
    assert(err.getMessage.contains("stale"), err.getMessage)
    val healed = AnnIndex.queryAdvised(spark, dir, queries, emb)
    assert(healed.count() > 0, "self-healed dispatch must serve")
    val stH = AnnIndex.readTierStamp(spark, dir).get
    assert(stH.built == AnnIndex.status(spark, s"$dir/${stH.tier}").built,
      s"the healed stamp must be live: $stH")
    assert(stH.topK == 5, "re-advise must replay the stamped question")

    // the chained maintenance verb: rebalance raw + advice refresh —
    // whether or not a cell split (split ⇒ new raw generation ⇒ the
    // refresh re-measures; no split ⇒ stamp reused), the deployment
    // must come out SERVING with a live stamp and no manual step
    val (rep, adv) = AnnIndex.rebalanceTiers(spark, dir, queries, emb)
    assert(adv.isDefined, s"an advised dir must refresh advice: $rep")
    assert(AnnIndex.queryAdvised(spark, dir, queries, emb,
      readvise = false).count() > 0,
      "post-maintenance strict dispatch must serve without re-advising")
  }

  test("tier curve: recall monotone per tier, sq8 matches raw at equal probes, bytes fracs ordered") {
    val curve = Similarity.simAnnTierCurve(spark, Sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(curve.length == 15, s"3 tiers x 5 probe levels: ${curve.length}")
    val byTier = curve.groupBy(_._1)
    byTier.foreach { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(lo, hi) =>
          // probe lists nest on the shared quantizer: recall and scan
          // cost are monotone (PQ gets a small ADC-crowding tolerance:
          // a larger candidate set can crowd the fixed rerank list)
          val tol = if (t == "pq") 0.05 else 0.0
          assert(hi._3 >= lo._3 - tol,
            s"$t recall fell ${lo._2}->${hi._2}: ${lo._3} -> ${hi._3}")
          assert(hi._4 >= lo._4,
            s"$t cand_frac fell ${lo._2}->${hi._2}: ${lo._4} -> ${hi._4}")
        case _ =>
      }
    }
    // SQ8's in-cell ranking is near-exact: at equal probes it must not
    // trail raw IVF (the curve form of "4x is free")
    val rawRec = byTier("raw").map(r => r._2 -> r._3).toMap
    byTier("sq8").foreach { case (_, p, rec, _, _) =>
      assert(rec >= rawRec(p) - 1e-9,
        s"sq8 recall $rec trails raw ${rawRec(p)} at nprobe=$p")
    }
    // bytes fractions: constant across probes; sq8 < raw = 1. (At the
    // 500-row gate corpus parquet metadata dominates and pq is not yet
    // smaller than sq8 — the full pq < sq8 ordering is asserted in the
    // advisor test's 20k corpus, where data dominates overhead.)
    val bf = curve.groupBy(_._1).map { case (t, rs) =>
      val fs = rs.map(_._5).distinct
      assert(fs.length == 1, s"$t bytes_frac varies across probes: $fs")
      t -> fs.head
    }
    assert(bf("raw") == 1.0 && bf("sq8") < 1.0 && bf("pq") < 1.0,
      s"bytes ordering violated: $bf")
  }

  test("maintain flags a planted hot cell; rebalance splits it, bounds load, preserves rows and recall") {
    import spark.implicits._
    // deterministic jitter so the corpus (and therefore the fit, the
    // split, and the assertions) replays bit-identically
    def jit(i: Int, j: Int): Float = (((i * 31 + j * 7) % 13) - 6) / 100.0f
    def blob(ids: Range, center: Int => Float): Seq[(Long, Seq[Float])] =
      ids.map(i => (i.toLong,
        (0 until 64).map(j => center(j) + jit(i, j)).toSeq))
    // 4 balanced background clusters (40 vecs each on distinct axes) +
    // TWO tight sub-blobs that crowd one region: 8·e1 ± 0.4·e2. The
    // coarse quantizer is PINNED with one centroid between the blobs —
    // the never-balanced-fit case the drift triggers cannot see: the
    // hot cell holds 240 of 400 rows, load factor 3.0 (pinning keeps
    // the scenario independent of which local minimum Lloyd's finds)
    val bg = (0 until 4).flatMap(m =>
      blob(m * 40 until (m + 1) * 40, j => if (j == m + 4) 5f else 0f))
    val blobA = blob(1000 until 1120,
      j => if (j == 0) 8f else if (j == 1) 0.4f else 0f)
    val blobB = blob(2000 until 2120,
      j => if (j == 0) 8f else if (j == 1) -0.4f else 0f)
    val emb = (bg ++ blobA ++ blobB).toDF("vec_id", "embedding")
    val pinned = (0 until 4).map(m =>
        Array.tabulate(64)(j => if (j == m + 4) 5.0 else 0.0)).toArray :+
      Array.tabulate(64)(j => if (j == 0) 8.0 else 0.0)
    val dir = freshDir("rebalance")
    AnnIndex.build(spark, emb, dir, k = 5,
      pinnedCentroids = Some(pinned))

    val inDist = emb.limit(50)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    val before = AnnIndex.maintain(spark, dir, inDist, hotFactor = 2.0)
    assert(before.rebalanceNeeded && before.hotCells >= 1L,
      s"planted hot cell must flag rebalance: $before")
    assert(before.maxLoadFactor > 2.0, s"expected load > 2: $before")
    assert(!before.refitNeeded,
      s"occupancy skew is not distribution drift — refit must stay off: $before")

    val queries = emb.where(col("vec_id") === 1000L || col("vec_id") === 2000L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def topIds(k: Int) = AnnIndex.query(spark, dir, queries, topK = k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val hitsBefore = topIds(5).toSet
    val idsBefore = AnnIndex.liveRows(spark, dir)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet

    val filesBefore = physicalParquetFiles(dir)
      .filter(_._1.contains("cell="))

    val rep = AnnIndex.rebalance(spark, dir, hotFactor = 2.0)
    assert(rep.split >= 1 && rep.kAfter == rep.kBefore + rep.split,
      s"each hot cell must split into two: $rep")
    assert(rep.maxLoadAfter < rep.maxLoadBefore && rep.maxLoadAfter <= 2.0,
      s"post-rebalance max load must be bounded: $rep")
    // row identity: nothing appears, nothing vanishes
    val idsAfter = AnnIndex.liveRows(spark, dir)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(idsAfter == idsBefore, "rebalance must preserve the row set")
    // recall: each blob query still finds its own blob-mates first
    val hitsAfter = topIds(5).toSet
    assert(hitsAfter == hitsBefore,
      s"top-5 neighbors changed across rebalance:\n$hitsBefore\n$hitsAfter")
    hitsAfter.foreach { case (q, _, v) =>
      assert(math.abs(v - q) < 1000,
        s"query $q's neighbor $v is not a blob-mate")
    }
    // the verdict flips off at the same threshold, and the new
    // generation retires quantizer caches (query ran above — it
    // reloaded against the post-split geometry)
    val after = AnnIndex.maintain(spark, dir, inDist, hotFactor = 2.0)
    assert(!after.rebalanceNeeded && after.hotCells == 0L,
      s"post-rebalance occupancy must clear the trigger: $after")
    // cold cells' files were not rewritten — byte-identical survivors
    // for the 4 balanced background cells (the O(hot)-not-O(index)
    // claim), and a second pass on a balanced index is a no-op
    val survivors = physicalParquetFiles(dir)
      .filter(_._1.contains("cell=")).intersect(filesBefore)
      .map(_._1.split("/").init.last).toSet
    assert(survivors.size >= 4,
      s"balanced cells must keep their files untouched, got $survivors")
    val reb2 = AnnIndex.rebalance(spark, dir, hotFactor = 2.0)
    assert(reb2.split == 0 && reb2.kAfter == rep.kAfter,
      s"a balanced index must rebalance as a no-op: $reb2")

    // --- staged-geometry atomicity (round-17 advice, medium) ---
    // rebalance must NOT have overwritten the build-time geometry in
    // place: the split generation lives at <kind>@<gen> and the plain
    // paths still hold the pre-split fit — so a failed commit or a
    // crash mid-verb leaves the old (manifest, geometry) pair
    // consistent, and the manifest flip IS the geometry flip
    val gen = AnnIndex.status(spark, dir).built
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/centroids@$gen")),
      "split geometry must be staged at its generation path")
    assert(spark.read.parquet(s"$dir/centroids").count() == 5,
      "the plain build-time centroids must be untouched by rebalance")
    assert(AnnIndex.readCentroids(spark, dir).length == rep.kAfter,
      "readers must resolve the live generation's geometry")
    // a stray staged generation no manifest points at is invisible
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/centroids@bogus-gen"))
    assert(AnnIndex.readCentroids(spark, dir).length == rep.kAfter,
      "an uncommitted staged generation must never be read")
    // kAtFit pins the load denominator across splits: k grew, the
    // fit-time cell count did not — so untouched cells' load factors
    // are unchanged and a skewed-but-split corpus cannot cascade
    val meta = AnnIndex.readMeta(spark, dir)
    assert(meta.k == rep.kAfter && meta.kAtFit == 5,
      s"rebalance must grow k but preserve kAtFit: $meta")
    // vacuum sweeps superseded geometry generations, keeps the live one
    AnnIndex.vacuum(spark, dir, graceMs = 0L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/centroids@$gen")),
      "vacuum must keep the live generation's geometry")
    assert(!fs.exists(
        new org.apache.hadoop.fs.Path(s"$dir/centroids@bogus-gen")),
      "vacuum must sweep geometry no live manifest points at")
  }
}
