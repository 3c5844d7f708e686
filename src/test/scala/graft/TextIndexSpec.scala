package graft

import org.apache.spark.sql.functions._
import graft.operators.TextIndex

/** Persisted MinHash index: incremental near-dup admission semantics
  * on planted documents, and append parity with a rebuild. */
class TextIndexSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_textidx").toString

  // distinct filler docs — long enough that 3-gram shingle sets are
  // rich and unrelated docs share no band bucket
  private def doc(i: Long, topic: String) =
    (i, s"document about $topic number $i discussing $topic pipelines " +
      s"and the analytics engine details of $topic system $i at length")

  test("admission rejects corpus near-dups, admits fresh docs, collapses in-batch dups") {
    import spark.implicits._
    val corpus = (0L until 20L).map(i => doc(i, s"corpustopic$i"))
      .toDF("doc_id", "text")
    val dir = freshDir()
    TextIndex.build(spark, corpus, dir)

    val batch = Seq(
      // 100: byte-exact repeat of corpus doc 3 → every band collides
      (100L, corpus.where(col("doc_id") === 3).collect().head.getString(1)),
      // 101: case/whitespace-noise near-dup of corpus doc 5 (the
      // minhash kernel normalizes case/whitespace → same signature)
      (101L, corpus.where(col("doc_id") === 5).collect().head.getString(1)
        .toUpperCase.replace(" ", "  ")),
      // 102/103: fresh content, near-dups OF EACH OTHER → one survives
      doc(102L, "freshtwin").copy(_1 = 102L),
      (103L, doc(102L, "freshtwin")._2.toUpperCase),
      // 104: fresh and unique → admitted
      doc(104L, "uniquefresh")
    ).toDF("doc_id", "text")

    val admitted = TextIndex.ingest(spark, batch, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!admitted.contains(100L), "exact corpus repeat must be rejected")
    assert(!admitted.contains(101L), "corpus near-dup must be rejected")
    assert(admitted.intersect(Set(102L, 103L)).size == 1,
      s"in-batch twin pair must keep exactly one representative: $admitted")
    assert(admitted.contains(104L), "fresh unique doc must be admitted")

    // the commit is real: re-ingesting the same batch admits NOTHING —
    // every previously-admitted doc now collides with the grown index
    val again = TextIndex.ingest(spark, batch, dir)
      .select("doc_id").collect()
    assert(again.isEmpty,
      s"second ingest of the same batch must be fully rejected: ${again.toSeq}")
  }

  test("build-then-append holds the same index a one-shot build over the union would") {
    import spark.implicits._
    val a = (0L until 15L).map(i => doc(i, s"alpha$i")).toDF("doc_id", "text")
    val b = (100L until 110L).map(i => doc(i, s"beta$i")).toDF("doc_id", "text")

    val incDir = freshDir()
    TextIndex.build(spark, a, incDir)
    TextIndex.append(spark, b, incDir)
    val fullDir = freshDir()
    TextIndex.build(spark, a.unionByName(b), fullDir)

    def rows(dir: String) = TextIndex.liveRows(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows(incDir) == rows(fullDir),
      "bucket codes are a pure function of text — append must equal rebuild")

    // uncommitted litter in buckets/ (a crashed append) is invisible
    // to the live view — the manifest is the index (IndexManifestSpec
    // pins the full crash table on the AnnIndex twin)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val c = (200L until 205L).map(i => doc(i, s"gamma$i")).toDF("doc_id", "text")
    c.transform(TextIndex.bucketsOf).write.mode("append")
      .parquet(s"$incDir/buckets_orphan_stage")
    val it = fs.listFiles(
      new org.apache.hadoop.fs.Path(s"$incDir/buckets_orphan_stage"), true)
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet"))
        fs.rename(p, new org.apache.hadoop.fs.Path(s"$incDir/buckets/${p.getName}"))
    }
    assert(rows(incDir) == rows(fullDir),
      "uncommitted bucket files leaked into the live view")
    // a real append COMMITS and becomes visible
    TextIndex.append(spark, c, incDir)
    assert(rows(incDir) == rows(fullDir) ++
      c.transform(TextIndex.bucketsOf).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet,
      "a committed append must join the live view")
  }

  test("streaming ingest admits the same docs as the batch twin and grows the index") {
    import spark.implicits._
    val corpus = (0L until 20L).map(i => doc(i, s"streamtopic$i"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (200L, corpus.where(col("doc_id") === 2).collect().head.getString(1)),
      doc(201L, "streamfresh")
    ).toDF("doc_id", "text")

    // batch twin on its own index copy (ingest mutates the index)
    val twinDir = freshDir()
    TextIndex.build(spark, corpus, twinDir)
    val expected = TextIndex.ingest(spark, batch, twinDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val streamDir = freshDir()
    TextIndex.build(spark, corpus, streamDir)
    val base = freshDir()
    batch.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(batch.schema).parquet(s"$base/in")
    val q = graft.streaming.EventStreams.textIngestStream(
      stream, streamDir, s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.parquet(s"$base/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"streaming admission diverged from batch twin: $got vs $expected")
    assert(got == Set(201L), s"only the fresh doc admits: $got")
    // the commit is real: the admitted doc's buckets are in the index
    val idxDocs = spark.read.parquet(s"$streamDir/buckets")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(idxDocs.contains(201L), "admitted doc must join the index")
  }

  test("delete: a taken-down doc stops screening, re-ingest admits, compact folds tombstones") {
    import spark.implicits._
    val corpus = (0L until 20L).map(i => doc(i, s"taketopic$i"))
      .toDF("doc_id", "text")
    val dir = freshDir()
    TextIndex.build(spark, corpus, dir)

    // a re-crawl of corpus doc 7's text: rejected while 7 stands...
    val recrawl = Seq((300L,
      corpus.where(col("doc_id") === 7).collect().head.getString(1)))
      .toDF("doc_id", "text")
    assert(TextIndex.admit(spark, recrawl, dir).collect().isEmpty,
      "standing doc must screen its own re-crawl")

    // ...takedown of doc 7 → the same text is admitted again
    TextIndex.delete(spark, dir, Seq(7L))
    val readmitted = TextIndex.ingest(spark, recrawl, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(readmitted == Set(300L),
      s"deleted doc must stop screening a re-ingest: $readmitted")

    // compact folds the tombstone physically; the re-admitted doc's
    // buckets survive and now screen the NEXT re-crawl (a delete
    // racing a live compact now WAITS on the writer lock and its
    // tombstone files survive the fold by construction —
    // IndexManifestSpec pins both)
    val (before, after) = TextIndex.compact(spark, dir)
    assert(after <= before)
    assert(TextIndex.status(spark, dir).liveTombstoneFiles == 0,
      "compact must clear the folded tombstone list")
    TextIndex.vacuum(spark, dir)
    val idxDocs = spark.read.parquet(s"$dir/buckets")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!idxDocs.contains(7L), "compact must drop the deleted doc's buckets")
    assert(idxDocs.contains(300L), "compact must keep the re-admitted doc")
    val again = Seq((301L, recrawl.collect().head.getString(1)))
      .toDF("doc_id", "text")
    assert(TextIndex.admit(spark, again, dir).collect().isEmpty,
      "the re-admitted doc must screen subsequent re-crawls")
  }

  test("targeted compact folds only small and tombstone-dirty bucket files") {
    import spark.implicits._
    def physical(dir: String): Set[(String, Long, Long)] = {
      val root = new org.apache.hadoop.fs.Path(s"$dir/buckets")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(root, true)
      val out = Set.newBuilder[(String, Long, Long)]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet"))
          out += ((st.getPath.getName, st.getLen, st.getModificationTime))
      }
      out.result()
    }
    // one big build file (200 docs) + three small append files (3 docs)
    val corpus = (0L until 200L).map(i => doc(i, s"bigtopic$i"))
      .toDF("doc_id", "text").coalesce(1)
    val dir = freshDir()
    TextIndex.build(spark, corpus, dir)
    (1 to 3).foreach { b =>
      TextIndex.append(spark,
        (1000L * b until 1000L * b + 3L).map(i => doc(i, s"litter$i"))
          .toDF("doc_id", "text").coalesce(1), dir)
    }
    val files = physical(dir)
    assert(files.size == 4, s"setup: 1 build + 3 litter files: ${files.size}")
    val bigFile = files.maxBy(_._2)
    val threshold = files.map(_._2).toSeq.sorted.takeRight(2).head + 1
    assert(bigFile._2 >= threshold,
      "setup: the build file must sit above the small-file threshold")
    val liveBefore = TextIndex.liveRows(spark, dir).collect().toSet

    // fold the litter: the big file is neither small nor dirty → it
    // must stay byte-identical (same name, size, mtime)
    val (b1, a1) = TextIndex.compact(spark, dir, smallFileBytes = threshold)
    assert(b1 == 4 && a1 == 2, s"3 litter files fold into 1: $b1 -> $a1")
    TextIndex.vacuum(spark, dir)
    val afterFold = physical(dir)
    assert(afterFold.contains(bigFile),
      "the big clean file must not be rewritten — compact is O(litter)")
    assert(TextIndex.liveRows(spark, dir).collect().toSet == liveBefore,
      "folding changed the live rows")

    // a takedown inside the BIG file: the dirty-file probe pulls
    // exactly it into the rewrite; the folded litter file stays
    TextIndex.delete(spark, dir, Seq(5L))
    val litterFile = (afterFold - bigFile).head
    val (b2, a2) = TextIndex.compact(spark, dir, smallFileBytes = 1L)
    assert(b2 == 2 && a2 == 2, s"one dirty file swaps for one fold: $b2 -> $a2")
    TextIndex.vacuum(spark, dir)
    val afterDel = physical(dir)
    assert(afterDel.contains(litterFile),
      "the clean folded file must stay byte-identical under a takedown fold")
    assert(!afterDel.contains(bigFile), "the dirty file must be replaced")
    val docs = TextIndex.liveRows(spark, dir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!docs.contains(5L) && docs.contains(6L),
      "the takedown must be physical and everything else intact")
  }

  test("concurrent ingests: index never torn, both commit, a third batch fully rejects") {
    import spark.implicits._
    val dir = freshDir()
    TextIndex.build(spark,
      (0L until 10L).map(i => doc(i, s"standing$i")).toDF("doc_id", "text"),
      dir)
    // two batches racing: distinct fresh content per batch, plus a
    // mutual near-dup PAIR split across them (200 in A, 300 in B —
    // snapshot-based admission means they may co-admit; that's the
    // documented at-least-once guarantee, not corruption)
    val a = Seq(doc(200L, "sharedtopic"), doc(201L, "atopic"))
      .toDF("doc_id", "text")
    val b = Seq((300L, doc(200L, "sharedtopic")._2.toUpperCase),
      doc(301L, "btopic")).toDF("doc_id", "text")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val Seq(admA, admB) = Await.result(Future.sequence(Seq(a, b).map(df =>
      Future(TextIndex.ingest(spark, df, dir)
        .collect().map(_.getLong(0)).toSet))), 180.seconds)
    // each batch's OWN fresh doc always admits; the index holds every
    // admitted doc's buckets (both appends landed, nothing torn)
    assert(admA.contains(201L) && admB.contains(301L), s"$admA / $admB")
    val idxDocs = TextIndex.liveRows(spark, dir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert((admA ++ admB).subsetOf(idxDocs),
      s"every admitted doc must reach the index: ${admA ++ admB} vs $idxDocs")
    // at-least-once: AT LEAST one of the racing twins admitted (both
    // may, if neither snapshot saw the other)
    assert(admA.contains(200L) || admB.contains(300L))
    // and a third batch of the same content now fully rejects —
    // whatever co-admission happened, the standing index screens it
    val third = Seq((400L, doc(200L, "sharedtopic")._2),
      (401L, doc(201L, "atopic")._2), (402L, doc(301L, "btopic")._2))
      .toDF("doc_id", "text")
    assert(TextIndex.ingest(spark, third, dir).collect().isEmpty,
      "a later batch must screen against every committed admission")
  }

  test("gate entry admits only genuinely new batch docs at sf0.001") {
    val out = TextIndex.dedupIncrementalNear(spark, Sf).collect()
    assert(out.nonEmpty, "some batch docs must be genuinely new")
    // every admitted doc's text must appear nowhere in the corpus side
    // as an exact copy (exact copies collide on all 16 bands)
    import org.apache.spark.sql.functions._
    val all = Tables.documents(spark, Sf)
    val corpusTexts = all.where(col("doc_id") % 10 =!= 0)
      .select(md5(col("text"))).collect().map(_.getString(0)).toSet
    val admittedIds = out.map(_.getLong(0)).toSet
    val admittedTexts = all.where(col("doc_id").isin(admittedIds.toSeq: _*))
      .select(md5(col("text"))).collect().map(_.getString(0))
    assert(admittedTexts.forall(h => !corpusTexts.contains(h)),
      "an admitted batch doc exactly repeats a corpus doc")
  }
}
