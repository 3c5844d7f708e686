package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The manifest-pointer commit protocol (IndexFiles): the crash state
  * table enumerated step by step, the conditional-put commit, the
  * optimistic transform retry that makes delete-vs-compact
  * serializable, and the bounded-wait writer lock that lets ingest
  * survive maintenance. These are the object-store-safety claims —
  * each one is a spec here, not a doc sentence. */
class IndexManifestSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_manifest_$tag").toString

  private def fs =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def queriesOf(emb: org.apache.spark.sql.DataFrame) =
    emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  test("crash table: every pre-publish crash leaves readers on the old snapshot; vacuum sweeps the litter") {
    val emb = Tables.embeddings(spark, Sf)
    val dir = freshDir("crash")
    AnnIndex.build(spark, emb, dir, k = 16)
    val queries = queriesOf(emb)
    val expected = AnnIndex.query(spark, dir, queries, nProbe = 4).collect().toSeq
    val st0 = AnnIndex.status(spark, dir)

    // crash point 1: a writer died mid/after data-file write, before
    // its manifest commit — orphan parquet files in a cell directory.
    // Readers must not see them: the manifest IS the index.
    val cells = new Path(s"$dir/cells")
    val aLive = fs.listFiles(cells, true)
    var victim: Path = null
    while (aLive.hasNext && victim == null) {
      val p = aLive.next().getPath
      if (p.getName.endsWith(".parquet")) victim = p
    }
    val orphan = new Path(victim.getParent, s"part-orphan-${victim.getName}")
    org.apache.hadoop.fs.FileUtil.copy(fs, victim, fs, orphan, false,
      spark.sparkContext.hadoopConfiguration)
    // crash point 2: a committer died mid manifest-tmp write
    val tmpLitter = new Path(s"$dir/manifest/.tmp-deadbeef")
    val out = fs.create(tmpLitter, false); out.write(1); out.close()

    assert(AnnIndex.status(spark, dir) == st0,
      "uncommitted litter must not change the committed snapshot")
    assert(AnnIndex.query(spark, dir, queries, nProbe = 4).collect().toSeq
      == expected, "readers saw a torn state (orphan file leaked into scans)")
    assert(AnnIndex.liveRows(spark, dir).count() == emb.count(),
      "orphan rows leaked into the live view")

    // recovery is lazy GC, not heal-on-entry: vacuum removes exactly
    // the unreferenced litter and the committed state is untouched
    val swept = AnnIndex.vacuum(spark, dir)
    assert(!fs.exists(orphan), "vacuum must delete the orphan data file")
    assert(!fs.exists(tmpLitter), "vacuum must delete tmp-manifest litter")
    assert(swept >= 2, s"vacuum reported $swept deletions")
    assert(AnnIndex.query(spark, dir, queries, nProbe = 4).collect().toSeq
      == expected, "vacuum changed the committed state")
  }

  test("conditional put: exactly one committer wins a version; the loser's retry lands on top") {
    val emb = Tables.embeddings(spark, Sf)
    val dir = freshDir("cas")
    AnnIndex.build(spark, emb, dir, k = 8)
    val base = IndexFiles.read(spark, dir)

    // two committers race for version base+1: the second conditional
    // put MUST fail (publish is rename-onto-existing, which the FS
    // contract rejects) — this is the primitive the object-store mode
    // maps to a conditional PUT
    val a = base.copy(version = base.version + 1, built = "winner")
    val b = base.copy(version = base.version + 1, built = "loser")
    assert(IndexFiles.tryCommit(spark, dir, a), "first commit must win")
    assert(!IndexFiles.tryCommit(spark, dir, b), "second commit must lose")
    assert(IndexFiles.read(spark, dir).built == "winner")

    // the optimistic retry: a transform re-applies against the NEW
    // base and lands at the next version — nothing is lost
    val landed = IndexFiles.commit(spark, dir)(m =>
      m.copy(built = m.built + "+retry"))
    assert(landed.version == base.version + 2)
    assert(IndexFiles.read(spark, dir).built == "winner+retry")
  }

  test("a delete landing between a compact's snapshot read and its commit survives the fold") {
    val emb = Tables.embeddings(spark, Sf)
    val dir = freshDir("interleave")
    AnnIndex.build(spark, emb, dir, k = 8)
    AnnIndex.delete(spark, dir, Seq(1L))
    // the compact's snapshot: it read the manifest HERE (sees the
    // first tombstone only)...
    val snapshot = IndexFiles.read(spark, dir)
    assert(snapshot.tombstones.nonEmpty)
    // ...a delete lands AFTER that read, BEFORE the compact's commit
    AnnIndex.delete(spark, dir, Seq(2L))
    val late = IndexFiles.read(spark, dir).tombFiles.toSet -- snapshot.tombFiles.toSet
    assert(late.nonEmpty, "second delete must add a new tombstone file")

    // the compact commits its swap, clearing ONLY the tombstone files
    // it observed and folded — the round-7 protocol cleared the whole
    // list here and silently resurrected the late takedown
    IndexFiles.commitCompactSwap(spark, dir,
      rewritten = Set.empty, added = Vector.empty,
      foldedTombs = snapshot.tombFiles.toSet)
    val after = IndexFiles.read(spark, dir)
    assert(after.tombFiles.toSet == late,
      s"late tombstone must survive the compact: ${after.tombFiles}")
    // and the late takedown is still in force on the query path
    val q = emb.where(col("vec_id") === 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    assert(!AnnIndex.query(spark, dir, q, nProbe = 8, excludeSelf = false)
      .collect().map(_.getLong(2)).contains(2L),
      "late-deleted id resurfaced after the compact's commit")
  }

  test("a compact whose inputs were already swapped by a concurrent compact aborts instead of double-adding") {
    val emb = Tables.embeddings(spark, Sf)
    val dir = freshDir("twocompact")
    AnnIndex.build(spark, emb, dir, k = 8)
    val live = IndexFiles.read(spark, dir).dataFiles.toSet
    val gone = live.head
    // compact A swapped `gone` out...
    IndexFiles.commitCompactSwap(spark, dir, Set(gone), Vector.empty, Set.empty)
    // ...compact B, planned from the older snapshot, must refuse to
    // commit (its fold output would double-add rows)
    val e = intercept[IllegalArgumentException] {
      IndexFiles.commitCompactSwap(spark, dir, Set(gone), Vector.empty, Set.empty)
    }
    assert(e.getMessage.contains("concurrent compact"))
  }

  test("writer lock: a writer WAITS out a holder (bounded) instead of failing — then proceeds") {
    val emb = Tables.embeddings(spark, Sf)
    val dir = freshDir("lockwait")
    AnnIndex.build(spark, emb, dir, k = 8)
    val lock = new Path(s"$dir/writer.lock")
    assert(fs.createNewFile(lock), "test could not take the lock")

    val done = new java.util.concurrent.CountDownLatch(1)
    @volatile var failure: Throwable = null
    val t = new Thread(() => {
      try AnnIndex.delete(spark, dir, Seq(5L))
      catch { case e: Throwable => failure = e }
      finally done.countDown()
    })
    t.start()
    // while the lock is held the writer must be WAITING, not failed
    assert(!done.await(1500, java.util.concurrent.TimeUnit.MILLISECONDS),
      "writer must block while another writer holds the lock")
    assert(failure == null)
    fs.delete(lock, false)
    assert(done.await(30, java.util.concurrent.TimeUnit.SECONDS),
      "writer must proceed once the lock frees")
    assert(failure == null, s"writer failed after lock release: $failure")
    assert(AnnIndex.status(spark, dir).liveTombstoneFiles > 0,
      "the delayed delete must have committed")
  }

  test("rebuild clears the prior generation's tombstones: a re-ingested id is queryable again") {
    val emb = Tables.embeddings(spark, Sf)
    val dir = freshDir("regen")
    AnnIndex.build(spark, emb, dir, k = 8)
    AnnIndex.delete(spark, dir, Seq(7L))
    val q = emb.where(col("vec_id") === 7)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    assert(!AnnIndex.query(spark, dir, q, nProbe = 8, excludeSelf = false)
      .collect().map(_.getLong(2)).contains(7L))
    // the maintain-triggered refit flow rebuilds IN PLACE over a corpus
    // that legitimately re-includes id 7 — the stale generation's
    // tombstone must not anti-join it away forever
    AnnIndex.build(spark, emb, dir, k = 8)
    assert(AnnIndex.status(spark, dir).liveTombstoneFiles == 0,
      "rebuild must reset the tombstone list")
    assert(AnnIndex.query(spark, dir, q, nProbe = 8, excludeSelf = false)
      .collect().map(_.getLong(2)).contains(7L),
      "re-ingested id must be queryable after a rebuild")
  }
}
