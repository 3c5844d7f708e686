package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Bm25Index, TextAnalysis}

/** BM25 posting index at rest: bit-parity with the live corpus-scan
  * path across the whole lifecycle — build, append-vs-rebuild,
  * takedown (tombstone-time exact stats correction), compact (stats
  * fold + tombstone clear), plus the loud wrong-format failure and
  * partition-pruned serving reads. */
class Bm25IndexSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_bm25idx").toString

  private val docs = Seq(
    (1L, "vector search over a stream of window aggregates"),
    (2L, "the stream window slides and the stream keeps flowing"),
    (3L, "an unrelated document about parquet row groups"),
    (4L, "vector vector vector quantization codebooks"),
    (5L, "window functions rank rows within a window frame"),
    (6L, "stream processing with watermarks and state stores"),
    (7L, "completely different text with no query terms at all"),
    (8L, "a vector stream window trifecta document"))

  private val terms = Seq("vector", "stream", "window")

  private def corpus(rows: Seq[(Long, String)] = docs): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def collectScores(df: DataFrame): Seq[(Long, Double, Long)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq

  test("search over a built index is bit-identical to the live scan") {
    val dir = freshDir()
    Bm25Index.build(spark, corpus(), dir)
    val served = collectScores(Bm25Index.search(spark, dir, terms))
    val live = collectScores(TextAnalysis.bm25Search(corpus(), terms))
    assert(served === live)
    assert(served.nonEmpty)
  }

  test("append parity: build(a)+append(b) == build(a++b)") {
    val (a, b) = docs.splitAt(4)
    val inc = freshDir()
    Bm25Index.build(spark, corpus(a), inc)
    Bm25Index.append(spark, corpus(b), inc)
    val full = freshDir()
    Bm25Index.build(spark, corpus(), full)
    assert(collectScores(Bm25Index.search(spark, inc, terms)) ===
      collectScores(Bm25Index.search(spark, full, terms)))
    // and both match the live scan over the union corpus
    assert(collectScores(Bm25Index.search(spark, inc, terms)) ===
      collectScores(TextAnalysis.bm25Search(corpus(), terms)))
  }

  test("takedown: tombstoned doc vanishes and df/N/avgdl correct exactly") {
    val dir = freshDir()
    Bm25Index.build(spark, corpus(), dir)
    Bm25Index.delete(spark, dir, Seq(8L, 2L))
    val served = collectScores(Bm25Index.search(spark, dir, terms))
    assert(!served.exists(r => r._1 == 8L || r._1 == 2L))
    // exact: equals the live scan over the corpus MINUS the deleted
    // docs — this pins the N/avgdl/df tombstone corrections, not just
    // the row drop
    val live = collectScores(TextAnalysis.bm25Search(
      corpus(docs.filterNot(d => d._1 == 8L || d._1 == 2L)), terms))
    assert(served === live)
  }

  test("compact folds tombstones, corrects stats, and preserves results") {
    val (a, b) = docs.splitAt(4)
    val dir = freshDir()
    Bm25Index.build(spark, corpus(a), dir)
    Bm25Index.append(spark, corpus(b), dir) // litter + 2nd stats row
    Bm25Index.delete(spark, dir, Seq(8L, 2L))
    val preCompact = collectScores(Bm25Index.search(spark, dir, terms))
    val (before, after) = Bm25Index.compact(spark, dir)
    assert(after <= before)
    val st = Bm25Index.status(spark, dir)
    assert(st.liveTombstoneFiles === 0L, "compact must clear tombstones")
    val postCompact = collectScores(Bm25Index.search(spark, dir, terms))
    assert(postCompact === preCompact)
    // post-compact serving equals the live scan over the shrunk corpus
    assert(postCompact === collectScores(TextAnalysis.bm25Search(
      corpus(docs.filterNot(d => d._1 == 8L || d._1 == 2L)), terms)))
    // dead doc stays gone after a fresh append (tombstone fold did not
    // resurrect anything)
    Bm25Index.append(spark, corpus(Seq((9L, "one more stream doc"))), dir)
    val withNine = collectScores(Bm25Index.search(spark, dir, terms))
    assert(withNine.exists(_._1 == 9L) && !withNine.exists(_._1 == 8L))
  }

  test("stats_corrected readout: true only while tombstones are outstanding") {
    // the serving-cost column (round-19): a fresh index serves off the
    // pure pruned-bucket path (false), an outstanding takedown makes
    // every probe pay the doclen correction (true — compact would
    // pay), and compact restores the fast path (false again)
    def flags(dir: String): Set[Boolean] =
      Bm25Index.search(spark, dir, terms).select(col("stats_corrected"))
        .collect().map(_.getBoolean(0)).toSet
    val dir = freshDir()
    Bm25Index.build(spark, corpus(), dir)
    assert(flags(dir) === Set(false), "fresh build must be uncorrected")
    Bm25Index.delete(spark, dir, Seq(8L))
    assert(flags(dir) === Set(true), "outstanding tombstone must flag")
    Bm25Index.compact(spark, dir)
    assert(flags(dir) === Set(false), "compact must restore the fast path")
  }

  test("re-ingest after takedown: rebuild clears tombstones") {
    val dir = freshDir()
    Bm25Index.build(spark, corpus(), dir)
    Bm25Index.delete(spark, dir, Seq(1L))
    assert(!collectScores(Bm25Index.search(spark, dir, terms))
      .exists(_._1 == 1L))
    Bm25Index.build(spark, corpus(), dir)
    assert(collectScores(Bm25Index.search(spark, dir, terms))
      .exists(_._1 == 1L))
  }

  test("terms absent from the corpus score nothing; empty terms empty") {
    val dir = freshDir()
    Bm25Index.build(spark, corpus(), dir)
    assert(Bm25Index.search(spark, dir, Seq("zzz_not_there")).count() === 0L)
    val one = collectScores(Bm25Index.search(spark, dir,
      Seq("zzz_not_there", "parquet")))
    assert(one.map(_._1) === Seq(3L)) // only doc 3 mentions parquet
  }

  test("wrong format generation fails loudly") {
    val dir = freshDir()
    graft.operators.TextIndex.build(spark, corpus(), dir)
    val e = intercept[IllegalArgumentException] {
      Bm25Index.search(spark, dir, terms).collect()
    }
    assert(e.getMessage.contains("rebuild"))
  }

  test("serving scan prunes to the query terms' buckets") {
    val dir = freshDir()
    Bm25Index.build(spark, corpus(), dir)
    val plan = Bm25Index.search(spark, dir, terms)
      .queryExecution.executedPlan.toString()
    // the probed buckets + the term filter must reach the scan
    assert(plan.contains("PartitionFilters"))
    val tbs = terms.map(Bm25Index.termBucket).distinct
    tbs.foreach(tb => assert(plan.contains(tb.toString)))
  }

  test("gate key serve_bm25_probe matches text_bm25_search on testdata") {
    val served = collectScores(
      Bm25Index.serveBm25Probe(spark, Sf))
    val live = collectScores(TextAnalysis.bm25Search(
      graft.Tables.documents(spark, Sf), terms))
    assert(served === live)
  }
}
