package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Planted near-duplicates must surface as candidate pairs; unrelated
  * docs must not flood the result. */
class DedupSpec extends SparkSpec {

  /** sf0.001 docs + planted near-dups: clone doc_id<5 with a small tail
    * edit, cloned ids offset by +100000. */
  private lazy val planted = {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val clones = docs.where(col("doc_id") < 5)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" tiny appended tail")).as("text"))
    docs.unionByName(clones)
  }

  test("minhash LSH finds every planted near-duplicate pair") {
    val pairs = Dedup.minhashLshPairs(planted)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach { id =>
      assert(pairs.contains((id, id + 100000)),
        s"planted pair ($id, ${id + 100000}) missing from LSH candidates")
    }
  }

  test("minhash calibration: est tracks true Jaccard on every candidate pair") {
    val rows = Dedup.minhashCalibration(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // every planted near-identical pair is a candidate and both
    // numbers agree it is a near-dup
    (0L until 5L).foreach { id =>
      val (est, tru, _) = rows.getOrElse((id, id + 100000),
        fail(s"planted pair ($id) missing from calibration"))
      assert(tru > 0.7, s"true jaccard $tru not near-dup for planted $id")
      assert(est > 0.5, s"est jaccard $est implausibly low for planted $id")
    }
    // 128 permutations: the estimator is unbiased with std
    // sqrt(J(1-J)/128) <= 0.045 — allow 6 sigma per pair, and the MEAN
    // error across candidates must be far tighter
    rows.foreach { case (ids, (_, _, err)) =>
      assert(err < 0.27, s"pair $ids calibration error $err")
    }
    val meanErr = rows.values.map(_._3).sum / rows.size
    assert(meanErr < 0.10, f"mean |est-true| $meanErr%.3f — banding broken")
  }

  test("simhash finds planted near-duplicates within hamming 6") {
    // single-word edits: simhash is a small-edit detector — a one-word
    // change shifts each tf-weighted bit sum by at most 1
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val clones = docs.where(col("doc_id") < 5)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" addendum")).as("text"))
    val pairs = Dedup.simhashPairs(docs.unionByName(clones))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0L until 5L).count(id => pairs.contains((id, id + 100000)))
    assert(found >= 4, s"only $found/5 planted pairs within hamming<=6")
  }

  test("ngram jaccard scores planted pairs above 0.7 and exact") {
    val rows = Dedup.ngramJaccardPairs(planted).collect()
    val planted5 = rows.filter(r => r.getLong(1) == r.getLong(0) + 100000)
    assert(planted5.length == 5)
    planted5.foreach(r => assert(r.getDouble(2) > 0.7 && r.getDouble(2) <= 1.0))
  }

  test("postings cap neutralizes a planted boilerplate shingle") {
    import spark.implicits._
    // 300 docs share one boilerplate sentence (df=300 ≫ cap): uncapped,
    // its shingles alone emit ~300²/2 intermediate pairs; capped, the
    // blocked shingles vanish and only the planted near-dup pair (its
    // own unique shingles, df=2) survives.
    val boiler = "terms of service apply to all content herein"
    val filler = (0L until 300L).map(i =>
      (i, s"$boiler unique$i alpha$i bravo$i charlie$i delta$i echo$i"))
    val dupText = "quebec whiskey tango xray yankee zulu oscar papa romeo sierra"
    val docs = (filler :+ (1000L, dupText) :+ (1001L, dupText + " end"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, maxDf = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1000L, 1001L)),
      s"expected only the planted pair, got ${pairs.mkString(", ")}")
  }

  test("exact dedup keeps one row per distinct text") {
    val docs = Tables.documents(spark, Sf)
    val distinctTexts = docs.select(col("text")).distinct().count()
    assert(Dedup.dedupExact(spark, Sf).count() == distinctTexts)
  }

  test("star-edge bucket graph yields identical clusters to the pair-clique graph") {
    import graft.operators.Components
    val docs = Tables.documents(spark, Sf)
    val viaPairs = Components.connectedComponents(Dedup.minhashLshPairs(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaEdges = Components.connectedComponents(Dedup.minhashLshEdges(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same node set, same min-label per component
    assert(viaEdges == viaPairs,
      s"cluster mismatch: ${viaEdges.toSet.diff(viaPairs.toSet).take(5)}")
    // and the edge volume is linear: a bucket of n contributes n-1 edges
    val nEdges = Dedup.minhashLshEdges(docs).count()
    val nPairs = Dedup.minhashLshPairs(docs).count()
    assert(nEdges <= nPairs || nPairs == 0, s"edges $nEdges > pairs $nPairs")
  }

  test("simhash star-edge graph yields identical clusters to the unverified pair-clique graph") {
    import graft.operators.Components
    val docs = Tables.documents(spark, Sf)
    // maxHamming = 64 disables verification, so the pairs path is the
    // pure bucket clique — the graph the star edges must reproduce
    val viaPairs = Components.connectedComponents(Dedup.simhashPairs(docs, 64))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaEdges = Components.connectedComponents(Dedup.simhashEdges(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaEdges == viaPairs,
      s"cluster mismatch: ${viaEdges.toSet.diff(viaPairs.toSet).take(5)}")
    // linear edge volume, and every hamming-VERIFIED pair co-clusters
    val nEdges = Dedup.simhashEdges(docs).count()
    val nPairs = Dedup.simhashPairs(docs, 64).count()
    assert(nEdges <= nPairs || nPairs == 0, s"edges $nEdges > pairs $nPairs")
    Dedup.simhashPairs(docs).collect().foreach { r =>
      assert(viaEdges(r.getLong(0)) == viaEdges(r.getLong(1)),
        s"verified pair (${r.getLong(0)}, ${r.getLong(1)}) split across clusters")
    }
  }

  test("substring spans: planted cross-doc run surfaces as one merged span") {
    import spark.implicits._
    // docs 1 and 2 share an exact 10-token run inside otherwise-unique
    // text; doc 3 repeats an 8-token run twice WITHIN itself only
    val shared = "the quick brown fox jumps over the lazy sleeping dog"
    val within = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"aard1 aard2 aard3 aard4 $shared tail1 tail2 tail3"),
      (2L, s"bolt1 bolt2 $shared coda1 coda2 coda3 coda4 coda5"),
      (3L, s"cave1 $within cave2 $within cave3"))
      .toDF("doc_id", "text")
    val out = Dedup.substringSpans(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // a 10-token shared run at window size 8 → 3 fully-inside windows,
    // merging to 1 span covering the 10 shared tokens
    assert(out(1L) == ((3L, 1L, 10L)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((3L, 1L, 10L)), s"doc2: ${out(2L)}")
    // within-doc-only repetition is not cross-document duplication
    assert(out(3L) == ((0L, 0L, 0L)), s"doc3: ${out(3L)}")
  }

  test("substring spans: two separated shared runs merge into two spans") {
    import spark.implicits._
    val runA = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8
    val runB = "iota kappa lambda mu nu xi omicron pi"         // exactly 8
    val docs = Seq(
      (1L, s"u1 u2 $runA v1 v2 v3 v4 v5 v6 v7 v8 v9 $runB u3"),
      (2L, s"w1 $runA w2 w3 w4 w5 w6 w7 w8 w9 w10 $runB"))
      .toDF("doc_id", "text")
    val out = Dedup.substringSpans(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(1L) == ((2L, 2L, 16L)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((2L, 2L, 16L)), s"doc2: ${out(2L)}")
  }

  test("positional ngram kernel: window count and distinct-set parity") {
    import graft.functions.HashFunctions.{ngramHashes, ngramHashesPos}
    val docs = Tables.documents(spark, Sf)
    val bad = docs.select(
        size(split(lower(col("text")), "\\s+")).as("nw"),
        size(ngramHashesPos(col("text"), 8)).as("npos"),
        array_sort(array_distinct(ngramHashesPos(col("text"), 8))).as("pd"),
        ngramHashes(col("text"), 8).as("nh"))
      .where(col("npos") =!= greatest(col("nw") - 7, lit(1)) ||
        col("pd") =!= col("nh"))
      .count()
    assert(bad == 0, s"$bad docs violate positional-kernel parity")
  }

  test("incremental ingest admits only first-of-kind batch docs absent from the corpus") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha"), // exact dup of corpus → dropped
      (11L, "gamma"), // new → kept
      (12L, "gamma"), // within-batch dup → collapsed into 11
      (13L, "delta")  // new → kept
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalIngest(corpus, batch).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(11L -> 2L, 13L -> 1L), out.toString)
  }
}
