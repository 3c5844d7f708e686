package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pretrain, Sharding}
import graft.Tables.documents

/** The production-hash toggle (md5 → xxhash64) must preserve every
  * DISTRIBUTION property the md5 gate path guarantees — permutation
  * validity, split coverage and proportions, per-stratum exactness,
  * interleave round balance, DSIR evidence counts — while only the
  * (arbitrary) draw itself changes. These pins are what make the
  * 100 TB deployment story "flip `hash=xxhash64`" instead of "re-audit
  * five operators". */
class HashParitySpec extends SparkSpec {

  private def docs = documents(spark, Sf)

  test("xxhash64 shuffle is a complete permutation, distinct from md5's") {
    val n = docs.count()
    val xx = Sharding.globalShuffle(docs, hashMode = "xxhash64")
    val pos = xx.select("shuffle_pos").collect().map(_.getLong(0)).sorted
    assert(pos.toSeq == (1L to n).toSeq, "positions must be exactly 1..N")
    // the two modes draw different permutations (first rows differ
    // somewhere — P[identical] ~ 1/N!)
    val md = Sharding.globalShuffle(docs, hashMode = "md5")
      .select("doc_id", "shuffle_pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val xm = xx.select("doc_id", "shuffle_pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(md != xm, "xxhash64 must be an independent draw, not md5 renamed")
  }

  test("xxhash64 split covers every doc with sane proportions; deterministic") {
    val s1 = Sharding.assignSplits(docs, hashMode = "xxhash64")
    val byName = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(byName.values.sum == n.toLong, "every doc must land in a split")
    // 0.9/0.05/0.05 targets; 500 docs → binomial 3σ ≈ ±0.04
    assert(byName("train") / n > 0.84 && byName("train") / n < 0.96, byName)
    assert(byName.getOrElse("val", 0L) / n < 0.10, byName)
    assert(byName.getOrElse("test", 0L) / n < 0.10, byName)
    val s2 = Sharding.assignSplits(docs, hashMode = "xxhash64")
    assert(s1.collect().toSeq == s2.collect().toSeq,
      "same seed + mode must reproduce the identical assignment")
  }

  test("xxhash64 interleave: valid permutation AND source-balanced rounds") {
    val il = Sharding.sourceInterleave(docs, hashMode = "xxhash64")
    val rows = il.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = rows.length
    assert(rows.map(_._3).sorted.toSeq == (1L to n).toSeq)
    // round balance: walking positions in order, a source may not
    // repeat until every still-live source has appeared (each round is
    // one doc per surviving source, ordered by source name)
    val sizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val byPos = rows.sortBy(_._3).map(_._2)
    var idx = 0
    var round = 0
    while (idx < n) {
      val live = sizes.filter(_._2 > round).keys.toSeq.sorted
      val slice = byPos.slice(idx, idx + live.length)
      assert(slice.toSeq == live,
        s"round $round must hold exactly the live sources in order: " +
          s"got ${slice.toSeq} want $live")
      idx += live.length
      round += 1
    }
  }

  test("xxhash64 per-group sample keeps exactly k per stratum") {
    val s = Sharding.samplePerGroup(docs, k = 5, hashMode = "xxhash64")
    val perLang = s.groupBy("lang").count().collect().map(_.getLong(1))
    assert(perLang.forall(_ == 5L), perLang.toSeq.toString)
  }

  test("xxhash64 DSIR scores the same docs with the same evidence counts") {
    val md = Pretrain.dsirWeight(docs).select("doc_id", "n_grams")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val xx = Pretrain.dsirWeight(docs, hashMode = "xxhash64")
    val xm = xx.select("doc_id", "n_grams")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bucket hashing moves WHICH bucket a bigram lands in, never how
    // many bigrams a doc contributes — the all-B-bucket model keeps
    // every bigram joined in both modes
    assert(md == xm, "per-doc bigram evidence must not depend on the hash")
    assert(xx.collect().forall(r => !r.getDouble(2).isNaN), "weights finite")
  }

  test("xxhash64 mixture respects per-lang token budgets like md5") {
    val w = Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.1)
    val xx = Sharding.mixCorpus(docs, w, hashMode = "xxhash64")
      .groupBy("lang").agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the binding lang keeps ~all its tokens; every kept lang is weighted
    assert(xx.keySet.subsetOf(w.keySet), xx.toString)
    assert(xx.values.forall(_ > 0L), xx.toString)
  }

  test("pipelineView exposes the knob; unknown mode fails loudly") {
    val view = GraftEngine.pipelineView(spark, "pipeline_shuffle", Sf,
      Map("hash" -> "xxhash64"))
    assert(spark.table(view).count() == docs.count())
    val e = intercept[IllegalArgumentException] {
      GraftEngine.pipelineView(spark, "pipeline_split", Sf,
        Map("hash" -> "fnv1a")).length
    }
    assert(e.getMessage.contains("hash mode"), e.getMessage)
  }
}
