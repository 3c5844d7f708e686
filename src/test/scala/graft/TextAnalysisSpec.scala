package graft

import graft.operators.TextAnalysis

/** Planted-data semantics for the corpus-level text statistics; the
  * sf-corpus outputs are DuckDB-oracle-checked by the driver gate. */
class TextAnalysisSpec extends SparkSpec {

  test("top tokens: frequency order with deterministic tie-break") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple apple banana banana cherry"),
      (2L, "banana cherry date")).toDF("doc_id", "text")
    val out = TextAnalysis.topTokens(docs, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // banana ties apple at 3; cherry 2; tie at cnt=3 breaks by token asc
    assert(out.toSeq == Seq(("apple", 3L), ("banana", 3L), ("cherry", 2L)))
  }

  test("unigram logprob ranks common-token docs above rare-token docs") {
    import spark.implicits._
    val common = (1 to 20).map(_ => "the cat sat").mkString(" ")
    val docs = Seq(
      (1L, common),                      // tokens all high-frequency
      (2L, "zyzzyva qwerty flurble"))    // three singletons
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogprob(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L),
      s"common doc must outscore rare doc: ${out(1L)} vs ${out(2L)}")
    // singleton tokens: lp = ln(1/total) exactly, total = 63 tokens
    val expected = math.round(math.log(1.0 / 63.0) * 1e9) / 1e9
    assert(math.abs(out(2L) - BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("smoothed logprob: exact on head tokens, floored on the tail, broadcast scoring join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val common = (1 to 20).map(_ => "the cat sat").mkString(" ")
    val docs = Seq(
      (1L, common),                      // every token df=20 > dfMin
      (2L, "zyzzyva qwerty flurble"))    // three singletons (tail)
      .toDF("doc_id", "text")
    val exact = TextAnalysis.unigramLogprob(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sm = TextAnalysis.unigramLogprobSmoothed(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // head-only doc: identical score (its tokens never floor)
    assert(sm(1L) == exact(1L), s"head doc changed: ${sm(1L)} vs ${exact(1L)}")
    // tail doc: floored to ln(dfMin/total) per token — raised, still worst
    val floored = BigDecimal(math.round(math.log(5.0 / 63.0) * 1e9) / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(sm(2L) - floored) < 1e-9, s"${sm(2L)} vs $floored")
    assert(sm(1L) > sm(2L), "ranking must be preserved")
    // the scoring join must broadcast: the corpus token stream may only
    // hash-exchange for the head build and the per-doc agg, never to
    // co-locate with the vocabulary
    val p = TextAnalysis.unigramLogprobSmoothed(docs)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"vocabulary head must broadcast onto the token stream:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"token stream must not shuffle through the vocab join:\n$p")
  }
}
