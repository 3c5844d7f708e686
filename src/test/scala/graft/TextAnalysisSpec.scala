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

  test("BM25: exact scores vs a driver-side reference, term filter before any shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "vector stream vector window noise noise"),   // all 3 terms, tf(vector)=2
      (2L, "vector filler filler filler filler filler filler filler"), // long, 1 hit
      (3L, "stream window"),                             // short, 2 hits
      (4L, "nothing relevant here at all"))              // no hits
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25Search(docs, Seq("vector", "stream", "window"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // driver-side Okapi BM25 with the same rounding discipline
    val corpus = Map(1L -> "vector stream vector window noise noise",
      2L -> "vector filler filler filler filler filler filler filler",
      3L -> "stream window")
    val dls = Map(1L -> 6.0, 2L -> 8.0, 3L -> 2.0, 4L -> 5.0)
    val nDocs = 4.0
    val avgdl = dls.values.sum / 4
    def dfOf(t: String) = corpus.values.count(_.split(" ").contains(t)).toDouble
    def score(id: Long): Double = {
      val terms = Seq("vector", "stream", "window")
        .map(t => t -> corpus(id).split(" ").count(_ == t).toDouble)
        .filter(_._2 > 0)
      val parts = terms.map { case (t, tf) =>
        val raw = math.log((nDocs - dfOf(t) + 0.5) / (dfOf(t) + 0.5) + 1.0) *
          (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dls(id) / avgdl))
        BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
      parts.sum.toDouble
    }
    assert(got.keySet == Set(1L, 2L, 3L), s"hit set wrong: $got")
    Seq(1L, 2L, 3L).foreach { id =>
      assert(math.abs(got(id)._1 - score(id)) < 1e-9,
        s"doc $id: ${got(id)._1} vs ${score(id)}")
    }
    assert(got(1L)._2 == 3L && got(2L)._2 == 1L && got(3L)._2 == 2L)
    assert(got(1L)._1 > got(2L)._1, "3-term doc must outrank 1-term doc")
    // plan: the df/stats sides broadcast; the corpus token stream only
    // hash-exchanges matched (doc, term) rows for tf — never raw tokens
    val p = TextAnalysis.bm25Search(docs, Seq("vector", "stream", "window"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"df and corpus stats must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-side merge join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$p")
  }

  test("compression ratio orders repetitive < prose < gibberish; empty = 1; deterministic") {
    import spark.implicits._
    import graft.functions.DeflateRatio.deflateRatio
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(3)
    val docs = Seq(
      (1L, "spam ham " * 200),                                   // repetitive
      (2L, ("the quick brown fox jumps over the lazy dog and " +
        "wanders slowly home through the quiet evening fields ") * 20),
      (3L, Array.fill(400)(rng.nextPrintableChar()).mkString),   // gibberish
      (4L, "")
    ).toDF("doc_id", "text")
    def run(): Map[Long, Double] = docs
      .select(col("doc_id"), deflateRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = run()
    assert(got(1L) < got(2L) && got(2L) < got(3L),
      s"ordering violated: $got")
    assert(got(1L) < 0.1, s"pure repetition must compress hard: ${got(1L)}")
    assert(got(3L) > 0.7, s"random chars must barely compress: ${got(3L)}")
    assert(got(4L) == 1.0, "empty doc is the identity ratio")
    assert(run() == got, "deflate ratio must be deterministic")
    // the gate entry stays inside whole-stage codegen, no UDF
    val df = graft.operators.TextAnalysis.textCompressionRatio(spark, Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in the compact plan string
    assert(!plan.contains("UDF") && plan.contains("*("),
      s"kernel left codegen:\n$plan")
  }

  test("ngram novelty: first doc 1.0, verbatim repeat 0.0, half-new 0.5, no window in plan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),       // one 8-gram, first seen here
      (2L, "a b c d e f g h"),       // same gram -> nothing novel
      (3L, "a b c d e f g h i"))     // grams [a..h] (old), [b..i] (new)
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 1.0), (2L, 1L, 0L, 0.0), (3L, 2L, 1L, 0.5)),
      s"got ${out.toSeq}")
    // short doc (<8 words) contributes exactly one whole-doc gram
    val short = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text")
    val so = TextAnalysis.ngramNovelty(short).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(so.toSeq == Seq((1L, 1L, 1.0), (2L, 1L, 0.0)))
    // plan shape: min() agg + join-back — no Window node anywhere, and
    // the (doc, gram) reduction feeds both sides (one tokenize)
    val df = TextAnalysis.textNgramNovelty(spark, Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"novelty must not window:\n$plan")
  }

  test("source divergence: identical sources at 0; disjoint pairs share nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha", "s1"),
      (2L, "alpha beta gamma alpha", "s2"),  // identical distribution
      (3L, "alpha beta gamma gamma", "s3"),  // shifted distribution
      (4L, "delta epsilon zeta", "s4")       // disjoint vocabulary
    ).toDF("doc_id", "text", "source")
    val rows = TextAnalysis.sourceDivergence(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(math.abs(rows(("s1", "s2"))) < 1e-12,
      s"identical sources must diverge 0: ${rows(("s1", "s2"))}")
    val d13 = rows(("s1", "s3"))
    assert(d13 > 0 && d13 < math.log(2.0),
      s"shifted source must sit strictly inside (0, ln 2): $d13")
    // JS is symmetric in construction: (s2,s3) ≡ (s1,s3)
    assert(rows(("s2", "s3")) == d13, rows.toString)
    // a disjoint-vocabulary pair shares no token and drops from the
    // matrix (its JS is the ln 2 ceiling by definition)
    assert(!rows.keySet.exists(k => k._1 == "s4" || k._2 == "s4"),
      s"disjoint source leaked a shared-token row: ${rows.keySet}")
  }

  test("skipgram PMI: window=1 IS bigram PMI; a gapped collocation needs window>1") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf)
    val bi = TextAnalysis.pmiBigrams(docs, minCount = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val sg1 = TextAnalysis.skipgramPmi(docs, window = 1, minCount = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(sg1 == bi, s"window-1 skipgram diverges from bigram PMI: " +
      s"only-sg=${(sg1.keySet -- bi.keySet).take(3)} " +
      s"only-bi=${(bi.keySet -- sg1.keySet).take(3)}")
    // planted gapped collocation: "alpha <filler> omega" repeated —
    // never adjacent, always within a 2-window
    val planted = (1L to 30L)
      .map(i => (i, s"alpha filler$i omega common words here"))
      .toDF("doc_id", "text")
    val biP = TextAnalysis.pmiBigrams(planted, minCount = 5).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val sgP = TextAnalysis.skipgramPmi(planted, window = 2, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!biP.contains(("alpha", "omega")), "bigram can't see the gap")
    assert(sgP.contains(("alpha", "omega")),
      s"window-2 skipgram must mine the gapped pair: $sgP")
  }
}
