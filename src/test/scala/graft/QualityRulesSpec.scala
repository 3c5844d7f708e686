package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityRules

/** Planted-data semantics for the rule-based curation operators; the
  * sf-corpus outputs are oracle-checked by the driver gate. */
class QualityRulesSpec extends SparkSpec {

  test("PII redaction replaces emails, IPs and long digit runs") {
    import spark.implicits._
    val df = Seq(
      "mail me at jane.doe+x@example.org or box 123456789012 thanks",
      "server 10.0.255.7 is fine; short num 1234 stays").toDF("text")
      .select(QualityRules.redactPii(col("text")).as("r"))
    val out = df.collect().map(_.getString(0))
    assert(out(0) == "mail me at [EMAIL] or box [NUM] thanks")
    assert(out(1) == "server [IP] is fine; short num 1234 stays")
  }

  test("gopher rules gate: planted good and bad docs") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and runs to town"
    val allNums = "1 2 3 4 5 6 7 8 9 10 11 12"
    val tooShort = "the end"
    val docs = Seq((1L, good), (2L, allNums), (3L, tooShort))
      .toDF("doc_id", "text")
    val keep = QualityRules.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(keep == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("boilerplate paragraphs surface cross-doc repeats only") {
    import spark.implicits._
    val boiler = "all rights reserved click here to unsubscribe now"
    val docs = Seq(
      (1L, s"unique alpha text body one long enough. $boiler"),
      (2L, s"different beta content body two also long. $boiler"),
      (3L, "totally original gamma paragraph nothing repeated here"))
      .toDF("doc_id", "text")
    val out = QualityRules.boilerplateParagraphs(docs).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 2L) // df, n_docs
    assert(out(0).getLong(3) == 1L) // first_doc
  }

  test("ngram_hashes kernel is cardinality- and match-equivalent to string shingles") {
    import graft.functions.HashFunctions.ngramHashes
    import graft.functions.TextFunctions.shingles
    val docs = Tables.documents(spark, Sf)
    // per-doc gram-set size must equal the string formulation's
    val mismatch = docs.select(
      size(ngramHashes(col("text"), 8)).as("a"),
      size(shingles(col("text"), 8)).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(mismatch == 0, s"$mismatch docs with diverging gram cardinality")
    // the screen over hashed grams must flag exactly the docs the
    // string-gram join flags, with the same overlap counts
    val corpus = docs.where(col("doc_id") % 97 =!= 0)
    val eval_ = docs.where(col("doc_id") % 97 === 0)
    val viaStrings = corpus
      .select(col("doc_id"), explode(shingles(col("text"), 8)).as("ng"))
      .join(eval_.select(explode(shingles(col("text"), 8)).as("ng")).distinct(),
        Seq("ng"))
      .groupBy(col("doc_id")).agg(countDistinct(col("ng")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaKernel = QualityRules.contaminationScreen(corpus, eval_)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaKernel == viaStrings)
  }

  test("contamination screen counts distinct shared 8-grams") {
    import spark.implicits._
    val evalDoc = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val clean = "one two three four five six seven eight nine ten eleven"
    // contaminated doc embeds 3 words of lead-in + the eval text: shares
    // the eval doc's 3 8-gram windows (10 words → 3 windows)
    val contaminated = s"lead in words $evalDoc"
    val corpus = Seq((1L, contaminated), (2L, clean)).toDF("doc_id", "text")
    val eval_ = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val out = QualityRules.contaminationScreen(corpus, eval_).collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L)
    assert(out(0).getLong(1) == 3L, s"expected 3 shared 8-grams, got ${out(0)}")
  }

  test("repetition stats flag a looping doc, pass diverse text, exact fractions") {
    import spark.implicits._
    val looping = Array.fill(10)("buy cheap pills now").mkString(" ") // 40 words
    val diverse = "the quick brown fox jumps over one lazy dog while rain falls softly tonight"
    val docs = Seq((1L, looping), (2L, diverse), (3L, "too few here")) // doc 3: <5 words
      .toDF("doc_id", "text")
    val out = QualityRules.repetitionStats(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(!out.contains(3L), "sub-5-word doc must be excluded")
    // looping doc: 40 words → 39 2-grams; "pills now"/"cheap pills"/
    // "buy cheap" occur 10×, "now buy" 9× → top2 = 10/39
    assert(math.abs(out(1L)._1 - math.rint(10.0 / 39 * 1e6) / 1e6) < 1e-9, out(1L).toString)
    // every 5-gram of the loop repeats → dup5 = 1.0
    assert(out(1L)._3 == 1.0, s"looping doc dup5 ${out(1L)._3}")
    assert(!out(1L)._4, "looping doc must fail the gate")
    // diverse doc: all grams unique → top fractions are 1/n, dup5 = 0
    assert(out(2L)._3 == 0.0 && out(2L)._4, s"diverse doc must pass: ${out(2L)}")
  }

  test("dup n-gram share: repeated boilerplate counts, unique prose doesn't") {
    import spark.implicits._
    val boiler = "click here to subscribe to our amazing newsletter right now"
    val docs = Seq(
      // doc 1: boilerplate + unique tail — exactly the boilerplate's
      // grams duplicate (they recur in doc 2)
      (1L, s"$boiler alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$boiler iota kappa lambda mu nu xi omicron pi"),
      // doc 3: fully unique 10-word prose — zero duplicated grams
      (3L, "the quiet river bends east beyond the old stone bridge"),
      // doc 4: self-repetition duplicates against ITSELF
      (4L, ("spam ham " * 8).trim)
    ).toDF("doc_id", "text")
    val got = QualityRules.dupNgramShare(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // 18 words → 11 positional 8-grams; grams fully inside the 10-word
    // boilerplate prefix: positions 1..3 → 3 dup grams
    assert(got(1L)._1 == 11L && got(1L)._2 == 3L, got(1L).toString)
    assert(got(2L) == got(1L), "symmetric twin must match")
    assert(got(3L)._2 == 0L && got(3L)._3 == 0.0, got(3L).toString)
    // 16 words of "spam ham"×8 → 9 grams, all equal to each other
    assert(got(4L)._1 == 9L && got(4L)._2 == 9L && got(4L)._3 == 1.0,
      got(4L).toString)
  }

  test("domain gate drops every doc of a low-mean source, keeps the rest") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six", "good"),   // 6 words
      (2L, "one two three four five six seven eight", "good"), // 8
      (3L, "short", "farm"), (4L, "also short", "farm") // mean 1.5
    ).toDF("doc_id", "text", "source")
    val kept = QualityRules.domainGate(docs, minMeanWords = 5.0).collect()
    assert(kept.map(_.getLong(0)).toSet == Set(1L, 2L))
    // the verdict column carries the source mean, same for both docs
    assert(kept.forall(_.getDouble(2) == 7.0))
  }

  test("source overlap: exact jaccard on planted mirror, zero pairs reported, no window") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h", "srcA"),            // gram g1
      (2L, "a b c d e f g h", "srcB"),            // g1 mirrored into B
      (3L, "x y z q r s t u", "srcB"),            // B also has g2
      (4L, "totally different words over here now ok", "srcC")) // g3
      .toDF("doc_id", "text", "source")
    val out = QualityRules.sourceOverlap(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out.size == 3, s"need the full pair grid: ${out.keySet}")
    assert(out(("srcA", "srcB")) == ((1L, 2L, 1L, 0.5)),
      s"mirror pair wrong: ${out(("srcA", "srcB"))}")
    assert(out(("srcA", "srcC"))._4 == 0.0 && out(("srcB", "srcC"))._4 == 0.0,
      "disjoint sources must report jaccard 0, not vanish")
    val df = QualityRules.pipelineSourceOverlap(spark, Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"overlap must not window:\n$plan")
  }

  test("near-dedup rate attributes collapse to the source that pays it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text"), lit("clean").as("source"))
    // source 'dupey': 3 near-identical copies of a UNIQUE synthetic
    // doc (a real corpus doc may have natural near-dups, pulling the
    // keeper into 'clean' — global dedup semantics) + 1 unrelated doc
    // — expected keep 2 of 4, rate 0.5
    val seedText = (1 to 60).map(i => s"zyxq$i").mkString(" ")
    val dupes = Seq(
      (900001L, seedText + " tail one", "dupey"),
      (900002L, seedText + " tail two", "dupey"),
      (900003L, seedText + " tail three", "dupey"),
      (900004L, "completely unrelated standalone document text", "dupey")
    ).toDF("doc_id", "text", "source")
    val rates = graft.operators.QualityRules
      .nearDedupRate(base.where(col("doc_id") > 0).unionByName(dupes))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val (nd, rd) = rates("dupey")
    assert(nd == 4L && rd == 0.5, s"dupey: $rates")
    // the clean corpus may carry a few natural near-dups, but nothing
    // like the planted half
    assert(rates("clean")._2 < 0.2, s"clean source rate: $rates")
  }
}
