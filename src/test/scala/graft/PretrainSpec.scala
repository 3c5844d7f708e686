package graft

import org.apache.spark.sql.functions._
import graft.operators.Pretrain

/** Planted-data semantics for the pretraining-selection operators
  * (DSIR weights, CCNet buckets, bigram LM, char entropy); the
  * sf-corpus outputs are DuckDB-oracle-checked by the driver gate. */
class PretrainSpec extends SparkSpec {

  test("dsir: target-like docs outweigh off-target docs; planted doc count") {
    import spark.implicits._
    // target slice (lang=en) speaks in "the cat sat" bigrams; the
    // off-target docs reuse them (raw mass) plus their own bigrams
    val en = (1 to 10).map(i => (i.toLong, "the cat sat on the mat", "en"))
    val de = (11 to 14).map(i => (i.toLong, "der hund lief durch den wald", "de"))
    val mixed = Seq((15L, "the cat sat der hund lief", "de"))
    val docs = (en ++ de ++ mixed).toDF("doc_id", "text", "lang")
    val out = Pretrain.dsirWeight(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.size == 15) // every doc has >= 2 tokens
    // a pure-target-bigram doc must outweigh a pure-off-target doc,
    // and the mixed doc must land between them
    assert(out(1L) > out(15L) && out(15L) > out(11L),
      s"target ${out(1L)} > mixed ${out(15L)} > off ${out(11L)} expected")
  }

  test("dsir: identical docs get identical weights; n_grams = tokens-1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d", "en"), (2L, "a b c d", "en"), (3L, "x", "de"))
      .toDF("doc_id", "text", "lang")
    val rows = Pretrain.dsirWeight(docs).collect()
    assert(rows.length == 2) // the 1-token doc has no bigram evidence
    assert(rows(0).getLong(1) == 3 && rows(1).getLong(1) == 3)
    assert(rows(0).getDouble(2) == rows(1).getDouble(2))
  }

  test("ccnet buckets: per-lang terciles partition docs head/middle/tail") {
    val out = Pretrain.qualityCcnetBucket(spark, Sf)
    val byLang = out.groupBy(col("lang"), col("ppl_bucket")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = byLang.keys.map(_._1).toSet
    langs.foreach { l =>
      val h = byLang.getOrElse((l, "head"), 0L)
      val m = byLang.getOrElse((l, "middle"), 0L)
      val t = byLang.getOrElse((l, "tail"), 0L)
      val n = h + m + t
      assert(n > 0)
      // terciles: each bucket within ~40% of n/3 (small langs are lumpy)
      Seq(h, m, t).foreach(b =>
        assert(b >= n / 3 - (n * 2) / 5 - 1 && b <= n / 3 + (n * 2) / 5 + 1,
          s"lang $l bucket sizes ($h,$m,$t) not tercile-ish"))
    }
    // every doc bucketed exactly once
    assert(out.count() ==
      Tables.documents(spark, Sf).count())
  }

  test("bigram logprob: deterministic continuations score ln(1)=0, forks score ln(1/2)") {
    import spark.implicits._
    // corpus: "a b" twice and "a c" twice → p(b|a)=p(c|a)=1/2;
    // every other continuation is deterministic
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "a c"))
      .toDF("doc_id", "text")
    val out = Pretrain.bigramLogprob(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 4)
    val half = BigDecimal(math.round(math.log(0.5) * 1e9))./(BigDecimal(1e9))
    out.foreach { case (_, n, lp) =>
      assert(n == 1)
      assert(math.abs(lp - half.setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9, s"p(.|a)=1/2 ⇒ mean lp=ln(.5), got $lp")
    }
  }

  test("bigram logprob beats unigram at spotting shuffled token soup") {
    import spark.implicits._
    val fluent = (1 to 30).map(_ => "the cat sat on the mat").mkString(" ")
    // same token multiset, order-scrambled (seeded): unigram can't
    // tell them apart, bigram can — a cyclic rearrangement would NOT
    // work here, it is exactly as bigram-predictable as the original
    val soup = new scala.util.Random(7)
      .shuffle(fluent.split(" ").toList).mkString(" ")
    val docs = Seq((1L, fluent), (2L, soup)).toDF("doc_id", "text")
    val bg = Pretrain.bigramLogprob(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // both share mass at the seam bigrams, but the fluent doc's
    // dominant transitions are higher-probability
    assert(bg(1L) > bg(2L), s"fluent ${bg(1L)} must outscore soup ${bg(2L)}")
  }

  test("char entropy: uniform alphabet maxes out, repetition collapses to 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefgh"),        // 8 distinct chars, uniform → 3 bits
      (2L, "aaaaaaaa"),        // single char → 0 bits
      (3L, "日本語テキスト"),     // no printable ASCII → n=0, ent=0
      (4L, "")).toDF("doc_id", "text")
    val out = Pretrain.textCharEntropy(spark, "/root/testdata/sf0.001") // warm plan
    val rows = docs.select(col("doc_id"),
        graft.functions.CharEntropy.charEntropy(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_printable"),
        round(col("st.ent").cast("double"), 6).as("e"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(rows(1L) == ((8, 3.0)))
    assert(rows(2L) == ((8, 0.0)))
    assert(rows(3L) == ((0, 0.0)))
    assert(rows(4L) == ((0, 0.0)))
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_printable", "char_entropy"))
  }

  test("char entropy kernel stays inside whole-stage codegen (no ScalaUDF, map-only)") {
    val df = Pretrain.textCharEntropy(spark, Sf)
    df.collect() // resolve AQE so executedPlan shows codegen spans
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    // `*(n)` prefixes mark whole-stage-codegen spans in the rendered plan
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    // single exchange allowed: the final orderBy
    assert("Exchange".r.findAllIn(plan).length <= 2, plan)
  }

  test("dsir sample: k docs out, weight-biased toward the target slice") {
    import spark.implicits._
    val en = (1 to 40).map(i => (i.toLong, "the cat sat on the mat", "en"))
    val de = (41 to 80).map(i => (i.toLong, "der hund lief durch den wald", "de"))
    val docs = (en ++ de).toDF("doc_id", "text", "lang")
    val picked = Pretrain.dsirSample(docs, k = 20, seed = 42)
      .collect().map(_.getLong(0))
    assert(picked.length == 20)
    assert(picked.toSeq == picked.sorted.toSeq) // output ordered by doc_id
    // 40/40 split but all target mass on en bigrams: expect the draw to
    // lean heavily en (prob of en-minority under the weights ~ 0)
    val enPicked = picked.count(_ <= 40)
    assert(enPicked > 10, s"importance draw picked only $enPicked/20 en docs")
    // deterministic: same seed, same draw
    val again = Pretrain.dsirSample(docs, k = 20, seed = 42)
      .collect().map(_.getLong(0))
    assert(again.toSeq == picked.toSeq)
  }

  test("bpe merges: classic corpus learns the expected first merges greedily") {
    import spark.implicits._
    // hug×10 pug×5 pun×12 bun×4 hugs×5  (hand-checkable BPE example)
    val text = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
      .mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = Pretrain.bpeMerges(docs, spark, nMerges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // pair counts: (u,g)=20, (u,n)=16, (h,u)=15, (p,u)=17 →
    //   step1 (u,g,20); then (p,u)=17? no — after ug: (h,ug)=15,(p,ug)=5,
    //   (p,u)=12,(u,n)=16,(b,u)=4 → step2 (u,n,16); step3 (h,ug,15)
    assert(out(0) == ((1, "u", "g", 20L)), out.mkString(","))
    assert(out(1) == ((2, "u", "n", 16L)), out.mkString(","))
    assert(out(2) == ((3, "h", "ug", 15L)), out.mkString(","))
  }

  test("bpe merges: greedy leftmost rewrite does not re-merge its own output") {
    import spark.implicits._
    // "aaa"×3: pair (a,a) counts 6; after merge words become [aa, a] —
    // leftmost greedy, no overlap — so (aa,a) now counts 3
    val docs = Seq((1L, "aaa aaa aaa")).toDF("doc_id", "text")
    val out = Pretrain.bpeMerges(docs, spark, nMerges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) == ((1, "a", "a", 6L)), out.mkString(","))
    assert(out(1) == ((2, "aa", "a", 3L)), out.mkString(","))
  }

  /** Independent scalar reference: greedy-leftmost application of the
    * merge list in rank order — the definition BPE encoding must
    * satisfy, written without any engine machinery. */
  private def refEncode(word: String,
                        merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    for ((a, b) <- merges) {
      val out = collection.mutable.Buffer.empty[String]
      for (x <- syms) {
        if (out.nonEmpty && out.last == a && x == b)
          out(out.length - 1) = a + b
        else out += x
      }
      syms = out.toSeq
    }
    syms
  }

  private def refIds(syms: Seq[String],
                     merges: Seq[(String, String)]): Seq[Int] =
    syms.map { s =>
      if (s.length == 1) s.codePointAt(0)
      else Pretrain.BpeMergeIdBase + merges.indexWhere(m => m._1 + m._2 == s) + 1
    }

  test("bpe encode: fit-then-apply matches the independent reference on every word") {
    import spark.implicits._
    val text = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
      .mkString(" ")
    val docs = Seq((1L, text), (2L, "hugs bun pun hug"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = Pretrain.bpeMerges(docs, spark, nMerges = 3)
      .orderBy(col("step")).collect()
      .toSeq.map(r => (r.getString(1), r.getString(2)))
    val got = Pretrain.bpeEncode(docs, merges, spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Int](3))).toSeq
    // doc 2 hand-checked: after (u,g),(u,n),(h,ug) — hugs=[hug,s],
    // bun=[b,un], pun=[p,un], hug=[hug]
    val words2 = Seq("hugs", "bun", "pun", "hug")
    val exp2 = words2.flatMap(w => refIds(refEncode(w, merges), merges))
    val got2 = got.find(_._1 == 2L).get
    assert(got2._2 == 4L && got2._3 == exp2.size.toLong, got2)
    assert(got2._4 == exp2, s"ids ${got2._4} != reference $exp2")
    assert(refEncode("hugs", merges) == Seq("hug", "s"))
    // empty doc: zero words, zero tokens, empty id array
    val got3 = got.find(_._1 == 3L).get
    assert(got3._2 == 0L && got3._3 == 0L && got3._4.isEmpty, got3)
    // the fit corpus doc round-trips too (every word via the reference)
    val words1 = text.split(" ").toSeq
    val exp1 = words1.flatMap(w => refIds(refEncode(w, merges), merges))
    assert(got.find(_._1 == 1L).get._4 == exp1)
  }

  test("bpe kernel == declarative HOF encode path on every fit-corpus word") {
    import spark.implicits._
    val text = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs") ++
      Seq.fill(3)("aaaa")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = Pretrain.bpeMerges(docs, spark, nMerges = 6)
      .orderBy(col("step")).collect()
      .toSeq.map(r => (r.getString(1), r.getString(2)))
    // declarative reference: the fit's own chained-HOF rewrite over
    // the distinct-word table + the symbol-id broadcast join
    val words = docs.select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .where(length(col("w")) > 0).distinct()
    val declarative = Pretrain.bpeEncodeVocabIds(words, merges, spark)
      .collect().map(r => r.getString(0) -> r.getSeq[Int](2)).toMap
    // kernel: one doc per word, through the corpus encode
    val kernel = Pretrain.bpeEncode(
        declarative.keys.toSeq.zipWithIndex
          .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text"),
        merges, spark)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](3)).toMap
    declarative.keys.toSeq.zipWithIndex.foreach { case (w, i) =>
      assert(kernel(i.toLong) == declarative(w),
        s"kernel diverged on '$w': ${kernel(i.toLong)} vs ${declarative(w)}")
    }
  }

  test("bpe encode: a no-space doc collapses to 1 whitespace word but real bpe tokens") {
    import spark.implicits._
    // CJK stand-in: no whitespace anywhere — whitespace counting calls
    // this ONE token; the tokenizer must see through it
    val docs = Seq((1L, "abcabcabcabcabcabc"), (2L, "abc abc"))
      .toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "c"))
    val byId = Pretrain.bpeEncode(docs, merges, spark).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(1L) == ((1L, 6L)), s"six 'abc' tokens expected: ${byId(1L)}")
    assert(byId(2L) == ((2L, 2L)), byId(2L))
  }

  test("bpe token counts attach as n_tokens from a persisted model") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    val fit = Seq((1L, "abcabc abcabc abc abc abc"))
      .toDF("doc_id", "text")
    Pretrain.saveBpeModel(Pretrain.bpeMerges(fit, spark, nMerges = 2), dir)
    val loaded = Pretrain.loadBpeMerges(spark, dir)
    assert(loaded == Seq(("a", "b"), ("ab", "c")), loaded)
    val docs = Seq((1L, "abcabcabc", "zz"), (2L, "abc abc", "en"))
      .toDF("doc_id", "text", "lang")
    val counted = Pretrain.bpeTokenCounts(docs, dir, spark).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(counted == Map(1L -> 3L, 2L -> 2L), counted.toString)
  }

  test("dsir weight table broadcasts; the whole op is two corpus scans") {
    val df = Pretrain.pipelineDsirWeight(spark, Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // stats (ONE pass: count + indicator sum + window totals on the
    // ≤B-row table) + scoring = exactly 2 live scans. A third scan
    // means a rebuilt stats lineage — the shape AQE exchange reuse
    // silently fails to unify (observed before the window rewrite).
    val finalPlan = plan.split("== Initial Plan ==").head
    val scans = "FileScan".r.findAllIn(finalPlan).length
    assert(scans <= 2, s"$scans corpus scans — stats lineage duplicated:\n" +
      finalPlan.take(3000))
  }

  test("bpe fertility: a no-space source scores strictly above a spaced one") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_fert").toString
    // spaced source: short common words (the merge table compresses
    // them to ~1 token/word); no-space source: long fused strings
    // (1 whitespace word each, many tokens)
    ((1L to 6L).map(i =>
        (i, "the cat sat on the mat the cat sat on the mat", "spaced")) ++
      (11L to 16L).map(i =>
        (i, "qwzxvkjqwzxvkjqwzxvkj", "fused"))).toDF("doc_id", "text", "source")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Pretrain.pipelineBpeFertility(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(out.keySet == Set("spaced", "fused"), out.toString)
    assert(out("fused") > out("spaced"),
      s"no-space fertility ${out("fused")} must exceed spaced ${out("spaced")}")
    assert(out("fused") > 2.0, s"fused source must cost >2 tokens/word: $out")
  }

  test("bpe curve: fertility non-increasing in merges; unseen-alphabet source exactly flat") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, length}
    // spaced source: heavy pair repetition → merges fire and fertility
    // DROPS along the prefix chain; digits source: no-space docs whose
    // adjacent digit pairs are all corpus-unique (each pair count 1 <
    // the fit's c > 1 floor) and whose alphabet never appears in the
    // spaced source — NO learned merge can apply, so its curve is flat
    val docs = ((1L to 8L).map(i =>
        (i, "the cat sat on the mat the cat sat on the mat", "spaced")) ++
      Seq((11L, "0123", "digits"), (12L, "4567", "digits"),
        (13L, "89", "digits")))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val grid = Seq(2, 4, 8, 16)
    val curve = graft.operators.Pretrain.bpeCurve(docs, spark, grid)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(5)).toMap
    assert(curve.keySet ==
      (for (s <- Seq("spaced", "digits"); k <- grid) yield (s, k)).toSet)
    for (s <- Seq("spaced", "digits"); (a, b) <- grid.zip(grid.tail))
      assert(curve((s, a)) >= curve((s, b)),
        s"fertility must be non-increasing: $s at $a→$b: " +
          s"${curve((s, a))} < ${curve((s, b))}")
    assert(curve(("spaced", grid.head)) > curve(("spaced", grid.last)),
      "the compressible source's curve must actually drop")
    assert(grid.map(k => curve(("digits", k))).distinct.size == 1,
      s"the unseen-alphabet source must stay exactly flat: " +
        grid.map(k => curve(("digits", k))).mkString(","))
  }
}
