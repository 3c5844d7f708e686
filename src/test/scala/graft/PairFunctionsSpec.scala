package graft

import org.apache.spark.sql.functions._

import graft.functions.PairFunctions

/** Parity pins for the native pair-emission / syllable kernels
  * (PairFunctions.scala) against the declarative lambda-HOF forms
  * they replaced — the HOFs are the semantic reference; the kernels
  * exist because Spark runs HOF lambdas as CodegenFallback. */
class PairFunctionsSpec extends SparkSpec {

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "new york city new york state"),
    (3L, "  leading whitespace  and   runs\tof\nspace "),
    (4L, ""),
    (5L, "one"),
    (6L, "Queueing AEIOU xyzzy rhythm données 日本語 a e i"),
    (7L, "Ends with punctuation. Two sentences! Three? yes"))

  test("skipgram_pairs == the flatten/transform/filter HOF, order-sensitively") {
    import spark.implicits._
    val df = texts.toDF("doc_id", "text")
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("ws"))
    for (w <- Seq(1, 2, 4, 7)) {
      val hof = df.select(col("doc_id"), expr(
        s"""flatten(transform(ws, (x, i) ->
           |  filter(transform(sequence(1, $w), o ->
           |    IF(i + o + 1 > size(ws), NULL,
           |      struct(x AS a, element_at(ws, i + o + 1) AS b))),
           |    p -> p IS NOT NULL)))""".stripMargin).as("ps"))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val ker = df.select(col("doc_id"),
          PairFunctions.skipgramPairs(col("ws"), w).as("ps"))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(ker == hof, s"window=$w kernel != HOF")
    }
  }

  test("skipgram_grams = unigram markers interleaved with skipgram_pairs") {
    import spark.implicits._
    // the combined emission's null-b subsequence must equal ws in
    // order (unigram counts unchanged), and its non-null subsequence
    // must equal skipgram_pairs exactly — so every PMI statistic
    // computed off the single pass matches the split-emission reference
    val df = texts.toDF("doc_id", "text")
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("ws"))
    for (w <- Seq(1, 2, 4, 7)) {
      val got = df.select(col("doc_id"), col("ws"),
          PairFunctions.skipgramGrams(col("ws"), w).as("gs"),
          PairFunctions.skipgramPairs(col("ws"), w).as("ps"))
        .select(col("doc_id"),
          expr("transform(filter(gs, g -> g.b IS NULL), g -> g.a)").as("u"),
          expr("filter(gs, g -> g.b IS NOT NULL)").as("p"),
          col("ws"), col("ps"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](3),
          s"window=$w doc=${r.getLong(0)}: unigram stream != ws")
        assert(r.getSeq[Any](2) == r.getSeq[Any](4),
          s"window=$w doc=${r.getLong(0)}: pair stream != skipgram_pairs")
      }
    }
  }

  test("pair_combinations == the slice/transform HOF on sorted sets") {
    import spark.implicits._
    val sets = Seq(
      Seq("a", "b", "c", "d"), Seq("x"), Seq[String](),
      Seq("click", "purchase", "view"), Seq("a", "b"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = sets.toDF("id", "ts")
    val hof = df.select(col("id"), expr(
      """flatten(transform(ts, (x, i) ->
        |  transform(slice(ts, i + 2, greatest(size(ts) - i - 1, 0)),
        |    y -> struct(x AS a, y AS b))))""".stripMargin).as("ps"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    val ker = df.select(col("id"),
        PairFunctions.pairCombinations(col("ts")).as("ps"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(ker == hof)
  }

  test("pathological row sizes fail loud, not NegativeArraySizeException") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    // n*(n-1)/2 overflows Int at n = 46341 — the kernel must require()
    // with a diagnosable message instead of allocating a negative array
    val big = new GenericArrayData(
      Array.fill[Any](70000)(UTF8String.fromString("t")))
    val e = intercept[IllegalArgumentException] {
      graft.functions.PairKernels.combinations(big)
    }
    assert(e.getMessage.contains("pairs"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.functions.PairKernels.skipgramPairs(big, 70000)
    }
    assert(e2.getMessage.contains("pairs"), e2.getMessage)
  }

  test("syllable_count == the aggregate-HOF vowel-group sum") {
    import spark.implicits._
    val df = texts.toDF("doc_id", "text")
    val hof = df.select(col("doc_id"), expr(
      """aggregate(transform(split(lower(text), '\\s+'),
        |  w -> BIGINT(greatest(size(split(w, '[aeiou]+')) - 1, 1))),
        |  0L, (acc, x) -> acc + x)""".stripMargin).as("n"))
      .orderBy("doc_id").collect().map(r => r.getLong(1)).toSeq
    val ker = df.select(col("doc_id"),
        PairFunctions.syllableCount(col("text")).as("n"))
      .orderBy("doc_id").collect().map(r => r.getLong(1)).toSeq
    assert(ker == hof, s"kernel $ker != HOF $hof")
  }

  test("kernels match on the real documents corpus") {
    val docs = Tables.documents(spark, Sf).limit(200).cache()
    try {
      val ws = docs.select(col("doc_id"), split(lower(col("text")), "\\s+").as("ws"))
      val hofPairs = ws.select(col("doc_id"), expr(
        """flatten(transform(ws, (x, i) ->
          |  filter(transform(sequence(1, 4), o ->
          |    IF(i + o + 1 > size(ws), NULL,
          |      struct(x AS a, element_at(ws, i + o + 1) AS b))),
          |    p -> p IS NOT NULL)))""".stripMargin).as("ps"))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val kerPairs = ws.select(col("doc_id"),
          PairFunctions.skipgramPairs(col("ws"), 4).as("ps"))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(kerPairs == hofPairs)
      val hofSyll = docs.select(col("doc_id"), expr(
        """aggregate(transform(split(lower(text), '\\s+'),
          |  w -> BIGINT(greatest(size(split(w, '[aeiou]+')) - 1, 1))),
          |  0L, (acc, x) -> acc + x)""".stripMargin).as("n"))
        .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
      val kerSyll = docs.select(col("doc_id"),
          PairFunctions.syllableCount(col("text")).as("n"))
        .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
      assert(kerSyll == hofSyll)
    } finally docs.unpersist()
  }
}
