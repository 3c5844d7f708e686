package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Native functions must be reachable from plain SQL. */
class ExtensionsSpec extends SparkSpec {

  test("registered native functions run from spark.sql") {
    GraftExtensions.registerNativeFunctions(spark)
    val row = spark.sql(
      """SELECT simhash64(split(lower('Spark native SQL function'), '\\s+')) AS sh,
        |  size(minhash_buckets('one two three four five six')) AS nb,
        |  size(minhash_buckets('one two three four five six', 3, 8)) AS nb8,
        |  size(rolling_fingerprint('a longer text for fingerprints')) AS nf,
        |  text_stats('the quick brown fox the end').n_words AS nw,
        |  text_stats('the quick brown fox the end').n_distinct AS nd,
        |  text_stats('the quick brown fox the end').n_stop AS ns,
        |  size(ngram_hashes('one two three four five six seven eight nine')) AS ng,
        |  size(ngram_hashes('one two three', 2)) AS ng2,
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS vd,
        |  vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS vc,
        |  vec_l2sq(array(0.0D, 3.0D), array(4.0D, 0.0D)) AS vl
        |""".stripMargin).collect()(0)
    assert(row.getLong(0) != 0L)
    assert(row.getInt(1) == 16)
    assert(row.getInt(2) == 8)
    assert(row.getInt(3) >= 1)
    assert(row.getInt(4) == 6 && row.getInt(5) == 5 && row.getInt(6) == 2)
    assert(row.getInt(7) == 2)  // 9 words → 2 distinct 8-grams
    assert(row.getInt(8) == 2)  // 3 words → 2 distinct 2-grams
    assert(row.getDouble(9) == 11.0 && row.getDouble(10) == 1.0 &&
      row.getDouble(11) == 25.0)
    // char_entropy: 8 distinct uniform chars → exactly 3 bits
    val ce = spark.sql(
      """SELECT char_entropy('abcdefgh').n_printable AS np,
        |  CAST(round(char_entropy('abcdefgh').ent, 6) AS DOUBLE) AS e
        |""".stripMargin).collect()(0)
    assert(ce.getInt(0) == 8 && ce.getDouble(1) == 3.0)
  }

  test("matrix kernels run from spark.sql with array-literal matrices") {
    GraftExtensions.registerNativeFunctions(spark)
    val row = spark.sql(
      // 2 tables × 1 bit × dim 2: planes (1,0) and (0,1); centroids
      // (0,0) and (10,10) with k=2, nProbe=2
      """SELECT
        |  hyperplane_codes(array(0.5D, -0.5D),
        |    array(1.0D, 0.0D, 0.0D, 1.0D), 2, 1) AS hc,
        |  nearest_cells(array(1.0D, 1.0D),
        |    array(0.0D, 0.0D, 10.0D, 10.0D), 2, 2) AS nc,
        |  cell_residual(array(1.0D, 1.0D), 1,
        |    array(0.0D, 0.0D, 10.0D, 10.0D), 2) AS cr,
        |  hyperplane_probes(array(0.5D, -0.5D),
        |    array(1.0D, 0.0D, 0.0D, 1.0D), 2, 1, 2) AS hp
        |""".stripMargin).collect()(0)
    assert(row.getSeq[Long](0) == Seq(1L, 0L),
      s"sign(0.5)=1, sign(-0.5)=0: ${row.getSeq[Long](0)}")
    assert(row.getSeq[Int](1) == Seq(0, 1),
      s"(1,1) is nearer (0,0) than (10,10): ${row.getSeq[Int](1)}")
    assert(row.getSeq[Double](2) == Seq(-9.0, -9.0),
      s"(1,1) − centroid(10,10): ${row.getSeq[Double](2)}")
    // per table: exact code then its one-bit flip (b=1 → flip of bit 0)
    assert(row.getSeq[Long](3) == Seq(1L, 0L, 0L, 1L),
      s"probe codes (code, flip) per table: ${row.getSeq[Long](3)}")
  }

  test("SQL and column APIs agree") {
    GraftExtensions.registerNativeFunctions(spark)
    import org.apache.spark.sql.functions._
    val df = Tables.documents(spark, Sf).limit(20)
    val viaSql = df.selectExpr("doc_id", "minhash_buckets(text) AS b")
    val viaCol = df.select(col("doc_id"),
      graft.functions.HashFunctions.minhashBuckets(col("text")).as("b"))
    assert(viaSql.collect().map(_.toString).toSeq ==
      viaCol.collect().map(_.toString).toSeq)
  }

  test("session-construction injection wires without error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // builder table itself is exercised above
  }

  test("recursive CTE depth is calendar-bounded; sequence spine is row-identical") {
    import org.apache.spark.sql.functions._
    // the gate query's recursion LEVEL COUNT == its output rows (each
    // level emits one spine day). Pin that it equals the calendar-day
    // span and stays INDEPENDENT of corpus row count — a regression
    // that made depth corpus-dependent (or a spine past the driver-
    // scheduling guard) fails here, not in a 100 TB run
    val rec = GraftEngine.ordersDailyDense(spark, Sf).collect()
    val span = Tables.orders(spark, Sf)
      .agg(datediff(max(to_date(col("o_orderdate"))),
        min(to_date(col("o_orderdate")))) + 1)
      .collect()(0).getInt(0)
    assert(rec.length == span,
      s"level count ${rec.length} must equal the day span $span — depth " +
        "is a property of the DATE RANGE alone, never of corpus rows")
    assert(rec.length < 3000,
      s"spine depth ${rec.length} must stay well inside the " +
        "driver-scheduling guard (~10^4 levels)")
    // the closed-form sequence() spine — the production path past
    // ~10^4 days — produces byte-identical rows
    val seqRows = GraftEngine.ordersDailyDense(spark, Sf, "sequence")
      .collect()
    assert(seqRows.map(_.toString).toSeq == rec.map(_.toString).toSeq,
      "sequence spine must be row-identical to the recursive spine")
  }
}
