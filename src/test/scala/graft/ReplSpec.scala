package graft

/** The REPL's table renderer must reproduce the reference's box-drawn
  * output (reference src/main.rs prints via its table formatter) and
  * behave sanely on truncation and nulls. */
class ReplSpec extends SparkSpec {

  test("formatTable draws the reference-style box") {
    val out = Repl.formatTable(
      Seq("movie", "year"),
      Seq(Seq("taxi driver", "1976"), Seq("up", "2009")))
    val expected =
      """╭─────────────┬──────╮
        |│ movie       │ year │
        |├─────────────┼──────┤
        |│ taxi driver │ 1976 │
        |│ up          │ 2009 │
        |╰─────────────┴──────╯""".stripMargin
    assert(out == expected)
  }

  test("render runs a reference-dialect query end to end") {
    val out = Repl.render(GraftEngine.sql(spark,
      s"select r_name from '$Sf/region.parquet' where r_regionkey = 0"))
    assert(out.contains("r_name") && out.contains("AFRICA"))
  }

  test("explain prefix prints the formatted physical plan, not a table") {
    val out = Repl.eval(spark,
      s"explain select r_name from '$Sf/region.parquet' where r_regionkey = 0",
      ".")
    assert(out.contains("Physical Plan"), out.take(200))
    assert(out.contains("PushedFilters"), "plan must show parquet pushdown")
    assert(!out.contains("╭"), "explain must not render a result table")
  }

  test("render truncates past MaxRows and shows nulls as NULL") {
    import spark.implicits._
    val big = spark.range(500).toDF("id")
    val out = Repl.render(big, maxRows = 10)
    assert(out.linesIterator.size == 10 + 5) // 10 rows + 4 frame lines + note
    assert(out.contains("… more rows"))
    val nulls = Seq((1L, None: Option[String]), (2L, Some("x")))
      .toDF("id", "v")
    assert(Repl.render(nulls).contains("NULL"))
  }
}
