package graft

import org.apache.spark.sql.DataFrame

/** Interactive read-eval-print loop over GraftEngine.sql — the
  * reference's primary UX (cite: reference src/main.rs:1, a rustyline
  * loop printing box-drawn tables). Reference users run their existing
  * queries verbatim:
  *
  * {{{
  * sbt "runMain graft.Repl [baseDir]"
  * >> select * from 'tests/resources/data/movies1.parquet'
  * ╭─────────────┬────────┬──────╮
  * │ movie       │ score1 │ year │
  * ├─────────────┼────────┼──────┤
  * │ taxi driver │ 9      │ 1976 │
  * ╰─────────────┴────────┴──────╯
  * }}}
  *
  * Relative parquet paths resolve against `baseDir` (default: cwd).
  * Errors print and the loop continues, as in the reference.
  */
object Repl {

  val MaxRows = 100

  /** Box-drawn table in the reference's output style. Pure function of
    * (header, rows) so it's unit-testable without a terminal. */
  def formatTable(header: Seq[String], rows: Seq[Seq[String]]): String = {
    val widths = header.indices.map { i =>
      (header(i).length +: rows.map(_(i).length)).max
    }
    def line(l: String, m: String, r: String) =
      widths.map(w => "─" * (w + 2)).mkString(l, m, r)
    def row(cells: Seq[String]) =
      cells.zip(widths).map { case (c, w) => s" ${c.padTo(w, ' ')} " }
        .mkString("│", "│", "│")
    (Seq(line("╭", "┬", "╮"), row(header), line("├", "┼", "┤")) ++
      rows.map(row) :+ line("╰", "┴", "╯")).mkString("\n")
  }

  def render(df: DataFrame, maxRows: Int = MaxRows): String = {
    val taken = df.take(maxRows + 1)
    val shown = taken.take(maxRows)
    val header = df.columns.toSeq
    val rows = shown.toSeq.map(r =>
      header.indices.map(i => if (r.isNullAt(i)) "NULL" else r.get(i).toString))
    val table = formatTable(header, rows)
    if (taken.length > maxRows) s"$table\n… more rows (showing first $maxRows)"
    else table
  }

  /** One REPL step: `explain <query>` → formatted physical plan (beyond
    * the reference's surface — its optimizer is a no-op; on Spark the
    * plan IS the performance story); `pipeline <name> [dataDir]
    * [k=v ...]` → register the operator as a SQL view
    * (GraftEngine.pipelineView) so subsequent queries compose against
    * it — trailing k=v tokens override the operator's gate defaults
    * (e.g. `pipeline sim_ann_ivf_persisted /data nProbe=8`); anything
    * else → rendered table. */
  def eval(spark: org.apache.spark.sql.SparkSession, line: String,
           baseDir: String): String = {
    val t = line.trim
    if (t.toLowerCase.startsWith("explain "))
      GraftEngine.sql(spark, t.drop(8), baseDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
    else if (t.toLowerCase.startsWith("pipeline ")) {
      val args = t.drop(9).trim.split("\\s+")
      val (kvs, positional) = args.tail.partition(_.contains("="))
      // at most one positional (the data dir): a trailing token that
      // isn't k=v is a separator typo (`nProbe:4`), and silently
      // dropping it would run the gate default — the exact silent
      // fallback the Params unknown-key guard exists to prevent
      require(positional.length <= 1,
        s"unexpected arguments ${positional.drop(1).mkString(" ")} — " +
          "syntax: pipeline <name> [dataDir] [key=value ...]")
      val params = kvs.map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> v
      }.toMap
      val view = GraftEngine.pipelineView(
        spark, args(0), positional.headOption.getOrElse(baseDir), params)
      s"registered view $view" +
        (if (params.isEmpty) "" else s" with ${kvs.sorted.mkString(" ")}")
    }
    else render(GraftEngine.sql(spark, line, baseDir))
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse(System.getProperty("user.dir"))
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    println("graft SQL engine — reference-dialect queries; exit/quit to leave")
    var running = true
    while (running) {
      print(">> ")
      Console.flush()
      val line = scala.io.StdIn.readLine()
      if (line == null || line.trim.equalsIgnoreCase("exit")
          || line.trim.equalsIgnoreCase("quit")) {
        running = false
      } else if (line.trim.nonEmpty) {
        try println(eval(spark, line, baseDir))
        catch { case e: Exception =>
          println(Option(e.getMessage).getOrElse(e.toString).linesIterator
            .take(3).mkString("\n"))
        }
      }
    }
    spark.stop()
  }
}
