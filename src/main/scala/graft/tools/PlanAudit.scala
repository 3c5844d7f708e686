package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: physical-plan audit of the headline queries — prints the
  * operator skeleton (joins/exchanges/aggregates/scans) so broadcast
  * choices, shuffle counts, and parquet pushdown are reviewable at a
  * glance. `sbt "runMain graft.tools.PlanAudit [sfDir] [query...]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.lift(1).contains("all")) graft.SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 1) args.drop(1).toSeq
      else graft.Bench.headline
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // plain substring scan, never a regex: plans carry multi-megabyte
    // single lines (broadcast literal arrays) and an alternation of
    // \w*-prefixed branches backtracks quadratically on them (observed:
    // one line pinned a core for 6+ minutes)
    val kws = Seq("Join", "Exchange", "HashAggregate", "SortAggregate",
      "Scan", "Sort", "Window", "TakeOrdered", "Generate", "Expand",
      "Limit", "PushedFilters")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val plan = graft.SparkEntry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString
      plan.split("\n")
        .filter { l => val h = l.take(4000); kws.exists(h.contains) }
        .flatMap { l0 =>
          val base = l0.take(4000).replaceAll("#\\d+L?", "").take(200)
          // non-empty PartitionFilters usually sit PAST the 200-char cut
          // (after a long Location expansion) on index-at-rest scans —
          // exactly the segment the plan audit exists to witness (the
          // static `cell INSET`/`tb IN` directory pruning). Extract it
          // as its own line so truncation can't hide a pruned scan.
          // indexOf is linear — safe on multi-megabyte lines where an
          // alternation regex backtracks quadratically (header note).
          val i = l0.indexOf("PartitionFilters: [")
          val j = if (i >= 0) l0.indexOf("]", i) else -1
          val pf =
            if (i >= 0 && j > i + "PartitionFilters: [".length) // non-empty
              Seq("        [pf] " + l0.substring(i, j + 1)
                .replaceAll("#\\d+L?", "").take(200))
            else Seq.empty
          Seq(base) ++ pf
        }
        .foreach(println)
    }
    spark.stop()
  }
}
