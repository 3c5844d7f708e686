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
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keep = ("(\\w*Join|Exchange|\\w*HashAggregate|SortAggregate|" +
      "\\w*Scan|Sort|Window|TakeOrdered|Generate|Expand|\\w*Limit|PushedFilters)").r
    names.foreach { n =>
      println(s"\n===== $n =====")
      val plan = graft.SparkEntry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString
      plan.split("\n")
        .filter(l => keep.findFirstIn(l).isDefined)
        .map(_.replaceAll("#\\d+L?", "").take(200))
        .foreach(println)
    }
    spark.stop()
  }
}
