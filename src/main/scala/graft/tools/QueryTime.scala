package graft.tools

/** Dev tool: min/median-of-N timing for a subset of queries (the
  * Bench noop-sink methodology without the full headline sweep) —
  * the measure/re-measure instrument for optimization rounds.
  *
  * `sbt "runMain graft.tools.QueryTime <sfDir> <runs> <query...>"`
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QueryTime <sfDir> <runs> <query...>")
    val sf = args(0)
    val runs = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[qt] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    run(names.head) // JIT/codegen warm-up
    names.foreach { n =>
      spark.sparkContext.setJobDescription(s"qt:$n")
      val ts = Seq.fill(runs)(run(n)).sorted
      println(f"[qt] $n%-32s min ${ts.head}%7.3f  med ${ts((ts.size - 1) / 2)}%7.3f  max ${ts.last}%7.3f")
    }
    spark.stop()
  }
}
