package graft.tools
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch: stage split of simAnnSq8 at sf0.1. */
object Sq8Profile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def timeDf(name: String)(df: => DataFrame): Unit =
      time(name)(df.write.format("noop").mode("overwrite").save())
    val emb = graft.Tables.embeddings(spark, sf)
    // warm-up
    emb.write.format("noop").mode("overwrite").save()
    for (i <- 1 to 2) {
      time(s"fitRangesN (iter $i)")(Similarity.sq8FitRangesN(emb))
    }
    val (mn, step, n) = Similarity.sq8FitRangesN(emb)
    timeDf("encode only")(Similarity.sq8Encode(emb, mn, step))
    timeDf("topk bruteforce (recall twin)")(
      Similarity.simTopkBruteforce(spark, sf))
    for (i <- 1 to 3)
      timeDf(s"simAnnSq8 full (run $i)")(Similarity.simAnnSq8(spark, sf))
    spark.stop()
  }
}
