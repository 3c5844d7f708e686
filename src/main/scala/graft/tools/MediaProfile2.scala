package graft.tools
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
object MediaProfile2 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{MediaIndex, Multimodal, Dedup, Components, Lineage}
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def timeDf(name: String)(df: => DataFrame): Unit =
      time(name)(df.write.format("noop").mode("overwrite").save())
    val all = Multimodal.withBlobs(graft.Tables.documents(spark, sf))
    val batch = all.where(col("doc_id") % 7 === 0)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mp2").toString
    time("corpus build (once)")(
      MediaIndex.build(spark, all.where(col("doc_id") % 7 =!= 0), dir))
    val sig = time("sig truncate")(
      Lineage.truncate(MediaIndex.signaturesOf(batch)))
    val edges = Seq("image", "audio").map { plane =>
      Dedup.hamming64StarEdges(
        sig.where(col("plane") === plane), "doc_id", "h", 6)
    }.reduce(_.unionAll(_))
    timeDf("in-batch edges")(edges)
    timeDf("in-batch CC")(Components.connectedComponents(edges))
    for (i <- 1 to 2)
      timeDf(s"admit $i")(MediaIndex.admit(spark, batch, dir).select(col("doc_id")))
    spark.stop()
  }
}
