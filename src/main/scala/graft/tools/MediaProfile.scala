package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: stage split of the `dedup_incremental_media` gate — the
  * round-17 verdict flagged it as 33% of the sf10 headline with the
  * decode / band-join / manifest-commit split unknown. Times each
  * stage of the steady-state admission in isolation, then three full
  * gate calls (call 1 pays the corpus build; calls 2-3 are the
  * steady state the bench MIN tracks).
  * `/tmp/run_graft.sh graft.tools.MediaProfile [sfDir]`. */
object MediaProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{MediaIndex, Multimodal}

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
    println(s"batch blobs: ${batch.count()}")

    timeDf("blob synthesis only")(batch)
    timeDf("signaturesOf (synth+decode)")(MediaIndex.signaturesOf(batch))

    // standing index, built once outside the timed region
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mediaprofile").toString
    time("corpus build (6/7, once)")(
      MediaIndex.build(spark, all.where(col("doc_id") % 7 =!= 0), dir))

    // steady-state admission decision, isolated from the commit verbs
    timeDf("admit (decode+screen+collapse)")(
      MediaIndex.admit(spark, batch, dir).select(col("doc_id")))

    // full gate calls: 1 = build+admit, 2..3 = rollback+admit (bench MIN)
    for (i <- 1 to 3)
      time(s"dedup_incremental_media call $i")(
        MediaIndex.dedupIncrementalMedia(spark, sf)
          .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
