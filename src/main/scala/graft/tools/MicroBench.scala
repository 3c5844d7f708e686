package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of a pipeline to locate hot spots.
  * `sbt "runMain graft.tools.MicroBench [sfDir]"`. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    import graft.Tables
    import graft.operators.Dedup
    import graft.functions.TextFunctions._
    import graft.functions.HashFunctions._

    val docs = Tables.documents(spark, sf)
    println(s"docs: ${docs.count()}")
    time("scan only")(docs.select(col("doc_id"), col("text")))
    time("words")(docs.select(col("doc_id"), words(col("text")).as("w")))
    time("shingles")(docs.select(col("doc_id"), shingles(col("text"), 3).as("sh")))
    time("minhash signatures")(Dedup.minhashSignatures(docs))
    time("lsh buckets")(Dedup.lshBuckets(Dedup.minhashSignatures(docs)))
    time("minhash pairs (full)")(Dedup.minhashLshPairs(docs))
    time("simhash")(Dedup.simhash(docs))
    time("simhash pairs (full)")(Dedup.simhashPairs(docs))
    spark.stop()
  }
}
