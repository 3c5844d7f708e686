package graft.tools
import org.apache.spark.sql.functions._
object CcDump {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{MediaIndex, Multimodal, Dedup, Lineage}
    val all = Multimodal.withBlobs(graft.Tables.documents(spark, sf))
    val batch = all.where(col("doc_id") % 7 === 0)
    val sig = Lineage.truncate(MediaIndex.signaturesOf(batch))
    val pairs = Seq("image", "audio").map { plane =>
      Dedup.hamming64StarEdges(
        sig.where(col("plane") === plane), "doc_id", "h", 6)
    }.reduce(_.unionAll(_))
    pairs.coalesce(1).write.mode("overwrite").parquet("/tmp/cc_edges_sf01")
    spark.stop()
  }
}
