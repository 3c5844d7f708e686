package graft
import org.apache.spark.sql.SparkSession
object Repro9 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("8")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_range_join", "stream_sessionize")) {
      try {
        val df = SparkEntry.queries(q)(spark, dir)
        println(s"OK $q rows=${df.count()}")
      } catch {
        case e: Throwable =>
          println(s"FAIL $q: ${e.getClass.getName}: ${e.getMessage}")
          e.printStackTrace()
      }
    }
    spark.stop()
  }
}
