package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Scratch prototype for the round-8 manifest protocol (deleted before
  * commit): checks (1) explicit-file-list reads with basePath keep
  * partition-directory pruning visible as PartitionFilters, and
  * (2) FileSystem.rename onto an existing destination fails — the
  * conditional-commit primitive. */
object Proto {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("8")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("proto").toString

    // partitioned write, two batches -> several files per cell
    (1 to 100).map(i => (i.toLong, i % 5)).toDF("vec_id", "cell")
      .write.partitionBy("cell").mode("append").parquet(s"$dir/cells")
    (101 to 200).map(i => (i.toLong, i % 5)).toDF("vec_id", "cell")
      .write.partitionBy("cell").mode("append").parquet(s"$dir/cells")

    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(s"$dir/cells"), true)
    val files = scala.collection.mutable.Buffer[String]()
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet")) files += p.toString
    }
    println(s"files: ${files.size}")

    val df = spark.read.option("basePath", s"$dir/cells").parquet(files.toSeq: _*)
      .where(col("cell").isin(1, 3))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    println(plan.linesIterator.filter(l =>
      l.contains("PartitionFilters") || l.contains("ReadSchema")).mkString("\n"))
    println(s"count(cell in 1,3): ${df.count()} (expect 80)")
    // does the scan actually prune at file level?
    val scanned: Long = df.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles
    }.sum
    println(s"selected files after pruning: $scanned of ${files.size}")

    // rename-to-existing: conditional-commit primitive
    val a = new Path(s"$dir/a.json"); val b = new Path(s"$dir/b.json")
    val o1 = fs.create(a, false); o1.write(49); o1.close()
    val o2 = fs.create(b, false); o2.write(50); o2.close()
    println(s"rename onto existing dest -> ${fs.rename(a, b)} (expect false)")
    val c = new Path(s"$dir/c.json")
    println(s"rename to fresh dest -> ${fs.rename(a, c)} (expect true)")
    // empty file-list read?
    try {
      val e = spark.read.option("basePath", s"$dir/cells").parquet(Seq.empty[String]: _*)
      println(s"empty list read: schema=${e.schema}")
    } catch { case e: Throwable => println(s"empty list read throws: ${e.getMessage.take(100)}") }
    spark.stop()
  }
}
