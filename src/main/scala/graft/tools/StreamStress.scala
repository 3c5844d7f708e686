package graft.tools

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Dev tool: throughput + bounded-state evidence for the streaming
  * ingest path (SURVEY.md §6): ingestGate (stateless quality +
  * contamination admission) → nearDedupStream (watermarked MinHash-band
  * dedup) over a 10× replica of the sf0.1 documents with synthetic
  * event time — 1 doc/second, ~14 h of stream, 2 h watermark.
  *
  * The input lands as `slices` sequential time-ordered parquet files
  * read with maxFilesPerTrigger=1, so the watermark ADVANCES across
  * micro-batches and state eviction actually runs (a single batch would
  * never evict — processAllAvailable would finish before the watermark
  * moves). Checks:
  *   - rows/sec over the whole pipeline (gate + dedup + state store);
  *   - final state rows ≤ rows inside (watermark + one-batch lag) —
  *     state is f(watermark), NOT f(stream length): a 10× longer
  *     stream holds the same state;
  *   - peak state rows never approach the input row count.
  * `sbt "runMain graft.tools.StreamStress [factor] [slices]"`. */
object StreamStress {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val slices = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val base = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val inDir = s"$base/in"

    // 10× docs, clone text salted (un-salted clones are mutual near-dups
    // by construction and the dedup rate stops meaning anything), event
    // time = 1 doc/second in doc order.
    val docs = graft.Tables.documents(spark, src)
    val copies = spark.range(factor.toLong).select(col("id").as("_copy"))
    val scaled = docs.crossJoin(copies)
      .withColumn("doc_id", col("doc_id") + col("_copy") * 100000000L)
      .withColumn("text",
        when(col("_copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" salt"), col("doc_id"))))
      .drop("_copy")
      .withColumn("_idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))) - 1)
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("_idx")))
    val total = scaled.count()
    val sliceRows = (total + slices - 1) / slices
    // sequential single-file writes: file mod-times order the stream the
    // same way event time does, so each micro-batch is one time slice
    (0 until slices).foreach { i =>
      scaled.where(col("_idx") >= i * sliceRows && col("_idx") < (i + 1) * sliceRows)
        .drop("_idx").coalesce(1)
        .write.mode("append").parquet(inDir)
    }
    println(s"input: $total docs over ${total}s of event time, $slices slices")

    val evalDocs = graft.Tables.documents(spark, "/root/testdata/sf0.01").limit(100)
    val stream = spark.readStream.schema(
        spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val piped = EventStreams.nearDedupStream(
      EventStreams.ingestGate(stream, evalDocs))
    val t0 = System.nanoTime()
    val q = piped.writeStream.format("noop")
      .option("checkpointLocation", s"$base/ckpt").start()
    try q.processAllAvailable() finally q.stop()
    val wallSec = (System.nanoTime() - t0) / 1e9

    val progress = q.recentProgress.toSeq
    val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
    val admitted = progress.map(_.sink.numOutputRows).filter(_ >= 0).sum
    println(f"wall ${wallSec}%.1f s  throughput ${total / wallSec}%.0f rows/sec " +
      f"(input) / ${admitted / wallSec}%.0f rows/sec (admitted past gate)")
    println(s"state rows per batch: ${stateRows.mkString(", ")}")

    def check(name: String, ok: Boolean): Unit = {
      println(s"${if (ok) "PASS" else "FAIL"}  $name")
      if (!ok) sys.exit(1)
    }
    // watermark bound: state holds ≤ (2 h watermark + one slice of lag —
    // the watermark only advances at batch boundaries) of admitted rows
    val bound = 2 * 3600 + sliceRows
    check(s"final state ${stateRows.last} ≤ watermark+lag bound $bound",
      stateRows.last <= bound)
    check(s"peak state ${stateRows.max} ≤ bound $bound (never stream-length-shaped)",
      stateRows.max <= bound)
    check(s"state is a small fraction of input (${stateRows.max} < ${total / 3})",
      stateRows.max < total / 3)
    spark.stop()
  }
}
