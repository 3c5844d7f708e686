package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Structured Streaming plans run against the events parquet through a
  * memory sink and must agree with the batch forms. */
class StreamingSpec extends SparkSpec {

  test("streaming window agg matches the batch window agg") {
    val q = EventStreams.windowAgg(EventStreams.eventStream(spark, Sf))
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("win_agg")
      .select(col("w_start"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.operators.Events.streamWindowAgg(spark, Sf)
      .select(col("w_start"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("streaming sessionization produces bounded sane sessions") {
    val q = EventStreams.sessionize(EventStreams.eventStream(spark, Sf))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("sessions").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (start, end) = (r.getTimestamp(1), r.getTimestamp(2))
      assert(!end.before(start))
      assert(r.getLong(3) >= 1)
    }
    val nEvents = rows.map(_.getLong(3)).sum
    assert(nEvents == Tables.events(spark, Sf).count())
  }
}
