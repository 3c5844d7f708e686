package graft

import java.sql.Timestamp
import graft.operators.Events
import org.apache.spark.sql.functions._

/** Batch event analytics semantics on constructed timelines (the gate
  * checks the same queries against DuckDB on the events table). */
class EventsSpec extends SparkSpec {

  test("next-day retention counts exactly the users who return") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // day 1: users 1,2,3 — day 2: users 1,3 return, 4 is new
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (3L, ts("2024-01-01 12:00:00")), (1L, ts("2024-01-01 13:00:00")),
      (1L, ts("2024-01-02 09:00:00")), (3L, ts("2024-01-02 10:00:00")),
      (4L, ts("2024-01-02 11:00:00"))
    ).toDF("user_id", "ts")
    // exercise the same pipeline as eventsRetention, against this frame
    val days = events.select(col("user_id"),
      date_trunc("day", col("ts")).as("day")).distinct()
    val nextDay = days.select(col("user_id"),
      (col("day") - expr("INTERVAL 1 DAY")).as("day"))
    val retained = days.join(nextDay, Seq("user_id", "day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_retained"))
    val out = days.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
      .join(retained, Seq("day"), "left")
      .select(col("day"), col("n_active"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"))
      .collect().map(r => r.getTimestamp(0).toString.take(10) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      "2024-01-01" -> ((3L, 2L)), // users 1 and 3 came back
      "2024-01-02" -> ((3L, 0L))  // no day 3 in the data
    ), out.toString)
  }

  test("retention over the gate table: rates in [0,1], active matches distinct users") {
    val out = Events.eventsRetention(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "retained cannot exceed active")
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("HLL daily-unique sketches track exact counts; union row matches exact total") {
    val ev = Tables.events(spark, Sf)
    val exactDaily = ev
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .groupBy("day").agg(countDistinct("user_id").as("exact"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val exactTotal = ev.select(countDistinct("user_id")).head().getLong(0)

    val rows = Events.sketchDailyUniques(spark, Sf).collect()
    val (totalRows, dayRows) = rows.partition(_.isNullAt(0))
    assert(totalRows.length == 1, "exactly one union-total row (day=null)")
    assert(dayRows.length == exactDaily.size)
    // lgConfigK=12 → relative standard error ~1.6%; allow 5% (3 RSE)
    dayRows.foreach { r =>
      val exact = exactDaily(r.getTimestamp(0)).toDouble
      val est = r.getLong(1).toDouble
      assert(math.abs(est - exact) <= math.max(3.0, 0.05 * exact),
        s"day ${r.getTimestamp(0)}: est $est vs exact $exact")
    }
    val estTotal = totalRows.head.getLong(1).toDouble
    assert(math.abs(estTotal - exactTotal) <= 0.05 * exactTotal,
      s"union total $estTotal vs exact $exactTotal")
  }
}
