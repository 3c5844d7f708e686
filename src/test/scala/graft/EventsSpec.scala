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

  test("anomaly z-scores: flat history yields null z, a planted spike flags") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 8 days of constant volume (zero variance -> null z, not NaN),
    // then a 9th-day spike on a second type with real variance
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def day(i: Int) = new java.sql.Timestamp(base + i * 86400000L)
    val flat = (0 until 8).flatMap(i => (0 until 5).map(j =>
      (i * 100L + j, day(i), "flat")))
    // varied: counts 4,6,4,6,4,6,4 then 40 on day 7
    val varied = (0 until 7).flatMap(i =>
      (0 until (if (i % 2 == 0) 4 else 6)).map(j =>
        (1000L + i * 100 + j, day(i), "spiky"))) ++
      (0 until 40).map(j => (2000L + j, day(7), "spiky"))
    val events = (flat ++ varied)
      .toDF("event_id", "ts", "event_type")
      .withColumn("user_id", col("event_id") % 7)
      .withColumn("value", lit(1.0))
    val daily = events.groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val out = graft.operators.Events.eventsAnomalyFrom(daily).collect()
    val flatRows = out.filter(_.getString(0) == "flat")
    assert(flatRows.length == 1 && flatRows.head.isNullAt(4),
      s"flat history must yield null z: ${flatRows.toSeq}")
    assert(!flatRows.head.getBoolean(5), "null z must not flag")
    val spike = out.filter(r => r.getString(0) == "spiky")
    assert(spike.length == 1 && spike.head.getBoolean(5),
      s"planted 40-vs-5ish spike must flag: ${spike.toSeq}")
    assert(spike.head.getDouble(4) > 3.0)
  }
}
