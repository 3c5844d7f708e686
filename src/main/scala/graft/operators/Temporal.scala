package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** Temporal joins (SURVEY.md §2 — operators Spark's Scala API lacks as
  * primitives, composed from shuffles it already does well).
  *
  * Scale design:
  *   - as-of join: the classic union-and-window formulation — tag both
  *     sides, one shuffle on the key, one ordered pass carrying the
  *     last-seen right row forward. No join explosion, no per-row probe;
  *     state is one row per partition-ordered stream. This is how
  *     point-in-time feature joins stay O(n log n) at 100 TB.
  *   - range join: Spark would plan an inequality-only join as a
  *     broadcast-nested-loop (O(n·m)); bucketing time into interval-
  *     sized bins turns it into an equi-join on (key, bucket) with the
  *     right side duplicated into at most 2 bins — linear shuffle, then
  *     an exact range filter.
  */
object Temporal {

  /** For each click, the user's most recent purchase at or before the
    * click (p_ts, p_value; nulls when no prior purchase). */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("side"),
        lit(null).cast(TimestampType).as("pp_ts"),
        lit(null).cast(DoubleType).as("pp_value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        lit(null).cast(LongType).as("event_id"),
        lit(0).as("side"),
        col("ts").as("pp_ts"), col("value").as("pp_value"))
    // right rows sort before left at equal ts so "at or before" includes
    // same-instant purchases
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .select(col("user_id"), col("ts"), col("event_id"), col("side"),
        last(col("pp_ts"), ignoreNulls = true).over(w).as("p_ts"),
        last(col("pp_value"), ignoreNulls = true).over(w).as("p_value"))
      .where(col("side") === 1)
      // no-prior-purchase → explicit epoch/0.0 sentinels: the output
      // stays null-free so downstream schemas (and the oracle compare)
      // keep a single timestamp precision
      .select(col("event_id"), col("user_id"), col("ts"),
        coalesce(col("p_ts"), lit("1970-01-01 00:00:00").cast(TimestampType))
          .as("p_ts"),
        coalesce(col("p_value"), lit(0.0)).as("p_value"))
      .orderBy(col("event_id"))
  }

  /** For each click, count + value-sum of the user's views in the
    * preceding hour — bucketed range join (see class doc). */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val bucket = (c: org.apache.spark.sql.Column) =>
      floor(unix_seconds(c) / 3600L)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"),
        bucket(col("ts")).as("bucket"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("value").as("v_value"),
        explode(array(bucket(col("ts")), bucket(col("ts")) + 1)).as("bucket"))
    clicks
      .join(views,
        col("user_id") === col("v_user") && clicks("bucket") === views("bucket")
          && col("v_ts") >= col("ts") - expr("INTERVAL 1 HOUR")
          && col("v_ts") < col("ts"),
        "left")
      .groupBy(col("event_id"), col("user_id"), col("ts"))
      .agg(count(col("v_ts")).as("n_views"),
        coalesce(sum(col("v_value").cast(DecimalType(18, 2))).cast(DoubleType),
          lit(0.0)).as("sum_views"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _)
  )

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """SELECT c.event_id, c.user_id, c.ts,
        |  coalesce(p.ts, TIMESTAMP '1970-01-01 00:00:00') AS p_ts,
        |  coalesce(p.value, 0.0) AS p_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "q_range_join" ->
      """SELECT c.event_id, c.user_id, c.ts,
        |  count(v.ts) AS n_views,
        |  coalesce(CAST(sum(CAST(v.value AS DECIMAL(18,2))) AS DOUBLE), 0.0)
        |    AS sum_views
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id
        |  AND v.ts >= c.ts - INTERVAL 1 HOUR AND v.ts < c.ts
        |GROUP BY c.event_id, c.user_id, c.ts
        |ORDER BY c.event_id""".stripMargin
  )
}
