package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** Event-stream analytics, batch form (SURVEY.md §2.C). The Structured
  * Streaming equivalents (same logical plans under `readStream`) live in
  * graft.streaming.EventStreams; these batch forms are what the DuckDB
  * oracle can check.
  */
object Events {

  /** Tumbling 1-hour window aggregation — identical to the streaming
    * groupBy(window($"ts", "1 hour")) plan; partial aggregation makes
    * the shuffle carry (window × type) rows only. */
  def streamWindowAgg(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("w_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_v"))
      .orderBy(col("w_start"), col("event_type"))

  /** Sessionization: a session breaks after a 30-minute silence per
    * user. Window-function form — lag + running count of session starts.
    * One shuffle on user_id; microsecond-exact gap arithmetic. */
  def streamSessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        lag(col("ts"), 1).over(w).as("prev_ts"))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        when(col("prev_ts").isNull
          || unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L,
          1L).otherwise(0L).as("is_new"))
      .select(col("user_id"), col("ts"), col("value"),
        sum(col("is_new")).over(wRun).as("sess_id"))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("s_start"),
        max(col("ts")).as("s_end"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_v"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  /** Semi-structured payloads: extract a typed field out of the JSON
    * `props` column and aggregate it. get_json_object evaluates inside
    * codegen on the scan — no parse-to-struct materialization; at 100 TB
    * prefer `from_json` with an explicit schema once the payload is
    * stable (single parse, columnar after). */
  def qJsonFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Ordered conversion funnel view → click → purchase: a user counts
    * at stage n only with an event strictly after their stage-(n-1)
    * time. Three shuffles on user_id (the natural key); each stage's
    * frame shrinks before the next join, so the expensive joins run on
    * the smallest sides. */
  def eventsFunnel(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = e.where(col("event_type") === "click")
      .join(v, Seq("user_id")).where(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = e.where(col("event_type") === "purchase")
      .join(c, Seq("user_id")).where(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    v.agg(count(lit(1)).as("n_users")).select(lit(1).as("stage"), col("n_users"))
      .unionAll(c.agg(count(lit(1)).as("n_users"))
        .select(lit(2).as("stage"), col("n_users")))
      .unionAll(p.agg(count(lit(1)).as("n_users"))
        .select(lit(3).as("stage"), col("n_users")))
      .orderBy(col("stage"))
  }

  /** Next-day cohort retention: of the users active on day D, how many
    * came back on D+1. Distinct (user, day) pairs are one shuffle; the
    * cohort match is an equi-join on (user_id, day) (the next-day side
    * re-keys day-1 so no inequality join appears); counts are
    * partial+final with #days rows out. */
  def eventsRetention(s: SparkSession, d: String): DataFrame = {
    // day-truncated timestamp, not DATE: the driver's pandas compare
    // sees DATE as dtype object vs DuckDB's datetime64
    val days = events(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    val nextDay = days.select(col("user_id"),
      (col("day") - expr("INTERVAL 1 DAY")).as("day"))
    val retained = days.join(nextDay, Seq("user_id", "day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_retained"))
    days.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
      .join(retained, Seq("day"), "left")
      .select(col("day"), col("n_active"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"))
      .withColumn("retention",
        round(col("n_retained").cast(DoubleType) / col("n_active"), 6))
      .orderBy(col("day"))
  }

  /** Mergeable distinct-count sketches — the re-aggregation pattern a
    * 100 TB metrics pipeline lives on: per-day HLL sketches of the
    * distinct user set (Apache DataSketches via hll_sketch_agg, one
    * partial+final agg) plus a grand total obtained by UNIONING the
    * daily sketches — never re-reading the events. The total row
    * (day = null) costs #days sketch merges instead of a second
    * corpus-wide distinct. Estimates are sketch-accurate, not exact:
    * rows-only in the gate; EventsSpec bounds the error vs exact. */
  def sketchDailyUniques(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val perDay = daily.select(col("day"),
      hll_sketch_estimate(col("sk")).as("est_uniques"))
    val total = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("est_uniques"))
      .select(lit(null).cast(TimestampType).as("day"), col("est_uniques"))
    perDay.unionByName(total).orderBy(col("day").asc_nulls_last)
  }

  /** Trailing-window anomaly detection over daily event volumes — the
    * ops-analytics closer of the events suite: per (event_type, day),
    * a z-score of the day's count against the prior 7 days' mean/std.
    * Exactness discipline: the window carries only INTEGER sums (s1,
    * s2 = Σcnt, Σcnt²) — exact at any size — and the mean/std/z double
    * arithmetic is ONE expression mirrored verbatim in the oracle, so
    * the doubles match bit-for-bit; zero-variance windows yield null z
    * (never NaN). Rows-window (not range): gap days don't exist in the
    * grouped input, and "last 7 observed days" is the operational
    * baseline. One shuffle for the daily rollup; the window state is
    * 7 longs per (event_type) partition. */
  def eventsAnomaly(s: SparkSession, d: String): DataFrame =
    eventsAnomalyFrom(events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")))

  /** Core of [[eventsAnomaly]] over a pre-aggregated (event_type, day,
    * cnt) frame — the reusable form for non-events daily series. */
  def eventsAnomalyFrom(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    val s1d = col("s1").cast(DoubleType)
    val s2d = col("s2").cast(DoubleType)
    val var7 = (s2d - s1d * s1d / 7.0) / 6.0
    val z = when(var7 > 0,
      round((col("cnt").cast(DoubleType) - s1d / 7.0) / sqrt(var7), 6))
    daily
      .withColumn("n_prior", count(col("cnt")).over(w))
      .withColumn("s1", sum(col("cnt")).over(w))
      .withColumn("s2", sum(col("cnt") * col("cnt")).over(w))
      .where(col("n_prior") === 7)
      .withColumn("mean7", round(s1d / 7.0, 6))
      .withColumn("z", z)
      .withColumn("anomaly", coalesce(abs(col("z")) >= 3.0, lit(false)))
      .select(col("event_type"), col("day"), col("cnt"), col("mean7"),
        col("z"), col("anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Top event-type trigrams across all user timelines — the sequence
    * pattern report behind funnel DESIGN (which 3-step paths actually
    * occur, before you hard-code one in events_funnel). lead() over the
    * per-user order gives consecutive triples; counts aggregate to
    * #distinct-type³ rows max. One shuffle on user_id (same partitioning
    * the sessionize family reuses); the top-20 compiles to TakeOrdered
    * with a total tie-break order, never a global sort. */
  def eventsUserPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_type").as("e1"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("e1"), col("e2"), col("e3"))
      .limit(20)
  }

  /** Session-length distribution: sessionize (same 30-min-gap kernel as
    * stream_sessionize), then report per events-per-session bucket how
    * many sessions occur and how long they run — the engagement
    * histogram a product team reads next to retention. Duration sums
    * are exact micros longs; the mean divides as double in a fixed
    * order mirrored by the oracle. Shuffles: user_id (sessionize),
    * then n_events (#buckets rows after partial agg). */
  def eventsSessionStats(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        lag(col("ts"), 1).over(w).as("prev_ts"))
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("prev_ts").isNull
          || unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L,
          1L).otherwise(0L).as("is_new"))
      .select(col("user_id"), col("ts"), sum(col("is_new")).over(wRun).as("sess_id"))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dur_us"))
    sess.groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_sessions"),
        round(sum(col("dur_us")).cast(DoubleType) / count(lit(1)) / 1000000.0, 6)
          .as("mean_dur_s"),
        round(max(col("dur_us")).cast(DoubleType) / 1000000.0, 6).as("max_dur_s"))
      .orderBy(col("n_events"))
  }

  /** Exact daily heavy hitters: top-3 event types per day. Aggregate
    * first (partial+final, #(day × type) rows), rank the tiny result —
    * exact and cheap while the key space is bounded; the unbounded-key
    * sibling is the sketch path (sketch_daily_uniques family). */
  def eventsHeavyHitters(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("day"))
        .orderBy(col("cnt").desc, col("event_type"))))
      .where(col("rk") <= 3)
      .orderBy(col("day"), col("rk"))

  /** Last-touch attribution: every purchase credits the most recent
    * STRICTLY-preceding view by the same user — the running-state form
    * (one ordered window carrying the last view timestamp), not a
    * self-join: the naive events⋈events by user explodes on active
    * users, while the window is one shuffle on user_id and a single
    * ordered pass. Purchases with no prior view drop (nothing to
    * credit). Latency stays in exact integer micros. */
  def eventsAttribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        last(when(col("event_type") === "view", col("ts")),
          ignoreNulls = true).over(w).as("view_ts"))
      .where(col("event_type") === "purchase" && col("view_ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("latency_us"))
      .orderBy(col("event_id"))
  }

  /** Full cohort-retention matrix: users grouped by first-seen day,
    * activity counted at each day offset 0..7 — the triangle chart
    * events_retention (next-day only) is one diagonal of. The cohort
    * day attaches via a per-user window MIN over the distinct
    * (user, day) table — single lineage, one events scan, no
    * first-day self-join. Offsets are exact integer day diffs. */
  def eventsCohortMatrix(s: SparkSession, d: String,
                         maxOffset: Int = 7): DataFrame = {
    val days = events(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
      .withColumn("cohort",
        min(col("day")).over(Window.partitionBy(col("user_id"))))
    days
      .select(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .where(col("day_offset") <= maxOffset)
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** Per-user RFM table (recency / frequency / monetary) — the
    * segmentation input of lifecycle analytics: seconds since the
    * user's last event (against the corpus-max reference time),
    * purchase count, and decimal-exact purchase value. The reference
    * time is a TWO-STAGE global max straight off the events scan
    * (per-partition partial maxima → one-row final agg → 1-row
    * broadcast) — never a single-partition window over the per-user
    * table (billions of rows at 100 TB through one task, the round-10
    * review's finding) and never a shuffle: the ref branch is a
    * column-pruned (ts-only) scan-agg. Plan-pinned in
    * PlanRegressionSpec: zero Window nodes, ref side broadcast. */
  def eventsRfm(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val perUser = ev
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(when(col("event_type") === "purchase", 1)).as("frequency"),
        sum(when(col("event_type") === "purchase",
          col("value").cast(DecimalType(18, 2)))).as("mon_dec"))
    val ref = ev.agg(max(unix_micros(col("ts"))).as("ref_us"))
    perUser
      .crossJoin(broadcast(ref))
      .select(col("user_id"),
        expr("(ref_us - last_us) div 1000000").as("recency_s"),
        col("frequency"),
        coalesce(col("mon_dec").cast(DoubleType), lit(0.0)).as("monetary"))
      .orderBy(col("user_id"))
  }

  /** Burst/bot screen: users whose event rate spikes inside any single
    * minute — the abuse signal raw daily volumes can't see. Two
    * hash-agg levels, both shrinking: (user, minute) counts, then the
    * per-user peak; the flag threshold marks users whose peak minute
    * holds ≥ `burst` events. All-integer output. */
  def eventsBotFlags(s: SparkSession, d: String,
                     burst: Long = 5L): DataFrame =
    events(s, d)
      .groupBy(col("user_id"), date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(max(col("cnt")).as("peak_minute_cnt"),
        sum(col("cnt")).as("n_events"))
      .withColumn("flagged", col("peak_minute_cnt") >= burst)
      .orderBy(col("user_id"))

  /** First-order Markov transition matrix over event types — the
    * behavioural model behind next-action prediction and funnel-drop
    * diagnosis: P(next event type | current event type), estimated
    * MLE over every per-user consecutive pair.
    *
    * Scale shape: the lag window partitions by user (bounded by one
    * user's history, never the corpus); pairs reduce immediately to
    * the ≤|types|² transition table, whose row-share normalization
    * windows over that tiny table. Deterministic pair order: ties on
    * ts break by event_id (unique). */
  def eventsMarkov(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("cur"))
      .agg(count(lit(1)).as("cnt"))
      // UNROUNDED (the eventsInterArrival rule): one IEEE division of
      // exact integers is bit-identical in both engines, while
      // round(x, 6) can flip on boundary-adjacent quotients
      .withColumn("p", col("cnt").cast(DoubleType) /
        sum(col("cnt")).over(Window.partitionBy(col("prev"))))
      .orderBy(col("prev"), col("cur"))
  }

  /** Per-user inter-arrival statistics — the cadence signal behind
    * engagement scoring and bot screens (a human's gaps are heavy-
    * tailed; a cron job's are constant). Gap multiset is order-
    * invariant under timestamp ties (sorted-sequence differences), so
    * the report is deterministic without a tie-break column. Same
    * bounded per-user window as sessionization; the mean divides two
    * EXACT integer sums so the rounded double matches DuckDB's. */
  def eventsInterArrival(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .where(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        // UNROUNDED: one IEEE division of exact integers is identical
        // in both engines; round(x, 6) is NOT (a boundary-adjacent
        // quotient flipped Spark vs DuckDB at sf0.1 — the usual
        // round-the-decimal discipline has no decimal here to round)
        (sum(col("gap_us")).cast(DoubleType) /
          (count(lit(1)) * 1000000.0)).as("mean_gap_s"),
        (max(col("gap_us")) / lit(1000000L)).as("max_gap_s"))
      .orderBy(col("user_id"))
  }

  /** DAU/WAU stickiness per day — the retention headline metric.
    * NO range join and no per-day rescan: the (day, user) distinct
    * table is computed once, and each active day CONTRIBUTES itself to
    * the 7 report days it falls inside (explode of a 7-element date
    * sequence — map-only fan-out of the already-reduced actives
    * table), so WAU is one countDistinct shuffle keyed by report day.
    * Report days clamp to observed days via the semi join with the
    * DAU side (a trailing window that ends after the data would
    * otherwise report phantom days). */
  def eventsDauStickiness(s: SparkSession, d: String): DataFrame = {
    val da = events(s, d)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id")).distinct()
    val dau = da.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
    val wau = da
      .select(explode(expr(
        "sequence(day, day + interval 6 days, interval 1 day)")).as("day"),
        col("user_id"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        // UNROUNDED: integer/integer quotient, bit-identical both engines
        (col("dau").cast(DoubleType) / col("wau")).as("stickiness"))
      .orderBy(col("day"))
  }

  /** Hour-of-day activity profile per event type — the seasonality
    * fingerprint behind anomaly baselines and traffic shaping. One
    * partial+final agg to ≤24×|types| rows; shares window over that
    * tiny table. */
  def eventsHourlyProfile(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"), hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
      // UNROUNDED: integer/integer quotient, bit-identical both engines
      .withColumn("share", col("cnt").cast(DoubleType) /
        sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
      .orderBy(col("event_type"), col("hour"))

  /** Fixed-width value histogram per event type — the distribution
    * report a monitoring pipeline publishes (and the input to skew-
    * aware budget decisions). Bucket assignment is map-only integer
    * floor of an IEEE division both engines compute identically; one
    * partial+final agg to (type × bucket) rows. */
  def eventsValueHistogram(s: SparkSession, d: String,
                           width: Double = 50.0): DataFrame =
    events(s, d)
      .where(col("value").isNotNull)
      .withColumn("bucket", floor(col("value") / width).cast(LongType))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"), col("bucket"),
        (col("bucket") * width).as("bucket_lo"), col("cnt"))
      .orderBy(col("event_type"), col("bucket"))

  /** Per-user activity streaks — the gaps-and-islands decomposition
    * (consecutive active days collapse into one [start, end] island):
    * the engagement-streak feature behind retention scoring and
    * "n-day streak" product mechanics. Classic two-window form, both
    * windows partitioned by user (bounded by one user's distinct
    * days, never the corpus): lag finds gap starts, a running sum of
    * gap flags numbers the islands, one agg per (user, island).
    * Day arithmetic in whole days via datediff — exact integers. */
  def eventsActiveStreaks(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
      .withColumn("gap",
        when(datediff(col("day"), lag(col("day"), 1).over(w)) === 1, 0L)
          .otherwise(1L))
      .withColumn("streak", sum(col("gap")).over(wRun))
      .groupBy(col("user_id"), col("streak"))
      .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
        count(lit(1)).as("n_days"))
      .select(col("user_id"), col("start_day"), col("end_day"), col("n_days"))
      .orderBy(col("user_id"), col("start_day"))
  }

  /** Seasonal-naive forecast backtest per event type — the baseline
    * every traffic forecast is judged against (and the capacity-
    * planning sanity number itself): the hour-of-week profile fitted
    * on days BEFORE `splitDay` predicts each observed test bucket, and
    * per-type MAE reports how predictable the stream is. Buckets
    * absent from the test window are unobserved, not zero (conditional
    * MAE — mirrored by the oracle); test buckets whose (dow, hour)
    * never occurred in training forecast 0. Scale shape: events reduce
    * once to (type, day, dow, hour) counts (partial+final agg); the
    * profile is a second agg over that ≤types×168-per-day reduction;
    * the backtest joins profile (broadcast-sized) onto test buckets.
    * Determinism: the profile is one exact BIGINT/BIGINT division;
    * per-bucket errors round to 9 dp and sum as DECIMAL (the zipf
    * discipline); mae ships as the unrounded quotient of that exact
    * sum. */
  def eventsForecastBaseline(s: SparkSession, d: String,
                             splitDay: String = "2024-01-22"): DataFrame =
    forecastBaseline(events(s, d), splitDay)

  def forecastBaseline(ev: DataFrame,
                       splitDay: String = "2024-01-22"): DataFrame = {
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"),
        dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val split = to_timestamp(lit(splitDay))
    val prof = hourly.where(col("day") < split)
      .groupBy(col("event_type"), col("dow"), col("hour"))
      .agg((sum(col("cnt")).cast(DoubleType) / count(lit(1))).as("fc"))
    hourly.where(col("day") >= split)
      .join(broadcast(prof), Seq("event_type", "dow", "hour"), "left")
      .select(col("event_type"),
        round(abs(col("cnt") - coalesce(col("fc"), lit(0.0))), 9)
          .cast(DecimalType(28, 9)).as("err"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"),
        (sum(col("err")).cast(DoubleType) / count(lit(1))).as("mae"))
      .orderBy(col("event_type"))
  }

  /** Conversion funnel with a bounded attribution window: each stage
    * counts only within 7 days of the previous stage's first touch —
    * the form marketing attribution actually uses (an unbounded funnel
    * credits year-old views). Same shrinking-frame join shape as
    * [[eventsFunnel]]; the window bound is one extra pushed predicate
    * per stage, so the plan is identical plus a filter. */
  def eventsFunnelWindowed(s: SparkSession, d: String,
                           windowDays: Int = 7): DataFrame = {
    val e = events(s, d)
    val iv = expr(s"INTERVAL $windowDays DAYS")
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = e.where(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .where(col("ts") > col("t1") && col("ts") <= col("t1") + iv)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = e.where(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .where(col("ts") > col("t2") && col("ts") <= col("t2") + iv)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    v.agg(count(lit(1)).as("n_users")).select(lit(1).as("stage"), col("n_users"))
      .unionAll(c.agg(count(lit(1)).as("n_users"))
        .select(lit(2).as("stage"), col("n_users")))
      .unionAll(p.agg(count(lit(1)).as("n_users"))
        .select(lit(3).as("stage"), col("n_users")))
      .orderBy(col("stage"))
  }

  /** New-vs-returning daily split — the acquisition/retention headline
    * every growth dashboard leads with. ONE events scan: the (day,
    * user) distinct table carries its user's first-seen day as a
    * window MIN over the per-user day list (bounded by one user's
    * active days, never the corpus), then a per-day partial+final
    * agg. */
  def eventsNewVsReturning(s: SparkSession, d: String): DataFrame = {
    val du = events(s, d)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .distinct()
    du
      .withColumn("first_day",
        min(col("day")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .orderBy(col("day"))
  }

  /** Deterministic A/B experiment assignment + per-arm conversion
    * readout: users hash into arms by the seeded md5 draw (a pure
    * function of user_id — stable across sessions, devices, and
    * reshards, which rand() bucketing is not), then one partial+final
    * agg yields arm sizes, purchaser counts, and the conversion rate
    * (unrounded exact-integer quotient). */
  def eventsAbAssign(s: SparkSession, d: String,
                     experiment: String = "exp1"): DataFrame = {
    val arm = when(substring(md5(concat(col("user_id").cast("string"),
      lit(":" + experiment))), 1, 1) < "8", "A").otherwise("B")
    events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("converted"))
      .select(arm.as("arm"), col("converted"))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converted"))
      .withColumn("conv_rate",
        col("n_converted").cast(DoubleType) / col("n_users"))
      .orderBy(col("arm"))
  }

  /** Week-over-week growth — weekly active users and event volume
    * with their WoW ratios: the topline trend report. One distinct
    * reduction + one weekly agg (the only corpus passes); the lag
    * window runs over the reduced #weeks-row table. Growth ratios are
    * unrounded exact-integer quotients; week 1 reports null growth. */
  def eventsWowGrowth(s: SparkSession, d: String): DataFrame = {
    val wk = events(s, d)
      .select(date_trunc("week", col("ts")).as("week"), col("user_id"))
      .groupBy(col("week"))
      .agg(countDistinct(col("user_id")).as("wau"),
        count(lit(1)).as("n_events"))
    val w = Window.orderBy(col("week"))
    wk.select(col("week"), col("wau"), col("n_events"),
      (col("wau").cast(DoubleType) / lag(col("wau"), 1).over(w))
        .as("wau_growth"),
      (col("n_events").cast(DoubleType) / lag(col("n_events"), 1).over(w))
        .as("events_growth"))
      .orderBy(col("week"))
  }

  /** Two-proportion z-test on the A/B assignment — the significance
    * readout on top of [[eventsAbAssign]]'s per-arm conversion rates
    * (a rate difference means nothing without its sampling error).
    * z = (p_A − p_B) / sqrt(p̂(1−p̂)(1/n_A + 1/n_B)) with the pooled
    * p̂; |z| > 1.96 ⇒ significant at α = 0.05.
    *
    * Scale shape: one per-user partial+final agg (the corpus pass),
    * then FOUR conditional sums to a single row — the z assembles in
    * one double expression over exact integers, identical association
    * order both engines, unrounded. */
  def eventsAbSignificance(s: SparkSession, d: String,
                           experiment: String = "exp1"): DataFrame = {
    val arm = when(substring(md5(concat(col("user_id").cast("string"),
      lit(":" + experiment))), 1, 1) < "8", "A").otherwise("B")
    val pooled = (col("x_a") + col("x_b")).cast(DoubleType) /
      (col("n_a") + col("n_b"))
    events(s, d)
      .groupBy(col("user_id"))
      // time-boxed conversion — purchased within the first day of the
      // user's activity (ever-purchased saturates to 100% on any
      // long-lived user base, making p̂(1−p̂) = 0 and z undefined);
      // exact epoch-µs integers, the conversion_lag discipline
      .agg(min(expr("unix_micros(ts)")).as("t0"),
        min(when(col("event_type") === "purchase",
          expr("unix_micros(ts)"))).as("tp"))
      .select(col("user_id"),
        when(col("tp").isNotNull &&
          col("tp") < col("t0") + lit(86400000000L), 1L)
          .otherwise(0L).as("converted"))
      .select(arm.as("arm"), col("converted"))
      .agg(
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "A", col("converted")).otherwise(0L)).as("x_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === "B", col("converted")).otherwise(0L)).as("x_b"))
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        (col("x_a").cast(DoubleType) / col("n_a")).as("rate_a"),
        (col("x_b").cast(DoubleType) / col("n_b")).as("rate_b"),
        ((col("x_a").cast(DoubleType) / col("n_a") -
          col("x_b").cast(DoubleType) / col("n_b")) /
          sqrt((pooled * (lit(1.0) - pooled)) *
            (lit(1.0) / col("n_a").cast(DoubleType) +
              lit(1.0) / col("n_b").cast(DoubleType)))).as("z_score"))
      .withColumn("significant", abs(col("z_score")) > 1.96)
  }

  /** Event-type affinity (market-basket lift at user granularity):
    * for each unordered type pair, how many users perform BOTH, and
    * the lift n_both·N / (n_a·n_b) — >1 means the behaviours attract.
    * No self-join of the events table: each user's distinct type set
    * (≤|types| entries) collects once and its pair combinations emit
    * via the native [[graft.functions.PairCombinations]] kernel (one
    * tight upper-triangle loop inside whole-stage codegen — the
    * equivalent lambda HOF is CodegenFallback and is kept only as the
    * parity oracle in PairFunctionsSpec), so the shuffle
    * carries ≤|types|²/2 pair rows per user, and the report reduces to
    * ≤|types|² rows. The lift is an unrounded quotient of exact
    * integers. */
  def eventsTypeAffinity(s: SparkSession, d: String): DataFrame = {
    val u = events(s, d).select(col("user_id"), col("event_type")).distinct()
    val nUsers = u.select(countDistinct(col("user_id")).as("nu"))
    val single = u.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = u
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("ts"))
      .select(explode(
        graft.functions.PairFunctions.pairCombinations(col("ts"))).as("p"))
      .groupBy(col("p.a").as("type_a"), col("p.b").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(single.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(single.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), Seq("type_b"))
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_both"),
        ((col("n_both") * col("nu")).cast(DoubleType) /
          (col("n_a") * col("n_b"))).as("lift"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Conversion-lag distribution: whole hours from a user's FIRST view
    * to their FIRST purchase strictly after it, bucketed, with the
    * cumulative converter share per bucket — the time-to-convert curve
    * product analytics reads next to the funnel (the funnel says HOW
    * MANY convert; this says HOW LONG they take).
    *
    * Scale shape: two filtered min() aggs keyed by user (partial+final
    * — the event stream shuffles once per leg as one row per user), an
    * equi-join on user_id, then the histogram agg reduces converters to
    * #buckets rows; the only window (cumulative share) runs over that
    * reduced bucket table, bounded by the time range by construction.
    * Lag is computed in exact epoch microseconds with integer floor
    * division on both engines; cum_share ships as the unrounded
    * quotient of two exact ints. */
  def conversionLag(e: DataFrame, fromType: String = "view",
                    toType: String = "purchase"): DataFrame = {
    val v = e.where(col("event_type") === fromType)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val p = e.where(col("event_type") === toType)
      .join(v, Seq("user_id")).where(col("ts") > col("t_view"))
      .groupBy(col("user_id"), col("t_view")).agg(min(col("ts")).as("t_conv"))
    val buckets = p
      .select(expr("(unix_micros(t_conv) - unix_micros(t_view))" +
        " div 3600000000").as("lag_hours"))
      .groupBy(col("lag_hours")).agg(count(lit(1)).as("n_users"))
    val w = Window.orderBy(col("lag_hours"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    buckets
      .select(col("lag_hours"), col("n_users"),
        sum(col("n_users")).over(w).as("cum_users"),
        (sum(col("n_users")).over(w).cast(DoubleType) /
          sum(col("n_users")).over(all)).as("cum_share"))
      .orderBy(col("lag_hours"))
  }

  def eventsConversionLag(s: SparkSession, d: String): DataFrame =
    conversionLag(events(s, d))

  /** User-tenure survival curve: S(t) = share of users whose observed
    * tenure (days between first and last event) is ≥ t — the
    * discrete-time survival report behind every retention model
    * (retention answers "came back on D+1?"; this answers "how long do
    * users LAST?").
    *
    * Scale shape: one per-user min/max agg (partial+final — the event
    * stream shuffles once as one row per user), a tenure histogram agg
    * to #tenure-days rows, and the reverse-cumulative windows run over
    * that reduced bucket table, bounded by the corpus time range by
    * construction. survival ships as the unrounded quotient of two
    * exact ints. */
  def tenureSurvival(e: DataFrame): DataFrame = {
    val ten = e.groupBy(col("user_id"))
      .agg(datediff(date_trunc("day", max(col("ts"))),
        date_trunc("day", min(col("ts")))).as("tenure_days"))
    val buckets = ten.groupBy(col("tenure_days"))
      .agg(count(lit(1)).as("n_users"))
    val rev = Window.orderBy(col("tenure_days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    buckets
      .select(col("tenure_days"), col("n_users"),
        sum(col("n_users")).over(rev).as("n_surviving"),
        (sum(col("n_users")).over(rev).cast(DoubleType) /
          sum(col("n_users")).over(all)).as("survival"))
      .orderBy(col("tenure_days"))
  }

  def eventsTenureSurvival(s: SparkSession, d: String): DataFrame =
    tenureSurvival(events(s, d))

  /** Weekly growth accounting — the new / retained / resurrected /
    * churned decomposition every growth team reads first: a user's week
    * is `new` (first week ever seen), `retained` (also active the
    * immediately-preceding calendar week), or `resurrected` (returned
    * after a gap); `churned` for week w counts users active in week
    * w−7d who did not return in w, so n_active(w−7d) =
    * n_retained(w) + n_churned(w) holds by construction.
    *
    * Scale shape: events reduce to distinct (user, week) in one
    * partial+final agg; the only per-row window is the per-user lag,
    * bounded by a user's own active weeks (inherent to the
    * semantics); the churn join-back is a self-join of the reduced
    * weekly table (#weeks rows — broadcast by AQE). No corpus-wide
    * windows anywhere. */
  def lifecycleStates(e: DataFrame): DataFrame = {
    val uw = e.select(col("user_id"),
      date_trunc("week", col("ts")).as("week")).distinct()
    val prev = lag(col("week"), 1)
      .over(Window.partitionBy(col("user_id")).orderBy(col("week")))
    val weekly = uw.withColumn("prev_week", prev)
      .select(col("week"),
        when(col("prev_week").isNull, "new")
          .when(datediff(col("week"), col("prev_week")) === 7, "retained")
          .otherwise("resurrected").as("state"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("state") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("state") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("state") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    weekly
      .join(weekly.select(
        (col("week") + expr("INTERVAL 7 DAY")).as("week"),
        col("n_active").as("prev_active")), Seq("week"), "left")
      .select(col("week"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"),
        (coalesce(col("prev_active"), lit(0L)) - col("n_retained"))
          .as("n_churned"))
      .orderBy(col("week"))
  }

  def eventsLifecycleStates(s: SparkSession, d: String): DataFrame =
    lifecycleStates(events(s, d))

  /** Activity-concentration curve: for each per-user event count k,
    * how many users have exactly k events, what share of USERS have
    * ≥ k, and what share of all EVENTS those users contribute — the
    * Lorenz/Pareto readout ("the top 1% of users generate x% of
    * traffic") that sizes bot caps, rate limits, and skew handling.
    *
    * Scale shape: one per-user count (partial+final, one row per
    * user), then a count-of-counts histogram agg to #distinct-count
    * rows; both cumulative windows run over that reduced histogram
    * only — NEVER a rank/ntile over the corpus-sized per-user table.
    * Both shares ship as unrounded quotients of exact integers. */
  def userConcentration(e: DataFrame): DataFrame = {
    val hist = e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("n_events")).agg(count(lit(1)).as("n_users"))
    val rev = Window.orderBy(col("n_events").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .select(col("n_events"), col("n_users"),
        (sum(col("n_users")).over(rev).cast(DoubleType) /
          sum(col("n_users")).over(all)).as("user_share_ge"),
        (sum(col("n_events") * col("n_users")).over(rev)
          .cast(DoubleType) /
          sum(col("n_events") * col("n_users")).over(all))
          .as("event_share_ge"))
      .orderBy(col("n_events"))
  }

  def eventsUserConcentration(s: SparkSession, d: String): DataFrame =
    userConcentration(events(s, d))

  /** Calendar-spine densification: the daily event count with MISSING
    * days restored as explicit zero rows (flagged `filled`) — the gap
    * fill every time-series consumer (forecasting, anomaly scoring,
    * charting) needs before a window over time is trustworthy: a lag
    * over a sparse table silently compares non-adjacent days.
    *
    * Scale shape: the corpus reduces to the #days count table
    * (partial+final); the spine generates from a 1-row min/max agg via
    * sequence+explode (#days rows by construction, never a corpus
    * scan); the left join-back is reduced-table × reduced-table (AQE
    * broadcasts). */
  def dailyDense(e: DataFrame): DataFrame = {
    val daily = e.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val spine = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("INTERVAL 1 DAY"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNull.as("filled"))
      .orderBy(col("day"))
  }

  def eventsDailyDense(s: SparkSession, d: String): DataFrame =
    dailyDense(events(s, d))

  /** Cohort LTV curve: for each signup cohort (first-event week) and
    * cohort age in weeks, the week's summed event value, the running
    * cumulative value, and cumulative value PER COHORT USER — the
    * "how much is a week-w user worth by age a" readout that prices
    * acquisition (events_cohort_matrix answers who RETURNS; this
    * answers what they SPEND).
    *
    * Scale shape: one per-user min(ts) agg assigns cohorts (the only
    * corpus-wide shuffle besides the user_id equi-join back), value
    * sums reduce to the (#cohorts × #ages) grid with DECIMAL sums
    * (order-free), the cumulative window runs over that reduced grid
    * partitioned by cohort, and cohort sizes broadcast-join back.
    * ltv ships as one IEEE division of exact decimal-sum doubles. */
  def cohortLtv(e: DataFrame): DataFrame = {
    val firstw = e.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val sizes = firstw.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"))
    val grid = e.join(firstw, Seq("user_id"))
      .groupBy(col("cohort_week"),
        expr("datediff(date_trunc('week', ts), cohort_week) div 7")
          .cast("int").as("age_week"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).as("rev_dec"))
    val w = Window.partitionBy(col("cohort_week"))
      .orderBy(col("age_week"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cum_dec", sum(col("rev_dec")).over(w))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("age_week"), col("n_users"),
        col("rev_dec").cast(DoubleType).as("rev_w"),
        (col("cum_dec").cast(DoubleType) / col("n_users")).as("ltv"))
      .orderBy(col("cohort_week"), col("age_week"))
  }

  def eventsCohortLtv(s: SparkSession, d: String): DataFrame =
    cohortLtv(events(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_cohort_ltv" -> (eventsCohortLtv _),
    "events_daily_dense" -> (eventsDailyDense _),
    "events_lifecycle_states" -> (eventsLifecycleStates _),
    "events_user_concentration" -> (eventsUserConcentration _),
    "events_conversion_lag" -> (eventsConversionLag _),
    "events_tenure_survival" -> (eventsTenureSurvival _),
    "events_type_affinity" -> (eventsTypeAffinity _),
    "events_ab_assign" -> ((s: SparkSession, d: String) =>
      eventsAbAssign(s, d)),
    "events_ab_significance" -> ((s: SparkSession, d: String) =>
      eventsAbSignificance(s, d)),
    "events_wow_growth" -> (eventsWowGrowth _),
    "events_funnel_windowed" -> ((s: SparkSession, d: String) =>
      eventsFunnelWindowed(s, d)),
    "events_new_vs_returning" -> (eventsNewVsReturning _),
    "events_markov" -> (eventsMarkov _),
    "events_inter_arrival" -> (eventsInterArrival _),
    "events_dau_stickiness" -> (eventsDauStickiness _),
    "events_hourly_profile" -> (eventsHourlyProfile _),
    "events_forecast_baseline" -> ((s: SparkSession, d: String) =>
      eventsForecastBaseline(s, d)),
    "events_active_streaks" -> (eventsActiveStreaks _),
    "events_value_histogram" -> ((s: SparkSession, d: String) =>
      eventsValueHistogram(s, d)),
    "events_anomaly" -> (eventsAnomaly _),
    "sketch_daily_uniques" -> (sketchDailyUniques _),
    "events_retention" -> (eventsRetention _),
    "stream_window_agg" -> (streamWindowAgg _),
    "stream_sessionize" -> (streamSessionize _),
    "q_json_funcs" -> (qJsonFuncs _),
    "events_funnel" -> (eventsFunnel _),
    "events_user_paths" -> (eventsUserPaths _),
    "events_session_stats" -> (eventsSessionStats _),
    "events_heavy_hitters" -> (eventsHeavyHitters _),
    "events_attribution" -> (eventsAttribution _),
    "events_cohort_matrix" -> ((s: SparkSession, d: String) =>
      eventsCohortMatrix(s, d)),
    "events_rfm" -> (eventsRfm _),
    "events_bot_flags" -> ((s: SparkSession, d: String) =>
      eventsBotFlags(s, d))
  )

  val oracles: Map[String, String] = Map(
    "events_cohort_ltv" ->
      """WITH fw AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events GROUP BY user_id
        |), sz AS (
        |  SELECT cohort_week, count(*) AS n_users FROM fw GROUP BY 1
        |), grid AS (
        |  SELECT fw.cohort_week,
        |    CAST(date_diff('day', fw.cohort_week,
        |      date_trunc('week', e.ts)) // 7 AS INT) AS age_week,
        |    sum(CAST(e.value AS DECIMAL(18,2))) AS rev_dec
        |  FROM events e JOIN fw USING (user_id)
        |  GROUP BY 1, 2
        |)
        |SELECT g.cohort_week, g.age_week, sz.n_users,
        |  CAST(g.rev_dec AS DOUBLE) AS rev_w,
        |  CAST(sum(g.rev_dec) OVER (PARTITION BY g.cohort_week
        |    ORDER BY g.age_week ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
        |    sz.n_users AS ltv
        |FROM grid g JOIN sz USING (cohort_week)
        |ORDER BY g.cohort_week, g.age_week""".stripMargin,
    "events_daily_dense" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, count(*) AS n_events
        |  FROM events GROUP BY 1
        |), spine AS (
        |  SELECT unnest(generate_series(min(day), max(day),
        |    INTERVAL 1 DAY)) AS day
        |  FROM daily
        |)
        |SELECT s.day,
        |  CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events,
        |  d.n_events IS NULL AS filled
        |FROM spine s LEFT JOIN daily d USING (day)
        |ORDER BY s.day""".stripMargin,
    "events_lifecycle_states" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week
        |  FROM events
        |), st AS (
        |  SELECT week,
        |    CASE WHEN prev_week IS NULL THEN 'new'
        |         WHEN date_diff('day', prev_week, week) = 7
        |           THEN 'retained'
        |         ELSE 'resurrected' END AS state
        |  FROM (SELECT week,
        |          lag(week) OVER (PARTITION BY user_id ORDER BY week)
        |            AS prev_week
        |        FROM uw)
        |), weekly AS (
        |  SELECT week, count(*) AS n_active,
        |    count(*) FILTER (WHERE state = 'new') AS n_new,
        |    count(*) FILTER (WHERE state = 'retained') AS n_retained,
        |    count(*) FILTER (WHERE state = 'resurrected')
        |      AS n_resurrected
        |  FROM st GROUP BY week
        |)
        |SELECT w.week, CAST(w.n_active AS BIGINT) AS n_active,
        |  CAST(w.n_new AS BIGINT) AS n_new,
        |  CAST(w.n_retained AS BIGINT) AS n_retained,
        |  CAST(w.n_resurrected AS BIGINT) AS n_resurrected,
        |  CAST(coalesce(p.n_active, 0) - w.n_retained AS BIGINT)
        |    AS n_churned
        |FROM weekly w
        |LEFT JOIN weekly p ON w.week = p.week + INTERVAL 7 DAY
        |ORDER BY w.week""".stripMargin,
    "events_user_concentration" ->
      """WITH per AS (
        |  SELECT user_id, count(*) AS n_events FROM events GROUP BY 1
        |), h AS (
        |  SELECT n_events, count(*) AS n_users FROM per GROUP BY 1
        |)
        |SELECT n_events, CAST(n_users AS BIGINT) AS n_users,
        |  CAST(sum(n_users) OVER (ORDER BY n_events DESC
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
        |  CAST(sum(n_users) OVER () AS DOUBLE) AS user_share_ge,
        |  CAST(sum(n_events * n_users) OVER (ORDER BY n_events DESC
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
        |  CAST(sum(n_events * n_users) OVER () AS DOUBLE)
        |    AS event_share_ge
        |FROM h ORDER BY n_events""".stripMargin,
    "events_tenure_survival" ->
      """WITH u AS (
        |  SELECT user_id, CAST(date_diff('day',
        |    date_trunc('day', min(ts)), date_trunc('day', max(ts)))
        |    AS INT) AS tenure_days
        |  FROM events GROUP BY user_id
        |), b AS (
        |  SELECT tenure_days, count(*) AS n_users FROM u GROUP BY 1
        |)
        |SELECT tenure_days, CAST(n_users AS BIGINT) AS n_users,
        |  CAST(sum(n_users) OVER (ORDER BY tenure_days DESC
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_surviving,
        |  CAST(sum(n_users) OVER (ORDER BY tenure_days DESC
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
        |  CAST(sum(n_users) OVER () AS DOUBLE) AS survival
        |FROM b ORDER BY tenure_days""".stripMargin,
    "events_conversion_lag" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), p AS (
        |  SELECT e.user_id, v.t_view, min(e.ts) AS t_conv
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > v.t_view
        |  GROUP BY e.user_id, v.t_view
        |), b AS (
        |  SELECT (epoch_us(t_conv) - epoch_us(t_view)) // 3600000000
        |    AS lag_hours, count(*) AS n_users
        |  FROM p GROUP BY 1
        |)
        |SELECT lag_hours, CAST(n_users AS BIGINT) AS n_users,
        |  CAST(sum(n_users) OVER (ORDER BY lag_hours
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users,
        |  CAST(sum(n_users) OVER (ORDER BY lag_hours
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
        |  CAST(sum(n_users) OVER () AS DOUBLE) AS cum_share
        |FROM b ORDER BY lag_hours""".stripMargin,
    "events_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), wv AS (
        |  SELECT event_type, day, cnt,
        |    count(cnt) OVER w AS n_prior,
        |    sum(cnt) OVER w AS s1,
        |    sum(cnt * cnt) OVER w AS s2
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |), scored AS (
        |  SELECT event_type, day, cnt,
        |    round(CAST(s1 AS DOUBLE) / 7.0, 6) AS mean7,
        |    CASE WHEN (CAST(s2 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) / 6.0 > 0
        |      THEN round((CAST(cnt AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0)
        |        / sqrt((CAST(s2 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) / 6.0), 6)
        |      ELSE NULL END AS z
        |  FROM wv WHERE n_prior = 7
        |)
        |SELECT event_type, day, cnt, mean7, z,
        |  coalesce(abs(z) >= 3.0, false) AS anomaly
        |FROM scored ORDER BY event_type, day""".stripMargin,

    "events_retention" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        |), r AS (
        |  SELECT a.day, count(*) AS n_retained
        |  FROM d a JOIN d b ON a.user_id = b.user_id
        |    AND b.day = a.day + INTERVAL 1 DAY
        |  GROUP BY a.day
        |)
        |SELECT d.day, count(*) AS n_active,
        |  coalesce(any_value(r.n_retained), 0) AS n_retained,
        |  round(CAST(coalesce(any_value(r.n_retained), 0) AS DOUBLE)
        |    / count(*), 6) AS retention
        |FROM d LEFT JOIN r ON d.day = r.day
        |GROUP BY d.day ORDER BY d.day""".stripMargin,

    "stream_window_agg" ->
      """SELECT date_trunc('hour', ts) AS w_start, event_type,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "stream_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), y AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN prev_ts IS NULL
        |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
        |      THEN 1 ELSE 0 END AS is_new,
        |    event_id
        |  FROM x
        |), z AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
        |  FROM y
        |)
        |SELECT user_id, sess_id, count(*) AS n_events,
        |  min(ts) AS s_start, max(ts) AS s_end,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM z GROUP BY 1, 2 ORDER BY user_id, sess_id""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |    AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  -- epoch_us: Spark compares at micros (TIMESTAMP(NANOS) read
        |  -- via the micros conversion), so the oracle must too, or a
        |  -- same-microsecond nano tie flips the strict inequality
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id AND epoch_us(e.ts) > epoch_us(v.t1)
        |  WHERE e.event_type = 'click' GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id AND epoch_us(e.ts) > epoch_us(c.t2)
        |  WHERE e.event_type = 'purchase' GROUP BY 1
        |)
        |SELECT CAST(1 AS INTEGER) AS stage, count(*) AS n_users FROM v
        |UNION ALL
        |SELECT CAST(2 AS INTEGER) AS stage, count(*) AS n_users FROM c
        |UNION ALL
        |SELECT CAST(3 AS INTEGER) AS stage, count(*) AS n_users FROM p
        |ORDER BY stage""".stripMargin,

    "events_user_paths" ->
      """WITH t AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e3
        |  FROM events
        |)
        |SELECT e1, e2, e3, count(*) AS cnt FROM t
        |WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY cnt DESC, e1, e2, e3 LIMIT 20""".stripMargin,

    "events_session_stats" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), y AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL
        |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM x
        |), z AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
        |  FROM y
        |), sess AS (
        |  SELECT user_id, sess_id, count(*) AS n_events,
        |    epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        |  FROM z GROUP BY 1, 2
        |)
        |SELECT n_events, count(*) AS n_sessions,
        |  round(CAST(sum(dur_us) AS DOUBLE) / count(*) / 1000000.0, 6)
        |    AS mean_dur_s,
        |  round(CAST(max(dur_us) AS DOUBLE) / 1000000.0, 6) AS max_dur_s
        |FROM sess GROUP BY n_events ORDER BY n_events""".stripMargin,

    "events_heavy_hitters" ->
      """WITH d AS (
        |  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT day, event_type, cnt,
        |    row_number() OVER (PARTITION BY day
        |      ORDER BY cnt DESC, event_type) AS rk
        |  FROM d
        |)
        |SELECT day, event_type, cnt, rk FROM r
        |WHERE rk <= 3 ORDER BY day, rk""".stripMargin,

    "events_attribution" ->
      """WITH t AS (
        |  SELECT event_id, user_id, event_type, ts,
        |    last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_ts
        |  FROM events
        |)
        |SELECT event_id, user_id,
        |  epoch_us(ts) - epoch_us(view_ts) AS latency_us
        |FROM t WHERE event_type = 'purchase' AND view_ts IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "events_cohort_matrix" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        |), c AS (
        |  SELECT user_id, day,
        |    min(day) OVER (PARTITION BY user_id) AS cohort
        |  FROM d
        |)
        |SELECT cohort, date_diff('day', cohort, day) AS day_offset,
        |  count(*) AS n_users
        |FROM c WHERE date_diff('day', cohort, day) <= 7
        |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin,

    "events_rfm" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(epoch_us(ts)) AS last_us,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS frequency,
        |    sum(CASE WHEN event_type = 'purchase'
        |        THEN CAST(value AS DECIMAL(18,2)) END) AS mon_dec
        |  FROM events GROUP BY user_id
        |)
        |SELECT user_id,
        |  (max(last_us) OVER () - last_us) // 1000000 AS recency_s,
        |  frequency,
        |  coalesce(CAST(mon_dec AS DOUBLE), 0.0) AS monetary
        |FROM u ORDER BY user_id""".stripMargin,

    "events_bot_flags" ->
      """WITH m AS (
        |  SELECT user_id, date_trunc('minute', ts) AS minute,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT user_id, max(cnt) AS peak_minute_cnt,
        |  CAST(sum(cnt) AS BIGINT) AS n_events, max(cnt) >= 5 AS flagged
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_type_affinity" ->
      """WITH u AS (
        |  SELECT DISTINCT user_id, event_type FROM events
        |), nu AS (SELECT count(DISTINCT user_id) AS nu FROM u),
        |s AS (SELECT event_type, count(*) AS n FROM u GROUP BY 1),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_both
        |  FROM u a JOIN u b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT type_a, type_b, n_both,
        |  CAST(n_both * nu AS DOUBLE) / (sa.n * sb.n) AS lift
        |FROM p
        |JOIN s sa ON p.type_a = sa.event_type
        |JOIN s sb ON p.type_b = sb.event_type
        |CROSS JOIN nu
        |ORDER BY type_a, type_b""".stripMargin,

    "events_wow_growth" ->
      """WITH wk AS (
        |  SELECT date_trunc('week', ts) AS week,
        |    count(DISTINCT user_id) AS wau, count(*) AS n_events
        |  FROM events GROUP BY 1
        |)
        |SELECT week, wau, n_events,
        |  CAST(wau AS DOUBLE) / lag(wau) OVER (ORDER BY week)
        |    AS wau_growth,
        |  CAST(n_events AS DOUBLE) / lag(n_events) OVER (ORDER BY week)
        |    AS events_growth
        |FROM wk ORDER BY week""".stripMargin,
    "events_ab_significance" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CASE WHEN min(CASE WHEN event_type = 'purchase'
        |          THEN epoch_us(ts) END) IS NOT NULL
        |      AND min(CASE WHEN event_type = 'purchase'
        |          THEN epoch_us(ts) END) < min(epoch_us(ts)) + 86400000000
        |      THEN 1 ELSE 0 END AS converted
        |  FROM events GROUP BY user_id
        |), a AS (
        |  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':exp1'),
        |      1, 1) < '8' THEN 'A' ELSE 'B' END AS arm,
        |    converted
        |  FROM u
        |), c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN converted ELSE 0 END)
        |      AS BIGINT) AS x_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN arm = 'B' THEN converted ELSE 0 END)
        |      AS BIGINT) AS x_b
        |  FROM a
        |)
        |SELECT n_a, x_a, n_b, x_b,
        |  CAST(x_a AS DOUBLE) / n_a AS rate_a,
        |  CAST(x_b AS DOUBLE) / n_b AS rate_b,
        |  (CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b) /
        |    sqrt(((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
        |      (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))) *
        |      (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |    AS z_score,
        |  abs((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b) /
        |    sqrt(((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
        |      (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))) *
        |      (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))))
        |    > 1.96 AS significant
        |FROM c""".stripMargin,
    "events_ab_assign" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events GROUP BY user_id
        |), a AS (
        |  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':exp1'),
        |      1, 1) < '8' THEN 'A' ELSE 'B' END AS arm,
        |    converted
        |  FROM u
        |)
        |SELECT arm, count(*) AS n_users,
        |  CAST(sum(converted) AS BIGINT) AS n_converted,
        |  CAST(sum(converted) AS DOUBLE) / count(*) AS conv_rate
        |FROM a GROUP BY arm ORDER BY arm""".stripMargin,

    "events_funnel_windowed" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1
        |    AND e.ts <= v.t1 + INTERVAL 7 DAY
        |  GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |    AND e.ts <= c.t2 + INTERVAL 7 DAY
        |  GROUP BY e.user_id
        |)
        |SELECT CAST(1 AS INTEGER) AS stage, count(*) AS n_users FROM v
        |UNION ALL SELECT 2, count(*) FROM c
        |UNION ALL SELECT 3, count(*) FROM p
        |ORDER BY stage""".stripMargin,

    "events_new_vs_returning" ->
      """WITH du AS (
        |  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
        |), f AS (
        |  SELECT day, user_id,
        |    min(day) OVER (PARTITION BY user_id) AS first_day
        |  FROM du
        |), a AS (
        |  SELECT day, count(*) AS n_active,
        |    CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_new
        |  FROM f GROUP BY day
        |)
        |SELECT day, n_active, n_new, n_active - n_new AS n_returning
        |FROM a ORDER BY day""".stripMargin,

    "events_markov" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev,
        |    event_type AS cur
        |  FROM events
        |), t AS (
        |  SELECT prev, cur, count(*) AS cnt FROM p
        |  WHERE prev IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT prev, cur, cnt,
        |  CAST(cnt AS DOUBLE) /
        |    CAST(sum(cnt) OVER (PARTITION BY prev) AS DOUBLE) AS p
        |FROM t ORDER BY prev, cur""".stripMargin,

    "events_inter_arrival" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts) AS gap_us
        |  FROM events
        |)
        |SELECT user_id, count(*) AS n_gaps,
        |  CAST(sum(gap_us) AS DOUBLE) / (count(*) * 1000000.0)
        |    AS mean_gap_s,
        |  max(gap_us) / 1000000 AS max_gap_s
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_dau_stickiness" ->
      """WITH da AS (
        |  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
        |), dau AS (
        |  SELECT day, count(DISTINCT user_id) AS dau FROM da GROUP BY day
        |), contrib AS (
        |  SELECT unnest(generate_series(day, day + INTERVAL 6 DAY,
        |    INTERVAL 1 DAY)) AS day, user_id
        |  FROM da
        |), wau AS (
        |  SELECT day, count(DISTINCT user_id) AS wau
        |  FROM contrib GROUP BY day
        |)
        |SELECT day, dau, wau,
        |  CAST(dau AS DOUBLE) / wau AS stickiness
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,

    "events_hourly_profile" ->
      """WITH h AS (
        |  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, hour, cnt,
        |  CAST(cnt AS DOUBLE) /
        |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS DOUBLE)
        |    AS share
        |FROM h ORDER BY event_type, hour""".stripMargin,

    "events_active_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, day,
        |    CASE WHEN date_diff('day',
        |        lag(day) OVER (PARTITION BY user_id ORDER BY day), day) = 1
        |      THEN 0 ELSE 1 END AS gap
        |  FROM days
        |), streaks AS (
        |  SELECT user_id, day,
        |    sum(gap) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS streak
        |  FROM flagged
        |)
        |SELECT user_id, min(day) AS start_day, max(day) AS end_day,
        |  count(*) AS n_days
        |FROM streaks GROUP BY user_id, streak
        |ORDER BY user_id, start_day""".stripMargin,

    "events_forecast_baseline" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |    dayofweek(ts) AS dow, CAST(hour(ts) AS INTEGER) AS hour,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2, 3, 4
        |), prof AS (
        |  SELECT event_type, dow, hour,
        |    CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE) / count(*) AS fc
        |  FROM hourly WHERE day < TIMESTAMP '2024-01-22'
        |  GROUP BY 1, 2, 3
        |)
        |SELECT h.event_type, count(*) AS n_buckets,
        |  CAST(sum(CAST(round(abs(h.cnt - coalesce(p.fc, 0.0)), 9)
        |    AS DECIMAL(28, 9))) AS DOUBLE) / count(*) AS mae
        |FROM hourly h LEFT JOIN prof p
        |  USING (event_type, dow, hour)
        |WHERE h.day >= TIMESTAMP '2024-01-22'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_value_histogram" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(floor(value / 50.0) AS BIGINT) AS bucket
        |  FROM events WHERE value IS NOT NULL
        |)
        |SELECT event_type, bucket, bucket * 50.0 AS bucket_lo,
        |  count(*) AS cnt
        |FROM b GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin
  )
}
