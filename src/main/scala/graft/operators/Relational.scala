package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables._

/** The reference engine's SQL surface (SURVEY.md §2.A) plus the standard
  * OLAP completion (§2.B), re-expressed as declarative DataFrame plans.
  *
  * Reference semantics covered (cited per query):
  *   - scan/projection: reference src/executor/scan.rs:1, projection.rs:1
  *   - filter:          reference src/executor/filter.rs:1
  *   - expressions:     reference src/executor/expression.rs:104 (binary ops),
  *                      :66 (unary), :249 (Caster)
  *   - joins:           reference src/executor/nested_join.rs:1 (nested loop;
  *                      here Catalyst picks broadcast-hash / sort-merge /
  *                      broadcast-nested-loop instead)
  *   - aggregates:      reference src/executor/aggregation.rs:168
  *                      (min/max/sum/count/avg), GROUP BY + HAVING
  *   - limit:           reference src/executor/limit.rs:1
  *
  * Float determinism for the DuckDB oracle (SURVEY.md §7): every SUM/AVG
  * over doubles is computed in DECIMAL(18,s) (exact, association-order
  * independent) then cast back to DOUBLE, identically on both sides.
  */
object Relational {

  /** Exact decimal sum of a double column, surfaced as double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact decimal average: decimal sum / count, both deterministic. */
  private def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(c))

  private def dec(c: Column, scale: Int = 2): Column =
    c.cast(DecimalType(18, scale))

  private def ts(s: String): Column = lit(s).cast(TimestampType)

  // ---------------------------------------------------------------------
  // §2.A — reference surface
  // ---------------------------------------------------------------------

  /** Column-pruned scan: only 3 of 11 lineitem columns reach the reader. */
  def qScanProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** WHERE with AND / OR / NOT and comparisons; pushed to parquet. */
  def qFilter(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .where(
        (col("o_orderstatus") === "F" || col("o_totalprice") > 400000.0)
          && !(col("o_orderpriority") === "5-LOW"))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  /** Scalar arithmetic: + - * / %, unary minus, nested parens. Plain
    * IEEE double ops — bit-identical across engines for per-row exprs
    * (only aggregation order needs the decimal trick). */
  def qExprArith(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") * 2 + col("l_tax") - 1).as("v"),
        (col("l_orderkey") % 7).as("m"),
        (-col("l_discount")).as("neg"),
        (col("l_extendedprice") / (col("l_quantity") + 1)).as("unit"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** CAST between int / double / string (reference Caster). */
  def qExprCast(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast(IntegerType).as("qi"),
        col("l_orderkey").cast(DoubleType).as("kd"),
        col("l_linenumber").cast(StringType).as("ls"),
        (lit("7").cast(IntegerType) + lit(1)).as("lit_i"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Boolean algebra incl. XOR (reference expression.rs:117). */
  def qExprBool(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        col("o_orderkey"),
        ((col("o_orderstatus") === "F") =!= (col("o_totalprice") > 200000.0))
          .as("xor_v"),
        (!(col("o_orderstatus") === "O")).as("not_v"),
        ((col("o_totalprice") > 100000.0) && (col("o_orderpriority") === "1-URGENT"))
          .as("and_v"))
      .orderBy(col("o_orderkey"))

  /** LIMIT with a total order so results are deterministic. */
  def qLimit(s: SparkSession, d: String): DataFrame =
    // ORDER BY every projected column: (l_orderkey, l_linenumber) is
    // NOT unique in the corpus, and a tie under LIMIT picks whichever
    // row the layout serves first — deterministic on the single-file
    // gate data by luck, divergent on any multi-file layout (caught by
    // the sf1 oracle run). With all columns in the sort, ties are
    // identical rows and the output is a well-defined multiset.
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .limit(100)

  /** Global (ungrouped) min/max/sum/count/avg — partial+final agg. */
  def qAggGlobal(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      min(col("l_quantity")).as("min_q"),
      max(col("l_quantity")).as("max_q"),
      dsum(col("l_quantity")).as("sum_q"),
      count(lit(1)).as("cnt"),
      count(col("l_quantity")).as("cnt_q"),
      davg(col("l_quantity")).as("avg_q"))

  /** Flagship: TPC-H Q1 pricing summary. Map-side combine on 6 groups
    * means the shuffle carries ~6 rows per partition at any scale. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .where(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        // money sums round to scale 2 BEFORE the double cast: the
        // decimal sums are exact on both engines, but DuckDB's
        // DECIMAL(38,6)→DOUBLE cast double-rounds once the scaled
        // integer exceeds 2^53 (≈9e15 — a 2.8e10 sum at scale 6 is
        // 2.8e16), drifting 1 ulp from Spark's correctly-rounded
        // conversion (caught by the sf1 oracle run). At scale 2 the
        // scaled integer always fits, so the final conversion is a
        // single exact-int division on both sides.
        round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 2)
          .cast(DoubleType).as("sum_disc_price"),
        round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
          * (lit(1) + dec(col("l_tax")))), 2).cast(DoubleType).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Arithmetic over aggregate results (reference aggregates.slt). */
  def qAggExpr(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        (max(col("l_quantity")) * 2).as("mx2"),
        (min(col("l_quantity")) - 1).as("mn1"),
        (count(lit(1)) + sum(col("l_linenumber").cast(LongType))).as("cnt_plus"))
      .orderBy(col("l_returnflag"))

  /** GROUP BY + HAVING on an aggregate (reference having.slt). */
  def qHaving(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_q"))
      .where(col("cnt") > 550)
      .orderBy(col("l_suppkey"))

  /** Equi inner join; nation is tiny → broadcast-hash join, no shuffle
    * of the probe side (reference nested_join.rs does O(n*m)). */
  def qInnerJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .where(col("c_acctbal") > 5000.0)
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  /** Cartesian product of two bounded dims (reference cartesian.slt). */
  def qCrossJoin(s: SparkSession, d: String): DataFrame =
    region(s, d).crossJoin(nation(s, d))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  /** Theta join: equi key + inequality residual. Catalyst plans the equi
    * part as a hash/sort-merge join and keeps `<` as a residual — never
    * the O(n²) loop the reference runs. */
  def qNonEquiJoin(s: SparkSession, d: String): DataFrame = {
    val s1 = supplier(s, d).select(
      col("s_suppkey").as("k1"), col("s_nationkey").as("nk1"),
      col("s_acctbal").as("b1"))
    val s2 = supplier(s, d).select(
      col("s_suppkey").as("k2"), col("s_nationkey").as("nk2"),
      col("s_acctbal").as("b2"))
    s1.join(s2, col("nk1") === col("nk2") && col("b1") < col("b2"))
      .select(col("k1"), col("k2"), col("nk1"))
      .orderBy(col("k1"), col("k2"))
  }

  /** Self-join on equality plus != (reference join_test.rs movies). */
  def qSelfJoin(s: SparkSession, d: String): DataFrame = {
    val p1 = part(s, d).where(col("p_size") <= 5)
      .select(col("p_partkey").as("k1"), col("p_brand").as("brand"),
        col("p_size").as("sz1"))
    val p2 = part(s, d).where(col("p_size") <= 5)
      .select(col("p_partkey").as("k2"), col("p_brand").as("brand2"),
        col("p_size").as("sz2"))
    p1.join(p2, col("brand") === col("brand2")
        && col("sz1") === col("sz2") && col("k1") =!= col("k2"))
      .select(col("k1"), col("k2"), col("brand"))
      .orderBy(col("k1"), col("k2"))
  }

  /** 5-way join: two broadcast dims + customer⋈orders shuffle join. */
  def qMultiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("volume"))
      .orderBy(col("r_name"), col("n_name"))

  // ---------------------------------------------------------------------
  // §2.B — OLAP completion
  // ---------------------------------------------------------------------

  /** ORDER BY + LIMIT → TakeOrderedAndProject: per-partition heap of k,
    * driver merges k*partitions rows — no global sort at 100 TB. */
  def qOrderLimit(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  def qDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Exact COUNT(DISTINCT) — Spark expands to a two-phase aggregate. */
  def qCountDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      countDistinct(col("l_suppkey")).as("n_supp"),
      countDistinct(col("l_partkey")).as("n_part"),
      countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status"))

  /** HLL++ sketch — the 100 TB path for distinct counts (one pass, no
    * per-key state explosion). rows-only check; ScalaTest bounds error. */
  def qApproxCountDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))

  def qUnion(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").cast(IntegerType).as("key"))
      .unionAll(supplier(s, d).select(col("s_nationkey").cast(IntegerType).as("key")))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("key"))

  /** LEFT OUTER join + null-safe aggregation over the optional side. */
  def qOuterJoin(s: SparkSession, d: String): DataFrame = {
    val bigOrders = orders(s, d).where(col("o_totalprice") > 450000.0)
    customer(s, d)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_big"),
        dsum(coalesce(col("o_totalprice"), lit(0.0))).as("sum_big"))
      .where(col("c_custkey") <= 200)
      .orderBy(col("c_custkey"))
  }

  /** IN-subquery → left-semi join (no duplication of the left side). */
  def qSemiJoin(s: SparkSession, d: String): DataFrame = {
    val big = orders(s, d).where(col("o_totalprice") > 450000.0)
      .select(col("o_custkey"))
    customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** NOT EXISTS → left-anti join. */
  def qAntiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Scalar subquery as a broadcast 1-row cross join — stays lazy and
    * distributed (no driver collect). */
  def qSubqueryScalar(s: SparkSession, d: String): DataFrame = {
    val thr = orders(s, d).agg(davg(col("o_totalprice")).as("avg_price"))
    orders(s, d).crossJoin(broadcast(thr))
      .where(col("o_totalprice") > col("avg_price") * 1.9)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  def qCaseWhen(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        when(col("o_totalprice") > 300000.0, "big")
          .when(col("o_totalprice") > 100000.0, "mid")
          .otherwise("small").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("bucket"))

  def qStringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .where(col("p_name").like("%a%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("un"),
        lower(col("p_brand")).as("lb"),
        length(col("p_name")).as("ln"),
        substring(col("p_type"), 1, 5).as("t5"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("bc"))
      .orderBy(col("p_partkey"))

  def qDateFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        date_trunc("month", col("o_orderdate")).as("mstart"))
      .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("vol"))
      .orderBy(col("yr"), col("mo"))

  /** Window ranking: top-3 orders per customer. */
  def qWindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"), rank().over(w).as("rnk"))
      .where(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running sum + lag over an event stream ordered by time. */
  def qWindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .where(col("user_id") < 20)
      .select(
        col("user_id"), col("event_id"), col("value"),
        sum(dec(col("value"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running"),
        lag(col("value"), 1).over(w).as("prev"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** ROLLUP: multi-level aggregates in one shuffle. */
  def qGroupingSets(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_q"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** TPC-H Q3: shipping priority — 3-way join, agg, top-k. */
  def qTpchQ3(s: SparkSession, d: String): DataFrame =
    customer(s, d).where(col("c_mktsegment") === "BUILDING")
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .where(col("o_orderdate") < ts("1998-03-15 00:00:00"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > ts("1998-03-15 00:00:00"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)

  /** TPC-H Q5: local supplier volume — 6-way join; dims broadcast,
    * facts shuffle once on their shared keys.
    *
    * Round 20 (guide §3.1/§3.2): the selective filter of this query is
    * `r_name = 'ASIA'`, but the textbook join order applies it LAST —
    * after customer⋈orders⋈lineitem⋈supplier has already been built at
    * full 25-nation width (Spark does not reorder joins without CBO
    * stats, so the query author picks the order). Since
    * c_nationkey = s_nationkey = n_nationkey holds on every surviving
    * row, the region restriction prunes identically when applied to the
    * CUSTOMER side up front: nation⋈region(ASIA) reduces to a ≤5-row
    * (n_nationkey, n_name) table that broadcasts into the customer scan,
    * cutting the customer⋈orders⋈lineitem probe stream ~5× before the
    * big joins instead of after them. Row set and n_name are unchanged
    * (nationkey is unique; the supplier join still enforces
    * s_nationkey = c_nationkey), only the order of pruning moves. */
  def qTpchQ5(s: SparkSession, d: String): DataFrame = {
    val asiaNations = nation(s, d)
      .join(broadcast(region(s, d).where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    customer(s, d)
      .join(broadcast(asiaNations),
        col("c_nationkey") === col("n_nationkey"))
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .where(col("o_orderdate") >= ts("1996-01-01 00:00:00")
        && col("o_orderdate") < ts("1997-01-01 00:00:00"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q4: order-priority checking — orders in a quarter with at
    * least one late lineitem (EXISTS → left-semi join), counted per
    * priority. The semi join shuffles once on the shared orderkey; the
    * count is partial+final over 5 groups. */
  def qTpchQ4(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .where(col("o_orderdate") >= ts("1996-01-01 00:00:00")
        && col("o_orderdate") < ts("1996-04-01 00:00:00"))
      .join(lineitem(s, d).where(col("l_shipdate") > ts("1996-06-01 00:00:00"))
        .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** TPC-H Q6: forecasting-revenue change — a pure scan-filter-agg with
    * every predicate pushed to parquet; the canonical "does the filter
    * reach the reader" query. */
  def qTpchQ6(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .where(col("l_shipdate") >= ts("1996-01-01 00:00:00")
        && col("l_shipdate") < ts("1997-01-01 00:00:00")
        && col("l_discount").between(0.02, 0.04)
        && col("l_quantity") < 24.0)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast(DoubleType).as("revenue"))

  /** TPC-H Q13: customer order-count distribution — left outer join so
    * zero-order customers count, then a distribution over the per-
    * customer counts (two partial+final aggs, no window). */
  def qTpchQ13(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q7: volume shipping between two nations, by year. Two
    * broadcast copies of nation aliased to the supplier and customer
    * sides; the nation-pair disjunction filters after both dims attach;
    * facts shuffle once per shared key. */
  def qTpchQ7(s: SparkSession, d: String): DataFrame = {
    val n1 = nation(s, d).select(col("n_nationkey").as("n1_key"),
      col("n_name").as("supp_nation"))
    val n2 = nation(s, d).select(col("n_nationkey").as("n2_key"),
      col("n_name").as("cust_nation"))
    lineitem(s, d)
      .where(col("l_shipdate") >= ts("1996-01-01 00:00:00")
        && col("l_shipdate") < ts("1998-01-01 00:00:00"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .where((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7")
        || (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q10: returned-item reporting — revenue lost to returns per
    * customer in a quarter, top 20. Date filter pushed to the orders
    * scan; nation broadcasts; the customer⋈orders⋈lineitem chain
    * shuffles once per shared key and AQE picks broadcast for the
    * filtered orders side at small SF. */
  def qTpchQ10(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .where(col("o_orderdate") >= ts("1996-01-01 00:00:00")
        && col("o_orderdate") < ts("1996-04-01 00:00:00"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_returnflag") === "R")
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q18: large-volume customers — orders whose total quantity
    * exceeds a threshold. The HAVING subquery is a partial+final agg on
    * l_orderkey; its survivors (~0.1% of orders) semi-join back before
    * the wide joins, so the expensive chain only carries qualifying
    * orders. Top-100 via TakeOrderedAndProject, never a global sort. */
  def qTpchQ18(s: SparkSession, d: String): DataFrame = {
    val big = lineitem(s, d).groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .where(col("total_qty") > 200.0)
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q8: national market share — one nation's share of a region's
    * order volume for a part type, by year. The p_type cut shrinks part
    * to a broadcastable side before the fact join; two broadcast nation
    * copies (customer side fixes the market region, supplier side names
    * the share nation); numerator and denominator come out of ONE
    * partial+final agg via a conditional volume column, so the facts
    * shuffle exactly once. */
  def qTpchQ8(s: SparkSession, d: String): DataFrame = {
    val n1 = nation(s, d).select(col("n_nationkey").as("n1_key"),
      col("n_regionkey").as("n1_region"))
    val n2 = nation(s, d).select(col("n_nationkey").as("n2_key"),
      col("n_name").as("supp_nation"))
    val volume = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    lineitem(s, d)
      .join(broadcast(part(s, d).where(col("p_type") === "PROMO")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .where(col("o_orderdate") >= ts("1995-01-01 00:00:00")
        && col("o_orderdate") < ts("1997-01-01 00:00:00"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(region(s, d)), col("n1_region") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_7", volume).otherwise(lit(0)))
          .cast(DoubleType).as("nation_volume"),
        sum(volume).cast(DoubleType).as("total_volume"))
      .select(col("o_year"),
        (col("nation_volume") / col("total_volume")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q14: promotion effect — the promo share of one month's
    * revenue. Scan-filter on the date (pushed to parquet), one broadcast
    * join to part, numerator/denominator in a single global agg. */
  def qTpchQ14(s: SparkSession, d: String): DataFrame = {
    val volume = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    lineitem(s, d)
      .where(col("l_shipdate") >= ts("1996-03-01 00:00:00")
        && col("l_shipdate") < ts("1996-04-01 00:00:00"))
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", volume).otherwise(lit(0)))
          .cast(DoubleType).as("promo"),
        sum(volume).cast(DoubleType).as("total"))
      .select((lit(100.0) * col("promo") / col("total")).as("promo_revenue"))
  }

  /** TPC-H Q15: top supplier — supplier(s) with the maximum quarterly
    * revenue. The revenue CTE is one partial+final agg on l_suppkey; the
    * max is a one-row agg crossJoin'd in (broadcast, lazy — no driver
    * collect); double equality is safe because both sides carry the
    * identical decimal-exact value. */
  def qTpchQ15(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .where(col("l_shipdate") >= ts("1996-01-01 00:00:00")
        && col("l_shipdate") < ts("1996-04-01 00:00:00"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
    supplier(s, d)
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(maxRev))
      .where(col("total_revenue") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Window frames beyond running totals: centered 7-row moving average,
    * ntile quartiles, percent_rank — one shuffle on the partition key. */
  def qWindowFrames(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .where(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(avg(col("o_totalprice"))
          .over(w.rowsBetween(-3, 3)), 4).as("mavg"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("prank"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Exact interpolated percentiles (median, p90) per order priority.
    * At 100 TB use approx_percentile (one-pass t-digest style sketch);
    * exact percentile is the oracle-checkable correctness baseline. */
  def qPercentile(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Robust dispersion per group: median + MAD (median absolute
    * deviation from the median) — the outlier-resistant stats pair
    * (std explodes on one bad row; MAD doesn't). Two exact percentile
    * aggs with a #groups-row join between them; the group median is
    * ROUNDED to 4 dp before it re-enters per-row arithmetic so the
    * deviation inputs are bit-identical on both engines (an unrounded
    * interpolated median may differ by 1 ulp and poison every
    * deviation). */
  def qMadRobust(s: SparkSession, d: String): DataFrame = {
    val med = orders(s, d).groupBy(col("o_orderpriority"))
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("median"))
    orders(s, d).join(med, Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(max(col("median")), 4).as("median"),
        round(expr("percentile(abs(o_totalprice - median), 0.5)"), 4)
          .as("mad"))
      .orderBy(col("o_orderpriority"))
  }

  /** Sketch percentiles — the 100 TB path q_percentile's doc promises:
    * approx_percentile keeps a bounded t-digest-style summary per group
    * (mergeable partial aggregate, no per-group sort/materialization).
    * accuracy=10000 bounds rank error at 1/10000; ApproxSpec checks the
    * estimates against the exact query. */
  def qApproxPercentile(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)").as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** INTERSECT (set semantics): nations that have both customers and
    * suppliers. Catalyst plans it as a distinct + semi join. */
  def qIntersect(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").cast(IntegerType).as("key"))
      .intersect(supplier(s, d).select(col("s_nationkey").cast(IntegerType).as("key")))
      .orderBy(col("key"))

  /** EXCEPT (set semantics): order-date days with no high-priority order. */
  def qExcept(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(col("o_orderdate").as("day"))
      .except(orders(s, d).where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderdate").as("day")))
      .orderBy(col("day"))

  /** PIVOT: return-flag columns per line status. Explicit pivot values
    * keep the plan one-pass (no distinct-values pre-query). */
  def qPivot(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum(col("l_quantity")))
      .orderBy(col("l_linestatus"))

  /** FULL OUTER join of per-nation customer and supplier counts —
    * null-safe key coalescing on both sides. */
  def qFullOuterJoin(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).groupBy(col("c_nationkey").cast(IntegerType).as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val su = supplier(s, d).where(col("s_acctbal") > 5000.0)
      .groupBy(col("s_nationkey").cast(IntegerType).as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(su, col("ck") === col("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).as("key"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("key"))
  }

  /** CUBE: all grouping-set combinations in one shuffle (Expand feeds a
    * single partial+final aggregate — no per-set re-scan). */
  def qCube(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_q"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** ROLLUP: hierarchical grouping-set prefixes (priority, status) →
    * (priority) → () in one Expand + one partial+final aggregate, like
    * CUBE but without the non-prefix combinations. */
  def qRollup(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("vol"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** Navigation window functions in one pass: lag/lead (offset rows),
    * first_value and nth_value (frame rows) per customer order history.
    * One shuffle on the partition key serves all four. */
  def qWindowLeadlag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .where(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first_value(col("o_totalprice")).over(w).as("first_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Correlated EXISTS with a predicate inside the subquery: priorities
    * of orders that have at least one high-quantity line. Planned as a
    * left-semi join on the filtered fact — the filter shrinks the build
    * side before any shuffle. */
  def qExistsCorrelated(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(lineitem(s, d).where(col("l_quantity") > 45.0),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("vol"))
      .orderBy(col("o_orderpriority"))

  /** NULL semantics end-to-end: nullif-generated nulls, null-safe
    * equality (<=> / IS NOT DISTINCT FROM), coalesce, and count(col)
    * skipping nulls vs count(*) not. */
  def qNullHandling(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("st"),
        nullif(col("o_orderpriority"), lit("5-LOW")).as("pr"))
      .select(col("st"),
        (col("st") <=> col("pr")).as("nse"),
        coalesce(col("st"), lit("open")).as("st_filled"))
      .groupBy(col("st"), col("nse"), col("st_filled"))
      .agg(count(lit(1)).as("n_rows"), count(col("st")).as("n_st"))
      .orderBy(col("st").asc_nulls_first, col("nse"), col("st_filled"))

  /** RANGE frame with an interval bound: per-customer trailing-30-day
    * spend. The frame is value-based (all peers inside the interval),
    * so ties on o_orderdate cannot make the result order-dependent. */
  def qWindowRangeInterval(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .where(col("o_custkey") < 500)
      .selectExpr("o_custkey", "o_orderkey", "o_orderdate",
        """CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          |  PARTITION BY o_custkey ORDER BY o_orderdate
          |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
          |AS DOUBLE) AS trailing_30d""".stripMargin)
      .orderBy(col("o_custkey"), col("o_orderkey"))

  /** Latest row per key — the CDC/upsert compaction shape: one window
    * shuffle on the key, per-partition top-1 (WindowGroupLimit pushes
    * the limit below the shuffle, so only candidate rows move). The
    * raw ts stays out of the output (ns-vs-µs dtype noise against the
    * oracle); event_id pins row identity. */
  def qLatestPerKey(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("value"),
        row_number().over(w).as("rn"))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("value"))
      .orderBy(col("user_id"))
  }

  /** Ordered string aggregation per group: sort-then-join over a
    * collected list so the result is deterministic under any execution
    * order (bare collect_list/listagg is not). */
  def qStringAgg(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .where(col("c_custkey") < 100)
      .groupBy(col("c_nationkey").cast(IntegerType).as("key"))
      .agg(array_join(array_sort(collect_list(col("c_name"))), ",").as("names"),
        count(lit(1)).as("n"))
      .orderBy(col("key"))

  /** UNPIVOT: wide per-nation counts back to (nation, metric, value)
    * rows via stack — the Generate-based inverse of q_pivot, map-only
    * after one aggregate. */
  def qUnpivot(s: SparkSession, d: String): DataFrame =
    qFullOuterJoin(s, d) // (key, n_cust, n_supp) — reuse the audited agg
      .select(col("key"),
        expr("stack(2, 'n_cust', n_cust, 'n_supp', n_supp) AS (metric, value)"))
      .orderBy(col("key"), col("metric"))

  /** Lateral explode: split each part name into words, one output row
    * per (part, position, word) — Generate (flatMap shape) during the
    * scan, no shuffle until the final sort. */
  def qExplode(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .where(col("p_partkey") < 200)
      .select(col("p_partkey"),
        posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
      .orderBy(col("p_partkey"), col("pos"))

  /** Second-moment statistical aggregates per return flag — corr /
    * covar / stddev / variance, the profile a feature-engineering pass
    * reads before normalizing columns. All four are single-pass
    * mergeable co-moment aggregates (partial+final, #flags rows out —
    * the ideal 100 TB agg shape). Outputs round coarsely enough
    * (corr 6 dp is dimensionless ~1e-15 relative; covar 2 dp against a
    * ~1e4 magnitude) that the parallel-merge vs single-pass float
    * ordering difference cannot reach the rounded digit. */
  def qStatsAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6)
          .as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
          .as("covar_qty_price"),
        round(stddev_samp(col("l_discount")), 6).as("std_discount"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"))
      .orderBy(col("l_returnflag"))

  /** Higher-order array functions over a real tokenized column —
    * filter / transform+aggregate / slice in ONE codegen'd projection
    * (the reference has no array type at all; this is the Spark SQL
    * surface an engine user reaches for instead of a UDF). Map-only. */
  def qArrayFuncs(s: SparkSession, d: String): DataFrame =
    graft.Tables.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast(LongType).as("n_tokens"),
        size(expr("filter(ws, w -> length(w) > 7)")).cast(LongType)
          .as("n_long"),
        expr("aggregate(ws, 0L, (acc, w) -> acc + length(w))").as("sum_len"),
        array_join(slice(col("ws"), 1, 3), " ").as("head3"))
      .orderBy(col("doc_id"))

  /** Regex scalar surface: extract-first and match-count over the text
    * column with an engine-portable pattern (digit runs — identical
    * semantics in Java regex and RE2). Map-only inside codegen. */
  def qRegexFuncs(s: SparkSession, d: String): DataFrame =
    graft.Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract(col("text"), "[0-9]+", 0).as("first_num"),
        regexp_count(col("text"), lit("[0-9]+")).cast(LongType).as("n_nums"))
      .orderBy(col("doc_id"))

  /** Per-group MODE (most frequent value) with a deterministic
    * tie-break — the categorical summary statistic engines expose as
    * mode()/any_value-with-count. Implemented as count-then-top-1 so
    * both the result AND the tie rule (higher count, then
    * lexicographically smaller value) are explicit and replayable:
    * one partial+final agg to the tiny (group, value) table, top-1 via
    * a rank filter that partial-limits (WindowGroupLimit) before the
    * shuffle. */
  def qModeStat(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    orders(s, d)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("cnt").desc, col("o_orderpriority"))))
      .where(col("rk") === 1)
      .select(col("o_orderstatus"),
        col("o_orderpriority").as("mode_priority"),
        col("cnt").as("mode_cnt"))
      .orderBy(col("o_orderstatus"))
  }

  /** ntile quartiles of customer balance within each nation — the
    * equal-frequency bucketing window function (deterministic here
    * because the order key (acctbal, custkey) is total). One shuffle on
    * nationkey; at 100 TB a skewed partition would instead use the
    * percentile-sketch cut points (q_approx_percentile path). */
  def qWindowNtile(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"),
        ntile(4).over(Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal"), col("c_custkey"))).as("quartile"))
      .orderBy(col("c_custkey"))

  /** Relative-position window functions percent_rank / cume_dist —
    * the distribution half of the ranking family (ntile buckets,
    * these give the exact position). Both are quotients of exact
    * window integers, shipped UNROUNDED (bit-identical both engines);
    * the tie column makes rank ties real so cume_dist ≠ percent_rank
    * on them. Partitions bounded per nation. */
  def qWindowPercentRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_mktsegment"))
    customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("c_custkey"))
  }

  /** Aggregate FILTER clauses — per-predicate conditional aggregation
    * in ONE pass over the scan (the idiom that replaces N self-joins
    * or N scans with one partial+final agg carrying N lightweight
    * buffers). Decimal sums for determinism, counts as BIGINT. */
  def qAggFilter(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_all"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        count(when(col("o_totalprice") > 200000.0, 1)).as("n_big"),
        sum(when(col("o_orderstatus") === "O",
          col("o_totalprice").cast(DecimalType(18, 2))))
          .cast(DoubleType).as("open_total"))
      .orderBy(col("o_orderpriority"))

  /** Value-extraction window functions first_value / last_value /
    * nth_value over an explicit full frame — the "what did this
    * partition start/end with" family that completes the ranking
    * (rank/ntile) and offset (lead/lag) windows. The frame is pinned
    * ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING on both engines:
    * the default frame makes last_value degenerate (current row) and
    * nth_value NULL until row n, the classic silent-wrong-answer.
    * Per-customer partitions — bounded by a key's own orders. */
  def qWindowFirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d)
      .where(col("o_custkey") < 150)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Bitwise aggregates bit_and / bit_or / bit_xor — order-independent
    * (commutative, associative) single-pass partial+final aggregates,
    * the flag-mask rollup shape (permission masks, feature bitmaps,
    * xor-parity checks) that otherwise needs 64 count-filter legs. */
  def qBitwiseAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_linenumber"))
      .agg(
        expr("bit_and(l_orderkey)").as("mask_and"),
        expr("bit_or(l_orderkey)").as("mask_or"),
        expr("bit_xor(l_orderkey)").as("mask_xor"),
        count(lit(1)).as("n"))
      .orderBy(col("l_linenumber"))

  /** Argmax — "the orderkey of each customer's most expensive order"
    * — as max-agg + equi-join-back + min tie-break. The tempting
    * one-pass forms (max over a (price, key) struct, max_by) carry a
    * struct aggregation buffer, which Tungsten's fixed-width hash
    * aggregate cannot hold: they silently fall back to SortAggregate
    * (sort-per-partition on the group key). This shape keeps every
    * stage in HashAggregate codegen; ties on price break
    * deterministically by MIN orderkey on both engines. */
  def qMaxBy(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val m = o.groupBy(col("o_custkey"))
      .agg(max(col("o_totalprice")).as("best_price"))
    o.join(m, Seq("o_custkey"))
      .where(col("o_totalprice") === col("best_price"))
      .groupBy(col("o_custkey"), col("best_price"))
      .agg(min(col("o_orderkey")).as("best_key"))
      .select(col("o_custkey"), col("best_key"), col("best_price"))
      .orderBy(col("o_custkey"))
  }

  /** Linear-regression aggregates regr_slope / regr_intercept /
    * regr_r2 / regr_count — the one-pass OLS line fit per group
    * (trend-per-segment without leaving SQL). Like q_stats_agg these
    * are mergeable co-moment aggregates (ideal partial+final shape);
    * outputs round coarsely enough (6 dp on the dimensionless slope
    * and r², 2 dp on the ~1e4-magnitude intercept) that parallel-merge
    * float ordering cannot reach the rounded digit. */
  def qRegrAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 6)
          .as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 2)
          .as("intercept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6)
          .as("r2"),
        expr("regr_count(l_extendedprice, l_quantity)").as("n"))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------------
  // registry
  // ---------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_regr_agg" -> (qRegrAgg _),
    "q_window_firstlast" -> (qWindowFirstLast _),
    "q_bitwise_agg" -> (qBitwiseAgg _),
    "q_max_by" -> (qMaxBy _),
    "q_scan_project" -> (qScanProject _),
    "q_filter" -> (qFilter _),
    "q_expr_arith" -> (qExprArith _),
    "q_expr_cast" -> (qExprCast _),
    "q_expr_bool" -> (qExprBool _),
    "q_limit" -> (qLimit _),
    "q_agg_global" -> (qAggGlobal _),
    "q1_agg" -> (q1Agg _),
    "q_agg_expr" -> (qAggExpr _),
    "q_having" -> (qHaving _),
    "q_inner_join" -> (qInnerJoin _),
    "q_cross_join" -> (qCrossJoin _),
    "q_non_equi_join" -> (qNonEquiJoin _),
    "q_self_join" -> (qSelfJoin _),
    "q_multi_join" -> (qMultiJoin _),
    "q_order_limit" -> (qOrderLimit _),
    "q_distinct" -> (qDistinct _),
    "q_count_distinct" -> (qCountDistinct _),
    "q_approx_count_distinct" -> (qApproxCountDistinct _),
    "q_union" -> (qUnion _),
    "q_outer_join" -> (qOuterJoin _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_subquery_scalar" -> (qSubqueryScalar _),
    "q_case_when" -> (qCaseWhen _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_running" -> (qWindowRunning _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_tpch_q3" -> (qTpchQ3 _),
    "q_tpch_q5" -> (qTpchQ5 _),
    "q_tpch_q4" -> (qTpchQ4 _),
    "q_tpch_q6" -> (qTpchQ6 _),
    "q_tpch_q7" -> (qTpchQ7 _),
    "q_tpch_q13" -> (qTpchQ13 _),
    "q_tpch_q10" -> (qTpchQ10 _),
    "q_tpch_q18" -> (qTpchQ18 _),
    "q_tpch_q8" -> (qTpchQ8 _),
    "q_tpch_q14" -> (qTpchQ14 _),
    "q_tpch_q15" -> (qTpchQ15 _),
    "q_window_frames" -> (qWindowFrames _),
    "q_percentile" -> (qPercentile _),
    "q_mad_robust" -> (qMadRobust _),
    "q_intersect" -> (qIntersect _),
    "q_except" -> (qExcept _),
    "q_pivot" -> (qPivot _),
    "q_full_outer_join" -> (qFullOuterJoin _),
    "q_cube" -> (qCube _),
    "q_rollup" -> (qRollup _),
    "q_window_leadlag" -> (qWindowLeadlag _),
    "q_exists_correlated" -> (qExistsCorrelated _),
    "q_null_handling" -> (qNullHandling _),
    "q_window_range_interval" -> (qWindowRangeInterval _),
    "q_unpivot" -> (qUnpivot _),
    "q_explode" -> (qExplode _),
    "q_latest_per_key" -> (qLatestPerKey _),
    "q_string_agg" -> (qStringAgg _),
    "q_approx_percentile" -> (qApproxPercentile _),
    "q_stats_agg" -> (qStatsAgg _),
    "q_mode_stat" -> (qModeStat _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_regex_funcs" -> (qRegexFuncs _),
    "q_window_ntile" -> (qWindowNtile _),
    "q_window_percentrank" -> (qWindowPercentRank _),
    "q_agg_filter" -> (qAggFilter _)
  )

  /** DuckDB oracle SQL. Same aliases, same DECIMAL-exact aggregation,
    * types pinned to Spark's (year() → INT etc.). */
  val oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE (o_orderstatus = 'F' OR o_totalprice > 400000.0)
        |  AND NOT (o_orderpriority = '5-LOW')
        |ORDER BY o_orderkey""".stripMargin,

    "q_expr_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity * 2 + l_tax - 1 AS v,
        |  l_orderkey % 7 AS m,
        |  -l_discount AS neg,
        |  l_extendedprice / (l_quantity + 1) AS unit
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_expr_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS INTEGER) AS qi,
        |  CAST(l_orderkey AS DOUBLE) AS kd,
        |  CAST(l_linenumber AS VARCHAR) AS ls,
        |  CAST('7' AS INTEGER) + 1 AS lit_i
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_expr_bool" ->
      """SELECT o_orderkey,
        |  (o_orderstatus = 'F') <> (o_totalprice > 200000.0) AS xor_v,
        |  NOT (o_orderstatus = 'O') AS not_v,
        |  (o_totalprice > 100000.0 AND o_orderpriority = '1-URGENT') AS and_v
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100""".stripMargin,

    "q_agg_global" ->
      """SELECT min(l_quantity) AS min_q, max(l_quantity) AS max_q,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_q,
        |  count(*) AS cnt, count(l_quantity) AS cnt_q,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(l_quantity) AS avg_q
        |FROM lineitem""".stripMargin,

    // sum_charge: the inner CAST to DECIMAL(18,4) keeps DuckDB's
    // triple product inside decimal — without it the product's width
    // (18+19+19 digits) exceeds DuckDB's 38-digit cap and DuckDB
    // silently promotes to DOUBLE, whose inexact sum drifts a final
    // ulp from Spark's exact DECIMAL(38,6) path at sf1 row counts
    // (caught by the sf1 oracle run; sf0.1 and below agreed by luck).
    // The (18,4) cast is exact: price*(1-disc) has scale 4 by
    // construction and magnitude ≪ 10^14.
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
        |    * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(l_quantity) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(l_extendedprice) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_expr" ->
      """SELECT l_returnflag,
        |  max(l_quantity) * 2 AS mx2,
        |  min(l_quantity) - 1 AS mn1,
        |  CAST(count(*) + sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS cnt_plus
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_having" ->
      """SELECT l_suppkey, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_q
        |FROM lineitem GROUP BY l_suppkey
        |HAVING count(*) > 550 ORDER BY l_suppkey""".stripMargin,

    "q_inner_join" ->
      """SELECT c_custkey, c_name, n_name, c_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 5000.0 ORDER BY c_custkey""".stripMargin,

    "q_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q_non_equi_join" ->
      """SELECT s1.s_suppkey AS k1, s2.s_suppkey AS k2, s1.s_nationkey AS nk1
        |FROM supplier s1 JOIN supplier s2
        |  ON s1.s_nationkey = s2.s_nationkey AND s1.s_acctbal < s2.s_acctbal
        |ORDER BY k1, k2""".stripMargin,

    "q_self_join" ->
      """SELECT p1.p_partkey AS k1, p2.p_partkey AS k2, p1.p_brand AS brand
        |FROM part p1 JOIN part p2
        |  ON p1.p_brand = p2.p_brand AND p1.p_size = p2.p_size
        |  AND p1.p_partkey <> p2.p_partkey
        |WHERE p1.p_size <= 5 AND p2.p_size <= 5
        |ORDER BY k1, k2""".stripMargin,

    "q_multi_join" ->
      """SELECT r_name, n_name, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_order_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_count_distinct" ->
      """SELECT count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
        |FROM lineitem""".stripMargin,

    "q_union" ->
      """SELECT key, count(*) AS cnt FROM (
        |  SELECT CAST(c_nationkey AS INTEGER) AS key FROM customer
        |  UNION ALL
        |  SELECT CAST(s_nationkey AS INTEGER) AS key FROM supplier
        |) GROUP BY key ORDER BY key""".stripMargin,

    "q_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big,
        |  CAST(sum(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,2)))
        |    AS DOUBLE) AS sum_big
        |FROM customer LEFT JOIN (
        |  SELECT * FROM orders WHERE o_totalprice > 450000.0
        |) ON c_custkey = o_custkey
        |GROUP BY c_custkey HAVING c_custkey <= 200
        |ORDER BY c_custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*) FROM orders) * 1.9
        |ORDER BY o_orderkey""".stripMargin,

    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice > 300000.0 THEN 'big'
        |  WHEN o_totalprice > 100000.0 THEN 'mid'
        |  ELSE 'small' END AS bucket, count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS un, lower(p_brand) AS lb,
        |  CAST(length(p_name) AS INTEGER) AS ln,
        |  substr(p_type, 1, 5) AS t5,
        |  p_brand || '-' || p_type AS bc
        |FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  date_trunc('month', o_orderdate) AS mstart,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS vol
        |FROM orders GROUP BY 1, 2, 3 ORDER BY yr, mo""".stripMargin,

    "q_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    rank() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_window_running" ->
      """SELECT user_id, event_id, value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running,
        |  lag(value, 1) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |FROM events WHERE user_id < 20
        |ORDER BY user_id, event_id""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_q
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.04
        |  AND l_quantity < 24.0""".stripMargin,

    "q_tpch_q13" ->
      """WITH c AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey
        |)
        |SELECT c_count, count(*) AS custdist FROM c
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    > 200.0
        |)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN big ON o_orderkey = l_orderkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CASE WHEN n2.n_name = 'NATION_7'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE 0 END) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |  AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tpch_q14" ->
      """SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE 0 END) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |  AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,

    "q_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q_window_frames" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 4) AS mavg,
        |  CAST(ntile(4) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS quartile,
        |  round(percent_rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey), 6) AS prank
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_mad_robust" ->
      """WITH med AS (
        |  SELECT o_orderpriority,
        |    round(quantile_cont(o_totalprice, 0.5), 4) AS median
        |  FROM orders GROUP BY o_orderpriority
        |)
        |SELECT o.o_orderpriority, count(*) AS n,
        |  round(max(m.median), 4) AS median,
        |  round(quantile_cont(abs(o_totalprice - m.median), 0.5), 4) AS mad
        |FROM orders o JOIN med m USING (o_orderpriority)
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin,
    "q_percentile" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_intersect" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS key FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS INTEGER) AS key FROM supplier
        |ORDER BY key""".stripMargin,

    "q_except" ->
      """SELECT o_orderdate AS day FROM orders
        |EXCEPT
        |SELECT o_orderdate AS day FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY day""".stripMargin,

    "q_pivot" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'A'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "A",
        |  CAST(sum(CASE WHEN l_returnflag = 'N'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "N",
        |  CAST(sum(CASE WHEN l_returnflag = 'R'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_full_outer_join" ->
      """WITH c AS (
        |  SELECT CAST(c_nationkey AS INTEGER) AS ck, count(*) AS n_cust
        |  FROM customer GROUP BY 1
        |), su AS (
        |  SELECT CAST(s_nationkey AS INTEGER) AS sk, count(*) AS n_supp
        |  FROM supplier WHERE s_acctbal > 5000.0 GROUP BY 1
        |)
        |SELECT coalesce(ck, sk) AS key,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN su ON ck = sk ORDER BY key""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_q
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS vol
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "q_window_leadlag" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_exists_correlated" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS vol
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_null_handling" ->
      """WITH t AS (
        |  SELECT nullif(o_orderstatus, 'O') AS st,
        |    nullif(o_orderpriority, '5-LOW') AS pr
        |  FROM orders
        |)
        |SELECT st, st IS NOT DISTINCT FROM pr AS nse,
        |  coalesce(st, 'open') AS st_filled,
        |  count(*) AS n_rows, count(st) AS n_st
        |FROM t GROUP BY 1, 2, 3
        |ORDER BY st NULLS FIRST, nse, st_filled""".stripMargin,

    "q_window_range_interval" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |  AS DOUBLE) AS trailing_30d
        |FROM orders WHERE o_custkey < 500
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_unpivot" ->
      """WITH c AS (
        |  SELECT CAST(c_nationkey AS INTEGER) AS ck, count(*) AS n_cust
        |  FROM customer GROUP BY 1
        |), su AS (
        |  SELECT CAST(s_nationkey AS INTEGER) AS sk, count(*) AS n_supp
        |  FROM supplier WHERE s_acctbal > 5000.0 GROUP BY 1
        |), base AS (
        |  SELECT coalesce(ck, sk) AS key,
        |    coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |  FROM c FULL OUTER JOIN su ON ck = sk
        |)
        |SELECT key, 'n_cust' AS metric, n_cust AS value FROM base
        |UNION ALL
        |SELECT key, 'n_supp' AS metric, n_supp AS value FROM base
        |ORDER BY key, metric""".stripMargin,

    "q_explode" ->
      """WITH t AS (
        |  SELECT p_partkey, regexp_split_to_array(p_name, ' ') AS w
        |  FROM part WHERE p_partkey < 200
        |), e AS (
        |  SELECT p_partkey,
        |    unnest(list_transform(generate_series(1, len(w)),
        |      i -> {'pos': i - 1, 'word': w[i]})) AS u
        |  FROM t
        |)
        |SELECT p_partkey, CAST(u.pos AS INTEGER) AS pos, u.word AS word
        |FROM e ORDER BY p_partkey, pos""".stripMargin,

    // events.parquet carries TIMESTAMP(NANOS); Spark reads it truncated
    // to micros, so the oracle's window orders by the same truncation
    // (epoch_ns // 1000) to keep sub-µs neighbors tie-breaking alike
    "q_latest_per_key" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_string_agg" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS key,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names,
        |  count(*) AS n
        |FROM customer WHERE c_custkey < 100
        |GROUP BY 1 ORDER BY key""".stripMargin,

    "q_array_funcs" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(ws, w -> length(w) > 7)) AS BIGINT)
        |    AS n_long,
        |  CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT)
        |    AS sum_len,
        |  array_to_string(list_slice(ws, 1, 3), ' ') AS head3
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_regex_funcs" ->
      """SELECT doc_id,
        |  coalesce(regexp_extract(text, '[0-9]+'), '') AS first_num,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
        |    AS n_nums
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_mode_stat" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |  FROM orders GROUP BY 1, 2
        |), r AS (
        |  SELECT o_orderstatus, o_orderpriority, cnt,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY cnt DESC, o_orderpriority) AS rk
        |  FROM c
        |)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |  cnt AS mode_cnt
        |FROM r WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,

    "q_stats_agg" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
        |  round(stddev_samp(l_discount), 6) AS std_discount,
        |  round(var_samp(l_quantity), 4) AS var_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_window_ntile" ->
      """SELECT c_custkey, c_nationkey,
        |  ntile(4) OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal, c_custkey) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_window_percentrank" ->
      """SELECT c_custkey, c_nationkey, c_mktsegment,
        |  percent_rank() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_mktsegment) AS pr,
        |  cume_dist() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_mktsegment) AS cd
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_agg_filter" ->
      """SELECT o_orderpriority,
        |  count(*) AS n_all,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |  count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2)))
        |    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_total
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_regr_agg" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 2)
        |    AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_window_firstlast" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders WHERE o_custkey < 150
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_bitwise_agg" ->
      """SELECT l_linenumber,
        |  CAST(bit_and(l_orderkey) AS BIGINT) AS mask_and,
        |  CAST(bit_or(l_orderkey) AS BIGINT) AS mask_or,
        |  CAST(bit_xor(l_orderkey) AS BIGINT) AS mask_xor,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_linenumber
        |ORDER BY l_linenumber""".stripMargin,
    "q_max_by" ->
      """WITH m AS (
        |  SELECT o_custkey, max(o_totalprice) AS best_price
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT o.o_custkey, min(o.o_orderkey) AS best_key,
        |  m.best_price
        |FROM orders o
        |JOIN m ON o.o_custkey = m.o_custkey
        |  AND o.o_totalprice = m.best_price
        |GROUP BY o.o_custkey, m.best_price
        |ORDER BY o.o_custkey""".stripMargin
  )
}
