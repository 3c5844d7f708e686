package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** Derived TPC-H schema extension. The synthetic tables (TESTDATA.md)
  * omit partsupp and several columns the full TPC-H suite needs
  * (commit/receipt dates, ship mode/instructions, container, phone,
  * mfgr, comments). Regenerating the read-only testdata is off the
  * table, so the missing pieces derive DETERMINISTICALLY from the
  * columns that exist — pure integer / date / string arithmetic with a
  * DuckDB twin for every formula ([[TpchSchema.oracleCtes]]), so the
  * oracle gate checks the derived-schema queries end to end, hash-exact.
  *
  * Derivations follow dbgen's shapes (TPC-H spec §4.2): partsupp is
  * part × 4 suppliers spread across the supplier space, availqty
  * 1..9999, supplycost 1..101; receipt 1..30 days after ship, commit
  * ±30 days around ship; modes/instructions/containers cycle the spec
  * vocabularies; phone is CC-NNN-NNN-NNNN with country code from the
  * nation key.
  *
  * Scale note: every derived column is map-only over the base scan —
  * no shuffle, no UDF, plain codegen'd expressions — so a 100 TB
  * lineitem pays one projection. partsupp derives from part (the
  * smaller dim) with a 4-way explode and a lazily-broadcast one-row
  * supplier count; at any SF its row count stays 4 × |part|, exactly
  * like the real table.
  */
object TpchSchema {

  private val ShipModes =
    Seq("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")
  private val ShipInstructs =
    Seq("DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN")
  private val Containers =
    for (s <- Seq("SM", "LG", "MED", "JUMBO", "WRAP");
         t <- Seq("CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"))
      yield s"$s $t"

  /** partsupp: 4 suppliers per part, keys spread by (p*13 + i*29) mod S
    * with S the supplier count (a lazy one-row broadcast — no driver
    * collect, no eager job). */
  def partsupp(s: SparkSession, d: String): DataFrame = {
    val ns = supplier(s, d).agg(count(lit(1)).as("_ns"))
    part(s, d).select(col("p_partkey"))
      .crossJoin(broadcast(ns))
      .select(col("p_partkey"), col("_ns"),
        explode(typedLit(Seq(0, 1, 2, 3))).as("i"))
      .withColumn("ps_suppkey",
        (col("p_partkey") * 13 + col("i") * 29) % col("_ns"))
      .select(
        col("p_partkey").as("ps_partkey"),
        col("ps_suppkey"),
        ((col("p_partkey") * 7 + col("i") * 13) % 9999 + 1)
          .cast(IntegerType).as("ps_availqty"),
        (((col("p_partkey") * 31 + col("ps_suppkey") * 7) % 10000) / 100.0 + 1.0)
          .as("ps_supplycost"))
  }

  /** lineitem + commit/receipt dates, ship mode, ship instructions. */
  def lineitemX(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("_rd",
        ((col("l_orderkey") * 7 + col("l_linenumber") * 3) % 30 + 1)
          .cast(IntegerType))
      .withColumn("_cd",
        ((col("l_orderkey") * 5 + col("l_linenumber") * 11) % 61 - 30)
          .cast(IntegerType))
      .withColumn("l_receiptdate", expr("l_shipdate + make_dt_interval(_rd)"))
      .withColumn("l_commitdate", expr("l_shipdate + make_dt_interval(_cd)"))
      .withColumn("l_shipmode", element_at(typedLit(ShipModes),
        ((col("l_orderkey") * 3 + col("l_linenumber")) % 7 + 1).cast(IntegerType)))
      .withColumn("l_shipinstruct", element_at(typedLit(ShipInstructs),
        ((col("l_orderkey") + col("l_linenumber") * 5) % 4 + 1).cast(IntegerType)))
      .drop("_rd", "_cd")

  /** part + container, manufacturer. */
  def partX(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .withColumn("p_container", element_at(typedLit(Containers),
        (col("p_partkey") * 17 % 40 + 1).cast(IntegerType)))
      .withColumn("p_mfgr",
        concat(lit("Manufacturer#"), (col("p_partkey") % 5 + 1).cast(StringType)))

  /** customer + phone (CC-NNN-NNN-NNNN), address. */
  def customerX(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .withColumn("c_phone", format_string("%02d-%03d-%03d-%04d",
        col("c_nationkey") + 10, col("c_custkey") % 1000,
        (col("c_custkey") * 7) % 1000, (col("c_custkey") * 13) % 10000))
      .withColumn("c_address",
        concat(lit("addr#"), col("c_custkey").cast(StringType)))

  /** supplier + address, phone, comment (1-in-13 suppliers carry the
    * Q16 "Customer ... Complaints" marker). */
  def supplierX(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .withColumn("s_address",
        concat(lit("addr#"), col("s_suppkey").cast(StringType)))
      .withColumn("s_phone", format_string("%02d-%03d-%03d-%04d",
        col("s_nationkey") + 10, col("s_suppkey") % 1000,
        (col("s_suppkey") * 7) % 1000, (col("s_suppkey") * 13) % 10000))
      .withColumn("s_comment",
        when(col("s_suppkey") % 13 === 0,
          lit("resolved Customer service Complaints promptly"))
          .otherwise(concat(lit("dependable supplier "),
            col("s_suppkey").cast(StringType))))

  /** DuckDB twins of every derivation above, as a WITH preamble every
    * extended oracle prepends. Formula-for-formula identical to the
    * Spark builders: nonnegative integer %, integer-by-double division,
    * whole-day timestamp arithmetic, printf zero-padding — all
    * bit-stable across the two engines. */
  val oracleCtes: String =
    """WITH
      |ns AS (SELECT count(*) AS n FROM supplier),
      |ps_base AS (
      |  SELECT p_partkey, i,
      |    (p_partkey * 13 + i * 29) % (SELECT n FROM ns) AS ps_suppkey
      |  FROM part CROSS JOIN (SELECT unnest([0,1,2,3]) AS i) ii
      |),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey, ps_suppkey,
      |    CAST((p_partkey * 7 + i * 13) % 9999 + 1 AS INTEGER) AS ps_availqty,
      |    ((p_partkey * 31 + ps_suppkey * 7) % 10000) / 100.0 + 1.0
      |      AS ps_supplycost
      |  FROM ps_base
      |),
      |lineitem_x AS (
      |  SELECT *,
      |    l_shipdate + to_days(CAST((l_orderkey * 7 + l_linenumber * 3) % 30 + 1
      |      AS INTEGER)) AS l_receiptdate,
      |    l_shipdate + to_days(CAST((l_orderkey * 5 + l_linenumber * 11) % 61 - 30
      |      AS INTEGER)) AS l_commitdate,
      |    (['REG AIR','AIR','RAIL','SHIP','TRUCK','MAIL','FOB'])
      |      [CAST((l_orderkey * 3 + l_linenumber) % 7 + 1 AS INTEGER)] AS l_shipmode,
      |    (['DELIVER IN PERSON','COLLECT COD','NONE','TAKE BACK RETURN'])
      |      [CAST((l_orderkey + l_linenumber * 5) % 4 + 1 AS INTEGER)] AS l_shipinstruct
      |  FROM lineitem
      |),
      |part_x AS (
      |  SELECT *,
      |    (['SM CASE','SM BOX','SM BAG','SM JAR','SM PKG','SM PACK','SM CAN','SM DRUM',
      |      'LG CASE','LG BOX','LG BAG','LG JAR','LG PKG','LG PACK','LG CAN','LG DRUM',
      |      'MED CASE','MED BOX','MED BAG','MED JAR','MED PKG','MED PACK','MED CAN','MED DRUM',
      |      'JUMBO CASE','JUMBO BOX','JUMBO BAG','JUMBO JAR','JUMBO PKG','JUMBO PACK','JUMBO CAN','JUMBO DRUM',
      |      'WRAP CASE','WRAP BOX','WRAP BAG','WRAP JAR','WRAP PKG','WRAP PACK','WRAP CAN','WRAP DRUM'])
      |      [CAST(p_partkey * 17 % 40 + 1 AS INTEGER)] AS p_container,
      |    'Manufacturer#' || CAST(p_partkey % 5 + 1 AS VARCHAR) AS p_mfgr
      |  FROM part
      |),
      |customer_x AS (
      |  SELECT *,
      |    printf('%02d-%03d-%03d-%04d', c_nationkey + 10, c_custkey % 1000,
      |      (c_custkey * 7) % 1000, (c_custkey * 13) % 10000) AS c_phone,
      |    'addr#' || CAST(c_custkey AS VARCHAR) AS c_address
      |  FROM customer
      |),
      |supplier_x AS (
      |  SELECT *,
      |    'addr#' || CAST(s_suppkey AS VARCHAR) AS s_address,
      |    printf('%02d-%03d-%03d-%04d', s_nationkey + 10, s_suppkey % 1000,
      |      (s_suppkey * 7) % 1000, (s_suppkey * 13) % 10000) AS s_phone,
      |    CASE WHEN s_suppkey % 13 = 0
      |      THEN 'resolved Customer service Complaints promptly'
      |      ELSE 'dependable supplier ' || CAST(s_suppkey AS VARCHAR)
      |    END AS s_comment
      |  FROM supplier
      |)
      |""".stripMargin
}

/** The six TPC-H queries the base schema could not express (Q2, Q9,
  * Q11, Q12, Q16, Q20) plus the four that previously ran documented
  * stand-in predicates (Q17, Q19, Q21, Q22), all with their REAL
  * predicate shapes over the derived schema — completing TPC-H 22/22
  * (reference lineage: tests/resources/sql/ TPC-H-style suites).
  *
  * Same decimal-exact aggregation discipline as [[Relational]].
  */
object TpchExtended {

  private def dec(c: Column, scale: Int = 2): Column =
    c.cast(DecimalType(18, scale))

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  private def ts(s: String): Column = lit(s).cast(TimestampType)

  /** TPC-H Q2: minimum-cost supplier. The EUROPE-eligible partsupp set
    * builds once (supplier is broadcast onto the derived partsupp); the
    * correlated min-cost subquery is a partial+final agg on ps_partkey
    * joined back on (partkey, cost) — cost equality is safe because both
    * sides carry the identical derived double. Part's size/type cut
    * shrinks it to a broadcastable sliver before the join. */
  def qTpchQ2(s: SparkSession, d: String): DataFrame = {
    val elig = TpchSchema.partsupp(s, d)
      .join(TpchSchema.supplierX(s, d), col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "EUROPE")
      .select(col("ps_partkey"), col("ps_supplycost"), col("s_acctbal"),
        col("s_name"), col("s_address"), col("s_phone"), col("s_comment"),
        col("n_name"))
    val minCost = elig.groupBy(col("ps_partkey").as("mc_key"))
      .agg(min(col("ps_supplycost")).as("mc"))
    TpchSchema.partX(s, d)
      .where(col("p_size").between(10, 20) && col("p_type").like("%DARD"))
      .select(col("p_partkey"), col("p_mfgr"))
      .join(elig, col("p_partkey") === col("ps_partkey"))
      .join(minCost,
        col("p_partkey") === col("mc_key") && col("ps_supplycost") === col("mc"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_mfgr"), col("s_address"), col("s_phone"), col("s_comment"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q9: product-type profit. The name-filtered part sliver
    * broadcasts ahead of the fact chain so lineitem shrinks first; the
    * composite (partkey, suppkey) join to partsupp is the only
    * fact-fact shuffle; profit sums decimal-exact. */
  def qTpchQ9(s: SparkSession, d: String): DataFrame = {
    val amount = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))) -
      dec(col("ps_supplycost")) * dec(col("l_quantity"))
    lineitem(s, d)
      .join(broadcast(part(s, d).where(col("p_name").like("%red%"))
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(TpchSchema.partsupp(s, d),
        col("ps_partkey") === col("l_partkey")
          && col("ps_suppkey") === col("l_suppkey"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(sum(amount).cast(DoubleType).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11: important stock. One partial+final agg per part over
    * the nation-filtered partsupp; the 0.2% threshold is a one-row agg
    * crossJoin'd in lazily (no driver collect). */
  def qTpchQ11(s: SparkSession, d: String): DataFrame = {
    val stock = TpchSchema.partsupp(s, d)
      .join(supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .where(col("n_name") === "NATION_3")
      .groupBy(col("ps_partkey"))
      .agg(sum(dec(col("ps_supplycost")) * col("ps_availqty"))
        .cast(DoubleType).as("value"))
    val threshold = stock
      .agg((sum(dec(col("value"))).cast(DoubleType) * 0.002).as("thr"))
    stock.crossJoin(broadcast(threshold))
      .where(col("value") > col("thr"))
      .select(col("ps_partkey"), col("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  /** TPC-H Q12: shipmode priority. Map-only derived columns, the date
    * and mode filters evaluate on the lineitem scan, one shuffle on the
    * orderkey, a 2-group final agg. */
  def qTpchQ12(s: SparkSession, d: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    TpchSchema.lineitemX(s, d)
      .where(col("l_shipmode").isin("MAIL", "SHIP")
        && col("l_commitdate") < col("l_receiptdate")
        && col("l_shipdate") < col("l_commitdate")
        && col("l_receiptdate") >= ts("1996-01-01 00:00:00")
        && col("l_receiptdate") < ts("1997-01-01 00:00:00"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_shipmode"))
      .agg(
        sum(when(high, 1).otherwise(0)).as("high_line_count"),
        sum(when(high, 0).otherwise(1)).as("low_line_count"))
      .orderBy(col("l_shipmode"))
  }

  /** TPC-H Q16: parts/supplier relationship. The complaints exclusion
    * is a broadcast anti join (8 suppliers per 100); count(distinct)
    * runs as Spark's two-phase expand — fine at any scale because the
    * group space is (brand × type × size), thousands of rows. */
  def qTpchQ16(s: SparkSession, d: String): DataFrame = {
    val complainers = TpchSchema.supplierX(s, d)
      .where(col("s_comment").like("%Customer%Complaints%"))
      .select(col("s_suppkey"))
    TpchSchema.partsupp(s, d)
      .join(broadcast(part(s, d)
        .where(col("p_brand") =!= "Brand#5"
          && !col("p_type").like("MEDIUM%")
          && col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
        col("ps_partkey") === col("p_partkey"))
      .join(broadcast(complainers),
        col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q17: small-quantity-order revenue, real predicates
    * (Brand#23 + MED BOX container). The per-part average is a
    * partial+final agg over only the selected parts' lineitems (the
    * correlated subquery's exact domain — a part determines its brand
    * and container), broadcast back map-side. */
  def qTpchQ17(s: SparkSession, d: String): DataFrame = {
    val sel = lineitem(s, d)
      .join(broadcast(TpchSchema.partX(s, d)
        .where(col("p_brand") === "Brand#23" && col("p_container") === "MED BOX")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val caps = sel.groupBy(col("l_partkey").as("cap_key"))
      .agg((lit(0.2) * (sum(dec(col("l_quantity"))).cast(DoubleType)
        / count(col("l_quantity")))).as("qty_cap"))
    sel.join(broadcast(caps), col("l_partkey") === col("cap_key"))
      .where(col("l_quantity") < col("qty_cap"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q19: discounted revenue — the real three-branch
    * (brand, container-set, quantity, size) disjunction plus the
    * shipmode/shipinstruct guards. One broadcast join; the whole
    * predicate evaluates map-side in a single codegen stage. */
  def qTpchQ19(s: SparkSession, d: String): DataFrame =
    TpchSchema.lineitemX(s, d)
      .where(col("l_shipmode").isin("AIR", "REG AIR")
        && col("l_shipinstruct") === "DELIVER IN PERSON")
      .join(broadcast(TpchSchema.partX(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("p_container"))),
        col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#12"
          && col("p_container").isin("SM CASE", "SM BOX", "SM PACK", "SM PKG")
          && col("l_quantity").between(1, 11) && col("p_size").between(1, 5))
          || (col("p_brand") === "Brand#23"
            && col("p_container").isin("MED BAG", "MED BOX", "MED PKG", "MED PACK")
            && col("l_quantity").between(10, 20) && col("p_size").between(1, 10))
          || (col("p_brand") === "Brand#34"
            && col("p_container").isin("LG CASE", "LG BOX", "LG PACK", "LG PKG")
            && col("l_quantity").between(20, 30) && col("p_size").between(1, 15)))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))

  /** TPC-H Q21: suppliers who kept orders waiting, real late test
    * (l_receiptdate > l_commitdate). The EXISTS / NOT-EXISTS pair over
    * sibling lineitems becomes ONE per-order partial+final agg
    * (supplier count + distinct-late-supplier count) joined back on the
    * orderkey the rows already share — two shuffles total instead of
    * three correlated scans of a 100 TB lineitem. */
  def qTpchQ21(s: SparkSession, d: String): DataFrame = {
    val fl = TpchSchema.lineitemX(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_receiptdate") > col("l_commitdate")).as("late"))
      .join(orders(s, d).where(col("o_orderstatus") === "F")
        .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
    val perOrder = fl.groupBy(col("l_orderkey").as("po_key"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
    fl.where(col("late"))
      .join(perOrder.where(col("n_supp") > 1 && col("n_late_supp") === 1)
        .select(col("po_key")), col("l_orderkey") === col("po_key"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .where(col("n_name") === "NATION_5")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** TPC-H Q20: potential part promotion. The half-year-quantity
    * threshold is one partial+final agg on (partkey, suppkey); the
    * inner join to partsupp reproduces the correlated subquery's
    * NULL-excludes-row semantics (no shipments → NULL comparison →
    * false); candidate suppliers collapse to a distinct set before the
    * tiny supplier⋈nation finish. */
  def qTpchQ20(s: SparkSession, d: String): DataFrame = {
    val shipped = lineitem(s, d)
      .where(col("l_shipdate") >= ts("1996-01-01 00:00:00")
        && col("l_shipdate") < ts("1997-01-01 00:00:00"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg((dsum(col("l_quantity")) * 0.5).as("half_qty"))
    val cand = TpchSchema.partsupp(s, d)
      .join(broadcast(part(s, d).where(col("p_name").like("red%"))
        .select(col("p_partkey"))),
        col("ps_partkey") === col("p_partkey"), "left_semi")
      .join(shipped, col("ps_partkey") === col("l_partkey")
        && col("ps_suppkey") === col("l_suppkey"))
      .where(col("ps_availqty") > col("half_qty"))
      .select(col("ps_suppkey")).distinct()
    TpchSchema.supplierX(s, d)
      .join(cand, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .where(col("n_name") === "NATION_9")
      .select(col("s_name"), col("s_address"))
      .orderBy(col("s_name"))
  }

  /** TPC-H Q22: global sales opportunity, real phone-prefix country
    * codes. Dormancy keeps the documented window adaptation ("no orders
    * since 2000" — every synthetic customer has lifetime orders, so the
    * spec's no-orders-ever test selects nothing); the rest is the real
    * shape: positive-balance average as a lazy one-row broadcast, anti
    * join for dormancy, one final agg over the 7 country codes. */
  def qTpchQ22(s: SparkSession, d: String): DataFrame = {
    val sel = TpchSchema.customerX(s, d)
      .where(substring(col("c_phone"), 1, 2)
        .isin("13", "17", "18", "23", "29", "30", "31"))
      .select(col("c_custkey"),
        substring(col("c_phone"), 1, 2).as("cntrycode"), col("c_acctbal"))
    val avgBal = sel.where(col("c_acctbal") > 0.0)
      .agg((sum(dec(col("c_acctbal"))).cast(DoubleType) / count(lit(1)))
        .as("avg_bal"))
    sel.crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(orders(s, d)
        .where(col("o_orderdate") >= ts("2000-01-01 00:00:00"))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q2" -> (qTpchQ2 _),
    "q_tpch_q9" -> (qTpchQ9 _),
    "q_tpch_q11" -> (qTpchQ11 _),
    "q_tpch_q12" -> (qTpchQ12 _),
    "q_tpch_q16" -> (qTpchQ16 _),
    "q_tpch_q17" -> (qTpchQ17 _),
    "q_tpch_q19" -> (qTpchQ19 _),
    "q_tpch_q20" -> (qTpchQ20 _),
    "q_tpch_q21" -> (qTpchQ21 _),
    "q_tpch_q22" -> (qTpchQ22 _)
  )

  private def ext(q: String): String = TpchSchema.oracleCtes + q

  val oracles: Map[String, String] = Map(
    "q_tpch_q2" -> ext(
      """, elig AS (
        |  SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, s_address,
        |    s_phone, s_comment, n_name
        |  FROM partsupp
        |  JOIN supplier_x ON ps_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |), mincost AS (
        |  SELECT ps_partkey AS mc_key, min(ps_supplycost) AS mc
        |  FROM elig GROUP BY 1
        |)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr, s_address,
        |  s_phone, s_comment
        |FROM part_x
        |JOIN elig ON p_partkey = ps_partkey
        |JOIN mincost ON p_partkey = mc_key AND ps_supplycost = mc
        |WHERE p_size BETWEEN 10 AND 20 AND p_type LIKE '%DARD'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin),

    "q_tpch_q9" -> ext(
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    - CAST(ps_supplycost AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin),

    "q_tpch_q11" -> ext(
      """, stock AS (
        |  SELECT ps_partkey,
        |    CAST(sum(CAST(ps_supplycost AS DECIMAL(18,2)) * ps_availqty)
        |      AS DOUBLE) AS value
        |  FROM partsupp
        |  JOIN supplier ON ps_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3'
        |  GROUP BY ps_partkey
        |)
        |SELECT ps_partkey, value FROM stock
        |WHERE value > (
        |  SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 0.002
        |  FROM stock)
        |ORDER BY value DESC, ps_partkey""".stripMargin),

    "q_tpch_q12" -> ext(
      """SELECT l_shipmode,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem_x ON o_orderkey = l_orderkey
        |WHERE l_shipmode IN ('MAIL','SHIP')
        |  AND l_commitdate < l_receiptdate
        |  AND l_shipdate < l_commitdate
        |  AND l_receiptdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_receiptdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_shipmode ORDER BY l_shipmode""".stripMargin),

    "q_tpch_q16" -> ext(
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1,4,7,10,13,16,19,22,25,49)
        |  AND ps_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier_x
        |    WHERE s_comment LIKE '%Customer%Complaints%')
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),

    "q_tpch_q17" -> ext(
      """, sel AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part_x ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#23' AND p_container = 'MED BOX'
        |), caps AS (
        |  SELECT l_partkey AS cap_key,
        |    0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / count(l_quantity)) AS qty_cap
        |  FROM sel GROUP BY l_partkey
        |)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |  / CAST(7.0 AS DOUBLE) AS avg_yearly
        |FROM sel JOIN caps ON l_partkey = cap_key
        |WHERE l_quantity < qty_cap""".stripMargin),

    "q_tpch_q19" -> ext(
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem_x JOIN part_x ON l_partkey = p_partkey
        |WHERE l_shipmode IN ('AIR','REG AIR')
        |  AND l_shipinstruct = 'DELIVER IN PERSON'
        |  AND ((p_brand = 'Brand#12'
        |      AND p_container IN ('SM CASE','SM BOX','SM PACK','SM PKG')
        |      AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
        |    OR (p_brand = 'Brand#23'
        |      AND p_container IN ('MED BAG','MED BOX','MED PKG','MED PACK')
        |      AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
        |    OR (p_brand = 'Brand#34'
        |      AND p_container IN ('LG CASE','LG BOX','LG PACK','LG PKG')
        |      AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15))"""
        .stripMargin),

    "q_tpch_q20" -> ext(
      """, shipped AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 0.5
        |      AS half_qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_partkey, l_suppkey
        |), cand AS (
        |  SELECT DISTINCT ps_suppkey
        |  FROM partsupp
        |  JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        |  WHERE ps_partkey IN (
        |      SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |    AND ps_availqty > half_qty
        |)
        |SELECT s_name, s_address
        |FROM supplier_x
        |JOIN cand ON s_suppkey = ps_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_9'
        |ORDER BY s_name""".stripMargin),

    "q_tpch_q21" -> ext(
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem_x l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_receiptdate > l1.l_commitdate
        |  AND n_name = 'NATION_5'
        |  AND EXISTS (SELECT 1 FROM lineitem_x l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem_x l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_receiptdate > l3.l_commitdate)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin),

    "q_tpch_q22" -> ext(
      """, sel AS (
        |  SELECT c_custkey, substr(c_phone, 1, 2) AS cntrycode, c_acctbal
        |  FROM customer_x
        |  WHERE substr(c_phone, 1, 2) IN ('13','17','18','23','29','30','31')
        |)
        |SELECT cntrycode, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM sel
        |WHERE c_acctbal > (
        |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |      / count(*) FROM sel WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin)
  )
}
