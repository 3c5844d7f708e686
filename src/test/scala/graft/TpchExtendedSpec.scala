package graft

import org.apache.spark.sql.functions._
import graft.operators.{TpchExtended, TpchSchema}

/** Derived-schema invariants (the DuckDB twins of every formula are
  * hash-checked by the oracle gate; these pin the structural properties
  * the formulas promise) plus plan-shape checks for the extended
  * queries. */
class TpchExtendedSpec extends SparkSpec {

  test("partsupp: 4 suppliers per part, unique pairs, keys in range") {
    val ps = TpchSchema.partsupp(spark, Sf).cache()
    val nPart = Tables.part(spark, Sf).count()
    val nSupp = Tables.supplier(spark, Sf).count()
    assert(ps.count() == 4 * nPart)
    assert(ps.select(col("ps_partkey"), col("ps_suppkey")).distinct().count()
      == 4 * nPart, "duplicate (partkey, suppkey) pair")
    val r = ps.agg(min(col("ps_suppkey")), max(col("ps_suppkey")),
      min(col("ps_availqty")), max(col("ps_availqty")),
      min(col("ps_supplycost")), max(col("ps_supplycost"))).collect()(0)
    assert(r.getLong(0) >= 0 && r.getLong(1) < nSupp)
    assert(r.getInt(2) >= 1 && r.getInt(3) <= 9999)
    assert(r.getDouble(4) >= 1.0 && r.getDouble(5) < 101.0)
    ps.unpersist()
  }

  test("lineitem extension: receipt after ship, commit within ±30 days, vocab columns") {
    val lx = TpchSchema.lineitemX(spark, Sf)
    val bad = lx.where(!(col("l_receiptdate") > col("l_shipdate"))
      || datediff(col("l_receiptdate"), col("l_shipdate")) > 30
      || abs(datediff(col("l_commitdate"), col("l_shipdate"))) > 30)
    assert(bad.count() == 0, "date derivations out of spec range")
    val modes = lx.select(col("l_shipmode")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(modes.subsetOf(Set("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK",
      "MAIL", "FOB")))
    val instr = lx.select(col("l_shipinstruct")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(instr.subsetOf(Set("DELIVER IN PERSON", "COLLECT COD", "NONE",
      "TAKE BACK RETURN")))
  }

  test("derived columns are map-only: no exchange below the lineitem_x projection") {
    val p = TpchSchema.lineitemX(spark, Sf).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"derived-column projection must not shuffle:\n$p")
    assert(!p.contains("UDF("), s"derivations must be native expressions:\n$p")
  }

  test("Q9 broadcasts the name-filtered part sliver; aggregation is partial+final") {
    val df = TpchExtended.qTpchQ9(spark, Sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert("partial_sum".r.findFirstIn(p).isDefined, s"no map-side combine:\n$p")
    assert(df.count() > 0)
  }

  test("Q12 pushes the shipmode/date residual onto the scan side and returns both modes") {
    val rows = TpchExtended.qTpchQ12(spark, Sf).collect()
    assert(rows.map(_.getString(0)).toSeq.sorted == Seq("MAIL", "SHIP"))
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0,
        s"degenerate priority split: $r")
    }
  }

  test("extended queries return rows at test scale") {
    // Q2/Q20/Q21 are selective enough to be empty at sf0.001 — the gate
    // checks them (non-empty) at sf0.01; here they just have to run.
    Seq("q_tpch_q2", "q_tpch_q9", "q_tpch_q11", "q_tpch_q12", "q_tpch_q16",
      "q_tpch_q17", "q_tpch_q19", "q_tpch_q20", "q_tpch_q21", "q_tpch_q22")
      .foreach { q =>
        val n = TpchExtended.queries(q)(spark, Sf).count()
        assert(n >= 0, s"$q failed to run")
      }
  }
}
