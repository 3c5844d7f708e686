package graft

import graft.operators.Relational

/** Sketch-based operators: error must stay within the configured bound. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact at rsd=0.01") {
    val row = Relational.qApproxCountDistinct(spark, Sf).collect()(0)
    val exact = Relational.qCountDistinct(spark, Sf).collect()(0)
    val approxParts = row.getLong(0).toDouble
    val approxOrders = row.getLong(1).toDouble
    import org.apache.spark.sql.functions._
    val exactParts = Tables.lineitem(spark, Sf)
      .agg(countDistinct(col("l_partkey"))).collect()(0).getLong(0).toDouble
    val exactOrders = Tables.lineitem(spark, Sf)
      .agg(countDistinct(col("l_orderkey"))).collect()(0).getLong(0).toDouble
    assert(math.abs(approxParts - exactParts) / exactParts < 0.05,
      s"parts: approx $approxParts vs exact $exactParts")
    assert(math.abs(approxOrders - exactOrders) / exactOrders < 0.05,
      s"orders: approx $approxOrders vs exact $exactOrders")
  }

  test("approx_percentile within 2% of exact per group at accuracy=10000") {
    val approx = Relational.qApproxPercentile(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Relational.qPercentile(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, (p50, p90)) =>
      assert(math.abs(approx(g)._1 - p50) / p50 < 0.02, s"$g p50")
      assert(math.abs(approx(g)._2 - p90) / p90 < 0.02, s"$g p90")
    }
  }
}
