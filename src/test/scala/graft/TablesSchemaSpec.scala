package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Vintage-drift canary: the driver regenerates /root/testdata between
  * rounds, and physical parquet types have shifted before (TIMESTAMP(NANOS)
  * → naive timestamp[us]/TIMESTAMP_NTZ), silently breaking strictly-typed
  * operators at plan time. This spec pins the NORMALIZED schema every
  * Tables.* loader must emit — if the data vintage drifts again, this
  * fails in seconds, in-repo, before the correctness gate runs.
  */
class TablesSchemaSpec extends SparkSpec {

  private def types(df: DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  test("no loader emits TIMESTAMP_NTZ or raw long timestamps") {
    val loaders: Map[String, DataFrame] = Map(
      "region" -> Tables.region(spark, Sf),
      "nation" -> Tables.nation(spark, Sf),
      "customer" -> Tables.customer(spark, Sf),
      "supplier" -> Tables.supplier(spark, Sf),
      "part" -> Tables.part(spark, Sf),
      "orders" -> Tables.orders(spark, Sf),
      "lineitem" -> Tables.lineitem(spark, Sf),
      "events" -> Tables.events(spark, Sf),
      "documents" -> Tables.documents(spark, Sf),
      "embeddings" -> Tables.embeddings(spark, Sf))
    loaders.foreach { case (name, df) =>
      df.schema.fields.foreach { f =>
        assert(f.dataType != TimestampNTZType,
          s"$name.${f.name} is TIMESTAMP_NTZ — loader must normalize to TimestampType")
      }
    }
  }

  test("events: normalized contract (ts TimestampType, typed value columns)") {
    val t = types(Tables.events(spark, Sf))
    assert(t("ts") == TimestampType, s"events.ts is ${t("ts")}")
    assert(t("event_id") == LongType)
    assert(t("user_id") == LongType)
    assert(t("event_type") == StringType)
    assert(t("value") == DoubleType)
    assert(t("props") == StringType)
  }

  test("streaming events source agrees with the batch contract") {
    val st = types(graft.streaming.EventStreams.eventStream(spark, Sf))
    assert(st("ts") == TimestampType, s"stream ts is ${st("ts")}")
    assert(st("event_id") == LongType)
    assert(st("value") == DoubleType)
  }

  test("orders/lineitem: date columns are TimestampType") {
    assert(types(Tables.orders(spark, Sf))("o_orderdate") == TimestampType)
    assert(types(Tables.lineitem(spark, Sf))("l_shipdate") == TimestampType)
  }

  test("embeddings: vector is Array[Float]") {
    val t = types(Tables.embeddings(spark, Sf))
    assert(t("embedding") == ArrayType(FloatType, containsNull = true) ||
      t("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding is ${t("embedding")}")
    assert(t("vec_id") == LongType)
  }

  test("documents: text contract") {
    val t = types(Tables.documents(spark, Sf))
    assert(t("doc_id") == LongType)
    assert(t("text") == StringType)
    assert(t("lang") == StringType)
    assert(t("source") == StringType)
  }
}
