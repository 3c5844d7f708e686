package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the TPC-H-ish test schema (TESTDATA.md).
  *
  * Reads are plain `spark.read.parquet` so Catalyst keeps full freedom
  * for predicate pushdown and column pruning — at 100 TB the scan reads
  * only the columns/row-groups a query touches (check `PushedFilters` /
  * `ReadSchema` in explain output).
  */
object Tables {
  /** Driver data vintages have flipped timestamp columns between
    * UTC-flagged (TimestampType) and naive micros (TIMESTAMP_NTZ in
    * Spark 4). Operators are written against one contract —
    * session-zone TimestampType — so every loader casts NTZ columns
    * through here. The session is pinned UTC (GraftSession), making the
    * cast value-exact; the DuckDB oracle reads the same naive micros,
    * so hash parity holds. */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    import org.apache.spark.sql.functions.col
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    ntz.foldLeft(df)((d, f) =>
      d.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet's `ts` has one extra vintage beyond the NTZ case
    * [[normalizeNtz]] already covers: TIMESTAMP(NANOS), which Spark's
    * reader rejects outright — read nanos as long under the legacy flag
    * and convert exactly (integer division; a double roundtrip would
    * lose precision past 2^53 ns). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Name-keyed loader for API surfaces that take a table name as a
    * string param (e.g. pipelineView's rel=). Routes `events` through
    * its nanos-aware loader rather than the plain reader. */
  def byName(s: SparkSession, d: String, name: String): DataFrame =
    name match {
      case "events" => events(s, d)
      case "region" | "nation" | "customer" | "supplier" | "part" |
           "orders" | "lineitem" | "documents" | "embeddings" =>
        table(s, d, name)
      case other =>
        throw new IllegalArgumentException(s"unknown table: $other")
    }
}
