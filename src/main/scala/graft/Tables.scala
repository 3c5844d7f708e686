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
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet's `ts` physical type has shifted across driver data
    * vintages; normalize every vintage to session-zone TimestampType so
    * downstream operators (`unix_seconds`/`unix_micros`, streaming
    * watermarks) see one stable type contract:
    *   - TIMESTAMP(NANOS): Spark's reader rejects it; read nanos as long
    *     under the legacy flag and convert exactly (integer division — a
    *     double roundtrip would lose precision past 2^53 ns).
    *   - timestamp[us] with no UTC flag: Spark 4 infers TIMESTAMP_NTZ;
    *     the session is pinned UTC (GraftSession), so the cast to
    *     TimestampType is value-exact and keeps DuckDB-oracle hash parity
    *     (DuckDB reads the same naive micros).
    *   - TimestampType (MakeScale-derived dirs): pass through. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
