package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale defaults applied in one
  * place. On a real cluster the same settings ride along unchanged —
  * only master/parallelism differ.
  *
  *   - AQE on (explicit, with skew-join splitting and post-shuffle
  *     coalescing): runtime re-planning is the main defense at 100 TB,
  *     where static stats misestimate by orders of magnitude;
  *   - shuffle partitions sized to the machine here; at cluster scale
  *     AQE coalesces from a deliberately high initial count instead;
  *   - UTC session timezone so timestamp semantics are deployment-
  *     independent (and match the DuckDB oracle).
  */
object GraftSession {
  def build(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
