package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Unified source/sink layer (SURVEY.md §2 completion beyond the
  * reference's parquet-only scan — scan.rs reads a single parquet file).
  *
  * Scale rules baked in:
  *   - reads stay fully declarative so Catalyst keeps pushdown/pruning
  *     (parquet/orc get predicate + column pushdown for free; csv/json
  *     get column pruning and, with a user schema, skip inference scans);
  *   - an explicit schema is REQUIRED for csv/json at scale — schema
  *     inference is a full extra pass over 100 TB;
  *   - writes size files via maxRecordsPerFile and layout via
  *     partitionBy so downstream scans prune directories instead of
  *     listing the world.
  */
object Sources {

  val Formats: Set[String] = Set("parquet", "orc", "csv", "json")

  private def fmtOf(path: String, format: Option[String]): String = {
    val f = format.getOrElse(path.replaceAll(".*\\.", "").toLowerCase)
    require(Formats.contains(f), s"unsupported format '$f' (of $Formats)")
    f
  }

  /** Read any supported format. csv defaults to header=true to match
    * the common lake layout; pass a schema to avoid inference passes. */
  def read(spark: SparkSession, path: String, format: Option[String] = None,
           schema: Option[StructType] = None): DataFrame = {
    val r0 = spark.read
    val r1 = schema.fold(r0)(r0.schema)
    fmtOf(path, format) match {
      case "parquet" => r1.parquet(path)
      case "orc" => r1.orc(path)
      case "json" => r1.json(path)
      case "csv" =>
        val r2 = r1.option("header", "true")
        (if (schema.isEmpty) r2.option("inferSchema", "true") else r2).csv(path)
    }
  }

  /** Write any supported format with scale-aware layout controls. */
  def write(df: DataFrame, path: String, format: Option[String] = None,
            mode: String = "overwrite", partitionBy: Seq[String] = Nil,
            maxRecordsPerFile: Long = 0L): Unit = {
    var w: DataFrameWriter[Row] = df.write.mode(mode)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    if (maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
    fmtOf(path, format) match {
      case "parquet" => w.parquet(path)
      case "orc" => w.orc(path)
      case "json" => w.json(path)
      case "csv" => w.option("header", "true").csv(path)
    }
  }

  /** Range-clustered parquet layout: range-partition on the cluster
    * keys, sort inside each file, write `nFiles` files. Every file then
    * owns a disjoint key range, so parquet min/max statistics prune
    * whole files/row-groups for selective scans on those keys — the
    * single-dimension form of liquid clustering / Z-ordering, and the
    * right layout for append-mostly fact tables queried by time or id.
    * (For multi-column pruning at 100 TB, interleave the key bits
    * before ranging; the write path is identical.) */
  def writeClustered(df: DataFrame, path: String, clusterBy: Seq[String],
                     nFiles: Int = 8): Unit = {
    import org.apache.spark.sql.functions.col
    val keys = clusterBy.map(col)
    df.repartitionByRange(nFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)
  }
}
