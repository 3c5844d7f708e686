package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query (TPC-H Q1 pricing summary) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TpchExtended.queries ++ Dedup.queries ++
      TextAnalysis.queries ++ Events.queries ++ Similarity.queries ++
      Multimodal.queries ++ GraftEngine.queries ++ Temporal.queries ++
      Curation.queries ++ Sharding.queries ++ QualityRules.queries ++
      TextIndex.queries ++ MediaIndex.queries ++ Bm25Index.queries ++
      Pretrain.queries ++
      QualityModel.queries ++ StatsCatalog.queries ++
      ScaleJoins.queries ++ TableStore.queries ++
      graft.sources.Sources.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TpchExtended.oracles ++ Dedup.oracles ++
      TextAnalysis.oracles ++ Events.oracles ++ Similarity.oracles ++
      Multimodal.oracles ++ GraftEngine.oracles ++ Temporal.oracles ++
      Curation.oracles ++ Sharding.oracles ++ QualityRules.oracles ++
      TextIndex.oracles ++ MediaIndex.oracles ++ Bm25Index.oracles ++
      Pretrain.oracles ++
      QualityModel.oracles ++ StatsCatalog.oracles ++
      ScaleJoins.oracles ++ TableStore.oracles ++
      graft.sources.Sources.oracles
}
