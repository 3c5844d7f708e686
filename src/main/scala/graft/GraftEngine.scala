package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front-end with reference-dialect compatibility
  * (cite: reference src/parser, and the .slt suites in
  * tests/resources/sql).
  *
  * The reference engine accepts `SELECT … FROM 'path.parquet' AS t`.
  * Spark SQL covers the entire query surface natively; this shim only
  * rewrites the dialect differences so a reference user can run their
  * existing queries verbatim:
  *
  *   - `'path.parquet'` table refs → Spark's ``parquet.`path` `` scans
  *     (relative paths resolve against `baseDir`);
  *   - `x != NULL` / `x = NULL` → `IS [NOT] NULL` — the reference
  *     evaluates null comparisons as null *tests* (aggregates3.slt
  *     expects `where score1 != NULL` to filter null scores) instead of
  *     ANSI 3-valued logic;
  *   - boolean `XOR` → `!=` (equivalent on booleans; Spark's parser has
  *     no XOR operator — expression.rs:139 supports it natively).
  *
  * Everything downstream is stock Spark SQL: Catalyst optimizes the
  * parsed plan (pushdown, pruning, join selection) exactly as if the
  * query had been written against the DataFrame API.
  */
object GraftEngine {

  /** Run a reference-dialect SQL query. Graft's native functions
    * (minhash_buckets, text_stats, vec_cosine, …) are registered
    * idempotently so they're callable from SQL regardless of how the
    * session was built. */
  def sql(spark: SparkSession, query: String, baseDir: String = ""): DataFrame = {
    GraftExtensions.registerNativeFunctions(spark)
    spark.sql(rewrite(query, baseDir))
  }

  /** Dialect rewrite only — no planning, no optimization (Catalyst owns
    * that); pure text-level shims, exposed for tests. */
  def rewrite(query: String, baseDir: String = ""): String = {
    var s = query
    s = "'([^']+\\.parquet)'".r.replaceAllIn(s, m => {
      val p = m.group(1)
      val full = if (p.startsWith("/") || baseDir.isEmpty) p else s"$baseDir/$p"
      java.util.regex.Matcher.quoteReplacement(s"parquet.`$full`")
    })
    s = "(?i)!=\\s*null\\b".r.replaceAllIn(s, " IS NOT NULL")
    s = "(?i)(?<![!<>=])=\\s*null\\b".r.replaceAllIn(s, " IS NULL")
    s = "(?i)\\bxor\\b".r.replaceAllIn(s, "!=")
    s
  }

  /** Expose a PIPELINE operator (dedup clusters, ANN paths, quality
    * gates, sharding …) to SQL as a temp view `graft_<name>` over
    * `dataDir` — the native kernels are already SQL-registered via
    * GraftExtensions; this registers the operator *pipelines*, so a
    * SQL user reaches e.g. the MinHash cluster collapse the way a
    * DataFrame user does:
    *
    * {{{
    * GraftEngine.pipelineView(spark, "dedup_minhash_clusters", dir)
    * GraftEngine.sql(spark,
    *   "select comp, count(*) n from graft_dedup_minhash_clusters group by 1")
    * }}}
    *
    * The view holds the operator's full logical plan: later SQL
    * composes against it and Catalyst optimizes the combined plan
    * (filters/projections push into the pipeline where semantics
    * allow). Registration is ON DEMAND, one operator at a time —
    * operators whose builders do eager driver-side work (ANN index
    * fits/writes) pay it at registration, not per query, and
    * unregistered operators pay nothing. */
  def pipelineView(spark: SparkSession, name: String, dataDir: String): String = {
    val builder = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown operator '$name' — valid names are SparkEntry.queries keys"))
    val view = s"graft_$name"
    builder(spark, dataDir).createOrReplaceTempView(view)
    view
  }

  /** Register several pipeline views at once; returns the view names. */
  def pipelineViews(spark: SparkSession, dataDir: String,
                    names: Seq[String]): Seq[String] =
    names.map(pipelineView(spark, _, dataDir))

  /** Driver-gate sample: the flagship aggregation written in the
    * reference dialect, run through the front-end. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_frontend" -> ((s: SparkSession, d: String) =>
      sql(s,
        s"""select l_returnflag, sum(l_quantity) as sum_qty,
           |  count(*) as n, max(l_extendedprice) as max_price
           |from '$d/lineitem.parquet'
           |where l_quantity < 30 and not l_returnflag = 'X'
           |group by l_returnflag""".stripMargin)
        .orderBy("l_returnflag"))
  )

  val oracles: Map[String, String] = Map(
    "q_sql_frontend" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  count(*) AS n, max(l_extendedprice) AS max_price
        |FROM lineitem
        |WHERE l_quantity < 30 AND NOT l_returnflag = 'X'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
