package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables._

/** Versioned table snapshots under the [[IndexFiles]] manifest — the
  * round-17 verdict's mini-lakehouse loop (gap #4): the CDC dataflows
  * ([[Sharding.mergeUpsert]] / scd2Build) produced plain parquet with
  * no version contract, while every index and the stats catalog
  * already publish manifest-stamped snapshots. This closes it:
  *
  *   - [[publish]] commits a FULL snapshot as manifest version v+1 —
  *     the new files REPLACE the live set, but superseded files stay
  *     on disk and superseded manifests stay committed, so
  *   - [[asof]] reads the table exactly as version v published it
  *     (manifest-resolved file list, no directory listing) — time
  *     travel is a metadata lookup plus a scan of v's own files, and
  *   - [[merge]] is the CDC verb: apply a (doc_id, op, c_text) change
  *     batch to the LATEST snapshot ([[Sharding.mergeUpsert]]'s
  *     full-outer dataflow, deletes drop, change wins) and publish
  *     the result as v+1. A failed merge never tears the table — the
  *     snapshot flip is one conditional manifest commit.
  *   - [[vacuumRetain]] bounds history: keep the trailing K versions
  *     readable, reclaim everything older. Reading a vacuumed version
  *     fails LOUDLY (IndexFiles.readVersion) — never silently-latest.
  *
  * Scale shape: a published snapshot is written once and only read
  * thereafter; merge shuffles once on the key (the full-outer join);
  * time travel reads only version v's files — no log replay, no
  * directory diff. This is the Delta/Iceberg snapshot contract
  * re-expressed over the engine's own manifest protocol, sized for
  * the dims/metadata tables a training pipeline versions (the 100 TB
  * fact corpus versions through [[Sharding.scd2Build]] histories
  * instead — one row per key-version, not one snapshot per version).
  *
  * Snapshot schema contract for [[merge]]: (doc_id, text) — the
  * change batch carries (doc_id, op ∈ U|I|D, c_text). [[publish]] and
  * [[asof]] are schema-agnostic. */
object TableStore {

  def hasTable(s: SparkSession, dir: String): Boolean =
    IndexFiles.hasIndex(s, dir)

  def currentVersion(s: SparkSession, dir: String): Long =
    IndexFiles.read(s, dir).version

  /** Commit `df` as the table's next full snapshot; returns the new
    * version. Prior snapshots stay readable via [[asof]] until
    * [[vacuumRetain]] reclaims them. */
  def publish(s: SparkSession, df: DataFrame, dir: String): Long =
    IndexFiles.withWriterLock(s, dir) {
      val root = new Path(s"$dir/snapshots")
      val fs = IndexFiles.fsFor(s, root)
      val before = IndexFiles.listParquet(fs, root).map(_.rel).toSet
      df.write.mode("append").parquet(root.toString)
      val added = IndexFiles.listParquet(fs, root)
        .filterNot(e => before(e.rel))
      if (IndexFiles.hasIndex(s, dir))
        IndexFiles.commit(s, dir)(m => m.copy(data = added)).version
      else {
        val ok = IndexFiles.tryCommit(s, dir, IndexFiles.Manifest(1L,
          s"table-${java.util.UUID.randomUUID().toString}", added,
          Vector.empty))
        require(ok, s"first publish of $dir raced another publish")
        1L
      }
    }

  /** The table as of manifest version `v` — loud when `v` was never
    * committed or has been vacuumed. */
  def asof(s: SparkSession, dir: String, v: Long): DataFrame = {
    val m = IndexFiles.readVersion(s, dir, v)
    IndexFiles.dataFrame(s, dir, "snapshots", m)
      .getOrElse(s.emptyDataFrame)
  }

  /** The latest committed snapshot. */
  def snapshot(s: SparkSession, dir: String): DataFrame = {
    val m = IndexFiles.read(s, dir)
    IndexFiles.dataFrame(s, dir, "snapshots", m)
      .getOrElse(s.emptyDataFrame)
  }

  /** [[Sharding.mergeUpsert]]'s dataflow as a snapshot transform:
    * (doc_id, text) × (doc_id, op, c_text) → (doc_id, text). Deletes
    * drop, updates/inserts take the change text, untouched rows keep
    * theirs. One shuffle on the key. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame): DataFrame =
    snapshot.select(col("doc_id"), col("text").as("s_text"))
      .join(changes.select(col("doc_id"), col("op"), col("c_text")),
        Seq("doc_id"), "full_outer")
      .where(coalesce(col("op"), lit("K")) =!= "D")
      .select(col("doc_id"), coalesce(col("c_text"), col("s_text")).as("text"))

  /** CDC MERGE: apply `changes` to the latest snapshot and publish the
    * result as version v+1. Returns the new version. */
  def merge(s: SparkSession, dir: String, changes: DataFrame): Long =
    publish(s, applyChanges(snapshot(s, dir), changes), dir)

  /** Keep the trailing `retain` versions readable; reclaim older
    * manifests and the files only they referenced. */
  def vacuumRetain(s: SparkSession, dir: String, retain: Int): Long =
    IndexFiles.vacuumRetain(s, dir, "snapshots", retain)

  // ---- the gate query ------------------------------------------------

  /** Deterministic change batches for the gate — derived from the
    * corpus so the DuckDB oracle replays them exactly. Batch 1 is
    * [[Sharding.pipelineMergeUpsert]]'s batch; batch 2 edits ≡4,
    * deletes the ORIGINAL ≡3 docs (whose replacements batch 1
    * inserted under +10⁷), inserts ≡6 under +2·10⁷. */
  private def batch1(snap: DataFrame): DataFrame =
    snap.where(col("doc_id") % 10 === 0)
      .select(col("doc_id"), lit("U").as("op"),
        concat(lit("edited: "), substring(col("text"), 1, 50)).as("c_text"))
      .unionAll(snap.where(col("doc_id") % 10 === 7)
        .select(col("doc_id"), lit("D").as("op"),
          lit(null).cast("string").as("c_text")))
      .unionAll(snap.where(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 10000000L).as("doc_id"), lit("I").as("op"),
          concat(lit("new: "), substring(col("text"), 1, 40)).as("c_text")))

  private def batch2(snap: DataFrame): DataFrame =
    snap.where(col("doc_id") % 10 === 4)
      .select(col("doc_id"), lit("U").as("op"),
        concat(lit("edited2: "), substring(col("text"), 1, 50)).as("c_text"))
      .unionAll(snap.where(col("doc_id") % 10 === 3)
        .select(col("doc_id"), lit("D").as("op"),
          lit(null).cast("string").as("c_text")))
      .unionAll(snap.where(col("doc_id") % 10 === 6)
        .select((col("doc_id") + 20000000L).as("doc_id"), lit("I").as("op"),
          concat(lit("new2: "), substring(col("text"), 1, 40)).as("c_text")))

  /** Built-once gate table per (JVM, data dir): v1 = the corpus,
    * v2/v3 = two deterministic merges — then every call is pure
    * serving: three as-of reads, each aggregated to one row. The
    * bench MIN tracks time-travel read cost, not merge cost (the
    * serve_ann_probe discipline). */
  private val gateTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Gate: per version (1..3), the as-of read's row count, total
    * chars, and how many rows are batch inserts — pins that merge
    * published v+1 while v stayed byte-stable, oracle-checked by a
    * SQL replay of both merges. */
  def pipelineTableVersions(s: SparkSession, d: String): DataFrame = {
    val dir = gateTables.computeIfAbsent(d, { _ =>
      val tmp = IndexFiles.tempDirDeletedOnExit("graft_tablestore_gate")
      val base = documents(s, d).select(col("doc_id"), col("text"))
      publish(s, base, tmp)
      merge(s, tmp, batch1(base))
      merge(s, tmp, batch2(base))
      tmp
    })
    (1L to 3L).map { v =>
      asof(s, dir, v).agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast(LongType)).as("sum_chars"),
        sum(when(col("doc_id") >= 10000000L, 1L).otherwise(0L))
          .as("n_inserted"))
        .select(lit(v).as("version"), col("n_docs"), col("sum_chars"),
          col("n_inserted"))
    }.reduce(_.unionAll(_)).orderBy(col("version"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_table_versions" -> ((s, d) => pipelineTableVersions(s, d))
  )

  val oracles: Map[String, String] = Map(
    "pipeline_table_versions" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |c1 AS (
        |  SELECT doc_id, 'U' AS op,
        |         'edited: ' || substr(text, 1, 50) AS c_text
        |  FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id, 'D', NULL FROM documents WHERE doc_id % 10 = 7
        |  UNION ALL
        |  SELECT doc_id + 10000000, 'I', 'new: ' || substr(text, 1, 40)
        |  FROM documents WHERE doc_id % 10 = 3
        |), v2 AS (
        |  SELECT coalesce(s.doc_id, c.doc_id) AS doc_id,
        |         coalesce(c.c_text, s.text) AS text
        |  FROM v1 s FULL OUTER JOIN c1 c ON s.doc_id = c.doc_id
        |  WHERE coalesce(c.op, 'K') <> 'D'
        |), c2 AS (
        |  SELECT doc_id, 'U' AS op,
        |         'edited2: ' || substr(text, 1, 50) AS c_text
        |  FROM documents WHERE doc_id % 10 = 4
        |  UNION ALL
        |  SELECT doc_id, 'D', NULL FROM documents WHERE doc_id % 10 = 3
        |  UNION ALL
        |  SELECT doc_id + 20000000, 'I', 'new2: ' || substr(text, 1, 40)
        |  FROM documents WHERE doc_id % 10 = 6
        |), v3 AS (
        |  SELECT coalesce(s.doc_id, c.doc_id) AS doc_id,
        |         coalesce(c.c_text, s.text) AS text
        |  FROM v2 s FULL OUTER JOIN c2 c ON s.doc_id = c.doc_id
        |  WHERE coalesce(c.op, 'K') <> 'D'
        |), agg AS (
        |  SELECT 1 AS version, count(*) AS n_docs,
        |    CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        |    CAST(sum(CASE WHEN doc_id >= 10000000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_inserted
        |  FROM v1
        |  UNION ALL
        |  SELECT 2, count(*), CAST(sum(length(text)) AS BIGINT),
        |    CAST(sum(CASE WHEN doc_id >= 10000000 THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM v2
        |  UNION ALL
        |  SELECT 3, count(*), CAST(sum(length(text)) AS BIGINT),
        |    CAST(sum(CASE WHEN doc_id >= 10000000 THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM v3
        |)
        |SELECT CAST(version AS BIGINT) AS version, n_docs, sum_chars,
        |  n_inserted
        |FROM agg ORDER BY version""".stripMargin
  )
}
