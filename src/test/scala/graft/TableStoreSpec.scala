package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TableStore

/** Versioned table snapshots: merge publishes v+1 while v stays
  * byte-stable (time travel through the manifest, round-17 verdict
  * ask #6), retention vacuum reclaims history LOUDLY, and the REPL
  * verbs drive the same lifecycle. */
class TableStoreSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_tablestore").toString

  private def corpus(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def changes(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "op", "c_text")
  }

  private def rowsOf(df: DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("merge publishes v+1; asof(v) is the exact pre-merge snapshot") {
    val dir = freshDir()
    val base = corpus(1L -> "alpha", 2L -> "bravo", 3L -> "charlie")
    assert(TableStore.publish(spark, base, dir) === 1L)
    assert(TableStore.currentVersion(spark, dir) === 1L)

    val v2 = TableStore.merge(spark, dir, changes(
      (2L, "U", "bravo-edited"), (3L, "D", null), (4L, "I", "delta")))
    assert(v2 === 2L)
    // v1 unchanged — time travel reads the pre-merge snapshot exactly
    assert(rowsOf(TableStore.asof(spark, dir, 1L)) ===
      Set(1L -> "alpha", 2L -> "bravo", 3L -> "charlie"))
    // v2 is the merged state: update applied, delete gone, insert in
    assert(rowsOf(TableStore.asof(spark, dir, 2L)) ===
      Set(1L -> "alpha", 2L -> "bravo-edited", 4L -> "delta"))
    // latest == asof(current)
    assert(rowsOf(TableStore.snapshot(spark, dir)) ===
      rowsOf(TableStore.asof(spark, dir, 2L)))
  }

  test("second merge stacks; every version stays readable") {
    val dir = freshDir()
    TableStore.publish(spark, corpus(1L -> "a", 2L -> "b"), dir)
    TableStore.merge(spark, dir, changes((1L, "U", "a2")))
    TableStore.merge(spark, dir, changes((2L, "D", null), (3L, "I", "c")))
    assert(TableStore.currentVersion(spark, dir) === 3L)
    assert(rowsOf(TableStore.asof(spark, dir, 1L)) === Set(1L -> "a", 2L -> "b"))
    assert(rowsOf(TableStore.asof(spark, dir, 2L)) === Set(1L -> "a2", 2L -> "b"))
    assert(rowsOf(TableStore.asof(spark, dir, 3L)) === Set(1L -> "a2", 3L -> "c"))
  }

  test("vacuumRetain keeps the trailing K versions; older reads fail loudly") {
    val dir = freshDir()
    TableStore.publish(spark, corpus(1L -> "a"), dir)
    TableStore.merge(spark, dir, changes((2L, "I", "b")))
    TableStore.merge(spark, dir, changes((3L, "I", "c")))
    val deleted = TableStore.vacuumRetain(spark, dir, retain = 2)
    assert(deleted > 0L)
    // kept versions still read
    assert(rowsOf(TableStore.asof(spark, dir, 2L)) === Set(1L -> "a", 2L -> "b"))
    assert(rowsOf(TableStore.asof(spark, dir, 3L)) ===
      Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // v1 is gone — and says so, never silently serving latest
    val e = intercept[IllegalArgumentException] {
      TableStore.asof(spark, dir, 1L)
    }
    assert(e.getMessage.contains("vacuum"))
  }

  test("asof of a never-committed version fails loudly") {
    val dir = freshDir()
    TableStore.publish(spark, corpus(1L -> "a"), dir)
    intercept[IllegalArgumentException] {
      TableStore.asof(spark, dir, 7L)
    }
  }

  test("gate query: three versions, deterministic merge replay") {
    val out = TableStore.pipelineTableVersions(spark, Sf).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val Seq(v1, v2, v3) = out.toSeq
    // batch 1: -%10==7 deleted, +%10==3 inserted; batch 2: -original
    // %10==3 deleted, +%10==6 inserted — net counts shift accordingly
    val base = graft.Tables.documents(spark, Sf).count()
    assert(v1.getLong(1) === base)
    assert(v1.getLong(3) === 0L) // no inserts at v1
    assert(v2.getLong(3) > 0L)   // batch-1 inserts present at v2
    assert(v3.getLong(3) > v2.getLong(3)) // batch-2 adds more inserts
    // repeated call serves the same artifact (per-JVM gate table)
    val again = TableStore.pipelineTableVersions(spark, Sf).collect()
    assert(again.map(_.toSeq) === out.map(_.toSeq))
  }

  test("REPL table verbs drive the lifecycle") {
    val dir = freshDir()
    val pub = Repl.eval(spark, s"table publish $dir $Sf", Sf)
    assert(pub.contains("version 1"))
    // changes parquet for the merge verb
    val chDir = freshDir() + "/changes"
    changes((0L, "U", "edited-zero")).write.parquet(chDir)
    val mrg = Repl.eval(spark, s"table merge $dir changes=$chDir", Sf)
    assert(mrg.contains("version 2"))
    assert(Repl.eval(spark, s"table status $dir", Sf) === "version=2")
    val asof1 = Repl.eval(spark, s"table asof $dir v=1", Sf)
    assert(asof1.contains("doc_id"))
    val vac = Repl.eval(spark, s"table vacuum $dir retain=1", Sf)
    assert(vac.contains("retained"))
    intercept[IllegalArgumentException] {
      Repl.eval(spark, s"table asof $dir v=1", Sf)
    }
  }
}
