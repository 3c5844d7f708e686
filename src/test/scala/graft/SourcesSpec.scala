package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Round-trips through every supported source format must preserve
  * values; csv/json honor supplied schemas (no inference pass). */
class SourcesSpec extends SparkSpec {

  private lazy val sample = Tables.nation(spark, Sf).orderBy("n_nationkey")

  test("parquet/orc/csv/json round-trips preserve data") {
    val dir = Files.createTempDirectory("graft_sources").toString
    val want = sample.collect().map(_.toSeq).toSeq
    for (f <- Seq("parquet", "orc", "csv", "json")) {
      Sources.write(sample, s"$dir/t.$f")
      val back = Sources.read(spark, s"$dir/t.$f", schema = Some(sample.schema))
        .orderBy("n_nationkey")
      assert(back.schema == sample.schema, s"$f schema drift")
      assert(back.collect().map(_.toSeq).toSeq == want, s"$f value drift")
    }
  }

  test("csv without schema infers and still round-trips row count") {
    val dir = Files.createTempDirectory("graft_sources_csv").toString
    Sources.write(sample, s"$dir/t.csv")
    assert(Sources.read(spark, s"$dir/t.csv").count() == sample.count())
  }

  test("unsupported format is rejected") {
    intercept[IllegalArgumentException] {
      Sources.read(spark, "/tmp/x.avro")
    }
  }

  test("compaction merges a small-file mess into size-targeted files, rows intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val docs = Tables.documents(spark, Sf)
    // produce a deliberately fragmented layout
    docs.repartition(50).write.mode("overwrite").parquet(s"$dir/frag")
    val fragFiles = spark.read.parquet(s"$dir/frag").inputFiles.length
    assert(fragFiles >= 50, s"setup: expected >=50 files, got $fragFiles")
    val n = Sources.compact(spark, s"$dir/frag", s"$dir/tight",
      targetFileBytes = 512L * 1024)
    val out = spark.read.parquet(s"$dir/tight")
    assert(out.count() == docs.count())
    assert(out.inputFiles.length == n)
    assert(n < fragFiles / 5, s"compaction barely helped: $fragFiles -> $n")
  }
}
