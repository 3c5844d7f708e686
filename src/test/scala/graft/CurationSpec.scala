package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** The composed curation flow must drop short docs, exact copies, and
  * planted near-duplicates while keeping everything else. */
class CurationSpec extends SparkSpec {

  test("curate drops short, exact-dup, and near-dup docs; keeps the rest") {
    import spark.implicits._
    val base = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text"))
    val n = base.count()
    val extras = Seq(
      (900001L, "too short"),                       // fails quality gate
      (900002L, "still too"),                       // fails quality gate
    ).toDF("doc_id", "text")
    val exactCopy = base.where(col("doc_id") === 0)
      .select(lit(900003L).as("doc_id"), col("text"))
    val nearCopy = base.where(col("doc_id") === 1)
      .select(lit(900004L).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    val corpus = base.unionByName(extras).unionByName(exactCopy)
      .unionByName(nearCopy)
    val kept = Curation.curate(corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(900001L) && !kept.contains(900002L), "quality gate")
    assert(!kept.contains(900003L), "exact duplicate survived")
    assert(!kept.contains(900004L), "near duplicate survived")
    assert(kept.contains(0L) && kept.contains(1L), "originals must survive")
    // the original corpus may contain its own dups; survivors are a
    // subset of originals and at least the known-unique majority remains
    assert(kept.size <= n && kept.size > n / 2)
  }
}
