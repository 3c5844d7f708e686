package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The multimodal plumbing is real even though the decoder is a stub:
  * schema contract, determinism, and feature shape must hold. */
class MultimodalSpec extends SparkSpec {

  test("decode pipeline yields the contracted schema and row count") {
    val docs = Tables.documents(spark, Sf)
    val out = Multimodal.decodeFeatures(spark, Multimodal.withBlobs(docs))
    assert(out.columns.toSeq ==
      Seq("doc_id", "format", "width", "height", "n_bytes", "features"))
    assert(out.count() == docs.count())
  }

  test("stub decoder is deterministic and emits 8 normalized bins") {
    val blob = "some synthetic media payload".getBytes("UTF-8")
    val (f1, w1, h1, feat1) = Multimodal.StubDecoder.decode(blob)
    val (f2, w2, h2, feat2) = Multimodal.StubDecoder.decode(blob)
    assert((f1, w1, h1) == (f2, w2, h2))
    assert(feat1.toSeq == feat2.toSeq)
    assert(feat1.length == 8)
    assert(math.abs(feat1.sum - 1.0f) < 1e-3)
  }

  test("mm_pipeline aggregates stay consistent with the corpus") {
    val out = Multimodal.mmPipeline(spark, Sf)
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, Sf).count())
  }
}
