package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{HashFunctions, RollingHash}

/** Winnowed Rabin-Karp fingerprint properties (Schleimer et al. 2003):
  * deterministic, shared-substring overlap, and the Catalyst codegen
  * path agrees with the direct static call. */
class FingerprintSpec extends SparkSpec {

  private def fp(s: String): Seq[Long] =
    RollingHash.fingerprint(UTF8String.fromString(s), 8, 4).toLongArray().toSeq

  test("identical strings produce identical fingerprints") {
    val a = "the quick brown fox jumps over the lazy dog repeatedly"
    assert(fp(a) == fp(a))
    assert(fp(a).nonEmpty)
  }

  test("near-duplicate strings share most fingerprints") {
    val base = ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 5).trim
    val edited = base + " with one extra clause appended"
    val (fa, fb) = (fp(base).toSet, fp(edited).toSet)
    val overlap = fa.intersect(fb).size.toDouble / fa.size
    assert(overlap > 0.8, f"containment $overlap%.2f too low for a near-dup")
  }

  test("unrelated strings share almost no fingerprints") {
    val fa = fp("alpha bravo charlie delta echo foxtrot golf hotel india").toSet
    val fb = fp("zero one two three four five six seven eight nine ten").toSet
    val overlap = fa.intersect(fb).size.toDouble / math.max(fa.size, 1)
    assert(overlap < 0.2, f"unrelated overlap $overlap%.2f too high")
  }

  test("short and empty inputs do not crash") {
    assert(fp("") == Seq.empty)
    assert(fp("ab").length == 1)  // shorter than one k-window
  }

  test("catalyst expression path matches the static call") {
    import spark.implicits._
    val df = Seq((1L, "spark native rolling fingerprint expression check"))
      .toDF("id", "text")
    val viaExpr = df.select(HashFunctions.rollingFingerprint(col("text")))
      .collect()(0).getSeq[Long](0)
    assert(viaExpr == fp("spark native rolling fingerprint expression check"))
  }
}
