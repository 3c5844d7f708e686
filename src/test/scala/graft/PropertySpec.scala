package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{RollingHash, SignatureKernels}
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Property-based checks over the native kernels: determinism and
  * semantic invariants must hold for arbitrary inputs, not just the
  * corpus. (scalacheck generators sampled directly — the scalatest
  * bridge artifact isn't a dependency.) */
class PropertySpec extends SparkSpec {

  private val texts: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(" ", "\t", "\n", "日本語", "données")))
      .map(_.mkString(" ")).map(_.take(500))

  private val wordLists: Gen[List[String]] =
    Gen.listOf(Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty))

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def arr(words: Seq[String]) =
    new GenericArrayData(words.map(UTF8String.fromString).toArray)

  test("kernels are deterministic for arbitrary text") {
    samples(texts).foreach { t =>
      val u = UTF8String.fromString(t)
      assert(RollingHash.fingerprint(u, 8, 4).toLongArray().toSeq ==
        RollingHash.fingerprint(u, 8, 4).toLongArray().toSeq)
      assert(SignatureKernels.minhashBuckets(u, 3, 16).toLongArray().toSeq ==
        SignatureKernels.minhashBuckets(u, 3, 16).toLongArray().toSeq)
    }
  }

  test("simhash is order-invariant (bag of words)") {
    val rnd = new scala.util.Random(7)
    samples(wordLists).foreach { ws =>
      val a = SignatureKernels.simhash64(arr(ws))
      val b = SignatureKernels.simhash64(arr(rnd.shuffle(ws)))
      assert(a == b, s"simhash order-dependent for $ws")
    }
  }

  test("minhash buckets are whitespace-run and ASCII-case insensitive") {
    samples(texts).filter(_.forall(_ < 128)).foreach { t =>
      val a = SignatureKernels.minhashBuckets(
        UTF8String.fromString(t), 3, 16).toLongArray().toSeq
      val b = SignatureKernels.minhashBuckets(
        UTF8String.fromString(t.replaceAll(" ", "  ").toUpperCase), 3, 16)
        .toLongArray().toSeq
      assert(a == b, s"buckets changed under case/whitespace noise: '$t'")
    }
  }

  test("fingerprint count is bounded by text length") {
    samples(texts).foreach { t =>
      val n = RollingHash.fingerprint(UTF8String.fromString(t), 8, 4)
        .numElements()
      assert(n <= math.max(t.getBytes("UTF-8").length, 1))
    }
  }
}
