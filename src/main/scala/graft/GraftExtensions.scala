package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.GraftInternals

import graft.functions.{CellResidual, CharEntropy, HyperplaneCodes, HyperplaneProbes, LangStats, MinHashBuckets, MinHashSignature, NearestCells, NgramHashes, NgramHashesPos, RollingFingerprint, SimHash64, TextStats, VecCosine, VecDot, VecL2Sq}

/** SQL registration of graft's native expressions, two ways:
  *
  *   - at session construction (production):
  *     `spark.sql.extensions=graft.GraftExtensions` — the public
  *     SparkSessionExtensions injection point;
  *   - post-construction on an existing session:
  *     `GraftExtensions.registerNativeFunctions(spark)` — for sessions
  *     the caller didn't build (notebooks, test harnesses).
  *
  * Both routes share one builder table so SQL arity/semantics cannot
  * drift between them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo("graft", name), builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  /** Constant-fold a foldable array<double> argument (e.g. a SQL
    * `array(...)` literal) into the flat matrix the kernel carries as a
    * codegen reference object. */
  private def doubleArrayArg(e: Expression, name: String): Array[Double] =
    if (e.foldable) e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toDoubleArray()
      case other => throw new IllegalArgumentException(
        s"$name expects an array<double> literal, got $other")
    } else throw new IllegalArgumentException(
      s"$name expects a foldable array<double> literal, got $e")

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_buckets" -> {
      case Seq(text) => MinHashBuckets(text, 3, 16)
      case Seq(text, n, bands) =>
        MinHashBuckets(text, intArg(n, "n"), intArg(bands, "bands"))
      case _ => throw new IllegalArgumentException(
        "minhash_buckets(text[, n, bands])")
    },
    "minhash_signature" -> { args => MinHashSignature(args.head) },
    "simhash64" -> { args => SimHash64(args.head) },
    "ngram_hashes" -> {
      case Seq(text) => NgramHashes(text, 8)
      case Seq(text, n) => NgramHashes(text, intArg(n, "n"))
      case _ => throw new IllegalArgumentException("ngram_hashes(text[, n])")
    },
    "ngram_hashes_pos" -> {
      case Seq(text) => NgramHashesPos(text, 8)
      case Seq(text, n) => NgramHashesPos(text, intArg(n, "n"))
      case _ => throw new IllegalArgumentException("ngram_hashes_pos(text[, n])")
    },
    "rolling_fingerprint" -> {
      case Seq(text) => RollingFingerprint(text, 8, 4)
      case Seq(text, k, w) =>
        RollingFingerprint(text, intArg(k, "k"), intArg(w, "w"))
      case _ => throw new IllegalArgumentException(
        "rolling_fingerprint(text[, k, w])")
    },
    "text_stats" -> { args => TextStats(args.head) },
    "lang_stats" -> { args => LangStats(args.head) },
    "char_entropy" -> { args => CharEntropy(args.head) },
    "vec_dot" -> { args => VecDot(args(0), args(1)) },
    "vec_cosine" -> { args => VecCosine(args(0), args(1)) },
    "vec_l2sq" -> { args => VecL2Sq(args(0), args(1)) },
    // hyperplane_codes(v, planes, L, b): flat row-major (L·b × dim)
    // plane matrix as an array literal; dim divides out of the length
    "hyperplane_codes" -> {
      case Seq(v, planes, l, b) =>
        val p = doubleArrayArg(planes, "planes")
        val (lEff, bEff) = (intArg(l, "L"), intArg(b, "b"))
        require(lEff > 0 && bEff > 0 && p.length % (lEff * bEff) == 0,
          s"planes length ${p.length} must be a multiple of L*b = ${lEff * bEff}")
        HyperplaneCodes(v, p, lEff, bEff, p.length / (lEff * bEff))
      case _ => throw new IllegalArgumentException(
        "hyperplane_codes(v, planes, L, b)")
    },
    // nearest_cells(v, centroids, k, nProbe): flat row-major (k × dim)
    "nearest_cells" -> {
      case Seq(v, cents, k, nProbe) =>
        val c = doubleArrayArg(cents, "centroids")
        val kEff = intArg(k, "k")
        require(kEff > 0 && c.length % kEff == 0,
          s"centroids length ${c.length} must be a multiple of k = $kEff")
        NearestCells(v, c, kEff, c.length / kEff, intArg(nProbe, "nProbe"))
      case _ => throw new IllegalArgumentException(
        "nearest_cells(v, centroids, k, nProbe)")
    },
    // hyperplane_probes(v, planes, L, b, nProbe): multi-probe query
    // codes — the exact bucket per table plus the nProbe−1
    // lowest-margin bit flips
    "hyperplane_probes" -> {
      case Seq(v, planes, l, b, nProbe) =>
        val p = doubleArrayArg(planes, "planes")
        val (lEff, bEff) = (intArg(l, "L"), intArg(b, "b"))
        require(lEff > 0 && bEff > 0 && p.length % (lEff * bEff) == 0,
          s"planes length ${p.length} must be a multiple of L*b = ${lEff * bEff}")
        HyperplaneProbes(v, p, lEff, bEff, p.length / (lEff * bEff),
          intArg(nProbe, "nProbe"))
      case _ => throw new IllegalArgumentException(
        "hyperplane_probes(v, planes, L, b, nProbe)")
    },
    // cell_residual(v, cell, centroids, k): v − centroids[cell]
    "cell_residual" -> {
      case Seq(v, cell, cents, k) =>
        val c = doubleArrayArg(cents, "centroids")
        val kEff = intArg(k, "k")
        require(kEff > 0 && c.length % kEff == 0,
          s"centroids length ${c.length} must be a multiple of k = $kEff")
        CellResidual(v, cell, c, kEff, c.length / kEff)
      case _ => throw new IllegalArgumentException(
        "cell_residual(v, cell, centroids, k)")
    })

  /** Idempotently register the native functions on a live session. */
  def registerNativeFunctions(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      GraftInternals.registerFunction(spark, name, builder)
    }
}
