package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.GraftInternals

import graft.functions.{LangStats, MinHashBuckets, MinHashSignature, NgramHashes, NgramHashesPos, RollingFingerprint, SimHash64, TextStats, VecCosine, VecDot, VecL2Sq}

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
    "vec_dot" -> { args => VecDot(args(0), args(1)) },
    "vec_cosine" -> { args => VecCosine(args(0), args(1)) },
    "vec_l2sq" -> { args => VecL2Sq(args(0), args(1)) })

  /** Idempotently register the native functions on a live session. */
  def registerNativeFunctions(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      GraftInternals.registerFunction(spark, name, builder)
    }
}
