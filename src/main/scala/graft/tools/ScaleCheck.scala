package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaled-corpus invariant check — the MakeScale salt scheme has been
  * wrong three times (suffix salting left clone families near-identical
  * in shingle space; v2's token inflation; v3's constant-replacement
  * collapsed per-copy trigrams to bigram-density grams), and each
  * defect was caught a ROUND LATE by a different downstream symptom
  * (quadratic pair blowups, a 70 GB spill, an 80× Σdf² curve). This
  * tool asserts the invariants a scale leg's validity actually rests
  * on, DIRECTLY on the generated corpus, at generation time:
  *
  *  1. doc count:    scaled == factor × base (exact — clone integrity).
  *  2. token mass:   ∝ factor within 5% (the salt must not change what
  *                   a token-budget operator measures; v4's prefix
  *                   keeps counts equal, + one " salt<id>" token per
  *                   cloned doc ≈ <1% at natural doc lengths).
  *  3. distinct trigrams: ≥ 0.8 × factor × base (each copy's grams
  *                   must stay DISTINCT from every other copy's — v3
  *                   collapsed within-copy trigram identity an order
  *                   of magnitude, which this bound catches directly).
  *  4. band mass:    Σ df² over occurrence-level trigrams ≤ 4 × factor
  *                   × base — the quantity SSJoin/LSH candidate counts
  *                   are quadratic in. Independent copies give exactly
  *                   factor× (each gram's df stays its within-copy df);
  *                   the small slack absorbs the untagged tail window
  *                   (ADVICE r18: the salt regex needs a trailing
  *                   space, so ~1 trailing trigram per doc is shared
  *                   across copies, contributing factor²×(tail share)
  *                   ≈ 1-2× linear at factor 100). v3 measured 8× the
  *                   linear budget at factor 10 — loudly over.
  *
  * Wired into [[MakeScale.ensureScaled]] so a v3-style corpus can
  * never again reach a bench or correctness leg: generation fails
  * loudly with the measured ratios instead. ~Two passes over each
  * corpus' documents table (hash kernels, no gram strings). */
object ScaleCheck {

  final case class CorpusStats(docs: Long, tokens: Long,
                               distinct3: Long, df2: Long)

  final case class Report(factor: Int, base: CorpusStats,
                          scaled: CorpusStats) {
    def tokenRatio: Double = scaled.tokens.toDouble / base.tokens
    def distinctRatio: Double = scaled.distinct3.toDouble / base.distinct3
    def df2Ratio: Double = scaled.df2.toDouble / base.df2
    def violations: Seq[String] = {
      val v = Seq.newBuilder[String]
      if (scaled.docs != factor.toLong * base.docs)
        v += s"doc count: ${scaled.docs} != $factor x ${base.docs}"
      if (math.abs(tokenRatio / factor - 1.0) > 0.05)
        v += f"token mass: ${tokenRatio}%.2fx for ${factor}x docs (>5%% off)"
      if (distinctRatio < 0.8 * factor)
        v += f"distinct trigrams: ${distinctRatio}%.2fx for ${factor}x docs " +
          "(<0.8x factor - per-copy gram identity collapsed, v3-style)"
      if (df2Ratio > 4.0 * factor)
        v += f"band mass: sum(df^2) grew ${df2Ratio}%.1fx for ${factor}x docs " +
          "(>4x factor - cross-copy shingle sharing, quadratic pair blowup ahead)"
      v.result()
    }
    def summary: String =
      f"[scalecheck] factor=$factor docs ${base.docs}->${scaled.docs} " +
        f"tokens ${tokenRatio}%.2fx distinct3 ${distinctRatio}%.2fx " +
        f"sum_df2 ${df2Ratio}%.2fx"
  }

  def stats(docs: DataFrame): CorpusStats = {
    import graft.functions.HashFunctions.ngramHashesPos
    val basic = docs
      .agg(count(lit(1)).as("n"),
        sum(size(split(lower(col("text")), "\\s+"))).as("tok")).head()
    val dft = docs
      .select(explode(ngramHashesPos(col("text"), 3)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .agg(count(lit(1)).as("d3"), sum(col("df") * col("df")).as("df2"))
      .head()
    CorpusStats(basic.getLong(0), basic.getLong(1),
      dft.getLong(0), dft.getLong(1))
  }

  /** Measure both corpora and throw (with every violated invariant and
    * its measured ratio) unless the scaled dir looks like `factor`
    * independent copies of the base. */
  def check(spark: SparkSession, baseDir: String, scaledDir: String,
            factor: Int): Report = {
    val r = Report(factor,
      stats(graft.Tables.documents(spark, baseDir)),
      stats(graft.Tables.documents(spark, scaledDir)))
    println(r.summary)
    val v = r.violations
    if (v.nonEmpty)
      throw new IllegalStateException(
        s"ScaleCheck FAILED for $scaledDir (base $baseDir, factor $factor):\n  " +
          v.mkString("\n  "))
    r
  }

  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scaled = args.lift(1).getOrElse("/tmp/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    check(spark, base, scaled, factor)
    spark.stop()
  }
}
