package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextIndex

/** TextIndex at-scale stress — the text twin of [[AnnStress]]: does
  * the persisted MinHash index hold its scale claims as the corpus
  * grows 10×/50× past the gate data?
  *
  * Measured per factor (printed; the SURVEY §6 numbers):
  *   - build time over the scaled corpus (one codegen'd kernel pass +
  *     a parquet write — should scale ~linearly in corpus bytes);
  *   - index bytes vs corpus text bytes AND index bytes PER DOC: the
  *     at-rest cost is 16 fixed-width rows per doc, so bytes/doc must
  *     stay CONSTANT across factors — that constant over production
  *     doc sizes (tens of KB) is the "~0.1% of corpus bytes" claim;
  *     the synthetic corpus' ~300-byte docs price the same constant
  *     at a few tens of percent, which the printout makes visible
  *     rather than hiding;
  *   - admission throughput: docs/sec through the PURE decision
  *     ([[TextIndex.admit]]) for a 1 000-doc batch — half planted
  *     near-dups of standing docs (case/whitespace noise, which the
  *     kernel normalizes away → deterministic band collisions), half
  *     genuinely fresh (every token salted, J ≈ 0 vs everything);
  *   - bucket occupancy (avg/p99/max over (band, bucket)) — the
  *     band-collision analog of AnnStress's cand_frac: admission work
  *     per batch doc is ∝ occupancy of its 16 buckets, so occupancy
  *     must stay FLAT as n grows (the bucket space is 64-bit; only
  *     true near-dup clusters share a bucket).
  *
  * Cross-factor checks: occupancy flat (50× within 1.5× of 10×),
  * bytes/doc flat, planted rejection ≥ 99%, fresh admission ≥ 99%.
  *
  * Corpus scaling salts EVERY token of a cloned doc (suffix keyed on
  * (token, doc_id, copy)) — unlike an appended-tail salt, this kills
  * every shingle, so clones are honestly distinct under MinHash and
  * the index's occupancy reflects real cluster structure, not
  * replication artifacts. */
object TextIndexStress {
  private val Shift = 100000000L

  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(10, 50)
    val spark = graft.GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val stats = factors.map(f => runOne(spark, "/root/testdata/sf0.1", f))
    if (factors.size >= 2) {
      val occs = stats.map(_._1)
      check(f"bucket occupancy stays flat as the corpus grows " +
        f"(${occs.mkString(" → ")})",
        occs.sliding(2).forall { case Seq(a, b) => b <= a * 1.5 })
      val bpd = stats.map(_._2)
      check(f"index bytes/doc stay flat as the corpus grows " +
        f"(${bpd.map(b => f"$b%.0f").mkString(" → ")})",
        bpd.sliding(2).forall { case Seq(a, b) => b <= a * 1.5 })
    }
    spark.stop()
  }

  private def check(name: String, ok: Boolean): Unit = {
    println(s"${if (ok) "PASS" else "FAIL"}  $name")
    if (!ok) sys.exit(1)
  }

  private def timed[T](name: String)(x: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = x
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"$name%-18s $secs%8.2f s")
    (r, secs)
  }

  /** Suffix every token with a hash keyed on (token, doc_id, tag): no
    * shingle survives, so the result is honestly distinct from the
    * source doc AND from every other salted clone. */
  private def saltedText(tag: Column): Column =
    concat_ws(" ", transform(split(col("text"), "\\s+"),
      t => concat(t, lit("x"),
        pmod(xxhash64(t, col("doc_id"), tag), lit(99991L)))))

  private def dirBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(dir))
  }

  /** Returns (avg bucket occupancy, index bytes per doc). */
  def runOne(spark: SparkSession, src: String, factor: Int): (Double, Double) = {
    val base = java.nio.file.Files
      .createTempDirectory(s"graft_textidx_$factor").toString
    val docs = graft.Tables.documents(spark, src)
      .select(col("doc_id"), col("text"))
    val copies = spark.range(factor.toLong).select(col("id").as("_copy"))
    docs.crossJoin(copies)
      .select((col("doc_id") + col("_copy") * Shift).as("doc_id"),
        when(col("_copy") === 0, col("text"))
          .otherwise(saltedText(col("_copy"))).as("text"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$base/corpus.parquet")
    val corpus = spark.read.parquet(s"$base/corpus.parquet")
    val agg = corpus.agg(count(lit(1)), sum(length(col("text")))).collect().head
    val (n, corpusBytes) = (agg.getLong(0), agg.getLong(1))
    println(s"\n=== factor=$factor docs=$n corpus=${corpusBytes / 1024} KiB ===")

    val idxDir = s"$base/index"
    val (_, tBuild) = timed("build")(
      TextIndex.build(spark, corpus, idxDir))
    println(f"  build throughput ${n / tBuild}%.0f docs/sec")
    val idxBytes = dirBytes(idxDir)
    val bytesPerDoc = idxBytes.toDouble / n
    println(f"  index ${idxBytes / 1024} KiB = ${100.0 * idxBytes / corpusBytes}%.1f%% " +
      f"of corpus text, $bytesPerDoc%.0f B/doc " +
      f"(constant/doc → ~0.1%% at production doc sizes)")

    // 1 000-doc admission batch: 500 planted near-dups of standing
    // copy-0 docs (normalization-invariant noise → deterministic
    // rejection), 500 token-salted fresh docs (admitted)
    val planted = docs.where(col("doc_id") < 500)
      .select((col("doc_id") + 2 * Shift).as("doc_id"),
        upper(regexp_replace(col("text"), " ", "  ")).as("text"))
    val fresh = docs.where(col("doc_id") < 500)
      .select((col("doc_id") + 3 * Shift).as("doc_id"),
        saltedText(lit(-7L)).as("text"))
    val batch = planted.unionByName(fresh).localCheckpoint()
    val nBatch = batch.count()

    val (admitted, tAdmit) = timed("admit")(
      TextIndex.admit(spark, batch, idxDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet)
    println(f"  admission ${nBatch / tAdmit}%.0f docs/sec over $n standing docs")
    val plantedRejected = 500 - admitted.count(_ < 3 * Shift)
    val freshAdmitted = admitted.count(_ >= 3 * Shift)
    check(s"planted near-dups rejected ≥ 99% ($plantedRejected/500)",
      plantedRejected >= 495)
    check(s"fresh docs admitted ≥ 99% ($freshAdmitted/500)",
      freshAdmitted >= 495)

    // occupancy: admission work per batch doc ∝ occupancy of its
    // 16 buckets — the number that must NOT grow with n
    val occ = spark.read.parquet(s"$idxDir/buckets")
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("c"))
      .agg(avg(col("c")), expr("percentile_approx(c, 0.99)"), max(col("c")))
      .collect().head
    val (occAvg, occP99, occMax) =
      (occ.getDouble(0), occ.getLong(1), occ.getLong(2))
    println(f"  occupancy avg=$occAvg%.2f p99=$occP99 max=$occMax")
    check(f"avg occupancy ≤ 2 (true-cluster structure only, got $occAvg%.2f)",
      occAvg <= 2.0)
    (occAvg, bytesPerDoc)
  }
}
