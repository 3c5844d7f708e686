package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: materialize an N×-scaled copy of a testdata dir with
  * referentially-consistent keys (every foreign key shifts by the same
  * per-copy offset as its primary key), so the full bench suite runs
  * unmodified at 10× — the empirical "survives a scale-up" check.
  * Fixed-size dims (region, nation) stay as-is, like TPC-H.
  * `sbt "runMain graft.tools.MakeScale [factor] [srcDir] [outDir]"`. */
object MakeScale {

  /** Scaled-corpus format tag, bumped whenever the cloning/salting
    * semantics change — [[ensureScaled]] regenerates a dir whose
    * marker does not match, so a stale pre-salt-fix corpus (whose
    * quadratic near-dup families round 17 had to flush out twice)
    * can never leak into a bench leg. */
  val FormatTag = "makescale-v4-prefix-salt"

  private def markerPath(out: String) =
    java.nio.file.Paths.get(out, "_graft_scale_format.txt")

  /** Generate `out` from `src` at `factor`x unless a complete
    * generation with the CURRENT format tag is already there. */
  def ensureScaled(spark: SparkSession, factor: Int, src: String,
                   out: String): Unit = {
    val marker = markerPath(out)
    val want = s"$FormatTag factor=$factor src=$src"
    val have =
      if (java.nio.file.Files.exists(marker))
        new String(java.nio.file.Files.readAllBytes(marker), "UTF-8").trim
      else ""
    if (have == want) return
    val dir = new java.io.File(out)
    if (dir.exists()) {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(); ()
      }
      del(dir)
    }
    scale(spark, factor, src, out)
    // invariant gate (round 19): a corpus whose salt scheme regressed
    // (v3-style trigram collapse / cross-copy shingle sharing) fails
    // HERE, before the marker is written — never in a bench leg a
    // round later. A failed check leaves no marker, so the next call
    // regenerates rather than trusting a half-validated dir.
    ScaleCheck.check(spark, src, out, factor)
    java.nio.file.Files.createDirectories(marker.getParent)
    java.nio.file.Files.write(marker, (want + "\n").getBytes("UTF-8"))
    ()
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(2).getOrElse("/tmp/sf1")
    val spark = graft.GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    scale(spark, factor, src, out)
    ScaleCheck.check(spark, src, out, factor)
    java.nio.file.Files.createDirectories(markerPath(out).getParent)
    java.nio.file.Files.write(markerPath(out),
      (s"$FormatTag factor=$factor src=$src\n").getBytes("UTF-8"))
    spark.stop()
  }

  def scale(spark: SparkSession, factor: Int, src: String,
            out: String): Unit = {
    val shift = 100000000L
    def rep(name: String, keyCols: Seq[String])(extra: DataFrame => DataFrame = identity): Unit = {
      // go through the schema-aware loaders (events needs the
      // TIMESTAMP(NANOS) fix; the rest are plain reads)
      val df = if (name == "events") graft.Tables.events(spark, src)
               else spark.read.parquet(s"$src/$name.parquet")
      val copies = spark.range(factor).select(col("id").as("_copy"))
      val scaled = extra(keyCols.foldLeft(df.crossJoin(copies)) { (d, k) =>
        d.withColumn(k, col(k) + col("_copy") * shift)
      }).drop("_copy")
      // the broadcast-NLJ replication collapses to ~1 output partition —
      // written as one giant row group a scan can't split. Spread across
      // the cores so scan parallelism at bench time matches a real
      // multi-file table.
      scaled.repartition(32)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"$name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    rep("customer", Seq("c_custkey"))()
    rep("supplier", Seq("s_suppkey"))()
    rep("part", Seq("p_partkey"))()
    rep("orders", Seq("o_orderkey", "o_custkey"))()
    rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))()
    rep("events", Seq("event_id", "user_id"))()
    // salt cloned text THROUGHOUT, not just at the end: an appended
    // suffix leaves the clone families near-identical in SHINGLE space
    // (trailing n-grams differ, the rest collide), so at factor 100
    // every base doc became a 100-member near-dup family and the pair
    // operators' output grew quadratically BY CONSTRUCTION — measured
    // as dedup_minhash_lsh 1.4 s → 29 s at the first sf10 leg while
    // the cluster collapse (whose output is linear) scaled 2.2×.
    // Tagging every 3rd word with a copy key removes essentially all
    // cross-copy 3-gram sharing (a 3-token window crosses a tagged
    // position — except the tail: the regex needs a trailing space, so
    // each doc's final word group escapes tagging and copies may still
    // share ~1 trailing trigram, Jaccard ~1/n, far under every
    // pairing threshold — ScaleCheck measures the realized density
    // rather than trusting this argument). So a scaled corpus has
    // scale-independent near-dup density — "N× more independent
    // docs", which is what a scale leg is supposed to measure. The
    // doc_id suffix stays so small (<3-word) docs are not byte-equal.
    //
    // v4: PREFIX the 3rd word with the copy key ($1 s<c>x$2) instead
    // of replacing it with the per-copy CONSTANT s<c> (v3). The
    // constant collapsed every trigram "A B *" to "A B s<c>" — i.e.
    // per-copy trigrams degraded to BIGRAMS, whose document
    // frequencies are an order of magnitude denser: measured Σ df² in
    // the SSJoin band [2,256] went 2.8 M (sf0.1) → 224 M at sf1 (80×
    // for 10× data), and at sf10 the n-gram pair family's candidate
    // join spilled >70 GB and died on disk. Prefixing preserves each
    // trigram's full identity (distinct trigrams stay distinct; family
    // members sharing "A B C" still share "A B s<c>xC"), so every
    // copy's df distribution equals the base corpus' — candidate mass
    // scales linearly with copies. v3's REPLACE-not-insert rationale
    // still holds: token counts stay exactly equal (bytes +~7%).
    rep("documents", Seq("doc_id"))(d =>
      d.withColumn("text",
        when(col("_copy") === 0, col("text"))
          .otherwise(concat(
            regexp_replace(col("text"), lit("(\\S+ \\S+ )(\\S+) "),
              concat(lit("$1s"), col("_copy").cast("string"), lit("x$2 "))),
            lit(" salt"), col("doc_id")))))
    rep("embeddings", Seq("vec_id"))()
  }
}
