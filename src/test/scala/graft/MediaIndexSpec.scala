package graft

import org.apache.spark.sql.functions._

import graft.operators.MediaIndex

/** Persisted media near-dup index: incremental admission semantics on
  * planted image/audio/video blobs, append parity with a rebuild, and
  * the takedown → re-admission flow — the [[TextIndexSpec]] contract
  * over the media planes. */
class MediaIndexSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_mediaidx").toString

  /** 32×32 gray PNG from a per-pixel pattern (values 0..255);
    * `bright` shifts every pixel — aHash thresholds against the
    * image's OWN mean, so a brightness-shifted re-encode is the
    * planted perceptual twin. */
  private def png(pattern: (Int, Int) => Int, bright: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val g = math.max(0, math.min(255, pattern(x, y) + bright))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val imgHalf: (Int, Int) => Int = (x, _) => if (x < 16) 64 else 192
  private val imgChecker: (Int, Int) => Int =
    (x, y) => if (((x / 4) + (y / 4)) % 2 == 0) 64 else 192
  private val imgQuad: (Int, Int) => Int =
    (x, y) => if (x < 16 && y < 16) 192 else 64

  /** 8-bit mono PCM WAV with a per-sample amplitude envelope;
    * `scale` rescales the waveform around the 128 midpoint —
    * audioFp64's energy bits threshold against the clip's OWN mean,
    * so a volume-rescaled master is the planted audio twin. */
  private def wav(env: Int => Double, n: Int = 2048,
                  scale: Double = 1.0): Array[Byte] = {
    val header = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    header.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(n)
    val data = Array.tabulate(n)(i =>
      (128 + scale * env(i) * math.sin(i / 3.0)).toByte)
    header.array() ++ data
  }

  private val envFrontBurst: Int => Double =
    i => if (i < 512) 90.0 else 6.0
  private val envBackBurst: Int => Double =
    i => if (i >= 1536) 90.0 else 6.0

  /** Container blob (neither image nor audio → the video plane): 8
    * distinct 64-byte frames derived from a seed; `order` permutes the
    * frame sequence — the min-frame-hash key is order-invariant, so a
    * re-cut of the same frames is the planted video twin. */
  private def clip(seed: Int, order: Seq[Int] = 0 until 8): Array[Byte] =
    order.flatMap(f =>
      Array.tabulate(64)(i => ((seed * 31 + f * 7 + i) % 251).toByte)).toArray

  import org.apache.spark.sql.DataFrame
  private def blobs(rows: Seq[(Long, Array[Byte])]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "blob")
  }

  test("planted fingerprints: planes classify, twins collide, distinct media don't") {
    // guard the plants: the admission assertions below are only
    // meaningful if these hold
    def sig(b: Array[Byte]) = MediaIndex.signatureOf(b).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (pa, ha) = sig(png(imgHalf))
    val (pc, hc) = sig(png(imgChecker))
    val (pq, hq) = sig(png(imgQuad))
    assert(Seq(pa, pc, pq).forall(_ == "image"))
    assert(ham(ha, sig(png(imgHalf, bright = 30))._2) <= 6,
      "brightness-shifted re-encode must stay within Hamming tolerance")
    assert(ham(ha, hc) > 6 && ham(ha, hq) > 6 && ham(hc, hq) > 6,
      s"planted images must be distinct: ${ham(ha, hc)}/${ham(ha, hq)}/${ham(hc, hq)}")
    val (wa, hwa) = sig(wav(envFrontBurst))
    val (wb, hwb) = sig(wav(envBackBurst))
    assert(wa == "audio" && wb == "audio")
    assert(ham(hwa, sig(wav(envFrontBurst, scale = 0.5))._2) <= 6,
      "volume-rescaled master must stay within Hamming tolerance")
    assert(ham(hwa, hwb) > 6, s"distinct envelopes: ${ham(hwa, hwb)}")
    val (va, hva) = sig(clip(1))
    val (vb, hvb) = sig(clip(2))
    assert(va == "video" && vb == "video")
    assert(hva == sig(clip(1, order = Seq(5, 2, 7, 0, 3, 6, 1, 4)))._2,
      "frame-reordered cut must keep the min-frame-hash key")
    assert(hva != hvb, "distinct clips must differ")
    // and the video kernel is bit-identical to the declarative
    // frameSignatures min — the batch-twin parity pin
    val declMin = graft.operators.Multimodal
      .frameSignatures(blobs(Seq((1L, clip(1)))))
      .agg(min(col("sh"))).collect()(0).getLong(0)
    assert(hva == declMin, s"kernel $hva != declarative min $declMin")
  }

  test("admission rejects per-plane corpus twins, admits fresh media, collapses in-batch dups") {
    val corpus = blobs(Seq(
      1L -> png(imgHalf),
      2L -> wav(envFrontBurst),
      3L -> clip(1)))
    val dir = freshDir()
    MediaIndex.build(spark, corpus, dir)

    val batch = blobs(Seq(
      // per-plane twins of standing media → rejected
      100L -> png(imgHalf, bright = 30),
      101L -> wav(envFrontBurst, scale = 0.5),
      102L -> clip(1, order = Seq(7, 6, 5, 4, 3, 2, 1, 0)),
      // fresh media → admitted
      103L -> png(imgChecker),
      104L -> wav(envBackBurst),
      105L -> clip(2),
      // in-batch image twins → one representative survives
      106L -> png(imgQuad),
      107L -> png(imgQuad, bright = -20)))

    val admitted = MediaIndex.ingest(spark, batch, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!admitted.contains(100L), "image twin of standing corpus must be rejected")
    assert(!admitted.contains(101L), "audio twin must be rejected")
    assert(!admitted.contains(102L), "re-cut clip must be rejected")
    assert(admitted.contains(103L), "fresh image must be admitted")
    assert(admitted.contains(104L), "fresh audio must be admitted")
    assert(admitted.contains(105L), "fresh clip must be admitted")
    assert(admitted.intersect(Set(106L, 107L)).size == 1,
      s"in-batch twin pair must keep exactly one representative: $admitted")

    // the commit is real: the same batch fully rejects on re-ingest
    val again = MediaIndex.ingest(spark, batch, dir)
      .select("doc_id").collect()
    assert(again.isEmpty,
      s"second ingest of the same batch must be fully rejected: ${again.toSeq}")
  }

  test("build-then-append holds the same index a one-shot build over the union would") {
    val a = blobs(Seq(1L -> png(imgHalf), 2L -> wav(envFrontBurst), 3L -> clip(1)))
    val b = blobs(Seq(10L -> png(imgChecker), 11L -> wav(envBackBurst), 12L -> clip(2)))
    val incDir = freshDir()
    MediaIndex.build(spark, a, incDir)
    MediaIndex.append(spark, b, incDir)
    val fullDir = freshDir()
    MediaIndex.build(spark, a.unionByName(b), fullDir)
    def rows(dir: String) = MediaIndex.liveRows(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(rows(incDir) == rows(fullDir),
      "fingerprints are a pure function of the blob — append must equal rebuild")
  }

  test("delete: a taken-down blob stops screening, re-ingest admits, compact folds tombstones") {
    val corpus = blobs(Seq(
      1L -> png(imgHalf), 2L -> wav(envFrontBurst), 3L -> clip(1)))
    val dir = freshDir()
    MediaIndex.build(spark, corpus, dir)

    // a re-encode of standing image 1: rejected while 1 stands...
    val recrawl = blobs(Seq(300L -> png(imgHalf, bright = 10)))
    assert(MediaIndex.admit(spark, recrawl, dir).collect().isEmpty,
      "standing image must screen its own re-encode")

    // ...takedown of image 1 → the same pattern is admitted again
    MediaIndex.delete(spark, dir, Seq(1L))
    val readmitted = MediaIndex.ingest(spark, recrawl, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(readmitted == Set(300L),
      s"deleted blob must stop screening a re-ingest: $readmitted")

    // compact folds the tombstone physically; the re-admitted blob's
    // rows survive and screen the NEXT re-encode
    val (before, after) = MediaIndex.compact(spark, dir)
    assert(after <= before)
    assert(MediaIndex.status(spark, dir).liveTombstoneFiles == 0,
      "compact must clear the folded tombstone list")
    MediaIndex.vacuum(spark, dir)
    val idxDocs = spark.read.parquet(s"$dir/buckets")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!idxDocs.contains(1L), "compact must drop the deleted blob's rows")
    assert(idxDocs.contains(300L), "compact must keep the re-admitted blob")
    assert(MediaIndex.admit(spark,
      blobs(Seq(301L -> png(imgHalf, bright = -15))), dir).collect().isEmpty,
      "the re-admitted blob must screen subsequent re-encodes")
  }

  test("streaming media ingest admits the same blobs as the batch twin and grows the index") {
    val corpus = blobs(Seq(
      1L -> png(imgHalf), 2L -> wav(envFrontBurst), 3L -> clip(1)))
    val batch = blobs(Seq(
      200L -> png(imgHalf, bright = 25), // standing-image twin → reject
      201L -> clip(3),                   // fresh clip → admit
      202L -> wav(envBackBurst)))        // fresh audio → admit

    // batch twin on its own index copy (ingest mutates the index)
    val twinDir = freshDir()
    MediaIndex.build(spark, corpus, twinDir)
    val expected = MediaIndex.ingest(spark, batch, twinDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val streamDir = freshDir()
    MediaIndex.build(spark, corpus, streamDir)
    val base = freshDir()
    batch.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(batch.schema).parquet(s"$base/in")
    val q = graft.streaming.EventStreams.mediaIngestStream(
      stream, streamDir, s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$base/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"streaming admission diverged from batch twin: $got vs $expected")
    assert(got == Set(201L, 202L), s"only fresh media admit: $got")
    // the commit is real: the admitted blobs' rows are in the index
    val idxDocs = spark.read.parquet(s"$streamDir/buckets")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(idxDocs.contains(201L) && idxDocs.contains(202L),
      "admitted blobs must join the index")
  }

  test("media dedup rate counts planted fingerprint twins per plane") {
    import org.apache.spark.sql.functions.{count, countDistinct, lit}
    // 3 images (one brightness twin pair → 2 distinct), 2 identical-
    // envelope wavs at different volume (→ 1 distinct), 2 distinct clips
    val sig = MediaIndex.signaturesOf(blobs(Seq(
      1L -> png(imgHalf), 2L -> png(imgHalf, bright = 30),
      3L -> png(imgChecker),
      4L -> wav(envFrontBurst), 5L -> wav(envFrontBurst, scale = 0.5),
      6L -> clip(1), 7L -> clip(2))))
      .groupBy(col("plane"))
      .agg(count(lit(1)).as("n"), countDistinct(col("h")).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(sig("image") == (3L, 2L), s"image: ${sig("image")}")
    assert(sig("audio") == (2L, 1L), s"audio: ${sig("audio")}")
    assert(sig("video") == (2L, 2L), s"video: ${sig("video")}")
  }

  test("gate entry runs the corpus split end to end and admits only fresh media") {
    val out = MediaIndex.dedupIncrementalMedia(spark, Sf)
    val rows = out.collect()
    assert(rows.nonEmpty, "the media gate admits at least the distinct-text containers")
    // every admitted doc is from the batch half and carries a plane
    rows.foreach { r =>
      assert(r.getLong(0) % 7 == 0)
      assert(Set("image", "audio", "video").contains(r.getString(1)))
    }
  }
}
