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
    def sig1(b: Array[Byte]): (String, Long) = {
      val s = MediaIndex.signatureOf(b)
      assert(s.size == 1, s"expected a single-row signature, got $s")
      s.head
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (pa, ha) = sig1(png(imgHalf))
    val (pc, hc) = sig1(png(imgChecker))
    val (pq, hq) = sig1(png(imgQuad))
    assert(Seq(pa, pc, pq).forall(_ == "image"))
    assert(ham(ha, sig1(png(imgHalf, bright = 30))._2) <= 6,
      "brightness-shifted re-encode must stay within Hamming tolerance")
    assert(ham(ha, hc) > 6 && ham(ha, hq) > 6 && ham(hc, hq) > 6,
      s"planted images must be distinct: ${ham(ha, hc)}/${ham(ha, hq)}/${ham(hc, hq)}")
    val (wa, hwa) = sig1(wav(envFrontBurst))
    val (wb, hwb) = sig1(wav(envBackBurst))
    assert(wa == "audio" && wb == "audio")
    assert(ham(hwa, sig1(wav(envFrontBurst, scale = 0.5))._2) <= 6,
      "volume-rescaled master must stay within Hamming tolerance")
    assert(ham(hwa, hwb) > 6, s"distinct envelopes: ${ham(hwa, hwb)}")
    // video: the bottom-k frame-hash sketch (k = 4)
    val va = MediaIndex.signatureOf(clip(1))
    val vb = MediaIndex.signatureOf(clip(2))
    assert(va.forall(_._1 == "video") && va.size == MediaIndex.VideoKMins)
    assert(vb.forall(_._1 == "video") && vb.size == MediaIndex.VideoKMins)
    assert(va == MediaIndex.signatureOf(clip(1, order = Seq(5, 2, 7, 0, 3, 6, 1, 4))),
      "frame-reordered cut must keep the full k-min sketch")
    assert(va.map(_._2).toSet.intersect(vb.map(_._2).toSet).isEmpty,
      "distinct clips must share no frame minimum")
    // and the video kernel is bit-identical to the declarative
    // frameSignatures bottom-k — the batch-twin parity pin
    val declKMin = graft.operators.Multimodal
      .frameSignatures(blobs(Seq((1L, clip(1)))))
      .orderBy(col("sh")).limit(MediaIndex.VideoKMins)
      .collect().map(_.getLong(1)).toSeq
    assert(va.map(_._2) == declKMin,
      s"kernel ${va.map(_._2)} != declarative bottom-k $declKMin")
  }

  test("admission rejects per-plane corpus twins, admits fresh media, collapses in-batch dups") {
    val corpus = blobs(Seq(
      1L -> png(imgHalf),
      2L -> wav(envFrontBurst),
      3L -> clip(1)))
    val dir = freshDir()
    MediaIndex.build(spark, corpus, dir)

    // the planted TRIM: remove exactly the frame holding clip(1)'s
    // GLOBAL minimum — the single-min scheme loses its key and would
    // admit this clip; the bottom-k sketch keeps minima 2..4 (a
    // surviving j-th minimum has at most j−1 smaller survivors, so it
    // stays in the trimmed clip's bottom-k) and still collides
    val km = MediaIndex.kMinFrameHashes(clip(1))
    val minFrame = (0 until 8).find(f =>
      MediaIndex.kMinFrameHashes(clip(1, order = Seq(f)))
        .headOption.contains(km(0))).get
    val trimmed = clip(1, order = (0 until 8).filterNot(_ == minFrame))
    val kmTrim = MediaIndex.kMinFrameHashes(trimmed)
    assert(kmTrim.head != km.head, "plant guard: the global min frame is cut")
    assert(kmTrim.toSet.intersect(km.toSet).size >= 3,
      "plant guard: the surviving minima stay in the trimmed bottom-k")

    val batch = blobs(Seq(
      // per-plane twins of standing media → rejected
      100L -> png(imgHalf, bright = 30),
      101L -> wav(envFrontBurst, scale = 0.5),
      102L -> clip(1, order = Seq(7, 6, 5, 4, 3, 2, 1, 0)),
      // trimmed clip (global-min frame removed) → rejected via k-min
      108L -> trimmed,
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
    assert(!admitted.contains(108L),
      "trimmed clip must be rejected on its surviving frame minima")
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

  test("degenerate image and audio never link across planes; unsignatured blobs pass through") {
    // a flat image and a constant-amplitude clip BOTH threshold every
    // bit against their own mean with >=, so each fingerprints to
    // all-ones — identical longs in unrelated hash spaces (the
    // round-14 cross-plane hazard: mixed-plane clustering linked them
    // at Hamming 0 and silently rejected one valid blob)
    val flatImg = png((_, _) => 128)
    val constWav = {
      // every sample at the same amplitude (no sine carrier): each
      // segment mean equals the clip mean → all 64 bits set
      val n = 2048
      val header = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      header.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(8000)
        .putShort(1).putShort(8)
        .put("data".getBytes("US-ASCII")).putInt(n)
      header.array() ++ Array.fill(n)((128 + 60).toByte)
    }
    assert(MediaIndex.signatureOf(flatImg).head._2 ==
      MediaIndex.signatureOf(constWav).head._2,
      "plant guard: both planes degenerate to the same fingerprint")
    val dir = freshDir()
    MediaIndex.build(spark, blobs(Seq(1L -> png(imgChecker))), dir)
    val batch = blobs(Seq(
      10L -> flatImg, 11L -> constWav,
      // un-fingerprintable blobs: empty, and a RIFF/WAVE header with
      // no fmt chunk — no signature, so screening is vacuous and the
      // documented policy ADMITS them
      12L -> Array.empty[Byte],
      13L -> "RIFFxxxxWAVE".getBytes("US-ASCII")))
    val admitted = MediaIndex.ingest(spark, batch, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(10L, 11L, 12L, 13L),
      s"cross-plane Hamming-0 must not reject, unsignatured must admit: $admitted")
    // the unsignatured blobs contributed no index rows
    val idxDocs = MediaIndex.liveRows(spark, dir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!idxDocs.contains(12L) && !idxDocs.contains(13L))
  }

  test("an index from a different signature scheme is refused loudly") {
    val dir = freshDir()
    MediaIndex.build(spark, blobs(Seq(1L -> png(imgHalf))), dir)
    // simulate a v1-era index: same layout, pre-FormatGen generation —
    // rewrite the committed manifest's `built` line in place
    val vf = new java.io.File(s"$dir/manifest").listFiles()
      .filter(_.getName.matches("v\\d+\\.txt")).head
    val src = scala.io.Source.fromFile(vf)
    val txt = try src.mkString finally src.close()
    java.nio.file.Files.write(vf.toPath,
      txt.replaceFirst("built \\S+",
        "built " + java.util.UUID.randomUUID().toString).getBytes("UTF-8"))
    // drop the local-FS checksum sidecar the in-place rewrite broke
    new java.io.File(vf.getParentFile, s".${vf.getName}.crc").delete()
    val e = intercept[IllegalArgumentException] {
      MediaIndex.admit(spark, blobs(Seq(2L -> png(imgChecker))), dir).collect()
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
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
    import org.apache.spark.sql.functions.{array_sort, collect_list, concat_ws,
      count, countDistinct, lit, transform, xxhash64}
    import org.apache.spark.sql.types.StringType
    // 3 images (one brightness twin pair → 2 distinct), 2 identical-
    // envelope wavs at different volume (→ 1 distinct), 2 distinct
    // clips (whole bottom-k SET is the fingerprint — a re-cut twin
    // would hash equal, a distinct clip can't)
    val sig = MediaIndex.signaturesOf(blobs(Seq(
      1L -> png(imgHalf), 2L -> png(imgHalf, bright = 30),
      3L -> png(imgChecker),
      4L -> wav(envFrontBurst), 5L -> wav(envFrontBurst, scale = 0.5),
      6L -> clip(1), 7L -> clip(2), 8L -> clip(1, order = Seq(3, 1, 0, 2, 7, 5, 6, 4)))))
      .groupBy(col("doc_id"), col("plane"))
      .agg(xxhash64(concat_ws(",",
        transform(array_sort(collect_list(col("h"))),
          h => h.cast(StringType)))).as("fp"))
      .groupBy(col("plane"))
      .agg(count(lit(1)).as("n"), countDistinct(col("fp")).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(sig("image") == (3L, 2L), s"image: ${sig("image")}")
    assert(sig("audio") == (2L, 1L), s"audio: ${sig("audio")}")
    assert(sig("video") == (3L, 2L), s"video: ${sig("video")}")
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
    // the per-JVM gate index rolls back its own append between calls:
    // a second run is byte-identical (and skips the corpus build)
    val again = MediaIndex.dedupIncrementalMedia(spark, Sf).collect()
    assert(again.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      rows.map(r => (r.getLong(0), r.getString(1))).toSeq,
      "repeat gate calls must admit the identical set")
  }
}
