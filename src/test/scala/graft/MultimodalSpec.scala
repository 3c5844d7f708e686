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

  /** A genuine PNG rendered in-memory: 48×32, left half black, right
    * half white — known dimensions and a known luminance split. */
  private def realPng(w: Int = 48, h: Int = 32): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG bytes decode to true dimensions and luminance histogram") {
    val (fmt, w, h, feat) = Multimodal.ImageDecoder.decode(realPng())
    assert((fmt, w, h) == ("png", 48, 32))
    assert(feat.length == 8)
    assert(math.abs(feat.sum - 1.0f) < 1e-3)
    // half black (bin 0), half white (bin 7)
    assert(math.abs(feat(0) - 0.5f) < 0.05f && math.abs(feat(7) - 0.5f) < 0.05f)
  }

  test("real PNG decodes through the distributed pipeline; junk falls back to stub") {
    import spark.implicits._
    val blobs = Seq((1L, realPng()), (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "blob")
    val out = Multimodal.decodeFeatures(spark, blobs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "png")
    assert(out(1L).getInt(2) == 48 && out(1L).getInt(3) == 32)
    // junk blob: sniff fails → deterministic stub, same schema
    val (sf, sw, sh, _) = Multimodal.StubDecoder.decode("not an image".getBytes("UTF-8"))
    assert(out(2L).getString(1) == sf)
    assert(out(2L).getInt(2) == sw && out(2L).getInt(3) == sh)
  }

  test("real WAV bytes parse to true sample rate and channels; truncated WAV falls back") {
    // build a genuine 44.1kHz stereo PCM WAV header + 100 data bytes
    val n = 100
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(44100 * 4)
      .putShort(4).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n)
    val wav = bb.array() ++ Array.fill(n)(0x40.toByte)
    val (fmt, rate, ch, feat) = Multimodal.WavDecoder.decode(wav)
    assert((fmt, rate, ch) == (("wav", 44100, 2)), s"$fmt $rate $ch")
    assert(feat.length == 8 && math.abs(feat.sum - 1.0f) < 1e-3)
    assert(feat(2) == 1.0f, "all samples are 0x40 -> bin 2")
    // a data chunk claiming more bytes than the blob has must not read
    // out of bounds - falls back to the stub
    val bad = wav.take(50)
    val (bf, _, _, _) = Multimodal.WavDecoder.decode(bad)
    assert(bf.startsWith("stub_") || bf == "empty", bf)
  }

  test("feature resize halves bins and preserves mass") {
    val docs = Tables.documents(spark, Sf).limit(50)
    val feats = Multimodal.decodeFeatures(spark, Multimodal.withBlobs(docs))
    val resized = Multimodal.resizeFeatures(feats, 4)
      .select(col("doc_id"), col("features"))
    resized.collect().foreach { r =>
      val f = r.getSeq[Float](1)
      assert(f.length == 4)
      assert(math.abs(f.sum - 1.0f) < 1e-3, "histogram mass must survive resize")
    }
  }

  test("frame sampling yields strided frame rows with features") {
    val docs = Tables.documents(spark, Sf).limit(20)
    val frames = Multimodal.sampleFrames(spark, Multimodal.withBlobs(docs))
    assert(frames.columns.toSeq == Seq("doc_id", "frame_idx", "format", "features"))
    val idx = frames.select("frame_idx").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(idx.headOption.contains(0))
    assert(idx.forall(_ % 4 == 0), "stride must be respected")
    assert(frames.count() >= docs.count(), "every doc yields >= 1 frame")
  }

  /** Render a PNG from a per-pixel color function — block-aligned
    * 64×64 so the 8×8 aHash grid is exact under 90° rotation. */
  private def png(f: (Int, Int) => Int, w: Int = 64, h: Int = 64): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("perceptual hash: rotation/re-encode/brightness invariant, distinct images far apart") {
    def hashOf(blob: Array[Byte]): Long =
      Multimodal.ImageDecoder.decodeImage(blob) match {
        case Some((_, img)) => Multimodal.ImageDecoder.aHash64(img)
        case None => fail("planted PNG failed to decode")
      }
    val a = hashOf(png((x, _) => if (x < 32) 0x000000 else 0xffffff))
    // the same image rotated 90° (vertical split → horizontal split),
    // independently re-encoded through ImageIO
    val aRot = hashOf(png((_, y) => if (y < 32) 0x000000 else 0xffffff))
    // brightness-compressed copy: dark gray / light gray — aHash
    // thresholds against the image's own mean, so bits are identical
    val aDim = hashOf(png((x, _) => if (x < 32) 0x202020 else 0xe0e0e0))
    // downscaled copy: the block grid normalizes resolution away
    val aSmall = hashOf(png((x, _) => if (x < 16) 0x000000 else 0xffffff, 32, 32))
    val b = hashOf(png((x, y) => if (x + y < 64) 0x000000 else 0xffffff))
    assert(a == aRot, f"rotation changed the canonical hash: $a%016x vs $aRot%016x")
    assert(a == aDim, f"brightness shift changed the hash: $a%016x vs $aDim%016x")
    assert(a == aSmall, f"downscale changed the hash: $a%016x vs $aSmall%016x")
    val d = java.lang.Long.bitCount(a ^ b)
    assert(d > 6, f"distinct images too close: hamming $d ($a%016x vs $b%016x)")
  }

  test("image near-dup clusters collapse planted twins, never distinct images") {
    import spark.implicits._
    val blobs = Seq(
      (1L, png((x, _) => if (x < 32) 0x000000 else 0xffffff)),
      (2L, png((_, y) => if (y < 32) 0x000000 else 0xffffff)), // 90° twin
      (3L, png((x, _) => if (x < 32) 0x202020 else 0xe0e0e0)), // dim twin
      (4L, png((x, y) => if (x + y < 64) 0x000000 else 0xffffff)), // distinct
      (5L, "not an image at all".getBytes("UTF-8"))
    ).toDF("doc_id", "blob")
    val ph = Multimodal.imagePhashes(blobs)
    val hashes = ph.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L, 4L),
      s"non-image must yield no phash: ${hashes.keySet}")
    val comps = graft.operators.Components.connectedComponents(
        graft.operators.Dedup.hamming64StarEdges(ph, "doc_id", "phash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.get(1L).contains(1L) && comps.get(2L).contains(1L) &&
      comps.get(3L).contains(1L),
      s"rotated/re-encoded/dimmed twins must co-cluster: $comps")
    assert(!comps.contains(4L), s"distinct image must not cluster: $comps")
  }

  /** Genuine 8 kHz mono 8-bit PCM WAV whose sample i is `f(i)`. */
  private def wav(n: Int)(f: Int => Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(n)
    bb.array() ++ Array.tabulate(n)(i => f(i).toByte)
  }

  test("audio fingerprint: volume-invariant, contour-sensitive; clusters collapse twins") {
    import spark.implicits._
    // burst envelope: loud in even 1024-sample blocks, quiet in odd —
    // 64 segments of 1024 samples, alternating energy
    val n = 65536
    def burst(amp: Int)(i: Int): Int = {
      val a = if ((i / 1024) % 2 == 0) amp else amp / 10
      128 + (a * math.sin(i / 3.0)).toInt
    }
    val a = Multimodal.audioFp64(wav(n)(burst(100)))
    val aQuiet = Multimodal.audioFp64(wav(n)(burst(40)))      // re-mastered
    val b = Multimodal.audioFp64(wav(n)(i => burst(100)(i + 1024))) // opposite contour
    assert(a.isDefined && aQuiet.isDefined && b.isDefined)
    assert(a == aQuiet,
      f"volume rescale changed the fingerprint: ${a.get}%016x vs ${aQuiet.get}%016x")
    val d = java.lang.Long.bitCount(a.get ^ b.get)
    assert(d > 6, f"opposite burst contour too close: hamming $d")
    assert(Multimodal.audioFp64("not audio".getBytes("UTF-8")).isEmpty)
    // end-to-end: twins co-cluster, the opposite-contour clip doesn't
    val blobs = Seq(
      (1L, wav(n)(burst(100))), (2L, wav(n)(burst(40))),
      (3L, wav(n)(i => burst(100)(i + 1024))),
      (4L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "blob")
    val fp = Multimodal.audioFingerprints(blobs)
    assert(fp.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    val comps = graft.operators.Components.connectedComponents(
        graft.operators.Dedup.hamming64StarEdges(fp, "doc_id", "afp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.get(1L).contains(1L) && comps.get(2L).contains(1L),
      s"re-mastered twin must co-cluster: $comps")
    assert(!comps.contains(3L), s"distinct contour must not cluster: $comps")
  }

  /** Genuine 16-bit mono PCM WAV whose signed sample i is `f(i)`;
    * `fmtTag` ≠ 1 renders the same layout under a non-PCM format tag. */
  private def wav16(n: Int, fmtTag: Short = 1, bits: Short = 16)
                   (f: Int => Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmtTag).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(bits)
      .put("data".getBytes("US-ASCII")).putInt(2 * n)
    var i = 0
    while (i < n) { bb.putShort(f(i).toShort); i += 1 }
    bb.array()
  }

  test("audio fingerprint parses the fmt chunk: 16-bit PCM decodes as shorts, non-PCM is None") {
    val n = 8192
    def burst(amp: Int)(i: Int): Int =
      if ((i / 1024) % 2 == 0) (amp * math.sin(i / 10.0)).toInt else amp / 20
    // 16-bit re-master at a different volume: same envelope bits — this
    // is exactly what byte-wise reading of interleaved lo/hi bytes broke
    val a = Multimodal.audioFp64(wav16(n)(burst(20000)))
    val aQuiet = Multimodal.audioFp64(wav16(n)(burst(4000)))
    assert(a.isDefined && aQuiet.isDefined)
    assert(a == aQuiet,
      f"16-bit volume rescale changed the fp: ${a.get}%016x vs ${aQuiet.get}%016x")
    // the same waveform SHAPE at 8 vs 16 bit agrees on the envelope
    val a8 = Multimodal.audioFp64(wav(n)(i => 128 + burst(100)(i)))
    assert(a8.isDefined && a == a8,
      f"8/16-bit renders of one waveform disagree: ${a.get}%016x vs ${a8.get}%016x")
    // non-integer-PCM (float tag 3) and 24-bit widths must yield None,
    // not a garbage fingerprint
    assert(Multimodal.audioFp64(wav16(n, fmtTag = 3)(burst(20000))).isEmpty,
      "float-PCM WAV must not fingerprint")
    assert(Multimodal.audioFp64(wav16(n, bits = 24)(burst(20000))).isEmpty,
      "24-bit WAV must not fingerprint")
  }

  test("frame containment: a trimmed clip is contained in its extension, codegen-only slicing") {
    import spark.implicits._
    val rng = new scala.util.Random(21)
    val a = Array.fill(256)(rng.nextInt().toByte)   // 4 frames of 64
    val ext = a ++ Array.fill(128)(rng.nextInt().toByte) // + 2 frames
    val c = Array.fill(256)(rng.nextInt().toByte)   // distinct
    val blobs = Seq((1L, a), (2L, ext), (3L, c)).toDF("doc_id", "blob")
    val sigs = Multimodal.frameSignatures(blobs)
    // declarative slicing: the plan must carry no UDF / mapPartitions
    val plan = sigs.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF") && !plan.contains("MapPartitions"),
      s"frame slicing left codegen:\n$plan")
    val pairs = graft.operators.Dedup.containmentOver(sigs, 0.8, 256L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 0.999),
      s"trim must be contained in its extension: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"distinct blob must not pair: ${pairs.toSeq}")
  }

  test("dedup_image_phash gate output clusters the corpus' flat PNGs deterministically") {
    // withBlobs gives every 5th doc a flat gray PNG; flat images are
    // perceptually identical (aHash is brightness-invariant), so the
    // operator must put ALL of them in one cluster — a stable rows-only
    // gate shape, and a mega-bucket stress for the star-edge path
    val out = graft.operators.Multimodal.dedupImagePhash(spark, Sf)
    val nPng = Tables.documents(spark, Sf)
      .where(col("doc_id") % 5 === 0).count()
    assert(out.count() == nPng, s"expected all $nPng PNGs clustered")
    assert(out.select("comp").distinct().count() == 1)
  }

  test("mm_pipeline aggregates stay consistent with the corpus") {
    val out = Multimodal.mmPipeline(spark, Sf)
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, Sf).count())
    // every 5th doc carries a genuine PNG → the gate output must show
    // the real javax.imageio decode path ran, not just the stub
    val byFormat = out.groupBy("format").agg(sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFormat.contains("png"), s"no real-decode rows: $byFormat")
    val expected = Tables.documents(spark, Sf)
      .where(col("doc_id") % 5 === 0).count()
    assert(byFormat("png") == expected)
  }

  test("blob exact dedup: byte-identical re-uploads collapse to the min id") {
    import spark.implicits._
    val b1 = Array[Byte](1, 2, 3, 4, 5)
    val b2 = Array[Byte](9, 9, 9)
    val blobs = Seq(
      (10L, b1), (11L, b1.clone()),  // byte-identical pair
      (12L, b2),                     // distinct
      (13L, Array[Byte](1, 2, 3))    // prefix of b1 — must NOT collapse
    ).toDF("doc_id", "blob")
    val out = graft.operators.Multimodal.blobExact(blobs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out == Map(10L -> (5, 2L), 12L -> (3, 1L), 13L -> (3, 1L)),
      out.toString)
  }
}
