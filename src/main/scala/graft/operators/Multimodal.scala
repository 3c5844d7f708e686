package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** Multimodal-column pipeline plumbing (SURVEY.md §2.C).
  *
  * Media blobs are opaque `binary` columns travelling next to typed
  * metadata; decode / feature-extraction runs per-partition in batches
  * (the JVM analogue of `mapInPandas` batch shape). Formats the JDK can
  * decode (PNG/JPEG/GIF/BMP via `javax.imageio`, sniffed by magic bytes)
  * are decoded for real — true dimensions + an 8-bin luminance
  * histogram; everything else (webp/video — no codecs in this
  * environment) falls back to `StubDecoder`, a clearly-marked
  * deterministic fake, so the plumbing contract is identical either way.
  *
  * Scale notes: decode is map-only over the scan — no shuffle; blobs
  * never shuffle at all (features are orders of magnitude smaller, and
  * only they flow downstream). Batch iteration amortizes per-record
  * overhead exactly like Arrow batches do for pandas UDFs.
  */
object Multimodal {

  val BatchSize = 64

  /** STUB: stands in for a real image/audio decoder (libjpeg, ffmpeg…).
    * Deterministic: "decodes" a blob into (format, width, height) pulled
    * from a fake header plus an 8-bin byte histogram as the feature
    * vector. Swap this object for a real codec binding in production. */
  object StubDecoder {
    def decode(blob: Array[Byte]): (String, Int, Int, Array[Float]) = {
      // stub_ prefix: fake formats must never collide with the real
      // decoder's labels, or gate counts mix the two paths
      val fmt = if (blob.isEmpty) "empty" else (blob(0) & 3) match {
        case 0 => "stub_jpeg"; case 1 => "stub_png"
        case 2 => "stub_webp"; case _ => "stub_tiff"
      }
      val w = 64 + (if (blob.length > 1) (blob(1) & 0x7f) else 0)
      val h = 64 + (if (blob.length > 2) (blob(2) & 0x7f) else 0)
      val hist = new Array[Float](8)
      var i = 0
      while (i < blob.length) { hist((blob(i) & 0xff) >> 5) += 1f; i += 1 }
      if (blob.nonEmpty) { var j = 0; while (j < 8) { hist(j) /= blob.length; j += 1 } }
      (fmt, w, h, hist)
    }
  }

  /** Real decoder for JDK-supported image formats. Magic-byte sniff
    * first (never feed ImageIO arbitrary bytes), then
    * `javax.imageio.ImageIO.read` for true dimensions and an 8-bin
    * luminance histogram sampled on a ≤64×64 grid (bounded work per blob
    * regardless of image size). Undecodable or non-image blobs fall back
    * to StubDecoder so the pipeline never throws on a bad record —
    * production behavior for a 100 TB corpus with corrupt files. */
  object ImageDecoder {
    def sniff(blob: Array[Byte]): Option[String] = {
      def at(i: Int) = if (i < blob.length) blob(i) & 0xff else -1
      if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') Some("png")
      else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) Some("jpeg")
      else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') Some("gif")
      else if (at(0) == 'B' && at(1) == 'M') Some("bmp")
      else None
    }

    /** Dimension ceiling read from the header BEFORE pixel allocation:
      * a decompression-bomb blob declaring 40000×40000 would otherwise
      * make ImageIO allocate gigabytes and throw OutOfMemoryError — an
      * Error the fallback catch can't (and shouldn't) swallow. 64 M px
      * ≈ 256 MB ARGB, a sane per-record bound. */
    val MaxPixels = 64L * 1024 * 1024

    /** Sniff + bounded ImageIO read; None for non-images, undecodable
      * blobs, and decompression bombs — shared by the feature decode
      * below and the perceptual-hash path ([[imagePhashes]]). */
    def decodeImage(blob: Array[Byte]): Option[(String, java.awt.image.BufferedImage)] =
      sniff(blob).flatMap { fmt =>
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(blob))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return None
          val reader = readers.next()
          val img =
            try {
              reader.setInput(iis)
              val (hw, hh) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
              if (hw * hh > MaxPixels) return None
              reader.read(0)
            } finally { reader.dispose(); iis.close() }
          Option(img).map(fmt -> _)
        } catch { case _: Exception => None }
      }

    def decode(blob: Array[Byte]): (String, Int, Int, Array[Float]) =
      decodeImage(blob) match {
        case Some((fmt, img)) =>
          val (w, h) = (img.getWidth, img.getHeight)
          val hist = new Array[Float](8)
          val (sx, sy) = (math.max(w / 64, 1), math.max(h / 64, 1))
          var n = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 +
                ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              hist(lum >> 5) += 1f
              n += 1
              x += sx
            }
            y += sy
          }
          var j = 0
          while (j < 8) { hist(j) /= n; j += 1 }
          (fmt, w, h, hist)
        case None => StubDecoder.decode(blob)
      }

    /** 64-bit rotation-canonical average hash (aHash) — the perceptual
      * image fingerprint behind near-dup IMAGE dedup. Mean luminance on
      * an 8×8 block grid (block sums sampled with a bounded stride, so
      * work per image is O(1) regardless of resolution); bit k = block k
      * ≥ grid mean. Brightness/contrast shifts and re-encoding preserve
      * the bits (aHash thresholds against the image's OWN mean); 90°
      * rotations permute the grid, so the canonical hash is the
      * unsigned-min over the 4 rotation variants — a rotated re-encode
      * maps to the SAME 64 bits (exactly, when dims are block-aligned;
      * within Hamming tolerance otherwise). */
    def aHash64(img: java.awt.image.BufferedImage): Long = {
      val w = img.getWidth
      val h = img.getHeight
      val lum = Array.ofDim[Double](8, 8)
      var j = 0
      while (j < 8) {
        var i = 0
        while (i < 8) {
          val x0 = i * w / 8; val x1 = math.max((i + 1) * w / 8, x0 + 1)
          val y0 = j * h / 8; val y1 = math.max((j + 1) * h / 8, y0 + 1)
          val sx = math.max((x1 - x0) / 8, 1)
          val sy = math.max((y1 - y0) / 8, 1)
          var s = 0L
          var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              s += (((rgb >> 16) & 0xff) * 299 +
                ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              n += 1
              x += sx
            }
            y += sy
          }
          lum(j)(i) = s.toDouble / n
          i += 1
        }
        j += 1
      }
      var mean = 0.0
      var r = 0
      while (r < 8) { var c = 0; while (c < 8) { mean += lum(r)(c); c += 1 }; r += 1 }
      mean /= 64
      def hashOf(cell: (Int, Int) => Double): Long = {
        var bits = 0L
        var k = 0
        while (k < 64) {
          if (cell(k / 8, k % 8) >= mean) bits |= (1L << k)
          k += 1
        }
        bits
      }
      // the 4 rotations form a cyclic group on the grid: whichever
      // orientation arrives, the variant SET is identical, so the
      // unsigned min is orientation-invariant
      Seq(
        hashOf((r, c) => lum(r)(c)),
        hashOf((r, c) => lum(7 - c)(r)),
        hashOf((r, c) => lum(7 - r)(7 - c)),
        hashOf((r, c) => lum(c)(7 - r)))
        .reduce((a, b) => if (java.lang.Long.compareUnsigned(a, b) <= 0) a else b)
    }
  }

  /** Real decoder for WAV audio — pure RIFF chunk-walk, no codec needed
    * (PCM WAV metadata is a fixed little-endian header, and parsing it
    * ourselves avoids JDK service-loader lookups inside executor
    * threads). Emits the generic media tuple with the documented audio
    * mapping: width := sample rate (Hz), height := channels; features =
    * 8-bin amplitude histogram over a bounded prefix of the data chunk.
    * Malformed blobs fall back to StubDecoder, same policy as images. */
  object WavDecoder {
    private def le16(b: Array[Byte], i: Int) =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int) =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

    def sniffs(blob: Array[Byte]): Boolean =
      blob.length >= 12 && blob(0) == 'R' && blob(1) == 'I' &&
        blob(2) == 'F' && blob(3) == 'F' && blob(8) == 'W' &&
        blob(9) == 'A' && blob(10) == 'V' && blob(11) == 'E'

    /** (offset, length) of the PCM data chunk — the bounds-checked RIFF
      * walk shared by the metadata decode and [[audioFp64]]. None for
      * malformed chunks (a data length past the blob end must never
      * read out of bounds). */
    def dataChunk(blob: Array[Byte]): Option[(Int, Int)] = {
      if (!sniffs(blob)) return None
      var i = 12
      while (i + 8 <= blob.length) {
        val id = new String(blob.slice(i, i + 4), "US-ASCII")
        val len = le32(blob, i + 4)
        if (len < 0 || i.toLong + 8 + len > blob.length) return None
        if (id == "data") return Some((i + 8, len))
        i += 8 + len + (len & 1)
      }
      None
    }

    /** (audioFormat, channels, rate, bitsPerSample) from the fmt chunk
      * — None when absent or malformed. audioFormat 1 = integer PCM;
      * anything else (float, ADPCM, compressed) has a sample layout
      * the byte-level walks here must NOT guess at. */
    def fmtChunk(blob: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (!sniffs(blob)) return None
      var i = 12
      while (i + 8 <= blob.length) {
        val id = new String(blob.slice(i, i + 4), "US-ASCII")
        val len = le32(blob, i + 4)
        if (len < 0 || i.toLong + 8 + len > blob.length) return None
        if (id == "fmt " && len >= 16)
          return Some((le16(blob, i + 8), le16(blob, i + 10),
            le32(blob, i + 12), le16(blob, i + 22)))
        i += 8 + len + (len & 1)
      }
      None
    }

    def decode(blob: Array[Byte]): (String, Int, Int, Array[Float]) = {
      if (!sniffs(blob)) return StubDecoder.decode(blob)
      var i = 12
      var rate = -1; var channels = -1
      var dataOff = -1; var dataLen = -1
      while (i + 8 <= blob.length && (rate < 0 || dataOff < 0)) {
        val id = new String(blob.slice(i, i + 4), "US-ASCII")
        val len = le32(blob, i + 4)
        if (len < 0 || i.toLong + 8 + len > blob.length) return StubDecoder.decode(blob)
        if (id == "fmt " && len >= 16) {
          channels = le16(blob, i + 10)
          rate = le32(blob, i + 12)
        } else if (id == "data") { dataOff = i + 8; dataLen = len }
        i += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (rate <= 0 || channels <= 0 || dataOff < 0) return StubDecoder.decode(blob)
      val hist = new Array[Float](8)
      val n = math.min(dataLen, 65536)
      var j = 0
      while (j < n) { hist((blob(dataOff + j) & 0xff) >> 5) += 1f; j += 1 }
      if (n > 0) { var k = 0; while (k < 8) { hist(k) /= n; k += 1 } }
      ("wav", rate, channels, hist)
    }
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Attach a synthetic binary "media" column — in production this is a
    * `binary` parquet column read straight off the scan. Every 5th doc
    * gets a GENUINE PNG (rendered deterministically from doc_id, so the
    * gate output exercises the real javax.imageio decode path); the rest
    * carry utf-8 text bytes that sniff as non-image and take the stub
    * fallback — both branches of the decoder run on every gate pass.
    * (A UDF is fine here: blob synthesis is corpus scaffolding, not an
    * engine operator.)
    *
    * Round 19 (guide §2.5/§2.6): the thin doc rows REPARTITION to the
    * session's default parallelism BEFORE blobs are synthesized — the
    * small single-file documents scan otherwise yields ONE partition,
    * and every downstream media kernel (render, imageio/RIFF decode,
    * fingerprint) ran single-task while the rest of the box idled.
    * Hash-partitioned on doc_id (deterministic under task retry, no
    * round-robin sort); the shuffle moves doc rows, never blob bytes.
    * Production blob tables arrive with real file parallelism and a
    * `binary` column straight off the scan — this spread is part of
    * the synthesis scaffolding, not the operator. */
  def withBlobs(docs: DataFrame): DataFrame = {
    val parallelism = docs.sparkSession.sparkContext.defaultParallelism
    // round 20 (verdict r19 ask #2): gate the spread on the INPUT's
    // partition count — an already-parallel table (production blob
    // scans, pre-spread batches) must not pay an unconditional shuffle
    // for a spread it does not need; only the single-file/tiny-batch
    // case (fewer partitions than cores) repartitions.
    val spread =
      if (docs.rdd.getNumPartitions < parallelism)
        docs.repartition(parallelism, col("doc_id"))
      else docs
    val renderPng = udf { (id: Long) =>
      val w = 16 + (id % 16).toInt
      val img = new java.awt.image.BufferedImage(
        w, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = (id % 256).toInt
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // genuine 8 kHz mono PCM WAV, one sine-ish period per id — so the
    // gate also exercises the real RIFF parse path
    val renderWav = udf { (id: Long) =>
      val rate = 8000
      val n = 256 + (id % 64).toInt
      val header = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      header.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate).putInt(rate)
        .putShort(1).putShort(8)
        .put("data".getBytes("US-ASCII")).putInt(n)
      val data = Array.tabulate(n)(i =>
        (128 + 100 * math.sin((i + id) / 10.0)).toByte)
      header.array() ++ data
    }
    spread.select(col("doc_id"),
      when(col("doc_id") % 5 === 0, renderPng(col("doc_id")))
        .when(col("doc_id") % 5 === 1, renderWav(col("doc_id")))
        .otherwise(encode(col("text"), "UTF-8")).as("blob"))
  }

  /** Batched per-partition decode: binary blob → typed metadata +
    * feature vector. mapPartitions + grouped iterator = the JVM shape of
    * a batched pandas UDF; rows stream through in BatchSize chunks. */
  def decodeFeatures(spark: SparkSession, blobs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    blobs.select(col("doc_id").cast(LongType), col("blob"))
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val blob = r.getAs[Array[Byte]](1)
            val (fmt, w, h, feat) =
              if (WavDecoder.sniffs(blob)) WavDecoder.decode(blob)
              else ImageDecoder.decode(blob)
            Row(id, fmt, w, h, blob.length, feat.toSeq)
          }
        }
      }(enc)
  }

  /** STUB resize: downsample the 8-bin feature histogram to `bins` by
    * summing adjacent bins — stands in for image resampling; the real
    * thing swaps the arithmetic, not the plumbing. */
  def resizeFeatures(feats: DataFrame, bins: Int): DataFrame = {
    require(8 % bins == 0, s"bins must divide 8, got $bins")
    val g = 8 / bins
    feats.withColumn("features",
      expr(s"transform(sequence(0, ${bins - 1}), i -> " +
        s"aggregate(slice(features, i * $g + 1, $g), 0F, (a, x) -> a + x))"))
  }

  /** STUB frame sampling: treat the blob as a container and decode
    * every `stride`-th fixed-size chunk as a "frame" — the plumbing
    * (explode to frame rows, per-frame features, frame_idx key) is the
    * real video shape; only the chunking rule is fake. */
  def sampleFrames(spark: SparkSession, blobs: DataFrame,
                   frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    blobs.select(col("doc_id").cast(LongType), col("blob"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          val nFrames = math.max(blob.length / frameBytes, 1)
          (0 until nFrames by stride).iterator.map { f =>
            val from = math.min(f * frameBytes, math.max(blob.length - 1, 0))
            val until = math.min(from + frameBytes, blob.length)
            val (fmt, _, _, feat) = StubDecoder.decode(blob.slice(from, until))
            Row(id, f, fmt, feat.toSeq)
          }
        }
      }(enc)
  }

  /** 64-bit energy-envelope fingerprint for PCM WAV audio — the audio
    * twin of [[ImageDecoder.aHash64]]. The bounded data-chunk prefix
    * (≤64 Ki samples) splits into 64 equal segments; per segment, mean
    * absolute deviation from the 8-bit midpoint (128) measures local
    * energy; bit k = segment k's energy ≥ the envelope mean. Amplitude
    * scaling multiplies every segment's energy by the same factor, so
    * the bits — thresholded against the clip's OWN mean — survive
    * re-mastering at a different volume, while a different loudness
    * CONTOUR (speech vs music, a different burst pattern) flips many
    * bits. Sample layout comes from the fmt chunk, not a guess:
    * 8-bit integer PCM reads unsigned bytes off midpoint 128, 16-bit
    * reads little-endian signed shorts off midpoint 0 — treating a
    * 16-bit stream as bytes would interleave low/high bytes and break
    * the amplitude-scaling invariance this fingerprint promises. None
    * for non-WAV blobs and for non-integer-PCM or other sample widths
    * (float/ADPCM/24-bit): a fake fingerprint would manufacture
    * clusters. */
  def audioFp64(blob: Array[Byte]): Option[Long] = {
    if (!WavDecoder.sniffs(blob)) return None
    val bits16 = WavDecoder.fmtChunk(blob) match {
      case Some((1, _, _, 8))  => false
      case Some((1, _, _, 16)) => true
      case _                   => return None
    }
    WavDecoder.dataChunk(blob).map { case (off, len) =>
      val n = math.min(len / (if (bits16) 2 else 1), 65536)
      val energy = new Array[Double](64)
      val cnt = new Array[Int](64)
      var i = 0
      while (i < n) {
        val seg = (i.toLong * 64 / n).toInt
        val amp =
          if (bits16) math.abs(((blob(off + 2 * i) & 0xff) |
            (blob(off + 2 * i + 1) << 8)).toShort.toDouble)
          else math.abs((blob(off + i) & 0xff) - 128).toDouble
        energy(seg) += amp
        cnt(seg) += 1
        i += 1
      }
      var mean = 0.0
      var s = 0
      while (s < 64) {
        energy(s) = if (cnt(s) > 0) energy(s) / cnt(s) else 0.0
        mean += energy(s)
        s += 1
      }
      mean /= 64
      var bits = 0L
      var k = 0
      while (k < 64) {
        if (energy(k) >= mean) bits |= (1L << k)
        k += 1
      }
      bits
    }
  }

  private val phashSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** (doc_id, phash) for every blob that decodes as a REAL image —
    * batched per-partition like [[decodeFeatures]] (map-only over the
    * scan; blobs never shuffle; only the 8-byte hash flows downstream).
    * Non-image and undecodable blobs are absent (no stub hash: a fake
    * fingerprint would manufacture spurious near-dup clusters). */
  def imagePhashes(blobs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(phashSchema)
    blobs.select(col("doc_id").cast(LongType), col("blob"))
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            ImageDecoder.decodeImage(r.getAs[Array[Byte]](1)).map {
              case (_, img) => Row(r.getLong(0), ImageDecoder.aHash64(img))
            }
          }
        }
      }(enc)
  }

  private val afpSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("afp", LongType, nullable = false)))

  /** (doc_id, afp) for every blob that parses as PCM WAV — batched
    * per-partition like [[imagePhashes]]; non-audio blobs absent. */
  def audioFingerprints(blobs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(afpSchema)
    blobs.select(col("doc_id").cast(LongType), col("blob"))
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            audioFp64(r.getAs[Array[Byte]](1)).map(Row(r.getLong(0), _))
          }
        }
      }(enc)
  }

  /** Near-dup AUDIO clusters over the energy-envelope fingerprint —
    * the audio plane of the dedup family (volume-rescaled copies
    * collapse — amplitude scaling preserves [[audioFp64]]'s bits;
    * different loudness contours don't). Identical scale shape to
    * [[dedupImagePhash]]: map-only batched fingerprint → banded
    * Hamming-verified star edges → components; never all-pairs. */
  def dedupAudioFp(s: SparkSession, d: String,
                   maxHamming: Int = 6): DataFrame = {
    // same consumed-thrice materialization as dedupImagePhash
    val fp = Lineage.truncate(audioFingerprints(withBlobs(documents(s, d))))
    val edges = Dedup.hamming64StarEdges(fp, "doc_id", "afp", maxHamming)
    Components.connectedComponents(edges)
      .select(col("id").as("doc_id"), col("comp"))
      .join(fp, Seq("doc_id"))
      .select(col("doc_id"), col("afp"), col("comp"))
      .orderBy(col("doc_id"))
  }

  /** Per-blob frame signature stream — the video-shaped decomposition:
    * the blob slices into fixed `frameBytes` frames DECLARATIVELY
    * (`substring` on the binary column + `xxhash64`, all inside
    * whole-stage codegen — no UDF, no mapPartitions, bytes never leave
    * the scan task), one (doc_id, sh) row per distinct frame hash. */
  def frameSignatures(blobs: DataFrame, frameBytes: Int = 64): DataFrame =
    blobs.select(col("doc_id"), col("blob"))
      .where(length(col("blob")) > 0)
      .select(col("doc_id"),
        explode(expr(
          s"sequence(0, CAST(ceil(length(blob) / ${frameBytes}D) AS INT) - 1)"))
          .as("f"), col("blob"))
      .select(col("doc_id"),
        expr(s"xxhash64(substring(blob, f * $frameBytes + 1, $frameBytes))")
          .as("sh"))
      .distinct()

  /** Directional frame-set containment — near-dup VIDEO detection:
    * a clip whose frame set is ≥ `threshold` contained in another's is
    * a trim/extension of it (the multimodal twin of dedup_containment,
    * which catches text subsets the same way). Reuses the SSJoin
    * prefix-filtered containment engine over the frame-signature table;
    * never all-pairs, signatures shared by > maxDf blobs are blocked
    * exactly like stop-grams. */
  def dedupFrameContainment(s: SparkSession, d: String,
                            threshold: Double = 0.8): DataFrame =
    Dedup.containmentOver(
      frameSignatures(withBlobs(documents(s, d))), threshold, 256L)

  /** Near-dup IMAGE clusters over the perceptual hash — the multimodal
    * plane of the dedup family (re-encoded, brightness-shifted, and
    * 90°-rotated copies of an image collapse; distinct images don't).
    * Pipeline: blobs → [[ImageDecoder.aHash64]] (map-only batched
    * decode) → the SimHash banded star-edge machinery (4 × 16-bit band
    * buckets; each doc links to its bucket-min root) with an exact
    * Hamming ≤ `maxHamming` verification on every star edge — images
    * share band buckets far more often than text simhashes (flat
    * regions zero out whole bands), so unverified bucket-sharing would
    * over-merge — then iterative connected components. Never all-pairs:
    * a mega-bucket of n boilerplate images costs n edges. Output is one
    * row per clustered image (docs with no verified near-dup are
    * absent), (doc_id, phash, comp) with comp = min doc_id. */
  def dedupImagePhash(s: SparkSession, d: String,
                      maxHamming: Int = 6): DataFrame = {
    // materialize the 16-byte-per-image hash table once: it feeds the
    // band roots, the edge join, and the cluster join-back — without
    // truncation each consumer would re-decode every blob
    val ph = Lineage.truncate(imagePhashes(withBlobs(documents(s, d))))
    val edges = Dedup.hamming64StarEdges(ph, "doc_id", "phash", maxHamming)
    Components.connectedComponents(edges)
      .select(col("id").as("doc_id"), col("comp"))
      .join(ph, Seq("doc_id"))
      .select(col("doc_id"), col("phash"), col("comp"))
      .orderBy(col("doc_id"))
  }

  /** End-to-end pipeline: blobs → batched decode → per-format stats
    * joined back against document metadata. */
  def mmPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val feats = decodeFeatures(s, withBlobs(docs))
    feats
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("format"), col("lang"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("width")), 4).as("avg_w"),
        round(avg(element_at(col("features"), 1)), 6).as("avg_f0"))
      .orderBy(col("format"), col("lang"))
  }

  /** EXACT blob dedup — the byte-identity plane under the perceptual
    * ones (a re-upload dedupes here for free before any decode runs):
    * key = (xxhash64(blob), length) — the length pins the 1-in-2⁶⁴
    * hash collision to equal-sized blobs only; keeper is the min
    * doc_id, n_copies the evidence. One partial+final agg; blobs never
    * shuffle (8-byte hash + length leave the scan). */
  def blobExact(blobs: DataFrame): DataFrame =
    blobs
      .select(col("doc_id"), xxhash64(col("blob")).as("bh"),
        length(col("blob")).as("blen"))
      .groupBy(col("bh"), col("blen"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("blen"), col("n_copies"))
      .orderBy(col("keep_id"))

  def dedupBlobExact(s: SparkSession, d: String): DataFrame =
    blobExact(withBlobs(documents(s, d)))

  /** Per-plane PERCEPTUAL dedup rate — the media twin of
    * quality_dedup_rate: how much of each plane collapses under
    * identical fingerprints ([[MediaIndex.signaturesOf]] — re-encoded
    * images, re-mastered audio, re-cut clips hash EQUAL; the
    * Hamming-tolerant clusters stay the dedup keys' job, this is the
    * standing rate a crawl dashboard plots per plane). A blob's
    * fingerprint is its full signature SET (one hash for image/audio;
    * the bottom-k frame-hash set for video — ascending by
    * construction, so the collected list is canonical without a
    * sort), reduced per (doc, plane) then counted per plane — two
    * shrinking aggs, the share an unrounded exact-integer quotient.
    * Kernel fingerprints → rows-only (MediaIndexSpec pins planted
    * twins moving the rate). */
  def qualityMediaDedupRate(s: SparkSession, d: String): DataFrame =
    MediaIndex.signaturesOf(withBlobs(documents(s, d)))
      .groupBy(col("doc_id"), col("plane"))
      .agg(xxhash64(concat_ws(",",
        transform(array_sort(collect_list(col("h"))),
          h => h.cast(StringType)))).as("fp"))
      .groupBy(col("plane"))
      .agg(count(lit(1)).as("n_blobs"),
        countDistinct(col("fp")).as("n_distinct"))
      .select(col("plane"), col("n_blobs"), col("n_distinct"),
        (col("n_blobs") - col("n_distinct")).as("n_dups"),
        ((col("n_blobs") - col("n_distinct")).cast(DoubleType) /
          col("n_blobs")).as("dup_share"))
      .orderBy(col("plane"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_pipeline" -> (mmPipeline _),
    "dedup_blob_exact" -> (dedupBlobExact _),
    "dedup_image_phash" -> ((s: SparkSession, d: String) =>
      dedupImagePhash(s, d)),
    "dedup_audio_fp" -> ((s: SparkSession, d: String) =>
      dedupAudioFp(s, d)),
    "dedup_frame_containment" -> ((s: SparkSession, d: String) =>
      dedupFrameContainment(s, d)),
    "quality_media_dedup_rate" -> (qualityMediaDedupRate _)
  )

  // Decode semantics live in the JVM stub — not SQL-expressible; covered
  // by ScalaTest (schema, determinism, batch shape) instead of an oracle.
  val oracles: Map[String, String] = Map.empty
}
