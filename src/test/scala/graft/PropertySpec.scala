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

  test("TextStats kernel is byte-equivalent to the split composition") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextStats.textStats
    import spark.implicits._
    val hostile = Seq("", "   ", "word", " lead", "trail ", "\t\n", "a\tb\nc  d",
      "数据处理引擎没有空格的文本", "the the THE tHe", "a a a", "é Ü ß é",
      "the quick brown fox", "isvtab", "mixé 中文 and english")
    val rnd = new scala.util.Random(3)
    val randoms = Seq.fill(300)(
      Seq.fill(rnd.nextInt(30))(
        rnd.nextInt(4) match {
          case 0 => " " * (1 + rnd.nextInt(3))
          case 1 => "\t"
          case 2 => Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString
          case 3 => Seq("the", "a", "of", "données", "日本")(rnd.nextInt(5))
        }).mkString)
    val df = (hostile ++ randoms).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val w = split(lower(col("text")), "\\s+")
    val stops = Seq("the", "a", "an", "of", "and", "to", "in", "is")
    val oldWay = df.select(col("id"),
        size(w).as("n_words"),
        length(regexp_replace(col("text"), "\\s+", "")).as("n_alpha"),
        size(array_distinct(w)).as("n_distinct"),
        size(filter(w, x => x.isin(stops.map(lit): _*))).as("n_stop"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val newWay = df.select(col("id"), textStats(col("text")).as("st"))
      .select(col("id"), col("st.n_words"), col("st.n_alpha"),
        col("st.n_distinct"), col("st.n_stop"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val texts = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    oldWay.keys.foreach { id =>
      assert(oldWay(id) == newWay(id),
        s"kernel diverges on '${texts(id)}': old=${oldWay(id)} new=${newWay(id)}")
    }
  }

  test("LangStats kernel matches the filter/rlike composition") {
    import org.apache.spark.sql.functions._
    import graft.functions.LangStats.langStats
    import graft.functions.LangStatsKernel._
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val vocab = enStops ++ deStops ++ frStops ++ esStops ++
      Seq("word", "données", "日本語", "中文文本", "xyz", "", " ")
    val cases = Seq("", "   ", "数据处理", "the und le el",
      "no stopwords here at all???") ++
      Seq.fill(300)(Seq.fill(rnd.nextInt(20))(
        vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val w = split(lower(col("text")), "\\s+")
    def score(stops: Seq[String]) =
      size(filter(w, x => x.isin(stops.map(lit): _*)))
    val oldWay = df.select(col("id"), score(enStops), score(deStops),
        score(frStops), score(esStops),
        col("text").rlike("[\\x{4e00}-\\x{9fff}]"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getBoolean(5))).toMap
    val newWay = df.select(col("id"), langStats(col("text")).as("st"))
      .select(col("id"), col("st.s_en"), col("st.s_de"), col("st.s_fr"),
        col("st.s_es"), col("st.cjk"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getBoolean(5))).toMap
    val texts = cases.zipWithIndex.map { case (t, i) => i.toLong -> t }.toMap
    oldWay.keys.foreach { id =>
      assert(oldWay(id) == newWay(id),
        s"lang kernel diverges on '${texts(id)}': old=${oldWay(id)} new=${newWay(id)}")
    }
  }

  test("fingerprint count is bounded by text length") {
    samples(texts).foreach { t =>
      val n = RollingHash.fingerprint(UTF8String.fromString(t), 8, 4)
        .numElements()
      assert(n <= math.max(t.getBytes("UTF-8").length, 1))
    }
  }

  test("hyperplane_codes matches the unrolled dot-sign composition for arbitrary vectors") {
    import graft.functions.VectorKernels
    val rng = new scala.util.Random(42)
    val (tables, bits, dim) = (5, 7, 16)
    val planes = Array.fill(tables * bits * dim)(rng.nextGaussian())
    val vecs: Gen[Array[Float]] =
      Gen.containerOfN[Array, Float](dim, Gen.chooseNum(-1.0f, 1.0f))
    samples(vecs, 100).foreach { v =>
      val ad = new GenericArrayData(v)
      val got = VectorKernels.hyperplaneCodes(ad, true, planes, tables, bits, dim)
        .toLongArray()
      // reference: per-plane left-to-right double MAC, sign → bit, the
      // exact arithmetic of the when(dot > 0, 1<<j) tree it replaced
      val want = Array.tabulate(tables) { t =>
        (0 until bits).map { j =>
          var acc = 0.0
          (0 until dim).foreach(i => acc += v(i).toDouble * planes((t * bits + j) * dim + i))
          if (acc > 0) 1L << j else 0L
        }.sum
      }
      assert(got.toSeq == want.toSeq)
    }
  }

  test("hyperplane_probes: probe 0 is the exact code; flips are lowest-margin single bits") {
    import graft.functions.VectorKernels
    val rng = new scala.util.Random(11)
    val (tables, bits, dim, nProbe) = (4, 9, 12, 4)
    val planes = Array.fill(tables * bits * dim)(rng.nextGaussian())
    val vecs: Gen[Array[Float]] =
      Gen.containerOfN[Array, Float](dim, Gen.chooseNum(-1.0f, 1.0f))
    samples(vecs, 60).foreach { v =>
      val ad = new GenericArrayData(v)
      val codes = VectorKernels.hyperplaneCodes(ad, true, planes, tables, bits, dim)
        .toLongArray()
      val probes = VectorKernels.hyperplaneProbeCodes(
        ad, true, planes, tables, bits, dim, nProbe).toLongArray()
      (0 until tables).foreach { t =>
        assert(probes(t * nProbe) == codes(t), "probe 0 must be the exact code")
        val margins = (0 until bits).map { j =>
          var acc = 0.0
          (0 until dim).foreach(i => acc += v(i).toDouble * planes((t * bits + j) * dim + i))
          math.abs(acc)
        }
        val expectFlips = margins.zipWithIndex.sortBy { case (m, j) => (m, j) }
          .take(nProbe - 1).map(_._2)
        (1 until nProbe).foreach { k =>
          val diff = probes(t * nProbe + k) ^ codes(t)
          assert(java.lang.Long.bitCount(diff) == 1, "each probe flips one bit")
          assert(java.lang.Long.numberOfTrailingZeros(diff) == expectFlips(k - 1),
            s"probe $k must flip the ${k}-th lowest-margin bit")
        }
      }
    }
  }

  test("nearest_cells matches a full (d2, cell) lexicographic sort for arbitrary vectors") {
    import graft.functions.VectorKernels
    val rng = new scala.util.Random(7)
    val (k, dim, nProbe) = (23, 8, 5)
    val centroids = Array.fill(k * dim)(rng.nextGaussian())
    val vecs: Gen[Array[Float]] =
      Gen.containerOfN[Array, Float](dim, Gen.chooseNum(-2.0f, 2.0f))
    samples(vecs, 100).foreach { v =>
      val ad = new GenericArrayData(v)
      val got = VectorKernels.nearestCells(ad, true, centroids, k, dim, nProbe)
        .toIntArray()
      val want = (0 until k).map { c =>
        var acc = 0.0
        (0 until dim).foreach { i =>
          val d = v(i).toDouble - centroids(c * dim + i); acc += d * d
        }
        (acc, c)
      }.sorted.take(nProbe).map(_._2)
      assert(got.toSeq == want)
    }
  }

  test("cell_residual matches driver-side subtraction; empty on mismatch/out-of-range") {
    import graft.functions.VectorKernels
    val rng = new scala.util.Random(17)
    val (k, dim) = (11, 8)
    val centroids = Array.fill(k * dim)(rng.nextGaussian())
    val vecs: Gen[Array[Float]] =
      Gen.containerOfN[Array, Float](dim, Gen.chooseNum(-2.0f, 2.0f))
    samples(vecs, 100).foreach { v =>
      val cell = rng.nextInt(k)
      val got = VectorKernels.cellResidual(
        new GenericArrayData(v), true, centroids, k, dim, cell).toDoubleArray()
      val want = (0 until dim).map(i => v(i).toDouble - centroids(cell * dim + i))
      assert(got.toSeq == want)
      // loud-failure contract: wrong dim or cell out of range → empty
      assert(VectorKernels.cellResidual(
        new GenericArrayData(v.take(dim - 1)), true, centroids, k, dim, cell)
        .numElements() == 0)
      assert(VectorKernels.cellResidual(
        new GenericArrayData(v), true, centroids, k, dim, k)
        .numElements() == 0)
    }
  }

  test("nearest_cells yields an empty array on a dim-mismatched vector") {
    import graft.functions.VectorKernels
    val centroids = Array.fill(4 * 8)(1.0)
    val short = new GenericArrayData(Array.fill(5)(1.0f))
    assert(VectorKernels.nearestCells(short, true, centroids, 4, 8, 2)
      .numElements() == 0,
      "mismatched dim must probe no cells, not nProbe copies of cell 0")
  }

  test("media decoders never throw on arbitrary bytes (fuzz)") {
    import graft.operators.Multimodal
    val rng = new scala.util.Random(99)
    // random blobs, plus adversarial prefixes: valid magics with junk
    // bodies, truncated headers, and huge declared chunk lengths
    val magics = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G'),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte),
      "RIFF".getBytes("US-ASCII") ++ Array.fill(4)(0x7f.toByte) ++
        "WAVE".getBytes("US-ASCII"),
      "RIFFxxxxWAVEfmt ".getBytes("US-ASCII") ++
        Array.fill(4)(0xff.toByte)) // fmt chunk claiming length -1
    val blobs =
      (0 until 200).map(_ => Array.fill(rng.nextInt(200))(rng.nextInt.toByte)) ++
        magics.flatMap(m => Seq(m, m ++ Array.fill(50)(rng.nextInt.toByte))) ++
        Seq(Array.empty[Byte])
    blobs.foreach { b =>
      val (f1, _, _, h1) =
        if (Multimodal.WavDecoder.sniffs(b)) Multimodal.WavDecoder.decode(b)
        else Multimodal.ImageDecoder.decode(b)
      assert(f1.nonEmpty && h1.length == 8)
    }
  }

  test("aHash is 90°-rotation invariant for arbitrary block-aligned images") {
    import graft.operators.Multimodal.ImageDecoder.aHash64
    val rng = new scala.util.Random(31)
    (0 until 50).foreach { trial =>
      // random 64×64 grayscale pattern (block-aligned, so the 8×8 grid
      // rotates exactly); rotate the raster 90° clockwise and demand
      // the same canonical hash — for ANY image, not a planted one
      val px = Array.fill(64, 64)(rng.nextInt(256))
      def img(f: (Int, Int) => Int) = {
        val im = new java.awt.image.BufferedImage(
          64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 64; x <- 0 until 64) {
          val g = f(x, y); im.setRGB(x, y, (g << 16) | (g << 8) | g)
        }
        im
      }
      val h0 = aHash64(img((x, y) => px(y)(x)))
      val h90 = aHash64(img((x, y) => px(63 - x)(y)))
      val h180 = aHash64(img((x, y) => px(63 - y)(63 - x)))
      assert(h0 == h90 && h0 == h180,
        f"trial $trial: rotation changed the canonical hash " +
          f"($h0%016x / $h90%016x / $h180%016x)")
    }
  }

  test("skipgram pair count obeys the window identity on arbitrary docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a doc of n tokens at window w emits exactly Σ_{o=1..w} max(0, n−o)
    // pairs — any drift means the HOF emission clips or double-counts
    val docs = samples(wordLists, 40).zipWithIndex
      .filter(_._1.nonEmpty)
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val df = docs.toDF("doc_id", "text")
    val w = 3
    val emitted = graft.operators.TextAnalysis
      .skipgramPmi(df, window = w, minCount = 1)
      .agg(sum(col("n_ab"))).collect()(0)
    val got = if (emitted.isNullAt(0)) 0L else emitted.getLong(0)
    val expected = docs.map { case (_, t) =>
      val n = t.toLowerCase.split("\\s+").length
      (1 to w).map(o => math.max(0, n - o).toLong).sum
    }.sum
    assert(got == expected, s"pairs $got != identity $expected")
  }

  test("JS divergence is bounded, symmetric in construction, zero on self") {
    import spark.implicits._
    val corpora = samples(wordLists, 30).filter(_.nonEmpty).take(8)
    val docs = corpora.zipWithIndex.flatMap { case (ws, i) =>
      Seq((i.toLong * 2, ws.mkString(" "), s"s$i"),
        (i.toLong * 2 + 1, ws.reverse.mkString(" "), s"s${i}m"))  // mirror
    }.toDF("doc_id", "text", "source")
    val rows = graft.operators.TextAnalysis.sourceDivergence(docs).collect()
    rows.foreach { r =>
      val js = r.getDouble(3)
      assert(!js.isNaN && js >= -1e-12 && js <= math.log(2.0) + 1e-12,
        s"${r.getString(0)}/${r.getString(1)}: js $js out of [0, ln 2]")
    }
    // a source and its word-REVERSED mirror share the exact unigram
    // distribution: their JS is 0 for every generated pair
    val zero = rows.filter(r => r.getString(1) == r.getString(0) + "m")
    assert(zero.nonEmpty)
    zero.foreach(r => assert(math.abs(r.getDouble(3)) < 1e-9,
      s"mirror pair diverged: ${r.getString(0)} ${r.getDouble(3)}"))
  }

  test("segmented BPE memo: a hot word survives every eviction boundary") {
    // the full-clear memo recomputed the whole Zipf head at each trip;
    // the segmented memo must keep an entry that is referenced at
    // least once per generation alive FOREVER (reference identity —
    // the promoted array is the same instance, never recomputed)
    val memo = new graft.functions.BpeCodec.SegmentedMemo(64)
    val hot = Array(1, 2, 3)
    memo.put("hot", hot)
    var i = 0
    while (i < 10000) {
      memo.put(s"cold_$i", Array(i))
      if (i % 32 == 0) { // well within one generation (cap 64)
        val got = memo.get("hot")
        assert(got != null, s"hot word evicted at insertion $i")
        assert(got eq hot, s"hot word recomputed (new array) at $i")
      }
      i += 1
    }
    // and a cold-tail word from thousands of insertions ago is gone
    assert(memo.get("cold_0") == null, "memo is unbounded")
  }

  test("segmented BPE memo is safe under concurrent task threads") {
    val memo = new graft.functions.BpeCodec.SegmentedMemo(128)
    val hot = Array(7)
    memo.put("hot", hot)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val bad = new java.util.concurrent.atomic.AtomicInteger(0)
    (0 until 8).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          var i = 0
          while (i < 5000) {
            memo.put(s"t${t}_$i", Array(i))
            if (memo.get("hot") == null) { // re-seed like idsOf would
              bad.incrementAndGet(); memo.put("hot", hot)
            }
            i += 1
          }
        }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS))
    // each thread touches "hot" every insertion — far more than once
    // per generation, so it survives (a miss is only possible if a
    // thread is descheduled across TWO full rotations between its two
    // generation probes; tolerate noise, a miss just means one
    // recompute, never corruption)
    assert(bad.get() <= 2, s"hot word observed missing ${bad.get()} times")
  }
}
