package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftInternals
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling hash + winnowing document fingerprints
  * (Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms for
  * Document Fingerprinting", SIGMOD 2003).
  *
  * Implemented as a native Catalyst `Expression` whose codegen emits a
  * single static call — the O(n) rolling loop runs in tight JVM code
  * inside the whole-stage-codegen'd pipeline, no UDF boxing, no
  * serialization. Map-only at 100 TB: fingerprints compute during the
  * scan; only the (much smaller) fingerprint arrays ever shuffle.
  */
object RollingHash {

  private val Base = 1000003L // polynomial base (wrapping mod 2^64)

  /** Winnowed fingerprint of `s`: k-byte Rabin-Karp window hashes,
    * then the minimum hash of each w-hash window (rightmost minimum),
    * deduplicated consecutively, returned in document order.
    * Public entry point for codegen — must stay static and cheap. */
  def fingerprint(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n < k) {
      // document shorter than one window: hash the whole thing
      var h = 0L
      var i = 0
      while (i < n) { h = h * Base + (bytes(i) & 0xff); i += 1 }
      return new GenericArrayData(Array(h))
    }
    val nh = n - k + 1
    val hashes = new Array[Long](nh)
    var h = 0L
    var powK = 1L // Base^(k-1), wrapping
    var i = 0
    while (i < k) {
      h = h * Base + (bytes(i) & 0xff)
      if (i < k - 1) powK *= Base
      i += 1
    }
    hashes(0) = h
    i = 1
    while (i < nh) {
      h = (h - (bytes(i - 1) & 0xff) * powK) * Base + (bytes(i + k - 1) & 0xff)
      hashes(i) = h
      i += 1
    }
    // winnow: rightmost minimum of each w-window of hashes
    val out = new java.util.ArrayList[Long]()
    var last = Long.MinValue
    var lastPos = -1
    var start = 0
    while (start <= nh - w || (start == 0 && nh < w)) {
      val end = math.min(start + math.max(w, 1), nh)
      var minPos = start
      var j = start + 1
      while (j < end) {
        if (hashes(j) <= hashes(minPos)) minPos = j
        j += 1
      }
      if (minPos != lastPos) {
        out.add(hashes(minPos))
        last = hashes(minPos)
        lastPos = minPos
      }
      if (nh < w) start = nh // single truncated window, emit once
      else start += 1
    }
    val arr = new Array[Long](out.size)
    var x = 0
    while (x < arr.length) { arr(x) = out.get(x); x += 1 }
    new GenericArrayData(arr)
  }
}

/** `rolling_fingerprint(text)` — winnowed Rabin-Karp fingerprint set. */
case class RollingFingerprint(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_fingerprint needs a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.fingerprint(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.fingerprint($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** One-pass signature kernels for the dedup operators. Static methods so
  * whole-stage codegen can call them directly (no UDF boxing, no
  * serialization); arithmetic wraps in plain JVM semantics so ANSI-mode
  * overflow checking never fires. */
object SignatureKernels {

  /** Seeded odd multipliers + offsets for the universal-hash permutation
    * family π_i(h) = a_i·h + b_i (mod 2^64). */
  private def genPerms(n: Int): (Array[Long], Array[Long]) = {
    val rng = new scala.util.Random(0x5eed)
    (Array.fill(n)(rng.nextLong() | 1L), Array.fill(n)(rng.nextLong()))
  }
  private val NumPerms = 128
  private val (permA, permB) = genPerms(NumPerms)

  /** MinHash signature of a shingle array: one pass, one xxhash64 per
    * shingle plus 128 wrapping mul-adds — map-only per document. */
  def minhashSignature(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val sig = new Array[Long](NumPerms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(shingles.getUTF8String(i), 42L)
      var j = 0
      while (j < NumPerms) {
        val v = permA(j) * h + permB(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** MinHash band buckets straight from raw text: lowercase + tokenize
    * on whitespace byte-level, hash each word, fold word-hash windows of
    * `n` into shingle hashes (no shingle strings ever materialize —
    * duplicates are harmless because min() is idempotent), update the
    * 128 permutations, then collapse each band of 8 signature slots to
    * its bucket hash. One allocation-light pass per document; the
    * downstream plan sees only 16 (band, bucket) longs. */
  def minhashBuckets(text: UTF8String, n: Int, bands: Int): ArrayData = {
    val rows = NumPerms / bands
    val bytes = text.getBytes
    val sig = new Array[Long](NumPerms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val window = new Array[Long](n)
    var nWords = 0
    var i = 0
    val len = bytes.length

    def pushWord(start: Int, end: Int): Unit = {
      // polynomial-accumulate the word bytes (A-Z folded to lowercase),
      // one xxhash finalizer per word
      var acc = 0L
      var j = start
      while (j < end) {
        val b = bytes(j)
        val lb = if (b >= 'A' && b <= 'Z') (b | 0x20).toByte else b
        acc = acc * 31L + (lb & 0xffL)
        j += 1
      }
      window(nWords % n) = XXH64.hashLong(acc, 42L)
      nWords += 1
      if (nWords >= n) {
        // fold the last n word-hashes (oldest→newest) into a gram hash
        var g = 42L
        var k = nWords - n
        while (k < nWords) { g = XXH64.hashLong(window(k % n), g); k += 1 }
        var p = 0
        while (p < NumPerms) {
          val v = permA(p) * g + permB(p)
          if (v < sig(p)) sig(p) = v
          p += 1
        }
      }
    }

    while (i < len) {
      while (i < len && (bytes(i) & 0xff) <= ' ') i += 1
      val start = i
      while (i < len && (bytes(i) & 0xff) > ' ') i += 1
      if (i > start) pushWord(start, i)
    }
    if (nWords > 0 && nWords < n) {
      // short doc: one gram over all its words
      var g = 42L
      var k = 0
      while (k < nWords) { g = XXH64.hashLong(window(k % n), g); k += 1 }
      var p = 0
      while (p < NumPerms) {
        val v = permA(p) * g + permB(p)
        if (v < sig(p)) sig(p) = v
        p += 1
      }
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 7L
      var r = 0
      while (r < rows) { h = XXH64.hashLong(sig(b * rows + r), h); r += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word-n-gram hashes straight from raw text: unicode
    * lowercase, whitespace tokenize, fold each n-word window of word
    * hashes into one gram hash — no gram strings ever materialize. The
    * token stream mirrors `split(lower(text), "\s+")` including its
    * leading-empty-token artifact, so gram-set cardinalities and
    * cross-document matches agree with the string formulation (and the
    * DuckDB oracle) 1:1. Output sorted for determinism. */
  /** Exactly Java/DuckDB `\s`: space, \t, \n, \x0B, \f, \r. A bare
    * `<= ' '` test would also split on control bytes 0x00–0x08/0x0E–0x1F
    * that the regex formulations keep inside tokens. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= '\t' && b <= '\r')

  def ngramHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    val window = new Array[Long](n)
    var nWords = 0
    val seen = new java.util.HashSet[java.lang.Long]()

    // full xxhash64 over the word bytes — a polynomial accumulator
    // folded through one hashLong has structured collision families
    // (acc*31 ties e.g. "|!" with "{@"), which would break the 1:1
    // parity with the string-shingle formulation this kernel promises
    def wordHash(start: Int, end: Int): Long =
      XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
        end - start, 42L)
    def pushGram(): Unit = {
      var g = 42L
      var k = nWords - math.min(nWords, n)
      while (k < nWords) { g = XXH64.hashLong(window(k % n), g); k += 1 }
      seen.add(g)
    }
    def pushWord(h: Long): Unit = {
      window(nWords % n) = h
      nWords += 1
      if (nWords >= n) pushGram()
    }

    // split(lower(text), "\s+") yields a leading "" token when the text
    // starts with whitespace, and [""] for empty/all-whitespace text
    if (len == 0 || isWs(bytes(0))) pushWord(wordHash(0, 0))
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > start) pushWord(wordHash(start, i))
    }
    if (nWords > 0 && nWords < n) pushGram() // short doc: one gram
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** Positional (ordered, non-distinct) word-n-gram hashes: out(i) is
    * the hash of words i..i+n-1 in document order — the window stream
    * the exact-substring span detector consumes (a duplicated ≥n-token
    * substring duplicates ALL of its n-windows, so window positions are
    * the span evidence). Identical tokenization, lowercasing, edge
    * artifacts and gram-hash construction as [[ngramHashes]]; docs with
    * fewer than n words emit exactly one whole-doc gram. */
  def ngramHashesPos(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    val window = new Array[Long](n)
    var nWords = 0
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    def wordHash(start: Int, end: Int): Long =
      XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
        end - start, 42L)
    def pushGram(): Unit = {
      var g = 42L
      var k = nWords - math.min(nWords, n)
      while (k < nWords) { g = XXH64.hashLong(window(k % n), g); k += 1 }
      out += g
    }
    def pushWord(h: Long): Unit = {
      window(nWords % n) = h
      nWords += 1
      if (nWords >= n) pushGram()
    }
    if (len == 0 || isWs(bytes(0))) pushWord(wordHash(0, 0))
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > start) pushWord(wordHash(start, i))
    }
    if (nWords > 0 && nWords < n) pushGram() // short doc: one gram
    new GenericArrayData(out.result())
  }

  /** tf-weighted 64-bit SimHash (Charikar 2002) of a word array: each
    * occurrence contributes ±1 to its hash's bit sums, so term frequency
    * weights fall out of iterating occurrences directly. */
  def simhash64(words: ArrayData): Long = {
    val n = words.numElements()
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(words.getUTF8String(i), 42L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) sums(k) += 1 else sums(k) -= 1
        k += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) { if (sums(k) > 0) out |= (1L << k); k += 1 }
    out
  }
}

/** `minhash_signature(array<string>)` → 128-long MinHash signature. */
case class MinHashSignature(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.minhashSignature(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SignatureKernels.minhashSignature($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `minhash_buckets(text)` → the `bands` LSH bucket hashes of the
  * document's 128-perm MinHash signature, straight from raw text. */
case class MinHashBuckets(child: Expression, n: Int, bands: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_buckets"
  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.minhashBuckets(input.asInstanceOf[UTF8String], n, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SignatureKernels.minhashBuckets($c, $n, $bands)")
  override protected def withNewChildInternal(newChild: Expression): MinHashBuckets =
    copy(child = newChild)
}

/** `ngram_hashes(text)` → sorted distinct word-n-gram hashes. */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"
  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.ngramHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SignatureKernels.ngramHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** `ngram_hashes_pos(text)` → ordered positional word-n-gram hashes. */
case class NgramHashesPos(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes_pos"
  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.ngramHashesPos(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SignatureKernels.ngramHashesPos($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): NgramHashesPos =
    copy(child = newChild)
}

/** Membership kernel for [[AnyLongInBroadcast]] — static so whole-stage
  * codegen calls it directly. */
object SetKernels {
  /** true iff any element of `arr` occurs in the SORTED long array
    * `set` (binary search per element — O(|arr|·log|set|), no boxing,
    * no per-row allocation). */
  def anyIn(arr: ArrayData, set: Array[Long]): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0) return true
      i += 1
    }
    false
  }
}

/** `any_long_in_broadcast(array<long>)` — true iff any array element is
  * in a BROADCAST sorted-long set. The set rides as a
  * `SparkContext.broadcast` handle (torrent-distributed once per
  * executor), NOT a plan literal: plan size and codegen stay O(1) no
  * matter how many members the set has — the fix for the
  * contamination-gate anti-pattern where a million eval grams inlined
  * as `lit(array)` bloat every micro-batch's plan. Driver memory is
  * the same as a broadcast hash join's build side (which also
  * materializes on the driver); lookup is exact, so batch/stream
  * screen parity is bit-for-bit. */
case class AnyLongInBroadcast(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Long]])
  extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "any_long_in_broadcast"
  override protected def nullSafeEval(input: Any): Any =
    SetKernels.anyIn(input.asInstanceOf[ArrayData], bc.value)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("broadcastSet", bc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SetKernels.anyIn($c, (long[]) $bcRef.value())")
  }
  override protected def withNewChildInternal(newChild: Expression): AnyLongInBroadcast =
    copy(child = newChild)
}

/** `bloom_might_contain_bc(long)` — probe a BROADCAST
  * `org.apache.spark.util.sketch.BloomFilter` with a long hash.
  * Same probe semantics as Spark's own `BloomFilterMightContain`
  * (the expression InjectRuntimeFilter emits), but the filter rides a
  * `SparkContext.broadcast` handle via `ctx.addReferenceObj` instead
  * of a serialized-bytes plan Literal: plan size and codegen stay
  * O(1) in filter size (a 1M-key/1% filter is ~1.2 MB — inlined as a
  * Literal it is re-shipped and re-deserialized with every plan
  * copy), and the filter deserializes ONCE per executor via the
  * torrent broadcast, not once per plan transform. Codegen'd — no
  * fence on the corpus-sized scan it guards. */
case class BloomMightContainBroadcast(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.sketch.BloomFilter])
  extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain_bc"
  override protected def nullSafeEval(input: Any): Any =
    bc.value.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("broadcastBloom", bc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev,
      c => s"((org.apache.spark.util.sketch.BloomFilter) $bcRef.value())" +
        s".mightContainLong($c)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainBroadcast =
    copy(child = newChild)
}

/** `simhash64(array<string>)` → tf-weighted 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SignatureKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object HashFunctions {
  /** Column wrapper: winnowed rolling-hash fingerprints (k-byte windows,
    * winnow width w). */
  def rollingFingerprint(text: Column, k: Int = 8, w: Int = 4): Column =
    GraftInternals.column(
      RollingFingerprint(GraftInternals.expression(text), k, w))

  /** Column wrapper: 128-perm MinHash signature of a shingle array. */
  def minhashSignature(shingles: Column): Column =
    GraftInternals.column(
      MinHashSignature(GraftInternals.expression(shingles)))

  /** Column wrapper: LSH band buckets straight from raw text. */
  def minhashBuckets(text: Column, n: Int = 3, bands: Int = 16): Column =
    GraftInternals.column(
      MinHashBuckets(GraftInternals.expression(text), n, bands))

  /** Column wrapper: tf-weighted 64-bit SimHash of a word array. */
  def simhash64(words: Column): Column =
    GraftInternals.column(SimHash64(GraftInternals.expression(words)))

  /** Column wrapper: sorted distinct word-n-gram hashes from raw text. */
  def ngramHashes(text: Column, n: Int): Column =
    GraftInternals.column(NgramHashes(GraftInternals.expression(text), n))

  /** Column wrapper: ordered positional word-n-gram hashes. */
  def ngramHashesPos(text: Column, n: Int): Column =
    GraftInternals.column(NgramHashesPos(GraftInternals.expression(text), n))

  /** Column wrapper: any array element present in a broadcast sorted
    * long set. */
  def anyLongInBroadcast(arr: Column,
      bc: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    GraftInternals.column(
      AnyLongInBroadcast(GraftInternals.expression(arr), bc))

  /** Column wrapper: probe a broadcast bloom filter with a long hash. */
  def bloomMightContain(hash: Column,
      bc: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]): Column =
    GraftInternals.column(
      BloomMightContainBroadcast(GraftInternals.expression(hash), bc))
}
