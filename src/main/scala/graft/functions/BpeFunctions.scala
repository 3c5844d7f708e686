package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE ENCODER — the corpus-side half of the tokenizer loop as
  * one tight map-only kernel.
  *
  * The declarative encoder (Pretrain.bpeEncodeVocab: the fit's own
  * chained aggregate-HOF merge passes over the distinct-word table,
  * plus a word-stream join to reassemble docs) is the semantic
  * REFERENCE — but Spark's `aggregate` HOF is CodegenFallback, so
  * every merge pass pays interpreted lambda dispatch and array churn
  * per word, and the doc reassembly shuffles the whole word stream.
  * This kernel runs the identical algorithm per document inside
  * whole-stage codegen: zero shuffles, the model rides a broadcast
  * (plan size O(1) — a production tokenizer is ~30k merges), and each
  * executor memoizes word → ids, so a corpus' Zipf head pays the
  * merge loop once per executor, not once per occurrence.
  * PretrainSpec pins kernel == declarative-HOF == independent scalar
  * reference on the same corpus.
  *
  * Algorithm equivalence note: applying merges as sequential
  * greedy-leftmost passes in rank order equals min-rank-first
  * iteration, because a merge's operands always predate it in the
  * learned order — merging pair k can only create pairs of rank > k.
  * The kernel exploits this: per word it walks the rank map
  * min-first (O(len²) map probes per UNCACHED word, independent of
  * model size), which is why 30k production merges don't mean 30k
  * passes per word. */
final class BpeCodec(val merges: Seq[(String, String)]) extends Serializable {

  /** pair "a\u0000b" → rank (0-based; earliest wins on duplicates). */
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + "\u0000" + b, Integer.valueOf(i))
    }
    m
  }

  /** merged-symbol string → token id (BpeMergeIdBase + 1-based step,
    * earliest wins — identical to the declarative sym-table join). */
  @transient private lazy val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + b, Integer.valueOf(BpeCodec.MergeIdBase + i + 1))
    }
    m
  }

  /** Per-executor word → ids memo, two-generation segmented (bound:
    * 2 × 2^16 entries). A full `clear()` at the bound would cold-
    * restart the entire Zipf head for every task thread on the
    * executor at each trip; the segmented memo instead rotates the
    * young generation to old and PROMOTES old hits back to young, so
    * a word referenced at least once per generation never recomputes
    * across an eviction boundary — only the cold tail is dropped.
    * One codec instance serves all task threads on an executor. */
  @transient private lazy val memo = new BpeCodec.SegmentedMemo(1 << 16)

  def idsOf(word: String): Array[Int] = {
    val hit = memo.get(word)
    if (hit != null) return hit
    val computed = encodeWord(word)
    memo.put(word, computed)
    computed
  }

  /** Greedy BPE: repeatedly merge the lowest-rank adjacent pair
    * (leftmost occurrence), then map final symbols to ids. Matches the
    * sequential rank-order pass semantics of the fit (see class doc). */
  private def encodeWord(word: String): Array[Int] = {
    // split to code-point symbols (the declarative charSyms split)
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(word.substring(i, i + n))
      i += n
    }
    var done = syms.size <= 1 || ranks.isEmpty
    while (!done) {
      // find the lowest-rank adjacent pair, leftmost occurrence
      var bestRank = Int.MaxValue
      var bestPos = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + "\u0000" + syms.get(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestPos = j
        }
        j += 1
      }
      if (bestPos < 0) done = true
      else {
        syms.set(bestPos, syms.get(bestPos) + syms.get(bestPos + 1))
        syms.remove(bestPos + 1)
        if (syms.size <= 1) done = true
      }
    }
    val out = new Array[Int](syms.size)
    var k = 0
    while (k < out.length) {
      val s = syms.get(k)
      val mid = ids.get(s)
      out(k) =
        if (mid != null) mid.intValue()
        else s.codePointAt(0)
      k += 1
    }
    out
  }
}

object BpeCodec {
  /** Must equal Pretrain.BpeMergeIdBase (0x110000 — above the Unicode
    * range, so merge ids never collide with code points). */
  val MergeIdBase = 0x110000

  /** Two-generation bounded memo. The young generation fills to
    * `segCap` and is then ROTATED to old (dropping the previous old)
    * instead of cleared; a hit in old promotes the entry back to
    * young. Consequence (pinned by PropertySpec): an entry referenced
    * at least once per generation survives every eviction boundary —
    * exactly the access pattern of a Zipf head — while the cold tail
    * is bounded at 2 × segCap entries. ConcurrentHashMaps + a
    * synchronized rotation; safe under all task threads of an
    * executor sharing one codec. */
  final class SegmentedMemo(segCap: Int) {
    private type M = java.util.concurrent.ConcurrentHashMap[String, Array[Int]]
    @volatile private var young: M = new M()
    @volatile private var old: M = new M()

    def get(word: String): Array[Int] = {
      val hit = young.get(word)
      if (hit != null) return hit
      val prev = old.get(word)
      if (prev != null) { put(word, prev); return prev } // promote
      null
    }

    def put(word: String, ids: Array[Int]): Unit = {
      val y = young
      y.put(word, ids)
      if (y.size > segCap) rotate(y)
    }

    private def rotate(full: M): Unit = synchronized {
      // only the thread whose put actually filled the CURRENT young
      // rotates; latecomers see `young ne full` and skip
      if (young eq full) { old = full; young = new M() }
    }
  }
}

/** Static entry points for codegen. */
object BpeKernels {

  /** (n_words, token_ids) for a whole document: lowercase, split on
    * whitespace, encode each word through the codec's memo, and
    * concatenate ids in document order — matches
    * filter(split(lower(text), "\\s+"), nonEmpty) word semantics. */
  def encodeDoc(text: UTF8String, bc: Broadcast[BpeCodec]):
      org.apache.spark.sql.catalyst.InternalRow = {
    val codec = bc.value
    val words = split(text)
    var total = 0
    val perWord = new Array[Array[Int]](words.size)
    var i = 0
    while (i < words.size) {
      val ids = codec.idsOf(words.get(i))
      perWord(i) = ids
      total += ids.length
      i += 1
    }
    val flat = new Array[Int](total)
    var o = 0
    i = 0
    while (i < perWord.length) {
      System.arraycopy(perWord(i), 0, flat, o, perWord(i).length)
      o += perWord(i).length
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](words.size.toLong, new GenericArrayData(flat)))
  }

  /** Token count only — the packing-knob path: memo'd lengths, no
    * doc-level array ever built. */
  def countDoc(text: UTF8String, bc: Broadcast[BpeCodec]): Long = {
    val codec = bc.value
    val words = split(text)
    var total = 0L
    var i = 0
    while (i < words.size) {
      total += codec.idsOf(words.get(i)).length
      i += 1
    }
    total
  }

  private def split(text: UTF8String): java.util.ArrayList[String] = {
    val s = text.toLowerCase.toString
    val out = new java.util.ArrayList[String]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) out.add(s.substring(start, i))
    }
    out
  }
}

/** `bpe_encode(text)` → struct(n_words, token_ids) against a broadcast
  * fitted codec. */
case class BpeEncodeDoc(child: Expression, bc: Broadcast[BpeCodec])
  extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_encode needs a string input, got ${child.dataType}")
  override def dataType: DataType = BpeEncodeDoc.schema
  override def prettyName: String = "bpe_encode"
  override protected def nullSafeEval(input: Any): Any =
    BpeKernels.encodeDoc(input.asInstanceOf[UTF8String], bc)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bpeCodec", bc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeKernels.encodeDoc($c, $bcRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeDoc =
    copy(child = newChild)
}

object BpeEncodeDoc {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("token_ids", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
}

/** `bpe_count(text)` → token count only (the packing-knob path). */
case class BpeTokenCount(child: Expression, bc: Broadcast[BpeCodec])
  extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_count needs a string input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"
  override protected def nullSafeEval(input: Any): Any =
    BpeKernels.countDoc(input.asInstanceOf[UTF8String], bc)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bpeCodec", bc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeKernels.countDoc($c, $bcRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeFunctions {
  /** Column wrapper: struct(n_words, token_ids) via the broadcast codec. */
  def bpeEncode(text: Column, bc: Broadcast[BpeCodec]): Column =
    GraftInternals.column(BpeEncodeDoc(GraftInternals.expression(text), bc))

  /** Column wrapper: BPE token count via the broadcast codec. */
  def bpeTokenCount(text: Column, bc: Broadcast[BpeCodec]): Column =
    GraftInternals.column(BpeTokenCount(GraftInternals.expression(text), bc))
}
