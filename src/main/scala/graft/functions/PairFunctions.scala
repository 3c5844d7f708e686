package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native PAIR-EMISSION kernels — the hot per-row passes of the
  * co-occurrence miners (skipgram PMI, event-type affinity) and the
  * readability syllable sum, as codegen'd expressions.
  *
  * The declarative forms (chained `transform`/`filter`/`flatten`/
  * `aggregate` lambda HOFs) are the semantic REFERENCE and remain the
  * in-repo parity oracle (PairFunctionsSpec pins kernel == HOF on the
  * corpus), but Spark evaluates higher-order-function lambdas as
  * CodegenFallback: every document pays interpreted lambda dispatch
  * and intermediate array churn per token. These kernels compute the
  * identical output in one tight loop inside whole-stage codegen —
  * the SCALE property of the consuming plans (map-only pair emission,
  * no positional self-join of the exploded token table) is unchanged;
  * only the per-row constant factor drops. */
object PairKernels {

  private val emptyPairs = new GenericArrayData(Array.empty[Any])

  /** Windowed skipgram pairs over a token array: (ws[i], ws[i+o]) for
    * every position i and offset 1 ≤ o ≤ window. Emission order is
    * position-major then offset — the exact order of the declarative
    * `flatten(transform(ws, (w, i) -> transform(sequence(1, window),
    * ...)))` it replaces (order is irrelevant to the consuming
    * groupBy, but parity is pinned order-sensitively). */
  def skipgramPairs(ws: ArrayData, window: Int): ArrayData = {
    val n = ws.numElements()
    if (n <= 1) return emptyPairs
    var total = 0L
    var o = 1
    while (o <= window) { total += math.max(0, n - o); o += 1 }
    // Long-checked sizing: a pathological row must fail with a
    // diagnosable message, not a negative-allocation crash from a
    // silently truncated .toInt
    require(total <= Int.MaxValue,
      s"skipgram pair emission of one row needs $total pairs " +
        s"($n tokens, window $window) — exceeds a JVM array; " +
        "chunk the document upstream (pipeline_chunk)")
    val out = new Array[Any](total.toInt)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val a = ws.getUTF8String(i)
      val lim = math.min(window, n - 1 - i)
      var j = 1
      while (j <= lim) {
        out(k) = new GenericInternalRow(
          Array[Any](a, ws.getUTF8String(i + j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[skipgramPairs]] PLUS per-token unigram markers in one emission
    * (round 20): position-major, each position i yields struct(ws[i],
    * NULL) then (ws[i], ws[i+o]) for 1 ≤ o ≤ window. The PMI miners
    * reduce this single gram stream in ONE corpus pass / one shuffle —
    * unigram counts are the b-IS-NULL group, pair counts the rest —
    * where the split unigram+pair emissions cost two to five full
    * tokenize passes (PairFunctionsSpec pins: the null-b subsequence
    * equals ws in order, the non-null subsequence equals
    * [[skipgramPairs]] exactly). */
  def skipgramGrams(ws: ArrayData, window: Int): ArrayData = {
    val n = ws.numElements()
    var total = n.toLong
    var o = 1
    while (o <= window) { total += math.max(0, n - o); o += 1 }
    require(total <= Int.MaxValue,
      s"gram emission of one row needs $total entries " +
        s"($n tokens, window $window) — exceeds a JVM array; " +
        "chunk the document upstream (pipeline_chunk)")
    val out = new Array[Any](total.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val a = ws.getUTF8String(i)
      out(k) = new GenericInternalRow(Array[Any](a, null))
      k += 1
      val lim = math.min(window, n - 1 - i)
      var j = 1
      while (j <= lim) {
        out(k) = new GenericInternalRow(
          Array[Any](a, ws.getUTF8String(i + j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Upper-triangle unordered combinations of a (pre-sorted, distinct)
    * array: (ts[i], ts[j]) for all i < j — the market-basket pair
    * emission. Identical output to the declarative
    * `flatten(transform(ts, (x, i) -> transform(slice(ts, i+2, ...),
    * y -> ...)))`. */
  def combinations(ts: ArrayData): ArrayData = {
    val n = ts.numElements()
    if (n <= 1) return emptyPairs
    // Long-checked sizing: n*(n-1)/2 overflows Int at n >= 46341 and
    // would throw NegativeArraySizeException with no context
    val total = n.toLong * (n - 1L) / 2L
    require(total <= Int.MaxValue,
      s"pair combinations of one row need $total pairs ($n elements) " +
        "— exceeds a JVM array; cap the group upstream (the callers' " +
        "maxDf / MaxBucket blocks are that cap)")
    val out = new Array[Any](total.toInt)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val a = ts.getUTF8String(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, ts.getUTF8String(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Flesch-Kincaid syllable sum: lowercase, split on `\s+` (Java
    * regex semantics — identical to Spark's `split`, including the
    * empty leading token a text with leading whitespace produces),
    * then per word max(#maximal-[aeiou]-runs, 1), summed. Equals the
    * declarative `aggregate(transform(split(lower(text), '\\s+'),
    * w -> greatest(size(split(w, '[aeiou]+')) - 1, 1)), 0L, +)`
    * exactly: `size(split(w, '[aeiou]+')) - 1` counts the vowel runs
    * of w (split keeps leading/trailing empties at limit -1, so
    * #fields = #runs + 1). */
  def syllableCount(text: UTF8String): Long = {
    val words = text.toLowerCase.toString.split("\\s+", -1)
    var total = 0L
    var w = 0
    while (w < words.length) {
      val s = words(w)
      var runs = 0L
      var inRun = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        val v = c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'
        if (v && !inRun) runs += 1
        inRun = v
        i += 1
      }
      total += math.max(runs, 1L)
      w += 1
    }
    total
  }
}

object PairFunctions {
  private[functions] val pairType: DataType = ArrayType(
    StructType(Seq(StructField("a", StringType), StructField("b", StringType))),
    containsNull = false)

  /** Column wrapper: windowed skipgram (a, b) pairs from a token array. */
  def skipgramPairs(ws: Column, window: Int): Column =
    GraftInternals.column(
      SkipgramPairs(GraftInternals.expression(ws), window))

  /** Column wrapper: unigram markers + windowed skipgram pairs in one
    * emission (b IS NULL ⇔ unigram). */
  def skipgramGrams(ws: Column, window: Int): Column =
    GraftInternals.column(
      SkipgramGrams(GraftInternals.expression(ws), window))

  /** Column wrapper: unordered upper-triangle (a, b) combinations. */
  def pairCombinations(ts: Column): Column =
    GraftInternals.column(PairCombinations(GraftInternals.expression(ts)))

  /** Column wrapper: Flesch-Kincaid vowel-group syllable sum of a text. */
  def syllableCount(text: Column): Column =
    GraftInternals.column(SyllableCount(GraftInternals.expression(text)))
}

/** `skipgram_pairs(array<string>, window)` → array<struct<a,b>>. */
case class SkipgramPairs(child: Expression, window: Int)
  extends UnaryExpression {
  override def dataType: DataType = PairFunctions.pairType
  override def prettyName: String = "skipgram_pairs"
  override protected def nullSafeEval(input: Any): Any =
    PairKernels.skipgramPairs(input.asInstanceOf[ArrayData], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PairKernels.skipgramPairs($c, $window)")
  override protected def withNewChildInternal(newChild: Expression): SkipgramPairs =
    copy(child = newChild)
}

/** `skipgram_grams(array<string>, window)` → array<struct<a,b>>:
  * unigram markers (b null) + windowed pairs in one emission. */
case class SkipgramGrams(child: Expression, window: Int)
  extends UnaryExpression {
  override def dataType: DataType = PairFunctions.pairType
  override def prettyName: String = "skipgram_grams"
  override protected def nullSafeEval(input: Any): Any =
    PairKernels.skipgramGrams(input.asInstanceOf[ArrayData], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PairKernels.skipgramGrams($c, $window)")
  override protected def withNewChildInternal(newChild: Expression): SkipgramGrams =
    copy(child = newChild)
}

/** `pair_combinations(array<string>)` → array<struct<a,b>> (i < j). */
case class PairCombinations(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PairFunctions.pairType
  override def prettyName: String = "pair_combinations"
  override protected def nullSafeEval(input: Any): Any =
    PairKernels.combinations(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PairKernels.combinations($c)")
  override protected def withNewChildInternal(newChild: Expression): PairCombinations =
    copy(child = newChild)
}

/** `syllable_count(text)` → bigint vowel-group syllable sum. */
case class SyllableCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "syllable_count"
  override protected def nullSafeEval(input: Any): Any =
    PairKernels.syllableCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PairKernels.syllableCount($c)")
  override protected def withNewChildInternal(newChild: Expression): SyllableCount =
    copy(child = newChild)
}
