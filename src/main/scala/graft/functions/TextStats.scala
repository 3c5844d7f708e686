package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text statistics kernel: word count, non-whitespace
  * character count, distinct-word count, and English-stopword count in
  * one tight loop over the document bytes.
  *
  * Replaces the 4-expression composition
  * `split`/`length(regexp_replace)`/`array_distinct`/`filter(isin)`,
  * which materializes the word array three times per row. Here the only
  * allocation is the lowercased copy plus a token-offset table; distinct
  * counting is open-addressing probes into the same byte buffer, so the
  * hot path stays in one cache-resident pass inside whole-stage codegen.
  *
  * Semantics are byte-for-byte those of the composition it replaces
  * (PropertySpec cross-checks on hostile + random inputs):
  *   - tokens follow Java `Pattern.split(lowered, "\\s+", -1)`: a
  *     leading whitespace run yields an empty first token, a trailing
  *     run yields a kept empty last token, the empty string yields one
  *     empty token; whitespace is the Java \s set [ \t\n\x0B\f\r].
  *   - n_alpha counts non-whitespace codepoints of the ORIGINAL text
  *     (UTF-8 lead bytes), = length(regexp_replace(text, "\\s+", "")).
  *   - lowercasing is UTF8String.toLowerCase, identical to lower().
  */
object TextStatsKernel {

  private val stops: Array[Array[Byte]] =
    Array("the", "a", "an", "of", "and", "to", "in", "is")
      .map(_.getBytes("UTF-8"))

  private def isWs(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** (n_words, n_alpha, n_distinct, n_stop) of one document. Public
    * entry point for codegen — static and allocation-light. */
  def stats(text: UTF8String): InternalRow = {
    // pass 1 — original bytes: non-whitespace codepoint count
    val orig = text.getBytes
    var nAlpha = 0
    var i = 0
    while (i < orig.length) {
      val b = orig(i) & 0xff
      if ((b & 0xc0) != 0x80 && !isWs(b)) nAlpha += 1
      i += 1
    }

    // pass 2 — lowered bytes: Pattern.split(-1)-faithful token offsets
    val low = text.toLowerCase.getBytes
    val n = low.length
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    def push(s: Int, e: Int): Unit = {
      if (nTok == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nTok * 2)
        ends = java.util.Arrays.copyOf(ends, nTok * 2)
      }
      starts(nTok) = s; ends(nTok) = e; nTok += 1
    }
    if (n == 0) push(0, 0)
    else {
      var pos = 0
      var j = 0
      while (j < n) {
        if (isWs(low(j) & 0xff)) {
          val s = j
          while (j < n && isWs(low(j) & 0xff)) j += 1
          push(pos, s)
          pos = j
        } else j += 1
      }
      push(pos, n) // empty when text ends in whitespace — limit=-1 keeps it
    }

    // pass 3 — distinct + stopword counts over the token table
    var cap = 4
    while (cap < nTok * 2) cap <<= 1
    val table = new Array[Int](cap)
    java.util.Arrays.fill(table, -1)
    var nDistinct = 0
    var nStop = 0
    var t = 0
    while (t < nTok) {
      val s = starts(t)
      val len = ends(t) - s
      var sw = 0
      var stopped = false
      while (!stopped && sw < stops.length) {
        val w = stops(sw)
        if (w.length == len) {
          var k = 0
          while (k < len && low(s + k) == w(k)) k += 1
          stopped = k == len
        }
        sw += 1
      }
      if (stopped) nStop += 1
      val h = XXH64.hashUnsafeBytes(low, Platform.BYTE_ARRAY_OFFSET + s, len, 42L)
      var idx = h.toInt & (cap - 1)
      var seen = false
      var open = table(idx) != -1
      while (!seen && open) {
        val o = table(idx)
        val os = starts(o)
        if (ends(o) - os == len) {
          var k = 0
          while (k < len && low(os + k) == low(s + k)) k += 1
          seen = k == len
        }
        if (!seen) {
          idx = (idx + 1) & (cap - 1)
          open = table(idx) != -1
        }
      }
      if (!seen) { table(idx) = t; nDistinct += 1 }
      t += 1
    }
    new GenericInternalRow(Array[Any](nTok, nAlpha, nDistinct, nStop))
  }
}

/** Single-pass language-ID statistics: per-language stopword hit
  * counts (en/de/fr/es) plus a CJK-codepoint flag, one loop over the
  * document — replaces four interpreted HOF `filter(isin)` passes and
  * an rlike. Tokenization is identical to [[TextStatsKernel]]
  * (Pattern.split(-1) over the lowercased bytes); the CJK flag scans
  * ORIGINAL text codepoints for U+4E00..U+9FFF exactly like
  * rlike("[\x{4e00}-\x{9fff}]"). The text_langid DuckDB oracle
  * validates parity end-to-end. */
object LangStatsKernel {

  val enStops = Seq("the", "a", "an", "of", "and", "to", "in", "is")
  val deStops = Seq("der", "die", "das", "und", "ist", "nicht", "ein")
  val frStops = Seq("le", "la", "les", "et", "est", "un", "une")
  val esStops = Seq("el", "los", "las", "y", "es", "un", "una")

  private val lists: Array[Array[Array[Byte]]] =
    Array(enStops, deStops, frStops, esStops)
      .map(_.map(_.getBytes("UTF-8")).toArray)

  private def isWs(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def stats(text: UTF8String): InternalRow = {
    // CJK flag over original codepoints (3-byte UTF-8 E4..E9 range)
    val orig = text.getBytes
    var cjk = false
    var i = 0
    while (!cjk && i < orig.length) {
      val b = orig(i) & 0xff
      if ((b & 0xf0) == 0xe0 && i + 2 < orig.length) {
        val cp = ((b & 0x0f) << 12) |
          ((orig(i + 1) & 0x3f) << 6) | (orig(i + 2) & 0x3f)
        if (cp >= 0x4e00 && cp <= 0x9fff) cjk = true
        i += 3
      } else if (b < 0x80) i += 1
      else if ((b & 0xe0) == 0xc0) i += 2
      else if ((b & 0xf8) == 0xf0) i += 4
      else i += 1
    }
    // one tokenize pass over lowered bytes, 4 stop-list counters
    val low = text.toLowerCase.getBytes
    val n = low.length
    val counts = new Array[Int](4)
    def countToken(s: Int, e: Int): Unit = {
      val len = e - s
      var l = 0
      while (l < 4) {
        val ws = lists(l)
        var wi = 0
        var hit = false
        while (!hit && wi < ws.length) {
          val w = ws(wi)
          if (w.length == len) {
            var k = 0
            while (k < len && low(s + k) == w(k)) k += 1
            hit = k == len
          }
          wi += 1
        }
        if (hit) counts(l) += 1
        l += 1
      }
    }
    if (n > 0) {
      var pos = 0
      var j = 0
      while (j < n) {
        if (isWs(low(j) & 0xff)) {
          val s = j
          while (j < n && isWs(low(j) & 0xff)) j += 1
          countToken(pos, s)
          pos = j
        } else j += 1
      }
      countToken(pos, n)
    }
    new GenericInternalRow(
      Array[Any](counts(0), counts(1), counts(2), counts(3), cjk))
  }
}

/** `lang_stats(text)` → struct<s_en, s_de, s_fr, s_es, cjk>. */
case class LangStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lang_stats needs a string input, got ${child.dataType}")
  override def dataType: DataType = LangStats.schema
  override def prettyName: String = "lang_stats"
  override protected def nullSafeEval(input: Any): Any =
    LangStatsKernel.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangStatsKernel.stats($c)")
  override protected def withNewChildInternal(newChild: Expression): LangStats =
    copy(child = newChild)
}

object LangStats {
  val schema: StructType = StructType(Seq(
    StructField("s_en", IntegerType, nullable = false),
    StructField("s_de", IntegerType, nullable = false),
    StructField("s_fr", IntegerType, nullable = false),
    StructField("s_es", IntegerType, nullable = false),
    StructField("cjk", BooleanType, nullable = false)))

  /** Column wrapper. */
  def langStats(text: Column): Column =
    GraftInternals.column(LangStats(GraftInternals.expression(text)))
}

/** `text_stats(text)` → struct<n_words, n_alpha, n_distinct, n_stop>. */
case class TextStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"text_stats needs a string input, got ${child.dataType}")
  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "text_stats"
  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsKernel.stats($c)")
  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))

  /** Column wrapper. */
  def textStats(text: Column): Column =
    GraftInternals.column(TextStats(GraftInternals.expression(text)))
}
