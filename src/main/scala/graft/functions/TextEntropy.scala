package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass character-entropy kernel: Shannon entropy (bits) of the
  * printable-ASCII byte distribution of one document — the classic
  * cheap gibberish/encoding-junk detector (base64 blobs and
  * minified/binary spill score near 6 bits; natural language sits
  * around 4.0-4.5; char-looped spam collapses toward 0).
  *
  * Scoped to printable ASCII (0x20..0x7E) deliberately: "character"
  * frequency over raw multi-byte UTF-8 would mix code-unit and
  * codepoint semantics between engines (Spark splits UTF-16 strings,
  * DuckDB splits UTF-8 graphemes), so the cross-engine contract is
  * pinned to the byte range where every engine agrees. Non-ASCII text
  * still gets a useful score from its ASCII interleave (spaces,
  * punctuation, digits); a CJK-only doc degenerates to n_printable=0,
  * entropy 0, and is the langid path's problem, not this one's.
  *
  * Float determinism follows the repo-wide logprob discipline
  * (SURVEY.md "Float determinism"): each term -p*log2(p) rounds to 9 dp
  * and the terms sum EXACTLY (scaled-long arithmetic), so partial-agg
  * order cannot flip the result; the DuckDB oracle mirrors
  * round(term, 9) into a DECIMAL(28,9) sum. log2 is computed as
  * ln(p)/ln(2) on both sides so the libm call chains match.
  *
  * One histogram pass over the document bytes inside whole-stage
  * codegen — no token array, no explode, no shuffle: the 100 TB cost is
  * exactly one scan (the ideal map-only quality-signal shape, same
  * class as [[TextStatsKernel]]).
  */
object CharEntropyKernel {

  private val LN2 = math.log(2.0)

  /** (n_printable, entropy-bits as Decimal(28,9)) of one document. */
  def stats(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val hist = new Array[Int](95) // 0x20..0x7E
    var total = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b >= 0x20 && b <= 0x7e) { hist(b - 0x20) += 1; total += 1 }
      i += 1
    }
    var sumNanos = 0L // Σ round(-p·log2 p, 9dp) · 1e9 — exact
    if (total > 0) {
      var c = 0
      while (c < 95) {
        val n = hist(c)
        if (n > 0 && n < total) {
          val p = n.toDouble / total
          val term = -(p * (math.log(p) / LN2))
          sumNanos += math.round(term * 1e9)
        }
        // n == total ⇒ p = 1 ⇒ term = 0 exactly on both engines
        c += 1
      }
    }
    new GenericInternalRow(Array[Any](total, Decimal(sumNanos, 28, 9)))
  }
}

/** `char_entropy(text)` → struct<n_printable int, ent decimal(28,9)>. */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy needs a string input, got ${child.dataType}")
  override def dataType: DataType = CharEntropy.schema
  override def prettyName: String = "char_entropy"
  override protected def nullSafeEval(input: Any): Any =
    CharEntropyKernel.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropyKernel.stats($c)")
  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  val schema: StructType = StructType(Seq(
    StructField("n_printable", IntegerType, nullable = false),
    StructField("ent", DecimalType(28, 9), nullable = false)))

  /** Column wrapper. */
  def charEntropy(text: Column): Column =
    GraftInternals.column(CharEntropy(GraftInternals.expression(text)))
}

/** Static deflate kernel for [[DeflateRatio]] — whole-stage codegen
  * calls it directly. Level 6 (zlib default), raw stream (nowrap):
  * deterministic for a fixed JDK zlib, which is all the rows-only
  * contract needs. */
object DeflateKernel {
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}

/** `deflate_ratio(text)` → compressed_bytes / raw_bytes under DEFLATE —
  * the classic cheap quality/redundancy signal (used alongside
  * perplexity in CCNet-style curation): boilerplate and template spam
  * compress far below natural prose, random gibberish barely
  * compresses at all. One tight JVM loop per row inside whole-stage
  * codegen; map-only at any corpus size. */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deflate_ratio needs a string input, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"
  override protected def nullSafeEval(input: Any): Any =
    DeflateKernel.ratio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateKernel.ratio($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  /** Column wrapper. */
  def deflateRatio(text: Column): Column =
    GraftInternals.column(DeflateRatio(GraftInternals.expression(text)))
}
