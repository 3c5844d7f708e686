package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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

object HashFunctions {
  /** Column wrapper: winnowed rolling-hash fingerprints (k-byte windows,
    * winnow width w). */
  def rollingFingerprint(text: Column, k: Int = 8, w: Int = 4): Column =
    GraftInternals.column(
      RollingFingerprint(GraftInternals.expression(text), k, w))
}
