package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftInternals
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Column-level vector math over `array<float>` / `array<double>`
  * embeddings.
  *
  * Dot product and cosine are native Catalyst expressions: Spark's
  * higher-order functions (`zip_with`/`aggregate`) are CodegenFallback —
  * every row pays interpreted lambda dispatch plus an intermediate
  * zipped array. The kernels below run the same arithmetic as one tight
  * JVM loop inside whole-stage codegen: per element, IEEE-double
  * multiply-accumulate in strict left-to-right order, so results are
  * BIT-IDENTICAL to the HOF composition they replaced (and to the
  * DuckDB oracle's list_dot_product / list_cosine formulation).
  */
object VectorKernels {

  /** Element i as double, for float or double arrays. */
  @inline private def get(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Σ aᵢ·bᵢ, left-to-right from 0.0. Null on length mismatch (the HOF
    * zip_with pads with null, nulling the whole sum). */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, aFloat, i) * get(b, bFloat, i); i += 1 }
    acc
  }

  /** Σ (aᵢ−bᵢ)², left-to-right from 0.0. Null on length mismatch. */
  def l2sq(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = get(a, aFloat, i) - get(b, bFloat, i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** dot(a,b) / (‖a‖·‖b‖), all three accumulators left-to-right — the
    * per-accumulator FP sequences match the three separate HOF loops
    * exactly, so fusing them into one pass is bit-safe. */
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, aFloat, i)
      val y = get(b, bFloat, i)
      d += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }
}

private[functions] trait VectorBinary extends BinaryExpression {
  protected def kernel: String
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float|double> inputs, " +
          s"got ${left.dataType} / ${right.dataType}")
  }
  protected def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    kernel match {
      case "dot" => VectorKernels.dot(aa, isFloat(left), bb, isFloat(right))
      case "l2sq" => VectorKernels.l2sq(aa, isFloat(left), bb, isFloat(right))
      case _ => VectorKernels.cosine(aa, isFloat(left), bb, isFloat(right))
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vkres")
      s"""Object $tmp = graft.functions.VectorKernels.$kernel(
         |  $a, ${isFloat(left)}, $b, ${isFloat(right)});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $tmp).doubleValue(); }
         |""".stripMargin
    })
}

/** `vec_dot(a, b)` — Σ aᵢ·bᵢ in double precision. */
case class VecDot(left: Expression, right: Expression) extends VectorBinary {
  override protected def kernel: String = "dot"
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** `vec_l2sq(a, b)` — squared L2 distance in double precision. */
case class VecL2Sq(left: Expression, right: Expression) extends VectorBinary {
  override protected def kernel: String = "l2sq"
  override def prettyName: String = "vec_l2sq"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

/** `vec_cosine(a, b)` — cosine similarity in double precision. */
case class VecCosine(left: Expression, right: Expression) extends VectorBinary {
  override protected def kernel: String = "cosine"
  override def prettyName: String = "vec_cosine"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision (native, codegen'd). */
  def dot(a: Column, b: Column): Column =
    GraftInternals.column(
      VecDot(GraftInternals.expression(a), GraftInternals.expression(b)))

  /** ‖a‖₂ in double precision. */
  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity in double precision (native, codegen'd). */
  def cosine(a: Column, b: Column): Column =
    GraftInternals.column(
      VecCosine(GraftInternals.expression(a), GraftInternals.expression(b)))

  /** Squared L2 distance in double precision (native, codegen'd). */
  def l2sq(a: Column, b: Column): Column =
    GraftInternals.column(
      VecL2Sq(GraftInternals.expression(a), GraftInternals.expression(b)))
}
