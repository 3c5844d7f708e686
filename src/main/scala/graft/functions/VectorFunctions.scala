package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftInternals
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

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

  /** Squared L2 distance between a raw query vector and an SQ8-PACKED
    * corpus vector (8 byte-codes per long, little-endian), decoding
    * inline: recon_i = mn_i + step_i·code_i. Arithmetic and order are
    * IDENTICAL to decode-then-l2sq (per dim: one FMA-shaped recon, one
    * subtract, one square, left-to-right accumulate), so swapping this
    * kernel for the HOF decode changes nothing but the plan — which is
    * the point: CollapseProject inlines a decode PROJECTION into the
    * per-pair distance call (the decode then runs once per candidate
    * PAIR instead of once per vector, measured 73 s → ~2 s at 20 k),
    * while this kernel makes the per-pair cost the 64-iteration tight
    * loop it should be, inside whole-stage codegen. */
  def sq8L2sq(q: ArrayData, qFloat: Boolean, packed: ArrayData,
              mn: Array[Double], step: Array[Double]): Any = {
    val dim = mn.length
    if (q.numElements() != dim || packed.numElements() != dim / 8) return null
    var acc = 0.0
    var g = 0
    var i = 0
    val groups = dim / 8
    while (g < groups) {
      var w = packed.getLong(g)
      var j = 0
      while (j < 8) {
        val recon = mn(i) + step(i) * (w & 255L).toDouble
        val d = get(q, qFloat, i) - recon
        acc += d * d
        w >>>= 8
        i += 1; j += 1
      }
      g += 1
    }
    acc
  }

  /** L sign-bucket codes for a flat row-major (L·b × dim) hyperplane
    * matrix: bit j of code t = sign(Σᵢ vᵢ·P[t·b+j][i]). Same per-plane
    * left-to-right double MAC as `dot`, so the codes are bit-identical
    * to the unrolled when(dot(v, plane) > 0, ...) composition this
    * replaces — which blew janino's 64 KB method limit once the DERIVED
    * L·b left the clamp floor (48 tables × 7 bits × 64 dims unrolled).
    * One matrix loop over a constant-pool reference keeps any L·b·dim
    * inside whole-stage codegen. Length mismatch → all-zero codes (the
    * unrolled form's null-dot → otherwise(0) branch). */
  def hyperplaneCodes(v: ArrayData, isFloat: Boolean, planes: Array[Double],
                      numTables: Int, bits: Int, dim: Int): ArrayData = {
    val out = new Array[Long](numTables)
    if (v.numElements() == dim) {
      var t = 0
      while (t < numTables) {
        var code = 0L
        var j = 0
        while (j < bits) {
          val off = (t * bits + j) * dim
          var acc = 0.0
          var i = 0
          while (i < dim) { acc += get(v, isFloat, i) * planes(off + i); i += 1 }
          if (acc > 0) code |= 1L << j
          j += 1
        }
        out(t) = code
        t += 1
      }
    }
    ArrayData.toArrayData(out)
  }

  /** Multi-probe codes for the LSH QUERY side (Lv et al. 2007,
    * "Multi-probe LSH", VLDB): per table, the exact bucket code
    * followed by the nProbe−1 single-bit flips with the smallest
    * |projection| margin — the buckets a near neighbor most likely
    * fell into when a low-margin sign disagreed. Probing these on the
    * query side buys the recall of many tables while the CORPUS keeps
    * one code per table (index size ∝ L, the real at-rest cost).
    * Output: array<long> of length numTables·nProbe, table of element
    * i = i / nProbe; element order within a table is margin-ascending.
    * Same per-plane MAC as hyperplaneCodes, so probe 0 of each table
    * is bit-identical to the single-code kernel. */
  def hyperplaneProbeCodes(v: ArrayData, isFloat: Boolean,
                           planes: Array[Double], numTables: Int,
                           bits: Int, dim: Int, nProbe: Int): ArrayData = {
    val out = new Array[Long](numTables * nProbe)
    if (v.numElements() == dim) {
      val proj = new Array[Double](bits)
      val order = new Array[Int](bits)
      var t = 0
      while (t < numTables) {
        var code = 0L
        var j = 0
        while (j < bits) {
          val off = (t * bits + j) * dim
          var acc = 0.0
          var i = 0
          while (i < dim) { acc += get(v, isFloat, i) * planes(off + i); i += 1 }
          proj(j) = acc
          if (acc > 0) code |= 1L << j
          order(j) = j
          j += 1
        }
        // insertion sort of bit indices by |projection| ascending
        // (bits ≤ 20: trivially cheap, deterministic tie by index)
        var a = 1
        while (a < bits) {
          val idx = order(a)
          val key = math.abs(proj(idx))
          var pos = a - 1
          while (pos >= 0 && (math.abs(proj(order(pos))) > key)) {
            order(pos + 1) = order(pos); pos -= 1
          }
          order(pos + 1) = idx
          a += 1
        }
        out(t * nProbe) = code
        var k = 1
        while (k < nProbe) {
          out(t * nProbe + k) =
            if (k - 1 < bits) code ^ (1L << order(k - 1)) else code
          k += 1
        }
        t += 1
      }
    }
    ArrayData.toArrayData(out)
  }

  /** The `nProbe` nearest centroid cells by (L2², cell) ascending, for a
    * flat row-major (k × dim) centroid matrix — the kernel twin of the
    * lexicographic (d2, cell) struct array_sort it replaces (cells scan
    * ascending and insertion is strict, so equal distances keep the
    * lower cell, matching the struct ordering). O(k·nProbe) partial
    * selection; same left-to-right (aᵢ−bᵢ)² accumulation as `l2sq`.
    * A dim-mismatched vector yields an EMPTY array — explode then
    * produces no probe rows, and under non-ANSI SQL
    * element_at(empty, 1) is NULL, NOT an error — so every caller
    * that writes the result must guard the mismatch itself
    * (AnnIndex.guardedCell raises on the write path; the query paths
    * `require` on the collected query rows). The empty array exists
    * so the failure is at least inert: the earlier behavior returned
    * nProbe copies of cell 0, which duplicated candidates into the
    * top-k and mis-assigned vectors silently. */
  def nearestCells(v: ArrayData, isFloat: Boolean, centroids: Array[Double],
                   k: Int, dim: Int, nProbe: Int): ArrayData = {
    if (v.numElements() != dim)
      return ArrayData.toArrayData(Array.empty[Int])
    val m = math.min(nProbe, k)
    val bestD = Array.fill(m)(Double.PositiveInfinity)
    val bestC = new Array[Int](m)
    locally {
      var c = 0
      while (c < k) {
        val off = c * dim
        var acc = 0.0
        var i = 0
        while (i < dim) {
          val d = get(v, isFloat, i) - centroids(off + i)
          acc += d * d
          i += 1
        }
        if (acc < bestD(m - 1)) {
          var pos = m - 1
          while (pos > 0 && bestD(pos - 1) > acc) {
            bestD(pos) = bestD(pos - 1)
            bestC(pos) = bestC(pos - 1)
            pos -= 1
          }
          bestD(pos) = acc
          bestC(pos) = c
        }
        c += 1
      }
    }
    ArrayData.toArrayData(bestC)
  }

  /** v − centroids[cell] as a double array, for a flat row-major
    * (k × dim) centroid matrix — the residual a vector quantizes
    * against its coarse cell (IVFPQ encodes residuals, not raw
    * vectors: the PQ codebooks then only need to cover the
    * within-cell displacement, a much tighter distribution). Empty
    * array on dim mismatch or out-of-range cell (same inert-failure
    * contract as nearestCells — callers that persist the result guard
    * the mismatch on the write path). */
  def cellResidual(v: ArrayData, isFloat: Boolean, centroids: Array[Double],
                   k: Int, dim: Int, cell: Int): ArrayData = {
    if (v.numElements() != dim || cell < 0 || cell >= k)
      return ArrayData.toArrayData(Array.empty[Double])
    val out = new Array[Double](dim)
    val off = cell * dim
    var i = 0
    while (i < dim) { out(i) = get(v, isFloat, i) - centroids(off + i); i += 1 }
    ArrayData.toArrayData(out)
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

/** `sq8_l2sq(q, packed)` — squared L2 distance between a raw query
  * and an SQ8-packed corpus vector, decoding inline against the
  * (mn, step) ranges riding as codegen reference objects (see
  * [[VectorKernels.sq8L2sq]] for why this beats decode-then-vec_l2sq). */
case class Sq8L2Sq(left: Expression, right: Expression,
                   mn: Array[Double], step: Array[Double])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_l2sq"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (array<float|double>, array<long>), got ($l, $r)")
    }
  private def qFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override protected def nullSafeEval(q: Any, p: Any): Any =
    VectorKernels.sq8L2sq(q.asInstanceOf[ArrayData], qFloat,
      p.asInstanceOf[ArrayData], mn, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sq8mn", mn, "double[]")
    val stRef = ctx.addReferenceObj("sq8step", step, "double[]")
    nullSafeCodeGen(ctx, ev, (q, p) => {
      val tmp = ctx.freshName("sq8res")
      s"""Object $tmp = graft.functions.VectorKernels.sq8L2sq(
         |  $q, $qFloat, $p, $mnRef, $stRef);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $tmp).doubleValue(); }
         |""".stripMargin
    })
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8L2Sq =
    copy(left = newLeft, right = newRight)
}

private[functions] trait VectorMatrixUnary extends UnaryExpression {
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs an array<float|double> input, got $t")
    }
  protected def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** `hyperplane_codes(v)` — one LSH bucket code per table for a plane
  * matrix riding as a codegen reference object (never an unrolled
  * literal tree; see [[VectorKernels.hyperplaneCodes]]). */
case class HyperplaneCodes(child: Expression, planes: Array[Double],
                           numTables: Int, bits: Int, dim: Int)
    extends VectorMatrixUnary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_codes"
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.hyperplaneCodes(
      v.asInstanceOf[ArrayData], isFloat, planes, numTables, bits, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.VectorKernels.hyperplaneCodes(
         |  $v, $isFloat, $ref, $numTables, $bits, $dim);""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneCodes =
    copy(child = newChild)
}

/** `hyperplane_probes(v)` — multi-probe LSH codes for the query side
  * (see [[VectorKernels.hyperplaneProbeCodes]]). */
case class HyperplaneProbes(child: Expression, planes: Array[Double],
                            numTables: Int, bits: Int, dim: Int, nProbe: Int)
    extends VectorMatrixUnary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_probes"
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.hyperplaneProbeCodes(
      v.asInstanceOf[ArrayData], isFloat, planes, numTables, bits, dim, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.VectorKernels.hyperplaneProbeCodes(
         |  $v, $isFloat, $ref, $numTables, $bits, $dim, $nProbe);""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneProbes =
    copy(child = newChild)
}

/** `nearest_cells(v, nProbe)` — the nProbe nearest centroid ids for a
  * centroid matrix riding as a codegen reference object (see
  * [[VectorKernels.nearestCells]]). */
case class NearestCells(child: Expression, centroids: Array[Double],
                        k: Int, dim: Int, nProbe: Int)
    extends VectorMatrixUnary {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCells(
      v.asInstanceOf[ArrayData], isFloat, centroids, k, dim, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.VectorKernels.nearestCells(
         |  $v, $isFloat, $ref, $k, $dim, $nProbe);""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** `cell_residual(v, cell)` — v − centroids[cell] for a centroid
  * matrix riding as a codegen reference object (see
  * [[VectorKernels.cellResidual]]). */
case class CellResidual(left: Expression, right: Expression,
                        centroids: Array[Double], k: Int, dim: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "cell_residual"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (array<float|double>, int), got $l / $r")
    }
  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override protected def nullSafeEval(v: Any, c: Any): Any =
    VectorKernels.cellResidual(
      v.asInstanceOf[ArrayData], isFloat, centroids, k, dim,
      c.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"""${ev.value} = graft.functions.VectorKernels.cellResidual(
         |  $v, $isFloat, $ref, $k, $dim, $c);""".stripMargin)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellResidual =
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

  /** Squared L2 distance of a raw query against an SQ8-packed vector,
    * decoding inline against (mn, step) reference arrays (native,
    * codegen'd; bit-identical to decode-then-l2sq). */
  def sq8L2sq(q: Column, packed: Column,
              mn: Array[Double], step: Array[Double]): Column =
    GraftInternals.column(Sq8L2Sq(GraftInternals.expression(q),
      GraftInternals.expression(packed), mn, step))

  /** One LSH bucket code per table (array<long>, index = table) for a
    * row-major (L·b × dim) plane matrix (native, codegen'd). */
  def hyperplaneCodes(v: Column, planes: Array[Double],
                      numTables: Int, bits: Int, dim: Int): Column =
    GraftInternals.column(
      HyperplaneCodes(GraftInternals.expression(v), planes, numTables, bits, dim))

  /** The nProbe nearest centroid ids (array<int>, (L2², cell) ascending)
    * for a row-major (k × dim) centroid matrix (native, codegen'd). */
  def nearestCells(v: Column, centroids: Array[Double],
                   k: Int, dim: Int, nProbe: Int): Column =
    GraftInternals.column(
      NearestCells(GraftInternals.expression(v), centroids, k, dim, nProbe))

  /** Multi-probe LSH query codes: nProbe codes per table (exact code +
    * lowest-margin bit flips), array<long> of length L·nProbe with
    * table = index / nProbe (native, codegen'd). */
  def hyperplaneProbes(v: Column, planes: Array[Double], numTables: Int,
                       bits: Int, dim: Int, nProbe: Int): Column =
    GraftInternals.column(HyperplaneProbes(
      GraftInternals.expression(v), planes, numTables, bits, dim, nProbe))

  /** v − centroids[cell] (array<double>) for a row-major (k × dim)
    * centroid matrix (native, codegen'd). */
  def cellResidual(v: Column, cell: Column, centroids: Array[Double],
                   k: Int, dim: Int): Column =
    GraftInternals.column(CellResidual(
      GraftInternals.expression(v), GraftInternals.expression(cell),
      centroids, k, dim))
}
