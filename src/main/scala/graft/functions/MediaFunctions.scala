package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftInternals
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Column-level media fingerprints.
  *
  * The batch multimodal paths decode per-partition in batches
  * (Multimodal.imagePhashes — the mapInPandas shape). The STREAMING
  * admission path needs the same fingerprint as a composable COLUMN so
  * arbitrary payload columns survive (`withColumn` on an unbounded
  * stream), which a fixed-schema mapPartitions can't give — so the
  * codec call rides in a native expression instead: plan stays
  * UDF-free, and the per-row decode cost is identical (the work is the
  * codec, not the row overhead batching amortizes). */
object MediaKernels {
  /** Rotation-canonical 64-bit aHash of an image blob, boxed — null for
    * non-image, undecodable, or decompression-bomb blobs (shares the
    * bounded decode of the batch path). */
  def imageAHash64(blob: Array[Byte]): java.lang.Long =
    graft.operators.Multimodal.ImageDecoder.decodeImage(blob) match {
      case Some((_, img)) =>
        java.lang.Long.valueOf(
          graft.operators.Multimodal.ImageDecoder.aHash64(img))
      case None => null
    }

  /** Volume-rescale-invariant 64-bit energy-envelope fingerprint of a
    * WAV blob, boxed — null for non-audio / unsupported-format blobs
    * (same fmt-chunk validation and bounds checks as the batch path). */
  def audioFp64(blob: Array[Byte]): java.lang.Long =
    graft.operators.Multimodal.audioFp64(blob) match {
      case Some(fp) => java.lang.Long.valueOf(fp)
      case None     => null
    }
}

/** `image_ahash64(binary)` → rotation-canonical aHash, null for
  * non-images — the column form of Multimodal.imagePhashes. */
case class ImageAHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_ahash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"image_ahash64 needs a binary input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    MediaKernels.imageAHash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("ahash")
      s"""
         |java.lang.Long $boxed = graft.functions.MediaKernels.imageAHash64($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageAHash64 =
    copy(child = newChild)
}

/** `audio_fp64(binary)` → volume-invariant energy-envelope
  * fingerprint, null for non-audio — the column form of
  * Multimodal.audioFingerprints. */
case class AudioFp64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_fp64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"audio_fp64 needs a binary input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    MediaKernels.audioFp64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("afp")
      s"""
         |java.lang.Long $boxed = graft.functions.MediaKernels.audioFp64($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioFp64 =
    copy(child = newChild)
}

object MediaFunctions {
  /** Column wrapper: rotation-canonical 64-bit image aHash (null for
    * non-image blobs). */
  def imageAHash64(blob: Column): Column =
    GraftInternals.column(ImageAHash64(GraftInternals.expression(blob)))

  /** Column wrapper: volume-invariant 64-bit audio energy-envelope
    * fingerprint (null for non-audio blobs). */
  def audioFp64(blob: Column): Column =
    GraftInternals.column(AudioFp64(GraftInternals.expression(blob)))
}
