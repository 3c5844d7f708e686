package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` surface (the standard idiom for
  * libraries shipping native Catalyst expressions — same approach as
  * spark-alchemy / frameless). Everything else in graft stays on the
  * public API; only Column↔Expression conversion and session function
  * registration need this.
  */
object GraftInternals {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Idempotently register a native expression as a SQL function on this
    * session (so `expr("name(...)")` and spark.sql both see it). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!reg.functionExists(id)) {
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  def expressionInfo(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  /** The reliable-checkpoint file backing a checkpoint()ed DataFrame —
    * None for localCheckpoint (block-backed, GC-cleaned) or any
    * non-checkpoint plan. Used by graft.operators.Lineage.Chain to
    * delete superseded iteration checkpoints. */
  def checkpointFile(df: org.apache.spark.sql.DataFrame): Option[String] =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.getCheckpointFile
      case _ => None
    }
}
