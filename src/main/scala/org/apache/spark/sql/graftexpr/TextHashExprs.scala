package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the text-dedup kernels (SURVEY §2.5
  * L2/L3). Native `Expression`s with `doGenCode`, NOT UDFs: they stay
  * inside whole-stage codegen (the generated code is a single static
  * call into [[graft.hashing]]), so the surrounding project/filter
  * pipeline keeps one codegen span and no serialization boundary.
  *
  * Lives under org.apache.spark.sql because `AbstractDataType` is
  * `private[sql]` in Spark 4 — same extension pattern as
  * [[org.apache.spark.sql.graftbridge.Bridge]].
  *
  * This is preference path (b) from the build brief: a scalar op Spark
  * lacks, expressed as a first-class Catalyst expression.
  */
final case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0 && numHashes <= 512, s"numHashes out of range: $numHashes")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.MinHashUtil.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hashing.MinHashUtil.signature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

final case class SimHash64Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.SimHashUtil.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hashing.SimHashUtil.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}
