package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._

import graft.hashing.PslRules

/** Registered-domain (eTLD+1) lookup against a full public-suffix
  * list (SURVEY §2.5 L30) — a native codegen'd `Expression` carrying
  * the parsed [[PslRules]] as a plan reference object, the same
  * ship-the-set-with-the-plan pattern as Spark's own `InSet` (and the
  * IVF/PQ codebook expressions in [[TextHashExprs]]): ~10⁴ rules ≈
  * 200 KB ride to executors with the serialized plan, the per-row cost
  * is O(#labels) hash probes, and the column stays a pure narrow
  * projection — no join, no shuffle, fully whole-stage-codegen'd. */
final case class PslDomainExpr(child: Expression, rules: PslRules)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  // NULL for hosts that ARE a public suffix, whatever the child's nullability
  override def nullable: Boolean = true
  override def prettyName: String = "psl_registered_domain"

  override protected def nullSafeEval(input: Any): Any =
    rules.registeredDomainU(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("pslRules", rules, classOf[PslRules].getName)
      s"""
         |${ev.value} = $ref.registeredDomainU($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PslDomainExpr =
    copy(child = newChild)
}
