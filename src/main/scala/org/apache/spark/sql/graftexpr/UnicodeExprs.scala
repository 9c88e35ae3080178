package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Unicode text-canonicalization kernels (SURVEY §2.5 L35) — native
  * codegen'd `Expression`s (not UDFs) calling
  * [[graft.hashing.UnicodeUtil]], same extension pattern as
  * [[TextHashExprs]]. Normalization is pre-dedup hygiene: "café"
  * composed and decomposed are different byte strings — different
  * fingerprints, different MinHash shingles — until NFC folds them. */
final case class UnicodeNormExpr(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(Set("NFC", "NFD", "NFKC", "NFKD")(form), s"unknown normalization form: $form")

  // string→enum resolved ONCE here; the kernel takes the ordinal so the
  // per-row path (interpreted and codegen'd alike) is array-index cheap
  private val formOrdinal: Int = java.text.Normalizer.Form.valueOf(form).ordinal

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.UnicodeUtil.normalize(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], formOrdinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hashing.UnicodeUtil.normalize($c, $formOrdinal)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormExpr =
    copy(child = newChild)
}

/** NFD → drop combining marks → NFC ("café" → "cafe"); non-decomposable
  * letters (ø, ł) pass through — they are not accents. */
final case class StripAccentsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.UnicodeUtil.stripAccents(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hashing.UnicodeUtil.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}
