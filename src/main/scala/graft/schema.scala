package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Value-level constraints for a column — colnade Field()/FieldInfo
  * (reference src/colnade/constraints.py:22-172). Checked distributively
  * by [[Validator]] in a single aggregation pass. */
final case class GField(
    ge: Option[Any] = None,
    gt: Option[Any] = None,
    le: Option[Any] = None,
    lt: Option[Any] = None,
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None,
    pattern: Option[String] = None,
    unique: Boolean = false,
    isin: Option[Seq[Any]] = None,
) {
  require(!(ge.isDefined && gt.isDefined), "Cannot specify both 'ge' and 'gt'")
  require(!(le.isDefined && lt.isDefined), "Cannot specify both 'le' and 'lt'")
  pattern.foreach(p => java.util.regex.Pattern.compile(p))

  def hasConstraints: Boolean =
    ge.isDefined || gt.isDefined || le.isDefined || lt.isDefined ||
      minLength.isDefined || maxLength.isDefined || pattern.isDefined ||
      unique || isin.isDefined
}

/** A typed, schema-bound column descriptor — colnade Column[DType]
  * (reference src/colnade/schema.py:128-487).
  *
  * All expression-building comes from the implicit widening to
  * [[TypedCol]] (see [[graft.syntax]]); `GCol` itself only adds what
  * needs schema identity: join conditions and cast_schema mapping.
  */
final class GCol[T](
    val name: String,
    val owner: GSchema,
    val dataType: DataType,
    val nullable: Boolean,
    val fieldInfo: Option[GField],
    val mappedFrom: Option[GCol[_]],
) extends Serializable {

  def column: Column = col(name)
  def tc: TypedCol[T] = new TypedCol[T](col(name))

  /** Cross-schema equality → join predicate, mirroring colnade's
    * Column.__eq__ JoinCondition branch (reference schema.py:229-238).
    * For a same-schema value predicate use `a === b.tc`. */
  def ===[U](other: GCol[U]): JoinCond = JoinCond(Seq(this.name -> other.name))

  /** Declare this column as mapped from a source column for castSchema
    * resolution — colnade mapped_from (reference schema.py:62). */
  def from(source: GCol[_]): GCol[T] = {
    val c = new GCol[T](name, owner, dataType, nullable, fieldInfo, Some(source))
    owner.replaceCol(c)
    c
  }

  /** Attach value-level constraints — colnade Field() (constraints.py:134). */
  def field(f: GField): GCol[T] = {
    val c = new GCol[T](name, owner, dataType, nullable, Some(f), mappedFrom)
    owner.replaceCol(c)
    c
  }

  override def toString = s"GCol($name: ${dataType.simpleString}, ${owner.schemaName})"
}

/** Multi-key equi-join condition — colnade JoinCondition
  * (reference src/colnade/expr.py:388-405), extended to composite keys
  * via `&&`. */
final case class JoinCond(pairs: Seq[(String, String)]) {
  def &&(other: JoinCond): JoinCond = JoinCond(pairs ++ other.pairs)
}

/** Cross-column constraint — colnade @schema_check
  * (reference src/colnade/constraints.py:99-126). */
final case class SchemaCheck(name: String, expr: () => TypedCol[Boolean])

/** Base class for user-defined schemas — colnade Schema + SchemaMeta
  * (reference src/colnade/schema.py:659-824).
  *
  * Where the reference uses a metaclass to turn annotations into Column
  * descriptors, graft uses plain object initialization: each `col[T]`
  * call registers a descriptor. Declare schemas as Scala objects::
  *
  *   object Users extends GSchema {
  *     val id   = col[Long]("id").field(GField(unique = true))
  *     val name = col[String]("name")
  *     val age  = colNullable[Long]("age")
  *   }
  */
abstract class GSchema extends Serializable {
  private val cols = mutable.LinkedHashMap.empty[String, GCol[_]]
  private val checksBuf = mutable.ListBuffer.empty[SchemaCheck]

  def schemaName: String = getClass.getSimpleName.stripSuffix("$")

  protected def col[T](name: String)(implicit g: GType[T]): GCol[T] =
    register(new GCol[T](name, this, g.dataType, nullable = false, None, None))

  protected def colNullable[T](name: String)(implicit g: GType[T]): GCol[T] =
    register(new GCol[T](name, this, g.dataType, nullable = true, None, None))

  /** Struct column parameterized by an inner schema — colnade
    * Struct[S] (reference dtypes.py:142). */
  protected def colStruct[S <: GSchema](name: String, inner: S): GCol[GStruct[S]] =
    register(new GCol[GStruct[S]](name, this, inner.structType, nullable = false, None, None))

  protected def colStructNullable[S <: GSchema](name: String, inner: S): GCol[GStruct[S]] =
    register(new GCol[GStruct[S]](name, this, inner.structType, nullable = true, None, None))

  /** Cross-column constraint used by FULL validation. */
  protected def check(name: String)(e: => TypedCol[Boolean]): Unit =
    checksBuf += SchemaCheck(name, () => e)

  private def register[T](c: GCol[T]): GCol[T] = { cols(c.name) = c; c }
  private[graft] def replaceCol(c: GCol[_]): Unit = cols(c.name) = c

  def columns: Seq[GCol[_]] = cols.values.toSeq
  def columnMap: Map[String, GCol[_]] = cols.toMap
  def columnNames: Seq[String] = cols.keys.toSeq
  def schemaChecks: Seq[SchemaCheck] = checksBuf.toSeq

  def structType: StructType =
    StructType(columns.map(c => StructField(c.name, c.dataType, c.nullable)))

  override def toString =
    s"$schemaName(${columns.map(c => s"${c.name}: ${c.dataType.simpleString}").mkString(", ")})"
}

/** Schema validation failure — colnade SchemaError
  * (reference src/colnade/schema.py:79-120). */
final case class GSchemaError(
    missingColumns: Seq[String] = Nil,
    extraColumns: Seq[String] = Nil,
    typeMismatches: Map[String, (String, String)] = Map.empty,
    nullViolations: Seq[String] = Nil,
    valueViolations: Seq[ValueViolation] = Nil,
) extends Exception {
  override def getMessage: String = {
    val parts = Seq(
      if (missingColumns.nonEmpty) Some(s"Missing columns: ${missingColumns.mkString(", ")}") else None,
      if (extraColumns.nonEmpty) Some(s"Extra columns: ${extraColumns.mkString(", ")}") else None,
      if (typeMismatches.nonEmpty)
        Some("Type mismatches: " + typeMismatches.map { case (c, (e, g)) => s"$c: expected $e, got $g" }.mkString("; "))
      else None,
      if (nullViolations.nonEmpty) Some(s"Null violations: ${nullViolations.mkString(", ")}") else None,
      if (valueViolations.nonEmpty)
        Some("Value violations: " + valueViolations
          .map(v => s"${v.column} [${v.constraint}]: ${v.gotCount} violations, sample=${v.sampleValues.take(5)}")
          .mkString("; "))
      else None,
    ).flatten
    if (parts.isEmpty) "Schema validation failed" else parts.mkString(" | ")
  }
}

/** A single value-constraint failure — colnade ValueViolation
  * (reference src/colnade/constraints.py:84-91). */
final case class ValueViolation(
    column: String,
    constraint: String,
    gotCount: Long,
    sampleValues: Seq[Any],
)
