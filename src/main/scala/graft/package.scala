package object graft {

  /** Widen a schema-bound descriptor into a typed expression, giving
    * GCol the full operator surface of colnade's Column
    * (reference src/colnade/schema.py:128-487) with zero wrapping cost. */
  implicit def gcolToTyped[T](g: GCol[T]): TypedCol[T] = g.tc

  /** Literal expression — colnade lit() (reference src/colnade/expr.py:425). */
  def glit[T](v: T): TypedCol[T] =
    new TypedCol[T](org.apache.spark.sql.functions.lit(v))

  /** Typed reference to a derived column by name (e.g. one introduced by
    * withCols/groupBySel) — the typed escape hatch for columns that have
    * no schema descriptor yet. */
  def gref[T](name: String): TypedCol[T] =
    new TypedCol[T](org.apache.spark.sql.functions.col(name))
}
