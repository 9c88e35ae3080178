package object graft {

  /** Widen a schema-bound descriptor into a typed expression, giving
    * GCol the full operator surface of colnade's Column
    * (reference src/colnade/schema.py:128-487) with zero wrapping cost. */
  implicit def gcolToTyped[T](g: GCol[T]): TypedCol[T] = g.tc

  /** Literal expression — colnade lit() (reference src/colnade/expr.py:425). */
  def glit[T](v: T): TypedCol[T] =
    new TypedCol[T](org.apache.spark.sql.functions.lit(v))
}
