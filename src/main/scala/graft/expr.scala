package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Typed expression wrapper — the Spark-native analogue of colnade's
  * expression AST (reference src/colnade/expr.py:24-150).
  *
  * Where the reference builds its own AST nodes (BinOp/UnaryOp/Literal/
  * FunctionCall) and translates them per-backend, graft's "AST" IS the
  * Catalyst expression tree: every op maps immediately to a
  * `org.apache.spark.sql.Column`, so Catalyst optimization (pushdown,
  * pruning, codegen) applies with zero interpretation overhead. The
  * phantom type `T` carries the static dtype exactly like `Expr[DType]`.
  */
final class TypedCol[T](val c: Column) extends Serializable {

  // --- Comparisons (reference expr.py:44-60) → TypedCol[Boolean] ---
  def >(o: TypedCol[T]): TypedCol[Boolean]  = new TypedCol(c > o.c)
  def <(o: TypedCol[T]): TypedCol[Boolean]  = new TypedCol(c < o.c)
  def >=(o: TypedCol[T]): TypedCol[Boolean] = new TypedCol(c >= o.c)
  def <=(o: TypedCol[T]): TypedCol[Boolean] = new TypedCol(c <= o.c)
  def ===(o: TypedCol[T]): TypedCol[Boolean] = new TypedCol(c === o.c)
  def =!=(o: TypedCol[T]): TypedCol[Boolean] = new TypedCol(c =!= o.c)

  def >(v: T): TypedCol[Boolean]  = new TypedCol(c > lit(v))
  def <(v: T): TypedCol[Boolean]  = new TypedCol(c < lit(v))
  def >=(v: T): TypedCol[Boolean] = new TypedCol(c >= lit(v))
  def <=(v: T): TypedCol[Boolean] = new TypedCol(c <= lit(v))
  def ===(v: T): TypedCol[Boolean] = new TypedCol(c === lit(v))
  def =!=(v: T): TypedCol[Boolean] = new TypedCol(c =!= lit(v))

  def isin(vs: T*): TypedCol[Boolean] = new TypedCol(c.isin(vs.map(_.asInstanceOf[Any]): _*))
  def between(lo: T, hi: T): TypedCol[Boolean] = new TypedCol(c.between(lit(lo), lit(hi)))

  // --- Arithmetic (reference expr.py:64-95), type-preserving ---
  def +(o: TypedCol[T]): TypedCol[T] = new TypedCol(c + o.c)
  def -(o: TypedCol[T]): TypedCol[T] = new TypedCol(c - o.c)
  def *(o: TypedCol[T]): TypedCol[T] = new TypedCol(c * o.c)
  def /(o: TypedCol[T]): TypedCol[Double] = new TypedCol(c / o.c)
  def %(o: TypedCol[T]): TypedCol[T] = new TypedCol(c % o.c)
  def +(v: T): TypedCol[T] = new TypedCol(c + lit(v))
  def -(v: T): TypedCol[T] = new TypedCol(c - lit(v))
  def *(v: T): TypedCol[T] = new TypedCol(c * lit(v))
  def /(v: T): TypedCol[Double] = new TypedCol(c / lit(v))
  def %(v: T): TypedCol[T] = new TypedCol(c % lit(v))
  def unary_- : TypedCol[T] = new TypedCol(-c)

  // --- Logical (reference expr.py:33-40), Boolean-only via evidence ---
  def &&(o: TypedCol[Boolean])(implicit ev: T =:= Boolean): TypedCol[Boolean] =
    new TypedCol(c.cast(org.apache.spark.sql.types.BooleanType) && o.c)
  def ||(o: TypedCol[Boolean])(implicit ev: T =:= Boolean): TypedCol[Boolean] =
    new TypedCol(c.cast(org.apache.spark.sql.types.BooleanType) || o.c)
  def unary_!(implicit ev: T =:= Boolean): TypedCol[Boolean] = new TypedCol(!c)

  // --- Aggregations (reference schema.py:287-315) ---
  def sum(implicit n: Numeric[T]): TypedCol[T]      = new TypedCol(F.sum(c))
  def mean(implicit n: Numeric[T]): TypedCol[Double] = new TypedCol(avg(c))
  def min: TypedCol[T]   = new TypedCol(F.min(c))
  def max: TypedCol[T]   = new TypedCol(F.max(c))
  def count: TypedCol[Long] = new TypedCol(F.count(c))
  def std(implicit n: Numeric[T]): TypedCol[Double] = new TypedCol(stddev_samp(c))
  def variance(implicit n: Numeric[T]): TypedCol[Double] = new TypedCol(var_samp(c))
  def first: TypedCol[T] = new TypedCol(F.first(c))
  def last: TypedCol[T]  = new TypedCol(F.last(c))
  def nUnique: TypedCol[Long] = new TypedCol(count_distinct(c))
  def approxNUnique: TypedCol[Long] = new TypedCol(approx_count_distinct(c))

  // --- String methods (reference schema.py:324-346), Utf8-gated ---
  def strContains(p: String)(implicit ev: T =:= String): TypedCol[Boolean] =
    new TypedCol(c.contains(p))
  def strStartsWith(p: String)(implicit ev: T =:= String): TypedCol[Boolean] =
    new TypedCol(c.startsWith(p))
  def strEndsWith(p: String)(implicit ev: T =:= String): TypedCol[Boolean] =
    new TypedCol(c.endsWith(p))
  def strLen(implicit ev: T =:= String): TypedCol[Int] = new TypedCol(length(c))
  def strToLowercase(implicit ev: T =:= String): TypedCol[String] = new TypedCol(lower(c))
  def strToUppercase(implicit ev: T =:= String): TypedCol[String] = new TypedCol(upper(c))
  def strStrip(implicit ev: T =:= String): TypedCol[String] = new TypedCol(trim(c))
  def strReplace(pattern: String, replacement: String)(implicit ev: T =:= String): TypedCol[String] =
    new TypedCol(regexp_replace(c, pattern, replacement))

  // --- Temporal methods (reference schema.py:355-376) ---
  def dtYear(implicit ev: IsTemporal[T]): TypedCol[Int]   = new TypedCol(year(c))
  def dtMonth(implicit ev: IsTemporal[T]): TypedCol[Int]  = new TypedCol(month(c))
  def dtDay(implicit ev: IsTemporal[T]): TypedCol[Int]    = new TypedCol(dayofmonth(c))
  def dtHour(implicit ev: IsTemporal[T]): TypedCol[Int]   = new TypedCol(hour(c))
  def dtMinute(implicit ev: IsTemporal[T]): TypedCol[Int] = new TypedCol(minute(c))
  def dtSecond(implicit ev: IsTemporal[T]): TypedCol[Int] = new TypedCol(second(c))
  def dtTruncate(interval: String)(implicit ev: IsTemporal[T]): TypedCol[java.sql.Timestamp] =
    new TypedCol(date_trunc(interval, c))
  def dtFormat(fmt: String)(implicit ev: IsTemporal[T]): TypedCol[String] =
    new TypedCol(date_format(c, fmt))
  def dtEpoch(implicit ev: IsTemporal[T]): TypedCol[Long] = new TypedCol(unix_timestamp(c))

  // --- Null handling (reference schema.py:380-406) ---
  def isNull: TypedCol[Boolean]    = new TypedCol(c.isNull)
  def isNotNull: TypedCol[Boolean] = new TypedCol(c.isNotNull)
  def fillNull(v: T): TypedCol[T]  = new TypedCol(coalesce(c, lit(v)))
  def fillNull(o: TypedCol[T]): TypedCol[T] = new TypedCol(coalesce(c, o.c))
  /** Runtime non-null assertion: raises on first null encountered, like
    * colnade assert_non_null (reference schema.py:403). */
  def assertNonNull: TypedCol[T] =
    new TypedCol(when(c.isNull, raise_error(lit("assert_non_null failed"))).otherwise(c))

  // --- NaN handling (reference schema.py:410-421), float-gated ---
  def isNaN(implicit ev: IsFloat[T]): TypedCol[Boolean] = new TypedCol(c.isNaN)
  def fillNaN(v: T)(implicit ev: IsFloat[T]): TypedCol[T] =
    new TypedCol(when(c.isNaN, lit(v)).otherwise(c))

  // --- General (reference schema.py:425-456) ---
  def cast[T2](implicit g: GType[T2]): TypedCol[T2] = new TypedCol(c.cast(g.dataType))
  def round(scale: Int)(implicit n: Numeric[T]): TypedCol[T] = new TypedCol(F.round(c, scale))
  def as_(target: GCol[T]): Aliased = Aliased(c, target.name)
  def asName(name: String): Aliased = Aliased(c, name)

  /** Unordered window: aggregate over partition, mirroring colnade
    * `.over(*partition_by)` (reference schema.py:440). */
  def over(partitionBy: GCol[_]*): TypedCol[T] =
    new TypedCol(c.over(Window.partitionBy(partitionBy.map(_.column): _*)))
  /** Ordered window over a full WindowSpec (Spark superset: frames). */
  def overW(w: org.apache.spark.sql.expressions.WindowSpec): TypedCol[T] =
    new TypedCol(c.over(w))

  def desc: GSort = GSort(c.desc)
  def asc: GSort  = GSort(c.asc)

  /** Names of the source columns this expression references — colnade
    * collect_column_names (reference src/colnade/expr.py). */
  def collectColumnNames: Seq[String] =
    org.apache.spark.sql.graftbridge.Bridge.catalystExpr(c).collect {
      case org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(parts) => parts.mkString(".")
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a.name
    }.distinct

  // --- Struct field access (reference schema.py:461-472) ---
  def field[U](inner: GCol[U]): TypedCol[U] = new TypedCol(c.getField(inner.name))

  // --- List ops (reference schema.py:584-603, ListAccessor) ---
  def listLen[E](implicit ev: T <:< Seq[E]): TypedCol[Int] = new TypedCol(size(c))
  def listGet[E](i: Int)(implicit ev: T <:< Seq[E]): TypedCol[E] = new TypedCol(c.getItem(i))
  def listContains[E](v: E)(implicit ev: T <:< Seq[E]): TypedCol[Boolean] =
    new TypedCol(array_contains(c, v))
  def listSum[E](implicit ev: T <:< Seq[E], n: Numeric[E], g: GType[E]): TypedCol[E] =
    new TypedCol(aggregate(c, lit(n.zero).cast(g.dataType), (acc, x) => acc + x))
  def listMean[E](implicit ev: T <:< Seq[E], n: Numeric[E]): TypedCol[Double] =
    new TypedCol(
      aggregate(c, lit(0.0), (acc, x) => acc + x.cast(org.apache.spark.sql.types.DoubleType)) / size(c))
  def listMin[E](implicit ev: T <:< Seq[E]): TypedCol[E] = new TypedCol(array_min(c))
  def listMax[E](implicit ev: T <:< Seq[E]): TypedCol[E] = new TypedCol(array_max(c))
}

/** Aliased expression bound to an output column name — colnade
  * AliasedExpr (reference src/colnade/expr.py:241). */
final case class Aliased(c: Column, name: String) {
  def column: Column = c.as(name)
}

/** Sort-direction wrapper — colnade SortExpr (reference expr.py:254). */
final case class GSort(c: Column)

/** Typed window spec — colnade `.over(*partition_by)` generalized to
  * Spark's ordered windows + frames (reference schema.py:440; frames are
  * a Spark superset, SURVEY §2.2 E13). */
final case class GWindow(ws: org.apache.spark.sql.expressions.WindowSpec) {
  def orderBy(keys: SortKey*): GWindow = GWindow(ws.orderBy(keys.map(_.sortCol): _*))
  def rowsBetween(lo: Long, hi: Long): GWindow = GWindow(ws.rowsBetween(lo, hi))
}
object GWindow {
  def partitionBy(cols: GCol[_]*): GWindow =
    GWindow(Window.partitionBy(cols.map(_.column): _*))
}

/** Window functions over a [[GWindow]] — rank/row_number/lag/lead and a
  * running sum (Spark window frames; superset of reference's over()). */
object gfn {
  def rowNumber(w: GWindow): TypedCol[Int] = new TypedCol(row_number().over(w.ws))
  def rank(w: GWindow): TypedCol[Int] = new TypedCol(F.rank().over(w.ws))
  def denseRank(w: GWindow): TypedCol[Int] = new TypedCol(dense_rank().over(w.ws))
  def lag[T](c: TypedCol[T], n: Int, w: GWindow): TypedCol[T] = new TypedCol(F.lag(c.c, n).over(w.ws))
  def lead[T](c: TypedCol[T], n: Int, w: GWindow): TypedCol[T] = new TypedCol(F.lead(c.c, n).over(w.ws))
  def runningSum[T: Numeric](c: TypedCol[T], w: GWindow): TypedCol[T] =
    new TypedCol(F.sum(c.c).over(w.ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  /** (rank−1)/(rows−1) in [0,1]; single-row partitions yield 0.0.
    * An exact integer ratio → cross-engine reproducible. */
  def percentRank(w: GWindow): TypedCol[Double] = new TypedCol(percent_rank().over(w.ws))
  /** rows ≤ current / total rows — the CDF position (ties share it). */
  def cumeDist(w: GWindow): TypedCol[Double] = new TypedCol(cume_dist().over(w.ws))
  /** 1-based bucket over the partition's order; sizes differ by ≤1. */
  def ntile(n: Int, w: GWindow): TypedCol[Int] = {
    require(n > 0, s"ntile buckets must be positive, got $n")
    new TypedCol(F.ntile(n).over(w.ws))
  }
}

/** Conditional builder — colnade when/then/otherwise
  * (reference src/colnade/expr.py:305-380). Compiles to Catalyst
  * CaseWhen, fully codegen'd. */
object gwhen {
  def apply(cond: TypedCol[Boolean]): WhenBuilder = new WhenBuilder(cond)

  final class WhenBuilder(cond: TypedCol[Boolean]) {
    def gthen[T](v: T): WhenChain[T] = new WhenChain[T](when(cond.c, lit(v)))
    def gthen[T](v: TypedCol[T]): WhenChain[T] = new WhenChain[T](when(cond.c, v.c))
  }

  final class WhenChain[T](private[graft] val c: Column) {
    def gwhen(cond: TypedCol[Boolean]): ChainedWhen[T] = new ChainedWhen[T](c, cond)
    def gotherwise(v: T): TypedCol[T] = new TypedCol(c.otherwise(lit(v)))
    def gotherwise(v: TypedCol[T]): TypedCol[T] = new TypedCol(c.otherwise(v.c))
    /** No otherwise → null default, like reference _WhenBuilder.then. */
    def done: TypedCol[T] = new TypedCol(c)
  }

  final class ChainedWhen[T](prior: Column, cond: TypedCol[Boolean]) {
    def gthen(v: T): WhenChain[T] = new WhenChain[T](prior.when(cond.c, lit(v)))
    def gthen(v: TypedCol[T]): WhenChain[T] = new WhenChain[T](prior.when(cond.c, v.c))
  }
}
