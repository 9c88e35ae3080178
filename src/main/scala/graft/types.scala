package graft

import org.apache.spark.sql.types._

/** Typeclass mapping a Scala phantom type to a Spark SQL `DataType`.
  *
  * Re-expresses colnade's dtype sentinel classes (reference
  * src/colnade/dtypes.py:20-166) as JVM types: the reference uses empty
  * marker classes (UInt8, Utf8, ...) purely for the type checker; on the
  * JVM the natural carriers are the primitive/SQL types themselves.
  * Unsigned widths widen to the next signed type (SURVEY §5).
  */
trait GType[T] extends Serializable { def dataType: DataType }

object GType {
  def apply[T](implicit g: GType[T]): GType[T] = g

  private def inst[T](dt: DataType): GType[T] = new GType[T] {
    val dataType: DataType = dt
  }

  implicit val gByte: GType[Byte]       = inst(ByteType)
  implicit val gShort: GType[Short]     = inst(ShortType)
  implicit val gInt: GType[Int]         = inst(IntegerType)
  implicit val gLong: GType[Long]       = inst(LongType)
  implicit val gFloat: GType[Float]     = inst(FloatType)
  implicit val gDouble: GType[Double]   = inst(DoubleType)
  implicit val gString: GType[String]   = inst(StringType)
  implicit val gBool: GType[Boolean]    = inst(BooleanType)
  implicit val gBinary: GType[Array[Byte]] = inst(BinaryType)
  implicit val gDate: GType[java.sql.Date] = inst(DateType)
  implicit val gTimestamp: GType[java.sql.Timestamp] = inst(TimestampType)
  implicit val gDecimal: GType[BigDecimal] = inst(DecimalType(38, 18))

  /** Time-of-day: Spark SQL has no TIME type — represented as
    * nanos-since-midnight Long (documented widening, SURVEY §5;
    * reference dtypes.py:96-140). */
  implicit val gTime: GType[java.time.LocalTime] = inst(LongType)
  /** Duration → Spark's ANSI day-time interval (full micros range). */
  implicit val gDuration: GType[java.time.Duration] = inst(DayTimeIntervalType())
  /** Year-month spans → ANSI year-month interval. */
  implicit val gPeriod: GType[java.time.Period] = inst(YearMonthIntervalType())

  implicit def gSeq[E](implicit e: GType[E]): GType[Seq[E]] =
    inst(ArrayType(e.dataType))
  implicit def gMap[K, V](implicit k: GType[K], v: GType[V]): GType[Map[K, V]] =
    inst(MapType(k.dataType, v.dataType))
}

/** Phantom type for struct columns parameterized by an inner schema,
  * mirroring colnade `Struct[S]` (reference src/colnade/dtypes.py:142). */
final class GStruct[S <: GSchema] private ()

/** Evidence that T is temporal (gates dt* methods like colnade's
  * _DateSelf/_TimeSelf self-types, reference src/colnade/schema.py:543). */
sealed trait IsTemporal[T]
object IsTemporal {
  implicit val dateT: IsTemporal[java.sql.Date]      = new IsTemporal[java.sql.Date] {}
  implicit val tsT: IsTemporal[java.sql.Timestamp]   = new IsTemporal[java.sql.Timestamp] {}
}

/** Evidence that T is a floating type (gates NaN methods, mirroring
  * colnade _FloatSelf, reference src/colnade/schema.py:539). */
sealed trait IsFloat[T]
object IsFloat {
  implicit val f32: IsFloat[Float]  = new IsFloat[Float] {}
  implicit val f64: IsFloat[Double] = new IsFloat[Double] {}
}
