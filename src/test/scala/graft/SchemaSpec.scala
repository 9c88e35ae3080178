package graft

import org.apache.spark.sql.types._

/** S1–S3, S6: descriptor registry, dtype mapping, StructType, nullability
  * (reference tests/unit/test_schema.py shapes). */
class SchemaSpec extends SparkSpec {
  import fixtures._

  test("columns register in declaration order with names") {
    assert(Users.columnNames == Seq("id", "name", "age", "score"))
    assert(Users.columns.map(_.dataType) ==
      Seq(LongType, StringType, LongType, DoubleType))
  }

  test("structType carries nullability") {
    val st = Users.structType
    assert(st.fieldNames.toSeq == Seq("id", "name", "age", "score"))
    assert(!st("id").nullable && st("age").nullable)
  }

  test("GType maps the full dtype surface") {
    assert(GType[Byte].dataType == ByteType)
    assert(GType[Short].dataType == ShortType)
    assert(GType[Int].dataType == IntegerType)
    assert(GType[Long].dataType == LongType)
    assert(GType[Float].dataType == FloatType)
    assert(GType[Double].dataType == DoubleType)
    assert(GType[String].dataType == StringType)
    assert(GType[Boolean].dataType == BooleanType)
    assert(GType[Array[Byte]].dataType == BinaryType)
    assert(GType[java.sql.Date].dataType == DateType)
    assert(GType[java.sql.Timestamp].dataType == TimestampType)
    // SURVEY §5 widenings: Time → nanos-since-midnight Long; Duration/
    // Period → ANSI intervals.
    assert(GType[java.time.LocalTime].dataType == LongType)
    assert(GType[java.time.Duration].dataType == DayTimeIntervalType())
    assert(GType[java.time.Period].dataType == YearMonthIntervalType())
    assert(GType[Seq[Int]].dataType == ArrayType(IntegerType))
    assert(GType[Map[String, Long]].dataType == MapType(StringType, LongType))
  }

  test("struct columns embed the inner schema's StructType") {
    object Inner extends GSchema { val x = col[Int]("x"); val y = col[String]("y") }
    object Outer extends GSchema {
      val id = col[Long]("id")
      val s  = colStruct("s", Inner)
    }
    assert(Outer.s.dataType == Inner.structType)
    assert(Outer.structType("s").dataType.isInstanceOf[StructType])
  }

  test("collectColumnNames walks an expression tree") {
    val e = (Users.score.tc * glit(2.0) + Users.age.tc.cast[Double]) > 10.0
    assert(e.collectColumnNames.toSet == Set("score", "age"))
    assert(glit(1).collectColumnNames.isEmpty)
  }

  test("field() and from() replace the registered descriptor") {
    object S extends GSchema { val a = col[Long]("a") }
    object T extends GSchema { val b = col[Long]("b").from(S.a) }
    assert(T.columnMap("b").mappedFrom.map(_.name).contains("a"))
    assert(Users.columnMap("id").fieldInfo.exists(_.unique))
  }
}
