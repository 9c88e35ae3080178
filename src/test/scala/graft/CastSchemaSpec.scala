package graft

final case class SrcRow(a: Int, b: String, c: Double)

/** S5: castSchema 4-step mapping resolution — explicit > mappedFrom >
  * name match > inheritance (reference dataframe.py:234-290,
  * tests/unit/test_cast_schema.py shape). */
class CastSchemaSpec extends SparkSpec {

  object Src extends GSchema {
    val a = col[Int]("a")
    val b = col[String]("b")
    val c = col[Double]("c")
  }
  private def src = {
    import spark.implicits._
    Tio.fromRows(spark, Src, Seq(SrcRow(1, "x", 1.5), SrcRow(2, "y", 2.5)))
  }

  test("name match + mappedFrom + widening cast") {
    object Dst extends GSchema {
      val a2 = col[Long]("a2").from(Src.a) // rename + widen Int→Long
      val b  = col[String]("b")            // name match
    }
    val out = src.castSchema(Dst)
    assert(out.df.columns.toSeq == Seq("a2", "b"))
    assert(out.df.schema("a2").dataType == org.apache.spark.sql.types.LongType)
    assert(out.toNative.orderBy("a2").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("explicit mapping wins over name match") {
    object Dst2 extends GSchema {
      val b = col[String]("b") // would name-match b, but remap to... b is a string; map from itself is trivial
      val v = col[Double]("v")
    }
    val out = src.castSchema(Dst2, mapping = Map[GCol[_], GCol[_]](Dst2.v -> Src.c))
    assert(out.toNative.orderBy("v").collect().map(_.getDouble(1)).toSeq == Seq(1.5, 2.5))
  }

  test("unmappable target column raises missingColumns") {
    object DstBad extends GSchema { val zzz = col[Long]("zzz") }
    val e = intercept[GSchemaError](src.castSchema(DstBad))
    assert(e.missingColumns == Seq("zzz"))
  }

  test("extraForbid rejects unconsumed source columns") {
    object DstNarrow extends GSchema { val a = col[Int]("a") }
    val e = intercept[GSchemaError](src.castSchema(DstNarrow, extraForbid = true))
    assert(e.extraColumns.toSet == Set("b", "c"))
    src.castSchema(DstNarrow) // without extraForbid: fine
  }
}
