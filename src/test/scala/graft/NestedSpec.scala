package graft

final case class InnerRow(x: Int, y: String)
final case class OuterRow(id: Long, s: InnerRow)
final case class ListRow(id: Long, xs: Seq[Int])

/** E14, E15: struct field access and list accessors (reference
  * tests/e2e/test_nested_pipeline.py). */
class NestedSpec extends SparkSpec {

  object Inner extends GSchema { val x = col[Int]("x"); val y = col[String]("y") }
  object Outer extends GSchema {
    val id = col[Long]("id")
    val s  = colStruct("s", Inner)
  }

  object Lists extends GSchema {
    val id = col[Long]("id")
    val xs = col[Seq[Int]]("xs")
  }

  test("struct field access extracts typed inner columns") {
    import spark.implicits._
    val tf = Tio.fromRows(spark, Outer,
      Seq(OuterRow(1L, InnerRow(5, "a")), OuterRow(2L, InnerRow(9, "b"))))
    val out = tf
      .withCols(Outer.s.field(Inner.x).asName("sx"), Outer.s.field(Inner.y).asName("sy"))
      .filter(gref[Int]("sx") > 5)
      .collectRows()
    assert(out.length == 1)
    assert(out(0).getAs[Int]("sx") == 9 && out(0).getAs[String]("sy") == "b")
  }

  test("list accessors: len/get/contains/sum/mean/min/max") {
    import spark.implicits._
    val tf = Tio.fromRows(spark, Lists,
      Seq(ListRow(1L, Seq(3, 1, 4)), ListRow(2L, Seq(10, 20))))
    val r = tf.select(
      Lists.id,
      Lists.xs.listLen.asName("n"),
      Lists.xs.listGet(0).asName("first"),
      Lists.xs.listContains(4).asName("has4"),
      Lists.xs.listSum.asName("total"),
      Lists.xs.listMean.asName("avg"),
      Lists.xs.listMin.asName("lo"),
      Lists.xs.listMax.asName("hi"),
    ).toNative.orderBy("id").collect()
    assert(r(0).getAs[Int]("n") == 3)
    assert(r(0).getAs[Int]("first") == 3)
    assert(r(0).getAs[Boolean]("has4"))
    assert(r(0).getAs[Int]("total") == 8)
    assert(math.abs(r(0).getAs[Double]("avg") - 8.0 / 3.0) < 1e-12)
    assert(r(1).getAs[Int]("lo") == 10 && r(1).getAs[Int]("hi") == 20)
    assert(!r(1).getAs[Boolean]("has4"))
  }
}
