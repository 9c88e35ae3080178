package graft

// Encoders require top-level case classes (Spark can't reach instance scope).
final case class VRow(id: Long, v: Double)

/** E10: NaN handling — distinct from null handling (reference
  * schema.py:410-421, tests/unit/test_nan.py shape). */
class NanSpec extends SparkSpec {

  object Vals extends GSchema {
    val id = col[Long]("id")
    val v  = col[Double]("v")
  }

  test("isNaN and fillNaN act on NaN but not null or real values") {
    import spark.implicits._
    val tf = Tio.fromRows(spark, Vals,
      Seq(VRow(1L, 1.5), VRow(2L, Double.NaN), VRow(3L, 0.0)))
    val flagged = tf.withCols(Vals.v.isNaN.asName("bad"))
      .filter(gref[Boolean]("bad"))
      .collectRows()
    assert(flagged.map(_.getAs[Long]("id")).toSeq == Seq(2L))

    val filled = tf.withCols(Vals.v.fillNaN(-1.0).asName("vf"))
      .toNative.orderBy("id").collect().map(_.getAs[Double]("vf")).toSeq
    assert(filled == Seq(1.5, -1.0, 0.0))
  }
}
