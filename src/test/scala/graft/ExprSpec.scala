package graft

import java.sql.Timestamp
import java.time.Instant

/** E1–E12 remainder: conditionals without otherwise, membership and
  * range predicates, null assertion, approx distinct, temporal parts. */
class ExprSpec extends SparkSpec {
  import fixtures._
  private def tf = Tio.fromRows(spark, Users, users)(org.apache.spark.sql.Encoders.product[UserRow])

  test("gwhen chain without otherwise defaults to null (done)") {
    val bucket = gwhen(Users.score > 90.0).gthen("high")
      .gwhen(Users.score > 40.0).gthen("mid").done
    val out = tf.withCols(bucket.asName("b")).toNative.orderBy("id")
      .collect().map(r => Option(r.getAs[String]("b")))
    assert(out.toSeq == Seq(Some("mid"), Some("mid"), Some("high"), None))
  }

  test("between and isin membership predicates") {
    assert(tf.filter(Users.score.between(40.0, 90.0)).height == 2L)
    assert(tf.filter(Users.name.isin("ann", "dee", "zz")).height == 2L)
  }

  test("assertNonNull raises on the first null encountered") {
    assert(tf.filter(Users.id.tc === 1L)
      .withCols(Users.age.assertNonNull.asName("a")).collectRows().length == 1)
    val e = intercept[Exception] {
      tf.withCols(Users.age.assertNonNull.asName("a")).collectRows()
    }
    assert(e.getMessage.contains("assert_non_null") ||
      Option(e.getCause).exists(_.getMessage.contains("assert_non_null")))
  }

  test("approxNUnique agrees with exact nUnique on small data") {
    val r = tf.agg(
      Users.id.nUnique.asName("exact"),
      Users.id.approxNUnique.asName("approx")).collectRows()(0)
    assert(r.getAs[Long]("exact") == 4L && r.getAs[Long]("approx") == 4L)
  }

  test("temporal part extraction and epoch") {
    object T extends GSchema { val ts = col[Timestamp]("ts") }
    val inst = Instant.parse("2024-03-05T07:08:09Z")
    val f = Tio.fromDict(spark, T, Map("ts" -> Seq(Timestamp.from(inst))))
    val r = f.select(
      T.ts.dtDay.asName("d"), T.ts.dtHour.asName("h"),
      T.ts.dtMinute.asName("mi"), T.ts.dtSecond.asName("s"),
      T.ts.dtEpoch.asName("ep"),
    ).toNative.collect()(0)
    assert(r.getAs[Int]("d") == 5 && r.getAs[Int]("h") == 7)
    assert(r.getAs[Int]("mi") == 8 && r.getAs[Int]("s") == 9)
    assert(r.getAs[Long]("ep") == inst.getEpochSecond)
  }
}
