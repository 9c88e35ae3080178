package graft

/** F3, F4, F14, F15, F17: introspection actions, sampling, tail, withRaw
  * (reference tests/e2e/test_basic_pipeline.py, dataframe.py:341-496). */
class FrameSpec extends SparkSpec {
  import fixtures._
  private def tf = Tio.fromRows(spark, Users, users)(org.apache.spark.sql.Encoders.product[UserRow])

  test("height/width/shape/isEmpty") {
    val f = tf
    assert(f.height == 4L && f.width == 4 && f.shape == (4L, 4))
    assert(!f.isEmpty)
    assert(f.filter(Users.id > 100L).isEmpty)
  }

  test("item extracts the single scalar and rejects multi-row frames") {
    val one = tf.filter(Users.id.tc === 3L)
    assert(one.item(Users.name) == "cy")
    assertThrows[IllegalArgumentException](tf.item(Users.name))
  }

  test("no-arg item() reads a 1x1 frame and rejects wider/taller ones") {
    val oneByOne = tf.filter(Users.id.tc === 3L).select(Users.name)
    assert(oneByOne.item[String]() == "cy")
    // 1 row, >1 col → reject; >1 row, 1 col → reject
    assertThrows[IllegalArgumentException](tf.filter(Users.id.tc === 3L).item[String]())
    assertThrows[IllegalArgumentException](tf.select(Users.name).item[String]())
  }

  test("sample(n) is seeded-deterministic, exactly n, and count-free") {
    val f = tf
    val s1 = f.sample(2).collectRows().map(_.getLong(0)).toSeq
    val s2 = f.sample(2).collectRows().map(_.getLong(0)).toSeq
    assert(s1.size == 2 && s1 == s2)
    assert(f.sample(3, seed = 7L).collectRows().length == 3)
    // The plan must not contain an aggregate (the old eager-count path).
    val plan = f.sample(2).df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-n plan, got:\n$plan")
  }

  test("tail takes the last n in explicit key order") {
    val ids = tf.tail(2, Users.id).collectRows().map(_.getAs[Long]("id")).toSet
    assert(ids == Set(3L, 4L))
  }

  test("limit and head cap rows") {
    assert(tf.limit(1).height == 1L && tf.head(2).height == 2L)
  }

  test("unique keeps one representative per key") {
    val f = Tio.fromDict(spark, Users, Map(
      "id" -> Seq(1L, 2L, 3L),
      "name" -> Seq("a", "a", "b"),
      "age" -> Seq(10L, 20L, 30L),
      "score" -> Seq(1.0, 1.0, 1.0)))
    assert(f.unique(Users.name).height == 2L)
    assert(f.unique().height == 3L)
  }

  test("dropNulls on a subset of columns") {
    assert(tf.dropNulls(Users.age).height == 3L)
    assert(tf.dropNulls().height == 3L)
  }

  test("withRaw escape hatch preserves the typed wrapper") {
    val f = tf.withRaw(_.where("id <= 2"))
    assert(f.height == 2L)
    assert(f.schemaOpt.contains(Users))
  }

  test("withCols adds and overwrites") {
    val f = tf.withCols((Users.score.tc * glit(2.0)).asName("score2"))
    val r = f.filter(Users.id.tc === 1L).collectRows()(0)
    assert(r.getAs[Double]("score2") == 177.0)
  }
}
