package graft

final case class LRow(id: Long, v: Int)
final case class RRow(rid: Long, v: Int, tag: String)

/** F11, F12: JoinedFrame two-schema ops, right-side rename tracking,
  * castSchema flatten with ambiguity rules (reference
  * dataframe.py:1188-1412, tests/e2e/test_join_pipeline.py shape). */
class JoinSpec extends SparkSpec {

  object L extends GSchema {
    val id = col[Long]("id")
    val v  = col[Int]("v")
  }
  object R extends GSchema {
    val rid = col[Long]("rid")
    val v   = col[Int]("v") // name collision with L.v
    val tag = col[String]("tag")
  }

  private def frames = {
    import spark.implicits._
    val l = Tio.fromRows(spark, L, Seq(LRow(1L, 10), LRow(2L, 20), LRow(3L, 30)))
    val r = Tio.fromRows(spark, R, Seq(RRow(1L, 7, "a"), RRow(2L, 99, "b")))
    (l, r)
  }

  test("inner join renames colliding right columns and keeps both") {
    val (l, r) = frames
    val jf = l.join(r, L.id === R.rid)
    assert(jf.df.columns.toSeq == Seq("id", "v", "rid", "v__r", "tag"))
    assert(jf.df.count() == 2L)
  }

  test("JoinedFrame ops resolve collided names by explicit side") {
    val (l, r) = frames
    val jf = l.join(r, L.id === R.rid)
    // a bare reference to a collided name is ambiguous → rejected fast
    val e = intercept[IllegalArgumentException](jf.filter(R.v.tc > 50))
    assert(e.getMessage.contains("Ambiguous"))
    // side-explicit accessors resolve through the join rename
    assert(jf.filter(jf.right(R.v) > 50).df.count() == 1L)
    assert(jf.filter(jf.left(L.v) > 15).df.count() == 1L)
    val agg = jf.groupBy(R.tag)
      .agg(jf.left(L.v).sum.asName("lv"), jf.right(R.v).sum.asName("rv"))
      .toNative.orderBy("tag").collect()
    assert(agg.map(_.getAs[Long]("lv")).toSeq == Seq(10L, 20L)) // Spark widens sum(int)→long
    assert(agg.map(_.getAs[Long]("rv")).toSeq == Seq(7L, 99L))
    // GCol-typed args carry ownership → no accessor needed
    assert(jf.dropNulls(R.v).df.count() == 2L)
  }

  test("JoinedFrame.unique keeps one representative per key, groupBy-first plan") {
    val (l, r) = frames
    val jf = l.join(r, L.id === R.rid, how = "left") // 3 rows, tag: a, b, null
    val u = jf.unique(R.tag)
    assert(u.df.count() == 3L) // tags a/b/null all distinct here
    val byTag = jf.unique(L.id) // id unique already: row-preserving
    assert(byTag.df.count() == 3L)
    assert(byTag.df.columns.toSeq == jf.df.columns.toSeq) // column order preserved
    // the plan aggregates (first per group), it does not sort/window rows
    val plan = u.df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Sort"), s"unexpected plan:\n$plan")
  }

  test("left join keeps unmatched rows with nulls") {
    val (l, r) = frames
    val jf = l.join(r, L.id === R.rid, how = "left")
    assert(jf.df.count() == 3L)
    assert(jf.df.where("tag IS NULL").count() == 1L)
  }

  test("castSchema flatten: ambiguous names need explicit resolution") {
    val (l, r) = frames
    val jf = l.join(r, L.id === R.rid)
    object Flat extends GSchema {
      val id  = col[Long]("id")
      val v   = col[Int]("v") // ambiguous: exists on both sides
      val tag = col[String]("tag")
    }
    val e = intercept[GSchemaError](jf.castSchema(Flat))
    assert(e.missingColumns == Seq("v"))
    // explicit mapping to the right-side v resolves via the join rename
    val out = jf.castSchema(Flat, mapping = Map[GCol[_], GCol[_]](Flat.v -> R.v))
    assert(out.toNative.orderBy("id").collect().map(_.getAs[Int]("v")).toSeq == Seq(7, 99))
    // ... and to the LEFT v by ownership, not by name membership
    val outL = jf.castSchema(Flat, mapping = Map[GCol[_], GCol[_]](Flat.v -> L.v))
    assert(outL.toNative.orderBy("id").collect().map(_.getAs[Int]("v")).toSeq == Seq(10, 20))
  }

  test("semi and anti joins partition the left frame") {
    val (l, r) = frames
    assert(l.semiJoin(r, L.id === R.rid).height == 2L)
    assert(l.antiJoin(r, L.id === R.rid).height == 1L)
  }

  test("outer join keeps both unmatched sides") {
    import spark.implicits._
    val l = Tio.fromRows(spark, L, Seq(LRow(1L, 10), LRow(3L, 30)))
    val r = Tio.fromRows(spark, R, Seq(RRow(1L, 7, "a"), RRow(9L, 5, "z")))
    val jf = l.join(r, L.id === R.rid, how = "outer")
    assert(jf.df.count() == 3L)
    assert(jf.df.where("id IS NULL").count() == 1L)
    assert(jf.df.where("rid IS NULL").count() == 1L)
  }

  test("cross join ignores the condition") {
    val (l, r) = frames
    assert(l.join(r, L.id === R.rid, how = "cross").df.count() == 6L) // 3×2
  }

  test("composite-key join conditions combine with &&") {
    import spark.implicits._
    val l = Tio.fromRows(spark, L, Seq(LRow(1L, 7), LRow(1L, 8), LRow(2L, 7)))
    val r = Tio.fromRows(spark, R, Seq(RRow(1L, 7, "a"), RRow(2L, 7, "b"), RRow(2L, 9, "c")))
    val jf = l.join(r, (L.id === R.rid) && (L.v === R.v))
    assert(jf.df.select("tag").collect().map(_.getString(0)).toSet == Set("a", "b"))
  }
}
