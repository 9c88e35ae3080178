package graft

import org.apache.spark.sql.functions._
import graft.operators.Timeline

/** L33 batch event-timeline ops: gap sessionization (break placement,
  * zero-gap ties, NULL-time drop, cents exactness), ordered funnel
  * (strictly-after chaining, depth, within-limit, no-step-1 users),
  * rolling RANGE-frame aggregates (boundary inclusion, tie symmetry). */
class TimelineSpec extends SparkSpec {
  import spark.implicits._

  // one user, gaps:  5 -. 10 .- 100(brk) -. 5 .- 200(brk)
  private val ev = Seq(
    (1L, 0L, Some(1.0)), (1L, 5L, Some(2.0)), (1L, 15L, None),
    (1L, 115L, Some(0.105)), (1L, 120L, Some(4.0)), (1L, 320L, Some(5.0)),
    (2L, 7L, Some(9.0))).toDF("user_id", "t", "value")

  test("sessionize: breaks where gap exceeded, 1-based per key") {
    val got = Timeline.sessionize(ev, Seq("user_id"), "t", gap = 50L)
      .select("user_id", "t", "session_idx").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set(
      (1L, 0L, 1L), (1L, 5L, 1L), (1L, 15L, 1L),
      (1L, 115L, 2L), (1L, 120L, 2L), (1L, 320L, 3L),
      (2L, 7L, 1L)))
  }

  test("sessionize: NULL time dropped; gap exactly equal does NOT break") {
    val d = Seq((1L, Some(0L)), (1L, Some(50L)), (1L, None))
      .toDF("user_id", "t")
    val got = Timeline.sessionize(d, Seq("user_id"), "t", gap = 50L)
    assert(got.count() == 2)   // NULL-time row gone
    assert(got.agg(max("session_idx")).head.getLong(0) == 1L) // 50 <= gap
  }

  test("sessionStats: rollup bounds/counts; cents rounded per event; NULL value = 0") {
    val got = Timeline.sessionStats(ev, Seq("user_id"), "t", gap = 50L, valueCol = "value")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // session 1 of user 1: values 1.0 + 2.0 + NULL -> 300 cents
    // session 2: 0.105 -> 11 cents (rounded per event) + 4.0 -> 411
    assert(got == Set(
      (1L, 1L, 0L, 15L, 3L, 300L),
      (1L, 2L, 115L, 120L, 2L, 411L),
      (1L, 3L, 320L, 320L, 1L, 500L),
      (2L, 1L, 7L, 7L, 1L, 900L)))
  }

  private val funnelEv = Seq(
    // u1: full path in order
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
    // u2: b BEFORE a, then no b after -> depth 1
    (2L, 5L, "b"), (2L, 10L, "a"),
    // u3: b at the SAME time as a (not strictly after) -> depth 1
    (3L, 10L, "a"), (3L, 10L, "b"),
    // u4: no a at all -> depth 0
    (4L, 1L, "b"), (4L, 2L, "c")).toDF("user_id", "t", "typ")

  private def steps = Seq(
    "a" -> (col("typ") === "a"), "b" -> (col("typ") === "b"),
    "c" -> (col("typ") === "c"))

  test("funnel: strictly-after chaining, depth, zero-depth denominator row") {
    val got = Timeline.funnel(funnelEv, Seq("user_id"), "t", steps)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((Option(r.getAs[java.lang.Long]("t_a")),
          Option(r.getAs[java.lang.Long]("t_b")),
          Option(r.getAs[java.lang.Long]("t_c")),
          r.getAs[Int]("depth")))).toMap
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L), 3)))
    assert(got(2L) == ((Some(10L), None, None, 1)))
    assert(got(3L) == ((Some(10L), None, None, 1)))
    assert(got(4L) == ((None, None, None, 0)))
    assert(got.size == 4)
  }

  test("funnel: within bounds later steps relative to step 1") {
    val d = Seq((1L, 0L, "a"), (1L, 100L, "b"), (1L, 101L, "c"))
      .toDF("user_id", "t", "typ")
    val tight = Timeline.funnel(d, Seq("user_id"), "t", steps, within = Some(99L)).head()
    assert(tight.getAs[Int]("depth") == 1)   // b at 100 > 0+99
    val loose = Timeline.funnel(d, Seq("user_id"), "t", steps, within = Some(101L)).head()
    assert(loose.getAs[Int]("depth") == 3)
  }

  test("funnel: earliest qualifying step-2 is chosen, not just any") {
    // a@10; b@5 (before a, ignored), b@15, b@25 -> t_b = 15
    val d = Seq((1L, 5L, "b"), (1L, 10L, "a"), (1L, 15L, "b"), (1L, 25L, "b"))
      .toDF("user_id", "t", "typ")
    val r = Timeline.funnel(d, Seq("user_id"), "t", steps).head()
    assert(r.getAs[Long]("t_b") == 15L)
  }

  test("rolling: value-based frame includes boundary, excludes older; ties symmetric") {
    val d = Seq((1L, 0L, 1.0), (1L, 50L, 2.0), (1L, 100L, 4.0),
      (1L, 100L, 8.0), (1L, 161L, 16.0)).toDF("user_id", "t", "value")
    val got = Timeline.rolling(d, Seq("user_id"), "t", back = 100L,
        "n" -> count(lit(1)), "s" -> sum(col("value")))
      .select("t", "value", "n", "s").as[(Long, Double, Long, Double)]
      .collect().toSet
    assert(got == Set(
      (0L, 1.0, 1L, 1.0),
      (50L, 2.0, 2L, 3.0),
      (100L, 4.0, 4L, 15.0),   // both t=100 rows see each other
      (100L, 8.0, 4L, 15.0),
      (161L, 16.0, 3L, 28.0))) // [61,161]: the two 100s + itself
  }

  test("retention: hand-built triangle — anchors, offsets, distinct actives") {
    // bucket=10. u1 signs up at 12 (cohort 1), active at 12,19 (off 0),
    // 25 (off 1); pre-signup event at 5 excluded. u2 signs up at 13
    // (cohort 1), active at 13 only. u3 never signs up -> excluded.
    val d = Seq(
      (1L, 5L, "x"), (1L, 12L, "signup"), (1L, 19L, "x"), (1L, 25L, "x"),
      (2L, 13L, "signup"),
      (3L, 7L, "x")).toDF("user_id", "t", "typ")
    val got = Timeline.retention(d, Seq("user_id"), "t",
        col("typ") === "signup", bucket = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 2L), (1L, 1L, 1L)))
  }

  test("retention: a second signup does not re-anchor; multi-event offsets dedup") {
    val d = Seq(
      (1L, 10L, "signup"), (1L, 40L, "signup"),  // anchor stays 10
      (1L, 41L, "x"), (1L, 43L, "x")             // both in offset 3, count once
    ).toDF("user_id", "t", "typ")
    val got = Timeline.retention(d, Seq("user_id"), "t",
        col("typ") === "signup", bucket = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 1L), (1L, 3L, 1L)))
  }

  test("sessionize/funnel: partition-count invariance") {
    val wide = ev.repartition(13)
    val a = Timeline.sessionStats(ev, Seq("user_id"), "t", 50L, "value")
      .collect().map(_.toSeq).toSet
    val b = Timeline.sessionStats(wide, Seq("user_id"), "t", 50L, "value")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    val fa = Timeline.funnel(funnelEv, Seq("user_id"), "t", steps)
      .collect().map(_.toSeq).toSet
    val fb = Timeline.funnel(funnelEv.repartition(7), Seq("user_id"), "t", steps)
      .collect().map(_.toSeq).toSet
    assert(fa == fb)
  }
}
