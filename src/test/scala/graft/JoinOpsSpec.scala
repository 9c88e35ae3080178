package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** L32 temporal joins: as-of semantics (at-or-before, ties, tolerance,
  * struct atomicity, left rows without matches) and binned range-join
  * equivalence to the naive predicate across bin widths. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    ("A", 1L, 10.0, "q1"), ("A", 5L, 50.0, "q2"),
    ("B", 3L, 30.0, "q3")).toDF("k", "t", "v", "tag")
  private val probes = Seq(
    ("A", 0L, 100), ("A", 1L, 101), ("A", 3L, 102), ("A", 7L, 103),
    ("B", 2L, 104), ("C", 9L, 105)).toDF("k", "t", "pid")

  private def asof(tol: Option[Long] = None) =
    Joins.asofJoin(probes, quotes, Seq("k"), "t", Seq("v", "tag"), tolerance = tol)
      .collect().map(r => r.getAs[Int]("pid") ->
        ((Option(r.getAs[java.lang.Long]("asof_t")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)))).toMap

  test("asofJoin: at-or-before match per key, left rows keep NULLs") {
    val got = asof()
    assert(got(100) == ((None, None)))            // before any quote
    assert(got(101) == ((Some(1L), Some(10.0))))  // equal timestamp matches
    assert(got(102) == ((Some(1L), Some(10.0))))
    assert(got(103) == ((Some(5L), Some(50.0))))
    assert(got(104) == ((None, None)))            // B's quote is later
    assert(got(105) == ((None, None)))            // key with no quotes at all
    assert(got.size == 6)
  }

  test("asofJoin: tolerance nulls out stale matches") {
    val got = asof(tol = Some(2L))
    assert(got(103) == ((Some(5L), Some(50.0)))) // 7-5=2 <= tol
    assert(got(102) == ((Some(1L), Some(10.0)))) // 3-1=2 <= tol
    val tight = asof(tol = Some(1L))
    assert(tight(102) == ((None, None)))         // 3-1=2 > 1: stale
    assert(tight(101) == ((Some(1L), Some(10.0)))) // exact-time match has age 0
  }

  test("asofJoin: matched columns are atomic — one right row even with NULL values") {
    val q = Seq(("A", 1L, Some(10.0), "q1"), ("A", 5L, None, "q2"))
      .toDF("k", "t", "v", "tag")
    val p = Seq(("A", 7L, 1)).toDF("k", "t", "pid")
    val r = Joins.asofJoin(p, q, Seq("k"), "t", Seq("v", "tag")).head()
    // latest quote q2 has NULL v: v must NOT fall back to q1's 10.0
    assert(r.getAs[String]("asof_tag") == "q2")
    assert(r.isNullAt(r.fieldIndex("asof_v")))
  }

  test("asofJoin: tieBreak picks max among equal timestamps; result partition-invariant") {
    val q = Seq(("A", 1L, 10.0, 1L), ("A", 1L, 99.0, 2L)).toDF("k", "t", "v", "seq")
    val p = Seq(("A", 2L, 1)).toDF("k", "t", "pid")
    val r = Joins.asofJoin(p, q, Seq("k"), "t", Seq("v"), tieBreak = Some("seq")).head()
    assert(r.getAs[Double]("asof_v") == 99.0)
    val a = asof()
    val b = Joins.asofJoin(probes.repartition(7), quotes.repartition(3),
      Seq("k"), "t", Seq("v", "tag"))
      .collect().map(r => r.getAs[Int]("pid") ->
        ((Option(r.getAs[java.lang.Long]("asof_t")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)))).toMap
    assert(a == b)
  }

  private val intervals = Seq(
    ("A", 0L, 10L, "i1"), ("A", 8L, 12L, "i2"), ("B", 5L, 5L, "i3"),
    ("A", 20L, 19L, "inverted")).toDF("k", "s", "e", "iid")
  private val pts = Seq(
    ("A", 0L, 1), ("A", 9L, 2), ("A", 10L, 3), ("A", 13L, 4),
    ("B", 5L, 5), ("B", 4L, 6)).toDF("k", "p", "pid")

  private def rj(w: Long) =
    Joins.rangeJoin(pts, intervals, Seq("k"), "p", "s", "e", binWidth = w)
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getString(1))).toSet

  test("rangeJoin: inclusive containment per key; inverted intervals match nothing") {
    val expected = Set((1, "i1"), (2, "i1"), (2, "i2"), (3, "i1"), (3, "i2"), (5, "i3"))
    assert(rj(4L) == expected)
  }

  test("rangeJoin: result is independent of binWidth (each pair exactly once)") {
    val r = rj(4L)
    assert(rj(1L) == r && rj(100L) == r && rj(7L) == r)
  }

  test("rangeJoin: equals the naive theta-join on random data") {
    val rnd = new scala.util.Random(7)
    val ivs = (1 to 60).map { i =>
      val s = rnd.nextInt(200).toLong; (s"k${i % 3}", s, s + rnd.nextInt(30), i.toLong)
    }.toDF("k", "s", "e", "iid")
    val ps = (1 to 150).map(i => (s"k${i % 3}", rnd.nextInt(250).toLong, i.toLong)).toDF("k", "p", "pid")
    val fast = Joins.rangeJoin(ps, ivs, Seq("k"), "p", "s", "e", 16L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = ps.join(ivs, Seq("k")).where(col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive && fast.nonEmpty)
  }
}
