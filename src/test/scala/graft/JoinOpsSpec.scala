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

  private def asofDir(dir: String, tol: Option[Long] = None) =
    Joins.asofJoin(probes, quotes, Seq("k"), "t", Seq("v", "tag"),
      tolerance = tol, direction = dir)
      .collect().map(r => r.getAs[Int]("pid") ->
        Option(r.getAs[java.lang.Long]("asof_t")).map(_.toLong)).toMap

  test("asofJoin forward: at-or-after match per key") {
    val got = asofDir("forward")
    assert(got(100) == Some(1L)) // next quote at t=1
    assert(got(101) == Some(1L)) // equal timestamp matches (inclusive)
    assert(got(102) == Some(5L))
    assert(got(103) == None)     // after A's last quote
    assert(got(104) == Some(3L)) // B's quote is later — forward finds it
    assert(got(105) == None)     // key with no quotes
  }

  test("asofJoin forward: tolerance bounds the look-ahead") {
    val got = asofDir("forward", tol = Some(1L))
    assert(got(100) == Some(1L)) // 1-0=1 <= tol
    assert(got(102) == None)     // 5-3=2 > tol
    assert(got(104) == Some(3L)) // 3-2=1 <= tol
  }

  test("asofJoin nearest: closer side wins, exact tie takes backward") {
    val got = asofDir("nearest")
    assert(got(100) == Some(1L)) // only forward exists
    assert(got(101) == Some(1L)) // exact hit
    assert(got(102) == Some(1L)) // backward d=2 ties forward d=2 → backward
    assert(got(103) == Some(5L)) // only backward exists
    assert(got(104) == Some(3L)) // only forward exists
    assert(got(105) == None)
    val tight = asofDir("nearest", tol = Some(1L))
    assert(tight(102) == None)   // both sides at distance 2 > tol
    assert(tight(103) == None)   // 7-5=2 > tol
    assert(tight(104) == Some(3L))
  }

  test("asofJoin forward/nearest: equal the naive per-key join on random data") {
    val rnd = new scala.util.Random(11)
    val q = (1 to 80).map(i => (s"k${i % 4}", rnd.nextInt(100).toLong, i.toDouble))
      .toDF("k", "t", "v").dropDuplicates("k", "t")
    val p = (1 to 120).map(i => (s"k${i % 5}", rnd.nextInt(120).toLong, i.toLong))
      .toDF("k", "t", "pid")
    val naiveBase = p.join(q.withColumnRenamed("t", "qt"), Seq("k"))
    def naiveBest(filtered: org.apache.spark.sql.DataFrame, pick: org.apache.spark.sql.Column) =
      filtered.groupBy("pid").agg(pick.as("best"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
        .withDefaultValue(None)
    val naiveFwd = naiveBest(naiveBase.where(col("qt") >= col("t")), min("qt"))
    val gotFwd = Joins.asofJoin(p, q, Seq("k"), "t", Seq("v"), direction = "forward")
      .collect().map(r => r.getAs[Long]("pid") ->
        Option(r.getAs[java.lang.Long]("asof_t")).map(_.toLong)).toMap
    assert(gotFwd.forall { case (pid, t) => naiveFwd(pid) == t })
    // nearest: min |qt - t|, tie → the smaller qt (backward)
    val naiveNear = naiveBase
      .groupBy("pid", "t").agg(min(abs(col("qt") - col("t"))).as("d"))
      .join(naiveBase, Seq("pid", "t"))
      .where(abs(col("qt") - col("t")) === col("d"))
      .groupBy("pid").agg(min("qt").as("best"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      .withDefaultValue(None)
    val gotNear = Joins.asofJoin(p, q, Seq("k"), "t", Seq("v"), direction = "nearest")
      .collect().map(r => r.getAs[Long]("pid") ->
        Option(r.getAs[java.lang.Long]("asof_t")).map(_.toLong)).toMap
    assert(gotNear.forall { case (pid, t) => naiveNear(pid) == t })
  }

  test("asofJoin: NULL-time probes keep NULL matches in every direction") {
    val q = Seq(("A", 1L, 10.0)).toDF("k", "t", "v")
    val p = Seq(("A", Some(2L), 1), ("A", None, 2)).toDF("k", "t", "pid")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = Joins.asofJoin(p, q, Seq("k"), "t", Seq("v"), direction = dir)
        .collect().map(r => r.getAs[Int]("pid") ->
          Option(r.getAs[java.lang.Long]("asof_t"))).toMap
      assert(got(2).isEmpty, s"direction=$dir")
    }
  }

  test("asofJoin: user columns in the _q/_side/_m family survive (reserved _graft_ namespace)") {
    val q = Seq(("A", 1L, 10.0)).toDF("k", "t", "v")
    val p = Seq(("A", 2L, "keep-q", "keep-side", "keep-m", 1))
      .toDF("k", "t", "_q", "_side", "_m", "pid")
    val r = Joins.asofJoin(p, q, Seq("k"), "t", Seq("v")).head()
    assert(r.getAs[String]("_q") == "keep-q")
    assert(r.getAs[String]("_side") == "keep-side")
    assert(r.getAs[String]("_m") == "keep-m")
    assert(r.getAs[Double]("asof_v") == 10.0)
  }

  test("rangeJoin: exact at magnitudes beyond 2^53 (integer binning)") {
    val base = 1L << 53 // doubles can no longer represent adjacent longs
    val ivs = Seq(("k", base + 1L, base + 1L, "hit"), ("k", base + 3L, base + 4L, "other"))
      .toDF("k", "s", "e", "iid")
    val ps = Seq(("k", base, 1), ("k", base + 1L, 2), ("k", base + 4L, 3))
      .toDF("k", "p", "pid")
    for (w <- Seq(1L, 2L, 1000L)) {
      val got = Joins.rangeJoin(ps, ivs, Seq("k"), "p", "s", "e", w)
        .select("pid", "iid").collect().map(r => (r.getInt(0), r.getString(1))).toSet
      assert(got == Set((2, "hit"), (3, "other")), s"binWidth=$w")
    }
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

  test("intervalJoin: closed-end semantics, single surfacing, keys separate") {
    val lefts = Seq(
      ("k", 0L, 10L, 1L),    // overlaps r1 (touching end), r2 (contained)
      ("k", 20L, 25L, 2L),   // disjoint from all
      ("k2", 0L, 10L, 3L))   // same span, other key
      .toDF("k", "ls", "le", "lid")
    val rights = Seq(
      ("k", 10L, 15L, 11L),  // touches left 1 at 10 -> closed ends overlap
      ("k", 2L, 4L, 12L),    // contained in left 1
      ("k", 26L, 30L, 13L),  // disjoint
      ("k2", 3L, 3L, 14L))   // point-interval inside left 3
      .toDF("k", "rs", "re", "rid")
    for (w <- Seq(1L, 3L, 100L)) {
      val got = Joins.intervalJoin(lefts, rights, Seq("k"), "ls", "le", "rs", "re", w)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // each pair exactly once (Seq, not Set — duplicates would show)
      assert(got.sorted == Seq((1L, 11L), (1L, 12L), (3L, 14L)), s"binWidth=$w: $got")
    }
  }

  test("intervalJoin: equals the naive theta-join on random data; NULL/inverted drop") {
    val rnd = new scala.util.Random(11)
    def mk(n: Int, tag: String) = (1 to n).map { i =>
      val s = rnd.nextInt(200).toLong
      (s"k${i % 3}", s, s + rnd.nextInt(25), i.toLong)
    }.toDF("k", s"${tag}s", s"${tag}e", s"${tag}id")
    val a = mk(50, "a"); val b = mk(70, "b")
    val fast = Joins.intervalJoin(a, b, Seq("k"), "as", "ae", "bs", "be", 16L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = a.join(b, Seq("k"))
      .where(col("as") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fast.sorted == naive.sorted && fast.nonEmpty)
    // NULL and inverted intervals never join
    val bad = Seq(("k", None: Option[Long], Some(5L), 100L),
      ("k", Some(9L), Some(3L), 101L))
      .toDF("k", "as", "ae", "aid")
    assert(Joins.intervalJoin(bad, b, Seq("k"), "as", "ae", "bs", "be", 16L).count() == 0L)
  }
}
