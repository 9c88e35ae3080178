package graft

import graft.operators.Profile

/** L31 one-pass profiling: hand-counted stats incl. nulls and mixed
  * types, the NULL-exclusion convention for distinct, and exact/approx
  * agreement at small cardinality. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, Some("b"), None),
    (3L, None, Some(-2.0)),
    (4L, Some("a"), Some(1.5))).toDF("id", "s", "x")

  test("profile: hand-counted rows/nulls/distinct/min/max per column") {
    val got = Profile.profile(df, Seq("id", "s", "x")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
    assert(got("x") == ((4L, 1L, 2L, "-2.0", "1.5")))
  }

  test("an all-null column profiles (n, n, 0, null, null)") {
    val d = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val r = Profile.profile(d, Seq("s")).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("profileApprox matches exact at small cardinality and keeps the other stats exact") {
    val big = (1L to 2000L).map(i => (i, s"v${i % 50}")).toDF("id", "s")
    val exact = Profile.profile(big, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.profileApprox(big, Seq("id", "s"), rsd = 0.02).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(approx("s")._3 == exact("s")) // 50 distinct: HLL++ is exact in sparse mode
    assert(math.abs(approx("id")._3 - 2000L) <= 2000 * 0.06, s"id estimate ${approx("id")._3}")
    assert(approx("id")._1 == 2000L && approx("id")._2 == 0L)
  }

  test("empty input profiles (0, 0, 0, null, null) and zero columns are rejected") {
    val r = Profile.profile(df.where("id < 0"), Seq("s")).head()
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L && r.isNullAt(4))
    assertThrows[IllegalArgumentException](Profile.profile(df, Seq.empty))
  }

  test("quantiles: hand-computed percentile_cont incl. interpolation; NULLs skipped") {
    import spark.implicits._
    // values 10,20,30,40 (+ a NULL that must not count): n=4,
    // pos = q*(n-1): q=.5 -> 25.0 (interpolated), q=.25 -> 17.5, q=1 -> 40
    val d = Seq(Some(10.0), Some(20.0), Some(30.0), Some(40.0), None).toDF("x")
    val got = Profile.quantiles(d, Seq("x"), Seq(0.25, 0.5, 1.0))
      .select("q", "value").as[(Double, Double)].collect().toMap
    assert(got(0.25) == 17.5 && got(0.5) == 25.0 && got(1.0) == 40.0)
  }

  test("quantiles: melted shape covers every (column, q) pair") {
    import spark.implicits._
    val d = Seq((1.0, 100L), (2.0, 200L), (3.0, 300L)).toDF("a", "b")
    val got = Profile.quantiles(d, Seq("a", "b"), Seq(0.0, 0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got.size == 6)
    assert(got(("a", 0.5)) == 2.0 && got(("b", 0.5)) == 200.0)
    assert(got(("a", 0.0)) == 1.0 && got(("b", 1.0)) == 300.0)
  }

  test("topValues: deterministic heavy hitters — count desc, value asc, NULLs out") {
    import spark.implicits._
    import graft.operators.Profile
    val d = Seq("b", "a", "b", "c", "a", null).toDF("x")
    val got = Profile.topValues(d, org.apache.spark.sql.functions.col("x"), k = 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 2L), ("b", 2L)))   // tie broken by value asc
    assertThrows[IllegalArgumentException](
      Profile.topValues(d, org.apache.spark.sql.functions.col("x"), 0))
  }

  test("histogram: every bin present, boundaries and out-of-range handled") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = Seq(0.0, 0.5, 1.0, 4.9, 5.0, 9.9, 10.0, 10.1, -0.1,
      Double.NaN).toDF("x")
    // [0,10), 2 bins of width 5: bin0 = [0,5), bin1 = [5,10] (hi lands
    // in the last bin); -0.1 and 10.1 out of range; NaN fails >= lo
    val got = Profile.histogram(d, col("x"), bins = 2, lo = 0.0, hi = 10.0)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 0.0, 5.0, 4L), (1L, 5.0, 10.0, 3L)))
    // empty bins survive with n = 0
    val sparse = Seq(9.0).toDF("x")
    val bins = Profile.histogram(sparse, col("x"), bins = 5, lo = 0.0, hi = 10.0)
      .orderBy("bin").collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bins == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
    assertThrows[IllegalArgumentException](
      Profile.histogram(d, col("x"), bins = 0, lo = 0, hi = 1))
    assertThrows[IllegalArgumentException](
      Profile.histogram(d, col("x"), bins = 2, lo = 1, hi = 1))
  }

  test("bucketByQuantiles: exceeds-count buckets, ties land low, NULL stays NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 1..8: quartile thresholds (dyadic over integers) = 2.75, 4.5, 6.25
    val d = (1 to 8).map(i => (i.toLong, i)).toDF("id", "v")
      .unionAll(Seq((9L, null.asInstanceOf[Integer])).toDF("id", "v"))
    val got = Profile.bucketByQuantiles(d, col("v"), Seq(0.25, 0.5, 0.75), "b")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getInt(2))).toMap
    assert(got(1L) == 0 && got(2L) == 0)
    assert(got(3L) == 1 && got(4L) == 1)
    assert(got(5L) == 2 && got(6L) == 2)
    assert(got(7L) == 3 && got(8L) == 3)
    assert(got(9L) == null)
    // a value exactly AT a threshold lands in the lower bucket
    val tied = Seq(1, 2, 3).toDF("v") // median threshold = 2.0 exactly
    val t = Profile.bucketByQuantiles(tied, col("v"), Seq(0.5), "b")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(t(2) == 0 && t(3) == 1)
  }

  test("quantilesApprox: within rank tolerance of exact, constant-state sketch") {
    import spark.implicits._
    val d = (1 to 1001).map(_.toDouble).toDF("x")
    val exact = Profile.quantiles(d, Seq("x"), Seq(0.25, 0.5, 0.75))
      .select("q", "value").as[(Double, Double)].collect().toMap
    val approx = Profile.quantilesApprox(d, Seq("x"), Seq(0.25, 0.5, 0.75),
        accuracy = 10000)
      .select("q", "value").as[(Double, Double)].collect().toMap
    // accuracy 10000 over n=1001 -> rank error < 1: must hit the exact
    // neighborhood (approx is discrete; exact interpolates)
    for (q <- Seq(0.25, 0.5, 0.75))
      assert(math.abs(approx(q) - exact(q)) <= 1.0, s"q=$q: ${approx(q)} vs ${exact(q)}")
  }

  // ------------------------------------------------------ L46 by-group

  test("quantilesByGroup: hand-computed per-group interpolation; NULL group excluded") {
    import spark.implicits._
    // en: 1..5 (q50 = 3, q25 = 2); de: 10,20 (q50 = 15 interp.); NULL group dropped
    val d = ((1 to 5).map(i => (Some("en"), i.toLong)) ++
      Seq((Some("de"), 10L), (Some("de"), 20L), (None, 999L)))
      .toDF("lang", "v")
    val out = Profile.quantilesByGroup(
        d, org.apache.spark.sql.functions.col("lang"), Seq("v"), Seq(0.25, 0.5))
      .collect().map(r => (r.getString(0), r.getDouble(2)) -> r.getDouble(3)).toMap
    assert(out.size == 4)
    assert(out(("en", 0.5)) == 3.0 && out(("en", 0.25)) == 2.0)
    assert(out(("de", 0.5)) == 15.0 && out(("de", 0.25)) == 12.5)
  }

  // ---------------------------------------------------------- L45 corr

  test("corrMatrix: perfect linear, anti-linear, and constant columns") {
    import spark.implicits._
    val d = (1L to 50L).map(i => (i, 2 * i, -i, 7L)).toDF("x", "y2", "neg", "c")
    val out = Profile.corrMatrix(d, Seq("x", "y2", "neg", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out.size == 6)
    assert(math.abs(out(("x", "y2"))._2.get - 1.0) < 1e-12)
    assert(math.abs(out(("x", "neg"))._2.get + 1.0) < 1e-12)
    // zero-variance pairs are NULL, never NaN
    assert(out(("x", "c"))._2.isEmpty && out(("y2", "c"))._2.isEmpty)
    assert(out.values.forall(_._1 == 50L))
  }

  test("corrMatrix: pairwise-complete NULL handling with per-pair n") {
    import spark.implicits._
    val d = Seq(
      (Some(1L), Some(2L), Some(10L)),
      (Some(2L), None, Some(20L)),
      (Some(3L), Some(6L), None),
      (Some(4L), Some(8L), Some(40L))).toDF("x", "y", "z")
    val out = Profile.corrMatrix(d, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("x", "y")) == 3L) // row 2 drops only where y is NULL
    assert(out(("x", "z")) == 3L)
    assert(out(("y", "z")) == 2L)
    // x~y stays the perfect line on ITS complete rows despite z's nulls
    val r = Profile.corrMatrix(d, Seq("x", "y", "z"))
      .where(org.apache.spark.sql.functions.col("col_a") === "x" &&
        org.apache.spark.sql.functions.col("col_b") === "y").head().getDouble(3)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("corrMatrix: matches a local double computation on mixed data") {
    import spark.implicits._
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val ys = Seq(2L, 7L, 1L, 8L, 2L, 8L, 1L, 8L)
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val (sxx, syy) = (xs.map(a => a * a).sum.toDouble, ys.map(a => a * a).sum.toDouble)
    val expected = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val got = Profile.corrMatrix(xs.zip(ys).toDF("x", "y"), Seq("x", "y"))
      .head().getDouble(3)
    assert(got == expected, s"$got vs $expected (the chain is fixed — bit equality)")
  }
}
