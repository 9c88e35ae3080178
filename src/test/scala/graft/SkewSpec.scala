package graft

import graft.operators.Skew

/** Salted equi-join: result-identical to the plain join, with the hot
  * key's rows spread over the salt domain. */
class SkewSpec extends SparkSpec {

  test("saltedInnerJoin equals the plain join and spreads the hot key") {
    import spark.implicits._
    // one pathologically hot key (10k rows) + a long tail
    val left = ((1 to 10000).map(_ => (1L, "hot")) ++ (2L to 50L).map(k => (k, "cold")))
      .toDF("k", "tag")
    val right = (1L to 50L).map(k => (k, k * 2)).toDF("k", "v")

    val plain = left.join(right, Seq("k"))
    val salted = Skew.saltedInnerJoin(left, right, "k", salt = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq) // salt column dropped
    assert(salted.count() == plain.count())
    val a = salted.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = plain.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)

    // the hot key's rows really land on many distinct salts — observed
    // from the salt column the join ITSELF assigned (test hook keeps
    // it), so this fails if the derivation or seed ever drifts
    val spread = Skew.saltedInnerJoinWithSalt(left, right, "k", salt = 8)
      .where($"k" === 1L).select(Skew.SaltCol).distinct().count()
    assert(spread >= 6, s"expected the hot key spread over >=6 of 8 salts, got $spread")
  }

  test("deterministic saltBy equals the plain join and still spreads the hot key") {
    import spark.implicits._
    // same hot-key shape, plus a stable unique row id to salt by
    val left = ((1 to 10000).map(_ => (1L, "hot")) ++ (2L to 50L).map(k => (k, "cold")))
      .zipWithIndex.map { case ((k, tag), i) => (k, tag, i.toLong) }
      .toDF("k", "tag", "rid")
    val right = (1L to 50L).map(k => (k, k * 2)).toDF("k", "v")

    val plain = left.join(right, Seq("k"))
    val salted = Skew.saltedInnerJoin(left, right, "k", salt = 8, saltBy = Some($"rid"))
    assert(salted.columns.toSeq == plain.columns.toSeq)
    val a = salted.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = plain.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)

    // the hot key's 10k rows land on many distinct salts — observed from
    // the join's own salt column, not a test-side copy of the derivation
    val spread = Skew.saltedInnerJoinWithSalt(left, right, "k", salt = 8, saltBy = Some($"rid"))
      .where($"k" === 1L).select(Skew.SaltCol).distinct().count()
    assert(spread >= 6, s"expected the hot key spread over >=6 of 8 salts, got $spread")
  }

  test("keys missing on one side behave like the plain inner join") {
    import spark.implicits._
    val left = Seq((1L, "a"), (2L, "b")).toDF("k", "tag")
    val right = Seq((2L, 20), (3L, 30)).toDF("k", "v")
    val out = Skew.saltedInnerJoin(left, right, "k", salt = 4).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq == Seq((2L, "b", 20)))
  }
}
