package graft

import org.apache.spark.sql.functions.{col, lit}
import graft.operators.Sketch

/** L18 sketch-based overlap: estimates gated against exact counts on
  * planted overlaps (no DuckDB oracle — sketch implementations differ
  * across engines; the tolerance here IS the contract). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def est(aRange: Range, bRange: Range): (Long, Long, Long, Long) = {
    val a = aRange.map(_.toLong).toDF("k")
    val b = bRange.map(_.toLong).toDF("k")
    val r = Sketch.overlapEstimate(a, col("k"), b, col("k")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  private def within(got: Long, exact: Long, tol: Double): Boolean =
    math.abs(got - exact) <= math.max(1, exact * tol)

  test("planted overlap: estimates within 5% of exact counts") {
    val (na, nb, nu, no) = est(1 to 10000, 5001 to 20000)
    assert(within(na, 10000, 0.05), s"n_a $na")
    assert(within(nb, 15000, 0.05), s"n_b $nb")
    assert(within(nu, 20000, 0.05), s"n_union $nu")
    assert(within(no, 5000, 0.10), s"n_overlap $no") // inclusion-exclusion widens error
  }

  test("disjoint sets estimate ~zero overlap; identical sets ~full overlap") {
    val (_, _, _, no1) = est(1 to 5000, 10001 to 15000)
    assert(no1 < 500, s"disjoint overlap $no1")
    val (na2, _, _, no2) = est(1 to 5000, 1 to 5000)
    assert(within(no2, 5000, 0.10), s"identical overlap $no2 (n_a $na2)")
  }

  test("an empty side yields zero overlap, not nulls") {
    val a = (1L to 100L).toDF("k")
    val empty = a.where(col("k") < 0)
    val r = Sketch.overlapEstimate(a, col("k"), empty, col("k")).head()
    assert(!r.anyNull)
    assert(r.getLong(1) == 0L && r.getLong(3) == 0L)
    assert(within(r.getLong(0), 100, 0.05))
  }

  test("sourceOverlapMatrix: hand-counted shares, zero pairs printed, nulls skipped") {
    // k=1 windows = distinct tokens: en {apple banana cherry dog} (4),
    // de {banana cherry egg} (3), fr {zebra yak} (2)
    val docs = Seq(
      ("en", "apple banana cherry"), ("en", "banana dog"),
      ("de", "banana cherry egg"),
      ("fr", "zebra yak"),
      (null, "ghost tokens never counted"), ("en", null))
      .toDF("lang", "text")
    val m = Sketch.sourceOverlapMatrix(docs, col("lang"), col("text"), k = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_shared"), r.getAs[Double]("jaccard")))).toMap
    assert(m.keySet == Set(("de", "en"), ("de", "fr"), ("en", "fr"))) // complete matrix
    assert(m(("de", "en")) == ((3L, 4L, 2L, 2.0 / 5)))
    assert(m(("de", "fr")) == ((3L, 2L, 0L, 0.0))) // zero overlap still printed
    assert(m(("en", "fr")) == ((4L, 2L, 0L, 0.0)))
  }

  test("sourceOverlapMatrix: within-group repeats collapse; single group yields no rows") {
    val docs = Seq(("en", "dup dup dup"), ("en", "dup again")).toDF("lang", "text")
    assert(Sketch.sourceOverlapMatrix(docs, col("lang"), col("text"), k = 1).count() == 0L)
    val two = Seq(("en", "dup dup dup"), ("de", "dup")).toDF("lang", "text")
    val r = Sketch.sourceOverlapMatrix(two, col("lang"), col("text"), k = 1).head()
    // en's repeated token counts once: n_a(de)=1, n_b(en)=1, shared=1
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_shared")) == ((1L, 1L, 1L)))
    assert(r.getAs[Double]("jaccard") == 1.0)
  }

  test("overlapExact returns exact counts on planted overlaps, duplicates and all") {
    val a = ((1L to 1000L) ++ (1L to 1000L)).toDF("k") // dups must not inflate
    val b = (501L to 1500L).toDF("k")
    val r = Sketch.overlapExact(a, col("k"), b, col("k")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((1000L, 1000L, 1500L, 500L)))
    // empty side: zeros, not nulls — and output schema matches the sketch
    val empty = a.where(col("k") < 0)
    val r2 = Sketch.overlapExact(a, col("k"), empty, col("k")).head()
    assert(!r2.anyNull)
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(3)) == ((1000L, 0L, 0L)))
    assert(Sketch.overlapExact(a, col("k"), b, col("k")).columns.toSeq ==
      Sketch.overlapEstimate(a, col("k"), b, col("k")).columns.toSeq)
    // null keys ignored on both sides, matching HLL's skip-null input
    val withNull = spark.sql("SELECT CAST(NULL AS BIGINT) AS k").unionAll((1L to 10L).toDF("k"))
    val r3 = Sketch.overlapExact(withNull, col("k"), withNull, col("k")).head()
    assert((r3.getLong(0), r3.getLong(2), r3.getLong(3)) == ((10L, 10L, 10L)))
  }

  test("the estimate falls within tolerance of overlapExact on the gate shape (documents halves)") {
    // the same split + key the overlap_exact driver query uses
    import org.apache.spark.sql.functions.col
    val docs = graft.tables.documents(spark, "/root/testdata/sf0.001").toNative
    val fp = graft.functions.TextFns.fingerprintMd5(col("text"))
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 =!= 0)
    val ex = Sketch.overlapExact(a, fp, b, fp).head()
    val es = Sketch.overlapEstimate(a, fp, b, fp).head()
    for (i <- 0 to 2)
      assert(within(es.getLong(i), ex.getLong(i), 0.05), s"col $i: ${es.getLong(i)} vs ${ex.getLong(i)}")
    assert(within(es.getLong(3), ex.getLong(3), 0.10),
      s"overlap: ${es.getLong(3)} vs exact ${ex.getLong(3)}")
  }

  test("duplicates do not inflate the distinct estimates") {
    val a = ((1L to 1000L) ++ (1L to 1000L) ++ (1L to 1000L)).toDF("k")
    val b = (501L to 1500L).toDF("k")
    val r = Sketch.overlapEstimate(a, col("k"), b, col("k")).head()
    assert(within(r.getLong(0), 1000, 0.05), s"n_a ${r.getLong(0)}")
    assert(within(r.getLong(3), 500, 0.10), s"overlap ${r.getLong(3)}")
  }

  // exact distinct per group of the persisted-sketch fixture: g0 has
  // keys 0..999, g1 has 500..1499, g2 has 0..99 (disjoint from g1's
  // tail; overlaps g0 fully)
  private def sketchFixture = {
    val rows = (0L until 1000L).map(k => ("g0", k)) ++
      (500L until 1500L).map(k => ("g1", k)) ++
      (0L until 100L).map(k => ("g2", k))
    (rows ++ rows).toDF("grp", "k")   // duplicated: sketches must dedup
  }

  test("distinctSketches: per-group estimates within tolerance, duplicates collapse") {
    val sk = Sketch.distinctSketches(sketchFixture, Seq("grp"), col("k"))
    val got = sk.select("grp", "n_distinct_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(within(got("g0"), 1000, 0.05) && within(got("g1"), 1000, 0.05))
    assert(got("g2") == 100L)   // under nominal entries: theta is exact
  }

  test("rollupDistinct: union of persisted sketches == sketch of the union, no rescan") {
    val sk = Sketch.distinctSketches(sketchFixture, Seq("grp"), col("k"))
    val total = Sketch.rollupDistinct(sk, Seq.empty).head().getAs[Long]("n_distinct_est")
    val direct = Sketch.distinctSketches(
        sketchFixture.withColumn("all", lit("x")), Seq("all"), col("k"))
      .head().getAs[Long]("n_distinct_est")
    assert(total == direct, s"rollup $total vs direct $direct")   // same algebra
    assert(within(total, 1500, 0.05))                             // 0..1499
  }

  test("sketchOverlapMatrix: native intersections from sketches alone") {
    val sk = Sketch.distinctSketches(sketchFixture, Seq("grp"), col("k"))
    val m = Sketch.sketchOverlapMatrix(sk, "grp")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(m.size == 3)
    assert(within(m(("g0", "g1")), 500, 0.15), s"g0^g1 ${m(("g0", "g1"))}")
    assert(within(m(("g0", "g2")), 100, 0.15), s"g0^g2 ${m(("g0", "g2"))}")
    assert(m(("g1", "g2")) == 0L)   // disjoint
  }

  test("sketch catalog: write/append/read, rollup-over-appended == one-shot") {
    val path = java.nio.file.Files.createTempDirectory("graft-sketch-cat").toString + "/cat"
    // the fixture split into two arrival batches with overlapping groups
    val batch1 = sketchFixture.where(col("k") < 700)
    val batch2 = sketchFixture.where(col("k") >= 700)
    Sketch.writeSketches(batch1, Seq("grp"), col("k"), path)
    Sketch.writeSketches(batch2, Seq("grp"), col("k"), path, mode = "append")
    assert(Sketch.readSketchParams(spark, path).contains((12, Seq("grp"))))
    // per-group rollup over the appended catalog == one-shot sketches
    // of everything (theta union is the same algebra either way)
    val fromCatalog = Sketch.rollupDistinct(Sketch.readSketches(spark, path), Seq("grp"))
      .select("grp", "n_distinct_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = Sketch.distinctSketches(sketchFixture, Seq("grp"), col("k"))
      .select("grp", "n_distinct_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromCatalog == oneShot, s"catalog $fromCatalog vs one-shot $oneShot")
    // global rollup too
    val total = Sketch.rollupDistinct(Sketch.readSketches(spark, path), Seq.empty)
      .head().getAs[Long]("n_distinct_est")
    assert(within(total, 1500, 0.05))
  }

  test("sketch catalog: appends fail fast on param/grain mismatch; reads refuse uncommitted state") {
    val path = java.nio.file.Files.createTempDirectory("graft-sketch-bad").toString + "/cat"
    Sketch.writeSketches(sketchFixture, Seq("grp"), col("k"), path, lgNomEntries = 12)
    intercept[IllegalArgumentException] {
      Sketch.writeSketches(sketchFixture, Seq("grp"), col("k"), path,
        lgNomEntries = 14, mode = "append")
    }
    intercept[IllegalArgumentException] {
      Sketch.writeSketches(sketchFixture.withColumn("g2", col("grp")),
        Seq("g2"), col("k"), path, mode = "append")
    }
    // half-written catalog (data, no commit marker): reads + appends refuse
    val half = java.nio.file.Files.createTempDirectory("graft-sketch-half").toString + "/cat"
    Sketch.distinctSketches(sketchFixture, Seq("grp"), col("k"))
      .write.parquet(s"$half/sketches")
    intercept[IllegalArgumentException] { Sketch.readSketches(spark, half) }
    intercept[IllegalArgumentException] {
      Sketch.writeSketches(sketchFixture, Seq("grp"), col("k"), half, mode = "append")
    }
    // overwrite is the documented repair
    Sketch.writeSketches(sketchFixture, Seq("grp"), col("k"), half)
    assert(Sketch.readSketches(spark, half).count() == 3)
  }

  test("sketches are deterministic under repartitioning (order-independent KMV)") {
    val a = Sketch.distinctSketches(sketchFixture, Seq("grp"), col("k"))
      .select("grp", "n_distinct_est").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Sketch.distinctSketches(sketchFixture.repartition(17), Seq("grp"), col("k"))
      .select("grp", "n_distinct_est").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
  }

  // ---------------------------------------------------------- L44 items

  test("topItemsPerGroup: independent k-cut per group; NULL group/item skipped") {
    import spark.implicits._
    val rows = (Seq.fill(3)(("en", "x")) ++ Seq.fill(2)(("en", "y")) ++
      Seq(("en", "z")) ++ Seq.fill(5)(("de", "q")) ++ Seq(("de", "r")) ++
      Seq((null.asInstanceOf[String], "x"), ("en", null.asInstanceOf[String])))
      .toDF("g", "it")
    val out = Sketch.topItemsPerGroup(rows, col("g"), col("it"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      ("en", "x", 3L), ("en", "y", 2L), ("de", "q", 5L), ("de", "r", 1L)))
  }
}

/** The estimate's error contract as a CURVE, not one pinned shape:
  * for generated lgK and planted overlap geometries, each estimated
  * count stays within 3× the HLL standard error 1.04/√2^lgK of the
  * exact twin, and n_overlap — three estimates composed by
  * inclusion-exclusion — within the sum of the three absolute
  * envelopes. Case count kept small (each evaluation runs two Spark
  * aggregations on the shared session), matching ClusterProps. */
object OverlapErrorProps extends org.scalacheck.Properties("overlap-error-contract") {
  import org.scalacheck.{Gen, Test}
  import org.scalacheck.Prop.forAll
  import graft.operators.Sketch

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val genCase = for {
    lgK <- Gen.oneOf(12, 14, 16)
    nA  <- Gen.choose(500, 3000)
    nB  <- Gen.choose(500, 3000)
    ov  <- Gen.choose(0, math.min(nA, nB))
  } yield (lgK, nA, nB, ov)

  property("estimates within 3*1.04/sqrt(2^lgK) of overlapExact, overlap within the composed envelope") =
    forAll(genCase) { case (lgK, nA, nB, ov) =>
      val s = TestSession.spark
      import s.implicits._
      val a = (1L to nA.toLong).toDF("k")
      val b = ((nA - ov + 1).toLong to (nA - ov + nB).toLong).toDF("k")
      val ex = Sketch.overlapExact(a, col("k"), b, col("k")).head()
      val es = Sketch.overlapEstimate(a, col("k"), b, col("k"), lgK).head()
      val eps = 3.0 * 1.04 / math.sqrt(math.pow(2.0, lgK))
      def side(i: Int): Boolean =
        math.abs(es.getLong(i) - ex.getLong(i)) <= math.max(1.0, eps * ex.getLong(i))
      val composedEnv = eps * (ex.getLong(0) + ex.getLong(1) + ex.getLong(2))
      side(0) && side(1) && side(2) &&
        math.abs(es.getLong(3) - ex.getLong(3)) <= math.max(1.0, composedEnv)
    }
}
