package graft

import org.apache.spark.sql.functions.col
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

  test("duplicates do not inflate the distinct estimates") {
    val a = ((1L to 1000L) ++ (1L to 1000L) ++ (1L to 1000L)).toDF("k")
    val b = (501L to 1500L).toDF("k")
    val r = Sketch.overlapEstimate(a, col("k"), b, col("k")).head()
    assert(within(r.getLong(0), 1000, 0.05), s"n_a ${r.getLong(0)}")
    assert(within(r.getLong(3), 500, 0.10), s"overlap ${r.getLong(3)}")
  }
}
