package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling (SURVEY §2.5 L31) — the "what is in this
  * corpus" audit every ingestion step runs before anything else:
  * per-column row/null/distinct counts and min/max, computed in ONE
  * aggregate job over ONE scan and melted to a tall
  * `(column, n_rows, n_null, n_distinct, min_value, max_value)` frame
  * (min/max as strings so mixed-type tables profile into one schema).
  *
  * Two variants, same output shape:
  *
  *  - [[profile]] — EXACT distinct counts. Spark plans multiple
  *    `count(DISTINCT ...)` in one aggregate via an Expand (the input
  *    is replicated once per distinct column before the shuffle), so
  *    the shuffled volume is ~(#cols + 1)× the projected input. Right
  *    for gates/audits at moderate scale; the oracle-gated variant.
  *  - [[profileApprox]] — HyperLogLog++ `approx_count_distinct`
  *    (Heule et al. 2013, the published HLL++ sketch) with
  *    configurable rsd. NO Expand: one narrow pass, constant-size
  *    sketch state per column, the variant a 100 TB profile runs
  *    (plan shape pinned in PlanAuditSpec).
  *
  * Both aggregate map-side first — the shuffle carries one partial
  * state per task, never data rows. */
object Profile {

  private def meltRow(row: DataFrame, cols: Seq[String]): DataFrame = {
    val entries = array(cols.map { c =>
      struct(
        lit(c).as("column"),
        col("_total").as("n_rows"),
        (col("_total") - col(s"_n_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").as("min_value"),
        col(s"_max_$c").as("max_value"))
    }: _*)
    row.select(explode(entries).as("p")).select("p.*")
  }

  /** Exact profile of `cols` — one Aggregate (with Expand), one scan.
    * `n_distinct` excludes NULL (the `count(DISTINCT)` convention both
    * engines share). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs: Seq[Column] = count(lit(1)).as("_total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_n_$c"),
        count_distinct(col(c)).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    meltRow(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  /** Approximate profile — `n_distinct` is an HLL++ estimate at
    * relative standard deviation `rsd`; everything else exact. Single
    * narrow aggregation pass, no Expand — the 100 TB shape. */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs: Seq[Column] = count(lit(1)).as("_total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_n_$c"),
        approx_count_distinct(col(c), rsd).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    meltRow(df.agg(aggs.head, aggs.tail: _*), cols)
  }
}
