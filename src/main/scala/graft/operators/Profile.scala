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

  /** Exact pairwise Pearson correlation matrix over INTEGER-VALUED
    * columns, in ONE aggregate over ONE scan (L45): every pair's
    * moments (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as exact BIGINT
    * sums — 6·C(k,2) agg columns, map-side combined, one row out —
    * then `r = (n·Σxy − Σx·Σy) / (√(n·Σx²−Σx²)·√(n·Σy²−Σy²))` in a
    * FIXED IEEE chain on the (identical) integers, so any engine
    * reproduces the double bit-for-bit. `corr()`'s streaming-covariance
    * implementation is deliberately avoided: its result depends on
    * partial-merge ORDER, which no oracle can mirror.
    *
    * Contract: columns are cast to LONG (quantize reals first — e.g.
    * cents via `round(x·100)`; the cast itself truncates and is NOT a
    * substitute), and moments must fit a BIGINT: |x|²·n < 2⁶³, i.e.
    * rescale so |x| ≲ 2³¹/√n — at 10¹² rows that is |x| ≲ 3·10³.
    * Overflow wraps silently in a non-ANSI sum (documented; pick the
    * quantization to fit). NULL handling is pairwise-complete: a row
    * contributes to exactly the pairs where BOTH sides are non-null.
    * Zero variance or empty pair → NULL r (never NaN). Returns tall
    * `(col_a, col_b, n, corr_r)` for the C(k,2) ordered-name pairs. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"corrMatrix needs >= 2 columns, got $cols")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield (cols(i), cols(j))
    val aggs: Seq[Column] = pairs.flatMap { case (a, b) =>
      val x = col(a).cast("long"); val y = col(b).cast("long")
      val both = x.isNotNull && y.isNotNull
      def s(e: Column, nm: String) =
        coalesce(sum(when(both, e)), lit(0L)).as(s"_${nm}_${a}_$b")
      Seq(
        count(when(both, lit(1))).as(s"_n_${a}_$b"),
        s(x, "sx"), s(y, "sy"), s(x * y, "sxy"), s(x * x, "sxx"), s(y * y, "syy"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(pairs.map { case (a, b) =>
      def d(nm: String) = col(s"_${nm}_${a}_$b").cast("double")
      val n = col(s"_n_${a}_$b")
      val cov = n.cast("double") * d("sxy") - d("sx") * d("sy")
      val vx = n.cast("double") * d("sxx") - d("sx") * d("sx")
      val vy = n.cast("double") * d("syy") - d("sy") * d("sy")
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"), n.as("n"),
        when(n > 0 && vx > 0.0 && vy > 0.0,
          cov / (sqrt(vx) * sqrt(vy))).as("corr_r"))
    }: _*)
    row.select(explode(entries).as("p")).select("p.*")
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

  /** Exact top-`k` heavy hitters of a column: `(value, n)` by count
    * desc, ties by value asc (deterministic cut). NULLs are excluded —
    * they are a [[profile]] statistic, not a value. Plan: map-side
    * partial count per value, then a k-row TakeOrdered — no global
    * sort; memory is O(distinct) in the aggregate, so for unbounded
    * columns pre-bucket or feed a tokenized/exploded projection (the
    * boilerplate-token audit: `df.select(explode(tokens))`). */
  def topValues(df: DataFrame, c: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.select(c.cast("string").as("value"))
      .where(col("value").isNotNull)
      .groupBy("value").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc)
      .limit(k)
  }

  private def meltQuantiles(
      row: DataFrame, cols: Seq[String], qs: Seq[Double]): DataFrame = {
    val qLit = array(qs.map(lit): _*)
    val entries = array(cols.map { c =>
      struct(lit(c).as("column"), col(s"_q_$c").as("_vals"))
    }: _*)
    row.select(explode(entries).as("p"))
      .select(col("p.column").as("column"),
        posexplode(col("p._vals")).as(Seq("_i", "value")))
      .select(col("column"), element_at(qLit, col("_i") + 1).as("q"), col("value"))
  }

  /** EXACT quantiles of numeric `cols` at fractions `qs` (linear
    * interpolation — ANSI `percentile_cont`), melted tall to
    * `(column, q, value)`. One aggregate job, map-side combined.
    *
    * Scale contract: Spark's exact `percentile` buffers a value→count
    * map per (column, partial), so memory is O(Σ distinct values) —
    * the right tool for bounded-cardinality columns (quantities, date
    * keys, categorical codes, token counts). For unbounded doubles at
    * corpus scale use [[quantilesApprox]], whose sketch state is
    * constant. Cross-engine note: at dyadic `qs` (k/2ⁿ — .25/.5/.75…)
    * over integer-valued data the interpolation is exact in IEEE
    * double, so results are bit-identical across engines regardless
    * of their interpolation formula — the oracle-gate regime. */
  def quantiles(df: DataFrame, cols: Seq[String], qs: Seq[Double]): DataFrame = {
    require(cols.nonEmpty, "quantiles of zero columns")
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"fractions must be in [0,1]: $qs")
    val qArr = array(qs.map(lit): _*)
    val aggs = cols.map(c => percentile(col(c), qArr).as(s"_q_$c"))
    meltQuantiles(df.agg(aggs.head, aggs.tail: _*), cols, qs)
  }

  /** Per-GROUP exact quantiles (L46) — the data-mixture audit shape
    * ("length quantiles per language", "score quartiles per source"):
    * [[quantiles]] with a grouping key, melted tall to
    * `(grp, column, q, value)`. ONE grouped aggregate over one scan
    * (map-side combined); output is |groups|·|cols|·|qs| rows —
    * mixture-sized by contract. NULL groups are excluded (they are a
    * data-quality finding for [[profile]], not a stratum). The same
    * bounded-cardinality memory contract and dyadic-fraction
    * cross-engine exactness as [[quantiles]] apply. */
  def quantilesByGroup(
      df: DataFrame, group: Column, cols: Seq[String], qs: Seq[Double]): DataFrame = {
    require(cols.nonEmpty, "quantilesByGroup of zero columns")
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"fractions must be in [0,1]: $qs")
    val qArr = array(qs.map(lit): _*)
    val aggs = cols.map(c => percentile(col(c), qArr).as(s"_q_$c"))
    val rows = df.where(group.isNotNull)
      .groupBy(group.as("grp")).agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map { c =>
      struct(lit(c).as("column"), col(s"_q_$c").as("_vals"))
    }: _*)
    rows.select(col("grp"), explode(entries).as("p"))
      .select(col("grp"), col("p.column").as("column"),
        posexplode(col("p._vals")).as(Seq("_i", "value")))
      .select(col("grp"), col("column"), element_at(qArr, col("_i") + 1).as("q"), col("value"))
  }

  /** Fixed-width histogram of a numeric column over `[lo, hi]`:
    * `(bin, bin_lo, bin_hi, n)` with EVERY bin present (empty bins
    * count 0 — the plotting/monitoring contract), bin width
    * `(hi-lo)/bins`. Values outside `[lo, hi]` and NULLs are excluded
    * (count them via [[profile]]); `hi` itself lands in the last bin
    * (the standard right-closed final bin). Explicit bounds keep the
    * operator ONE pass and deterministic — derive them from a prior
    * [[profile]]/[[quantiles]] when unknown.
    *
    * Plan: narrow bin assignment (one integer per row), map-side
    * combined count keyed by ≤ `bins` values, broadcast-joined onto a
    * `spark.range(bins)` scaffold — data shuffles one partial row per
    * (task, non-empty bin). Bin edges are the same IEEE chain both
    * engines compute: `floor((x - lo) / w)` with `w = (hi-lo)/bins`. */
  def histogram(df: DataFrame, c: Column, bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val w = (hi - lo) / bins
    val spark = df.sparkSession
    val v = c.cast("double")
    val counts = df
      .where(v.isNotNull && v >= lo && v <= hi)
      .select(least(floor((v - lit(lo)) / lit(w)), lit(bins - 1)).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    spark.range(bins).toDF("bin")
      .join(broadcast(counts), Seq("bin"), "left")
      .select(
        col("bin"),
        (lit(lo) + col("bin") * lit(w)).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * lit(w)).as("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Quantile bucketing — the CCNet §3.3 move (rank docs by a quality
    * signal, cut the corpus into buckets at fixed fractions): append
    * `outCol` = the 0-based bucket of `value` under the EXACT
    * percentile thresholds of `value` at `qs` (bucket = number of
    * thresholds the value EXCEEDS, so ties land in the lower bucket
    * and `|qs|+1` buckets cover the line; NULL value → NULL bucket).
    *
    * Thresholds are one [[quantiles]]-style aggregate collected as a
    * bounded |qs|-row artifact, then the assignment is a PURE NARROW
    * comparison chain — no join, no second shuffle, reusable verbatim
    * on a stream. Cross-engine exactness: at dyadic `qs` over
    * integer-valued signals the thresholds are IEEE-exact (see
    * [[quantiles]]), so bucket assignment gates bit-for-bit. */
  def bucketByQuantiles(
      df: DataFrame, value: Column, qs: Seq[Double], outCol: String): DataFrame =
    bucketByThresholds(df, value, quantileThresholds(df, value, qs), outCol)

  /** The exact percentile thresholds of `value` at `qs` — ONE
    * aggregate, collected as a bounded |qs|-row artifact. Compute on a
    * STATIC reference frame and feed [[bucketByThresholds]] to bucket
    * a different frame (or a STREAM) under the reference's cuts. */
  def quantileThresholds(df: DataFrame, value: Column, qs: Seq[Double]): Seq[Double] = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1), s"fractions must be in (0,1): $qs")
    df.agg(percentile(value, array(qs.map(lit): _*)).as("_t"))
      .head().getSeq[Double](0)
  }

  /** The assignment half of [[bucketByQuantiles]]: a PURE NARROW
    * exceeds-count comparison chain against fixed thresholds — no job,
    * no shuffle, attaches verbatim to a streaming DataFrame. */
  def bucketByThresholds(
      df: DataFrame, value: Column, thresholds: Seq[Double], outCol: String): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val bucket = thresholds.map(t => (value > lit(t)).cast("int")).reduce(_ + _)
    df.withColumn(outCol, when(value.isNotNull, bucket))
  }

  /** Approximate quantiles — Greenwald–Khanna sketch
    * (`approx_percentile`; Greenwald & Khanna 2001, the published
    * ε-approximate quantile summary): rank error ≤ n/`accuracy`,
    * CONSTANT state per column regardless of cardinality, one narrow
    * pass — the 100 TB shape for unbounded numeric columns. Same
    * melted output as [[quantiles]]; returns the nearest actual data
    * value (discrete), not an interpolation. */
  def quantilesApprox(
      df: DataFrame, cols: Seq[String], qs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "quantiles of zero columns")
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"fractions must be in [0,1]: $qs")
    val qArr = array(qs.map(lit): _*)
    val aggs = cols.map(c =>
      percentile_approx(col(c), qArr, lit(accuracy)).cast("array<double>").as(s"_q_$c"))
    meltQuantiles(df.agg(aggs.head, aggs.tail: _*), cols, qs)
  }
}
