package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/interval joins Spark lacks as built-ins (SURVEY §2.5 L32),
  * composed from exchange-efficient primitives instead of the naive
  * plans Spark would pick for the raw predicates:
  *
  *  - AS-OF (point-in-time) join: each left row matches the single
  *    most recent right row at-or-before its timestamp per key — the
  *    time-series enrichment join (pandas `merge_asof`, the classic
  *    trades-vs-quotes shape). The naive SQL (`t >= q.t` theta-join +
  *    per-pair max) is a row-exploding range join; the composition
  *    here is the published union-stream trick: tag and UNION both
  *    inputs, ONE hash exchange on the key, per-key time order, then
  *    `last(quote, ignoreNulls)` over an unbounded-preceding window
  *    carries the latest quote forward onto each probe row. O(n+m)
  *    rows shuffled once, no join node at all.
  *
  *  - RANGE (interval containment) join: points × covering intervals.
  *    Spark plans the raw `p BETWEEN s AND e` predicate as a
  *    broadcast-nested-loop — quadratic row touches. Here intervals
  *    explode into fixed-width covering BINS and the join becomes an
  *    EQUI-join on (keys, bin) + a residual filter — the published
  *    binned-interval-join shape every genomics/temporal engine uses.
  *    Replication = interval_length/binWidth per interval; pick
  *    binWidth ≈ typical interval length so replication is O(1).
  *
  * Both run at 100 TB: one keyed exchange each, AQE-skew-splittable
  * (the as-of window is per-key — a single degenerate key serializes
  * within its task, the standard keyed-window caveat). */
object Joins {

  /** Left as-of (backward) join.
    *
    * For each `left` row: the `right` row with the same `keys` and the
    * greatest `time` ≤ the left row's `time` (at-or-before; ties at
    * equal time match). `valueCols` from that row arrive prefixed with
    * `outPrefix`, plus `<outPrefix><time>` = the matched timestamp;
    * unmatched rows keep NULLs (left semantics). `tolerance` (same
    * units as `time`) nulls out matches older than `time - tolerance`
    * (pandas merge_asof semantics).
    *
    * The matched values ride in ONE struct through the window, so all
    * output columns come from the SAME right row even when some of its
    * values are NULL (per-column `last(ignoreNulls)` would mix rows).
    *
    * Right rows must be unique per (keys, time) for a deterministic
    * result; pass `tieBreak` = a column name whose MAX picks the
    * winner among equal timestamps (deduped map-side via a partial
    * WindowGroupLimit). Right rows with NULL time are dropped (a
    * quote without a timestamp precedes nothing); left rows with NULL
    * time keep NULL matches. */
  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String], time: String,
      valueCols: Seq[String], tolerance: Option[Long] = None,
      tieBreak: Option[String] = None, outPrefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key")
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    val r0 = right.where(col(time).isNotNull)
    val r1 = tieBreak match {
      case None => r0
      case Some(tb) =>
        val w = Window.partitionBy((keys :+ time).map(col): _*).orderBy(col(tb).desc)
        r0.withColumn("_graft_rn", row_number().over(w))
          .where(col("_graft_rn") === 1).drop("_graft_rn")
    }
    // the quote payload as ONE struct: (_t = quote time, values...)
    val rq = r1.select(keys.map(col) ++ Seq(col(time),
      struct(col(time).as("_t") +: valueCols.map(col): _*).as("_q")): _*)
    val qType = rq.schema("_q").dataType
    val lTagged = left
      .withColumn("_side", lit(1))
      .withColumn("_q", lit(null).cast(qType))
    val rTagged = left.columns.foldLeft(rq) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.withColumn("_side", lit(0))
      .select(lTagged.columns.map(col): _*)
    // quotes sort BEFORE probes at equal time (_side 0 < 1) so
    // at-or-before includes the same-timestamp quote
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(time).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("_m", last(col("_q"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    val inTol: Column = tolerance match {
      case None => col("_m").isNotNull
      case Some(tol) => col("_m").isNotNull && col("_m._t") >= col(time) - tol
    }
    val outCols = left.columns.map(col) ++
      (("_t" -> s"$outPrefix$time") +: valueCols.map(v => v -> s"$outPrefix$v")).map {
        case (src, out) => when(inTol, col(s"_m.$src")).as(out)
      }
    matched.select(outCols: _*)
  }

  /** Inner range-containment join: every (point, interval) pair with
    * matching `keys` and `start ≤ point ≤ end` (inclusive; intervals
    * with `end < start` match nothing). `point`/`start`/`end` are
    * integer-valued columns in the same units (epoch micros, token
    * offsets, positions).
    *
    * Plan shape: intervals explode into covering bins of `binWidth`
    * (`floor(start/w) … floor(end/w)`), points take their single bin,
    * and the join is a hash EQUI-join on (keys…, bin) + the residual
    * BETWEEN filter — never a nested loop. Each qualifying pair
    * surfaces exactly once (a point has ONE bin). Bin arithmetic is
    * the same monotone expression on both sides, so edge rounding can
    * never lose a match. Cost: Σ(len/binWidth + 1) replicated interval
    * rows — pick binWidth near the typical interval length. */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame, keys: Seq[String],
      point: String, start: String, end: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bin(c: Column): Column = floor(c.cast("double") / binWidth).cast("long")
    val iv = intervals
      .where(col(start).isNotNull && col(end).isNotNull && col(start) <= col(end))
      .withColumn("_bin", explode(sequence(bin(col(start)), bin(col(end)))))
    val pt = points
      .where(col(point).isNotNull)
      .withColumn("_bin", bin(col(point)))
    pt.join(iv, keys :+ "_bin")
      .where(col(point) >= col(start) && col(point) <= col(end))
      .drop("_bin")
  }
}
