package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/interval joins Spark lacks as built-ins (SURVEY §2.5 L32),
  * composed from exchange-efficient primitives instead of the naive
  * plans Spark would pick for the raw predicates:
  *
  *  - AS-OF (point-in-time) join: each left row matches the single
  *    closest right row per key — at-or-before (`backward`, the pandas
  *    `merge_asof` default / trades-vs-quotes shape), at-or-after
  *    (`forward`), or whichever is closer (`nearest`). The naive SQL
  *    (`t >= q.t` theta-join + per-pair max) is a row-exploding range
  *    join; the composition here is the published union-stream trick:
  *    tag and UNION both inputs, ONE hash exchange on the key, per-key
  *    time order, then `last(quote, ignoreNulls)` over an
  *    unbounded-preceding window carries the latest quote forward onto
  *    each probe row. O(n+m) rows shuffled once, no join node at all.
  *    `forward` is the same window over the reversed time order;
  *    `nearest` evaluates both windows over the SAME single exchange
  *    (same partitioning — Spark re-sorts, never re-shuffles) and
  *    picks per row.
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
  * within its task, the standard keyed-window caveat). Internal temp
  * columns are all `_graft_`-prefixed (the library-wide reserved
  * namespace), so user columns can never collide silently. */
object Joins {

  /** Left as-of join.
    *
    * For each `left` row: the `right` row with the same `keys` and —
    * per `direction` — the greatest `time` ≤ the left row's `time`
    * (`"backward"`, the default; ties at equal time match), the
    * smallest `time` ≥ it (`"forward"`), or the smaller absolute
    * distance of the two (`"nearest"`; an exact tie in distance takes
    * the backward row — the deterministic choice, documented rather
    * than engine-dependent). `valueCols` from that row arrive prefixed
    * with `outPrefix`, plus `<outPrefix><time>` = the matched
    * timestamp; unmatched rows keep NULLs (left semantics).
    * `tolerance` (same units as `time`) nulls out matches farther than
    * `tolerance` from the probe time (pandas merge_asof semantics,
    * applied per side for `nearest`).
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
    * time keep NULL matches (explicitly — not by sort-order accident). */
  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String], time: String,
      valueCols: Seq[String], tolerance: Option[Long] = None,
      tieBreak: Option[String] = None, outPrefix: String = "asof_",
      direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key")
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
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
      struct(col(time).as("_t") +: valueCols.map(col): _*).as("_graft_q")): _*)
    val qType = rq.schema("_graft_q").dataType
    val lTagged = left
      .withColumn("_graft_side", lit(1))
      .withColumn("_graft_q", lit(null).cast(qType))
    val rTagged = left.columns.foldLeft(rq) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.withColumn("_graft_side", lit(0))
      .select(lTagged.columns.map(col): _*)
    // quotes sort BEFORE probes at equal time (_graft_side 0 < 1) so
    // the boundary is inclusive in both directions; both windows share
    // the partitioning, so `nearest` still pays ONE exchange
    def win(timeOrd: Column) = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col("_graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val needB = direction != "forward"
    val needF = direction != "backward"
    val unioned = lTagged.unionByName(rTagged)
    val withB = if (needB)
      unioned.withColumn("_graft_mb", last(col("_graft_q"), ignoreNulls = true).over(win(col(time).asc)))
    else unioned
    val matched = (if (needF)
      withB.withColumn("_graft_mf", last(col("_graft_q"), ignoreNulls = true).over(win(col(time).desc_nulls_first)))
    else withB).where(col("_graft_side") === 1)
    // per-side validity: probe time present, match present, within tol
    def valid(m: Column, delta: Column): Column = tolerance match {
      case None => col(time).isNotNull && m.isNotNull
      case Some(tol) => col(time).isNotNull && m.isNotNull && delta <= tol
    }
    val bOk = if (needB) valid(col("_graft_mb"), col(time) - col("_graft_mb._t")) else lit(false)
    val fOk = if (needF) valid(col("_graft_mf"), col("_graft_mf._t") - col(time)) else lit(false)
    val chosen: Column = direction match {
      case "backward" => when(bOk, col("_graft_mb"))
      case "forward" => when(fOk, col("_graft_mf"))
      case "nearest" =>
        // both valid → smaller distance wins, exact tie → backward
        when(bOk && fOk,
          when(col(time) - col("_graft_mb._t") <= col("_graft_mf._t") - col(time),
            col("_graft_mb")).otherwise(col("_graft_mf")))
          .when(bOk, col("_graft_mb"))
          .when(fOk, col("_graft_mf"))
    }
    val withChosen = matched.withColumn("_graft_m", chosen)
    val outCols = left.columns.map(col) ++
      (("_t" -> s"$outPrefix$time") +: valueCols.map(v => v -> s"$outPrefix$v")).map {
        case (src, out) => col(s"_graft_m.$src").as(out)
      }
    withChosen.select(outCols: _*)
  }

  /** Inner range-containment join: every (point, interval) pair with
    * matching `keys` and `start ≤ point ≤ end` (inclusive; intervals
    * with `end < start` match nothing). `point`/`start`/`end` are
    * integer-valued columns in the same units (epoch micros, token
    * offsets, positions).
    *
    * Plan shape: intervals explode into covering bins of `binWidth`
    * (`floorDiv(start,w) … floorDiv(end,w)`), points take their single
    * bin, and the join is a hash EQUI-join on (keys…, bin) + the
    * residual BETWEEN filter — never a nested loop. Each qualifying
    * pair surfaces exactly once (a point has ONE bin). Binning is pure
    * 64-bit integer floor-division — exact at ANY magnitude (a
    * double-based `floor(x/w)` coarsens above 2⁵³, inflating
    * replication in shared bins; values stay correct either way since
    * the residual filter decides, but exact bins keep the replication
    * bound honest). Cost: Σ(len/binWidth + 1) replicated interval
    * rows — pick binWidth near the typical interval length. */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame, keys: Seq[String],
      point: String, start: String, end: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val iv = intervals
      .where(col(start).isNotNull && col(end).isNotNull && col(start) <= col(end))
      .withColumn("_graft_bin", explode(sequence(bin(col(start), binWidth), bin(col(end), binWidth))))
    val pt = points
      .where(col(point).isNotNull)
      .withColumn("_graft_bin", bin(col(point), binWidth))
    pt.join(iv, keys :+ "_graft_bin")
      .where(col(point) >= col(start) && col(point) <= col(end))
      .drop("_graft_bin")
  }

  /** Exact long floor-division bin: subtract the (always non-negative)
    * pmod so the dividend is an exact multiple — truncating `div` then
    * equals floor, with no double rounding anywhere (exact at ANY
    * magnitude; a double divide coarsens above 2⁵³). */
  private def bin(c: Column, binWidth: Long): Column = {
    val v = c.cast("long")
    call_function("div", v - pmod(v, lit(binWidth)), lit(binWidth))
  }

  /** Interval-OVERLAP equi-join (L47) — pairs of left/right intervals
    * on the same keys whose CLOSED ranges intersect
    * (`lstart ≤ rend AND rstart ≤ lend`): sessions × outages,
    * promotions × visits — the interval twin of [[rangeJoin]]. Spark
    * plans the raw predicate as a broadcast-nested-loop; this is the
    * same covering-bin reduction as rangeJoin with one extra idea:
    * a pair of overlapping intervals shares EVERY bin their overlap
    * covers, so the join would emit it once per shared bin — instead
    * each pair is OWNED by exactly one bin, the one containing the
    * overlap's start `max(lstart, rstart)` (a bin both sides cover by
    * definition), enforced as a residual predicate. Every overlapping
    * pair then surfaces exactly once with NO distinct/dedup pass.
    *
    * Scale shape: replication is len/binWidth per interval per side
    * (size binWidth to the typical interval length); the (keys, bin)
    * hash join is AQE-skew-splittable; the residual runs inside the
    * join's codegen. NULL or inverted intervals drop (module
    * convention). Column names across the two inputs must be disjoint
    * apart from `keys` (the rangeJoin contract). */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      lstart: String, lend: String, rstart: String, rend: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def valid(df: DataFrame, s: String, e: String) = df
      .where(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
    val lv = valid(left, lstart, lend)
      .withColumn("_graft_bin", explode(sequence(bin(col(lstart), binWidth), bin(col(lend), binWidth))))
    val rv = valid(right, rstart, rend)
      .withColumn("_graft_bin", explode(sequence(bin(col(rstart), binWidth), bin(col(rend), binWidth))))
    lv.join(rv, keys :+ "_graft_bin")
      .where(col(lstart) <= col(rend) && col(rstart) <= col(lend) &&
        bin(greatest(col(lstart), col(rstart)), binWidth) === col("_graft_bin"))
      .drop("_graft_bin")
  }
}
