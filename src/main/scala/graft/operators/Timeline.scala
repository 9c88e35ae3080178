package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-stream analytics (SURVEY §2.5 L33) — the three
  * classic user-timeline rewrites every clickstream/telemetry
  * warehouse runs, composed so each is ONE hash exchange on the
  * entity key (the batch twins of `graft.streaming.GStream`'s
  * stateful sessionization):
  *
  *  - SESSIONIZE: gap-based session assignment (a session breaks
  *    where the gap to the previous event exceeds `gap`). The lag +
  *    running-sum windows share one (partition, order) spec, so the
  *    plan is exchange → one sort → window pass(es); the per-session
  *    rollup then reuses the same hash partitioning (grouping keys ⊇
  *    partition keys → no second exchange).
  *  - FUNNEL: ordered step conversion (earliest step-1 time, then the
  *    earliest step-2 strictly after it, …). Computed as a chain of
  *    unordered per-key window minima — one exchange, no sort at all
  *    (every frame is the whole partition), never a self-join per
  *    step.
  *  - ROLLING: per-event trailing time-window aggregates via a RANGE
  *    frame over the entity timeline — the "events/spend in the last
  *    hour" feature. One exchange + one sort; the frame is
  *    value-based, so equal timestamps agree regardless of tie order.
  *
  * All three are keyed windows: a single degenerate key serializes
  * within its task (the standard keyed-window caveat — same note as
  * [[Joins]]); volume per key is an entity's own history, which is
  * the bounded dimension in practice. Rows with a NULL `time` belong
  * to no timeline and are dropped up front (documented; Spark and
  * ANSI engines disagree on default NULL ordering, so leaving them in
  * would make session numbering engine-dependent). */
object Timeline {

  /** Per-event session assignment: input columns plus
    * `session_idx` — 1-based, per `keys`, in `time` order (ties break
    * by `tieBreak` for a stable lag; a zero gap never splits a
    * session, so the assignment itself is tie-order independent).
    * `gap` is in `time`'s own units (e.g. epoch micros): a new
    * session starts where `time - lag(time) > gap`. */
  def sessionize(
      df: DataFrame, keys: Seq[String], time: String, gap: Long,
      tieBreak: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key")
    require(gap > 0, s"gap must be positive, got $gap")
    val order = col(time).asc +: tieBreak.map(col(_).asc).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.where(col(time).isNotNull)
      .withColumn("_brk",
        when(col(time) - lag(col(time), 1).over(w) > gap, 1L)
          .otherwise(when(lag(col(time), 1).over(w).isNull, 1L).otherwise(0L)))
      .withColumn("session_idx", sum(col("_brk")).over(run))
      .drop("_brk")
  }

  /** Per-session rollup of [[sessionize]]:
    * `(keys…, session_idx, session_start, session_end, n_events,
    * sum_cents)` — `sum_cents` totals `valueCol` in integer
    * hundredths (rounded per event BEFORE summing, so the total is an
    * exact integer regardless of aggregation order; NULL values count
    * as zero). Grouping keys contain the window partition keys, so
    * the rollup reuses the sessionize exchange — the whole operator
    * shuffles once. */
  def sessionStats(
      df: DataFrame, keys: Seq[String], time: String, gap: Long,
      valueCol: String): DataFrame =
    sessionize(df, keys, time, gap)
      .groupBy((keys :+ "session_idx").map(col): _*)
      .agg(
        min(col(time)).as("session_start"),
        max(col(time)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(coalesce(round(col(valueCol) * 100).cast("long"), lit(0L)))
          .as("sum_cents"))

  /** Ordered-step funnel: one row per distinct `keys` value with
    * `t_<step>` = the earliest `time` of each step reached IN ORDER
    * (step i+1 must be STRICTLY after step i; `within` bounds every
    * later step to `t_1 + within`) and `depth` = number of steps
    * reached. Entities that never reach step 1 appear with all-NULL
    * times and depth 0 — the conversion denominator.
    *
    * Plan shape: each step is an unordered `min(when(pred, time))`
    * window over the SAME key partitioning — one exchange, k window
    * passes, no sorts; the final per-key collapse reuses that
    * partitioning. The alternative k-way self-join would shuffle the
    * table k times. */
  def funnel(
      df: DataFrame, keys: Seq[String], time: String,
      steps: Seq[(String, Column)], within: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "funnel needs at least one key")
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.map(_._1).distinct.size == steps.size, "duplicate step names")
    val w = Window.partitionBy(keys.map(col): _*)
    val base = df.where(col(time).isNotNull)
      .select(keys.map(col) ++ Seq(col(time).as("_t")) ++
        steps.zipWithIndex.map { case ((_, p), i) => p.as(s"_p_$i") }: _*)
    val stepped = steps.zipWithIndex.foldLeft(base) {
      case (d, ((name, _), i)) =>
        val pred = col(s"_p_$i")
        val hit = if (i == 0) pred
          else {
            val afterPrev = col(s"_ts_${i - 1}").isNotNull && col("_t") > col(s"_ts_${i - 1}")
            within match {
              case None => pred && afterPrev
              case Some(lim) => pred && afterPrev && col("_t") <= col("_ts_0") + lim
            }
          }
        d.withColumn(s"_ts_$i", min(when(hit, col("_t"))).over(w))
    }
    val tCols = steps.zipWithIndex.map { case ((name, _), i) =>
      min(col(s"_ts_$i")).as(s"t_$name")
    }
    // fold shallow→deep so the DEEPEST reached step is the outermost
    // branch of the final conditional
    val depth = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(min(col(s"_ts_$i")).isNotNull, lit(i + 1)).otherwise(acc)
    }
    stepped.groupBy(keys.map(col): _*)
      .agg(tCols.head, (tCols.tail :+ depth.as("depth")): _*)
  }

  /** Cohort retention: entities grouped by WHEN they first triggered
    * `cohortPred` (bucketed to `bucket` units of `time` — weeks, days)
    * and counted at each bucket offset they were active afterwards.
    * Output `(cohort, offset, n_active)`: `cohort` = the entity's
    * first-trigger time div bucket, `offset` = (event time − first
    * trigger) div bucket (0 = the cohort bucket itself), `n_active` =
    * DISTINCT entities from that cohort with any event at that offset
    * — the classic retention triangle. Entities that never trigger
    * `cohortPred`, and events before the trigger, are excluded.
    *
    * Plan shape: the cohort anchor is an unordered per-key window min
    * (the funnel trick — one exchange, no sort, no self-join), offsets
    * are narrow integer arithmetic (`div` — both positive, so
    * truncation is floor in every engine), and the distinct count is
    * a single-distinct two-phase aggregate (no Expand). */
  def retention(
      df: DataFrame, keys: Seq[String], time: String,
      cohortPred: Column, bucket: Long): DataFrame = {
    require(keys.nonEmpty, "retention needs at least one key")
    require(bucket > 0, s"bucket must be positive, got $bucket")
    val w = Window.partitionBy(keys.map(col): _*)
    df.where(col(time).isNotNull)
      .select(keys.map(col) :+ col(time).as("_t") :+ cohortPred.as("_c"): _*)
      .withColumn("_t0", min(when(col("_c"), col("_t"))).over(w))
      .where(col("_t0").isNotNull && col("_t") >= col("_t0"))
      .select(
        expr(s"_t0 div $bucket").as("cohort"),
        expr(s"(_t - _t0) div $bucket").as("offset"),
        struct(keys.map(col): _*).as("_k"))
      .groupBy("cohort", "offset")
      .agg(count_distinct(col("_k")).as("n_active"))
  }

  /** Per-event trailing-window aggregates: input columns plus each of
    * `aggs` evaluated over the RANGE frame `[time - back, time]`
    * within the entity's timeline. `aggs` are ordinary aggregate
    * Columns (`count(lit(1))`, `sum(...)`) — they are `.over()`-bound
    * here. The frame is value-based: simultaneous events see each
    * other symmetrically, so the result is deterministic under ties. */
  def rolling(
      df: DataFrame, keys: Seq[String], time: String, back: Long,
      aggs: (String, Column)*): DataFrame = {
    require(keys.nonEmpty, "rolling needs at least one key")
    require(back > 0, s"back must be positive, got $back")
    require(aggs.nonEmpty, "rolling needs at least one aggregate")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(time).asc)
      .rangeBetween(-back, 0)
    aggs.foldLeft(df.where(col(time).isNotNull)) {
      case (d, (name, a)) => d.withColumn(name, a.over(w))
    }
  }
}
