package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based corpus audit statistics (SURVEY §2.5 L18): approximate
  * distinct counts and cross-corpus overlap via Spark's built-in
  * Apache DataSketches HLL aggregates.
  *
  * The question "how much of corpus B is already in corpus A" is an
  * everyday audit at training-data scale (did this crawl re-ingest
  * last month's? does the new source overlap the eval set's domain?),
  * and the exact answer — a distinct join of two 100 TB key sets — is
  * the most expensive query in the book. Sketches answer it with ONE
  * streaming pass and kilobytes of state: HLL sketches merge
  * map-side (the shuffle carries sketch bytes, not keys), and
  * |A ∩ B| = |A| + |B| − |A ∪ B| by inclusion-exclusion over three
  * estimates. Relative error ≈ 1.04/√2^lgK per estimate (~0.8% at the
  * default lgK=14) — the spec gates the end-to-end tolerance.
  *
  * Not oracle-gated: DuckDB's approx_count_distinct uses a different
  * sketch, so cross-engine results agree only within tolerance, and
  * the driver's gate is exact-hash. SketchSpec pins estimates against
  * exact counts instead. For exact overlap, [[overlapExact]] is the
  * honest tool — it IS oracle-gated (`overlap_exact`), and SketchSpec
  * additionally pins the estimate within tolerance of it on the gate
  * shape.
  */
object Sketch {

  /** Exact twin of [[overlapEstimate]] — identical one-row output
    * schema `(n_a, n_b, n_union, n_overlap)`, exact counts. The cost
    * the sketch avoids, paid honestly: group the tagged union by key
    * (ONE shuffle whose payload is the distinct keys — map-side
    * combine collapses duplicates before the exchange, and per-side
    * membership is two max-flags, not a join), then one global
    * partial-merge agg over the distinct-key frame. No join, no
    * second pass. NULL keys are ignored on both sides, matching the
    * sketch (HLL aggregates skip null inputs). At 100 TB prefer the
    * sketch unless the answer feeds an exact billing/dedup decision:
    * shuffling every distinct key once is the floor for exactness. */
  def overlapExact(
      a: DataFrame, keyA: Column, b: DataFrame, keyB: Column): DataFrame = {
    val tagged = a.select(keyA.cast("string").as("_k")).withColumn("_sa", lit(true))
      .unionAll(b.select(keyB.cast("string").as("_k")).withColumn("_sa", lit(false)))
    tagged
      .where(col("_k").isNotNull)
      .groupBy("_k")
      .agg(
        max(when(col("_sa"), 1L).otherwise(0L)).as("_ina"),
        max(when(!col("_sa"), 1L).otherwise(0L)).as("_inb"))
      .agg(
        coalesce(sum(col("_ina")), lit(0L)).as("n_a"),
        coalesce(sum(col("_inb")), lit(0L)).as("n_b"),
        count(lit(1)).as("n_union"),
        coalesce(sum(col("_ina") * col("_inb")), lit(0L)).as("n_overlap"))
  }

  /** One-row frame `(n_a, n_b, n_union, n_overlap)` — estimated
    * distinct key counts of each side, their union, and (by
    * inclusion-exclusion, clamped at 0) the overlap. ONE pass over the
    * tagged union of both key sets: all three sketches build in a
    * single partial-merge aggregate, so neither key set is ever
    * shuffled or joined. */
  def overlapEstimate(
      a: DataFrame, keyA: Column, b: DataFrame, keyB: Column,
      lgK: Int = 14): DataFrame = {
    val tagged = a.select(keyA.cast("string").as("_k")).withColumn("_sa", lit(true))
      .unionAll(b.select(keyB.cast("string").as("_k")).withColumn("_sa", lit(false)))
    tagged
      .agg(
        hll_sketch_agg(when(col("_sa"), col("_k")), lgK).as("_ska"),
        hll_sketch_agg(when(!col("_sa"), col("_k")), lgK).as("_skb"),
        hll_sketch_agg(col("_k"), lgK).as("_sku"))
      .select(
        coalesce(hll_sketch_estimate(col("_ska")), lit(0L)).as("n_a"),
        coalesce(hll_sketch_estimate(col("_skb")), lit(0L)).as("n_b"),
        coalesce(hll_sketch_estimate(col("_sku")), lit(0L)).as("n_union"))
      .withColumn("n_overlap", greatest(lit(0L), col("n_a") + col("n_b") - col("n_union")))
  }
}
