package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-skipping layout — Z-order (Morton-curve)
  * clustering, the published technique behind "OPTIMIZE ZORDER BY"
  * (Morton 1966; the min/max-pruning layout every lakehouse engine
  * documents): interleaving the bits of two key columns gives a total
  * order whose contiguous ranges are (approximately) axis-aligned
  * rectangles, so range-partitioned files carry TIGHT min/max footer
  * stats on BOTH columns at once. A scan filtering on either key (or
  * both) then skips most files from the parquet footers alone — at
  * 100 TB the difference between "read 2%" and "read 100%" for a
  * point-ish query on a secondary dimension. A single-column sort
  * gives perfect stats on that column and USELESS stats on every
  * other; Z-order trades a little of each for locality on all.
  *
  * The z-value is pure 64-bit integer arithmetic (clamp → magic-number
  * bit spread → interleave), so it is reproducible in any engine and
  * ANSI-SQL-mirrorable bit for bit — and the expression is one narrow
  * codegen'd projection (no shuffle, no join) until the explicit
  * range exchange that materializes the layout. */
object Layout {

  /** Spread the low 16 bits of `x` to the even bit positions of a
    * 32-bit value (the standard mask chain — each step doubles the
    * gap): `abcd → 0a0b0c0d`. Input must already be in [0, 2^16). */
  private def spread16(x: Column): Column = {
    val s1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Clamp a non-negative ordinal into the `bits`-wide domain. Values
    * are CLAMPED, not wrapped — wrapping (modulo) would teleport large
    * outliers to the origin and destroy locality; the clamp only
    * saturates the top cell. NULL → 0 (the origin cell — NULL keys
    * cluster together and never poison the file stats with extremes). */
  def clampBits(c: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    greatest(lit(0L), least(coalesce(c.cast("long"), lit(0L)), lit((1L << bits) - 1L)))
  }

  /** The 2-D Morton z-value of two `bits`-wide non-negative ordinals:
    * `a`'s bits land on even positions, `b`'s on odd. Total order over
    * [0, 2^(2·bits)). Both inputs are [[clampBits]]-normalized first;
    * map real domains onto ordinals with [[Profile.bucketByThresholds]]
    * (quantile ranks — equal-population cells) or plain integer
    * arithmetic. SQL mirror: the identical mask chain on BIGINT. */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column =
    spread16(clampBits(a, bits))
      .bitwiseOR(shiftleft(spread16(clampBits(b, bits)), 1))

  /** Materialize the Z-order layout: range-partition on the z-value
    * into `numFiles` output tasks and sort each task by it, so a
    * `write.parquet` emits files whose footer min/max are tight on
    * BOTH key columns. The range exchange is the one unavoidable
    * shuffle (layout IS placement); the sampled boundaries make file
    * SIZES approximately even — boundary sampling never affects
    * correctness, only balance. The helper column is dropped from the
    * result; re-derive it at read time if needed (it is deterministic). */
  def zorderBy(
      df: DataFrame, a: Column, b: Column,
      bits: Int = 16, numFiles: Int = 200): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.withColumn("_graft_z", zValue2(a, b, bits))
      .repartitionByRange(numFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
  }
}
