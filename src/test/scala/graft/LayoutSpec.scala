package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout (L43): the Morton key against a bit-by-bit local
  * reference, the clamp contract, and the MEASURED point of the whole
  * exercise — z-ordered parquet files carry tight min/max on BOTH key
  * columns while a single-column sort leaves the other column's file
  * stats useless. */
class LayoutSpec extends SparkSpec {

  /** Bit-by-bit Morton reference. */
  private def refZ(a: Long, b: Long): Long =
    (0 until 16).map(i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    ).reduce(_ | _)

  test("zValue2 matches the bit-by-bit reference on the 4x4 Morton table and random points") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val pts = (for (a <- 0L to 3L; b <- 0L to 3L) yield (a, b)) ++
      Seq.fill(200)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val out = pts.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue2(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((a, b) <- pts)
      assert(out((a, b)) == refZ(a, b), s"z($a,$b)")
    // spot-pin the canonical corner values
    assert(out((1L, 0L)) == 1L && out((0L, 1L)) == 2L && out((3L, 3L)) == 15L)
  }

  test("clampBits saturates (never wraps) and sends NULL to the origin") {
    import spark.implicits._
    val out = Seq(Some(-5L), Some(70000L), None).toDF("a")
      .select(Layout.zValue2(col("a"), lit(0L)).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out(0) == refZ(0L, 0L))      // negative -> 0
    assert(out(1) == refZ(65535L, 0L))  // overflow -> top cell, not modulo
    assert(out(2) == refZ(0L, 0L))      // NULL -> origin
  }

  test("zorderBy: written files are min/max-tight on BOTH dims; single-col sort is not") {
    import spark.implicits._
    // a 128x128 grid, arriving in row-major order (the worst case for
    // locality on the second dimension)
    val grid = (for (a <- 0 until 128; b <- 0 until 128) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    def fileSpreads(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
      df.write.mode("overwrite").parquet(dir)
      val got = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      got
    }
    val z = fileSpreads(Layout.zorderBy(grid, col("a"), col("b"), bits = 7, numFiles = 16))
    assert(z.size == 16)
    // 16 contiguous z-ranges of a 128x128 grid are ~32x32 blocks; the
    // sampled range boundaries may straddle one block edge, never the
    // full axis
    assert(z.forall { case (sa, sb) => sa < 128 && sb < 128 },
      s"some z-file spans a full axis: $z")
    assert(z.map(_._1).sum / z.size <= 80 && z.map(_._2).sum / z.size <= 80,
      s"z-order files must be tight on BOTH dims on average: $z")
    // baseline: sorting by a alone leaves b's file stats useless (full
    // 127 spread in every file) — the reason z-order exists
    val base = fileSpreads(grid.repartitionByRange(16, col("a")).sortWithinPartitions("a"))
    assert(base.map(_._2).max == 127L,
      s"single-column layout should have useless b stats: $base")
  }
}
