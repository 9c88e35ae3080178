package graft

import org.apache.spark.sql.functions.col

import graft.operators.Pca

/** Distributed PCA (L50): a known-geometry fixture, variance ordering,
  * reconstruction at full rank, bad-vector skipping, partition
  * invariance, save/load. */
class PcaSpec extends SparkSpec {

  private def vecs(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private val rng = new scala.util.Random(5)
  // anisotropic 3-D cloud: dominant axis ~(1,1,0)/√2, tiny z noise
  private val cloud = (1L to 300L).map { i =>
    val t = rng.nextGaussian() * 10.0
    val n1 = rng.nextGaussian() * 0.5
    (i, Seq(t + n1 + 3.0, t - n1 + 1.0, rng.nextGaussian() * 0.1))
  }

  test("the first component recovers the dominant axis; variances order descending") {
    val m = Pca.train(vecs(cloud), col("embedding"), dim = 3, k = 3)
    val c0 = m.components(0)
    // ~(1,1,0)/sqrt(2) up to canonical sign
    assert(math.abs(math.abs(c0(0)) - math.sqrt(0.5)) < 0.02, c0.toSeq.toString)
    assert(math.abs(math.abs(c0(1)) - math.sqrt(0.5)) < 0.02)
    assert(math.abs(c0(2)) < 0.05)
    assert(c0.maxBy(math.abs) > 0, "sign canonicalization: largest entry positive")
    // projected variance must be descending
    val proj = Pca.project(vecs(cloud), col("embedding"), m)
      .select("proj").collect().map(_.getSeq[Double](0))
    val vars = (0 until 3).map { j =>
      val xs = proj.map(_(j)); val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    assert(vars(0) > vars(1) && vars(1) >= vars(2), vars.toString)
  }

  test("full-rank projection reconstructs the centered data (orthonormal basis)") {
    val m = Pca.train(vecs(cloud), col("embedding"), dim = 3, k = 3)
    val rows = Pca.project(vecs(cloud.take(20)), col("embedding"), m)
      .select("embedding", "proj").collect()
    for (r <- rows) {
      val v = r.getSeq[Double](0); val p = r.getSeq[Double](1)
      for (d <- 0 until 3) {
        val rec = m.mean(d) + (0 until 3).map(j => p(j) * m.components(j)(d)).sum
        assert(math.abs(rec - v(d)) < 1e-9, s"dim $d: $rec vs ${v(d)}")
      }
    }
  }

  test("NULL / wrong-length / NaN vectors are skipped in training; n<2 throws") {
    val bad = vecs(cloud.take(10)) unionByName vecs(Seq(
      (900L, null.asInstanceOf[Seq[Double]]),
      (901L, Seq(1.0, 2.0)),
      (902L, Seq(Double.NaN, 0.0, 0.0))))
    val m1 = Pca.train(bad, col("embedding"), dim = 3, k = 2)
    val m2 = Pca.train(vecs(cloud.take(10)), col("embedding"), dim = 3, k = 2)
    assert(m1.mean.zip(m2.mean).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    val ex = intercept[IllegalArgumentException] {
      Pca.train(vecs(Seq((1L, Seq(1.0, 2.0, 3.0)))), col("embedding"), dim = 3, k = 1)
    }
    assert(ex.getMessage.contains("at least 2"))
  }

  test("composition: ANN over PCA-reduced vectors still finds the planted neighbors") {
    import spark.implicits._
    // three tight 16-d clusters; reduce to 4-d and brute-force search
    val rng2 = new scala.util.Random(9)
    val centers = Array.fill(3)(Array.fill(16)(rng2.nextGaussian() * 5.0))
    val pts = (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(_ + rng2.nextGaussian() * 0.05).toSeq)
    }
    val table = pts.toDF("vec_id", "embedding")
    val basis = Pca.train(table, col("embedding"), dim = 16, k = 4)
    val reduced = Pca.project(table, col("embedding"), basis)
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("proj"),
          x => x.cast("float")).as("embedding"))
    val probes = reduced.where(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val top = graft.operators.Ann.topKBrute(reduced, col("vec_id"), col("embedding"),
        probes, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    // every neighbor of probe p must come from p's cluster (id % 3)
    for ((p, ns) <- top)
      assert(ns.forall { case (_, n) => n % 3 == p % 3 },
        s"probe $p pulled cross-cluster neighbors: ${ns.toSeq}")
  }

  test("codegen kernel == interpreted HOF chain, bit-for-bit; edge semantics match") {
    import spark.implicits._
    val m = Pca.train(vecs(cloud), col("embedding"), dim = 3, k = 3)
    // exact == on every component: the kernel's ascending-index fold is
    // the HOF chain's arithmetic, not an approximation of it
    val fast = Pca.project(vecs(cloud), col("embedding"), m)
      .select("vec_id", "proj").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val slow = Pca.projectHof(vecs(cloud), col("embedding"), m)
      .select("vec_id", "proj").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(fast.keySet == slow.keySet)
    for ((id, f) <- fast; (a, b) <- f.zip(slow(id)))
      assert(a == b, s"vec $id: kernel $a != hof $b")
    // float input: cast-to-double-then-center equals getFloat-toDouble
    val fl = Seq((1L, Seq(1.5f, -2.25f, 8.0f))).toDF("vec_id", "embedding")
    val pf = Pca.project(fl, col("embedding"), m).select("proj")
      .head().getSeq[Double](0)
    val pd = Pca.projectHof(
        fl.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
        col("embedding"), m)
      .select("proj").head().getSeq[Double](0)
    assert(pf == pd)
    // wrong-length vector -> k NULL components (the zip_with padding
    // semantics the kernel preserves); NaN propagates to NaN
    val edge = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(Double.NaN, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val rows = Pca.project(edge, col("embedding"), m)
      .select("vec_id", "proj").collect()
      .map(r => r.getLong(0) -> r.getSeq[java.lang.Double](1)).toMap
    assert(rows(1L).forall(_ == null), rows(1L).toString)
    assert(rows(2L).forall(x => x != null && x.isNaN), rows(2L).toString)
  }

  test("same layout ⇒ bit-identical basis (partition-index-order combine)") {
    // The fold over per-partition partials is pinned to partition INDEX
    // order, so re-training over the SAME layout is exact ==, not a
    // tolerance — even with 13 partitions racing task completion.
    val in = vecs(cloud).repartition(13, col("vec_id")).cache()
    try {
      val a = Pca.train(in, col("embedding"), dim = 3, k = 3)
      val b = Pca.train(in, col("embedding"), dim = 3, k = 3)
      assert(a.mean.sameElements(b.mean))
      for (j <- 0 until 3)
        assert(a.components(j).sameElements(b.components(j)),
          s"component $j differs between same-layout trains")
    } finally { in.unpersist(); () }
  }

  test("training is partition-invariant (within eigensolver tolerance); save/load == direct") {
    val a = Pca.train(vecs(cloud), col("embedding"), dim = 3, k = 2)
    val b = Pca.train(vecs(cloud).repartition(13), col("embedding"), dim = 3, k = 2)
    for (j <- 0 until 2; d <- 0 until 3)
      assert(math.abs(a.components(j)(d) - b.components(j)(d)) < 1e-8)
    val dir = java.nio.file.Files.createTempDirectory("graft-pca").toString + "/basis"
    Pca.save(a, dir, spark)
    val loaded = Pca.load(spark, dir)
    assert(loaded.mean.sameElements(a.mean))
    assert(loaded.components.zip(a.components).forall { case (x, y) => x.sameElements(y) })
  }
}
