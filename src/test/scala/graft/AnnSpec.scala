package graft

import org.apache.spark.sql.functions.col

import graft.operators.{Ann, Vec}

/** L6–L7: brute-force top-k pinned against an independent local
  * implementation; LSH recall pinned on planted clusters. */
class AnnSpec extends SparkSpec {

  object Embs extends GSchema {
    val vec_id    = col[Long]("vec_id")
    val embedding = col[Seq[Float]]("embedding")
  }

  private val dim = 8
  // 4 tight clusters of 5 vectors each: member = center + 0.01·noise.
  private val vectors: Seq[Emb] = {
    val rnd = new java.util.Random(99L)
    (0 until 4).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian())
      (0 until 5).map { m =>
        val v = center.map(x => (x + 0.01 * rnd.nextGaussian()).toFloat)
        Emb((c * 5 + m).toLong, v.toSeq)
      }
    }
  }
  private val probeIds = Seq(0L, 5L, 10L, 15L)

  /** Independent local reference: same fold order (left-to-right double),
    * same formula, same HALF_UP rounding as the Spark operator. */
  private def localTopK(k: Int): Map[Long, Seq[(Long, Double, Int)]] = {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    probeIds.map { p =>
      val pv = vectors.find(_.vec_id == p).get.embedding
      val ranked = vectors.filter(_.vec_id != p)
        .map(e => e.vec_id -> round6(cos(e.embedding, pv)))
        .sortBy { case (id, s) => (-s, id) }
        .take(k).zipWithIndex
        .map { case ((id, s), i) => (id, s, i + 1) }
      p -> ranked
    }.toMap
  }

  private def frames = {
    import spark.implicits._
    val e = Tio.fromRows(spark, Embs, vectors).toNative
    val probes = e.where(col("vec_id") < 20).where(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    (e, probes)
  }

  test("topKBrute matches an independent local implementation exactly") {
    val (e, probes) = frames
    val got = Ann.topKBrute(e, col("vec_id"), col("embedding"), probes, k = 6)
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), (r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim"), r.getAs[Int]("rank"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._3).toSeq).toMap
    assert(got == localTopK(6))
  }

  test("topKLsh recovers the brute-force top-4 (cluster mates) per probe") {
    val (e, probes) = frames
    val brute = localTopK(4).view.mapValues(_.map(_._1).toSet).toMap
    val lsh = Ann.topKLsh(e, col("vec_id"), col("embedding"), probes, k = 4, dim = dim)
      .collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(lsh == brute)
    // and the planted structure: each probe's top-4 are its cluster mates
    probeIds.foreach { p =>
      assert(brute(p) == (p until p + 5).toSet - p)
    }
  }

  test("lshCandidates bounds a hot bucket at maxCandidatesPerProbe, keeping most-collision pairs") {
    import spark.implicits._
    // adversarial skew: 60 IDENTICAL vectors — every LSH table hashes
    // them to one bucket, so an uncapped candidate set is the full 60
    // per probe (the unbounded-broadcast hazard at scale)
    val hot = (0L until 60L).map(i => Emb(i, Seq.fill(dim)(1.0f)))
    val e = Tio.fromRows(spark, Embs, hot).toNative
    val probes = e.where(col("vec_id") === 0L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val capped = Ann.lshCandidates(e, col("vec_id"), col("embedding"), probes,
      dim = dim, maxCandidatesPerProbe = 10).collect()
    assert(capped.length == 10)
    // all pairs collide in all tables, so the tie-break keeps the
    // smallest neighbor ids — deterministic under the cap
    assert(capped.map(_.getAs[Long]("neighbor_id")).sorted.toSeq == (1L to 10L))
    // and the capped search still returns a full, well-formed top-k
    val out = Ann.topKLsh(e, col("vec_id"), col("embedding"), probes, k = 4,
      dim = dim, maxCandidatesPerProbe = 10).collect()
    assert(out.length == 4 && out.forall(_.getAs[Double]("sim") > 0.999))
    // default cap leaves healthy workloads untouched: same result as
    // an explicitly uncapped-equivalent run
    val (e2, probes2) = frames
    val dflt = Ann.lshCandidates(e2, col("vec_id"), col("embedding"), probes2, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val loose = Ann.lshCandidates(e2, col("vec_id"), col("embedding"), probes2,
      dim = dim, maxCandidatesPerProbe = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dflt == loose)
  }

  test("topKIvf recovers the brute-force top-4 via inverted lists") {
    val (e, probes) = frames
    val brute = localTopK(4).view.mapValues(_.map(_._1).toSet).toMap
    val ivf = Ann.topKIvf(e, col("vec_id"), col("embedding"), probes, k = 4,
        dim = dim, nClusters = 4, nProbe = 2)
      .collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf == brute)
  }

  test("topKIvf trains on a uniform sample — cluster-sorted input, small sample") {
    val (e, probes) = frames
    // One partition, sorted by cluster: a first-rows "sample" of 8 rows
    // would only ever see clusters 0-1; the seeded uniform sample
    // (orderBy(rand)) must still recover recall 1 vs brute force.
    val sorted = e.orderBy(col("vec_id")).coalesce(1)
    val brute = localTopK(4).view.mapValues(_.map(_._1).toSet).toMap
    val ivf = Ann.topKIvf(sorted, col("vec_id"), col("embedding"), probes, k = 4,
        dim = dim, nClusters = 4, nProbe = 2, trainSampleRows = 8)
      .collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf == brute)
  }

  test("an all-NaN data vector drops out of IVF and IVF×PQ search (ANSI-safe)") {
    // Regression: the data side's top-1 centroid lookup used [0] on the
    // (empty) centroid list of a degenerate vector — a runtime error
    // under ANSI mode. get() degrades it to NULL, the equi-join drops
    // it, and every honest neighbor still ranks.
    import spark.implicits._
    val (e, probes) = frames
    val poisoned = e.unionByName(
      Seq((999L, Seq.fill(dim)(Float.NaN))).toDF("vec_id", "embedding"))
    val unit = Ann.trainIvf(e, col("embedding"), dim, nClusters = 4, seed = 7)
    val ivf = Ann.topKIvfWith(unit, poisoned, col("vec_id"), col("embedding"), probes,
      k = 4, nProbe = 4).collect()
    assert(ivf.nonEmpty && !ivf.exists(_.getLong(1) == 999L))
    val cb = Ann.trainPq(e, col("embedding"), dim, m = 4, codes = 8)
    val ivfpq = Ann.topKIvfPqWith(unit, cb, poisoned, col("vec_id"), col("embedding"),
      probes, k = 4, nProbe = 4, rerank = 10).collect()
    assert(ivfpq.nonEmpty && !ivfpq.exists(_.getLong(1) == 999L))
  }

  test("IVF plan stays flat as nClusters grows (centroids ship as one reference object)") {
    val (e, probes) = frames
    def planLen(nc: Int): Int =
      Ann.topKIvf(e, col("vec_id"), col("embedding"), probes, k = 4,
          dim = dim, nClusters = nc, nProbe = nc / 2)
        .queryExecution.executedPlan.toString.length
    // the literal-array formulation grew O(nClusters·dim) in the plan;
    // the reference-object kernel must not
    assert(planLen(256) < planLen(16) * 2)
    val rows = Ann.topKIvf(e, col("vec_id"), col("embedding"), probes, k = 4,
      dim = dim, nClusters = 256, nProbe = 128).collect()
    assert(rows.length == probeIds.size * 4)
  }

  test("IVF quantizer persists: save/load round trip searches identically to direct topKIvf") {
    val (e, probes) = frames
    val direct = Ann.topKIvf(e, col("vec_id"), col("embedding"), probes,
      k = 4, dim = dim, nClusters = 4, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val trained = Ann.trainIvf(e, col("embedding"), dim, nClusters = 4)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/quantizer"
    Ann.saveIvf(spark, trained, path)
    val loaded = Ann.loadIvf(spark, path)
    assert(loaded.length == trained.length)
    assert(loaded.zip(trained).forall { case (a, b) => a.sameElements(b) })
    val viaLoaded = Ann.topKIvfWith(loaded, e, col("vec_id"), col("embedding"), probes,
      k = 4, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaLoaded == direct && viaLoaded.nonEmpty)
  }

  test("topKPq recovers the brute-force top-4 through ADC candidates") {
    val (e, probes) = frames
    val brute = localTopK(4).view.mapValues(_.map(_._1).toSet).toMap
    // rerank=8 of 19 possible: the ADC ranking itself must surface the
    // cluster mates, not a take-everything candidate set
    val pq = Ann.topKPq(e, col("vec_id"), col("embedding"), probes, k = 4,
        dim = dim, m = 4, codes = 8, rerank = 8)
      .collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(pq == brute)
  }

  test("PQ quantizer persists: save/load round trip searches identically to direct topKPq") {
    val (e, probes) = frames
    val direct = Ann.topKPq(e, col("vec_id"), col("embedding"), probes,
      k = 4, dim = dim, m = 4, codes = 8, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val trained = Ann.trainPq(e, col("embedding"), dim, m = 4, codes = 8)
    val path = java.nio.file.Files.createTempDirectory("graft-pq").toString + "/quantizer"
    Ann.savePq(spark, trained, path)
    val loaded = Ann.loadPq(spark, path)
    assert(loaded.m == trained.m && loaded.subDim == trained.subDim && loaded.k == trained.k)
    assert(loaded.flat == trained.flat)
    val viaLoaded = Ann.topKPqWith(loaded, e, col("vec_id"), col("embedding"), probes,
      k = 4, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaLoaded == direct && viaLoaded.nonEmpty)
  }

  test("topKIvfPq recovers the brute-force top-4; nProbe=nClusters degrades to pure PQ") {
    val (e, probes) = frames
    val unit = Ann.trainIvf(e, col("embedding"), dim, nClusters = 4)
    val cb = Ann.trainPq(e, col("embedding"), dim, m = 4, codes = 8)
    val brute = localTopK(4).view.mapValues(_.map(_._1).toSet).toMap
    val ivfpq = Ann.topKIvfPqWith(unit, cb, e, col("vec_id"), col("embedding"), probes,
        k = 4, nProbe = 2, rerank = 8)
      .collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivfpq == brute)
    // searching ALL lists must equal the pure-PQ search with the same
    // codebooks and rerank breadth — the composition law
    val all = Ann.topKIvfPqWith(unit, cb, e, col("vec_id"), col("embedding"), probes,
        k = 4, nProbe = 4, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val purePq = Ann.topKPqWith(cb, e, col("vec_id"), col("embedding"), probes,
        k = 4, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(all == purePq && all.nonEmpty)
  }

  test("ivfPqCandidates with nProbe=nClusters equals pqCandidates (candidate-level composition law)") {
    val (e, probes) = frames
    val unit = Ann.trainIvf(e, col("embedding"), dim, nClusters = 4)
    val cb = Ann.trainPq(e, col("embedding"), dim, m = 4, codes = 8)
    val composed = Ann.ivfPqCandidates(unit, cb, e, col("vec_id"), col("embedding"),
        probes, nProbe = 4, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pure = Ann.pqCandidates(cb, e, col("vec_id"), col("embedding"), probes, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(composed == pure && composed.nonEmpty)
    // and the exported candidates are exactly what the search reranks:
    // every result pair of the nProbe=2 search appears in its candidates
    val cand2 = Ann.ivfPqCandidates(unit, cb, e, col("vec_id"), col("embedding"),
        probes, nProbe = 2, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val search2 = Ann.topKIvfPqWith(unit, cb, e, col("vec_id"), col("embedding"), probes,
        k = 4, nProbe = 2, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(search2.subsetOf(cand2))
  }

  test("PQ kernels: self-similarity ≈ 1 after encode+ADC; degenerate vectors drop out") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.hashing.VecUtil
    val cb = Ann.trainPq(frames._1, col("embedding"), dim, m = 4, codes = 8)
    val cbArr = cb.flat.toArray
    val v = vectors.head.embedding.map(_.toDouble).toArray
    val codes = VecUtil.pqEncode(new GenericArrayData(v), cbArr, cb.m, cb.subDim, cb.k, false)
    val lut = VecUtil.pqLut(new GenericArrayData(v), cbArr, cb.m, cb.subDim, cb.k, false)
    val self = VecUtil.pqAdc(codes, lut, cb.k)
    // quantization error on an 8-dim tight-cluster member is small
    assert(self > 0.95 && self <= 1.0 + 1e-9, s"ADC self-similarity $self")
    // degenerate inputs: empty codes/lut, NaN → pqAdc NaN, encode empty
    val nan = new GenericArrayData(Array.fill(dim)(Double.NaN))
    assert(VecUtil.pqEncode(nan, cbArr, cb.m, cb.subDim, cb.k, false).numElements() == 0)
    assert(VecUtil.pqLut(nan, cbArr, cb.m, cb.subDim, cb.k, false).numElements() == 0)
    assert(java.lang.Double.isNaN(VecUtil.pqAdc(
      new GenericArrayData(Array.empty[Int]), lut, cb.k)))
    // codes from a quantizer with a different k, size-coincident LUT:
    // out-of-range code values follow the NaN degrade contract, never
    // an executor ArrayIndexOutOfBoundsException
    assert(java.lang.Double.isNaN(VecUtil.pqAdc(
      new GenericArrayData(Array(0, cb.k, 0, 0)), lut, cb.k)))
    assert(java.lang.Double.isNaN(VecUtil.pqAdc(
      new GenericArrayData(Array(0, -1, 0, 0)), lut, cb.k)))
  }

  test("empty table yields an empty, correctly-shaped PQ result") {
    val (e, probes) = frames
    val out = Ann.topKPq(e.where(col("vec_id") < 0), col("vec_id"), col("embedding"),
      probes, k = 4, dim = dim, m = 4, codes = 8)
    assert(out.columns.toSeq == Seq("probe_id", "neighbor_id", "sim", "rank"))
    assert(out.count() == 0)
  }

  test("cosine kernel agrees with plain math on a known pair") {
    import spark.implicits._
    val df = Seq((Seq(1f, 0f), Seq(1f, 1f))).toDF("a", "b")
    val got = df.select(Vec.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(got - 1.0 / math.sqrt(2.0)) < 1e-15)
  }

  test("topCentroids truncates to real centroid ids — an all-NaN vector yields an empty list") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.hashing.VecUtil
    val centroids = Array(1.0, 0.0, 0.0, 1.0) // 2 unit centroids, dim 2
    val nan = new GenericArrayData(Array(Double.NaN, Double.NaN))
    // nothing inserts: empty output, never an Int.MinValue sentinel id
    assert(VecUtil.topCentroids(nan, centroids, dim = 2, top = 3, isFloat = false)
      .toIntArray().isEmpty)
    // a real vector with top > k returns exactly the k distinct real ids
    val v = new GenericArrayData(Array(1.0, 0.1))
    assert(VecUtil.topCentroids(v, centroids, dim = 2, top = 5, isFloat = false)
      .toIntArray().toSeq == Seq(0, 1))
  }

  test("structurally equal centroid/hyperplane expressions compare equal (CSE-friendly)") {
    import org.apache.spark.sql.graftexpr.{CentroidIdsExpr, HyperplaneBucketsExpr}
    import org.apache.spark.sql.graftbridge.Bridge
    val cs = Seq(1.0, 0.0, 0.0, 1.0)
    val c = Bridge.expr(col("v"))
    assert(CentroidIdsExpr(c, cs, 2, 1) == CentroidIdsExpr(c, Seq(1.0, 0.0, 0.0, 1.0), 2, 1))
    assert(HyperplaneBucketsExpr(c, cs, 1, 2) == HyperplaneBucketsExpr(c, Seq(1.0, 0.0, 0.0, 1.0), 1, 2))
  }

  test("PQ codes catalog: search over written codes equals topKPqWith; append and fail-fasts") {
    val (e, probes) = frames
    val cb = Ann.trainPq(e, col("embedding"), dim = dim, m = 4, codes = 8)
    val dir = java.nio.file.Files.createTempDirectory("pqcat").toString + "/cat"
    Ann.writePqCodes(cb, e, col("vec_id"), col("embedding"), dir)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val direct = asSet(Ann.topKPqWith(cb, e, col("vec_id"), col("embedding"),
      probes, k = 4, rerank = 20))
    val fromCatalog = asSet(Ann.searchPqCodes(spark, dir, e, col("vec_id"),
      col("embedding"), probes, k = 4, rerank = 20))
    assert(fromCatalog == direct, "persisted-codes search must equal the in-memory path")
    // incremental build: two appends over an overwrite == one full write
    val dir2 = java.nio.file.Files.createTempDirectory("pqcat2").toString + "/cat"
    Ann.writePqCodes(cb, e.where(col("vec_id") % 2 === 0), col("vec_id"), col("embedding"), dir2)
    Ann.writePqCodes(cb, e.where(col("vec_id") % 2 =!= 0), col("vec_id"), col("embedding"),
      dir2, mode = "append")
    val appended = asSet(Ann.searchPqCodes(spark, dir2, e, col("vec_id"),
      col("embedding"), probes, k = 4, rerank = 20))
    assert(appended == direct, "append-built catalog must search identically")
    // fail-fast: appending codes from a DIFFERENT codebook is refused
    val otherCb = Ann.trainPq(e, col("embedding"), dim = dim, m = 4, codes = 8, seed = 99L)
    assert(otherCb != cb)
    intercept[IllegalArgumentException] {
      Ann.writePqCodes(otherCb, e, col("vec_id"), col("embedding"), dir2, mode = "append")
    }
    // fail-fast: params-less data (a crash between the two writes) is
    // corrupt, not empty — append refuses; overwrite repairs
    val pdir = new java.io.File(dir2, "params")
    pdir.listFiles.foreach(f => { f.delete(); () }); pdir.delete()
    assert(Ann.readPqCodesParams(spark, dir2).isEmpty)
    intercept[IllegalArgumentException] {
      Ann.writePqCodes(cb, e, col("vec_id"), col("embedding"), dir2, mode = "append")
    }
    Ann.writePqCodes(cb, e, col("vec_id"), col("embedding"), dir2) // overwrite repairs
    assert(asSet(Ann.searchPqCodes(spark, dir2, e, col("vec_id"),
      col("embedding"), probes, k = 4, rerank = 20)) == direct)
    // no catalog at all → throw, not silently-empty
    intercept[IllegalArgumentException] {
      Ann.searchPqCodes(spark, dir2 + "_nope", e, col("vec_id"), col("embedding"), probes, k = 4)
    }
  }

  test("rerankFor recovers PQ recall on a near-duplicate corpus (sf10 jitter twin)") {
    import spark.implicits._
    // Small-scale twin of the jittered sf10 stress finding: one probe
    // whose true top-k live inside a near-tie cluster LARGER than the
    // default rerank cut. 40 copies of center A at cos ≈ 0.999 — far
    // enough apart that exact cosine ORDERS them (above the 1e-6
    // rounding grain), close enough that they share PQ codes and their
    // ADC scores tie, so the top-`rerank` cut among them follows
    // id-tie-break order, not true similarity — + 160 background
    // vectors. k=10: a rerank cut of 12 keeps the 12 smallest-id
    // A-copies; the true top-10 are a jitter-determined subset of all
    // 40, so expected overlap is ~10·12/40.
    val rnd = new java.util.Random(1234L)
    val center = Array.fill(dim)(rnd.nextGaussian())
    val cluster = (0 until 40).map { i =>
      Emb(i.toLong, center.map(x => (x + 0.01 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val background = (0 until 160).map { i =>
      Emb(1000L + i, Array.fill(dim)(rnd.nextGaussian()).map(_.toFloat).toSeq)
    }
    val e = Tio.fromRows(spark, Embs, cluster ++ background).toNative
    val probes = e.where(col("vec_id") === 0L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val cb = Ann.trainPq(e, col("embedding"), dim, m = 8, codes = 16, seed = 7L)
    val brute = Ann.topKBrute(e, col("vec_id"), col("embedding"), probes, k = 10)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    def recallAt(rerank: Int): Double = {
      val got = Ann.topKPqWith(cb, e, col("vec_id"), col("embedding"), probes,
        k = 10, rerank = rerank)
        .collect().map(_.getAs[Long]("neighbor_id")).toSet
      brute.intersect(got).size / 10.0
    }
    // under-sized cut: candidate list smaller than the tie cluster
    val starved = recallAt(12)
    assert(starved < 0.9, s"expected starved recall < 0.9, got $starved")
    // documented sizing: rerank ≥ k × duplicate multiplicity
    val sized = Ann.rerankFor(k = 10, dupMultiplicity = 40)
    assert(sized >= 400)
    val recovered = recallAt(sized)
    assert(recovered >= 0.9, s"expected recall ≥ 0.9 at rerank=$sized, got $recovered")
  }
}
