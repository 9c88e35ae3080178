package graft

import org.apache.spark.sql.functions.col

import graft.operators.{Ann, Dedup}
import graft.functions.TextFns

/** Edge inputs through the operator pipelines — empty frames, single
  * rows, empty strings (reference tests/integration/test_edge_cases.py
  * shape). A harness run over odd data must degrade to empty results,
  * never throw. */
class EdgeSpec extends SparkSpec {

  private def docs(rows: Seq[Doc]) = {
    import spark.implicits._
    Tio.fromRows(spark, new GSchema {
      val doc_id = col[Long]("doc_id"); val text = col[String]("text")
    }, rows).toNative
  }

  test("dedup pipelines on an empty frame return empty, not errors") {
    val d = docs(Nil)
    assert(Dedup.exactGroups(d, col("text"), col("doc_id")).count() == 0L)
    assert(Dedup.minhashCandidates(d, col("doc_id"), col("text")).count() == 0L)
    assert(Dedup.jaccardPairs(d, col("doc_id"), col("text"), 0.5).count() == 0L)
    assert(Dedup.simhashPairs(d, col("doc_id"), col("text")).count() == 0L)
    assert(Dedup.simhashSignatures(d, col("doc_id"), col("text")).count() == 0L)
    assert(Dedup.duplicateClusters(
      Dedup.jaccardPairs(d, col("doc_id"), col("text"), 0.5)).count() == 0L)
  }

  test("candidate-export functions on empty inputs return empty with the export schema") {
    import spark.implicits._
    val emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val emptyProbes = Seq.empty[(Long, Seq[Float])].toDF("probe_id", "probe_vec")
    val ec = Dedup.embeddingCandidates(emptyVecs, col("vec_id"), col("embedding"), dim = 8)
    assert(ec.columns.toSeq == Seq("id_a", "id_b") && ec.count() == 0L)
    val lc = Ann.lshCandidates(emptyVecs, col("vec_id"), col("embedding"), emptyProbes, dim = 8)
    assert(lc.columns.toSeq == Seq("probe_id", "neighbor_id") && lc.count() == 0L)
    // empty quantizer (untrainable corpus) → empty candidates, same schema
    val ic = Ann.ivfCandidates(Array.empty, emptyVecs, col("vec_id"), col("embedding"), emptyProbes)
    assert(ic.columns.toSeq == Seq("probe_id", "neighbor_id") && ic.count() == 0L)
  }

  test("round-9 operators on empty frames return empty, not errors") {
    import spark.implicits._
    val d = docs(Nil)
    assert(graft.operators.Dedup.contaminationStats(
      d, col("doc_id"), col("text"), d, col("text"), k = 5).count() == 0L)
    assert(graft.operators.Dedup.decontaminatedKeep(
      d, col("doc_id"), col("text"), d, col("text"), k = 5).count() == 0L)
    assert(graft.operators.Sampling.sampleHash(d, col("doc_id"), 0.5).count() == 0L)
    assert(graft.operators.Sampling.sampleStratified(
      d, col("doc_id"), col("text"), Map("x" -> 0.5), 0.1).count() == 0L)
    assert(graft.operators.Sampling.sampleExactPerStratum(
      d, col("doc_id"), col("text"), n = 3).count() == 0L)
    assert(graft.operators.Sampling.withSplit(
      d, col("doc_id"), "split", Seq("a" -> 0.5, "b" -> 0.5)).count() == 0L)
    // empty PQ quantizer (untrainable corpus) → empty candidates/results
    val emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val emptyProbes = Seq.empty[(Long, Seq[Float])].toDF("probe_id", "probe_vec")
    val cb = graft.operators.Ann.trainPq(emptyVecs, col("embedding"), dim = 8, m = 4)
    assert(cb.isEmpty)
    val pc = graft.operators.Ann.pqCandidates(
      cb, emptyVecs, col("vec_id"), col("embedding"), emptyProbes, rerank = 5)
    assert(pc.columns.toSeq == Seq("probe_id", "neighbor_id") && pc.count() == 0L)
    assert(graft.operators.Ann.topKIvfPqWith(Array.empty, cb, emptyVecs,
      col("vec_id"), col("embedding"), emptyProbes, k = 3).count() == 0L)
    // and the empty quantizer persists through save/load to the same path
    val p = java.nio.file.Files.createTempDirectory("graft-pq-empty").toString + "/q"
    graft.operators.Ann.savePq(spark, cb, p)
    assert(graft.operators.Ann.loadPq(spark, p).isEmpty)
  }

  test("round-10 operators on empty frames degrade cleanly") {
    import spark.implicits._
    val emptyKeys = Seq.empty[Long].toDF("k")
    // exact overlap of two empty sides: one row of zeros, sketch schema
    val r = graft.operators.Sketch.overlapExact(
      emptyKeys, col("k"), emptyKeys, col("k")).head()
    assert(!r.anyNull)
    assert((0 to 3).map(r.getLong(_)).forall(_ == 0L))
    // empty composed quantizers → empty candidates with the export schema
    val emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val emptyProbes = Seq.empty[(Long, Seq[Float])].toDF("probe_id", "probe_vec")
    val cb = graft.operators.Ann.trainPq(emptyVecs, col("embedding"), dim = 8, m = 4)
    val ipc = graft.operators.Ann.ivfPqCandidates(Array.empty, cb, emptyVecs,
      col("vec_id"), col("embedding"), emptyProbes)
    assert(ipc.columns.toSeq == Seq("probe_id", "neighbor_id") && ipc.count() == 0L)
  }

  test("single-row and empty-string documents flow through text kernels") {
    val d = docs(Seq(Doc(1L, ""), Doc(2L, "   "), Doc(3L, "one")))
    val out = d.select(
      col("doc_id"),
      TextFns.wordCount(col("text")).as("w"),
      TextFns.fingerprint64(col("text")).as("fp"),
      TextFns.tokenCountBpeish(col("text")).as("bp"),
    ).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Int]("w")).toSeq == Seq(0, 0, 1))
    // "" and "   " normalize identically → identical fingerprints
    assert(out(0).getAs[Long]("fp") == out(1).getAs[Long]("fp"))
    assert(Dedup.jaccardPairs(d, col("doc_id"), col("text"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("incremental dedup of an empty batch (or against an empty-corpus index) degrades cleanly") {
    val idx = java.nio.file.Files.createTempDirectory("graft-edge-idx").toString + "/idx"
    Dedup.writeMinHashIndex(docs(Seq(Doc(1L, "some indexed text here"))),
      col("doc_id"), col("text"), idx)
    // empty new batch: empty result, no error
    assert(Dedup.minhashKeepIncremental(docs(Nil), col("doc_id"), col("text"), idx, 0.5)
      .count() == 0L)
    // empty indexed corpus: batch dedups only against itself
    val emptyIdx = java.nio.file.Files.createTempDirectory("graft-edge-idx0").toString + "/idx"
    Dedup.writeMinHashIndex(docs(Nil), col("doc_id"), col("text"), emptyIdx)
    val kept = Dedup.minhashKeepIncremental(
        docs(Seq(Doc(5L, "fresh batch text document"), Doc(6L, "fresh batch text document"))),
        col("doc_id"), col("text"), emptyIdx, 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(5L))
  }

  test("IVF persistence of an empty quantizer round-trips to the empty-result path") {
    import spark.implicits._
    val schema = new GSchema {
      val vec_id = col[Long]("vec_id"); val embedding = col[Seq[Float]]("embedding")
    }
    val empty = Tio.fromRows(spark, schema, Seq.empty[Emb]).toNative
    val trained = Ann.trainIvf(empty, col("embedding"), dim = 2)
    assert(trained.isEmpty)
    val path = java.nio.file.Files.createTempDirectory("graft-edge-ivf").toString + "/q"
    Ann.saveIvf(spark, trained, path)
    assert(Ann.loadIvf(spark, path).isEmpty)
    val probes = Tio.fromRows(spark, schema, Seq(Emb(1L, Seq(1f, 0f)))).toNative
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val data = Tio.fromRows(spark, schema, Seq(Emb(2L, Seq(1f, 1f)))).toNative
    assert(Ann.topKIvfWith(Ann.loadIvf(spark, path), data,
      col("vec_id"), col("embedding"), probes, k = 3).count() == 0L)
  }

  test("ANN with an empty probe set returns empty") {
    import spark.implicits._
    val e = Tio.fromRows(spark, new GSchema {
      val vec_id = col[Long]("vec_id"); val embedding = col[Seq[Float]]("embedding")
    }, Seq(Emb(1L, Seq(1f, 0f)), Emb(2L, Seq(0f, 1f)))).toNative
    val noProbes = e.where("vec_id < 0")
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    assert(Ann.topKBrute(e, col("vec_id"), col("embedding"), noProbes, 5).count() == 0L)
  }

  test("topKIvf on an empty vector table returns empty, not an exception") {
    import spark.implicits._
    val schema = new GSchema {
      val vec_id = col[Long]("vec_id"); val embedding = col[Seq[Float]]("embedding")
    }
    val empty = Tio.fromRows(spark, schema, Seq.empty[Emb]).toNative
    val probes = Tio.fromRows(spark, schema, Seq(Emb(1L, Seq(1f, 0f)))).toNative
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val out = Ann.topKIvf(empty, col("vec_id"), col("embedding"), probes, k = 3, dim = 2)
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("probe_id", "neighbor_id", "sim", "rank"))
  }

  test("round-15 operators on empty frames degrade cleanly") {
    import spark.implicits._
    import graft.operators.{Dsir, Joins, Layout, Media, Profile, Sketch}
    val d = docs(Nil)
    // C4 cleaning of an empty frame
    assert(d.select(TextFns.c4Clean(col("text")).as("c")).count() == 0L)
    // DSIR: empty corpus AND empty target (Np = Nq = 0 -> the ln
    // chain still evaluates on the +B smoothing mass)
    assert(Dsir.weights(d, col("doc_id"), col("text"),
      d, col("text"), buckets = 64).count() == 0L)
    // empty target with a real corpus: every gram takes cp=0
    val one = docs(Seq(Doc(1L, "hello world")))
    val w = Dsir.weights(one, col("doc_id"), col("text"), d, col("text"), buckets = 64)
      .collect()
    assert(w.length == 1 && w(0).getLong(1) == 3L)
    // keep-best on empty; interval join of empties
    assert(Dedup.exactKeepBy(
      d.withColumn("s", col("doc_id")), col("text"), col("doc_id"), col("s")).count() == 0L)
    val emptyIv = Seq.empty[(String, Long, Long, Long)].toDF("k", "as", "ae", "aid")
    val emptyIv2 = Seq.empty[(String, Long, Long, Long)].toDF("k", "bs", "be", "bid")
    assert(Joins.intervalJoin(emptyIv, emptyIv2, Seq("k"), "as", "ae", "bs", "be", 10L)
      .count() == 0L)
    // correlation over an empty frame: pair rows exist, n = 0, r NULL
    val emptyNum = Seq.empty[(Long, Long)].toDF("x", "y")
    val corr = Profile.corrMatrix(emptyNum, Seq("x", "y")).collect()
    assert(corr.length == 1 && corr(0).getLong(2) == 0L && corr(0).isNullAt(3))
    // per-group quantiles and heavy hitters of nothing
    assert(Profile.quantilesByGroup(
      d.withColumn("v", col("doc_id")), col("text"), Seq("v"), Seq(0.5)).count() == 0L)
    assert(Sketch.topItemsPerGroup(d, col("text"), col("doc_id"), k = 3).count() == 0L)
    // pHash over an empty payload frame; z-order of an empty frame
    val emptyMedia = Seq.empty[(Long, Array[Byte])].toDF("media_id", "content")
    assert(Media.phashPairs(emptyMedia, col("media_id"), col("content")).count() == 0L)
    assert(Layout.zorderBy(emptyNum, col("x"), col("y"), bits = 4, numFiles = 2)
      .count() == 0L)
  }

  test("cosine_sim: zero-norm is NULL (not NaN), length mismatch is a clear error") {
    import spark.implicits._
    val zero = Seq((Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
    assert(zero.select(graft.operators.Vec.cosine(col("a"), col("b"))).head().isNullAt(0))
    val bad = Seq((Seq(1f, 0f, 0f), Seq(1f, 1f))).toDF("a", "b")
    val ex = intercept[Throwable] {
      bad.select(graft.operators.Vec.cosine(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("length mismatch")))
  }
}
