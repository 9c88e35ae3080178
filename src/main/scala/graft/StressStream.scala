package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Streaming stress pass — the [[graft.streaming.GStream.dedupStream]]
  * twin of the relational STRESS_sf1 run: stream a large corpus
  * (default: the replicated sf1 stress dataset, ~50 k docs with 10×
  * duplicate density) through the incremental dedup stream in
  * micro-batched halves, then assert the survivors are EXACTLY what
  * the batch incremental flow (same `minhashKeepIncremental` calls
  * against a fresh index) produces. Checks the streaming plumbing —
  * foreachBatch, checkpointing, index state carried across
  * micro-batches on shared storage — at stress scale, not the kernel
  * (the driver's dedup_incremental gate owns kernel correctness).
  *
  * Prints ONE JSON line:
  * `{"metric":"stress_stream","survivors":N,"match":true,...}`;
  * exits nonzero on mismatch. Usage:
  * `graft.StressStream [srcDir=/tmp/graft_sf1]` (generate the dataset
  * with tools/make_sf1.py first).
  */
object StressStream {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus, "graft-stress-stream")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.tables.Documents

    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(Documents.columnNames.map(col): _*)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val work = java.nio.file.Files.createTempDirectory("graft-stress-stream").toString
    val halves = Seq(docs.where(col("doc_id") <= cut), docs.where(col("doc_id") > cut))

    // ---- streaming flow: two file drops = two micro-batches
    val t0 = System.nanoTime()
    val inDir = s"$work/in"
    halves.head.write.parquet(inDir)
    val stream = graft.streaming.GStream.readStreamParquet(spark, inDir, Documents)
    val q = graft.streaming.GStream.dedupStream(stream.toNative,
      col("doc_id"), col("text"), s"$work/idx_stream", s"$work/out",
      threshold = 0.5, checkpointDir = s"$work/ckpt")
    q.processAllAvailable()
    halves.last.write.mode("append").parquet(inDir)
    q.processAllAvailable()
    q.stop()
    val streamSurvivors = spark.read.parquet(s"$work/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val streamSec = (System.nanoTime() - t0) / 1e9

    // ---- batch twin: identical incremental calls against a fresh index
    val t1 = System.nanoTime()
    val idxB = s"$work/idx_batch"
    Dedup.writeMinHashIndex(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], docs.schema),
      col("doc_id"), col("text"), idxB)
    val batchSurvivors = halves.flatMap { half =>
      val kept = Dedup.minhashKeepIncremental(half, col("doc_id"), col("text"), idxB, 0.5)
        .persist()
      try {
        val ids = kept.select("doc_id").collect().map(_.getLong(0))
        if (ids.nonEmpty)
          Dedup.writeMinHashIndex(kept, col("doc_id"), col("text"), idxB, mode = "append")
        ids
      } finally kept.unpersist(blocking = false): Unit
    }.toSet
    val batchSec = (System.nanoTime() - t1) / 1e9

    val ok = streamSurvivors == batchSurvivors
    def f(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"stress_stream","src":"$src","n_docs":${docs.count()},"survivors":${streamSurvivors.size},"batch_survivors":${batchSurvivors.size},"match":$ok,"stream_sec":${f(streamSec)},"batch_sec":${f(batchSec)},"n_failed":${if (ok) 0 else 1}}""")
    spark.stop()
    if (!ok) {
      System.err.println(s"[stress-stream] MISMATCH: stream-only=${(streamSurvivors -- batchSurvivors).take(5)} batch-only=${(batchSurvivors -- streamSurvivors).take(5)}")
      sys.exit(2)
    }
  }
}
