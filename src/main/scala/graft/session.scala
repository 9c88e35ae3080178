package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for operator-INTERNAL persisted frames (currently the
  * hot-bucket guard's narrow bucket stream). Dataset-level `persist()`
  * registers a CacheManager entry that is NEVER auto-released — unlike
  * `localCheckpoint` RDDs, which the ContextCleaner collects once
  * unreferenced — so a long-lived session that builds many dedup plans
  * (a streaming micro-batch loop, a 53-query benchmark sweep) would
  * accumulate entries and blocks without bound. Operators register what
  * they persist; job boundaries drain: [[GStream.dedupStream]] after
  * each micro-batch, [[GraftSession.releaseCachedBlocks]] for
  * batch/bench flows. Draining only unpersists — the frames keep their
  * lineage (persist, not checkpoint), so a late consumer recomputes
  * instead of failing. References are STRONG deliberately: the
  * CacheManager holds the entry (plan + columnar blocks) regardless of
  * whether any Dataset object survives GC, so a weak registry would
  * lose the only handle that can remove the entry; the wrapper objects
  * held between drains are tiny next to the blocks they unlock. */
private[graft] object InternalCaches {
  private val reg = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a frame the operator just persisted; returns it. */
  def register(df: DataFrame): DataFrame = {
    reg.add(df)
    df
  }

  /** Unpersist (and forget) every registered frame. */
  def drain(): Unit = {
    var df = reg.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () }
      df = reg.poll()
    }
  }
}

/** Standard session factory for graft entry points (Bench/Verify/specs).
  *
  * Owns every session-level conf the library depends on, so no reader or
  * operator ever mutates the running session behind the user's back:
  *
  *  - `spark.sql.shuffle.partitions` sized to the core count (local mode;
  *    on a real cluster set it to ~2-3× total executor cores, or leave
  *    AQE coalescing to shrink it).
  *  - `spark.sql.legacy.parquet.nanosAsLong` — the driver-generated
  *    events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
  *    reader only admits as a raw Long under this flag; [[tables.events]]
  *    truncates to micros. Set here, at build time, not inside a reader.
  *  - AQE on (default in Spark 4) — runtime partition coalescing and
  *    skew-join splitting are part of the 100 TB design.
  */
object GraftSession {

  /** Build a local session with `cpus` threads. */
  def local(cpus: Int, appName: String = "graft"): SparkSession =
    configure(SparkSession.builder().master(s"local[$cpus]").appName(appName), cpus)
      .getOrCreate()

  /** Drop every block the session's persisted / `localCheckpoint`ed
    * frames hold in the block manager.
    *
    * The composed pipelines (corpus prep, incremental MinHash, token
    * chunking, cluster propagation) deliberately `localCheckpoint`
    * intermediate frames — that is the correct per-job shape (each
    * boundary kills a measured recompute). But checkpoint blocks are a
    * lineage truncation point: Spark can spill them, never evict them,
    * so in a long-lived session that runs MANY such jobs the blocks
    * accumulate and squeeze execution memory for every later job
    * (measured: a 54-query benchmark sweep degrades ~10% pass-over-pass
    * from exactly this). Call this between jobs once a job's result has
    * been fully consumed.
    *
    * Contract: after release, frames whose lineage was truncated by the
    * dropped blocks CANNOT be re-executed (there is nothing left to
    * recompute from) — only call when prior results are consumed or
    * persisted externally. Blocking so the memory is actually free when
    * the next job starts. */
  def releaseCachedBlocks(spark: SparkSession): Unit = {
    // Dataset-level operator caches first: unpersisting through the
    // Dataset removes the CacheManager ENTRY, not just the blocks —
    // entries otherwise accumulate per built plan and are never GC'd.
    InternalCaches.drain()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  /** Apply graft's required confs to any builder (cluster deploys too).
    * Also registers the native kernels as SQL functions
    * (word_shingles/minhash_sig/minhash_bands/simhash64/cosine_sim) via
    * the standard SparkSessionExtensions hook. */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.withExtensions(new org.apache.spark.sql.graftexpr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // bucketed saveAsTable needs a warehouse; keep it out of the cwd
      // AND unique per JVM — the in-memory catalog starts empty each
      // run, so a stale shared location would fail saveAsTable with
      // LOCATION_ALREADY_EXISTS. (Cluster deploys override this with
      // their real warehouse + persistent catalog.)
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse-${ProcessHandle.current().pid()}")
}
