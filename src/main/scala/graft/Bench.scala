package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. A full warmup pass first (JIT + codegen +
  * file-listing caches), then a timed steady-state pass — the driver
  * compares steady-state throughput against BASELINE, not JVM warmup.
  * The action is `queryExecution.toRdd.count()` so every output column
  * is materialized (a plain count() lets Catalyst prune the projection
  * and would under-report the real work).
  *
  * Failure hygiene: a query that throws is recorded as -1.0 (never a
  * small elapsed time — a regression must not look like a speedup), the
  * error goes to stderr, and the process exits nonzero if anything
  * failed. The JSON line still prints so partial results are usable.
  *
  * Self-identification: the line also carries the OS load average
  * before/after the run, the core count, and EVERY per-pass sample
  * (`passes`), not just the per-query min — so a machine-contention-
  * poisoned run (round 8: official 37.3 s vs 23.2 s re-run of the same
  * binary) is diagnosable from the artifact itself: high/rising load
  * plus large pass-to-pass spread means environment noise, not a code
  * regression.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).queryExecution.toRdd.count(): Unit

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    qs.foreach { case (name, fn) =>
      try run(fn)
      catch { case e: Throwable => System.err.println(s"[bench warmup] $name: ${e.getMessage}") }
    }
    // Three INTERLEAVED round-robin passes over all queries, per-query
    // min: consecutive min-of-3 (rounds 3 and 4) had no defense against
    // a contention window outlasting one query's three back-to-back
    // runs — all three samples landed inside it and a judge re-run of
    // the identical binary was up to 11× faster. Interleaving spaces a
    // query's samples a full pass apart, so a sustained noisy window
    // poisons at most one sample of each query, never all three of one.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def load: Double = osBean.getSystemLoadAverage // 1-min avg; -1 if unsupported
    val loadBefore = load

    var failed = Set.empty[String]
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to 3).foreach { _ =>
      qs.foreach { case (name, fn) =>
        if (!failed(name)) {
          val t0 = System.nanoTime()
          try {
            run(fn)
            val dt = (System.nanoTime() - t0) / 1e9
            samples(name) = samples.getOrElse(name, Nil) :+ dt
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              failed += name
          }
        }
      }
    }
    val loadAfter = load
    def f(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val results = qs.map { case (name, _) =>
      name -> (if (failed(name)) -1.0 else samples(name).min)
    }
    val qjson = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val pjson = qs.map { case (name, _) =>
      s"\"" + name + "\":" + samples.getOrElse(name, Nil).map(f).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qjson,"sf":"$sfDir","n_failed":${failed.size},"load_avg_before":${f(loadBefore)},"load_avg_after":${f(loadAfter)},"cpus_jvm":${Runtime.getRuntime.availableProcessors},"passes":$pjson}""")
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] ${failed.size} queries failed: ${failed.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
  }
}
