package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. A full warmup pass first (JIT + codegen +
  * file-listing caches), then a timed steady-state pass — the driver
  * compares steady-state throughput against BASELINE, not JVM warmup.
  * The action is `queryExecution.toRdd.count()` so every output column
  * is materialized (a plain count() lets Catalyst prune the projection
  * and would under-report the real work). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).queryExecution.toRdd.count(): Unit

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    qs.foreach { case (_, fn) => try run(fn) catch { case _: Throwable => () } } // warmup
    val results = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qjson = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
