package graft

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the optimization-round evidence trail (plans/rNN/<query>_before.txt /
  * _after.txt). Usage:
  *
  *   PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  *
  * writes `<outDir>/<query>_<suffix>.txt` for each named query (all
  * queries when the list is omitted). Plans are built lazily — no query
  * executes, so the dump is cheap and side-effect-free (queries that
  * eagerly materialize intermediates during plan CONSTRUCTION, e.g. the
  * trained-model gates, do run those stages). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names: Seq[String] =
      if (args.length > 3) args(3).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus, "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
            System.err.println(s"[plandump] wrote $name")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
          }
          GraftSession.releaseCachedBlocks(spark)
      }
    }
    spark.stop()
  }
}
