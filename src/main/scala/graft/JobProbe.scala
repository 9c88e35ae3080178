package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Measurement probe (r22): run one named SparkEntry query N times in
  * a fresh session, print per-run wall seconds + job/stage/task counts
  * + per-job durations (with stage names), and dump the final EXECUTED
  * AQE plan — the structural evidence PlanDump's static dumps cannot
  * show (AQE join conversions, stage counts). Not on the bench path.
  * Usage: JobProbe <sfDir> <query> <n> <planOut> */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name, nStr, planOut) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-probe")
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val jobLines = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1; stages += j.stageInfos.size
        jobStart.put(j.jobId, j.time)
        val info = j.stageInfos.map(s => s.name.take(60)).mkString(" | ").take(200)
        names.put(j.jobId, s"stages=${j.stageInfos.size} [$info]")
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = Option(jobStart.get(j.jobId)).getOrElse(j.time)
        val nm = Option(names.get(j.jobId)).getOrElse("?")
        jobLines.add(f"  job=${j.jobId}%d dur=${(j.time - st) / 1000.0}%.2fs $nm%s")
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks += 1
    })
    val fn = SparkEntry.queries(name)
    var lastPlan = ""
    (1 to nStr.toInt).foreach { i =>
      jobs = 0; stages = 0; tasks = 0L; jobLines.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.queryExecution.toRdd.count(): Unit
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"RUN $i%d $name%s sec=$dt%.2f jobs=$jobs%d stages=$stages%d tasks=$tasks%d")
      if (i == nStr.toInt) jobLines.forEach(l => println(l))
      lastPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      GraftSession.releaseCachedBlocks(spark)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(planOut), lastPlan)
    spark.stop()
  }
}
