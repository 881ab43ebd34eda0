package graft

/** Scratch profiler (round 15) — NOT part of the catalog; delete before
  * the round ends. For each query name on the command line: two warmup
  * runs at sf0.001, then one timed noop-sink run at $SPARK_GRAFT_SF_DIR
  * with a listener printing every Spark job's wall-clock and call site,
  * so multi-action queries (iterative graph fits, k-means ladders,
  * lifecycle gates) decompose into their phases. Optionally dumps
  * explain("formatted") to /tmp/graft_plans/<name>.txt.
  */
object ProfileR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val warmDir = {
      val p = new java.io.File(sfDir).getParentFile
      val s = if (p == null) sfDir else new java.io.File(p, "sf0.001").getPath
      if (new java.io.File(s).isDirectory) s else sfDir
    }

    @volatile var capture = false
    val listener = new org.apache.spark.scheduler.SparkListener {
      val t0 = new scala.collection.concurrent.TrieMap[Int, (Long, String)]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (capture) {
          val p = Option(js.properties)
          val cs = p.flatMap(x => Option(x.getProperty("callSite.short"))).getOrElse("")
          val d = p.flatMap(x => Option(x.getProperty("spark.job.description"))).getOrElse("")
          t0(js.jobId) = (js.time, s"$cs $d")
        }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        t0.remove(je.jobId).foreach { case (s, d) =>
          println(f"[job] ${je.jobId}%5d ${(je.time - s) / 1000.0}%8.3f s  $d")
        }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (capture) {
          val si = sc.stageInfo
          val secs = (for {a <- si.submissionTime; b <- si.completionTime}
            yield (b - a) / 1000.0).getOrElse(-1.0)
          if (secs > 0.15) {
            val rdds = si.rddInfos.map(_.name).filter(_ != null).distinct
              .mkString(",").take(160)
            println(f"[stage] ${si.stageId}%5d ${secs}%8.3f s tasks=${si.numTasks}%4d  $rdds")
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val dumpPlans = sys.env.get("SPARK_GRAFT_PROFILE_PLANS").contains("1")
    @volatile var lastExecuted: String = ""
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        if (capture) lastExecuted = qe.executedPlan.toString
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })
    names.foreach { name =>
      (1 to 2).foreach { _ =>
        try SparkEntry.queries(name)(spark, warmDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[warmup-fail] $name: ${e.getMessage.take(200)}") }
      }
      println(s"==== $name ====")
      capture = true
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (dumpPlans) {
          val dir = java.nio.file.Paths.get("/tmp/graft_plans")
          java.nio.file.Files.createDirectories(dir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(dir.resolve(s"$name.txt"), txt.getBytes("UTF-8"))
        }
        df.write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        System.err.println(s"[fail] $name: ${e.getMessage.take(300)}") }
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      capture = false
      if (lastExecuted.nonEmpty) {
        val dir = java.nio.file.Paths.get("/tmp/graft_plans")
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(s"$name.final.txt"),
          lastExecuted.getBytes("UTF-8"))
        lastExecuted = ""
      }
      println(f"==== $name total ${secs}%.3f s ====")
    }
    spark.stop()
  }
}
