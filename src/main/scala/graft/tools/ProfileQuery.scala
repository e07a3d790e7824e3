package graft.tools

/** Single-query profiling runner (dev/measurement tooling, round-16
  * optimization work — not part of the shipped library and not the
  * driver's bench): times named registry queries through the same noop
  * sink as Bench, optionally several repetitions, with
  * [[PhaseTimer]]-compatible output interleaved so a query's wall can be
  * decomposed into its phases.
  *
  * Usage: runMain graft.tools.ProfileQuery <reps> <name> [name ...]
  * Env: SPARK_GRAFT_SF_DIR (data dir), GRAFT_PHASE_TIMING=1 for phases.
  * Pass "explain" as a name prefix ("explain:x60_bm25_filtered") to dump
  * the formatted plan instead of timing.
  */
object ProfileQuery {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(1)
    val names = args.drop(1).toSeq
    val spark = Harness.buildSession()
    names.foreach { raw =>
      val (explain, name) =
        if (raw.startsWith("explain:")) (true, raw.stripPrefix("explain:"))
        else (false, raw)
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      if (explain) {
        println(s"==== PLAN $name ====")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        finally Harness.releaseAllPinned(spark)
      } else {
        (1 to reps).foreach { i =>
          val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
          val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
          val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          val verbose = sys.env.contains("GRAFT_PROFILE_JOBS")
          val nTasks = new java.util.concurrent.atomic.AtomicInteger(0)
          val listener = new org.apache.spark.scheduler.SparkListener {
            val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
            val jobTasks = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
            override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              starts.put(js.jobId, js.time)
              jobTasks.put(js.jobId, js.stageInfos.map(_.numTasks).sum)
              if (verbose) descs.put(js.jobId, Seq(
                  "spark.job.description", "callSite.short")
                .map(k => Option(js.properties.getProperty(k)).getOrElse(""))
                .mkString(" | "))
            }
            override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
              nJobs.incrementAndGet()
              val t = Option(jobTasks.remove(je.jobId)).map(_.intValue).getOrElse(0)
              nTasks.addAndGet(t)
              Option(starts.remove(je.jobId)).foreach { s =>
                jobMs.addAndGet(je.time - s)
                if (verbose) println(s"JOB ${je.jobId} ${je.time - s}ms ${t}t " +
                  Option(descs.remove(je.jobId)).getOrElse(""))
              }
            }
          }
          spark.sparkContext.addSparkListener(listener)
          spark.sparkContext.setJobDescription(s"$name rep$i")
          val t = Harness.timeNoop(spark, sfDir, name, fn)
          // drain listener-bus stragglers before reading the counters
          Thread.sleep(300)
          spark.sparkContext.removeSparkListener(listener)
          println(f"""{"profile":"$name","rep":$i,"sec":$t%.3f,""" +
            f""""jobs":${nJobs.get},"tasks":${nTasks.get},""" +
            f""""job_sec":${jobMs.get / 1000.0}%.3f}""")
        }
      }
    }
    spark.stop()
  }
}
