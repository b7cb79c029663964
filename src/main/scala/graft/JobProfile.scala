package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool (guide §1.1/§7): attribute a registered query's wall time
  * to the Spark JOBS it launches (job count, per-job wall, stage/task
  * counts) AND to driver-side code via an in-process stack sampler —
  * so "where does this 9 s query spend it" is a measurement, not a
  * guess. Not part of the driver contract.
  *
  * Usage: runMain graft.JobProfile <sfDir> <q_name> [<q_name> ...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkBoot.session(SparkBoot.cpus(), logLevel = "ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, String)]
    // written on the listener-bus thread, read from main (ADVICE r21)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val stageRows = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Double, Double, Long, Long, String)]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach { case (t0, d) =>
          done.synchronized {
            done += ((j.jobId, (System.nanoTime() - t0) / 1e9, d)) }
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        stageRows.synchronized {
          stageRows += ((s.stageInfo.stageId, s.stageInfo.numTasks,
            m.executorRunTime / 1e3, m.executorCpuTime / 1e9,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            s.stageInfo.name.take(90)))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // in-process sampler: every 20 ms, grab the main thread's stack and
    // bucket it by the topmost "interesting" frame owner
    val mainThread = Thread.currentThread()
    val tally = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          val key =
            if (st.isEmpty) "idle/none"
            else {
              val s = st.map(_.getClassName)
              def has(p: String) = s.exists(_.contains(p))
              if (has("janino") || has("codegen.CodeGenerator")) "codegen-compile"
              else if (has("adaptive.AdaptiveSparkPlanExec")) {
                if (has("RuleExecutor") || has("Optimizer")) "AQE-reoptimize"
                else "AQE-other"
              }
              else if (has("RuleExecutor")) "optimizer"
              else if (has("QueryPlanningTracker") || has("QueryExecution")) "planning-other"
              else if (has("DAGScheduler") || has("JobWaiter") || has("ThreadUtils.awaitReady")) "await-jobs"
              else if (has("parquet")) "parquet-meta"
              else st.headOption.map(f => f.getClassName.split("\\.").takeRight(2).mkString(".") + "." + f.getMethodName).getOrElse("?")
            }
          tally.merge(key, 1, (a, b) => a + b)
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    args.tail.foreach { name =>
      // warm once so codegen/readers don't pollute the attribution
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      spark.catalog.clearCache()
      done.synchronized(done.clear()); stages.set(0); tasks.set(0)
      stageRows.synchronized(stageRows.clear())
      tally.clear()
      sampling = true
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+physical
      val t2 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t3 = System.nanoTime()
      sampling = false
      Thread.sleep(300) // let listener drain
      val js = done.synchronized(done.sortBy(_._1).toVector)
      println(f"\n===== $name wall=${(t3 - t0) / 1e9}%.2f s " +
        f"(build=${(t1 - t0) / 1e9}%.2f plan=${(t2 - t1) / 1e9}%.2f " +
        f"exec=${(t3 - t2) / 1e9}%.2f) jobs=${js.size} " +
        f"stages=${stages.get} tasks=${tasks.get} jobsum=${js.map(_._2).sum}%.2f s")
      import scala.jdk.CollectionConverters._
      val tot = tally.values.asScala.map(_.toInt).sum.max(1)
      tally.asScala.toSeq.sortBy(-_._2.toInt).take(12).foreach { case (k, v) =>
        println(f"  driver-main: $k%-40s ${v.toInt * 100.0 / tot}%5.1f%% (${v.toInt * 0.02}%.2f s)")
      }
      js.filter(_._2 > 0.2).foreach { case (id, t, d) =>
        println(f"  job $id%3d  $t%6.3f s  $d") }
      val sr = stageRows.synchronized(stageRows.sortBy(r => -r._3).toVector)
      sr.take(15).foreach { case (sid, nt, run, cpu, srd, swr, nm) =>
        println(f"  stage $sid%4d tasks=$nt%4d run=$run%7.2f s cpu=$cpu%7.2f s " +
          f"sRead=${srd / 1024}%8d KB sWrite=${swr / 1024}%8d KB  $nm")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
