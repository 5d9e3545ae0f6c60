package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round support tool: run the named queries under a stage
  * listener and print a per-stage time/IO breakdown, so "where does this
  * query's second actually go" is answered from task metrics instead of
  * guessed from the plan.
  *
  * Usage: runMain graft.ProfileQuery name[,name...] [reps]
  * Reads the data dir from SPARK_GRAFT_SF_DIR and the core count from
  * SPARK_GRAFT_CPUS exactly like Bench (same session shape, same
  * shuffle.partitions), warms each query once at the sf0.001 sibling,
  * and reports, per stage of the LAST rep: wall duration, summed task
  * time, task count, input/shuffle bytes, and the stage's callsite. */
object ProfileQuery {
  private final case class StageRow(jobId: Int, stageId: Int, name: String,
      wallMs: Long, taskMs: Long, tasks: Int, inputMb: Double,
      shReadMb: Double, shWriteMb: Double, gcMs: Long, cpuMs: Long)

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("GRAFT_MINPART", "1m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    @volatile var collecting = false
    @volatile var jobCount = 0
    val stageJob = scala.collection.concurrent.TrieMap.empty[Int, Int]
    // listener events are delivered asynchronously on the bus; without a
    // drain, flipping `collecting` off right after count() returns races
    // ahead of the last stages' StageCompleted events and silently drops
    // rows (and rows.clear() can erase late events of the PRIOR query).
    // listenerBus/waitUntilEmpty are private[spark] — reflection is the
    // supported-from-outside way to reach them.
    val drainBus: () => Unit = {
      try {
        val busM = spark.sparkContext.getClass.getMethod("listenerBus")
        val bus = busM.invoke(spark.sparkContext)
        val waitM = bus.getClass.getMethod("waitUntilEmpty")
        () => { waitM.invoke(bus); () }
      } catch { case scala.util.control.NonFatal(_) =>
        () => Thread.sleep(300)
      }
    }
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        js.stageIds.foreach(sid => stageJob.put(sid, js.jobId))
        if (collecting) jobCount += 1
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = sc.stageInfo
          val m = si.taskMetrics
          val wall = (for (a <- si.completionTime; b <- si.submissionTime)
            yield a - b).getOrElse(-1L)
          rows.add(StageRow(stageJob.getOrElse(si.stageId, -1), si.stageId,
            si.name.linesIterator.next(), wall, m.executorRunTime,
            si.numTasks, m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.jvmGCTime, m.executorCpuTime / 1000000))
        }
    })

    val warmDir = {
      val p = java.nio.file.Paths.get(sfDir)
      val s = p.resolveSibling("sf0.001")
      if (java.nio.file.Files.isDirectory(s) && s.toString != p.toString)
        Some(s.toString) else None
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      warmDir.foreach(wd =>
        try fn(spark, wd).count() catch { case _: Throwable => () })
      var last = 0.0
      for (r <- 1 to reps) {
        drainBus() // flush the prior rep/query's late events before clearing
        rows.clear()
        jobCount = 0
        collecting = r == reps
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        last = (System.nanoTime() - t0) / 1e9
        if (r == reps) { drainBus(); collecting = false }
      }
      println(f"%n=== $name%s  last-rep wall ${last}%.3f s  jobs $jobCount%d ===")
      println(f"${"job"}%4s ${"stage"}%5s ${"wall_ms"}%8s ${"task_ms"}%8s " +
        f"${"cpu_ms"}%7s ${"gc_ms"}%6s ${"tasks"}%5s ${"in_MB"}%8s " +
        f"${"shR_MB"}%7s ${"shW_MB"}%7s  name")
      import scala.jdk.CollectionConverters._
      rows.asScala.toSeq.sortBy(r => (r.jobId, r.stageId)).foreach { s =>
        println(f"${s.jobId}%4d ${s.stageId}%5d ${s.wallMs}%8d ${s.taskMs}%8d " +
          f"${s.cpuMs}%7d ${s.gcMs}%6d ${s.tasks}%5d ${s.inputMb}%8.1f " +
          f"${s.shReadMb}%7.1f ${s.shWriteMb}%7.1f  ${s.name}%s")
      }
    }
    spark.stop()
  }
}
