package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Stage/task-level breakdown for contract queries (round 17): for each
  * rep of each query, prints wall seconds plus WINDOW-INDEPENDENT
  * structure — job count, stage count, task count, summed executor run
  * time — and optionally per-stage lines. Usage:
  *   Test/runMain graft.ProbeStages <sfDir> <cores> <shufflePartitions>
  *     <reps> <query> [query ...]
  * Env GRAFT_PROBE_STAGES=1 prints per-stage detail.
  */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = args(1)
    val parts = args(2)
    val reps = args(3).toInt
    val names = args.drop(4).toSeq
    val spark = SparkSession.builder()
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val detail = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        detail.add(f"  stage ${s.stageInfo.stageId}%4d tasks=" +
          f"${s.stageInfo.numTasks}%3d runMs=" +
          f"${s.stageInfo.taskMetrics.executorRunTime}%6d " +
          s.stageInfo.name.take(90)): Unit
      }
    })
    // warm the session like Bench does
    try { Tables.region(spark, sfDir).count() } catch { case _: Throwable => () }
    names.foreach { name =>
      (1 to reps).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
        detail.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"== $name rep$i wall=$wall%.3f jobs=${jobs.get} " +
          f"stages=${stages.get} tasks=${tasks.get} taskSec=" +
          f"${taskMs.get / 1e3}%.2f ==")
        if (sys.env.contains("GRAFT_PROBE_STAGES"))
          detail.forEach(l => println(l))
      }
    }
    spark.stop()
  }
}
