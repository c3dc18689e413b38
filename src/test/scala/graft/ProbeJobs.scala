package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round profiler (round 16): per-query Spark-job and
  * task-time accounting. Wall time far above summed task time means the
  * query is dominated by driver-side fixed costs (job scheduling,
  * commit protocol, planning), not by distributed compute — the guide's
  * §7.3 distinction, measured mechanically per contract query.
  *
  * Usage: runMain graft.ProbeJobs <sfDir> <query...> (test scope).
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet(): Unit
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null)
          taskNanos.addAndGet(t.taskInfo.duration * 1000000L): Unit
      }
    })
    // session warmup (codegen, parquet classes) so the first measured
    // query isn't charged JVM init
    SparkEntry.queries("s1_scan")(spark, sfDir).count()
    Thread.sleep(500)
    println("query,run,wall_s,jobs,stages,tasks,task_time_s")
    names.foreach { n =>
      (1 to 2).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0)
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let listener events drain
        println(f"$n,$i,$wall%.3f,${jobs.get},${stages.get}," +
          f"${tasks.get},${taskNanos.get / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
