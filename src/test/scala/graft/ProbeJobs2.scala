package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Per-job callsite breakdown for ONE contract query (round-16
  * optimization): prints every Spark job's callsite and wall duration,
  * so engine-internal fixed costs (commit protocol, stats, CDF) are
  * attributable line-by-line. Usage: runMain graft.ProbeJobs2 <sfDir> <query>.
  */
object ProbeJobs2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = TrieMap.empty[Int, (Long, String)]
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        if (sys.env.contains("GRAFT_PROBE_KEYS") && j.properties != null)
          System.err.println(s"[keys] job ${j.jobId}: " +
            j.properties.stringPropertyNames().toArray.mkString(","))
        starts.put(j.jobId, (System.nanoTime(), site)): Unit
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          lines.add(f"job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $site")
        }
    })
    SparkEntry.queries("s1_scan")(spark, sfDir).count()
    // label plumbing self-check: this job must print as "graft: probe"
    graft.sources.GraftTxn.described(spark, "probe") {
      spark.range(10).count()
    }
    Thread.sleep(500)
    // second run = warm numbers; first run reported too
    (1 to 2).foreach { i =>
      lines.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"== $name run$i wall $wall%.3f s, ${lines.size} jobs ==")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
