package graft

import org.apache.spark.sql.SparkSession

/** Micro-bench a few contract queries in a warm session (Bench.main runs
  * everything cold-ish; this isolates per-query cost for optimization).
  * Usage: runMain graft.Time [sfDir] [queryName ...] — each runs twice.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("f7_explode")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries("s1_scan")(spark, sfDir).count() // session warmup
    names.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($cnt rows)")
      }
    }
    spark.stop()
  }
}
