package graft

import org.apache.spark.sql.SparkSession

/** One-off repro main (test scope): run x41/x42/x46/x47 at an arbitrary
  * SF dir to surface the exact exception the bench captures as a bare
  * failure name. Run: sbt "Test/runMain graft.ProbeX41 /root/testdata/sf0.1" */
object ProbeX41 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("x41_embed_neardup", "x42_embed_dedup_keep",
        "x46_embed_incremental", "x47_embed_dup_class")) {
      try {
        val n = SparkEntry.queries(q)(spark, sfDir).count()
        println(s"[probe] $q OK rows=$n")
      } catch { case e: Throwable =>
        println(s"[probe] $q FAILED: $e")
        e.printStackTrace()
      }
    }
    spark.stop()
  }
}
