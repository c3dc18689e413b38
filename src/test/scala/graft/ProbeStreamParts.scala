package graft

import org.apache.spark.sql.SparkSession

/** One-off: replay-partition sensitivity of the streaming harness
  * (test scope, not shipped). */
object ProbeStreamParts {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm staging + JIT
    graft.streaming.Streams.st1Tumbling(spark, dir).count()
    Seq(4, 2, 1).foreach { p =>
      sys.props("graft.stream.parts") = p.toString
      time(s"st1 parts=$p")(graft.streaming.Streams.st1Tumbling(spark, dir).count())
      time(s"st3 parts=$p")(graft.streaming.Streams.st3Session(spark, dir).count())
      time(s"st6b parts=$p")(graft.streaming.Streams.st6bTransformWithState(spark, dir).count())
    }
    spark.stop()
  }
}
