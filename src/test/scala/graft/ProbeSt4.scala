package graft

import org.apache.spark.sql.SparkSession

/** One-off: debug st4 micro-batching (test scope, not shipped). */
object ProbeSt4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("0.001", "0.01").foreach { sf =>
      val res = graft.streaming.Streams.st4LateDrop(spark, s"/root/testdata/sf$sf")
      res.coalesce(1).write.mode("overwrite").parquet(s"/tmp/st4_probe_$sf")
      println(s"[probe] sf=$sf rows=" + res.count())
    }
    spark.stop()
  }
}
