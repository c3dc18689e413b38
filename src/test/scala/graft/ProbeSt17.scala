package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** One-off probe: run st17's chained agg manually and dump per-batch
  * state-operator metrics (rows dropped by watermark, late inputs) to
  * pin down WHERE the last hour's sub-window is lost.
  * Run: sbt "Test/runMain graft.ProbeSt17 /root/testdata/sf0.001" */
object ProbeSt17 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Tables.scratchDir("stream_lad3", sfDir)
    val schema = Tables.events(spark, sfDir).schema
    val stream = Tables.tune(spark).readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
    val tenMin = stream
      .withWatermark("ts_t", "15 minutes")
      .filter(col("user_id") >= 0L)
      .groupBy(window(col("ts_t"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val hourly = tenMin
      .groupBy(window(col("window"), "1 hour"), col("event_type"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_subwindows"))
    val q = hourly.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("probe_st17")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"batch=${p.batchId} wm=${p.eventTime.get("watermark")} " +
        s"inputRows=${p.numInputRows}")
      p.stateOperators.zipWithIndex.foreach { case (so, i) =>
        println(s"  op$i ${so.operatorName} inRows=${so.numRowsUpdated} " +
          s"total=${so.numRowsTotal} removed=${so.numRowsRemoved} " +
          s"droppedByWm=${so.numRowsDroppedByWatermark}")
      }
    }
    println("result rows=" + spark.table("probe_st17").count())
    spark.stop()
  }
}
