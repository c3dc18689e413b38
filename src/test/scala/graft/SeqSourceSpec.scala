package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.sources.SeqSource

class SeqSourceSpec extends SparkSpec {

  private def seq(start: Long, end: Long, slices: Int): DataFrame =
    spark.read.format("graft-seq")
      .option("start", start).option("end", end).option("slices", slices)
      .load()

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("rows match the formula (spark.range cross-check)") {
    val got = seq(0, 1000, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    val want = (0L until 1000L)
      .map(id => (id, (id % 100).toInt, SeqSource.valueOf(id)))
    assert(got.toSeq == want)
  }

  test("filter pushdown narrows the range exactly, boundaries included") {
    val df = seq(0, 10000, 8)
    val cases = Seq(
      df.filter(col("id") >= 100 && col("id") < 200) -> (100L until 200L),
      df.filter(col("id") > 9990) -> (9991L until 10000L),
      df.filter(col("id") <= 5) -> (0L to 5L),
      df.filter(col("id") === 4321) -> Seq(4321L))
    cases.foreach { case (q, want) =>
      assert(q.select("id").collect().map(_.getLong(0)).sorted.toSeq == want.toSeq)
    }
    // non-id predicates are NOT consumed by the source: they must survive
    // as a post-scan Filter and still evaluate correctly
    val mixed = df.filter(col("id") < 1000 && col("bucket") === 7)
    assert(mixed.queryExecution.executedPlan.toString.contains("Filter"))
    assert(mixed.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (7L until 1000L by 100L).toSeq)
  }

  test("source-level partition pruning: out-of-band slices never planned") {
    val df = seq(0, 200000, 64)
    assert(scanOf(df).inputRDD.getNumPartitions == 64)
    // [0, 25000) covers exactly 8 of the 64 fixed slices of width 3125
    val pruned = scanOf(df.filter(col("id") < 25000))
    assert(pruned.inputRDD.getNumPartitions == 8)
    // an empty band prunes to zero partitions, zero rows
    val none = df.filter(col("id") >= 500000)
    assert(scanOf(none).inputRDD.getNumPartitions == 0)
    assert(none.count() == 0)
  }

  test("column pruning reaches the reader") {
    val only = seq(0, 100, 2).select("bucket")
    assert(scanOf(only).output.map(_.name) == Seq("bucket"))
    assert(only.distinct().count() == 100)
  }

  test("micro-batch stream: admission control drains in fixed batches, equals batch read") {
    import org.apache.spark.sql.streaming.Trigger
    val stream = spark.readStream.format("graft-seq")
      .option("start", 0).option("end", 1000).option("rowsPerBatch", 300).load()
    val q = stream.groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("val").as("s"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("seq_stream_test").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // 1000 ids at <=300/trigger: 4 data batches (300+300+300+100)
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches == 4, s"expected 4 data batches, saw $dataBatches: " +
      q.recentProgress.map(_.numInputRows).mkString(","))
    assert(q.recentProgress.filter(_.numInputRows > 0)
      .map(_.numInputRows).sum == 1000)
    val got = spark.table("seq_stream_test").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val want = seq(0, 1000, 4).groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("contract query equals the same aggregate over spark.range") {
    val got = graft.operators.Core.s11Dsv2Source(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val want = spark.range(50000, 150000)
      .select(col("id"), (col("id") % 100).cast("int").as("bucket"))
      .withColumn("val", ((col("id") * 2654435761L) % 1000L) / 10.0)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("val")).as("sum_val"))
      .orderBy(col("bucket")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }
}
