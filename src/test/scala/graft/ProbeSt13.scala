package graft

import org.apache.spark.sql.SparkSession

/** One-off: drive st13 timer sessionization and compare against the
  * batch session computation (test scope, not shipped). */
object ProbeSt13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    Seq("0.001", "0.01").foreach { sf =>
      val dir = s"/root/testdata/sf$sf"
      val got = graft.streaming.Streams.st13TimerSessions(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(t => (t._1, t._2))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val want = Tables.eventsUs(spark, dir)
        .select(col("user_id"), col("ts"))
        .withColumn("new_sess",
          when(col("ts") - lag(col("ts"), 1).over(w) > 1800000000L ||
            lag(col("ts"), 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_sess")).over(w))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts")).as("s"), (max(col("ts")) + 1800000000L).as("e"),
          count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
          r.getLong(4))).sortBy(t => (t._1, t._2))
      println(s"[probe] sf=$sf streaming=${got.length} batch=${want.length} " +
        s"match=${got.toSeq == want.toSeq}")
      if (got.toSeq != want.toSeq) {
        want.toSet.diff(got.toSet).take(5).foreach(t => println(s"  missing $t"))
        got.toSet.diff(want.toSet).take(5).foreach(t => println(s"  extra   $t"))
      }
    }
    spark.stop()
  }
}
