package graft

import org.apache.spark.sql.SparkSession

/** One-off: drive st12 outer-join replay and compare against the batch
  * left join (test scope, not shipped). */
object ProbeSt12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    Seq("0.001", "0.01").foreach { sf =>
      val dir = s"/root/testdata/sf$sf"
      val res = graft.streaming.Streams.st12StreamStreamOuter(spark, dir)
      val got = res.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3))).sortBy(_._1)
      val c = Tables.eventsUs(spark, dir).filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("ct"))
      val p = Tables.eventsUs(spark, dir).filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("pt"), col("value"))
      val want = c.join(p, col("cu") === col("pu") &&
          col("pt") >= col("ct") && col("pt") <= col("ct") + 3600000000L,
          "left_outer")
        .groupBy(col("cu").as("user_id"))
        .agg(count(col("value")).as("n_pairs"),
          (count(lit(1)) - count(col("value"))).as("n_unmatched"),
          coalesce(sum(col("value").cast(Det.Money)).cast("double"), lit(0.0))
            .as("sum_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).sortBy(_._1)
      val ok = got.toSeq == want.toSeq
      println(s"[probe] sf=$sf rows=${got.length} matchesBatch=$ok " +
        s"unmatchedTotal=${got.map(_._3).sum}")
      if (!ok) {
        want.foreach { case (k, a, b, c2) =>
          val gg = got.find(_._1 == k).map(t => (t._2, t._3, t._4))
          if (!gg.contains((a, b, c2)))
            println(s"  user $k want=($a,$b,$c2) got=$gg")
        }
      }
    }
    spark.stop()
  }
}
