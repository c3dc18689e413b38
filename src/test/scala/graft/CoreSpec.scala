package graft

import graft.operators.Core
import org.apache.spark.sql.functions.expr

class CoreSpec extends SparkSpec {
  test("events normalization: both physical ts spellings read as epoch-ns BIGINT") {
    // The driver corpus has shipped events.ts two ways: INT64 nanos
    // (read as LongType via nanosAsLong) and µs TIMESTAMP (current).
    // Tables.events must normalize either to the epoch-ns BIGINT
    // contract with identical instants — the regression guard for the
    // mid-round-6 schema flip.
    import java.nio.file.Files
    import org.apache.spark.sql.types.LongType
    import spark.implicits._
    val base = Files.createTempDirectory("graft_ts_norm").toString
    // ns values that are exact µs multiples, so both spellings can
    // represent the same instants
    val rows = Seq(
      (1L, 1700000000123456000L, 10L, "view", 1.5, """{"k": 1}"""),
      (2L, 1700000060987654000L, 11L, "click", 2.5, """{"k": 2}"""))
    val legacy = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    legacy.coalesce(1).write.mode("overwrite")
      .parquet(s"$base/legacy/events.parquet")
    legacy.withColumn("ts",
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$base/modern/events.parquet")
    val a = Tables.events(spark, s"$base/legacy")
    val b = Tables.events(spark, s"$base/modern")
    assert(a.schema("ts").dataType == LongType)
    assert(b.schema("ts").dataType == LongType)
    def vals(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "ts").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(vals(a) == vals(b))
    assert(vals(a) == rows.map(r => (r._1, r._2)))
  }

  test("s1 scan: 5 regions in key order") {
    val r = Core.s1Scan(spark, sf).collect()
    assert(r.map(_.getAs[Int]("r_regionkey")).toSeq == Seq(0, 1, 2, 3, 4))
  }

  test("s2 pushdown: filter reaches the parquet scan") {
    val plan = Core.s2Pushdown(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(l_quantity"),
      s"expected pushed filter in plan:\n$plan")
    assert(Core.s2Pushdown(spark, sf).collect()
      .forall(_.getAs[Double]("l_quantity") > 45.0))
  }

  test("s3 events scan: µs timestamps, no raw ns emitted") {
    val rows = Core.s3EventsScan(spark, sf).limit(50).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("ts_us") > 1700000000000000L))
    assert(rows.forall(_.getAs[String]("event_type") == "purchase"))
  }

  test("s5b orc round-trip equals the parquet-sourced aggregate") {
    import org.apache.spark.sql.functions._
    val orc = Core.s5bOrc(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = Tables.lineitem(spark, sf).filter("l_quantity > 45.0")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(orc == direct)
  }

  test("s5 csv/json round-trip: both formats agree") {
    val rows = Core.s5CsvJson(spark, sf).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Long]("n_formats") == 2))
  }

  test("p5 nulls: outer join synthesizes nulls and coalesce fills them") {
    val rows = Core.p5Nulls(spark, sf).collect()
    assert(rows.exists(_.getAs[Boolean]("no_big_order")))
    assert(rows.filter(_.getAs[Boolean]("no_big_order"))
      .forall(_.getAs[Double]("big_total") == 0.0))
  }

  test("p8/o2: limit is exact and ordered") {
    val top = Core.o2TopK(spark, sf).collect()
    assert(top.length == 10)
    val prices = top.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }
}
