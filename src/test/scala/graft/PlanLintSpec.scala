package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.PlanLint

class PlanLintSpec extends SparkSpec {

  test("flags a cartesian product between non-broadcastable sides") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the cross join cannot degrade into a
      // (legitimate) broadcast nested loop
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bad = Tables.orders(spark, sf)
        .crossJoin(Tables.lineitem(spark, sf).select(col("l_orderkey").as("k")))
      assert(PlanLint.lint(bad).exists(_.rule == "cartesian-product"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // a bounded-dim cross join broadcasts: that is the plan we want
    val ok = Tables.region(spark, sf).crossJoin(
      Tables.nation(spark, sf).select(col("n_nationkey")))
    assert(!PlanLint.lint(ok).exists(_.rule == "cartesian-product"))
  }

  test("flags a single-partition window") {
    val bad = spark.range(100)
      .withColumn("rn", row_number().over(Window.orderBy("id")))
    assert(PlanLint.lint(bad).exists(_.rule == "single-partition-window"))
    val good = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy("ts")))
    assert(!PlanLint.lint(good).exists(_.rule == "single-partition-window"))
  }

  test("flags a cast-blocked filter that never reached the parquet reader") {
    // the classic accidental pushdown killer: comparing a numeric column
    // as a string defeats filter translation entirely
    val bad = Tables.documents(spark, sf)
      .filter(col("n_chars").cast("string") > "100")
    assert(PlanLint.lint(bad).exists(_.rule == "unpushed-parquet-filter"))
    // the same predicate typed correctly pushes and is clean
    val good = Tables.documents(spark, sf).filter(col("n_chars") > 100)
    assert(!PlanLint.lint(good).exists(_.rule == "unpushed-parquet-filter"))
    // a computed-column filter CANNOT push — that is normal, not a finding
    val computed = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 3)
    assert(!PlanLint.lint(computed).exists(_.rule == "unpushed-parquet-filter"))
  }

  test("flags a pinned broadcast of an unbounded relation") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      val bad = Tables.orders(spark, sf).join(
        broadcast(Tables.lineitem(spark, sf)),
        col("o_orderkey") === col("l_orderkey"))
      assert(PlanLint.lint(bad).exists(_.rule == "oversized-broadcast"))
      // broadcasting an AGGREGATE of the same big table is bounded by
      // group cardinality — a deliberate choice, not a hazard
      val agg = Tables.lineitem(spark, sf)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val ok = Tables.orders(spark, sf).crossJoin(broadcast(agg))
      assert(!PlanLint.lint(ok).exists(_.rule == "oversized-broadcast"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("sweep: every batch contract query lints clean") {
    val skipped = (name: String) => name.startsWith("st") // streaming replays
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skipped)
      .flatMap { name =>
        val findings =
          try PlanLint.lint(SparkEntry.queries(name)(spark, sf))
          catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        findings.map(f => s"$name -> $f")
      }
    assert(offenders.isEmpty, s"\nscale lint failures:\n${offenders.mkString("\n")}")
  }
}
