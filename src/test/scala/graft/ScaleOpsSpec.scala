package graft

import graft.operators.{ScaleOps, Windows}

class ScaleOpsSpec extends SparkSpec {
  test("x10 bucketed join: no shuffle Exchange on either join side") {
    val df = ScaleOps.x10BucketedJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the final range partitioning for ORDER BY
    val shuffles = "Exchange (hashpartitioning|SinglePartition)".r
      .findAllIn(plan).size
    assert(shuffles == 0, s"expected shuffle-free bucketed join:\n$plan")
    assert(df.count() > 0)
  }

  test("w2 distributed rank: no single-partition WindowExec in plan") {
    val plan = Windows.w2Ntile(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window "), s"should not use WindowExec:\n$plan")
  }

  test("x9 salted agg equals direct aggregation") {
    import org.apache.spark.sql.functions._
    val salted = ScaleOps.x9SaltedAgg(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(Det.dsum(col("l_extendedprice")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == direct)
  }
}
