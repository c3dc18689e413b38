package graft


class Extras2Spec extends SparkSpec {
  test("s8: year predicate prunes partitions at the file-listing level") {
    val df = graft.operators.StorageOps.s8PartitionPrune(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"expected partition filters in scan:\n$plan")
    assert(df.collect().forall(_.getAs[Long]("o_year") == 1997L))
  }

  test("s14 dynamic overwrite: target partition restated, others byte-identical") {
    import org.apache.spark.sql.functions._
    val res = graft.operators.StorageOps.s14DynamicOverwrite(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        Det.dsum(when(col("o_orderpriority") === "1-URGENT",
          col("o_totalprice") * 1.1).otherwise(col("o_totalprice"))).as("rev"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(res == want)
    assert(res.size == 5, "all five priority partitions must survive")
    // idempotent: a second run re-states the same partition identically
    val again = graft.operators.StorageOps.s14DynamicOverwrite(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(again == res)
  }

  test("sql3: registered graft_dot returns ~1.0 norms for unit vectors") {
    val norms = graft.operators.SqlSurface.sql3VectorNorm(spark, sf).collect()
      .map(_.getAs[Double]("norm2"))
    assert(norms.length == 500)
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-4, s"norm $n"))
  }
}
