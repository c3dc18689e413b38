package graft

import graft.operators.Extras2

class Extras2Spec extends SparkSpec {
  test("s8: year predicate prunes partitions at the file-listing level") {
    val df = Extras2.s8PartitionPrune(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"expected partition filters in scan:\n$plan")
    assert(df.collect().forall(_.getAs[Long]("o_year") == 1997L))
  }

  test("sql3: registered graft_dot returns ~1.0 norms for unit vectors") {
    val norms = Extras2.sql3VectorNorm(spark, sf).collect()
      .map(_.getAs[Double]("norm2"))
    assert(norms.length == 500)
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-4, s"norm $n"))
  }
}
