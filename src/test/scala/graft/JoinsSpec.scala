package graft

import graft.operators.{Joins, SetOps, Aggs}

class JoinsSpec extends SparkSpec {
  test("j1: plan uses BroadcastHashJoin, no shuffle of either side") {
    val plan = Joins.j1Broadcast(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("j5/j6: semi and anti partition the probe side") {
    val c = Tables.customer(spark, sf)
    val urgent = Tables.orders(spark, sf).filter("o_orderpriority = '1-URGENT'")
    val cust = c.count()
    val semi = Joins.j5Semi(spark, sf).count()
    val anti = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .count()
    assert(semi <= cust)
    assert(semi + anti == cust)
  }

  test("j9 as-of: prior click is strictly before the purchase") {
    val rows = Joins.j9AsOf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getAs[Long]("prev_click_us") < r.getAs[Long]("ts_us"))
    }
    // at least one purchase has no prior click (first events of a user)
    assert(rows.exists(_.isNullAt(3)))
  }

  test("j10 interval: gap bounded and pairs ordered") {
    val rows = Joins.j10Interval(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("gap_us") <= 300000000L)
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
    }
  }

  test("j11 star: broadcast joins for all three dims") {
    val plan = Joins.j11Star(spark, sf).queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
  }

  test("a4 approx distinct within 5% of exact") {
    Aggs.a4ApproxDistinctRaw(spark, sf).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.05, s"$approx vs $exact")
    }
  }

  test("set ops: |A ∪all B| = |A| + |B|; |A \\all B| = |A| - |A ∩all B|") {
    val a = Tables.lineitem(spark, sf).filter("l_quantity > 40.0").count()
    val b = Tables.lineitem(spark, sf).filter("l_discount > 0.05").count()
    assert(SetOps.o3UnionAll(spark, sf).count() ==
      Tables.orders(spark, sf).filter("o_orderpriority = '1-URGENT'").count() +
      Tables.orders(spark, sf).filter("o_totalprice > 400000.0").count())
    val inter = SetOps.o5IntersectAll(spark, sf).count()
    val diff = SetOps.o6ExceptAll(spark, sf).count()
    assert(diff == a - inter)
  }
}
