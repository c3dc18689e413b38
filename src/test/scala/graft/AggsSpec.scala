package graft

import graft.operators.Aggs

class AggsSpec extends SparkSpec {
  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("a1 pricing summary: 6 groups, counts reconcile with source") {
    val rows = Aggs.a1PricingSummary(spark, sf).collect()
    assert(rows.length == 6) // {A,N,R} x {F,O}
    val totalCount = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf)
      .filter("l_shipdate <= timestamp'1998-09-02'").count()
    assert(totalCount == expected)
    // avg consistency: avg_qty == sum_qty / count within exact double division
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_qty") ==
        r.getAs[Double]("sum_qty") / r.getAs[Long]("count_order"))
    }
  }

  test("every declared query has matching oracle-or-none and runs") {
    val qs = SparkEntry.queries
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle without query: $k"))
  }
}
