package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventOps, SqlSurface}

class Extras17Spec extends SparkSpec {

  private def r(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("x162 holt forecast matches a sequential scalar recursion") {
    val ys = Tables.orders(spark, sf)
      .groupBy(expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
        .as("day"))
      .agg(sum(col("o_totalprice").cast(graft.Det.Money)).as("v"))
      .select(col("day"), col("v").cast("double").as("y"))
      .orderBy(col("day")).collect().map(_.getDouble(1))
    var l = r(ys(0), 0)
    var b = r(ys(1) - ys(0), 0)
    ys.drop(1).foreach { y =>
      val l2 = r(0.3 * y + 0.7 * (l + b), 0)
      b = r(0.1 * (l2 - l) + 0.9 * b, 0)
      l = l2
    }
    val got = EventOps.x162HoltForecast(spark, sf).collect()
      .map(row => (row.getLong(0), row.getDouble(1), row.getDouble(2)))
    assert(got.length == 15)
    got.foreach { case (h, f, tr) =>
      assert(tr == b)
      assert(f == r(l + h.toDouble * b, 6), s"h=$h")
    }
  }

  test("x163 ohlc matches a scalar per-day recompute with tie-safe " +
      "open/close picks") {
    val ev = Tables.eventsUs(spark, sf)
      .select(col("ts"), col("event_id"), col("value")).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getDouble(2)))
    val expect = ev.groupBy(e => e._1 / 86400000000L).toSeq.sortBy(_._1)
      .map { case (day, xs) =>
        val sorted = xs.sortBy(e => (e._1, e._2))
        val vsum = xs.map(e => BigDecimal(e._3).setScale(4,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        (day, sorted.head._3, xs.map(_._3).max, xs.map(_._3).min,
          sorted.last._3, xs.length.toLong, vsum)
      }
    val got = EventOps.x163Ohlc(spark, sf).collect()
      .map(row => (row.getLong(0), row.getDouble(1), row.getDouble(2),
        row.getDouble(3), row.getDouble(4), row.getLong(5),
        row.getDouble(6)))
    assert(got.toSeq == expect)
  }

  test("sql47 unpivot clause reconciles against the wide aggregate") {
    val rows = SqlSurface.sql47UnpivotClause(spark, sf).collect()
    val nPri = Tables.orders(spark, sf)
      .select(col("o_orderpriority")).distinct().count()
    assert(rows.length == 3 * nPri)
    // each priority contributes exactly the three metrics
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getString(1)).sorted.toSeq ==
        Seq("max_price", "n_orders", "total"))
    }
    // n_orders values sum back to the total order count
    val n = rows.filter(_.getString(1) == "n_orders")
      .map(_.getDouble(2)).sum
    assert(n == Tables.orders(spark, sf).count().toDouble)
  }

  test("sql48 inline values covers every region and reconciles customer " +
      "counts") {
    val rows = SqlSurface.sql48InlineValues(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("amer", "apac", "emea"))
    assert(rows.map(_.getLong(1)).sum ==
      Tables.customer(spark, sf).count())
  }
}
