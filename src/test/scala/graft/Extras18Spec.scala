package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventOps, SqlSurface}

class Extras18Spec extends SparkSpec {

  test("x164 gap audit matches a scalar scan of the observed-day set " +
      "and the total row reconciles") {
    val days = Tables.orders(spark, sf)
      .select(expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
        .as("day")).distinct().collect().map(_.getLong(0)).sorted
    val expect = days.zip(days.tail).collect {
      case (a, b) if b > a + 1 => (a + 1, b - 1, b - a - 1)
    }
    val rows = EventOps.x164GapAudit(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    val (tot, gaps) = rows.partition(_._1 == -1L)
    assert(gaps.toSeq == expect.toSeq)
    assert(tot.length == 1)
    assert(tot.head._3 == (days.max - days.min + 1) - days.length)
    // gap lengths sum to the total missing count
    assert(gaps.map(_._3).sum == tot.head._3)
  }

  test("x165 streaks match a scalar islands recompute") {
    val du = Tables.eventsUs(spark, sf)
      .select(expr("ts div 86400000000").as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(1), r.getLong(0)))
    val expect = du.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      val days = xs.map(_._2).sorted
      // split into consecutive runs
      val runs = days.foldLeft(List.empty[List[Long]]) {
        case (acc @ (cur :: rest), d) if cur.head == d - 1 =>
          (d :: cur) :: rest
        case (acc, d) => List(d) :: acc
      }
      runs.map(r => (u, r.last, r.length.toLong))
    }.sortBy { case (u, s, len) => (-len, u, s) }.take(20)
    val got = EventOps.x165Streaks(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    assert(got.toSeq == expect)
  }

  test("sql49 distribute/sort by is value-neutral vs the plain aggregate") {
    val got = SqlSurface.sql49DistributeSort(spark, sf).collect()
      .map(row => (row.getAs[Number](0).longValue, row.getLong(1),
        row.getDouble(2)))
    val plain = Tables.customer(spark, sf)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast(graft.Det.Money)).cast("double")
          .as("b"))
      .orderBy(col("c_nationkey")).collect()
      .map(row => (row.getAs[Number](0).longValue, row.getLong(1),
        row.getDouble(2)))
    assert(got.toSeq == plain.toSeq)
  }
}
