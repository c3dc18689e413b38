package graft

import org.apache.spark.sql.functions._
import graft.operators.{EvalOps, EventOps}

class Extras16Spec extends SparkSpec {

  private def r(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("x158 shapley matches a scalar brute-force over all 4! orderings " +
      "and satisfies the efficiency axiom") {
    // brute: per-user pre-purchase touch masks from one smoke-scale collect
    val ev = Tables.eventsUs(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type")).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getString(2)))
    val bit = Map("click" -> 1, "error" -> 2, "signup" -> 4, "view" -> 8)
    val firstP = ev.filter(_._3 == "purchase").groupBy(_._1)
      .map { case (u, xs) => (u, xs.map(_._2).min) }
    val masks = firstP.toSeq.map { case (u, pts) =>
      ev.filter(e => e._1 == u && e._2 < pts && e._3 != "purchase")
        .map(e => bit(e._3)).distinct.sum
    }
    def v(s: Int): Long = masks.count(m => (m & s) == m).toLong
    // exact Shapley via direct enumeration of the 24 orderings
    val chans = Seq("click", "error", "signup", "view")
    val phi24 = scala.collection.mutable.Map(chans.map(_ -> 0L): _*)
    chans.permutations.foreach { perm =>
      var s = 0
      perm.foreach { c =>
        val s2 = s | bit(c)
        phi24(c) += v(s2) - v(s)
        s = s2
      }
    }
    val got = EvalOps.x158Shapley(spark, sf).collect()
      .map(row => (row.getString(0), (row.getLong(1), row.getDouble(2))))
      .toMap
    chans.foreach { c =>
      assert(got(c)._1 == phi24(c), s"channel $c")
      assert(got(c)._2 == r(phi24(c) / 24.0, 6))
    }
    // efficiency: credits sum exactly to v(full) − v(∅)
    assert(got("TOTAL")._1 == 24L * (v(15) - v(0)))
    assert(got("TOTAL")._1 == chans.map(phi24).sum)
  }

  test("x159 stickiness matches a scalar recompute and ratios are in (0,1]") {
    val du = Tables.eventsUs(spark, sf)
      .select(expr("ts div 86400000000").as("day"), col("user_id"))
      .distinct().collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    val days = du.map(_._1).distinct.sorted
    val mau = du.map(_._2).distinct.length.toLong // corpus spans one month
    val expect = days.map { d =>
      val dau = du.count(_._1 == d).toLong
      val wau = du.filter(x => x._1 >= d - 6 && x._1 <= d)
        .map(_._2).distinct.length.toLong
      (d, dau, wau, mau, r(dau.toDouble / wau, 6), r(dau.toDouble / mau, 6))
    }
    val got = EventOps.x159Stickiness(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getDouble(4), row.getDouble(5)))
    assert(got.toSeq == expect.toSeq)
    got.foreach { g =>
      assert(g._5 > 0 && g._5 <= 1.0 + 1e-9)
      assert(g._6 > 0 && g._6 <= 1.0 + 1e-9)
    }
  }

  test("x160 apriori triples match a brute per-basket enumeration") {
    val baskets = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct().collect()
      .map(row => (row.getLong(0), row.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sorted)
      .filter(_.length <= 64).toSeq
    val counts = scala.collection.mutable.Map[(Long, Long, Long), Long]()
    baskets.foreach { items =>
      for {
        i <- items.indices; j <- (i + 1) until items.length
        k <- (j + 1) until items.length
      } {
        val key = (items(i), items(j), items(k))
        counts(key) = counts.getOrElse(key, 0L) + 1L
      }
    }
    val expect = counts.toSeq.filter(_._2 >= 2)
      .sortBy { case ((a, b, c), s) => (-s, a, b, c) }.take(20)
      .map { case ((a, b, c), s) => (a, b, c, s) }
    val got = graft.operators.BasketOps.x160Apriori3(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3)))
    assert(got.toSeq == expect)
  }

  test("x161 auc matches a brute pairwise comparison count with ties") {
    val scored = Tables.documents(spark, sf)
      .select(((col("doc_id") * lit(2654435761L)) % 1000).as("pm"),
        when(col("n_chars") >= 300, 1L).otherwise(0L).as("y")).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    val pos = scored.filter(_._2 == 1L).map(_._1)
    val neg = scored.filter(_._2 == 0L).map(_._1)
    // u2 = 2·(#pos>neg) + (#ties): exact integer
    var u2 = 0L
    pos.foreach { p =>
      neg.foreach { n =>
        if (p > n) u2 += 2 else if (p == n) u2 += 1
      }
    }
    val row = EvalOps.x161AucGini(spark, sf).collect().head
    assert(row.getLong(0) == pos.length.toLong)
    assert(row.getLong(1) == neg.length.toLong)
    assert(row.getLong(2) == u2)
    val auc = r(u2.toDouble / (2.0 * pos.length * neg.length), 8)
    assert(row.getDouble(3) == auc)
    assert(row.getDouble(4) == r(2.0 * auc - 1.0, 8))
  }
}
