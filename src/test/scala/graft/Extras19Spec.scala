package graft

import org.apache.spark.sql.functions._
import graft.operators.{EvalOps, EventOps}

class Extras19Spec extends SparkSpec {

  private def r(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("x166 ltv cohorts match a scalar recompute and cum_ltv is " +
      "nondecreasing within each cohort") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .as("m"),
        col("o_totalprice")).collect()
      .map(row => (row.getLong(0), row.getAs[Number](1).longValue,
        BigDecimal(row.getDouble(2)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP)))
    val first = orders.groupBy(_._1).map { case (c, xs) =>
      (c, xs.map(_._2).min)
    }
    val size = first.groupBy(_._2).map { case (m0, xs) =>
      (m0, xs.size.toLong)
    }
    val rev = orders.groupBy { o =>
      (first(o._1), o._2 - first(o._1))
    }.collect { case ((m0, age), xs) if age <= 11 =>
      ((m0, age), xs.map(_._3).sum)
    }
    val expect = rev.toSeq.map { case ((m0, age), rv) =>
      val cum = rev.collect {
        case ((c, a), v) if c == m0 && a <= age => v
      }.sum
      // exact integer half-up division in ten-thousandths (the
      // operator's grid-safe spelling)
      val s4 = (cum * 10000).toLongExact
      val n = size(m0)
      (m0, age, n, rv.toDouble,
        ((2 * s4 + n) / (2 * n)).toDouble / 10000.0)
    }.sortBy(x => (x._1, x._2))
    val got = EventOps.x166LtvCohorts(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getDouble(3), row.getDouble(4)))
    assert(got.toSeq == expect)
    got.groupBy(_._1).values.foreach { rows =>
      rows.sortBy(_._2).map(_._5).foldLeft(0.0) { (prev, v) =>
        assert(v >= prev - 1e-9); v
      }
    }
  }

  test("x167 collapse runs match a scalar per-user scan and totals " +
      "reconcile") {
    val ev = Tables.eventsUs(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getString(3)))
    val expect = ev.groupBy(_._1).values.flatMap { xs =>
      val sorted = xs.sortBy(e => (e._2, e._3))
      sorted.zip(None +: sorted.map(e => Some(e._4)).dropRight(1))
        .map { case (e, prev) => (e._4, !prev.contains(e._4)) }
    }.toSeq.groupBy(_._1).map { case (t, xs) =>
      (t, xs.size.toLong, xs.count(_._2).toLong,
        (xs.size - xs.count(_._2)).toLong)
    }.toSeq.sortBy(_._1)
    val got = EventOps.x167CollapseRuns(spark, sf).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getLong(3)))
    assert(got.toSeq == expect)
    assert(got.map(_._2).sum == ev.length.toLong)
  }

  test("x168 confusion matrix matches a scalar recompute") {
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => ((r.getLong(0) * 2654435761L) % 1000 >= 500,
        r.getLong(1) >= 300))
    val tp = rows.count(x => x._1 && x._2).toLong
    val fp = rows.count(x => x._1 && !x._2).toLong
    val fn = rows.count(x => !x._1 && x._2).toLong
    val tn = rows.count(x => !x._1 && !x._2).toLong
    val got = graft.operators.EvalOps.x168Confusion(spark, sf)
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) == ((tp, fp, fn, tn)))
    assert(got.getDouble(4) ==
      r((tp + tn).toDouble / (tp + fp + fn + tn), 8))
    assert(got.getDouble(7) ==
      r(2.0 * tp / (2 * tp + fp + fn), 8))
  }

  test("x169 kappa matches the closed form and is below accuracy on a " +
      "skewed label") {
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (if ((r.getLong(0) * 2654435761L) % 1000 >= 500) 1L
        else 0L, if (r.getLong(1) >= 300) 1L else 0L))
    val n = rows.length.toLong
    val agree = rows.count(x => x._1 == x._2).toLong
    val a1 = rows.map(_._1).sum
    val b1 = rows.map(_._2).sum
    val chance = a1 * b1 + (n - a1) * (n - b1)
    val kappa = r((n * agree - chance).toDouble / (n * n - chance), 8)
    val got = graft.operators.EvalOps.x169CohensKappa(spark, sf)
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) == ((n, agree, a1, b1)))
    assert(got.getDouble(4) == kappa)
    assert(kappa <= agree.toDouble / n + 1e-12)
  }

  test("x170 rfm matches a scalar recompute with quantile_cont " +
      "interpolation and counts reconcile") {
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate").cast("date")
        .cast("string"), col("o_totalprice")).collect()
      .map(row => (row.getLong(0),
        java.time.LocalDate.parse(row.getString(1)),
        BigDecimal(row.getDouble(2)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP)))
    val mxd = o.map(_._2).max
    val cust = o.groupBy(_._1).values.map { xs =>
      (java.time.temporal.ChronoUnit.DAYS.between(
        xs.map(_._2).max, mxd).toDouble,
        xs.length.toDouble, xs.map(_._3).sum.toDouble)
    }.toSeq
    def qcont(vs: Seq[Double], q: Double): Double = {
      val s = vs.sorted
      val pos = q * (s.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      s(lo) + (pos - lo) * (s(hi) - s(lo))
    }
    val qs = Seq(0.2, 0.4, 0.6, 0.8)
    def bucket(v: Double, cuts: Seq[Double]) =
      cuts.count(v > _).toLong + 1L
    val rc = qs.map(qcont(cust.map(_._1), _))
    val fc = qs.map(qcont(cust.map(_._2), _))
    val mc = qs.map(qcont(cust.map(_._3), _))
    val expectCells = cust.groupBy { c =>
      (6L - bucket(c._1, rc), bucket(c._2, fc), bucket(c._3, mc))
    }.map { case (k, xs) => (k, xs.size.toLong) }
    val got = graft.operators.EventOps.x170Rfm(spark, sf).collect()
      .map(row => ((row.getLong(0), row.getLong(1), row.getLong(2)),
        row.getLong(4)))
    assert(got.toMap == expectCells)
    assert(got.map(_._2).sum == cust.length.toLong)
  }
}
