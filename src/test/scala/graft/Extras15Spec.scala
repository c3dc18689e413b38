package graft

import org.apache.spark.sql.functions._
import graft.operators.EvalOps

class Extras15Spec extends SparkSpec {

  private def r(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("x152 calibration: totals reconcile, bin means live in their bin, " +
      "total brier is the count-weighted mean of bin briers") {
    val rows = EvalOps.x152Calibration(spark, sf).collect()
    val (tot, bins) = rows.partition(_.getLong(0) == -1L)
    assert(tot.length == 1 && bins.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    assert(tot.head.getLong(1) == nDocs)
    assert(bins.map(_.getLong(1)).sum == nDocs)
    bins.foreach { b =>
      val bin = b.getLong(0); val meanP = b.getDouble(2)
      assert(bin >= 0 && bin <= 9)
      assert(meanP >= bin / 10.0 - 1e-8 && meanP < (bin + 1) / 10.0 + 1e-8)
      assert(b.getDouble(3) >= 0.0 && b.getDouble(3) <= 1.0)
    }
    // total brier recomputes from the bins (weighted by n; 8dp slack)
    val wavg = bins.map(b => b.getLong(1) * b.getDouble(4)).sum / nDocs
    assert(math.abs(tot.head.getDouble(4) - wavg) < 1e-6)
  }

  test("x153 phrase search matches a per-doc sliding-window brute count") {
    val brute = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { row =>
        val toks = row.getString(1).split(" ", -1)
        val hits = toks.indices.dropRight(1)
          .filter(i => toks(i) == "hash" && toks(i + 1) == "join")
        (row.getLong(0), hits.length.toLong,
          hits.headOption.map(_.toLong).getOrElse(-1L))
      }
      .filter(_._2 > 0)
      .sortBy { case (id, n, _) => (-n, id) }
      .take(20)
    val got = graft.operators.TextIndexOps.x153PhraseSearch(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    assert(got.toSeq == brute.toSeq)
  }

  test("x154 KM curve matches a sequential scalar reimplementation, " +
      "survival is nonincreasing from 1") {
    // brute: per-customer (weeks, event) via one collect at smoke scale
    val perCust = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("f"), max(col("o_orderdate")).as("l"))
      .select(col("f").cast("date").cast("string"),
        col("l").cast("date").cast("string")).collect()
      .map(row => (java.time.LocalDate.parse(row.getString(0)),
        java.time.LocalDate.parse(row.getString(1))))
    val mx = perCust.map(_._2).max
    val durEv = perCust.map { case (f, l) =>
      val wk = java.time.temporal.ChronoUnit.DAYS.between(f, l) / 7
      (wk, if (!l.isAfter(mx.minusDays(90))) 1 else 0)
    }
    val byWk = durEv.groupBy(_._1).map { case (wk, xs) =>
      (wk, xs.count(_._2 == 1).toLong, xs.count(_._2 == 0).toLong)
    }.toSeq.sortBy(_._1)
    var surv = 1.0
    val expect = byWk.flatMap { case (wk, d, c) =>
      val n = byWk.filter(_._1 >= wk).map(x => x._2 + x._3).sum
      if (d > 0) {
        val f = r((n - d).toDouble / n, 8)
        surv = r(surv * f, 10)
        Some((wk, n, d, c, f, surv))
      } else None
    }
    val got = graft.operators.StatsOps.x154SurvivalKm(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getDouble(4), row.getDouble(5)))
    assert(got.toSeq == expect)
    // curve shape: starts ≤ 1, never increases
    got.map(_._6).foldLeft(1.0) { (prev, s) =>
      assert(s <= prev + 1e-12); s
    }
  }

  test("x155 delta decomposition: volume+rate bridge per nation, TOTAL " +
      "row reconciles, shares sum to 1") {
    val rows = graft.operators.AuditOps.x155DeltaDecomp(spark, sf).collect()
    val (tot, per) = rows.partition(_.getString(0) == "TOTAL")
    assert(tot.length == 1 && per.nonEmpty)
    val t = tot.head
    assert(t.getLong(1) == per.map(_.getLong(1)).sum)
    assert(t.getLong(2) == per.map(_.getLong(2)).sum)
    assert(math.abs(t.getDouble(5) - per.map(_.getDouble(5)).sum) < 1e-6)
    // the two-factor bridge closes exactly (rate is the 4dp remainder)
    rows.filter(!_.isNullAt(7)).foreach { row =>
      assert(math.abs(row.getDouble(5) -
        (row.getDouble(7) + row.getDouble(8))) < 1e-3)
    }
    if (!t.isNullAt(6)) {
      assert(t.getDouble(6) == 1.0)
      val shareSum = per.filter(!_.isNullAt(6)).map(_.getDouble(6)).sum
      assert(math.abs(shareSum - 1.0) < 1e-4)
    }
  }

  test("x156 l-diversity: totals reconcile to the customer table and " +
      "every group sees at least one nation") {
    val rows = graft.operators.PrivacyOps.x156LDiversity(spark, sf).collect()
    val (tot, hist) = rows.partition(_.getLong(0) == -1L)
    assert(tot.length == 1 && hist.nonEmpty)
    assert(hist.forall(_.getLong(0) >= 1))
    assert(tot.head.getLong(1) == hist.map(_.getLong(1)).sum)
    assert(tot.head.getLong(2) == hist.map(_.getLong(2)).sum)
    assert(tot.head.getLong(2) == Tables.customer(spark, sf).count())
  }

  test("x157 oov rate matches a scalar brute recompute of the bigram " +
      "vocabulary split") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(row => (row.getLong(0), row.getString(1), row.getString(2)))
    def bigrams(t: String): Seq[String] = {
      val w = t.split(" ", -1).toSeq
      w.indices.dropRight(1).map(i => w(i) + " " + w(i + 1))
    }
    val vocab = docs.filter(_._1 % 2 == 0).flatMap(d => bigrams(d._3))
      .groupBy(identity).collect { case (g, xs) if xs.length >= 3 => g }
      .toSet
    val expect = docs.filter(_._1 % 2 == 1)
      .flatMap(d => bigrams(d._3).map(g => (d._2, g)))
      .groupBy(_._1).map { case (lang, xs) =>
        val oov = xs.count(x => !vocab.contains(x._2)).toLong
        (lang, xs.length.toLong, oov, r(oov.toDouble / xs.length, 6))
      }.toSeq.sortBy(_._1)
    val got = graft.operators.TextIndexOps.x157OovRate(spark, sf).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getDouble(3)))
    assert(got.toSeq == expect)
  }
}
