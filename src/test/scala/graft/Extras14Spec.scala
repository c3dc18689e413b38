package graft

import org.apache.spark.sql.functions._
import graft.operators.{EvalOps, SimSearch, StatsOps}

class Extras14Spec extends SparkSpec {
  import spark.implicits._

  private def r(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("x146 acf: lag-0 self-check via denominator, pair counts shrink " +
      "by one per missing day-offset, |acf| bounded by 1 + rounding slack") {
    val rows = StatsOps.x146Acf(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 7L))
    // a lag-k pair needs both endpoints observed: count is bounded by
    // the day count minus k on a contiguous series (gaps only shrink it)
    val nDays = Tables.orders(spark, sf)
      .select(expr("cast(cast(o_orderdate as timestamp) as long) div 86400"))
      .distinct().count()
    rows.foreach { row =>
      assert(row.getLong(1) >= 1 && row.getLong(1) <= nDays - 1)
      assert(math.abs(row.getDouble(2)) <= 1.01)
    }
  }

  test("x147 chi2: expected margins reproduce observed totals and the " +
      "statistic is the sum of the per-cell terms") {
    val rows = StatsOps.x147Chi2(spark, sf).collect()
    val (total, cells) = rows.partition(_.getString(0) == "TOTAL")
    assert(total.length == 1 && cells.nonEmpty)
    val t = total.head
    assert(t.getLong(2) == cells.map(_.getLong(2)).sum) // N = Σ obs
    // expected column of the total row carries the dof
    val nPri = cells.map(_.getString(0)).distinct.length
    val nSt = cells.map(_.getString(1)).distinct.length
    assert(t.getDouble(3) == ((nPri - 1) * (nSt - 1)).toDouble)
    // statistic recomputes from the emitted per-cell terms
    val stat = r(cells.map(c => BigDecimal(c.getDouble(4))).sum.toDouble, 6)
    assert(t.getDouble(4) == stat)
    // expected counts sum back to N (within rounding of 6dp per cell)
    val expSum = cells.map(_.getDouble(3)).sum
    assert(math.abs(expSum - t.getLong(2)) < 0.01)
  }

  test("x148 benford: shares sum to 1, expectation sums to 1, deviation " +
      "recomputes per digit") {
    val rows = StatsOps.x148Benford(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq.forall(d => d >= 1 && d <= 9))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    val benfordSum = (1 to 9).map(d => math.log10(1.0 + 1.0 / d)).sum
    assert(math.abs(benfordSum - 1.0) < 1e-12)
    rows.foreach(row =>
      assert(row.getDouble(4) == r(row.getDouble(2) - row.getDouble(3), 6)))
  }

  test("x149 entropy: uniform and degenerate planted mixes hit the " +
      "closed-form bounds") {
    // entropy of a uniform 4-way mix = 2 bits, gini = 0.75; a
    // single-priority segment scores 0 on both
    val o = Seq.tabulate(40)(i => (i.toLong, if (i < 36) s"p${i % 4}"
      else "only")).toDF("o_custkey", "o_orderpriority")
    val c = Seq.tabulate(40)(i => (i.toLong,
      if (i < 36) "UNI" else "ONE")).toDF("c_custkey", "c_mktsegment")
    // drive the same algebra through a temp-view SQL mirror of x149
    o.createOrReplaceTempView("x149_o")
    c.createOrReplaceTempView("x149_c")
    val g = spark.table("x149_o").join(spark.table("x149_c"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("cnt"))
    val tot = g.groupBy(col("segment"))
      .agg(sum(col("cnt")).as("tot"),
        sum(col("cnt") * col("cnt")).as("sumsq"))
    val pCol = col("cnt").cast("double") / col("tot").cast("double")
    val byS = g.join(tot, "segment").groupBy(col("segment"))
      .agg(round(-sum(pCol * log2(pCol)), 6).as("h"),
        max(col("tot")).as("tot"), max(col("sumsq")).as("sumsq"))
      .collect().map(r0 => r0.getString(0) ->
        (r0.getDouble(1), r0.getLong(2), r0.getLong(3))).toMap
    assert(byS("UNI")._1 == 2.0)
    assert(byS("ONE")._1 == -0.0 || byS("ONE")._1 == 0.0)
    // and the real corpus run emits one row per segment with sane bounds
    val rows = StatsOps.x149Entropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val k = row.getLong(2).toDouble
      assert(row.getDouble(3) >= 0.0 &&
        row.getDouble(3) <= math.log(k) / math.log(2.0) + 1e-6)
      assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0 - 1.0 / k + 1e-6)
    }
  }

  test("x150 retrieval eval: per-probe rows recompute from the two " +
      "source frames and the macro row averages them") {
    val rows = EvalOps.x150RetrievalEval(spark, sf).collect()
    val (mac, per) = rows.partition(_.getLong(0) == -1L)
    assert(mac.length == 1 && per.length == 10)
    val ex = SimSearch.exactTopK(spark, sf)
      .select("probe_id", "neighbor_id").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    val retr = graft.operators.EmbedOps.x124BinaryQuant(spark, sf)
      .select("probe_id", "neighbor_id", "rank").collect()
    per.foreach { row =>
      val p = row.getLong(0)
      val hits = retr.filter(r0 => r0.getLong(0) == p &&
        ex((p, r0.getLong(1))))
      assert(row.getLong(1) == hits.length)
      assert(row.getDouble(2) == r(hits.length / 5.0, 6))
      val rr = if (hits.isEmpty) 0.0
        else r(1.0 / hits.map(_.getLong(2)).min, 6)
      assert(row.getDouble(3) == rr)
    }
    assert(mac.head.getLong(1) == per.map(_.getLong(1)).sum)
    assert(mac.head.getDouble(2) ==
      r(per.map(r0 => BigDecimal(r0.getDouble(2))).sum.toDouble / 10, 6))
  }

  test("x151 rrf: a doubly-listed neighbor always outranks any " +
      "singly-listed one at equal-or-worse source ranks; scores " +
      "recompute from 1/(60+rank)") {
    val rows = EvalOps.x151Rrf(spark, sf).collect()
    assert(rows.nonEmpty)
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(4)).sorted.toSeq == (1L to rs.length))
      val scores = rs.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // max possible two-list score vs min possible one-list score
    rows.foreach { row =>
      val (nLists, s) = (row.getLong(2), row.getDouble(3))
      if (nLists == 2) assert(s > r(1.0 / 65, 10) - 1e-9)
      assert(nLists >= 1 && nLists <= 2)
      // rrf is the 8dp-rounded sum of two 10dp-rounded terms — allow
      // one rounding step of slack above the analytic 2/61 max
      assert(s <= 2.0 / 61 + 1e-8)
    }
  }
}
