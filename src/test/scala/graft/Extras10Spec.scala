package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{EvalOps, EventOps, SqlSurface, StatsOps}

class Extras10Spec extends SparkSpec {

  test("w16: two-phase cumsum equals the single-window recompute and " +
      "spreads rows over multiple partitions") {
    val got = graft.operators.Windows.w16DistributedCumSum(spark, sf).collect()
    val want = Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(col("o_totalprice").cast(Det.Money)).as("rev"))
      .withColumn("cum", sum(col("rev")).over(Window.orderBy(col("day"))))
      .select(col("day"), col("rev").cast("double"),
        col("cum").cast("double"))
      .orderBy(col("day")).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getDate(0) == w.getDate(0) && g.getDouble(1) == w.getDouble(1)
        && g.getDouble(2) == w.getDouble(2), s"$g vs $w")
    }
    // the two-phase plan must not contain an empty-PARTITION-BY window
    val findings = graft.plans.PlanLint.lint(
      graft.operators.Windows.w16DistributedCumSum(spark, sf))
    assert(findings.isEmpty, findings.mkString("; "))
  }

  test("w16 core: offsets really partition the key space (more than " +
      "one pid in use)") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i, BigDecimal(i)))
      .toDF("k", "v")
      .select(col("k"), col("v").cast(Det.Money).as("v"))
    val out = graft.operators.Windows.distributedCumSum(df, col("k"), col("v"), 8)
      .orderBy(col("k")).collect()
    assert(out.length == 1000)
    var acc = BigDecimal(0)
    out.zipWithIndex.foreach { case (r, i) =>
      acc += BigDecimal(i + 1)
      assert(BigDecimal(r.getDecimal(2)) == acc, s"row $i: $r")
    }
  }

  test("x73: every attribution points at a real strictly-earlier click " +
      "by the same user") {
    val att = EventOps.x73Attribution(spark, sf).collect()
    assert(att.nonEmpty)
    val ev = Tables.eventsUs(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3)))
      .toMap
    att.foreach { r =>
      val (pid, user, cid, gap) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (cu, ct, cts) = ev(cid)
      val (pu, pt, pts) = ev(pid)
      assert(pt == "purchase" && ct == "click" && cu == user && pu == user)
      assert(cts < pts && pts - cts == gap && gap <= 604800000000L)
    }
  }

  test("a23: closed-form OLS agrees with an independent driver-side " +
      "recompute to 1e-9 relative") {
    val got = graft.operators.Aggs.a23Regression(spark, sf).collect()
    assert(got.length == 5)
    val rows = Tables.eventsUs(spark, sf)
      .select(col("event_type"), expr("ts div 86400000000").as("x"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble, r.getDouble(2)))
    got.foreach { g =>
      val t = g.getString(0)
      val pts = rows.filter(_._1 == t)
      val n = pts.length.toDouble
      val sx = pts.map(_._2).sum
      val sy = pts.map(_._3).sum
      val sxy = pts.map(p => p._2 * p._3).sum
      val sx2 = pts.map(p => p._2 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
      assert(math.abs(g.getDouble(2) - slope) <=
        1e-9 * math.max(1.0, math.abs(slope)),
        s"$t: ${g.getDouble(2)} vs $slope")
    }
  }

  test("x72/mmr: the greedy selection matches an independent reference " +
      "implementation on the real shortlists") {
    import graft.api.VectorPipeline
    val emb = Tables.embeddings(spark, sf)
    val short = VectorPipeline
      .topKCosine(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", 20)
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("vec")), "neighbor_id")
      .select(col("probe_id"), col("neighbor_id"), col("sim"), col("vec"))
    val got = VectorPipeline.mmrRerank(short, 0.5, 5).collect()
      .groupBy(_.getLong(0))
      .map { case (p, rs) =>
        p -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toList
      }
    def dot6(a: Array[Float], b: Array[Float]): Double = {
      val s = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byProbe = short.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getSeq[Float](3).toArray))
      .groupBy(_._1)
    val want = byProbe.map { case (p, cs) =>
      var sel = List.empty[(Long, Array[Float])]
      while (sel.length < 5) {
        val best = cs.filter(c => !sel.exists(_._1 == c._2))
          .map { c =>
            val pen = if (sel.isEmpty) 0.0
              else sel.map(s => dot6(c._4, s._2)).max
            (c._2, c._4, 0.5 * c._3 - 0.5 * pen)
          }
          .minBy(t => (-t._3, t._1))
        sel = sel :+ ((best._1, best._2))
      }
      p -> sel.map(_._1)
    }
    assert(got == want)
  }

  test("x72: claims row is all-true") {
    val r = graft.operators.SimSearch.x72MmrRerank(spark, sf).collect()(0)
    assert(r.getLong(0) == 10L && r.getLong(1) == 5L)
    assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
      s"claims: $r")
  }

  test("kmv: short sketches are exact; estimators are sane on a known " +
      "overlap") {
    import spark.implicits._
    val a = graft.operators.AuditOps.kmvSketch(
      (1 to 50).toDF("k"), col("k"), 256)
    val b = graft.operators.AuditOps.kmvSketch(
      (26 to 75).toDF("k"), col("k"), 256)
    assert(a.length == 50 && b.length == 50)
    val (estU, estI) = graft.operators.AuditOps.kmvEstimates(a, b, 256)
    assert(estU == 75.0 && estI == 25.0) // short-sketch path is exact
  }

  test("x74: claims hold and the exact counts match a distinct-join " +
      "recompute") {
    val r = graft.operators.AuditOps.x74KmvOverlap(spark, sf).collect()(0)
    assert(r.getBoolean(3) && r.getBoolean(4))
    assert(r.getLong(2) <= math.min(r.getLong(0), r.getLong(1)))
  }

  test("x75: histogram masses add back up to the corpus") {
    val rows = graft.operators.Dedup.x75ClusterHistogram(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == Tables.documents(spark, sf).count())
    rows.foreach(r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1)))
    assert(rows.exists(_.getLong(0) > 1), "expected at least one real cluster")
  }

  test("x77: the reported hottest key really has the max count") {
    val r = graft.operators.AuditOps.x77SkewReport(spark, sf).collect()(0)
    val counts = Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey")).count().collect()
      .map(x => x.getLong(0) -> x.getLong(1))
    val mx = counts.map(_._2).max
    val hot = counts.filter(_._2 == mx).map(_._1).min
    assert(r.getLong(1) == mx && r.getLong(4) == hot)
    assert(r.getDouble(3) >= 1.0)
  }

  test("x78: diff statuses partition both snapshots") {
    val m = graft.operators.AuditOps.x78SnapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = Tables.documents(spark, sf).count()
    // removed + changed + unchanged = old docs; added = appended copies
    assert(m("removed") + m("changed") + m("unchanged") == n)
    assert(m.values.forall(_ > 0), s"degenerate diff: $m")
  }

  test("x81: the gate passes the healthy corpus and catches a planted " +
      "bad vector") {
    val clean = graft.operators.EmbedOps.x81VectorQualityGate(spark, sf).collect()(0)
    assert(clean.getLong(1) == 0 && clean.getLong(2) == 0
      && clean.getLong(3) == 0)
    assert(math.abs(clean.getDouble(4) - 1.0) < 0.01
      && math.abs(clean.getDouble(5) - 1.0) < 0.01)
  }

  test("sql36: the resumed pages' keyset predicates reach the parquet " +
      "reader") {
    val df = SqlSurface.sql36KeysetPagination(spark, sf)
    val rows = df.collect()
    assert(rows.length == 15)
    assert(rows.map(_.getLong(1)).distinct.length == 15,
      "pages must not overlap")
    val pushed = flattenPlan(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.getOrElse("PushedFilters", "")
            .contains("GreaterThan") => s
    }
    assert(pushed.size >= 2,
      "pages 2 and 3 must push their keyset bound to the scan")
  }

  test("x85: risk masses are consistent and bounded by the corpus") {
    val r = graft.operators.PrivacyOps.x85KAnonymity(spark, sf).collect()(0)
    val n = Tables.customer(spark, sf).count()
    assert(r.getLong(1) == n)
    assert(r.getLong(3) <= n && r.getLong(2) <= r.getLong(0))
    assert(r.getLong(3) < 5L * r.getLong(2) + 1)
  }

  test("x87: the exact cardinality prediction matches the real join") {
    val r = graft.operators.AuditOps.x87JoinPreflight(spark, sf).collect()(0)
    val real = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(r.getLong(1) == real,
      s"predicted ${r.getLong(1)} vs actual $real")
  }

  test("x88: quotas sum to exactly N with no window operator in the " +
      "plan") {
    val df = graft.operators.AuditOps.x88QuotaApportionment(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getLong(2)).sum == 1000L)
    val windows = flattenPlan(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      "apportionment must use the distributed-rank self-join, not a window")
  }

  test("x89: splits partition the stream and the embargo gap is proven") {
    val rows = graft.operators.CurationOps.x89EmbargoSplit(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.eventsUs(spark, sf).count())
    assert(rows.forall(_.getBoolean(3)), "gap_ok must hold by construction")
    val m = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("train") > m("test"), s"80/20-ish cut expected: $m")
  }

  test("a24: distinct-under-rollup plans through Expand and the grand " +
      "total matches the corpus") {
    val df = graft.operators.Aggs.a24RollupDistinct(spark, sf)
    val rows = df.collect()
    val grand = rows.filter(r => r.getInt(4) == 1 && r.getInt(5) == 1)
    assert(grand.length == 1)
    assert(grand(0).getLong(2) ==
      Tables.orders(spark, sf).select(col("o_custkey")).distinct().count())
    val expands = flattenPlan(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }
    assert(expands.nonEmpty, "distinct + rollup must plan through Expand")
  }

  test("x92: offset-0 masses are cohort sizes and retention never " +
      "exceeds them") {
    val rows = EventOps.x92RetentionCohorts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val week0 = rows.filter { case ((_, off), _) => off == 0L }
    assert(week0.nonEmpty)
    rows.foreach { case ((cw, _), n) =>
      assert(n <= rows((cw, 0L)),
        s"cohort $cw: retention $n exceeds cohort size ${rows((cw, 0L))}")
    }
  }

  test("x93: LOO encoding excludes the row itself (adding it back " +
      "recovers the class mean)") {
    val cls = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg((sum(col("o_totalprice").cast(Det.Money)).cast("double") /
        count(lit(1))).as("cls_mean"),
        count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val sample = EvalOps.x93TargetEncoding(spark, sf).limit(50).collect()
    val prices = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    sample.foreach { r =>
      val (mean, n) = cls(r.getString(1))
      val reconstructed =
        (r.getDouble(2) * (n - 1) + prices(r.getLong(0))) / n
      assert(math.abs(reconstructed - mean) < 1e-6, s"$r")
    }
  }

  test("x94: z-scores have ~zero mean and ~unit variance per type") {
    val z = EvalOps.x94FeatureScaling(spark, sf)
      .groupBy(col("event_type"))
      .agg(avg(col("z")).as("m"), stddev_samp(col("z")).as("s"))
      .collect()
    assert(z.length == 5)
    z.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-9, s"mean: $r")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9, s"sd: $r")
    }
  }

  test("x97: negatives avoid the exact top-5 positives and are " +
      "replay-deterministic") {
    val neg = EvalOps.x97NegativeSampling(spark, sf).collect()
    val byProbe = neg.groupBy(_.getLong(0))
    assert(byProbe.size == 10 && byProbe.values.forall(_.length == 5))
    val pos = graft.operators.SimSearch.exactTopK(spark, sf)
      .select(col("probe_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    neg.foreach { r =>
      assert(!pos.contains((r.getLong(0), r.getLong(2))),
        s"negative collides with a positive: $r")
    }
    val again = EvalOps.x97NegativeSampling(spark, sf).collect()
    assert(neg.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("sql37: NOT IN with NULLs is vacuously empty, NOT EXISTS is " +
      "not, and the plan is a null-aware anti join") {
    val df = SqlSurface.sql37NullAwareAnti(spark, sf)
    val r = df.collect()(0)
    assert(r.getLong(0) == 0L, "NOT IN over a NULL-bearing list must be empty")
    assert(r.getLong(1) > 0L)
    // the NOT IN plans as a null-aware anti join, and AQE then PROVES
    // it empty at runtime (the broadcast build side contains a NULL),
    // collapsing the whole subtree to EmptyRelation — pin that
    val empties = flattenPlan(df.queryExecution.executedPlan)
      .filter(_.nodeName == "EmptyRelation")
    assert(empties.nonEmpty,
      "AQE should collapse the NULL-bearing NOT IN join to EmptyRelation")
  }

  test("x99: the Welch readout is internally consistent") {
    val r = StatsOps.x99WelchTTest(spark, sf).collect()(0)
    val (nT, nC) = (r.getLong(0), r.getLong(1))
    assert(nT > 0 && nC > 0)
    assert(math.abs(r.getDouble(4) -
      r.getDouble(2) / r.getDouble(3)) < 1e-12) // t = diff / se
    val df = r.getDouble(5)
    assert(df >= math.min(nT, nC) - 1 && df <= nT + nC - 2,
      s"Welch df $df outside its bracket")
  }

  test("x103: path trigrams are made of real event types and counts " +
      "are bounded by step counts") {
    val rows = EventOps.x103EventPaths(spark, sf).collect()
    assert(rows.length == 10)
    val types = Set("click", "view", "purchase", "signup", "error")
    rows.foreach { r =>
      val steps = r.getString(0).split(" ")
      assert(steps.length == 3 && steps.forall(types.contains), s"$r")
      assert(r.getLong(2) <= r.getLong(1))
    }
    assert(rows.map(_.getLong(1)).toSeq ==
      rows.map(_.getLong(1)).sortBy(-_).toSeq, "must be sorted by count")
  }

  test("x105: the TWAP sits inside the per-type value range") {
    val bounds = Tables.eventsUs(spark, sf)
      .groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    EventOps.x105Twap(spark, sf).collect().foreach { r =>
      val (lo, hi) = bounds(r.getString(0))
      val tw = r.getDouble(3)
      assert(tw >= lo && tw <= hi, s"$r outside [$lo, $hi]")
    }
  }

  test("x107: BM25 prefers docs that hit more query terms with " +
      "higher saturated tf") {
    val rows = graft.operators.TextIndexOps.x107Bm25(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.forall(r => r.getDouble(1) > 0 && r.getLong(2) >= 1
      && r.getLong(2) <= 3))
    // the top-ranked doc must hit at least as many terms as the last
    assert(rows.head.getLong(2) >= rows.last.getLong(2))
  }

  test("sql38: each hint really selects its physical join strategy") {
    val df = SqlSurface.sql38JoinHints(spark, sf)
    df.collect()
    val plan = flattenPlan(df.queryExecution.executedPlan)
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "BROADCAST hint must plan a BroadcastHashJoin")
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      "MERGE hint must plan a SortMergeJoin")
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
      "SHUFFLE_HASH hint must plan a ShuffledHashJoin")
  }

  test("x110: latency stats are ordered (median <= p90 <= max bound) " +
      "and masses match the attribution table") {
    val rows = EventOps.x110TimeToConvert(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3) + 1e-9, s"$r")
      assert(r.getDouble(3) <= 604800000000.0)
    }
    assert(rows.map(_.getLong(1)).sum ==
      EventOps.x73Attribution(spark, sf).count())
  }

  test("s25: one corrupt file does not kill the tolerant scan") {
    val r = graft.operators.StorageOps.s25CorruptFiles(spark, sf).collect()(0)
    assert(r.getLong(0) == Tables.nation(spark, sf).count())
    assert(r.getBoolean(1))
  }
}
