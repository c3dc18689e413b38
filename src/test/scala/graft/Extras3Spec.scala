package graft

import org.apache.spark.sql.functions._
import graft.operators.SimSearch

class Extras3Spec extends SparkSpec {

  test("x14 hyperplane LSH: candidates are bucket-disciplined and ranked correctly") {
    val res = graft.operators.SimSearch.x14LshAnnRaw(spark, sf).collect()
    // per probe: ranks are 1..n ascending with sims non-increasing,
    // self excluded
    res.groupBy(_.getAs[Long]("probe_id")).foreach { case (pid, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length).toSeq, s"probe $pid ranks")
      val sims = sorted.map(_.getAs[Double]("sim")).toSeq
      assert(sims == sims.sorted.reverse, s"probe $pid sims not descending")
      assert(rows.forall(_.getAs[Long]("neighbor_id") != pid))
    }
    // every LSH result's sim can never exceed the brute-force best
    val brute = SimSearch.l3TopKCosine(spark, sf).collect()
      .filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Double]("sim")).toMap
    res.filter(_.getAs[Long]("rank") == 1L).foreach { r =>
      val pid = r.getAs[Long]("probe_id")
      assert(r.getAs[Double]("sim") <= brute(pid) + 1e-9,
        s"probe $pid: LSH top-1 beats brute force?")
    }
  }

  test("x14 hyperplane LSH: deterministic across runs") {
    val a = graft.operators.SimSearch.x14LshAnnRaw(spark, sf).collect().map(_.toString).toSeq
    val b = graft.operators.SimSearch.x14LshAnnRaw(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("a11 string_agg: names sorted within group, counts reconcile") {
    val rows = graft.operators.Aggs.a11StringAgg(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_suppliers")).sum
    assert(total == Tables.supplier(spark, sf).count())
    rows.foreach { r =>
      val names = r.getAs[String]("names").split('|').toSeq
      assert(names == names.sorted, "names not sorted in group")
      assert(names.length == r.getAs[Long]("n_suppliers"))
    }
  }

  test("a12 unpivot: long form has 2 rows per part, metrics complete") {
    val df = graft.operators.Aggs.a12Unpivot(spark, sf)
    val nParts = Tables.part(spark, sf).count()
    assert(df.count() == 2 * nParts)
    assert(df.select("metric").distinct().collect().map(_.getString(0)).sorted
      .toSeq == Seq("retail", "size"))
  }

  test("l8 centroids: 64 dims per label, means bounded by dim range") {
    val rows = graft.operators.Clustering.l8Centroids(spark, sf).collect()
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    byLabel.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("dim")).sorted.toSeq == (0L to 63L).toSeq)
    }
    // unit vectors: every coordinate in [-1,1], so means are too
    assert(rows.forall(r => math.abs(r.getAs[Double]("mean_v")) <= 1.0))
  }

  test("graft_minhash SQL aggregate equals the DataFrame MinHashAgg path") {
    import graft.operators.Dedup
    functions.GraftFunctions.register(spark)
    val sh = Dedup.shingleSet(spark, sf)
      .withColumn("h", pmod(hash(col("ngram")).cast("long"), lit(2147483647L)))
    sh.createOrReplaceTempView("v_shingles")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_minhash(h) AS sig FROM v_shingles GROUP BY doc_id")
    val viaDf = sh.groupBy(col("doc_id"))
      .agg(functions.MinHashAgg.minhash(col("h")).as("sig"))
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
  }

  test("s9 sorted write: date predicate is pushed to the parquet scan") {
    val df = graft.operators.StorageOps.s9SortedWrite(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_shipdate") ,
      s"expected l_shipdate pushdown in:\n$plan")
    assert(df.collect().map(_.getAs[String]("ship_month")).toSeq ==
      Seq("1997-06-01", "1997-07-01", "1997-08-01"))
  }

  test("j12: BandedRangeJoinRule replaces the nested-loop join with a banded equi-join") {
    val df = graft.operators.Joins.j12RangeJoinAuto(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join not banded:\n$plan")
    assert(plan.contains("__graft_band"), s"band columns missing:\n$plan")
    // same result as the un-rewritten nested-loop join
    val ev = Tables.eventsUs(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("id_a"), col("ts").as("ts_a"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("id_b"), col("ts").as("ts_b"))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    val naive =
      try clicks.join(errors,
          col("ts_b") >= col("ts_a") &&
          col("ts_b") <= col("ts_a") + lit(60000000L), "inner")
        .groupBy(col("id_a"))
        .agg(count(lit(1)).as("n_errors"),
          min(col("ts_b") - col("ts_a")).as("min_gap_us"))
        .collect().map(_.toString).sorted.toSeq
      finally spark.experimental.extraOptimizations = prev
    assert(df.collect().map(_.toString).sorted.toSeq == naive)
  }

  test("a15 approx percentile within 1% of exact") {
    graft.operators.Aggs.a15ApproxPercentileRaw(spark, sf).collect().foreach { r =>
      val ap = r.getAs[Double]("p50_approx")
      val ex = r.getAs[Double]("p50_exact")
      assert(math.abs(ap - ex) / ex < 0.01, s"approx $ap vs exact $ex")
    }
  }

  test("x15 latest-by-key equals window-based last record") {
    import org.apache.spark.sql.expressions.Window
    val viaAgg = graft.operators.WarehouseOps.x15LatestByKey(spark, sf)
      .select("user_id", "last_type", "last_value")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val viaWindow = Tables.eventsUs(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"),
        col("value").as("last_value"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("a16 rolling distinct equals brute-force per-day window count") {
    val got = graft.operators.Aggs.a16RollingDistinct(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Tables.eventsUs(spark, sf)
      .select(col("user_id"), expr("ts div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxDay = pairs.map(_._2).max
    val wdays = pairs.map(_._2).min to maxDay
    val brute = wdays.map { d =>
      d -> pairs.collect { case (u, day) if day >= d - 6 && day <= d => u }
        .distinct.length.toLong
    }.toMap
    // every in-range window-day matches the brute-force trailing count
    wdays.foreach { d => assert(got(d) == brute(d), s"day $d") }
    // contribution days before the first event day exist only if some
    // user was active then; nothing beyond maxDay survives the clip
    assert(got.keys.max == maxDay)
  }

  test("f18 try functions: every failure mode becomes NULL, successes exact") {
    val rows = graft.operators.Scalars.f18TryFuncs(spark, sf).collect()
    rows.foreach { r =>
      val k = r.getLong(0)
      val casted = Option(r.get(1)).map(_.asInstanceOf[Double])
      assert(casted == (if (k % 3 == 0) Some(12.5) else None))
      val divided = Option(r.get(2)).map(_.asInstanceOf[Double])
      if (k % 4 == 0) assert(divided.isEmpty, s"divide by zero must NULL (key $k)")
      else assert(divided.contains(k.toDouble / (k % 4)))
      val frac = Option(r.get(3)).map(_.asInstanceOf[String])
      assert(frac == (if (k % 3 == 0) Some("5") else None))
    }
  }

  test("f19 collation grouping: UNICODE_CI really merges the case variants") {
    val rows = graft.operators.Scalars.f19CollationCi(spark, sf).collect()
    assert(rows.length == Tables.supplier(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == 2L,
        s"case variants of ${r.getString(0)} did not merge")
      assert(r.getString(0) == r.getString(0).toLowerCase)
    }
    // cost profile: the first collated run pays one-time ICU/collator
    // init (bench shows ~1.8 s cold for a 2k-row agg); per-row cost is
    // tiny once warm. The former wall-clock assertion here could flake
    // under CI load / GC pauses (ADVICE r4) — runtime regressions are
    // the bench harness's job, and f19 is a benched contract query, so
    // a plan regression shows up as a per-round bench delta instead.
  }

  test("x30 cdc apply: deletes gone, updates rewritten, inserts added, keeps intact") {
    val snap = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = graft.operators.WarehouseOps.x30ApplyCdc(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    snap.foreach { case (k, bal) =>
      k % 10 match {
        case 0 => assert(!rows.contains(k), s"deleted key $k survived")
        case 1 | 2 => assert(rows(k) == ((bal + 100.0, "U")))
        case 3 =>
          assert(rows(k) == ((bal, "K")), s"source row of insert must keep")
          assert(rows(k + 100000L) == ((bal + 100.0, "I")))
        case _ => assert(rows(k) == ((bal, "K")))
      }
    }
    // cardinality: original minus deletes plus inserts
    val dels = snap.keys.count(_ % 10 == 0)
    val ins = snap.keys.count(_ % 10 == 3)
    assert(rows.size == snap.size - dels + ins)
  }

  test("x25 scd2: ranges tile each user's timeline and runs reconstruct the stream") {
    val ranges = graft.operators.WarehouseOps.x25Scd2(spark, sf).collect()
    val events = Tables.eventsUs(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    ranges.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("version"))
      // versions are 1..n dense; ranges chain: valid_to = next valid_from
      ordered.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("version") == i + 1L)
        val vt = r.getAs[Long]("valid_to")
        if (i < ordered.length - 1)
          assert(vt == ordered(i + 1).getAs[Long]("valid_from"))
        else assert(vt == -1L)
      }
      // no two adjacent ranges share an event_type (else they'd be one run)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"))
        case _ =>
      }
      // exact reconstruction: collapse the user's (ts, event_id)-sorted
      // stream into runs of equal type and compare every field
      val runs = events.filter(_._1 == uid).sortBy(e => (e._2, e._3))
        .foldLeft(Vector.empty[(String, Long, Long)]) { // (type, from, n)
          case (acc, (_, ts, _, tpe)) =>
            if (acc.nonEmpty && acc.last._1 == tpe)
              acc.init :+ ((tpe, acc.last._2, acc.last._3 + 1))
            else acc :+ ((tpe, ts, 1L))
        }
      assert(ordered.length == runs.length)
      ordered.zip(runs).foreach { case (r, (tpe, from, n)) =>
        assert(r.getAs[String]("event_type") == tpe)
        assert(r.getAs[Long]("valid_from") == from)
        assert(r.getAs[Long]("n_events") == n)
      }
    }
  }
}
