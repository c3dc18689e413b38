package graft

import graft.operators.{ScaleOps, Windows}

class ScaleOpsSpec extends SparkSpec {
  test("x10 bucketed join: no shuffle Exchange on either join side") {
    val df = ScaleOps.x10BucketedJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the final range partitioning for ORDER BY
    val shuffles = "Exchange (hashpartitioning|SinglePartition)".r
      .findAllIn(plan).size
    assert(shuffles == 0, s"expected shuffle-free bucketed join:\n$plan")
    assert(df.count() > 0)
  }

  test("s20 bucket pruning: the IN filter opens at most 3 of 16 buckets") {
    val df = ScaleOps.s20BucketPrune(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"no bucket pruning in plan:\n$plan")
    assert(m.get.group(2).toInt == 16)
    assert(m.get.group(1).toInt <= 3,
      s"expected <= 3 buckets for a 3-key IN, got ${m.get.group(1)}")
    assert(df.count() > 0)
  }

  test("sql14's NOT IN plans as a hash anti join, never a nested loop") {
    // NOT IN is null-aware: on a nullable key Spark can only run it as
    // BroadcastNestedLoopJoin (per-probe scan of the whole blacklist).
    // s_suppkey/l_suppkey are non-null, so the planner must prove that
    // and emit a broadcast HASH anti join — lock the good plan in
    val df = graft.operators.Subqueries.sql14PartsSupplier(spark, sf)
    df.collect() // finalize AQE on THIS queryExecution
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(plan).isDefined,
      s"anti join degraded:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"null-aware anti join fell back to nested loop:\n$plan")
  }

  test("AQE splits a planted skewed join partition (the automatic form of x28's salting)") {
    // 90% of the fact rows share one key: without intervention that
    // partition is the straggler x28 salts away by hand. With AQE skew
    // handling (thresholds lowered to test scale) the runtime re-plans
    // the oversized partition into splits — visible as skew=true on the
    // SortMergeJoin in the final adaptive plan.
    val s = spark.newSession()
    Tables.tune(s)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32768")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
    import org.apache.spark.sql.functions._
    val fact = s.range(0, 100000)
      .select(when(col("id") % 10 < 9, 0L).otherwise(col("id") % 97).as("k"),
        col("id").as("payload"))
    val dim = s.range(0, 97)
      .select(col("id").as("k"), (col("id") * 2).as("dpay"))
    val joined = fact.join(dim, "k")
    // collect() executes THIS frame's queryExecution (count() would spin
    // up a separate one and leave this plan un-finalized)
    assert(joined.collect().length == 100000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark the skewed join:\n$plan")
  }

  test("w2 distributed rank: no single-partition WindowExec in plan") {
    val plan = Windows.w2Ntile(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window "), s"should not use WindowExec:\n$plan")
  }

  test("x9 salted agg equals direct aggregation") {
    import org.apache.spark.sql.functions._
    val salted = ScaleOps.x9SaltedAgg(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(Det.dsum(col("l_extendedprice")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("x24 bloom join: pre-filter is exact after the join and prunes the fact side") {
    import org.apache.spark.sql.functions._
    val res = ScaleOps.x24BloomJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_totalprice") > 490000.0),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(max(col("o_totalprice")).as("p"),
        Det.dsum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(res == plain)
    // the bloom really prunes: rows surviving the pre-filter are a small
    // superset of true matches (fpp 1% on a ~2% selective build side)
    val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 490000.0)
    val bf = o.stat.bloomFilter("o_orderkey", 100000L, 0.01)
    val li = Tables.lineitem(spark, sf).select("l_orderkey").collect()
      .map(_.getLong(0))
    val kept = li.count(bf.mightContain)
    val trueMatch = {
      val keys = o.select("o_orderkey").collect().map(_.getLong(0)).toSet
      li.count(keys)
    }
    assert(kept >= trueMatch)
    assert(kept <= trueMatch + (li.length * 0.02).toInt + 10,
      s"bloom pruned too little: kept=$kept true=$trueMatch of ${li.length}")
  }

  test("s15 manifest prune: skips files, result equals the unpruned box aggregate") {
    import org.apache.spark.sql.functions._
    val res = ScaleOps.s15ManifestPrune(spark, sf).collect()
    assert(res.forall(_.getAs[Boolean]("files_skipped")),
      "z-layout should let the manifest skip at least one file")
    val viaManifest = res.map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val unpruned = ScaleOps.x26ZorderLayout(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(viaManifest == unpruned)
  }

  test("x28 salted join equals direct aggregation and avoids broadcast") {
    import org.apache.spark.sql.functions._
    val salted = ScaleOps.x28SaltedJoin(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice")).as("s"))
      .collect()
      .map(r => s"desc_${r.getString(0)}" -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == direct)
    val plan = ScaleOps.x28SaltedJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected the pinned shuffle-hash join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "broadcast would dodge the skew instead of handling it")
  }

  test("x26 z-order: interleave matches reference bits and layout tightens file bounds") {
    import org.apache.spark.sql.functions._
    // reference Morton implementation on sample points
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val pts = Seq((0L, 0L), (255L, 255L), (1L, 0L), (0L, 1L), (170L, 85L), (37L, 201L))
    import spark.implicits._
    val got = pts.toDF("xb", "yb")
      .withColumn("z", expr(ScaleOps.zInterleaveSql("xb", "yb")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) => assert(got((x, y)) == morton(x, y), s"($x,$y)") }
    // semantics: the boxed aggregate over the layout equals the base table
    val viaLayout = ScaleOps.x26ZorderLayout(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val base = Tables.orders(spark, sf)
      .withColumn("xb", pmod(col("o_custkey"), lit(256L)))
      .withColumn("yb", floor(col("o_totalprice") / 2000.0).cast("long"))
      .filter(col("xb").between(32L, 95L) && col("yb").between(64L, 159L))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("rev"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(viaLayout == base)
    // clustering quality: per-file xb bounding boxes must be tighter than
    // the full 0..255 domain for most files (that's what enables 2-D
    // row-group pruning on a non-leading column)
    val dir = Tables.scratchDir("x26_zorder", sf)
    val widths = spark.read.parquet(dir)
      .select(col("xb"), input_file_name().as("f"))
      .groupBy(col("f")).agg((max(col("xb")) - min(col("xb"))).as("w"))
      .collect().map(_.getAs[Long]("w"))
    assert(widths.length > 1, "expected multiple files from range partitioning")
    assert(widths.count(_ < 200L) >= widths.length / 2,
      s"z-layout should tighten xb ranges, got widths ${widths.mkString(",")}")
  }
}
