package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{GroupTopK, GroupTopKExec}

class GroupTopKSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = flattenPlan(p)

  test("equals the window-function formulation on orders") {
    val base = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val custom = GroupTopK(base, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val reference = base
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .drop("rn")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(custom.toSeq == reference.toSeq)
  }

  test("plans as partial + exchange + final, with the exchange between") {
    val df = GroupTopK(
      Tables.orders(spark, sf).select(col("o_custkey"), col("o_totalprice"),
        col("o_orderkey")),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    df.count() // finalize AQE so the executed plan is concrete
    val nodes = flatten(df.queryExecution.executedPlan)
    val execs = nodes.collect { case e: GroupTopKExec => e }
    assert(execs.map(_.partial).sorted == Seq(false, true),
      s"expected one partial and one final GroupTopKExec, got $execs")
    // the exchange must sit between the two (map-side prune THEN shuffle):
    // walking down from the final exec reaches a shuffle before the partial
    val fin = execs.find(!_.partial).get
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    def pathToPartial(p: SparkPlan): Seq[SparkPlan] = p match {
      case e: GroupTopKExec if e.partial => Seq(p)
      case _ => kids(p).map(pathToPartial).find(_.nonEmpty)
        .map(p +: _).getOrElse(Nil)
    }
    val spine = pathToPartial(fin)
    assert(spine.exists(_.isInstanceOf[ShuffleExchangeLike]),
      s"no exchange between final and partial:\n${spine.mkString("\n")}")
  }

  test("partial pass prunes to at most groups x k rows per partition") {
    import spark.implicits._
    // 4 groups x 2500 rows across 4 partitions; k=2 => partial output
    // per partition <= 4 x 2 = 8, so the exchange sees <= 32 of 10000
    val data = (0 until 10000).map(i => (i % 4, i)).toDF("g", "v")
      .repartition(4)
    val topk = GroupTopK(data, Seq("g"), Seq(("v", true)), 2)
    topk.count()
    val nodes = flatten(topk.queryExecution.executedPlan)
    val partialRows = nodes.collect {
      case e: GroupTopKExec if e.partial => e
    }.head.execute().mapPartitions(it => Iterator.single(it.size)).collect()
    assert(partialRows.forall(_ <= 8),
      s"partial partition emitted more than groupsxk: ${partialRows.toSeq}")
    // and the overall answer is the global per-group minimum pair
    val got = topk.orderBy("g", "v").collect().map(r => (r.getInt(0), r.getInt(1)))
    val want = (0 until 4).flatMap(g => Seq((g, g), (g, g + 4)))
    assert(got.toSeq == want)
  }

  test("adversarial group cardinality: live-group cap falls back to pass-through, answer unchanged") {
    import spark.implicits._
    // 1000 groups x 10 rows, but the map side may only track 4 live
    // groups: everything else must stream through unpruned and the final
    // stage still produces the exact per-group minimum
    val data = (0 until 10000).map(i => (i % 1000, i)).toDF("g", "v")
      .repartition(4)
    val prev = spark.conf.getOption("spark.graft.topk.maxLiveGroups")
    try {
      spark.conf.set("spark.graft.topk.maxLiveGroups", "4")
      val topk = GroupTopK(data, Seq("g"), Seq(("v", true)), 1)
      topk.count()
      val got = topk.orderBy("g").collect().map(r => (r.getInt(0), r.getInt(1)))
      assert(got.toSeq == (0 until 1000).map(g => (g, g)))
      // the fallback really engaged: with only 4 tracked groups per
      // partition, the exchange input far exceeds the groups x k bound a
      // fully-heaped pass would produce (1000 x 1), yet stays finite
      val partialOut = flatten(topk.queryExecution.executedPlan).collect {
        case e: GroupTopKExec if e.partial => e
      }.head.execute().count()
      assert(partialOut > 1000L,
        s"expected pass-through rows beyond groupsxk, got $partialOut")
      // and map memory was bounded: tracked groups emit exactly k rows,
      // so output < input (the 4 x (10-1) pruned rows per partition)
      assert(partialOut < 10000L, s"no pruning at all: $partialOut")
    } finally {
      spark.conf.unset("spark.graft.topk.maxLiveGroups")
      prev.foreach(spark.conf.set("spark.graft.topk.maxLiveGroups", _))
    }
    // default cap (65536) keeps the fully-heaped behavior on normal data
    val normal = GroupTopK(data, Seq("g"), Seq(("v", true)), 1)
    assert(normal.count() == 1000L)
  }

  test("window-idiom rewrite: row_number <= k + drop plans through GroupTopKExec") {
    // forked session: suites share one SparkSession, and the rewrite
    // must not silently re-plan other tests' window queries
    val s = Tables.tune(spark.newSession())
    graft.plans.GroupTopK.installRewrite(s)
    val base = Tables.orders(s, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    def idiom = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    // the rewrite fired: the plan carries the partial+final exec pair
    val df = idiom
    df.count()
    val execs = flatten(df.queryExecution.executedPlan)
      .collect { case e: GroupTopKExec => e }
    assert(execs.map(_.partial).sorted == Seq(false, true),
      s"rewrite did not fire: $execs")
    // and the results equal the un-rewritten window formulation
    val got = idiom.orderBy(col("o_custkey"), col("o_totalprice").desc,
      col("o_orderkey")).collect()
    val want = GroupTopK(base, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(got.toSeq == want.toSeq)
    // guards: rank() ties are NOT take-k — left untouched
    val ranked = base.withColumn("r", rank().over(w))
      .filter(col("r") <= 3).drop("r")
    ranked.count()
    assert(flatten(ranked.queryExecution.executedPlan)
      .collect { case e: GroupTopKExec => e }.isEmpty,
      "rank() variant must not rewrite")
    // guards: a projection that KEEPS rn is schema-bearing — untouched
    val keepsRn = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"))
    keepsRn.count()
    assert(flatten(keepsRn.queryExecution.executedPlan)
      .collect { case e: GroupTopKExec => e }.isEmpty,
      "rn-keeping variant must not rewrite")
    // rn = 1 (latest-per-key idiom) rewrites with k = 1
    val top1 = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(top1.count() == base.select("o_custkey").distinct().count())
    assert(flatten(top1.queryExecution.executedPlan)
      .collect { case e: GroupTopKExec => e }.nonEmpty,
      "top-1 idiom should rewrite")
  }

  test("ties, k larger than group, and single-row groups") {
    import spark.implicits._
    // group 0: 5 equal-order rows disambiguated by the tie-break column
    // group 1: 1 row; k=3 takes all of it
    val df = Seq((0, 10, 1), (0, 10, 2), (0, 10, 3), (0, 10, 4), (0, 10, 5),
      (1, 7, 9)).toDF("g", "score", "id")
    val got = GroupTopK(df, Seq("g"), Seq(("score", false), ("id", true)), 3)
      .orderBy("g", "id").collect().map(r => (r.getInt(0), r.getInt(2)))
    assert(got.toSeq == Seq((0, 1), (0, 2), (0, 3), (1, 9)))
  }
}
