package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.PlanLint

class PlanLintSpec extends SparkSpec {

  test("flags a cartesian product between non-broadcastable sides") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the cross join cannot degrade into a
      // (legitimate) broadcast nested loop
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bad = Tables.orders(spark, sf)
        .crossJoin(Tables.lineitem(spark, sf).select(col("l_orderkey").as("k")))
      assert(PlanLint.lint(bad).exists(_.rule == "cartesian-product"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // a bounded-dim cross join broadcasts: that is the plan we want
    val ok = Tables.region(spark, sf).crossJoin(
      Tables.nation(spark, sf).select(col("n_nationkey")))
    assert(!PlanLint.lint(ok).exists(_.rule == "cartesian-product"))
  }

  test("flags a single-partition window") {
    val bad = spark.range(100)
      .withColumn("rn", row_number().over(Window.orderBy("id")))
    assert(PlanLint.lint(bad).exists(_.rule == "single-partition-window"))
    val good = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy("ts")))
    assert(!PlanLint.lint(good).exists(_.rule == "single-partition-window"))
    // a LIMIT below bounds the window input by construction (top-k
    // report frames — x62's cumulative share), so no finding
    val bounded = spark.range(100000).orderBy(col("id").desc).limit(20)
      .withColumn("rn", row_number().over(Window.orderBy("id")))
    assert(!PlanLint.lint(bounded).exists(_.rule == "single-partition-window"))
  }

  test("flags a cast-blocked filter that never reached the parquet reader") {
    // the classic accidental pushdown killer: comparing a numeric column
    // as a string defeats filter translation entirely
    val bad = Tables.documents(spark, sf)
      .filter(col("n_chars").cast("string") > "100")
    assert(PlanLint.lint(bad).exists(_.rule == "unpushed-parquet-filter"))
    // the same predicate typed correctly pushes and is clean
    val good = Tables.documents(spark, sf).filter(col("n_chars") > 100)
    assert(!PlanLint.lint(good).exists(_.rule == "unpushed-parquet-filter"))
    // a computed-column filter CANNOT push — that is normal, not a finding
    val computed = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 3)
    assert(!PlanLint.lint(computed).exists(_.rule == "unpushed-parquet-filter"))
  }

  test("flags a pinned broadcast of an unbounded relation") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      val bad = Tables.orders(spark, sf).join(
        broadcast(Tables.lineitem(spark, sf)),
        col("o_orderkey") === col("l_orderkey"))
      assert(PlanLint.lint(bad).exists(_.rule == "oversized-broadcast"))
      // broadcasting an AGGREGATE of the same big table is bounded by
      // group cardinality — a deliberate choice, not a hazard
      val agg = Tables.lineitem(spark, sf)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val ok = Tables.orders(spark, sf).crossJoin(broadcast(agg))
      assert(!PlanLint.lint(ok).exists(_.rule == "oversized-broadcast"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("flags a bounded-domain window partition key (the round-3 x21 shape)") {
    // the OLD x21 plan: running sum partitioned by lang alone — 5 keys
    // forever, so at 100 TB the whole token stream funnels through 5 tasks
    val old = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("end_tok", sum(col("n_tokens")).over(
        Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(PlanLint.lowCardWindowKeys(old, minKeys = 8)
      .exists(_.rule == "low-cardinality-window-key"))
    // the FIXED x21: (lang, content-hash shard) fans out to ~78 streams
    // at sf0.001 — clean even at the stricter production threshold
    val fixed = graft.operators.PipelineOps.x21PackSequences(spark, sf)
    assert(PlanLint.lowCardWindowKeys(fixed, minKeys = 32).isEmpty)
    // row_number over a bounded key is ALSO fixable (decompose into a
    // tie window + cumulative counts — x31/x39's fix): the OLD x39
    // shape, ranking each whole shard in one window task, must fire
    val oldX39 = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"),
        (Det.md5Bucket(col("text"), 1) % 8).cast("int").as("shard"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))))
    assert(PlanLint.lowCardWindowKeys(oldX39, minKeys = 9)
      .exists(_.rule == "low-cardinality-window-key"))
    // the decomposed x39 is clean even at the production threshold
    assert(PlanLint.lowCardWindowKeys(
      graft.operators.CurationOps.x39TrainShards(spark, sf), minKeys = 32).isEmpty)
    // the whole rank family is fixable by the same identity: a bare
    // rank() over the bounded language key must fire too
    val oldRank = Tables.documents(spark, sf)
      .withColumn("r", rank().over(
        Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))))
    assert(PlanLint.lowCardWindowKeys(oldRank, minKeys = 8)
      .exists(_.rule == "low-cardinality-window-key"))
    // w8's percent_rank/cume_dist/nth_value are now DECOMPOSED (tie
    // window + cumulative counts + broadcast totals): clean by plan
    // shape, not by exemption
    val ranks = graft.operators.Windows.w8Distribution(spark, sf)
    assert(PlanLint.lowCardWindowKeys(ranks, minKeys = 8).isEmpty)
    // an aggregate window over a bounded key IS fine below an aggregate
    // that bounds the input (group cardinality caps the partition size)
    val bounded = Tables.documents(spark, sf)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      .withColumn("running", sum(col("n")).over(
        Window.partitionBy(col("lang")).orderBy(col("source"))))
    assert(PlanLint.lowCardWindowKeys(bounded, minKeys = 8).isEmpty)
  }

  test("flags a pairwise self-equi-join with a hot key (the unguarded x33 shape)") {
    // 100 docs sharing one boilerplate 11-word run put 100 rows on one
    // winnowing fingerprint: the unguarded pairwise join is 100x100 in
    // that bucket — the x33 class the rule exists for
    import spark.implicits._
    val boiler = (0 until 11).map(i => s"bp$i").mkString(" ")
    val docs = (0 until 100).map(i =>
        (i.toLong, s"u${i}a u${i}b u${i}c $boiler u${i}d u${i}e"))
      .toSeq.toDF("doc_id", "text")
    val fps = graft.operators.TextIndexOps.winnowFps(docs)
    val unguarded = fps.as("a").join(fps.as("b"),
      col("a.fp") === col("b.fp") && col("a.doc_id") =!= col("b.doc_id"))
    assert(PlanLint.selfJoinHotKeys(unguarded, maxGroup = 64)
      .exists(_.rule == "self-join-hot-key"))
    // the guarded x33 passes BY CONSTRUCTION: the tail filter caps every
    // fingerprint bucket at the threshold before the join
    val guarded = graft.operators.TextIndexOps.x33WinnowOver(docs, 8L)
    assert(PlanLint.selfJoinHotKeys(guarded, maxGroup = 8).isEmpty)
    // the rule is threshold-relative: the same join under a bound the
    // hottest bucket fits (100 <= 128) stays quiet — legitimate
    // candidate-pairing joins with small buckets never fire
    assert(PlanLint.selfJoinHotKeys(unguarded, maxGroup = 128).isEmpty)
  }

  test("sweep: every batch contract query lints clean (static rules + window-key cardinality + self-join hot keys)") {
    // ONE construction pass: several contract queries perform writes /
    // LSH materialization when their frame is built, so constructing the
    // inventory twice (once per rule) would double the slowest work
    val skipped = (name: String) => name.startsWith("st") // streaming replays
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skipped)
      .flatMap { name =>
        val findings =
          try {
            val df = SparkEntry.queries(name)(spark, sf)
            PlanLint.lint(df) ++ PlanLint.lowCardWindowKeys(df, minKeys = 8) ++
              PlanLint.selfJoinHotKeys(df, maxGroup = 64)
          } catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        findings.map(f => s"$name -> $f")
      }
    assert(offenders.isEmpty, s"\nscale lint failures:\n${offenders.mkString("\n")}")
  }

  test("oracle SQL sanity: every contract query resolves, no oracle " +
      "text is null or carries a Scala-null concat (the Scala object " +
      "forward-val-initialization hazard the round-11 module split hit)") {
    // a forward reference between vals in one object initializes to
    // null and string-concats as the literal "null" — every real
    // oracle spells NULL uppercase, so lowercase "null" is the bug
    val bareNull = "(?<![A-Za-z_])null(?![A-Za-z_])".r
    SparkEntry.oracleSql.foreach { case (key, sql) =>
      assert(sql != null, s"$key oracle is null")
      assert(bareNull.findFirstIn(sql).isEmpty,
        s"$key oracle carries a bare lowercase 'null' (forward-val " +
          s"concat?): ${sql.take(120)}")
    }
    // every oracle key has a query; queries without oracle are the
    // documented rows-only set
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
  }

  test("module registries are pairwise key-disjoint — a duplicate key " +
      "across theme modules would silently shadow an operator in the " +
      "Map ++ concatenation") {
    import graft.operators._
    val modules: Seq[(String, Map[String, _], Map[String, String])] = Seq(
      ("Core", Core.queries, Core.oracles),
      ("Aggs", Aggs.queries, Aggs.oracles),
      ("Joins", Joins.queries, Joins.oracles),
      ("SetOps", SetOps.queries, SetOps.oracles),
      ("Windows", Windows.queries, Windows.oracles),
      ("Scalars", Scalars.queries, Scalars.oracles),
      ("TextOps", TextOps.queries, TextOps.oracles),
      ("Dedup", Dedup.queries, Dedup.oracles),
      ("SimSearch", SimSearch.queries, SimSearch.oracles),
      ("Multimodal", Multimodal.queries, Multimodal.oracles),
      ("ScaleOps", ScaleOps.queries, ScaleOps.oracles),
      ("SqlSurface", SqlSurface.queries, SqlSurface.oracles),
      ("GraphOps", GraphOps.queries, GraphOps.oracles),
      ("Dml", Dml.queries, Dml.oracles),
      ("Clustering", Clustering.queries, Clustering.oracles),
      ("AuditOps", AuditOps.queries, AuditOps.oracles),
      ("BasketOps", BasketOps.queries, BasketOps.oracles),
      ("WarehouseOps", WarehouseOps.queries, WarehouseOps.oracles),
      ("CurationOps", CurationOps.queries, CurationOps.oracles),
      ("StorageOps", StorageOps.queries, StorageOps.oracles),
      ("StatsOps", StatsOps.queries, StatsOps.oracles),
      ("EvalOps", EvalOps.queries, EvalOps.oracles),
      ("EventOps", EventOps.queries, EventOps.oracles),
      ("TextIndexOps", TextIndexOps.queries, TextIndexOps.oracles),
      ("EmbedOps", EmbedOps.queries, EmbedOps.oracles),
      ("PipelineOps", PipelineOps.queries, PipelineOps.oracles),
      ("PrivacyOps", PrivacyOps.queries, PrivacyOps.oracles),
      ("Subqueries", Subqueries.queries, Subqueries.oracles),
      ("Streams", graft.streaming.Streams.queries,
        graft.streaming.Streams.oracles))
    def checkDisjoint(kind: String, maps: Seq[(String, Set[String])]): Unit = {
      val owners = scala.collection.mutable.Map.empty[String, String]
      maps.foreach { case (mod, keys) =>
        keys.foreach { k =>
          owners.get(k).foreach { prev =>
            fail(s"$kind key '$k' declared by both $prev and $mod") }
          owners(k) = mod
        }
      }
    }
    checkDisjoint("queries", modules.map { case (m, q, _) => (m, q.keySet) })
    checkDisjoint("oracles", modules.map { case (m, _, o) => (m, o.keySet) })
    // and the concatenation in SparkEntry loses nothing
    val declared = modules.map(_._2.size).sum
    assert(SparkEntry.queries.size == declared,
      s"SparkEntry.queries has ${SparkEntry.queries.size} keys but the " +
        s"modules declare $declared — a module is missing from the ++ chain")
  }
}
