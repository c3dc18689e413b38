package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.Dedup

class Extras8Spec extends SparkSpec {

  test("f23: Arrow batch seam matches a plain-DataFrame recompute " +
      "and really runs multiple batches") {
    val got = graft.operators.Scalars.f23ArrowBatches(spark, sf).collect()
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", ""))
          + 1).cast("long").as("n_ws_tokens"))
      .withColumn("score", least(lit(1.0), col("n_ws_tokens") / 50.0))
      .orderBy(col("doc_id")).collect()
    assert(got.length == want.length && got.length > 128,
      s"need > 1 batch at batchSize=128, got ${got.length} rows")
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1)
        && g.getDouble(2) == w.getDouble(2), s"$g vs $w")
    }
  }

  test("f23: empty-input partitions survive the Arrow path") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = org.apache.spark.sql.GraftArrow.mapInArrowBatches(
      empty, graft.operators.Scalars.f23ArrowBatches(spark, sf).schema, 16)((_, _) => 0)
    assert(out.count() == 0)
  }

  test("s22: the fact scan is pruned by a dynamicpruning subquery " +
      "and reads only the qualifying partitions") {
    val df = graft.operators.StorageOps.s22DynamicPartitionPrune(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("dynamicpruning"),
      "expected a dynamicpruning subquery on the partitioned fact scan")
    val factScans = flattenPlan(plan).collect {
      case s: FileSourceScanExec
          if s.relation.partitionSchema.fieldNames.contains("o_year") => s
    }
    assert(factScans.nonEmpty, "partitioned fact scan not found")
    // the staged layout holds 7 year partitions (1992..1998); the dim
    // filter qualifies only 1992..1994
    val partsRead = factScans.head.metrics("numPartitions").value
    assert(partsRead <= 3, s"DPP should read <= 3 partitions, read $partsRead")
  }

  test("x58: funnel stages are monotonically non-increasing and stage 0 " +
      "matches the corpus") {
    val rows = graft.operators.CurationOps.x58CurationFunnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("0_raw") == Tables.documents(spark, sf).count())
    assert(rows("0_raw") >= rows("1_lang"))
    assert(rows("1_lang") >= rows("2_length"))
    assert(rows("2_length") >= rows("3_dedup"))
    assert(rows("3_dedup") > 0)
  }

  test("x60: near-dup pairs never straddle splits (cluster atomicity)") {
    val split = graft.operators.CurationOps.x60LeakageSplit(spark, sf)
      .select(col("doc_id"), col("split"))
    val pairs = Dedup.nearDupPairsFrame(spark, sf)
    val straddle = pairs
      .join(split.select(col("doc_id").as("doc_a"),
        col("split").as("sa")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"),
        col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
    assert(straddle.count() == 0, "a near-dup pair crossed split lines")
    // and the split really partitions every document
    assert(split.count() == Tables.documents(spark, sf).count())
  }

  test("x61: novelty is 1.0 for the first doc and in [0,1] everywhere") {
    val rows = graft.operators.TextIndexOps.x61NgramNovelty(spark, sf).collect()
    assert(rows.head.getLong(0) == rows.map(_.getLong(0)).min)
    assert(rows.head.getDouble(3) == 1.0,
      "the earliest doc's shingles are all first-seen by definition")
    assert(rows.forall(r =>
      r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
  }

  test("x62: shares sum to 1 and cumulative share ends at 1") {
    val rows = graft.operators.CurationOps.x62MixtureReport(spark, sf).collect()
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"share sum $shareSum")
    assert(math.abs(rows.last.getDouble(4) - 1.0) < 1e-9)
    // cumulative share is non-decreasing in the emitted order
    val cums = rows.map(_.getDouble(4))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
  }

  test("a20: count-min estimates equal exact counts at this domain size") {
    val est = graft.operators.Aggs.a20CountMin(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sf).groupBy(col("o_orderpriority"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exact)
  }

  test("s23: parser modes agree on the planted-bad staging") {
    val r = graft.operators.StorageOps.s23CsvMalformed(spark, sf).collect()(0)
    val nNation = Tables.nation(spark, sf).count()
    assert(r.getLong(0) == nNation + 2)   // permissive keeps all lines
    assert(r.getLong(1) == nNation)       // dropmalformed keeps good only
    assert(r.getLong(2) == 2)             // both bad lines quarantined
    assert(r.getBoolean(3))               // failfast refuses the file
  }

  test("x63: containment pairs equal the brute-force directed recompute") {
    import graft.api.TextPipeline
    val sh = Dedup.shingleHashSet(spark, sf)
    val got = graft.operators.TextIndexOps.x63ContainmentJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val brute = sh.select(col("doc_id").as("doc_src"), col("ng_h"))
      .join(sh.select(col("doc_id").as("doc_sup"), col("ng_h").as("h2")),
        col("ng_h") === col("h2") && col("doc_src") =!= col("doc_sup"))
      .groupBy(col("doc_src"), col("doc_sup"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_src"),
        col("n_sh").as("ns")), "doc_src")
      .select(col("doc_src"), col("doc_sup"),
        (col("inter") / col("ns")).as("containment"))
      .filter(col("containment") > 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("x63b: hot containment tokens are stop-listed, reported, and the " +
      "cap bounds recall visibly") {
    import graft.api.TextPipeline
    import spark.implicits._
    // 30 docs all sharing one hot token; each doc also carries a unique
    // token. At t = 0.4 a 2-token src needs 1 shared token, so with the
    // hot token live every directed pair qualifies at containment 0.5.
    val sh = (0 until 30).flatMap(i =>
      Seq((i.toLong, 999L), (i.toLong, 1000L + i))).toDF("doc_id", "ng_h")
    val capped = TextPipeline.containmentPairsDetail(sh, 0.4,
      hotTokenCap = 10L)
    val stops = capped.stopTokens.collect()
    assert(stops.length == 1 && stops(0).getLong(0) == 999L &&
      stops(0).getLong(1) == 30L,
      "the hot token must be reported with its document frequency")
    assert(capped.pairs.count() == 0,
      "capped: every candidate path runs through the stop-listed token")
    val uncapped = TextPipeline.containmentPairsDetail(sh, 0.4,
      hotTokenCap = 1000L)
    assert(uncapped.pairs.count() == 30L * 29,
      "uncapped: all directed pairs at containment 1/2 > 0.4")
    // the contract corpus is below the cap: stop set empty, recall exact
    val contract = TextPipeline.containmentPairsDetail(
      Dedup.shingleHashSet(spark, sf), 0.8)
    assert(contract.stopTokens.count() == 0)
  }

  test("st20: observed metrics ride the replay with two data batches") {
    val r = graft.streaming.Streams.st20StreamingObserve(spark, sf)
      .collect()(0)
    val probe = Tables.documents(spark, sf).filter(col("doc_id") % 10 === 3)
    assert(r.getLong(0) == probe.count())
    assert(r.getLong(2) == 2, "two file-batches must report metrics")
  }

  test("st19: streaming survivors equal the one-shot batch result " +
      "and two micro-batches really ran") {
    val streamed = graft.streaming.Streams.st19StreamingDedup(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    // one-shot batch equivalent: probe docs minus x55 matches
    val sh = Dedup.shingleHashSet(spark, sf)
    val matched = graft.api.TextPipeline.prefixJaccardAgainst(
        sh.filter(col("doc_id") % 10 === 3),
        sh.filter(col("doc_id") % 10 =!= 3), 0.5)
      .select(col("doc_new")).distinct()
    val batch = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 3)
      .join(matched, col("doc_id") === col("doc_new"), "left_anti")
      .select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(streamed == batch)
    // the staged replay produced two appended batch ids
    val out = Tables.tune(spark).read
      .parquet(Tables.scratchDir("st19_out", sf))
    assert(out.select(col("batch_id")).distinct().count() == 2)
  }
}
