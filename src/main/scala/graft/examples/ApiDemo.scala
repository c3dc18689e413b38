package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.{TextPipeline, VectorPipeline}

/** Usage example for the reusable library API: applies the pipeline
  * operators to frames with caller-chosen column names (nothing here
  * touches the test-corpus table loaders). Run:
  *   runMain graft.examples.ApiDemo
  */
object ApiDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // a corpus with custom column names (id/body, not doc_id/text)
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (200L, "the quick brown fox jumps over the lazy dog near the river bend"),
      (300L, "completely different content about spark query engines and plans"),
      (400L, "spark query engines compile plans into whole stage generated code")
    ).toDF("id", "body")

    // native codegen n-gram generator (UDTF): (pos, ngram) rows
    println("n-gram rows (WordNGrams generator):")
    TextPipeline.ngramRows(corpus, "id", "body", 3)
      .filter(col("doc_id") === 100L).show(3, false)

    val sh = TextPipeline.shingles(corpus, "id", "body", 3)
    val pairs = TextPipeline.nearDupPairs(sh, threshold = 0.5)
    println("near-dup pairs:")
    pairs.orderBy("doc_a").show(false)

    val (clusters, rounds) = TextPipeline.connectedComponentsWithRounds(pairs)
    println(s"clusters (converged in $rounds large/small-star rounds):")
    clusters.orderBy("doc_id").show(false)

    println("segment dedup (12-word segments, doc 200 shares doc 100's prefix):")
    TextPipeline.segmentDedup(corpus, "id", "body", 12)
      .orderBy("doc_id").show(false)

    println("overlapping chunks (8 tokens, stride 4):")
    TextPipeline.chunks(corpus, "id", "body", 8, 4)
      .filter(col("doc_id") === 100L).show(false)

    println("heavy hitters (Misra-Gries, k=4) over all corpus words:")
    corpus.select(explode(split(col("body"), " ")).as("w"))
      .agg(graft.functions.HeavyHittersAgg.heavyHitters(col("w"), 4).as("hh"))
      .select(explode(col("hh")).as("c")).select("c.item", "c.est").show(false)

    println("quality + tokens + fingerprint:")
    corpus.select(col("id"),
      TextPipeline.qualityScore(col("body")).as("quality"),
      TextPipeline.tokenCount(col("body")).as("tokens"),
      substring(TextPipeline.winnowingFingerprint(col("body"), 5), 1, 8).as("fp8"))
      .orderBy("id").show(false)

    // incremental dedup: a new shard probed against the corpus' LSH
    // band index (never probe x corpus)
    val incoming = Seq(
      (900L, "the quick brown fox jumps over the lazy dog near the river bank today")
    ).toDF("id", "body")
    println("incremental near-dups of the incoming shard vs the corpus:")
    TextPipeline.nearDupAgainstHashed(
        TextPipeline.shingleHashes(incoming, "id", "body", 3),
        TextPipeline.shingleHashes(corpus, "id", "body", 3),
        threshold = 0.4)
      .orderBy("doc_new", "doc_old").show(false)

    // planner rewrite: the standard row_number idiom plans through the
    // custom GroupTopK operator once installed on the session
    graft.plans.GroupTopK.installRewrite(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    println("first 2 n-grams per doc, window idiom -> GroupTopKExec:")
    val firstGrams = TextPipeline.ngramRows(corpus, "id", "body", 3)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).drop("rn")
    firstGrams.orderBy("doc_id", "pos").show(4, false)
    println(firstGrams.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("GroupTopK")).mkString("\n"))

    // pluggable tokenizer seam: token-space counting + chunking with a
    // pinned vocab (per-partition setup, columns preserved)
    val vocab = new graft.api.VocabTokenizer(
      spark.sparkContext.broadcast(Set("the", "quick", "spark")))
    println("vocab-tokenized (vocab word = 1 token, else <=4-char pieces):")
    TextPipeline.tokenize(corpus, "body", vocab)
      .select(col("id"), size(col("tokens")).as("n_tokens"),
        slice(col("tokens"), 1, 6).as("first6"))
      .orderBy("id").show(false)
    println("chunks in TOKEN space (tokenizer param, same schema):")
    TextPipeline.chunks(corpus, "id", "body", 8, 8, vocab)
      .filter(col("doc_id") === 100L).show(false)

    // real learned BPE: train merges on the corpus, tokenize with them
    val merges = TextPipeline.trainBpe(corpus, "body", 8)
    println(s"learned BPE merges: ${merges.mkString(" ")}")
    TextPipeline.tokenize(corpus, "body",
        new graft.api.BpeTokenizer(spark.sparkContext.broadcast(merges)))
      .select(col("id"), size(col("tokens")).as("n_bpe_tokens"),
        slice(col("tokens"), 1, 8).as("first8"))
      .orderBy("id").show(false)

    // vectors with custom column names
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)), (4L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vid", "vec")
    println("top-2 neighbors per probe:")
    VectorPipeline.topKCosine(vecs, vecs.filter(col("vid") <= 2), "vid", "vec", 2)
      .orderBy("probe_id", "rank").show(false)

    // banded near-dedup: vec 2 is a 1-of-3-dim edit of vec 1, so the
    // untouched sub-vector bands pair them without any cross join
    println("banded near-dup pairs (exact sub-vector bands + verify):")
    val nearVecs = Seq(
      (1L, Array(0.6f, 0.8f, 0.0f, 0.0f)), (2L, Array(0.6f, 0.8f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.6f, 0.8f))
    ).toDF("vid", "vec")
    VectorPipeline.bandedCosinePairs(nearVecs, "vid", "vec",
        threshold = 0.9, numBands = 4, dims = 4)
      .orderBy("id_a", "id_b").show(false)

    // exact prefix-filter Jaccard join on the same custom-named corpus
    println("exact Jaccard pairs (prefix filter, t=0.4):")
    TextPipeline.prefixJaccardPairs(
        TextPipeline.shingleHashes(corpus, "id", "body", 3), 0.4)
      .orderBy("doc_a", "doc_b").show(false)

    // corpus-LM scoring: docs 100/200 share most bigrams -> high lp
    println("corpus-LM bigram scores (higher = more corpus-typical):")
    TextPipeline.lmScore(corpus, "id", "body").orderBy("doc_id").show(false)

    // product quantization on a custom-named 8-dim embedding frame:
    // train once, ADC-search and exact-rerank from the same model
    val r = new scala.util.Random(7)
    val pqVecs = (0 until 40).map { i =>
      val raw = Array.fill(8)(r.nextDouble().toFloat * 2 - 1)
      val n = math.sqrt(raw.map(x => x * x).sum).toFloat
      (i.toLong, raw.map(_ / n))
    }.toDF("vid", "vec")
    val model = VectorPipeline.pqTrain(pqVecs, "vid", "vec",
      numSub = 4, numCodes = 8, iters = 2, dims = 8)
    println("PQ/ADC top-3 (codes-table scan only):")
    VectorPipeline.pqAdcTopK(model, pqVecs.filter(col("vid") < 2),
        "vid", "vec", k = 3)
      .orderBy("probe_id", "rank").show(false)
    println("PQ shortlist + exact re-rank top-3:")
    VectorPipeline.pqRerankTopK(model, pqVecs,
        pqVecs.filter(col("vid") < 2), "vid", "vec",
        k = 3, shortlist = 10)
      .orderBy("probe_id", "rank").show(false)

    // MMR diversified re-rank over a shortlist: vec 2 is near-identical
    // to vec 1, so plain top-2 returns (1, 2) but MMR swaps in the
    // orthogonal vec 3 at rank 2
    println("MMR re-rank (lambda=0.5, k=2) vs plain top-2:")
    val shortlist = VectorPipeline
      .topKCosine(vecs, vecs.filter(col("vid") === 1), "vid", "vec", 3)
      .join(vecs.select(col("vid").as("neighbor_id"), col("vec")),
        "neighbor_id")
      .select(col("probe_id"), col("neighbor_id"), col("sim"), col("vec"))
    VectorPipeline.mmrRerank(shortlist, 0.5, 2)
      .orderBy("probe_id", "sel_rank").show(false)

    // fuzzy entity resolution on custom-named frames: guaranteed-recall
    // deletion-neighborhood blocking + exact levenshtein verify
    println("fuzzy ER join (edit distance <= 1):")
    graft.operators.TextIndexOps.fuzzyJoinDist1(
        Seq((1L, "acme corp"), (2L, "globox inc")).toDF("dirty_key", "dirty_name"),
        Seq((10L, "acme corp."), (20L, "globex inc"), (30L, "initech"))
          .toDF("clean_key", "clean_name"))
      .orderBy("dirty_key").show(false)

    // co-occurrence pairs with the hot-basket guard
    println("basket co-occurrence (cap excludes no basket here):")
    graft.operators.BasketOps.coOccurrencePairs(
        Seq(("b1", "x"), ("b1", "y"), ("b2", "x"), ("b2", "y"), ("b2", "z"))
          .toDF("basket", "item"), basketCap = 50, minBaskets = 2L)
      .orderBy("part_a").show(false)

    // distributed global cumulative sum (no single-partition window)
    println("distributed cumulative sum over a custom frame:")
    graft.operators.Windows.distributedCumSum(
        Seq((1, BigDecimal(10)), (2, BigDecimal(5)), (3, BigDecimal(7)))
          .toDF("t", "amt")
          .select(col("t"), col("amt").cast("decimal(18,4)").as("amt")),
        col("t"), col("amt"), 2)
      .orderBy("k").show(false)

    // PQ model persistence: save, reload, serve — codebooks survive the
    // parquet round-trip value-identical (round 8)
    val pqDir = graft.Tables.scratchDir("apidemo_pq", "demo")
    VectorPipeline.savePqModel(model, pqDir)
    println("PQ/ADC top-3 from the RELOADED model (same answer):")
    VectorPipeline.pqAdcTopK(VectorPipeline.loadPqModel(spark, pqDir),
        pqVecs.filter(col("vid") < 2), "vid", "vec", k = 3)
      .orderBy("probe_id", "rank").show(false)

    // binary quantization: sign signatures + hamming shortlist + exact
    // rerank on the custom-named frame (round 8)
    println("binary-quant top-2 (8 bytes/vector shortlist scan):")
    VectorPipeline.binaryHammingTopK(pqVecs,
        pqVecs.filter(col("vid") < 2), "vid", "vec", k = 2, shortlist = 6)
      .orderBy("probe_id", "rank").show(false)

    // graph analytics on an arbitrary edge frame, through the public
    // column-name-parameterized graft.api.Graph kernels (round 10)
    import graft.api.Graph
    println("PageRank on a 4-node path graph (ends tie, middles lead):")
    val sc = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("from", "to")
    val es = sc.unionByName(
      sc.select(col("to").as("from"), col("from").as("to")))
    Graph.pageRank(es, "from", "to", iters = 5)
      .orderBy(col("rank").desc, col("node")).show(false)
    println("triangle census of K4 (4 triangles, coefficient 1.0):")
    Graph.triangleCensus(
      (for { i <- 0 until 4; j <- (i + 1) until 4 }
        yield (i.toLong, j.toLong)).toDF("lo", "hi"), "lo", "hi")
      .show(false)
    println("HITS hubs/authorities on a 2-hub bipartite graph:")
    Graph.hits(Seq(("h1", "p1"), ("h1", "p2"), ("h2", "p2"))
      .toDF("linker", "page"), "linker", "page", rounds = 3)
      .orderBy(col("kind"), col("score").desc, col("node")).show(false)
    println("label-propagation communities on two bridged triangles:")
    val bridged = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
    val comm = Graph.labelPropagation(bridged, "u", "v", rounds = 3)
    comm.orderBy(col("node")).show(false)
    println("modularity of those communities (global row first):")
    Graph.modularity(bridged, "u", "v", comm, "node", "lbl").show(false)
    println("connected components of the bridged triangles (one " +
      "component) vs with the bridge removed (two):")
    Graph.connectedComponents(bridged, "u", "v")
      .orderBy(col("doc_id")).show(false)
    Graph.connectedComponents(
        bridged.filter(!(col("u") === 3L && col("v") === 4L)), "u", "v")
      .orderBy(col("doc_id")).show(false)

    // containment guard visibility (round 8): the stop set is DATA
    println("containment pairs + stop-token count (t=0.4):")
    val cd = TextPipeline.containmentPairsDetail(
      TextPipeline.shingleHashes(corpus, "id", "body", 3), 0.4)
    cd.pairs.orderBy("doc_src", "doc_sup").show(false)
    println(s"stop tokens excluded by the hot-token cap: ${cd.stopTokens.count()}")

    // KMV sketches: distinct-set overlap from two bounded sketches
    val skA = graft.operators.AuditOps.kmvSketch(
      (1 to 400).toDF("k"), col("k"), 64)
    val skB = graft.operators.AuditOps.kmvSketch(
      (201 to 600).toDF("k"), col("k"), 64)
    val (estU, estI) = graft.operators.AuditOps.kmvEstimates(skA, skB, 64)
    println(f"KMV overlap estimate: union ~ $estU%.0f (true 600), " +
      f"intersection ~ $estI%.0f (true 200)")

    // round-9 additions ------------------------------------------------

    println("k-means (k=2) on two planted blobs — custom column names:")
    val blobs = (0 until 12).map { i =>
      val a = Array.fill(64)(0.0f); a(i % 2) = 1.0f
      a(20 + i % 3) = 0.02f * (i % 3)
      (i.toLong, a.toSeq)
    }.toDF("row_id", "features")
    graft.operators.Clustering.kmeans(blobs, "row_id", "features",
      k = 2, iters = 2).show(false)

    // round-10: the semantic-curation ladder on caller-shaped frames
    println("simplified silhouette of those blobs (both clusters ~1):")
    graft.operators.Clustering.silhouette(blobs, "row_id", "features",
      k = 2, iters = 2).show(false)
    println("SemDeDup pair stage: near-dups pair ONLY within a cluster:")
    val clustered = blobs.join(
      graft.operators.Clustering.kmeansAssignments(blobs, "row_id",
        "features", k = 2, iters = 2)
        .withColumnRenamed("vid", "row_id"), "row_id")
    VectorPipeline.groupedCosinePairs(clustered, "row_id", "features",
        "cluster", 0.95)
      .orderBy("id_a", "id_b").show(5, truncate = false)

    println("SSSP (4 rounds) from node 'a' on a path graph:")
    Graph.sssp(
        Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("step_from", "step_to"),
        "step_from", "step_to", "a", 4)
      .orderBy("dist").show(false)

    println("2-core of a triangle with a pendant chain:")
    Graph.kCore(
        Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v"),
        "u", "v", k = 2, rounds = 3).show(false)

    println("row-level SQL through the graft DSv2 catalog:")
    spark.conf.set("spark.sql.catalog.demo",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.demo.base",
      s"${sys.props("java.io.tmpdir")}/graft_apidemo_cat")
    spark.sql("DROP TABLE IF EXISTS demo.events")
    corpus.select(col("id"), length(col("body")).as("n_chars"))
      .createOrReplaceTempView("demo_src")
    spark.sql("CREATE TABLE demo.events AS SELECT * FROM demo_src")
    spark.sql("DELETE FROM demo.events WHERE n_chars < 63")
    spark.sql("SELECT * FROM demo.events ORDER BY id").show(false)
    spark.sql("DROP TABLE demo.events")

    // --- Analytics kernels on caller-shaped frames -------------------
    import graft.api.Analytics

    println("Kaplan-Meier survival (subscription days, churn flag):")
    Analytics.kmSurvival(
      Seq((5L, 1), (5L, 1), (5L, 0), (9L, 1), (12L, 0))
        .toDF("dur", "churned"), "dur", "churned").show(false)

    println("Holt forecast over a short trending series:")
    Analytics.holtForecast(
      (1 to 12).map(i => (i.toLong, 100.0 * i + 40))
        .toDF("t", "metric"), "t", "metric",
      alpha = 0.3, beta = 0.1, horizon = 3).show(false)

    println("Shapley credit for two channels (ads=1, email=2):")
    Analytics.shapleyFromMasks(
      Seq((0L, 2L), (1L, 5L), (2L, 3L), (3L, 6L)).toDF("m", "cnt"),
      Seq(("ads", 1L), ("email", 2L))).show(false)

    println("exact AUC/Gini for a bucketed score vs a binary label:")
    Analytics.aucGini(
      Seq((900L, 1), (700L, 1), (600L, 0), (300L, 0), (100L, 0))
        .toDF("score", "label"), "score", "label").show(false)

    println("streaks (user activity days):")
    Analytics.streaks(
      Seq((7L, 10L), (7L, 11L), (7L, 12L), (7L, 20L), (8L, 10L))
        .toDF("uid", "d"), "uid", "d")
      .orderBy(col("k"), col("start_day")).show(false)

    println("key-skew report on a string-keyed clickstream:")
    Analytics.skewReport(
      Seq("home", "home", "home", "cart", "pay", "pay")
        .toDF("page"), "page").show(false)

    println("join-explosion preflight (sessions x clicks on visitor):")
    Analytics.joinPreflight(
      Seq(("v1", 1), ("v1", 2), ("v2", 3)).toDF("visitor", "s"), "visitor",
      Seq(("v1", 10), ("v1", 11), ("v1", 12), ("v3", 13))
        .toDF("visitor", "c"), "visitor").show(false)

    // --- Curation kernels (round 11): the semantic-curation ladder on
    // caller-shaped frames -------------------------------------------
    import graft.api.Curation

    // two blobs + one exact-duplicate pair inside the first blob
    val curVecs = ((0 until 10).map { i =>
      val a = Array.fill(64)(0.0f); a(i % 2) = 1.0f
      a(30 + i % 5) = 0.03f * (i % 5)
      (i.toLong, a.toSeq)
    } :+ (10L, {
      val a = Array.fill(64)(0.0f); a(0) = 1.0f; a(30) = 0.0f
      a.toSeq // exact duplicate of row 0
    })).toDF("sample_id", "emb")
    println("SemDeDup verdicts (same-blob vectors are mutual near-dups " +
      "at t=0.95 -> only each blob's first id survives):")
    Curation.semDedup(curVecs, "sample_id", "emb",
        k = 2, iters = 2, threshold = 0.95)
      .orderBy(col("id")).show(false)
    println("incremental SemDeDup: a new shard probes the trained index:")
    Curation.semDedupIncremental(
        curVecs.filter(col("sample_id") < 10),
        curVecs.filter(col("sample_id") >= 10)
          .select((col("sample_id") + 100).as("sample_id"), col("emb")),
        "sample_id", "emb", k = 2, iters = 2, threshold = 0.95)
      .show(false)
    println("D4 pruning (drop the 40% most prototypical per cluster):")
    Curation.d4Prune(curVecs, "sample_id", "emb",
        k = 2, iters = 2, threshold = 0.95, dropFrac = 0.4)
      .orderBy(col("id")).show(false)
    println("cross-cluster recall guard (straddlers counted as data):")
    Curation.straddleGuard(curVecs, "sample_id", "emb",
      k = 2, iters = 2, threshold = 0.95).show(false)
    println("soft dedup weights from a near-dup label table:")
    Curation.softDedup(curVecs, "sample_id",
      Seq((0L, 0L), (10L, 0L)).toDF("member", "rep"),
      "member", "rep").orderBy(col("id")).show(false)
    println("DSIR importance weights (docs 100/300 are the target):")
    Curation.dsirWeights(corpus, "id", "body",
      corpus.filter(col("id") isin (100L, 300L)).select(col("id")),
      "id").orderBy(col("id")).show(false)
    println("CCNet perplexity tiers per language:")
    Curation.perplexityTiers(
        corpus.withColumn("tongue", lit("en")), "id", "body", "tongue")
      .orderBy(col("id")).show(false)

    // --- the transactional catalog (round 12): DML, concurrent
    // writers, time travel ---------------------------------------
    val warehouse = java.nio.file.Files
      .createTempDirectory("apidemo_warehouse").toFile
    spark.conf.set("spark.sql.catalog.demo",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.demo.base",
      warehouse.getAbsolutePath)
    spark.sql("CREATE TABLE demo.accounts AS " +
      "SELECT id AS acct, CAST(100 AS LONG) AS balance FROM range(0, 6)")
    spark.sql("UPDATE demo.accounts SET balance = balance + 50 " +
      "WHERE acct % 2 = 0")
    println("accounts after UPDATE (version 2):")
    spark.table("demo.accounts").orderBy("acct").show(false)

    // two writers race the same table; the loser's commit detects the
    // conflict and retryOnConflict re-runs it against the new snapshot
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def credit(amount: Int): Future[Unit] = Future {
      graft.sources.GraftTxn.retryOnConflict() {
        spark.sql("MERGE INTO demo.accounts t USING " +
          "(SELECT id AS acct FROM range(0, 6)) s ON t.acct = s.acct " +
          s"WHEN MATCHED THEN UPDATE SET balance = t.balance + $amount")
          .collect(): Unit
      }
    }
    Await.result(Future.sequence(Seq(credit(7), credit(11))), 120.seconds)
    println("after two CONCURRENT credits (+7 and +11, both exactly once):")
    spark.table("demo.accounts").orderBy("acct").show(false)

    println("time travel — version 1 (as created) vs current:")
    spark.sql("SELECT * FROM demo.accounts VERSION AS OF 1")
      .orderBy("acct").show(false)
    spark.sql("DROP TABLE demo.accounts")

    spark.stop()
  }
}
