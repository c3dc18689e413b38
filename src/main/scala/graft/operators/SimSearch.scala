package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Det, Tables}
import graft.api.VectorPipeline

/** Similarity search over the embeddings table — SURVEY §2.8 L3 plus the
  * scale-path extras (cosine near-dup pairs, IVF-bucketed ANN). Thin
  * bindings of the reusable [[graft.api.VectorPipeline]] operators to the
  * test corpus.
  *
  * Vectors are unit-normalized (FIXTURES.md) so cosine ≡ dot product;
  * similarities round to 6 dp so the (order-sensitive, last-ulp)
  * summation agrees with the oracle's arbitrary-order SUM. Brute force is
  * the CORRECTNESS baseline; IVF is the 100 TB path.
  */
object SimSearch {

  /** round(Σ aᵢ·bᵢ, 6) via the native codegen DotProduct expression. */
  def dot6(a: Column, b: Column): Column = VectorPipeline.sim(a, b)

  /** Memoized exact top-5 frame — L3 emits it and the x8/x14 derived
    * claims compare against it; one brute-force pass per (session,
    * corpus) instead of three (see [[graft.Memo]]). */
  def exactTopK(spark: SparkSession, sfDir: String): DataFrame =
    graft.Memo(spark, s"l3exact:$sfDir") {
      val emb = Tables.embeddings(spark, sfDir)
      VectorPipeline.topKCosine(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", 5)
        .localCheckpoint(true)
    }

  /** L3 — brute-force top-5 cosine neighbors for each probe (vec_id<10),
    * ranked by rounded similarity with vec_id tie-break. */
  def l3TopKCosine(spark: SparkSession, sfDir: String): DataFrame =
    exactTopK(spark, sfDir).orderBy(col("probe_id"), col("rank"))

  /** X2 — exhaustive embedding-cosine pair audit (sim ≥ 0.45; the
    * corpus is near-orthogonal, max ambient pairwise ~0.5, so these ARE
    * ambient pairs — no pruning family can skip them, see
    * [[graft.api.VectorPipeline.blockedCosinePairs]]). Runs the
    * block-pair decomposition: same exhaustive result as the brute
    * CartesianProduct (spec pins equality), laid out as B(B+1)/2 even
    * equi-join tasks. The production near-dup TIER is x41's banded
    * pipeline; x2 is the audit-time exhaustive baseline it's measured
    * against. */
  def x2CosineNearDup(spark: SparkSession, sfDir: String): DataFrame =
    VectorPipeline.blockedCosinePairs(Tables.embeddings(spark, sfDir),
        "vec_id", "embedding", 0.45)
      .orderBy(col("id_a"), col("id_b"))

  /** X8 raw — IVF-style ANN neighbor lists (ScalaTest checks recall vs
    * L3): deterministic centroid seeds (every 50th vector), nprobe=3. */
  def x8IvfAnnRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    VectorPipeline.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        k = 5, nprobe = 3)
      .orderBy(col("probe_id"), col("rank"))
  }

  /** X8 contract — derived-claim form (see
    * [[graft.api.VectorPipeline.annClaim]]): the raw sketch result is
    * not SQL-expressible, so the contract row emits the verifiable
    * claims instead — recall@5 vs the exact in-Spark L3 result ≥ 0.2
    * and mean-sim ratio ≥ 0.8 (measured across SFs: recall 0.3–0.6,
    * ratio 0.88–0.92; bounds leave 1.5–4x margin). */
  def x8IvfAnn(spark: SparkSession, sfDir: String): DataFrame =
    VectorPipeline.annClaim(l3TopKCosine(spark, sfDir),
      x8IvfAnnRaw(spark, sfDir), k = 5,
      recallBound = Some(0.2), simRatioBound = 0.8)

  /** Memoized PQ model — x51 and x52 share one training run per
    * (session, corpus), the persisted-model shape a production pipeline
    * uses (train once, serve many query batches). [[graft.Memo]]'s
    * design, widened to the two-frame model; weak on the session so a
    * stopped session's checkpointed blocks can be collected. */
  private val pqModels =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, VectorPipeline.PqModel]]()

  private def pqModel(spark: SparkSession, sfDir: String): VectorPipeline.PqModel = {
    val perSession = pqModels.synchronized {
      var m = pqModels.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, VectorPipeline.PqModel]()
        pqModels.put(spark, m)
      }
      m
    }
    val hit = perSession.get(sfDir)
    if (hit != null) hit
    else {
      // Persisted-model tier (VERDICT r7 #7): the trained model lives
      // as parquet under the SHARED root (Tables.sharedDir — stable
      // across processes, fingerprint-named by the source corpus +
      // config) — a LATER SESSION loads the codebooks+codes instead of
      // re-running Lloyd iterations, making train-once/serve-many real
      // across sessions, not just a per-session memo. The build writes
      // into a process-unique temp dir and publishes with ONE atomic
      // rename (ADVICE r8: the old write-then-marker sequence left a
      // window where two concurrent JVMs could interleave the three
      // sub-writes under one validated marker); training then serves
      // from the published copy, so the load path is exercised on
      // every train.
      val fp = Tables.corpusFingerprint(sfDir, "embeddings") + ":16:32:4"
      val home = Tables.sharedDir("pq_model", sfDir, fp)
      val built = {
        if (!home.isDirectory) {
          val trained = VectorPipeline.pqTrain(
            Tables.embeddings(spark, sfDir), "vec_id", "embedding",
            numSub = 16, numCodes = 32, iters = 4)
          val tmp = Tables.sharedBuildDir(home)
          VectorPipeline.savePqModel(trained, tmp.getAbsolutePath)
          Tables.publishShared(tmp, home)
        }
        VectorPipeline.loadPqModel(spark, home.getAbsolutePath)
      }
      val prev = perSession.putIfAbsent(sfDir, built)
      if (prev != null) prev else built
    }
  }

  /** X51 raw — product-quantization ANN (Jégou TPAMI'11): 16 subspaces
    * × 32 codes trained with 4 deterministic Lloyd iterations on the
    * corpus itself, then asymmetric-distance top-5 for the same probes
    * as L3/X8. The scan side touches only the (vid, sub, code) table —
    * 16 small codes instead of 256 bytes of floats per vector (~16×) —
    * which is the memory story that makes exhaustive candidate scoring
    * feasible at 100 TB. Config chosen by measured sweep: 16×32 beats
    * 8×16 by ~2× recall at the same scan cost (finer subspaces matter
    * more than more codes on 64-dim near-orthogonal embeddings). */
  def x51PqAnnRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    VectorPipeline.pqAdcTopK(pqModel(spark, sfDir),
        emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
      .orderBy(col("probe_id"), col("rank"))
  }

  /** X51 contract — derived-claim form (same shape as X8): recall@5 vs
    * the exact L3 result ≥ 0.25 and mean-sim ratio ≥ 0.75 (measured
    * across SFs: recall 0.40–0.58, ratio 0.878–0.905 — 1.6×/1.17×
    * margin). */
  def x51PqAnn(spark: SparkSession, sfDir: String): DataFrame =
    VectorPipeline.annClaim(l3TopKCosine(spark, sfDir),
      x51PqAnnRaw(spark, sfDir), k = 5,
      recallBound = Some(0.25), simRatioBound = 0.75)

  /** X52 raw — two-stage retrieval: X51's PQ model shortlists 50
    * candidates per probe from the codes table, exact cosine re-ranks
    * them to top-5. */
  def x52PqRerankRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    VectorPipeline.pqRerankTopK(pqModel(spark, sfDir), emb,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, shortlist = 50)
      .orderBy(col("probe_id"), col("rank"))
  }

  /** X52 contract — derived-claim form: the re-rank lifts X51's raw-PQ
    * recall floor and reports EXACT sims (so the mean-sim ratio bound
    * tightens to 0.9). Measured across SFs: recall 0.84–0.98, ratio
    * 0.989–1.000 — bounds 0.5/0.9 keep ≥ 1.68×/1.1× margin. */
  def x52PqRerank(spark: SparkSession, sfDir: String): DataFrame =
    VectorPipeline.annClaim(l3TopKCosine(spark, sfDir),
      x52PqRerankRaw(spark, sfDir), k = 5,
      recallBound = Some(0.5), simRatioBound = 0.9)

  /** X14 raw — hyperplane-LSH ANN neighbor lists (approximate by
    * design): see [[graft.api.VectorPipeline.hyperplaneLshTopK]].
    * Multi-probe over 1-bit-flip buckets; exact rerank within
    * candidates. */
  def x14LshAnnRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    graft.api.VectorPipeline.hyperplaneLshTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      .orderBy(col("probe_id"), col("rank"))
  }

  /** X14 contract — derived-claim form (see
    * [[graft.api.VectorPipeline.annClaim]]): on this near-orthogonal
    * corpus the exact top-5 are statistically indistinguishable from
    * ranks 6..50, so set-recall is noise (measured 0.08–0.12) — the
    * meaningful, scale-stable claim is the mean-sim ratio of the
    * returned 5 vs the exact 5, bounded at 0.5 (measured 0.58–0.74
    * across SFs). No recall claim is stated. */
  def x14LshAnn(spark: SparkSession, sfDir: String): DataFrame =
    graft.api.VectorPipeline.annClaim(
      SimSearch.l3TopKCosine(spark, sfDir), x14LshAnnRaw(spark, sfDir),
      k = 5, recallBound = None, simRatioBound = 0.5)

  /** X67 — diversified top-k retrieval (label-quota form of
    * Carbonell/Goldstein's MMR): per probe, the top-5 cosine neighbors
    * subject to AT MOST 2 RESULTS PER LABEL — the "don't return five
    * copies of the same source" rule every retrieval endpoint applies.
    * Two bounded row_number windows (per (probe,label), then per
    * probe); Spark 4's WindowGroupLimit bounds both map-side. At scale
    * the candidate set is an ANN shortlist (x8/x51/x52) — per-probe
    * work stays O(shortlist); here candidates are exact brute force so
    * the oracle recomputes every similarity. */
  def x67DiversifiedTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val cand = emb
      .select(col("vec_id").as("neighbor_id"), col("label"), col("embedding"))
      .join(broadcast(probes), col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"), col("label"),
        SimSearch.dot6(col("pe"), col("embedding")).as("sim"))
    val wl = Window.partitionBy(col("probe_id"), col("label"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val wp = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand.withColumn("rnl", row_number().over(wl))
      .filter(col("rnl") <= 2)
      .withColumn("rank", row_number().over(wp).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        col("label"), col("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }
  /** X72 — MMR diversified re-rank
    * ([[graft.api.VectorPipeline.mmrRerank]], λ=0.5, k=5 over the
    * exact top-20 shortlist): the redundancy-penalized re-ranker a
    * retrieval endpoint runs after ANN shortlisting. The greedy
    * trajectory is not SQL-expressible, so the contract row emits the
    * verifiable claims (x8's derived-claim pattern): every probe
    * returns k results drawn FROM its shortlist, the first pick equals
    * the relevance argmax (the MMR theorem), and the selected set's
    * mean pairwise similarity does not exceed the plain top-5's
    * (diversity really improved — measured, not assumed; the pairwise
    * panels are bounded by probes × C(k,2), never corpus size). */
  def x72MmrRerank(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.api.VectorPipeline
    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 10)
    val short = VectorPipeline
      .topKCosine(emb, probes, "vec_id", "embedding", 20)
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("vec")), "neighbor_id")
      .localCheckpoint(true)
    val mmr = VectorPipeline
      .mmrRerank(short.select(col("probe_id"), col("neighbor_id"),
        col("sim"), col("vec")), 0.5, 5)
      .localCheckpoint(true)
    def pairMeanSim(sel: DataFrame): DataFrame = {
      val v = emb.select(col("vec_id"), col("embedding"))
      val a = sel.join(v, sel("neighbor_id") === v("vec_id"))
        .select(col("probe_id"), col("neighbor_id").as("ida"),
          col("embedding").as("va"))
      val b = sel.join(v, sel("neighbor_id") === v("vec_id"))
        .select(col("probe_id").as("pb"), col("neighbor_id").as("idb"),
          col("embedding").as("vb"))
      // deterministic mean (ADVICE r7): the 6-dp sims sum EXACTLY in
      // DECIMAL(18,6) regardless of partial-aggregation order, so the
      // diversity_ok <= compare below can never flip across partitionings
      // the way a bare avg() over IEEE doubles could
      a.join(b, col("probe_id") === col("pb") && col("ida") < col("idb"))
        .agg((sum(SimSearch.dot6(col("va"), col("vb")).cast(Det.Money6))
          .cast("double") / count(lit(1))).as("mean_sim"))
    }
    val mmrMean = pairMeanSim(mmr.select(col("probe_id"), col("neighbor_id")))
      .withColumnRenamed("mean_sim", "mmr_mean")
    val topMean = pairMeanSim(short.filter(col("rank") <= 5)
      .select(col("probe_id"), col("neighbor_id")))
      .withColumnRenamed("mean_sim", "top_mean")
    val top1 = mmr.filter(col("sel_rank") === 1)
      .select(col("probe_id"), col("neighbor_id").as("mmr_top1"))
      .join(short.filter(col("rank") === 1)
        .select(col("probe_id"), col("neighbor_id").as("rel_top1")),
        "probe_id")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("mmr_top1") === col("rel_top1"), 1L).otherwise(0L))
          .as("n_top1_match"))
    val escaped = mmr.join(short,
      Seq("probe_id", "neighbor_id"), "left_anti")
      .agg(count(lit(1)).as("n_escaped"))
    top1.crossJoin(escaped).crossJoin(mmrMean).crossJoin(topMean)
      .select(col("n_probes"), lit(5L).as("k"),
        (col("n_top1_match") === col("n_probes")).as("top1_ok"),
        (col("n_escaped") === 0L).as("subset_ok"),
        (col("mmr_mean") <= col("top_mean")).as("diversity_ok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l3_topk_cosine" -> (l3TopKCosine _),
    "x2_cosine_neardup" -> (x2CosineNearDup _),
    "x8_ivf_ann" -> (x8IvfAnn _),
    "x51_pq_ann" -> (x51PqAnn _),
    "x52_pq_rerank" -> (x52PqRerank _),
    "x14_lsh_ann" -> (x14LshAnn _),
    "x67_diversified_topk" -> (x67DiversifiedTopK _),
    "x72_mmr_rerank" -> (x72MmrRerank _))

  val oracles: Map[String, String] = Map(
    "l3_topk_cosine" ->
      ("WITH p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings " +
       "WHERE vec_id < 10), dots AS (SELECT probe_id, e.vec_id AS neighbor_id, " +
       "round(SUM(CAST(pe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), 6) AS sim " +
       "FROM p, embeddings e, range(1, 65) r(i) WHERE e.vec_id <> probe_id " +
       "GROUP BY probe_id, e.vec_id), ranked AS (SELECT probe_id, neighbor_id, sim, " +
       "CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, " +
       "neighbor_id ASC) AS BIGINT) AS rank FROM dots) " +
       "SELECT probe_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5 " +
       "ORDER BY probe_id, rank"),
    "x2_cosine_neardup" ->
      ("SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
       "round(SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 6) AS sim " +
       "FROM embeddings a, embeddings b, range(1, 65) r(i) " +
       "WHERE a.vec_id < b.vec_id GROUP BY a.vec_id, b.vec_id " +
       "HAVING round(SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 6) >= 0.45 " +
       "ORDER BY id_a, id_b"),
    // derived-claim oracle: the Spark side computes recall/sim-ratio
    // against its own exact L3 result; the claims hold by spec bound,
    // so the oracle states them as constants
    "x8_ivf_ann" ->
      ("SELECT CAST(10 AS BIGINT) AS n_probes, CAST(5 AS BIGINT) AS k, " +
       "TRUE AS simratio_ok, TRUE AS recall_ok"),
    "x51_pq_ann" ->
      ("SELECT CAST(10 AS BIGINT) AS n_probes, CAST(5 AS BIGINT) AS k, " +
       "TRUE AS simratio_ok, TRUE AS recall_ok"),
    "x52_pq_rerank" ->
      ("SELECT CAST(10 AS BIGINT) AS n_probes, CAST(5 AS BIGINT) AS k, " +
       "TRUE AS simratio_ok, TRUE AS recall_ok"),
    "x14_lsh_ann" ->
      ("SELECT CAST(10 AS BIGINT) AS n_probes, CAST(5 AS BIGINT) AS k, " +
       "TRUE AS simratio_ok"),
    "x67_diversified_topk" ->
      ("WITH p AS (SELECT vec_id AS probe_id, embedding AS pe " +
       "FROM embeddings WHERE vec_id < 10), " +
       "dots AS (SELECT probe_id, e.vec_id AS neighbor_id, " +
       "CAST(e.label AS INT) AS label, " +
       "round(SUM(CAST(pe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), 6) " +
       "AS sim FROM p, embeddings e, range(1, 65) r(i) " +
       "WHERE e.vec_id <> probe_id GROUP BY probe_id, e.vec_id, e.label), " +
       "capped AS (SELECT *, row_number() OVER (PARTITION BY probe_id, label " +
       "ORDER BY sim DESC, neighbor_id) AS rnl FROM dots), " +
       "ranked AS (SELECT probe_id, neighbor_id, label, sim, " +
       "CAST(row_number() OVER (PARTITION BY probe_id " +
       "ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank " +
       "FROM capped WHERE rnl <= 2) " +
       "SELECT probe_id, rank, neighbor_id, label, sim FROM ranked " +
       "WHERE rank <= 5 ORDER BY probe_id, rank"),
    // derived-claim oracle (x8's pattern): the greedy MMR trajectory is
    // not SQL-expressible; the claims are (see scaladoc)
    "x72_mmr_rerank" ->
      ("SELECT CAST(10 AS BIGINT) AS n_probes, CAST(5 AS BIGINT) AS k, " +
       "TRUE AS top1_ok, TRUE AS subset_ok, TRUE AS diversity_ok"))
}
