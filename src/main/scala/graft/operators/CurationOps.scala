package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SEMANTIC-CURATION theme module (round 11 — the ExtrasN naming-debt
  * retirement, VERDICT r10 #7): the SemDeDup ladder's corpus bindings
  * and oracles, moved verbatim from Extras12/Extras20. Every rung is a
  * cited public method over the shared [[Clustering]] k-means and
  * [[graft.api.VectorPipeline]] banded-pair machinery; the public
  * column-parameterized kernels live in [[graft.api.Curation]] and the
  * contract rows here delegate to them.
  *
  * Rows: x172 SemDeDup, x172b cross-cluster recall guard, x173
  * incremental SemDeDup, x175 D4 pruning, x176 soft dedup, x177 DSIR
  * weights, x178 CCNet perplexity tiers.
  */
object CurationOps {

  /** X172b core: classify verified near-dup pairs against a top-2
    * cluster assignment — the recall guard of the SemDeDup family
    * (VERDICT r10 #1, the x48b/x63b pattern at the semantic tier).
    * `n_straddling` is the loss x172/x173/st26 documentedly accept
    * (pairs whose endpoints land in different clusters never become
    * candidates), now emitted AS DATA instead of scaladoc;
    * `n_recovered_top2` is how many of those a top-2 multi-probe
    * assignment (the standard IVF trick) would bring back in scope.
    * One pair-sized frame joined twice to the corpus-sized assignment
    * — no pair work beyond what x41 already verified. */
  private[operators] def straddleGuardFromPairs(pairs: DataFrame,
      top2: DataFrame): DataFrame = {
    val a = top2.select(col("vid").as("id_a"), col("c1").as("a1"),
      col("c2").as("a2"))
    val b = top2.select(col("vid").as("id_b"), col("c1").as("b1"),
      col("c2").as("b2"))
    val straddle = col("a1") =!= col("b1")
    val recovered = straddle && (col("a1") === col("b2") ||
      col("a2") === col("b1") || col("a2") === col("b2"))
    pairs.join(a, "id_a").join(b, "id_b")
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(when(!straddle, 1L).otherwise(0L)), lit(0L))
          .as("n_within"),
        coalesce(sum(when(straddle, 1L).otherwise(0L)), lit(0L))
          .as("n_straddling"),
        coalesce(sum(when(recovered, 1L).otherwise(0L)), lit(0L))
          .as("n_recovered_top2"))
  }

  /** Public column-parameterized face of the x172b guard: band the
    * corpus (the x41 machinery), train the same k-means x172 trains,
    * and report total / within-cluster / straddling / top-2-recovered
    * pair counts. */
  def semDedupStraddleGuard(corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int, threshold: Double,
      numBands: Int = 8, dims: Int = 64): DataFrame =
    straddleGuardFromPairs(
      graft.api.VectorPipeline.bandedCosinePairs(corpus, idCol, vecCol,
        threshold, numBands, dims),
      Clustering.kmeansAssignTop2(corpus, idCol, vecCol, k, iters))

  // ---------------------------------------------------------------- x172

  /** X172 — SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    * deduplication as the paper's composition — k-means partitions the
    * embedding corpus ([[kmeansAssignments]], the x134 deterministic
    * trainer at k=8/3 rounds), near-duplicate pairs are then found
    * ONLY within clusters
    * ([[graft.api.VectorPipeline.groupedCosinePairs]]), and a vector
    * drops iff it has a same-cluster near-dup with a smaller id
    * (first-occurrence-wins, the x42 rule). Runs on the x41/x42 clone
    * corpus (planted cos ≈ 0.94 clones) so the row is non-vacuous on
    * this near-orthogonal test corpus.
    *
    * This is the missing rung between x41 (corpus-wide banded dedup)
    * and a 100 TB semantic dedup: pair work is bounded per cluster —
    * each cluster dedups independently, so a 1000-executor run
    * processes clusters in parallel and no pair candidate ever
    * crosses a cluster boundary — at the documented cost that
    * CROSS-CLUSTER near-dups are out of scope (the paper's trade;
    * the spec plants a straddling pair and pins the exclusion).
    * Output is staged cross-process like the rest of the artifact
    * tier. Oracle: the x134 Lloyd CTE chain over the clone corpus +
    * an exhaustive within-cluster pair recompute. */
  def x172SemDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.stagedFrame(spark, "semdedup", sfDir, "embeddings",
        "k8i3_t08") {
      // delegates to the public column-parameterized kernel (round 11)
      graft.api.Curation.semDedup(graft.operators.EmbedOps.cloneCorpus(spark, sfDir),
          "vec_id", "embedding", k = 8, iters = 3, threshold = 0.8)
        .withColumnRenamed("id", "vec_id")
    }.orderBy(col("vec_id"))

  /** The x172 oracle: the [[KmeansSql]] Lloyd chain re-rooted on the
    * x41 clone corpus (v applies the sign-flip term per dimension),
    * then an EXHAUSTIVE within-cluster pair recompute at the x41
    * rounding spelling and the first-wins keep rule. Heavy CTEs are
    * MATERIALIZED (the k-core inlining lesson): v and the chain feed
    * many references, and `pr` must not re-expand the whole Lloyd
    * chain per side. */
  private[operators] val SemDedupChainSql: String = {
    val tA = graft.operators.EmbedOps.cloneDotTerm("a")
    val tB = graft.operators.EmbedOps.cloneDotTerm("b")
    "base AS MATERIALIZED (" + graft.operators.EmbedOps.CloneBaseSql + "), " +
    "v AS MATERIALIZED (SELECT b0.vec_id AS vid, i - 1 AS d, " +
    graft.operators.EmbedOps.cloneDotTerm("b0") + " AS x FROM base b0, range(1, 65) r(i)), " +
    "seeds AS (SELECT vec_id AS svid, CAST(row_number() OVER " +
    "(ORDER BY vec_id) - 1 AS INT) AS code FROM base " +
    "ORDER BY vec_id LIMIT 8), " +
    "c0 AS (SELECT s.code, v.d, v.x AS c FROM seeds s " +
    "JOIN v ON v.vid = s.svid), " +
    Clustering.kmIterSql("c0", 1) + ", " +
    Clustering.kmIterSql("c1", 2) + ", " +
    Clustering.kmIterSql("c2", 3) + ", " +
    "dvc4 AS (SELECT v.vid, c.code, " +
    "SUM(CAST(round(v.x * c.c * 1e12, 0) AS BIGINT)) " +
    "AS dvc FROM v JOIN c3 c ON v.d = c.d GROUP BY v.vid, c.code), " +
    "dcc4 AS (SELECT code, SUM(CAST(round(c * c * 1e12, 0) AS BIGINT)) " +
    "AS dcc FROM c3 GROUP BY code), " +
    "asg4 AS MATERIALIZED (SELECT vid, code FROM (SELECT d.vid, d.code, " +
    "row_number() OVER (PARTITION BY d.vid " +
    "ORDER BY (2 * d.dvc - s.dcc) DESC, d.code) AS rn " +
    "FROM dvc4 d JOIN dcc4 s USING (code)) t WHERE rn = 1), " +
    "bc AS MATERIALIZED (SELECT b0.vec_id, b0.embedding, b0.aug, g.code " +
    "FROM base b0 JOIN asg4 g ON g.vid = b0.vec_id), " +
    "pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b " +
    "FROM bc a, bc b, range(1, 65) r(i) " +
    "WHERE a.code = b.code AND a.vec_id < b.vec_id " +
    "GROUP BY a.vec_id, b.vec_id " +
    s"HAVING round(SUM($tA * $tB), 6) >= 0.8), " +
    "drp AS (SELECT DISTINCT id_b FROM pr)"
  }

  private val SemDedupSql: String =
    "WITH " + SemDedupChainSql + " " +
    "SELECT g.vid AS vec_id, CAST(g.code AS BIGINT) AS cluster, " +
    "(d.id_b IS NULL) AS kept " +
    "FROM asg4 g LEFT JOIN drp d ON d.id_b = g.vid ORDER BY vec_id"

  /** X173 — INCREMENTAL SemDeDup (x172's production ingest face,
    * completing the incremental-dedup family: x38 = LSH text, x55 =
    * exact text, x46 = embedding, x173 = semantic): the clone shard
    * (the x41 re-encoded vectors) arrives against a semantic index
    * trained on the ORIGINAL corpus — k-means centroids predate the
    * shard ([[Clustering.kmeansAssignTrained]]), each probe assigns to
    * its nearest trained centroid in one lattice-argmax pass (no
    * retraining), and banded candidates form ONLY within the probe's
    * assigned cluster against that cluster's corpus index
    * ([[graft.api.VectorPipeline.groupedCosinePairsAgainst]]). Per
    * increment the work is probe-sized, the corpus index is reloaded
    * state, and no candidate crosses a cluster boundary — cross-
    * cluster matches stay out of scope exactly as in x172 (a probe
    * whose nearest centroid differs from its original's cluster is
    * missed, reported nowhere — the paper's trade, spec-pinned).
    * Oracle: the x134 Lloyd chain (trained on embeddings only) + a
    * probe-assignment CTE + exhaustive same-cluster probe × corpus
    * pair recompute. */
  def x173SemDedupIncr(spark: SparkSession, sfDir: String): DataFrame =
    Tables.stagedFrame(spark, "semdedup_incr", sfDir, "embeddings",
        "k8i3_t08_aug") {
      // delegates to the public column-parameterized kernel (round 11):
      // corpus = the original embeddings, probe = the clone shard
      val all = graft.Checkpoints.cut(graft.operators.EmbedOps.cloneCorpus(spark, sfDir))
      graft.api.Curation.semDedupIncremental(
        all.filter(col("vec_id") < graft.operators.EmbedOps.CloneOffset),
        all.filter(col("vec_id") >= graft.operators.EmbedOps.CloneOffset),
        "vec_id", "embedding", k = 8, iters = 3, threshold = 0.8)
    }.orderBy(col("id_new"), col("id_old"))

  /** The x173 oracle: train chain over embeddings only (the literal
    * [[Clustering.kmIterSql]] rounds — the CTE named `v` is the TRAIN
    * side), assignment of the full clone corpus (va) against the
    * final centroids, then the exhaustive same-cluster probe × corpus
    * pair recompute at the x41 rounding spelling. */
  private[graft] val SemDedupIncrChainSql: String =
    "base AS MATERIALIZED (" + graft.operators.EmbedOps.CloneBaseSql + "), " +
    "v AS MATERIALIZED (SELECT vec_id AS vid, i - 1 AS d, " +
    "CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, " +
    "range(1, 65) r(i)), " +
    "va AS MATERIALIZED (SELECT b0.vec_id AS vid, i - 1 AS d, " +
    graft.operators.EmbedOps.cloneDotTerm("b0") + " AS x FROM base b0, range(1, 65) r(i)), " +
    "seeds AS (SELECT vec_id AS svid, CAST(row_number() OVER " +
    "(ORDER BY vec_id) - 1 AS INT) AS code FROM embeddings " +
    "ORDER BY vec_id LIMIT 8), " +
    "c0 AS (SELECT s.code, v.d, v.x AS c FROM seeds s " +
    "JOIN v ON v.vid = s.svid), " +
    Clustering.kmIterSql("c0", 1) + ", " + Clustering.kmIterSql("c1", 2) +
    ", " + Clustering.kmIterSql("c2", 3) + ", " +
    "dvc4 AS (SELECT v.vid, c.code, " +
    "SUM(CAST(round(v.x * c.c * 1e12, 0) AS BIGINT)) AS dvc " +
    "FROM va v JOIN c3 c ON v.d = c.d GROUP BY v.vid, c.code), " +
    "dcc4 AS (SELECT code, SUM(CAST(round(c * c * 1e12, 0) AS BIGINT)) " +
    "AS dcc FROM c3 GROUP BY code), " +
    "asg4 AS MATERIALIZED (SELECT vid, code FROM (SELECT d.vid, d.code, " +
    "row_number() OVER (PARTITION BY d.vid " +
    "ORDER BY (2 * d.dvc - s.dcc) DESC, d.code) AS rn " +
    "FROM dvc4 d JOIN dcc4 s USING (code)) t WHERE rn = 1), " +
    "bp AS MATERIALIZED (SELECT b0.vec_id, b0.embedding, b0.aug, g.code " +
    "FROM base b0 JOIN asg4 g ON g.vid = b0.vec_id " +
    "WHERE b0.vec_id >= 1000000), " +
    "bcorp AS MATERIALIZED (SELECT b0.vec_id, b0.embedding, b0.aug, " +
    "g.code FROM base b0 JOIN asg4 g ON g.vid = b0.vec_id " +
    "WHERE b0.vec_id < 1000000)"

  /** The st26 oracle (assembled here because the clone-corpus SQL
    * terms are operators-private): survivors of the streaming
    * semantic probe loop == the x173 complement — probes with no
    * same-cluster corpus pair at t = 0.8, NOT EXISTS form. */
  private[graft] val StreamSemDedupSql: String = {
    val tP = graft.operators.EmbedOps.cloneDotTerm("p")
    val tC = graft.operators.EmbedOps.cloneDotTerm("c")
    "WITH " + SemDedupIncrChainSql + ", " +
    "m AS (SELECT p.vec_id AS id_new FROM bp p, bcorp c, " +
    "range(1, 65) r(i) WHERE p.code = c.code " +
    "GROUP BY p.vec_id, c.vec_id " +
    s"HAVING round(SUM($tP * $tC), 6) >= 0.8) " +
    "SELECT b.vec_id FROM bp b WHERE b.vec_id NOT IN " +
    "(SELECT id_new FROM m) ORDER BY vec_id"
  }

  private val SemDedupIncrSql: String = {
    val tP = graft.operators.EmbedOps.cloneDotTerm("p")
    val tC = graft.operators.EmbedOps.cloneDotTerm("c")
    "WITH " + SemDedupIncrChainSql + " " +
    "SELECT p.vec_id AS id_new, c.vec_id AS id_old, " +
    s"round(SUM($tP * $tC), 6) AS sim " +
    "FROM bp p, bcorp c, range(1, 65) r(i) WHERE p.code = c.code " +
    "GROUP BY p.vec_id, c.vec_id " +
    s"HAVING round(SUM($tP * $tC), 6) >= 0.8 " +
    "ORDER BY id_new, id_old"
  }

  /** X175 — D4 data pruning (Tirumala et al. 2023, arXiv:2308.12284):
    * the third rung of the semantic-curation ladder — SemDeDup (x172)
    * removes near-duplicates, then SSL-PROTOTYPE pruning removes the
    * most prototypical survivors (closest to their cluster centroid —
    * the redundant "center mass" that adds least diversity), keeping
    * the diverse tail as training data. Drop fraction 20% per cluster.
    *
    * Scale design: NO per-cluster window over the corpus (a cluster is
    * n/k rows — a funnel at 100 TB). The global prototype rank is
    * DECOMPOSED exactly as x43's quantiles: per-(cluster, d²) counts
    * (one scalable shuffle), a cumulative window over that
    * AGGREGATE-BOUNDED distinct-distance frame, and a tie window only
    * within equal-(cluster, d²) groups (duplicate-distance
    * multiplicity — bounded); rank = c_lt + tie, identical to
    * row_number over (d², vid). Distances are the exact lattice longs
    * from the SAME trained model as x172 (one [[Clustering.kmeansDistances]]
    * pass), so the whole verdict is bitwise deterministic; the
    * keep/drop boundary is floor(0.2·n) with the identical IEEE
    * spelling both engines. Oracle: the factored x172 chain + the
    * same rank arithmetic as a plain window. */
  def x175D4Prune(spark: SparkSession, sfDir: String): DataFrame =
    Tables.stagedFrame(spark, "d4_prune", sfDir, "embeddings",
        "k8i3_t08_p20") {
      // the rank core is the shared public kernel's
      // ([[graft.api.Curation.d4Rank]], round 11); this binding keeps
      // its cheaper input composition — the STAGED x172 survivors
      // plus one kmeansDistances pass — where the generic
      // [[graft.api.Curation.d4Prune]] recomputes semDedup from the
      // raw frame
      val all = graft.Checkpoints.cut(graft.operators.EmbedOps.cloneCorpus(spark, sfDir))
      val sem = x172SemDedup(spark, sfDir)
      val d2 = Clustering.kmeansDistances(all, "vec_id", "embedding", 8, 3)
        .withColumnRenamed("vid", "id")
      graft.api.Curation.d4Rank(
          d2.join(sem.filter(col("kept"))
            .select(col("vec_id").as("id")), "id"), 0.2)
        .withColumnRenamed("id", "vec_id")
    }.orderBy(col("vec_id"))

  private val D4PruneSql: String =
    "WITH " + SemDedupChainSql + ", " +
    "kept AS (SELECT g.vid, g.code FROM asg4 g LEFT JOIN drp d " +
    "ON d.id_b = g.vid WHERE d.id_b IS NULL), " +
    "dvv AS (SELECT vid, SUM(CAST(round(x * x * 1e12, 0) AS BIGINT)) " +
    "AS dvv FROM v GROUP BY vid), " +
    "kd AS MATERIALIZED (SELECT k.vid, k.code, " +
    "w.dvv - 2 * d.dvc + s.dcc AS d2 FROM kept k " +
    "JOIN dvc4 d ON d.vid = k.vid AND d.code = k.code " +
    "JOIN dcc4 s ON s.code = k.code JOIN dvv w ON w.vid = k.vid), " +
    "nc AS (SELECT code, CAST(FLOOR(0.2 * COUNT(*)) AS BIGINT) " +
    "AS dropn FROM kd GROUP BY code), " +
    "rk AS (SELECT vid, code, row_number() OVER " +
    "(PARTITION BY code ORDER BY d2, vid) AS r FROM kd) " +
    "SELECT r.vid AS vec_id, CAST(r.code AS BIGINT) AS cluster, " +
    "CAST(r.r AS BIGINT) AS proto_rank, (r.r > n.dropn) AS kept_final " +
    "FROM rk r JOIN nc n USING (code) ORDER BY vec_id"

  /** X176 — SOFT dedup (He et al. 2024, arXiv:2407.06654; the
    * DataComp-LM-era alternative to hard removal): instead of dropping
    * near-duplicates, DOWN-WEIGHT them — every document gets sampling
    * weight 1/|its near-dup cluster|, so a 5-way re-post contributes
    * one document's worth of gradient mass in expectation while hard
    * dedup's arbitrary keep-one choice (and its recall cliff) goes
    * away. Clusters are the staged x12 connected components over the
    * verified LSH pair graph (one cross-process CC run already serves
    * x12/x60/x75/x119 — this row rides the same artifact); docs
    * outside the pair graph are singletons at weight 1.
    *
    * Scale shape: one k-row-ish size aggregate over the label table +
    * one left join of the corpus to (label ⋈ size) — no new pair
    * work, no window; the weight column is what a training-data
    * sampler consumes directly (x35's temperature mix applies on top
    * for language balancing). Weight = round(1/size, 6) with the
    * identical IEEE spelling both engines. */
  def x176SoftDedup(spark: SparkSession, sfDir: String): DataFrame =
    // delegates to the public column-parameterized kernel (round 11);
    // labels = the one staged cross-process CC run
    graft.api.Curation.softDedup(
        Tables.documents(Tables.tune(spark), sfDir), "doc_id",
        Dedup.ccLabelsFrame(spark, sfDir), "doc_id", "cluster_rep")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** X177 — DSIR importance weights (Xie et al. 2023,
    * arXiv:2302.03169 "Data Selection for Language Models via
    * Importance Resampling"): score every document by how much more
    * likely its hashed-bigram bag is under the TARGET domain's n-gram
    * model than under the raw corpus model — log w(d) = Σ_occurrences
    * [ln p_tgt(b) − ln p_raw(b)] over the doc's bigram buckets — the
    * standard pretraining-data selection signal (sample ∝ exp of
    * this). Target slice = the doc_id % 97 = 0 eval-domain sample
    * (x17's convention); features = word bigrams hashed onto 4096
    * md5 buckets (the paper's hashed n-gram features, our one shared
    * [[graft.Det.md5Bucket]] spelling); add-one smoothing over the
    * bucket vocabulary exactly as x49's corpus LM.
    *
    * Scale shape: the MODELS are two 4096-row bucket tables (one
    * grouped count each — vocabulary-sized, never corpus-sized) that
    * broadcast; the corpus pays one bigram explode + one grouped
    * per-doc sum. Determinism: each bucket's log-ratio is IEEE ops on
    * exact counts rounded to 10 dp, per-doc sums run EXACTLY in
    * DECIMAL(28,15) over the rounded terms, final round 6 dp — the
    * x111 policy on the x49 precedent (ln agrees across engines on
    * these magnitudes). */
  def x177DsirWeights(spark: SparkSession, sfDir: String): DataFrame = {
    // delegates to the public column-parameterized kernel (round 11);
    // target slice = the doc_id % 97 = 0 eval-domain sample (x17's
    // convention), passed as an id frame
    val s = Tables.tune(spark)
    val docs = Tables.documents(s, sfDir)
    graft.api.Curation.dsirWeights(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0).select(col("doc_id")),
        "doc_id", buckets = 4096)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** X178 — CCNet perplexity buckets (Wenzek et al. 2020, LREC —
    * §4.4's head/middle/tail split, the curation tiering CommonCrawl
    * pipelines run before mixing): per language, documents are split
    * into terciles of their corpus-LM score (x49's mean bigram
    * log-probability — HIGHER lp ⇔ lower perplexity ⇔ `head`), so a
    * mixing policy can sample head-heavy without a hard quality
    * cutoff. Boundaries at per-language ranks floor(n/3) and
    * floor(2n/3), rank over (lp, doc_id).
    *
    * Scale shape: the score pass is x49's (two vocabulary-keyed model
    * aggregates + one per-doc mean); the tercile rank is the x43/x175
    * DECOMPOSITION — per-(lang, lp) counts, a cumulative window over
    * that aggregate-bounded distinct-score frame, a tie window only
    * within equal-(lang, lp) groups — no per-language corpus window
    * funnel. Oracle: the x49 chain + a plain rank window + the same
    * boundary arithmetic. */
  def x178CcnetBuckets(spark: SparkSession, sfDir: String): DataFrame =
    // delegates to the public column-parameterized kernel (round 11)
    graft.api.Curation.perplexityTiers(
        Tables.documents(Tables.tune(spark), sfDir),
        "doc_id", "text", "lang")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** X172b — CROSS-CLUSTER RECALL GUARD for the SemDeDup family
    * (VERDICT r10 #1: the x48b/x63b guard-row pattern at the semantic
    * tier). x172/x173/st26 accept the paper's trade — near-dup pairs
    * whose endpoints land in different k-means clusters never become
    * candidates — but until this row the loss was scaladoc, invisible
    * at a different k or corpus. The guard classifies x41's VERIFIED
    * ungrouped banded pairs (the staged clone-pair table — zero new
    * pair work) against the SAME k=8/3-round training x172 runs:
    * `n_within` is x172's in-scope pair set, `n_straddling` the
    * documented loss AS DATA, and `n_recovered_top2` how many
    * straddlers a top-2 multi-probe assignment
    * ([[Clustering.kmeansAssignTop2]], the standard IVF trick) would
    * bring back in scope. At 100 TB this is two broadcast-sized joins
    * of the pair table to the assignment — the guard costs nothing
    * beyond the artifacts the ladder already builds. Oracle: the x172
    * Lloyd chain + a rank-2 assignment window + the x41 exhaustive
    * pair recompute. */
  def x172bStraddleGuard(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val corpus = graft.Checkpoints.cut(graft.operators.EmbedOps.cloneCorpus(s, sfDir))
    straddleGuardFromPairs(
      graft.operators.EmbedOps.clonePairs(s, sfDir),
      Clustering.kmeansAssignTop2(corpus, "vec_id", "embedding", 8, 3))
  }


  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x172_semdedup" -> (x172SemDedup _),
    "x173_semdedup_incr" -> (x173SemDedupIncr _),
    "x175_d4_prune" -> (x175D4Prune _),
    "x176_soft_dedup" -> (x176SoftDedup _),
    "x177_dsir_weights" -> (x177DsirWeights _),
    "x178_ccnet_buckets" -> (x178CcnetBuckets _),
    "x172b_semdedup_guard" -> (x172bStraddleGuard _))


  /** The x172b oracle: the x172 Lloyd chain (reused verbatim), a
    * rank-≤2 window for the top-2 assignment at the identical
    * (2·dvc − dcc) DESC, code order, and the x41 exhaustive verified
    * pair recompute — then the same three classifications. */
  private val SemGuardSql: String = {
    val tA = graft.operators.EmbedOps.cloneDotTerm("a")
    val tB = graft.operators.EmbedOps.cloneDotTerm("b")
    "WITH " + SemDedupChainSql + ", " +
    "a2 AS MATERIALIZED (SELECT vid, " +
    "MAX(CASE WHEN rn = 1 THEN code END) AS c1, " +
    "MAX(CASE WHEN rn = 2 THEN code END) AS c2 FROM " +
    "(SELECT d.vid, d.code, row_number() OVER (PARTITION BY d.vid " +
    "ORDER BY (2 * d.dvc - s.dcc) DESC, d.code) AS rn " +
    "FROM dvc4 d JOIN dcc4 s USING (code)) t WHERE rn <= 2 " +
    "GROUP BY vid), " +
    "pall AS MATERIALIZED (SELECT a.vec_id AS id_a, b.vec_id AS id_b " +
    "FROM base a, base b, range(1, 65) r(i) " +
    "WHERE a.vec_id < b.vec_id GROUP BY a.vec_id, b.vec_id " +
    s"HAVING round(SUM($tA * $tB), 6) >= 0.8), " +
    "j AS (SELECT xa.c1 AS a1, xa.c2 AS a2c, xb.c1 AS b1, xb.c2 AS b2 " +
    "FROM pall p JOIN a2 xa ON xa.vid = p.id_a " +
    "JOIN a2 xb ON xb.vid = p.id_b) " +
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs, " +
    "CAST(COALESCE(SUM(CASE WHEN a1 = b1 THEN 1 ELSE 0 END), 0) " +
    "AS BIGINT) AS n_within, " +
    "CAST(COALESCE(SUM(CASE WHEN a1 <> b1 THEN 1 ELSE 0 END), 0) " +
    "AS BIGINT) AS n_straddling, " +
    "CAST(COALESCE(SUM(CASE WHEN a1 <> b1 AND (a1 = b2 OR a2c = b1 " +
    "OR a2c = b2) THEN 1 ELSE 0 END), 0) AS BIGINT) " +
    "AS n_recovered_top2 FROM j"
  }


  val oracles: Map[String, String] = Map(
    "x172_semdedup" -> SemDedupSql,
    "x173_semdedup_incr" -> SemDedupIncrSql,
    "x175_d4_prune" -> D4PruneSql,
    // the x12 recursive-CC chain + size aggregate + the same
    // 1/size spelling; singletons (docs outside the pair graph) at 1
    "x176_soft_dedup" ->
      (Dedup.ClusterCteSql +
       ", lab AS (SELECT src AS doc_id, MIN(dst) AS rep FROM reach " +
       "GROUP BY src), " +
       "sz AS (SELECT rep, COUNT(*) AS s FROM lab GROUP BY rep) " +
       "SELECT d.doc_id, CAST(COALESCE(sz.s, 1) AS BIGINT) " +
       "AS cluster_size, " +
       "round(CAST(1.0 AS DOUBLE) / CAST(COALESCE(sz.s, 1) AS DOUBLE), 6) " +
       "AS weight FROM documents d " +
       "LEFT JOIN lab ON lab.doc_id = d.doc_id " +
       "LEFT JOIN sz ON sz.rep = lab.rep ORDER BY d.doc_id"),
    // hashed-bigram models as CTEs at the identical md5-bucket +
    // add-one + ln + 10-dp-term + DECIMAL-sum + 6-dp spelling
    "x177_dsir_weights" ->
      (s"WITH g AS (SELECT doc_id, ${graft.Det.sql.md5Bucket("ngram", 3)} " +
       s"AS b FROM (${TextOps.ngramSql(2)}) t), " +
       "raw AS (SELECT b, COUNT(*) AS cr FROM g GROUP BY b), " +
       "tgt AS (SELECT b, COUNT(*) AS ct FROM g WHERE doc_id % 97 = 0 " +
       "GROUP BY b), " +
       "tot AS (SELECT (SELECT COUNT(*) FROM g) AS tr, " +
       "(SELECT COUNT(*) FROM g WHERE doc_id % 97 = 0) AS tt), " +
       "model AS (SELECT r.b, round(" +
       "ln(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) / " +
       "CAST(tot.tt + 4096 AS DOUBLE)) - " +
       "ln(CAST(r.cr + 1 AS DOUBLE) / CAST(tot.tr + 4096 AS DOUBLE)), " +
       "10) AS term FROM raw r LEFT JOIN tgt t ON t.b = r.b " +
       "CROSS JOIN tot), " +
       "pd AS (SELECT g.doc_id, COUNT(*) AS n_bigrams, " +
       "round(CAST(SUM(CAST(term AS DECIMAL(28,15))) AS DOUBLE), 6) " +
       "AS log_weight FROM g JOIN model m ON m.b = g.b " +
       "GROUP BY g.doc_id) " +
       "SELECT d.doc_id, CAST(COALESCE(pd.n_bigrams, 0) AS BIGINT) " +
       "AS n_bigrams, COALESCE(pd.log_weight, 0.0) AS log_weight " +
       "FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id " +
       "ORDER BY d.doc_id"),
    // the x49 scoring chain + a rank window + identical floor(n/3)
    // boundary arithmetic
    "x178_ccnet_buckets" ->
      (s"WITH bg AS (SELECT doc_id, ngram FROM (${TextOps.ngramSql(2)}) t), " +
       s"uni AS (SELECT ngram AS w FROM (${TextOps.ngramSql(1)}) t), " +
       "c2 AS (SELECT ngram, COUNT(*) AS c2 FROM bg GROUP BY 1), " +
       "c1 AS (SELECT w, COUNT(*) AS c1 FROM uni GROUP BY 1), " +
       "v AS (SELECT COUNT(DISTINCT w) AS v FROM uni), " +
       "sc AS (SELECT b.doc_id, " +
       "round(AVG(ln((c2.c2 + 1.0) / (c1.c1 + v.v))), 6) AS lp " +
       "FROM bg b JOIN c2 ON b.ngram = c2.ngram " +
       "JOIN c1 ON split_part(b.ngram, ' ', 1) = c1.w " +
       "CROSS JOIN v GROUP BY b.doc_id), " +
       "sl AS (SELECT sc.doc_id, d.lang, sc.lp FROM sc " +
       "JOIN documents d ON d.doc_id = sc.doc_id), " +
       "rk AS (SELECT doc_id, lang, lp, CAST(row_number() OVER " +
       "(PARTITION BY lang ORDER BY lp, doc_id) AS BIGINT) AS r " +
       "FROM sl), " +
       "nl AS (SELECT lang, CAST(FLOOR(COUNT(*) / 3.0) AS BIGINT) " +
       "AS t1, CAST(FLOOR(2.0 * COUNT(*) / 3.0) AS BIGINT) AS t2 " +
       "FROM sl GROUP BY lang) " +
       "SELECT r.doc_id, r.lang, r.lp, r.r AS lp_rank, " +
       "CASE WHEN r.r > n.t2 THEN 'head' WHEN r.r > n.t1 " +
       "THEN 'middle' ELSE 'tail' END AS bucket " +
       "FROM rk r JOIN nl n USING (lang) ORDER BY r.doc_id"),
    "x172b_semdedup_guard" -> SemGuardSql)
}
