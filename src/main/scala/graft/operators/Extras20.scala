package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 wave: the TABLESAMPLE SQL surface (VERDICT r9 #8). */
object Extras20 {

  /** SQL50 — `TABLESAMPLE` (both grains: `(n ROWS)` and `(p PERCENT)
    * REPEATABLE (seed)`) as a DERIVED-CLAIM contract row: cross-engine
    * RNG equality is impossible (Spark's Bernoulli sampler and
    * DuckDB's share no seed algebra), so the row emits the claims an
    * engine-independent oracle CAN check exactly —
    *  - `base_n`: the deterministic base count;
    *  - `rows_exact`: the ROWS grain returned exactly min(500, n)
    *    rows (Spark implements it as a LIMIT — exact by contract);
    *  - `pct_in_bounds`: the 10 PERCENT grain landed within
    *    [0.05n, 0.15n] — Bernoulli sampling's count has σ = √(0.09n),
    *    so the window is ≥ 13σ wide at every tested SF (a false
    *    failure is impossible in practice, a broken sampler is not);
    *  - `repeatable_stable`: the same REPEATABLE(42) statement twice
    *    returns the identical key multiset (count + key-sum), the
    *    property that makes PERCENT sampling resumable;
    *  - `subset_ok`: every sampled row exists in the base (anti-join
    *    count 0) — sampling never invents rows.
    * For DETERMINISTIC cross-engine sampling (same rows both
    * engines), the engine's answer is x13's md5-bucket sampling /
    * x19's stratified form — this row documents the nondeterministic
    * SQL surface and pins its contract-level behavior instead.
    *
    * Scale shape: ROWS-grain is a driver-bounded LIMIT (use it for
    * peeks, never for statistics); PERCENT-grain is a per-row
    * Bernoulli filter fused into the scan — no shuffle, no skew
    * hazard, the right 100 TB sampling primitive. */
  def sql50Tablesample(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    Tables.lineitem(s, sfDir).createOrReplaceTempView("li_sample50")
    val baseN = s.table("li_sample50").count()
    val rowsSample = s.sql(
      "SELECT l_orderkey, l_linenumber FROM li_sample50 " +
        "TABLESAMPLE (500 ROWS)")
    val nRows = rowsSample.count()
    def pctKeys(): (Long, Long) = {
      val r = s.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
          "COALESCE(SUM(CAST(l_orderkey AS BIGINT) * 7 + " +
          "l_linenumber), 0) AS ks FROM li_sample50 " +
          "TABLESAMPLE (10 PERCENT) REPEATABLE (42)").head()
      (r.getLong(0), r.getLong(1))
    }
    val (nPct, ksPct) = pctKeys()
    val (nPct2, ksPct2) = pctKeys()
    val subsetViolations = rowsSample
      .join(s.table("li_sample50")
          .select(col("l_orderkey"), col("l_linenumber")),
        Seq("l_orderkey", "l_linenumber"), "left_anti")
      .count()
    import s.implicits._
    Seq((baseN,
        nRows == math.min(500L, baseN),
        nPct >= baseN / 20 && nPct <= (baseN * 3) / 20,
        nPct == nPct2 && ksPct == ksPct2,
        subsetViolations == 0L))
      .toDF("base_n", "rows_exact", "pct_in_bounds",
        "repeatable_stable", "subset_ok")
  }

  /** X173 — INCREMENTAL SemDeDup (x172's production ingest face,
    * completing the incremental-dedup family: x38 = LSH text, x55 =
    * exact text, x46 = embedding, x173 = semantic): the clone shard
    * (the x41 re-encoded vectors) arrives against a semantic index
    * trained on the ORIGINAL corpus — k-means centroids predate the
    * shard ([[Extras12.kmeansAssignTrained]]), each probe assigns to
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
      val all = graft.Checkpoints.cut(
        Extras5.cloneCorpus(spark, sfDir))
      val emb = all.filter(col("vec_id") < Extras5.CloneOffset)
      val asg = Extras12.kmeansAssignTrained(emb, all,
        "vec_id", "embedding", 8, 3)
      val withC = all.join(
        asg.withColumnRenamed("vid", "vec_id"), "vec_id")
      graft.api.VectorPipeline.groupedCosinePairsAgainst(
        withC.filter(col("vec_id") >= Extras5.CloneOffset),
        withC.filter(col("vec_id") < Extras5.CloneOffset),
        "vec_id", "embedding", "cluster", 0.8)
    }.orderBy(col("id_new"), col("id_old"))

  /** The x173 oracle: train chain over embeddings only (the literal
    * [[Extras12.kmIterSql]] rounds — the CTE named `v` is the TRAIN
    * side), assignment of the full clone corpus (va) against the
    * final centroids, then the exhaustive same-cluster probe × corpus
    * pair recompute at the x41 rounding spelling. */
  private[graft] val SemDedupIncrChainSql: String =
    "base AS MATERIALIZED (" + Extras5.CloneBaseSql + "), " +
    "v AS MATERIALIZED (SELECT vec_id AS vid, i - 1 AS d, " +
    "CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, " +
    "range(1, 65) r(i)), " +
    "va AS MATERIALIZED (SELECT b0.vec_id AS vid, i - 1 AS d, " +
    Extras5.cloneDotTerm("b0") + " AS x FROM base b0, range(1, 65) r(i)), " +
    "seeds AS (SELECT vec_id AS svid, CAST(row_number() OVER " +
    "(ORDER BY vec_id) - 1 AS INT) AS code FROM embeddings " +
    "ORDER BY vec_id LIMIT 8), " +
    "c0 AS (SELECT s.code, v.d, v.x AS c FROM seeds s " +
    "JOIN v ON v.vid = s.svid), " +
    Extras12.kmIterSql("c0", 1) + ", " + Extras12.kmIterSql("c1", 2) +
    ", " + Extras12.kmIterSql("c2", 3) + ", " +
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
    val tP = Extras5.cloneDotTerm("p")
    val tC = Extras5.cloneDotTerm("c")
    "WITH " + SemDedupIncrChainSql + ", " +
    "m AS (SELECT p.vec_id AS id_new FROM bp p, bcorp c, " +
    "range(1, 65) r(i) WHERE p.code = c.code " +
    "GROUP BY p.vec_id, c.vec_id " +
    s"HAVING round(SUM($tP * $tC), 6) >= 0.8) " +
    "SELECT b.vec_id FROM bp b WHERE b.vec_id NOT IN " +
    "(SELECT id_new FROM m) ORDER BY vec_id"
  }

  private val SemDedupIncrSql: String = {
    val tP = Extras5.cloneDotTerm("p")
    val tC = Extras5.cloneDotTerm("c")
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
    * from the SAME trained model as x172 (one [[Extras12.kmeansDistances]]
    * pass), so the whole verdict is bitwise deterministic; the
    * keep/drop boundary is floor(0.2·n) with the identical IEEE
    * spelling both engines. Oracle: the factored x172 chain + the
    * same rank arithmetic as a plain window. */
  def x175D4Prune(spark: SparkSession, sfDir: String): DataFrame =
    Tables.stagedFrame(spark, "d4_prune", sfDir, "embeddings",
        "k8i3_t08_p20") {
      val all = graft.Checkpoints.cut(Extras5.cloneCorpus(spark, sfDir))
      val sem = Extras12.x172SemDedup(spark, sfDir)
      val d2 = Extras12.kmeansDistances(all, "vec_id", "embedding", 8, 3)
        .withColumnRenamed("vid", "vec_id")
      val kd = graft.Checkpoints.cut(
        d2.join(sem.filter(col("kept")).select(col("vec_id")), "vec_id"))
      val perD2 = kd.groupBy(col("cluster"), col("d2"))
        .agg(count(lit(1)).as("n_at"))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster")).orderBy(col("d2"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val cum = perD2
        .withColumn("c_le", sum(col("n_at")).over(wCum))
        .select(col("cluster"), col("d2"),
          (col("c_le") - col("n_at")).as("c_lt"))
      val wTie = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster"), col("d2")).orderBy(col("vec_id"))
      val nc = kd.groupBy(col("cluster"))
        .agg(floor(lit(0.2) * count(lit(1))).cast("long").as("dropn"))
      kd.join(cum, Seq("cluster", "d2"))
        .withColumn("tie", row_number().over(wTie).cast("long"))
        .withColumn("proto_rank", col("c_lt") + col("tie"))
        .join(broadcast(nc), "cluster")
        .select(col("vec_id"), col("cluster"), col("proto_rank"),
          (col("proto_rank") > col("dropn")).as("kept_final"))
    }.orderBy(col("vec_id"))

  private val D4PruneSql: String =
    "WITH " + Extras12.SemDedupChainSql + ", " +
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
  def x176SoftDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = Dedup.ccLabelsFrame(spark, sfDir)
    val sizes = labels.groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("sz"))
    val weighted = labels.join(sizes, "cluster_rep")
      .select(col("doc_id"), col("sz"))
    Tables.documents(Tables.tune(spark), sfDir)
      .select(col("doc_id"))
      .join(weighted, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("sz"), lit(1L)).as("cluster_size"),
        round(lit(1.0) / coalesce(col("sz"), lit(1L)).cast("double"), 6)
          .as("weight"))
      .orderBy(col("doc_id"))
  }

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
    val s = Tables.tune(spark)
    val docs = Tables.documents(s, sfDir)
    val grams = graft.api.TextPipeline
      .ngramRows(docs, "doc_id", "text", 2)
      .select(col("doc_id"), graft.Det.md5Bucket(col("ngram"), 3).as("b"))
      .localCheckpoint(true)
    val raw = grams.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = grams.filter(col("doc_id") % 97 === 0)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val totals = raw.agg(sum(col("cr")).as("tr"))
      .crossJoin(tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("tt")))
    val model = raw.join(tgt, Seq("b"), "left").na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totals))
      .select(col("b"), round(
        log((col("ct") + 1).cast("double") /
          (col("tt") + 4096L).cast("double")) -
        log((col("cr") + 1).cast("double") /
          (col("tr") + 4096L).cast("double")), 10).as("term"))
    val perDoc = grams.join(broadcast(model), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("term")
            .cast(org.apache.spark.sql.types.DecimalType(28, 15)))
          .cast("double"), 6).as("log_weight"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
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
  def x178CcnetBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val docs = Tables.documents(s, sfDir)
    val scored = graft.Checkpoints.cut(
      graft.api.TextPipeline.lmScore(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang"), col("lp")))
    val perLp = scored.groupBy(col("lang"), col("lp"))
      .agg(count(lit(1)).as("n_at"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("lp"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val cum = perLp.withColumn("c_le", sum(col("n_at")).over(wCum))
      .select(col("lang"), col("lp"), (col("c_le") - col("n_at")).as("c_lt"))
    val wTie = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("lp")).orderBy(col("doc_id"))
    val nl = scored.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .select(col("lang"),
        floor(col("n") / lit(3.0)).cast("long").as("t1"),
        floor(lit(2.0) * col("n") / lit(3.0)).cast("long").as("t2"))
    scored.join(cum, Seq("lang", "lp"))
      .withColumn("tie", row_number().over(wTie).cast("long"))
      .withColumn("lp_rank", col("c_lt") + col("tie"))
      .join(broadcast(nl), "lang")
      .select(col("doc_id"), col("lang"), col("lp"), col("lp_rank"),
        when(col("lp_rank") > col("t2"), lit("head"))
          .when(col("lp_rank") > col("t1"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql50_tablesample" -> (sql50Tablesample _),
    "x177_dsir_weights" -> (x177DsirWeights _),
    "x178_ccnet_buckets" -> (x178CcnetBuckets _),
    "x173_semdedup_incr" -> (x173SemDedupIncr _),
    "x175_d4_prune" -> (x175D4Prune _),
    "x176_soft_dedup" -> (x176SoftDedup _))

  val oracles: Map[String, String] = Map(
    // the claims are engine-independent by construction; the oracle
    // recomputes the one deterministic scalar and asserts the rest
    "sql50_tablesample" ->
      ("SELECT CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) " +
       "AS base_n, TRUE AS rows_exact, TRUE AS pct_in_bounds, " +
       "TRUE AS repeatable_stable, TRUE AS subset_ok"),
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
       "LEFT JOIN sz ON sz.rep = lab.rep ORDER BY d.doc_id"))
}
