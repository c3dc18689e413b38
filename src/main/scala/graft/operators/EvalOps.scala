package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Det, Tables}
import graft.api.VectorPipeline

/** ML-EVALUATION theme module (round 11 — the ExtrasN naming-debt
  * retirement, VERDICT r10 #7): classifier/ranker scorecards and
  * feature-engineering rows, moved verbatim from
  * Extras10/11/14/15/16/19. Everything is exact-arithmetic aggregates
  * (integer cells, decimal sums, one closing IEEE op) so both engines
  * score identically; the retrieval rows grade the binary-quant ANN
  * rung against the exact ground truth.
  *
  * Rows: x93 target encoding, x94 feature scaling, x97 negative
  * sampling, x128 nDCG@5, x150 retrieval scorecard, x151 RRF,
  * x152 calibration, x158 Shapley, x161 AUC/Gini, x168 confusion,
  * x169 Cohen's kappa, x171 MCC.
  */
object EvalOps {

  /** X93 — leave-one-out target encoding (the categorical feature ML
    * pipelines build without leaking the row's own label): for each
    * order, the mean total price of its priority class EXCLUDING
    * itself — (S_c − t_i)/(n_c − 1) from one grouped DECIMAL sum
    * broadcast back. The exact class sums make the per-row arithmetic
    * a pure function both engines spell identically; one grouped agg +
    * one broadcast join, no self-join, no window. */
  def x93TargetEncoding(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast(Det.Money).as("t"))
    val cls = o.groupBy(col("o_orderpriority"))
      .agg(sum(col("t")).as("s"), count(lit(1)).as("n"))
    o.join(broadcast(cls), "o_orderpriority")
      .select(col("o_orderkey"), col("o_orderpriority"),
        ((col("s") - col("t")).cast("double") / (col("n") - 1))
          .as("loo_mean"))
      .orderBy(col("o_orderkey"))
  }

  /** X94 — standard-scaler feature materialization with EXACT moments:
    * per event type, mean and variance from exact DECIMAL sufficient
    * statistics (Σv and Σv² — v_dec·v_dec is exact decimal
    * multiplication), variance assembled in IEEE doubles spelled
    * identically both engines (stddev_samp's order-dependent double
    * partials would hash-mismatch); then the per-row z-score
    * (v − mean)/sqrt(var). One grouped agg + one broadcast join — the
    * feature-scaling pass an ML pipeline runs before training, exact
    * under any partitioning. */
  def x94FeatureScaling(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.eventsUs(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"),
        col("value").cast(Det.Money).as("v"))
    val stats = ev.groupBy(col("event_type"))
      .agg(sum(col("v")).cast("double").as("sv"),
        sum(col("v") * col("v")).cast("double").as("svv"),
        count(lit(1)).as("n"))
      .select(col("event_type"),
        (col("sv") / col("n")).as("mean"),
        ((col("svv") - col("sv") * col("sv") / col("n")) /
          (col("n") - 1)).as("variance"))
    ev.join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"),
        ((col("value") - col("mean")) / sqrt(col("variance"))).as("z"))
      .orderBy(col("event_id"))
  }

  /** X97 — deterministic negative sampling for contrastive training:
    * for each probe, 5 pseudo-random corpus negatives that are NOT
    * among its exact top-5 neighbors — the (anchor, positive,
    * negatives) triple builder behind every contrastive objective,
    * made reproducible by ranking on a content hash of (probe,
    * candidate) instead of an RNG. Scale shape: candidates are first
    * cut by a pushed md5-bucket threshold (selectivity reaches the
    * scan side of the join), the positive set is a bounded anti-join,
    * and the per-probe rank runs over the threshold-surviving sliver
    * only. Same md5Bucket spelling on both engines (Det.md5Bucket). */
  def x97NegativeSampling(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"))
    val pos = SimSearch.exactTopK(spark, sfDir)
      .select(col("probe_id").as("pp"), col("neighbor_id").as("pn"))
    val cand = probes.crossJoin(emb.select(col("vec_id").as("cand_id")))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("h", Det.md5Bucket(
        concat(col("probe_id").cast("string"), lit(":"),
          col("cand_id").cast("string")), 6))
      .filter(col("h") < 1000000L) // ~6% sliver survives to the rank
      .join(pos, col("probe_id") === col("pp") &&
        col("cand_id") === col("pn"), "left_anti")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("h"), col("cand_id"))
    cand.withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= 5)
      .select(col("probe_id"), col("neg_rank"), col("cand_id"))
      .orderBy(col("probe_id"), col("neg_rank"))
  }

  /** X128 — nDCG@5 of the binary-quant retrieval (Järvelin &
    * Kekäläinen 2002, the ranking-quality metric every retrieval eval
    * reports): graded relevance = exact cosine, DCG over x124's ranked
    * list, ideal DCG from the exact top-5 (the memoized l3 frame), per
    * probe. The eval rides on MEMOIZED frames (x124's retrieval and
    * l3's exact top-k are both per-(session, corpus) memos, built once
    * however many consumers ask) — the metric itself costs two
    * 5-row-per-probe aggregates and a probe-sized join. nDCG < 1
    * exactly where the Hamming shortlist reordered or
    * missed a true neighbor, so this row QUANTIFIES x124's quality
    * instead of just bounding it. */
  def x128Ndcg(spark: SparkSession, sfDir: String): DataFrame = {
    val retr = graft.operators.EmbedOps.x124BinaryQuant(spark, sfDir)
    val ex = SimSearch.exactTopK(spark, sfDir)
    val dcg = retr.groupBy(col("probe_id"))
      .agg(round(sum(col("sim") / log2(col("rank") + 1)), 6).as("dcg"))
    val idcg = ex.filter(col("rank") <= 5)
      .groupBy(col("probe_id").as("p2"))
      .agg(round(sum(col("sim") / log2(col("rank") + 1)), 6).as("idcg"))
    dcg.join(idcg, col("probe_id") === col("p2"))
      .select(col("probe_id"), col("dcg"), col("idcg"),
        round(col("dcg") / col("idcg"), 6).as("ndcg"))
      .orderBy(col("probe_id"))
  }

  // ---------------------------------------------------------------- x150

  /** X150 — retrieval scorecard of the binary-quantized ANN rung
    * against exact search: per-probe recall@5 and reciprocal rank
    * (first exact-relevant hit), plus the macro row (probe_id −1) with
    * mean recall and MRR — the two numbers (alongside x128's nDCG)
    * every ANN deployment gates on.
    *
    * Rides the two MEMOIZED frames (x124's retrieval, l3's exact
    * top-k): zero new corpus-sized work — the eval is a join of two
    * 50-row frames. Means are DECIMAL sums of the pre-rounded
    * per-probe values over the exact probe count. */
  def x150RetrievalEval(spark: SparkSession, sfDir: String): DataFrame = {
    val ex = SimSearch.exactTopK(spark, sfDir)
      .select(col("probe_id"), col("neighbor_id"))
    val retr = graft.operators.EmbedOps.x124BinaryQuant(spark, sfDir)
      .select(col("probe_id"), col("neighbor_id"), col("rank"))
    val per = retr.join(ex, Seq("probe_id", "neighbor_id"))
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n_hit"), min(col("rank")).as("first_rank"))
    val full = ex.select(col("probe_id")).distinct()
      .join(per, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / 5.0, 6)
          .as("recall_at_5"),
        when(col("first_rank").isNull, lit(0.0))
          .otherwise(round(lit(1.0) / col("first_rank").cast("double"), 6))
          .as("rr"))
    val macroRow = full.agg(count(lit(1)).as("n_probes"),
        sum(col("n_hit")).as("n_hit"),
        sum(col("recall_at_5").cast(DecimalType(18, 10))).as("rsum"),
        sum(col("rr").cast(DecimalType(18, 10))).as("rrsum"))
      .select(lit(-1L).as("probe_id"), col("n_hit"),
        round(col("rsum").cast("double") / col("n_probes").cast("double"),
          6).as("recall_at_5"),
        round(col("rrsum").cast("double") / col("n_probes").cast("double"),
          6).as("rr"))
    full.unionByName(macroRow).orderBy(col("probe_id"))
  }

  // ---------------------------------------------------------------- x151

  private val RrfK = 60

  /** X151 — reciprocal-rank fusion (Cormack SIGIR'09) of two cheap
    * retrieval rungs: the binary-quant top-5 (x124, 8 bytes/vector)
    * and the 16-dim matryoshka top-5 (x123's truncation, 4× less
    * compute) — the hybrid-ensemble pattern production search runs
    * when no single cheap signal is trusted alone. Score
    * Σ 1/(60+rank), fused top-5 per probe with the list-agreement
    * count.
    *
    * The binary list is served from x124's memo; the truncated list is
    * a probe-set-sized brute pass over 16 of 64 dims. RRF scores are
    * single IEEE divisions on integer ranks rounded 10 dp,
    * DECIMAL-summed across lists (≤2 terms), rounded 8 dp; the fused
    * rank orders by (rrf desc, neighbor) — engine-stable. */
  def x151Rrf(spark: SparkSession, sfDir: String): DataFrame = {
    val bq = graft.operators.EmbedOps.x124BinaryQuant(spark, sfDir)
      .select(col("probe_id"), col("neighbor_id"), col("rank"))
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val norm16 = sqrt(aggregate(slice(col("embedding"), 1, 16),
      lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val embT = emb.withColumn("v",
      transform(slice(col("embedding"), 1, 16),
        x => (x.cast("double") / norm16).cast("float")))
    val mrl = VectorPipeline.topKCosine(embT,
        embT.filter(col("vec_id") < 10), "vec_id", "v", 5)
      .select(col("probe_id"), col("neighbor_id"), col("rank"))
    val scored = bq.unionByName(mrl)
      .select(col("probe_id"), col("neighbor_id"),
        round(lit(1.0) / (lit(RrfK) + col("rank")).cast("double"), 10)
          .as("s"))
    val fused = scored.groupBy(col("probe_id"), col("neighbor_id"))
      .agg(count(lit(1)).as("n_lists"),
        round(sum(col("s").cast(DecimalType(28, 15))).cast("double"), 8)
          .as("rrf"))
    fused
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("rrf").desc, col("neighbor_id"))).cast("long"))
      .filter(col("fused_rank") <= 5)
      .orderBy(col("probe_id"), col("fused_rank"))
  }

  /** Exact top-5 CTE (probe_id, nid, rk) — the x128 oracle's exact
    * chain, kept verbatim so both rows score the same ground truth. */
  private val ExactTopCte: String =
    "exd AS (SELECT a.vec_id AS probe_id, b.vec_id AS nid, " +
    "round(SUM(CAST(a.embedding[i] AS DOUBLE) * " +
    "CAST(b.embedding[i] AS DOUBLE)), 6) AS sim " +
    "FROM embeddings a, embeddings b, range(1, 65) r(i) " +
    "WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id GROUP BY 1, 2), " +
    "ex AS (SELECT probe_id, nid, rk FROM (SELECT probe_id, nid, " +
    "row_number() OVER (PARTITION BY probe_id " +
    "ORDER BY sim DESC, nid) AS rk FROM exd) t WHERE rk <= 5)"

  private val RetrievalEvalSql: String =
    "WITH " + graft.operators.EmbedOps.BinaryQuantCte + ", " + ExactTopCte + ", " +
    "hit AS (SELECT r.probe_id, COUNT(*) AS n_hit, " +
    "MIN(r.rank) AS first_rank FROM retr r " +
    "JOIN ex ON ex.probe_id = r.probe_id AND ex.nid = r.neighbor_id " +
    "GROUP BY 1), " +
    "per AS MATERIALIZED (SELECT p.probe_id, " +
    "CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit, " +
    "round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / 5.0, 6) " +
    "AS recall_at_5, " +
    "CASE WHEN h.first_rank IS NULL THEN 0.0 " +
    "ELSE round(1.0 / CAST(h.first_rank AS DOUBLE), 6) END AS rr " +
    "FROM (SELECT DISTINCT probe_id FROM ex) p " +
    "LEFT JOIN hit h ON h.probe_id = p.probe_id), " +
    "mac AS (SELECT CAST(-1 AS BIGINT) AS probe_id, " +
    "CAST(SUM(n_hit) AS BIGINT) AS n_hit, " +
    "round(CAST(SUM(CAST(recall_at_5 AS DECIMAL(18,10))) AS DOUBLE) / " +
    "COUNT(*), 6) AS recall_at_5, " +
    "round(CAST(SUM(CAST(rr AS DECIMAL(18,10))) AS DOUBLE) / " +
    "COUNT(*), 6) AS rr FROM per) " +
    "SELECT probe_id, n_hit, recall_at_5, rr FROM " +
    "(SELECT * FROM per UNION ALL SELECT * FROM mac) u ORDER BY probe_id"

  /** Truncated-matryoshka top-5 with ranks — the x123 oracle's
    * truncation chain, re-emitting the rank it discards. */
  private val TruncTopCte: String =
    "n16 AS (SELECT vec_id, sqrt(SUM(CAST(embedding[i] AS DOUBLE) * " +
    "CAST(embedding[i] AS DOUBLE))) AS nrm " +
    "FROM embeddings, range(1, 17) r(i) GROUP BY 1), " +
    "truncD AS (SELECT a.vec_id AS probe_id, b.vec_id AS nid, " +
    "round(SUM(CAST(CAST(CAST(a.embedding[i] AS DOUBLE) / na.nrm " +
    "AS FLOAT) AS DOUBLE) * CAST(CAST(CAST(b.embedding[i] AS DOUBLE) " +
    "/ nb.nrm AS FLOAT) AS DOUBLE)), 6) AS sim " +
    "FROM embeddings a JOIN n16 na ON na.vec_id = a.vec_id, " +
    "embeddings b JOIN n16 nb ON nb.vec_id = b.vec_id, " +
    "range(1, 17) r(i) " +
    "WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id GROUP BY 1, 2), " +
    "tr AS (SELECT probe_id, nid, rk FROM (SELECT probe_id, nid, " +
    "row_number() OVER (PARTITION BY probe_id " +
    "ORDER BY sim DESC, nid) AS rk FROM truncD) t WHERE rk <= 5)"

  private val RrfSql: String =
    "WITH " + graft.operators.EmbedOps.BinaryQuantCte + ", " + TruncTopCte + ", " +
    "un AS (SELECT probe_id, neighbor_id, rank FROM retr " +
    "UNION ALL SELECT probe_id, nid, rk FROM tr), " +
    s"sc AS (SELECT probe_id, neighbor_id, " +
    s"round(1.0 / CAST($RrfK + rank AS DOUBLE), 10) AS s FROM un), " +
    "f AS (SELECT probe_id, neighbor_id, " +
    "CAST(COUNT(*) AS BIGINT) AS n_lists, " +
    "round(CAST(SUM(CAST(s AS DECIMAL(28,15))) AS DOUBLE), 8) AS rrf " +
    "FROM sc GROUP BY 1, 2) " +
    "SELECT probe_id, neighbor_id, n_lists, rrf, " +
    "CAST(fused_rank AS BIGINT) AS fused_rank FROM " +
    "(SELECT *, row_number() OVER (PARTITION BY probe_id " +
    "ORDER BY rrf DESC, neighbor_id) AS fused_rank FROM f) t " +
    "WHERE fused_rank <= 5 ORDER BY probe_id, fused_rank"

  // ---------------------------------------------------------------- x152

  /** X152 — probability-calibration report: Brier score + 10-bin
    * reliability table for a deterministic synthetic scorer (the
    * Knuth-hash prediction p = (doc_id·2654435761 mod 1000)/1000
    * against the "long document" outcome n_chars ≥ 300). The
    * calibration read every model-quality dashboard opens with: per
    * probability bin, predicted mean vs observed positive rate; row
    * bin=-1 is the corpus total whose `brier` IS the Brier score.
    *
    * All arithmetic is INTEGER milli-units until the three closing
    * divisions (one IEEE op each, rounded 8 dp): p lives as pm ∈
    * [0,1000), the squared error as (pm−1000y)² ≤ 10⁶ per row — exact
    * longs, so the grouped aggregate is map-side-combinable and the
    * whole plan is one scan + one 11-group aggregate at any corpus
    * size. */
  def x152Calibration(spark: SparkSession, sfDir: String): DataFrame =
    graft.api.Analytics.calibration(
      Tables.documents(spark, sfDir).select(
        ((col("doc_id") * lit(2654435761L)) % 1000).as("pm"),
        when(col("n_chars") >= 300, 1L).otherwise(0L).as("y")),
      "pm", "y")

  // ---------------------------------------------------------------- x158

  /** X158 — EXACT Shapley-value channel attribution (Shapley 1953;
    * the marketing form in Dalessandro KDD'12): each touch channel's
    * credit for conversions is its average marginal contribution over
    * all 4! orderings of the channel set — the only attribution rule
    * that is efficient, symmetric, and dummy-free, where x73/x116's
    * first/last/linear-touch are ad-hoc splits. Coalition value
    * v(S) = converted users whose pre-purchase touch set ⊆ S.
    * Output: per channel the 24-scaled INTEGER Shapley value (exact)
    * and its 6-dp display form, plus the TOTAL row — which equals
    * v(full) − v(∅) by the efficiency axiom, so the books visibly
    * balance in the contract data itself.
    *
    * Scale shape: the corpus-sized work is ONE pass — per-user first
    * purchase + distinct prior channels reduce to a 16-row mask
    * histogram (channels are a domain, 2^4 masks), and the whole
    * combinatorial layer (16 subsets × 16 masks × 4 channels) runs on
    * broadcast frames measured in BYTES. This is how exact Shapley
    * stays feasible at 100 TB: the exponential object lives on the
    * CHANNEL domain, never the user domain. */
  def x158Shapley(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.eventsUs(spark, sfDir)
    val chanBit = when(col("event_type") === "click", 1L)
      .when(col("event_type") === "error", 2L)
      .when(col("event_type") === "signup", 4L)
      .when(col("event_type") === "view", 8L)
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("pts"))
    val touched = ev.join(fp.select(col("user_id").as("fu"), col("pts")),
        col("user_id") === col("fu"))
      .filter(col("ts") < col("pts") && col("event_type") =!= "purchase")
      .select(col("user_id"), chanBit.as("pw")).distinct()
      .groupBy(col("user_id")).agg(sum(col("pw")).as("m"))
    val masks = fp.join(touched, Seq("user_id"), "left")
      .select(coalesce(col("m"), lit(0L)).as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("cnt"))
    graft.api.Analytics.shapleyFromMasks(masks,
      Seq(("click", 1L), ("error", 2L), ("signup", 4L), ("view", 8L)))
  }

  // ---------------------------------------------------------------- x161

  /** X161 — exact ROC-AUC + Gini for x152's deterministic scorer, via
    * the rank identity AUC = P(score⁺ > score⁻) + ½P(=) — computed
    * entirely on the SCORE DOMAIN: the corpus reduces to per-score
    * (n_pos, n_neg) counts (≤1000 rows), the below-rank prefix is a
    * theta join over that aggregate (no global window — the w2/w16
    * discipline), and the 2-scaled numerator
    * Σ_s n_pos(s)·(2·negBelow(s) + n_neg(s)) is an exact BIGINT that
    * ships in the output. AUC and Gini are the only floats: one
    * division and one affine map, each rounded 8 dp. The
    * threshold-free ranking-quality twin of x152's calibration (a
    * model can be perfectly calibrated and rank terribly, and vice
    * versa — you need both numbers). */
  def x161AucGini(spark: SparkSession, sfDir: String): DataFrame =
    graft.api.Analytics.aucGini(
      Tables.documents(spark, sfDir)
        .select(((col("doc_id") * lit(2654435761L)) % 1000).as("pm"),
          when(col("n_chars") >= 300, 1L).otherwise(0L).as("y")),
      "pm", "y")

  // ---------------------------------------------------------------- x168

  /** X168 — confusion matrix + precision/recall/F1/accuracy for x152's
    * deterministic scorer thresholded at 0.5 against the long-doc
    * outcome: the four cells as exact BIGINTs plus the derived rates —
    * completing the eval family (x152 calibration, x161 ranking, this
    * row thresholded classification). One scan, one 4-group aggregate;
    * the rates are single IEEE divisions on exact counts rounded 8 dp
    * (F1 spelled as the single rational 2tp/(2tp+fp+fn) — one
    * division, not a quotient of quotients). */
  def x168Confusion(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.documents(spark, sfDir)
      .select(
        (((col("doc_id") * lit(2654435761L)) % 1000) >= 500).cast("int")
          .as("pred"),
        when(col("n_chars") >= 300, 1).otherwise(0).as("truth"))
      .groupBy(col("pred"), col("truth")).agg(count(lit(1)).as("n"))
    def cell(p: Int, t: Int) = coalesce(sum(
      when(col("pred") === p && col("truth") === t, col("n"))), lit(0L))
    cells.agg(cell(1, 1).as("tp"), cell(1, 0).as("fp"),
        cell(0, 1).as("fn"), cell(0, 0).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        round((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("fn") + col("tn")).cast("double"),
          8).as("accuracy"),
        round(col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double"), 8).as("precision"),
        round(col("tp").cast("double") /
          (col("tp") + col("fn")).cast("double"), 8).as("recall"),
        round((lit(2L) * col("tp")).cast("double") /
          (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"), 8)
          .as("f1"))
  }

  // ---------------------------------------------------------------- x169

  /** X169 — Cohen's kappa: chance-corrected agreement between the
    * hash scorer's 0.5-threshold verdict and the length outcome,
    * κ = (pₒ−pₑ)/(1−pₑ) — the metric that exposes "95% accuracy" on a
    * 95%-skewed label as zero skill. Exact integer marginals; spelled
    * as ONE division of exact integers: κ = (n·agree − Σ marginal
    * products) / (n² − Σ marginal products), rounded 8 dp. */
  def x169CohensKappa(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir)
      .select(
        (((col("doc_id") * lit(2654435761L)) % 1000) >= 500).cast("long")
          .as("a"),
        when(col("n_chars") >= 300, 1L).otherwise(0L).as("b"))
    base.agg(count(lit(1)).as("n"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"),
        sum(col("a")).as("a1"), sum(col("b")).as("b1"))
      .select(col("n"), col("agree"), col("a1"), col("b1"),
        round(
          (col("n") * col("agree") -
            (col("a1") * col("b1") +
              (col("n") - col("a1")) * (col("n") - col("b1"))))
            .cast("double") /
          (col("n") * col("n") -
            (col("a1") * col("b1") +
              (col("n") - col("a1")) * (col("n") - col("b1"))))
            .cast("double"), 8).as("kappa"))
  }

  // ---------------------------------------------------------------- x171

  /** X171 — Matthews correlation coefficient over x168's confusion
    * cells: MCC = (tp·tn − fp·fn)/√((tp+fp)(tp+fn)(tn+fp)(tn+fn)),
    * the single number that stays honest under class imbalance where
    * accuracy and F1 both flatter. Exact integer cells; the four
    * marginal factors are cast to DOUBLE BEFORE multiplying (their
    * product overflows BIGINT on large corpora) with an identical
    * left-associated spelling in both engines, √ is correctly rounded
    * per IEEE 754, one closing division rounded 8 dp. */
  def x171Mcc(spark: SparkSession, sfDir: String): DataFrame =
    x168Confusion(spark, sfDir)
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        round(
          (col("tp").cast("double") * col("tn").cast("double") -
            col("fp").cast("double") * col("fn").cast("double")) /
            sqrt((col("tp") + col("fp")).cast("double") *
              (col("tp") + col("fn")).cast("double") *
              (col("tn") + col("fp")).cast("double") *
              (col("tn") + col("fn")).cast("double")), 8).as("mcc"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x93_target_encoding" -> (x93TargetEncoding _),
    "x94_feature_scaling" -> (x94FeatureScaling _),
    "x97_negative_sampling" -> (x97NegativeSampling _),
    "x128_ndcg" -> (x128Ndcg _),
    "x150_retrieval_eval" -> (x150RetrievalEval _),
    "x151_rrf" -> (x151Rrf _),
    "x152_calibration" -> (x152Calibration _),
    "x158_shapley" -> (x158Shapley _),
    "x161_auc_gini" -> (x161AucGini _),
    "x168_confusion" -> (x168Confusion _),
    "x169_cohens_kappa" -> (x169CohensKappa _),
    "x171_mcc" -> (x171Mcc _))

  private val CalibrationSql: String =
    "WITH base AS MATERIALIZED (SELECT " +
    "(doc_id * 2654435761) % 1000 AS pm, " +
    "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y FROM documents), " +
    "b AS MATERIALIZED (SELECT pm // 100 AS bin, COUNT(*) AS n, " +
    "SUM(pm) AS sp, SUM(y) AS sy, " +
    "SUM((pm - 1000 * y) * (pm - 1000 * y)) AS sq FROM base GROUP BY 1), " +
    "t AS (SELECT -1 AS bin, SUM(n) AS n, SUM(sp) AS sp, SUM(sy) AS sy, " +
    "SUM(sq) AS sq FROM b) " +
    "SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n, " +
    "round(CAST(sp AS DOUBLE) / (CAST(n AS BIGINT) * 1000.0), 8) AS mean_p, " +
    "round(CAST(sy AS DOUBLE) / CAST(n AS BIGINT), 8) AS frac_pos, " +
    "round(CAST(sq AS DOUBLE) / (CAST(n AS BIGINT) * 1000000.0), 8) AS brier " +
    "FROM (SELECT * FROM b UNION ALL SELECT * FROM t) u ORDER BY bin"

  private val ShapleySql: String =
    "WITH fp AS MATERIALIZED (SELECT user_id, min(epoch_us(ts)) AS pts " +
    "FROM events WHERE event_type = 'purchase' GROUP BY 1), " +
    "tch AS (SELECT DISTINCT e.user_id, CASE e.event_type " +
    "WHEN 'click' THEN 1 WHEN 'error' THEN 2 WHEN 'signup' THEN 4 " +
    "WHEN 'view' THEN 8 END AS pw FROM events e " +
    "JOIN fp ON e.user_id = fp.user_id " +
    "WHERE epoch_us(e.ts) < fp.pts AND e.event_type <> 'purchase'), " +
    "mk AS (SELECT fp.user_id, COALESCE(SUM(t.pw), 0) AS m FROM fp " +
    "LEFT JOIN tch t ON fp.user_id = t.user_id GROUP BY 1), " +
    "mc AS MATERIALIZED (SELECT m, COUNT(*) AS cnt FROM mk GROUP BY 1), " +
    "ss AS (SELECT unnest(range(16)) AS s), " +
    "v AS MATERIALIZED (SELECT s, COALESCE(SUM(CASE WHEN (m & s) = m " +
    "THEN cnt END), 0) AS v FROM ss CROSS JOIN mc GROUP BY s), " +
    "ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2), " +
    "('signup', 4), ('view', 8)) c(channel, bit)), " +
    "phi AS (SELECT ch.channel, CAST(SUM((CASE WHEN bit_count(v1.s) " +
    "IN (0, 3) THEN 6 ELSE 2 END) * (v2.v - v1.v)) AS BIGINT) " +
    "AS phi_x24 FROM ch JOIN v v1 ON (v1.s & ch.bit) = 0 " +
    "JOIN v v2 ON v2.s = (v1.s | ch.bit) GROUP BY 1), " +
    "u AS (SELECT * FROM phi UNION ALL SELECT 'TOTAL', " +
    "CAST(SUM(phi_x24) AS BIGINT) FROM phi) " +
    "SELECT channel, phi_x24, round(CAST(phi_x24 AS DOUBLE) / 24.0, 6) " +
    "AS phi FROM u ORDER BY (channel = 'TOTAL'), channel"

  private val AucSql: String =
    "WITH base AS MATERIALIZED (SELECT " +
    "(doc_id * 2654435761) % 1000 AS pm, " +
    "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y FROM documents), " +
    "bs AS MATERIALIZED (SELECT pm, SUM(y) AS np, SUM(1 - y) AS nn " +
    "FROM base GROUP BY 1), " +
    "pref AS (SELECT a.pm, ANY_VALUE(a.np) AS np, ANY_VALUE(a.nn) AS nn, " +
    "COALESCE(SUM(b.nn), 0) AS negBelow FROM bs a " +
    "LEFT JOIN bs b ON b.pm < a.pm GROUP BY a.pm), " +
    "agg AS (SELECT CAST(SUM(np) AS BIGINT) AS n_pos, " +
    "CAST(SUM(nn) AS BIGINT) AS n_neg, " +
    "CAST(SUM(np * (2 * negBelow + nn)) AS BIGINT) AS u2 FROM pref) " +
    "SELECT n_pos, n_neg, u2, round(CAST(u2 AS DOUBLE) / " +
    "(2.0 * n_pos * n_neg), 8) AS auc, " +
    "round(2.0 * round(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 8) " +
    "- 1.0, 8) AS gini FROM agg"

  private val ConfusionSql: String =
    "WITH base AS MATERIALIZED (SELECT " +
    "CASE WHEN (doc_id * 2654435761) % 1000 >= 500 THEN 1 ELSE 0 END " +
    "AS pred, CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS truth " +
    "FROM documents), " +
    "m AS (SELECT " +
    "CAST(COALESCE(SUM(CASE WHEN pred = 1 AND truth = 1 THEN 1 END), 0) " +
    "AS BIGINT) AS tp, " +
    "CAST(COALESCE(SUM(CASE WHEN pred = 1 AND truth = 0 THEN 1 END), 0) " +
    "AS BIGINT) AS fp, " +
    "CAST(COALESCE(SUM(CASE WHEN pred = 0 AND truth = 1 THEN 1 END), 0) " +
    "AS BIGINT) AS fn, " +
    "CAST(COALESCE(SUM(CASE WHEN pred = 0 AND truth = 0 THEN 1 END), 0) " +
    "AS BIGINT) AS tn FROM base) " +
    "SELECT tp, fp, fn, tn, " +
    "round(CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE), " +
    "8) AS accuracy, " +
    "round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 8) AS precision, " +
    "round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 8) AS recall, " +
    "round(CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE), 8) " +
    "AS f1 FROM m"

  private val KappaSql: String =
    "WITH base AS MATERIALIZED (SELECT " +
    "CASE WHEN (doc_id * 2654435761) % 1000 >= 500 THEN 1 ELSE 0 END " +
    "AS a, CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS b " +
    "FROM documents), " +
    "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
    "CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree, " +
    "CAST(SUM(a) AS BIGINT) AS a1, CAST(SUM(b) AS BIGINT) AS b1 FROM base) " +
    "SELECT n, agree, a1, b1, " +
    "round(CAST(n * agree - (a1 * b1 + (n - a1) * (n - b1)) AS DOUBLE) / " +
    "CAST(n * n - (a1 * b1 + (n - a1) * (n - b1)) AS DOUBLE), 8) " +
    "AS kappa FROM m"

  private val MccSql: String =
    s"WITH conf AS MATERIALIZED (SELECT tp, fp, fn, tn FROM " +
    s"($ConfusionSql) c) " +
    "SELECT tp, fp, fn, tn, " +
    "round((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE) - " +
    "CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE)) / " +
    "sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE) * " +
    "CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 8) AS mcc " +
    "FROM conf"

  val oracles: Map[String, String] = Map(
    // exact class sums; identical per-row arithmetic
    "x93_target_encoding" ->
      ("WITH o AS (SELECT o_orderkey, o_orderpriority, " +
       "CAST(o_totalprice AS DECIMAL(18,4)) AS t FROM orders), " +
       "cls AS (SELECT o_orderpriority, SUM(t) AS s, " +
       "CAST(COUNT(*) AS BIGINT) AS n FROM o GROUP BY 1) " +
       "SELECT o.o_orderkey, o.o_orderpriority, " +
       "CAST(s - t AS DOUBLE) / (n - 1) AS loo_mean " +
       "FROM o JOIN cls ON o.o_orderpriority = cls.o_orderpriority " +
       "ORDER BY o_orderkey"),
    // exact decimal moments, variance assembled in identically-spelled
    // IEEE arithmetic
    "x94_feature_scaling" ->
      ("WITH ev AS (SELECT event_id, event_type, value, " +
       "CAST(value AS DECIMAL(18,4)) AS v FROM events), " +
       "st AS (SELECT event_type, CAST(SUM(v) AS DOUBLE) AS sv, " +
       "CAST(SUM(v * v) AS DOUBLE) AS svv, " +
       "CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1), " +
       "m AS (SELECT event_type, sv / n AS mean, " +
       "(svv - sv * sv / n) / (n - 1) AS variance FROM st) " +
       "SELECT ev.event_id, ev.event_type, " +
       "(ev.value - m.mean) / sqrt(m.variance) AS z " +
       "FROM ev JOIN m ON ev.event_type = m.event_type " +
       "ORDER BY event_id"),
    // positives recomputed exactly (l3's spelling), candidates cut by
    // the identical md5-bucket threshold, same (h, cand) rank order
    "x97_negative_sampling" ->
      ("WITH p AS (SELECT vec_id AS probe_id, embedding AS pe " +
       "FROM embeddings WHERE vec_id < 10), " +
       "dots AS (SELECT probe_id, e.vec_id AS neighbor_id, " +
       "round(SUM(CAST(pe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), 6) " +
       "AS sim FROM p, embeddings e, range(1, 65) r(i) " +
       "WHERE e.vec_id <> probe_id GROUP BY probe_id, e.vec_id), " +
       "pos AS (SELECT probe_id, neighbor_id FROM " +
       "(SELECT probe_id, neighbor_id, row_number() OVER " +
       "(PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank " +
       "FROM dots) t WHERE rank <= 5), " +
       "cand AS (SELECT p.probe_id, e.vec_id AS cand_id, " +
       Det.sql.md5Bucket(
         "CAST(p.probe_id AS VARCHAR) || ':' || CAST(e.vec_id AS VARCHAR)",
         6) + " AS h " +
       "FROM p, embeddings e WHERE e.vec_id <> p.probe_id), " +
       "flt AS (SELECT c.* FROM cand c WHERE h < 1000000 " +
       "AND NOT EXISTS (SELECT 1 FROM pos " +
       "WHERE pos.probe_id = c.probe_id AND pos.neighbor_id = c.cand_id)), " +
       "r AS (SELECT probe_id, cand_id, CAST(row_number() OVER " +
       "(PARTITION BY probe_id ORDER BY h, cand_id) AS BIGINT) AS neg_rank " +
       "FROM flt) " +
       "SELECT probe_id, neg_rank, cand_id FROM r WHERE neg_rank <= 5 " +
       "ORDER BY probe_id, neg_rank"),
    // the retrieval chain + the exact chain + identically-spelled DCGs
    "x128_ndcg" ->
      ("WITH " + graft.operators.EmbedOps.BinaryQuantCte + ", " +
       "exd AS (SELECT a.vec_id AS probe_id, b.vec_id AS nid, " +
       "round(SUM(CAST(a.embedding[i] AS DOUBLE) * " +
       "CAST(b.embedding[i] AS DOUBLE)), 6) AS sim " +
       "FROM embeddings a, embeddings b, range(1, 65) r(i) " +
       "WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id GROUP BY 1, 2), " +
       "ex AS (SELECT probe_id, sim, rk FROM (SELECT probe_id, nid, sim, " +
       "row_number() OVER (PARTITION BY probe_id " +
       "ORDER BY sim DESC, nid) AS rk FROM exd) t WHERE rk <= 5), " +
       "dcg AS (SELECT probe_id, round(SUM(sim / log2(rank + 1)), 6) " +
       "AS dcg FROM retr GROUP BY 1), " +
       "idcg AS (SELECT probe_id, round(SUM(sim / log2(rk + 1)), 6) " +
       "AS idcg FROM ex GROUP BY 1) " +
       "SELECT dcg.probe_id, dcg, idcg, round(dcg / idcg, 6) AS ndcg " +
       "FROM dcg JOIN idcg ON idcg.probe_id = dcg.probe_id " +
       "ORDER BY dcg.probe_id"),
    "x150_retrieval_eval" -> RetrievalEvalSql,
    "x151_rrf" -> RrfSql,
    "x152_calibration" -> CalibrationSql,
    "x158_shapley" -> ShapleySql,
    "x161_auc_gini" -> AucSql,
    "x168_confusion" -> ConfusionSql,
    "x169_cohens_kappa" -> KappaSql,
    "x171_mcc" -> MccSql)
}
