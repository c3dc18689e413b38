package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Det, Tables}
import graft.api.VectorPipeline

/** Round-9 fourth wave — the statistics / data-audit / retrieval-eval
  * additions: autocorrelation (time-series diagnostics), chi-squared
  * independence (categorical association), Benford first-digit audit
  * (fraud/data-entry forensics), per-segment entropy+Gini (mix
  * concentration), retrieval recall@k/MRR (the ANN ladder's scorecard
  * beyond nDCG), and reciprocal-rank fusion (the hybrid-retrieval
  * ensemble every modern search stack runs). All domain-bounded
  * outputs; every float crosses engines only as a single IEEE op on
  * identical inputs or a DECIMAL sum of pre-rounded terms.
  */
object Extras14 {

  // ---------------------------------------------------------------- x146

  private val AcfMaxLag = 7

  /** X146 — autocorrelation function of the daily order-revenue series
    * at lags 1..7: the first diagnostic a forecaster reads (weekly
    * seasonality shows as a lag-7 spike). Series = per-day DECIMAL
    * revenue sums (domain-bounded: one row per distinct day, ~2.4k).
    *
    * Scale: one scan + one grouped aggregate; everything after runs on
    * the day-sized frame (lineage cut once via Checkpoints so the
    * 7-lag self-join re-reads the materialized 2.4k rows, not the
    * fact table). Determinism: x_t and μ are doubles correctly rounded
    * from exact decimals; deviations round 6 dp; deviation PRODUCTS
    * round 4 dp and sum EXACTLY in DECIMAL(38,10); each acf value is
    * one closing IEEE division rounded 6 dp. */
  def x146Acf(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      // o_orderdate is TIMESTAMP_NTZ: route via LTZ (session tz is
      // pinned UTC) to get epoch seconds — same wall-clock day index
      // as the oracle's epoch_us on the naive timestamp
      .groupBy(expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
        .as("day"))
      .agg(sum(col("o_totalprice").cast(Det.Money)).as("v"))
    val stats = daily.agg(count(lit(1)).as("n"), sum(col("v")).as("tot"))
    val mu = round(col("tot").cast("double") / col("n").cast("double"), 6)
    val dev = graft.Checkpoints.cut(
      daily.crossJoin(broadcast(stats))
        .select(col("day"),
          round(col("v").cast("double") - mu, 6).as("dev")))
    def prodSum(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      sum(round(a * b, 4).cast(DecimalType(38, 10)))
    val denom = dev.agg(prodSum(col("dev"), col("dev")).as("denom"))
    val lags = spark.range(1, AcfMaxLag + 1).select(col("id").as("lag"))
    val lagged = dev.select(col("day").as("day_b"), col("dev").as("dev_b"))
    dev.crossJoin(broadcast(lags))
      .join(lagged, col("day_b") === col("day") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        prodSum(col("dev"), col("dev_b")).as("numer"))
      .crossJoin(broadcast(denom))
      .select(col("lag"), col("n_pairs"),
        round(col("numer").cast("double") / col("denom").cast("double"), 6)
          .as("acf"))
      .orderBy(col("lag"))
  }

  // ---------------------------------------------------------------- x147

  /** X147 — chi-squared test of independence between order priority and
    * order status: the contingency-table readout (observed, expected,
    * per-cell contribution) plus the statistic and degrees of freedom —
    * the categorical-association test a warehouse runs before trusting
    * a segmentation.
    *
    * Scale: ONE grouped count over the fact scan; the |pri|×|status|
    * (≤15-row) contingency frame then joins its own margins — no
    * window, so nothing ever funnels through one task. Float policy:
    * obs·N, rt·ct and their difference are exact in doubles (integer
    * values ≪ 2^53 at test SFs; identical spelling both engines), the
    * per-cell term is two IEEE ops rounded 8 dp, and the statistic is
    * the DECIMAL sum of those pre-rounded terms. The summary row rides
    * kind='TOTAL' with expected carrying the dof. */
  def x147Chi2(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = graft.Checkpoints.cut(
      Tables.orders(spark, sfDir)
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("obs")))
    val rt = cells.groupBy(col("pri")).agg(sum(col("obs")).as("rt"))
    val ct = cells.groupBy(col("status")).agg(sum(col("obs")).as("ct"))
    val tot = cells.agg(sum(col("obs")).as("n_total"),
      countDistinct(col("pri")).as("n_pri"),
      countDistinct(col("status")).as("n_status"))
    val diff = col("obs").cast("double") * col("n_total").cast("double") -
      col("rt").cast("double") * col("ct").cast("double")
    val scored = cells.join(rt, "pri").join(ct, "status")
      .crossJoin(broadcast(tot))
      .select(col("pri"), col("status"), col("obs"),
        round(col("rt").cast("double") * col("ct").cast("double") /
          col("n_total").cast("double"), 6).as("expected"),
        round(diff * diff / (col("n_total").cast("double") *
          col("rt").cast("double") * col("ct").cast("double")), 8)
          .as("term"))
    val total = scored.crossJoin(broadcast(tot))
      .groupBy(col("n_pri"), col("n_status"))
      .agg(sum(col("obs")).as("obs"),
        sum(col("term").cast(DecimalType(28, 15))).as("stat"))
      .select(lit("TOTAL").as("pri"), lit("ALL").as("status"), col("obs"),
        ((col("n_pri") - 1) * (col("n_status") - 1)).cast("double")
          .as("expected"),
        round(col("stat").cast("double"), 6).as("term"))
    scored.select(col("pri"), col("status"), col("obs"), col("expected"),
        col("term"))
      .unionByName(total)
      .orderBy(col("pri"), col("status"))
  }

  // ---------------------------------------------------------------- x148

  /** X148 — Benford first-digit audit of order totals: observed share
    * of each leading digit vs Benford's log10(1 + 1/d) expectation,
    * with the signed deviation — the classic fabricated-data forensic
    * (organic financial amounts follow Benford; invented ones don't).
    *
    * One scan, one 9-group aggregate (the digit is a codegen'd string
    * slice of the integer part — no log needed to extract it). Shares
    * are single divisions of exact counts; the expectation is a
    * closed-form IEEE chain on the digit literal — identical in both
    * engines by spelling. */
  def x148Benford(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(substring(floor(col("o_totalprice")).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
    val counts = o.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("n_total"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("n_total").cast("double"), 6)
          .as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("benford"))
      .withColumn("deviation", round(col("share") - col("benford"), 6))
      .orderBy(col("digit"))
  }

  // ---------------------------------------------------------------- x149

  /** X149 — per-market-segment order-priority mix: Shannon entropy and
    * Gini impurity — the two concentration numbers behind "is this
    * segment's demand diversified or single-note". Output is
    * domain-bounded (one row per segment).
    *
    * Plan: fact ⋈ dim on the customer key (AQE broadcasts the dim at
    * test scale; at 100 TB it's a plain shuffle join on the key), one
    * grouped count at (segment, priority) grain, then joins of
    * aggregate-sized frames — no window anywhere. Entropy terms
    * p·log2 p are two IEEE ops on identical doubles rounded 10 dp and
    * DECIMAL-summed; Gini is exact integer algebra (tot² − Σcnt²) with
    * one closing division. */
  def x149Entropy(spark: SparkSession, sfDir: String): DataFrame = {
    val g = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("cnt"))
    val tot = g.groupBy(col("segment"))
      .agg(sum(col("cnt")).as("tot"),
        sum(col("cnt") * col("cnt")).as("sumsq"),
        count(lit(1)).as("n_priorities"))
    val p = col("cnt").cast("double") / col("tot").cast("double")
    g.join(tot, "segment")
      .groupBy(col("segment"))
      .agg(max(col("tot")).as("n_orders"),
        max(col("n_priorities")).as("n_priorities"),
        sum(round(p * log2(p), 10).cast(DecimalType(28, 15)))
          .as("hsum"),
        max(col("sumsq")).as("sumsq"))
      .select(col("segment"), col("n_orders"), col("n_priorities"),
        round(-col("hsum").cast("double"), 6).as("entropy"),
        round((col("n_orders") * col("n_orders") - col("sumsq"))
          .cast("double") /
          (col("n_orders") * col("n_orders")).cast("double"), 6)
          .as("gini"))
      .orderBy(col("segment"))
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
    val retr = Extras11.x124BinaryQuant(spark, sfDir)
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
    val bq = Extras11.x124BinaryQuant(spark, sfDir)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x146_acf" -> (x146Acf _),
    "x147_chi2" -> (x147Chi2 _),
    "x148_benford" -> (x148Benford _),
    "x149_entropy" -> (x149Entropy _),
    "x150_retrieval_eval" -> (x150RetrievalEval _),
    "x151_rrf" -> (x151Rrf _))

  private val AcfSql: String =
    "WITH daily AS MATERIALIZED (SELECT " +
    "epoch_us(o_orderdate) // 86400000000 AS day, " +
    "SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS v " +
    "FROM orders GROUP BY 1), " +
    "st AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS tot " +
    "FROM daily), " +
    "dev AS MATERIALIZED (SELECT day, " +
    "round(CAST(v AS DOUBLE) - round(st.tot / st.n, 6), 6) AS dev " +
    "FROM daily CROSS JOIN st), " +
    "den AS (SELECT SUM(CAST(round(dev * dev, 4) AS DECIMAL(38,10))) " +
    "AS denom FROM dev), " +
    s"p AS (SELECT l.lag, COUNT(*) AS n_pairs, " +
    "SUM(CAST(round(a.dev * b.dev, 4) AS DECIMAL(38,10))) AS numer " +
    s"FROM range(1, ${AcfMaxLag + 1}) l(lag) " +
    "CROSS JOIN dev a JOIN dev b ON b.day = a.day + l.lag GROUP BY 1) " +
    "SELECT CAST(p.lag AS BIGINT) AS lag, " +
    "CAST(p.n_pairs AS BIGINT) AS n_pairs, " +
    "round(CAST(p.numer AS DOUBLE) / CAST(den.denom AS DOUBLE), 6) " +
    "AS acf FROM p CROSS JOIN den ORDER BY lag"

  private val Chi2Sql: String =
    "WITH cells AS MATERIALIZED (SELECT o_orderpriority AS pri, " +
    "o_orderstatus AS status, COUNT(*) AS obs FROM orders " +
    "GROUP BY 1, 2), " +
    "rt AS (SELECT pri, SUM(obs) AS rt FROM cells GROUP BY 1), " +
    "ct AS (SELECT status, SUM(obs) AS ct FROM cells GROUP BY 1), " +
    "tot AS (SELECT SUM(obs) AS n_total, " +
    "COUNT(DISTINCT pri) AS n_pri, " +
    "COUNT(DISTINCT status) AS n_status FROM cells), " +
    "scored AS MATERIALIZED (SELECT c.pri, c.status, c.obs, " +
    "round(CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / " +
    "CAST(tot.n_total AS DOUBLE), 6) AS expected, " +
    "round((CAST(c.obs AS DOUBLE) * CAST(tot.n_total AS DOUBLE) - " +
    "CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)) * " +
    "(CAST(c.obs AS DOUBLE) * CAST(tot.n_total AS DOUBLE) - " +
    "CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)) / " +
    "(CAST(tot.n_total AS DOUBLE) * CAST(rt.rt AS DOUBLE) * " +
    "CAST(ct.ct AS DOUBLE)), 8) AS term " +
    "FROM cells c JOIN rt ON rt.pri = c.pri " +
    "JOIN ct ON ct.status = c.status CROSS JOIN tot), " +
    "total AS (SELECT 'TOTAL' AS pri, 'ALL' AS status, " +
    "CAST(SUM(s.obs) AS BIGINT) AS obs, " +
    "CAST((ANY_VALUE(tot.n_pri) - 1) * (ANY_VALUE(tot.n_status) - 1) " +
    "AS DOUBLE) AS expected, " +
    "round(CAST(SUM(CAST(s.term AS DECIMAL(28,15))) AS DOUBLE), 6) " +
    "AS term FROM scored s CROSS JOIN tot) " +
    "SELECT pri, status, CAST(obs AS BIGINT) AS obs, expected, term " +
    "FROM (SELECT pri, status, obs, expected, term FROM scored " +
    "UNION ALL SELECT * FROM total) u ORDER BY pri, status"

  private val BenfordSql: String =
    "WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) " +
    "AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM orders), " +
    "counts AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1), " +
    "tot AS (SELECT SUM(n) AS n_total FROM counts) " +
    "SELECT digit, CAST(n AS BIGINT) AS n, " +
    "round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS share, " +
    "round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford, " +
    "round(round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6) - " +
    "round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6), 6) " +
    "AS deviation FROM counts CROSS JOIN tot ORDER BY digit"

  private val EntropySql: String =
    "WITH g AS MATERIALIZED (SELECT c_mktsegment AS segment, " +
    "o_orderpriority AS pri, COUNT(*) AS cnt FROM orders " +
    "JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2), " +
    "tot AS (SELECT segment, SUM(cnt) AS tot, " +
    "SUM(cnt * cnt) AS sumsq, COUNT(*) AS n_priorities " +
    "FROM g GROUP BY 1) " +
    "SELECT g.segment, CAST(ANY_VALUE(t.tot) AS BIGINT) AS n_orders, " +
    "CAST(ANY_VALUE(t.n_priorities) AS BIGINT) AS n_priorities, " +
    "round(-CAST(SUM(CAST(round(" +
    "(CAST(g.cnt AS DOUBLE) / CAST(t.tot AS DOUBLE)) * " +
    "log2(CAST(g.cnt AS DOUBLE) / CAST(t.tot AS DOUBLE)), 10) " +
    "AS DECIMAL(28,15))) AS DOUBLE), 6) AS entropy, " +
    "round(CAST(ANY_VALUE(t.tot) * ANY_VALUE(t.tot) - " +
    "ANY_VALUE(t.sumsq) AS DOUBLE) / " +
    "CAST(ANY_VALUE(t.tot) * ANY_VALUE(t.tot) AS DOUBLE), 6) AS gini " +
    "FROM g JOIN tot t ON t.segment = g.segment " +
    "GROUP BY g.segment ORDER BY g.segment"

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
    "WITH " + Extras11.BinaryQuantCte + ", " + ExactTopCte + ", " +
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
    "WITH " + Extras11.BinaryQuantCte + ", " + TruncTopCte + ", " +
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

  val oracles: Map[String, String] = Map(
    "x146_acf" -> AcfSql,
    "x147_chi2" -> Chi2Sql,
    "x148_benford" -> BenfordSql,
    "x149_entropy" -> EntropySql,
    "x150_retrieval_eval" -> RetrievalEvalSql,
    "x151_rrf" -> RrfSql)
}
