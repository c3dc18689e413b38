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
    "x150_retrieval_eval" -> (x150RetrievalEval _),
    "x151_rrf" -> (x151Rrf _))


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
    "x150_retrieval_eval" -> RetrievalEvalSql,
    "x151_rrf" -> RrfSql)
}
