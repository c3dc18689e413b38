package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}
import graft.api.{TextPipeline, VocabTokenizer}

/** Round-5 surface growth: token-space accounting through the pluggable
  * tokenizer seam (X40) and banded embedding near-dedup with its keep
  * verdict (X41/X42) — the two gaps VERDICT r4 ranked highest for a
  * real training-data user — plus decomposed per-language winsorization
  * (X43), ordered funnel analysis (X45), snapshot-versioned time travel
  * (S21), native batch session_window (W14), and the higher-order fold
  * family (F20).
  */
object Extras5 {

  /** X43 — per-language p05/p95 WINSORIZATION of the quality score (the
    * outlier-clipping step before mixing/weighting a training corpus),
    * with the exact interpolated quantiles computed by DECOMPOSITION
    * instead of a per-group value buffer: Spark's exact `percentile`
    * (a17/a9) holds every group's value multiset in its aggregation
    * buffer — fine for bounded groups, a reducer-memory funnel when one
    * language is 100 TB. Here the quantile comes from (lang, score)
    * group counts (one scalable shuffle), a cumulative window over the
    * aggregate-bounded distinct-score frame (the x31 machinery), and a
    * rank→value inverse lookup: value at 0-based rank r is the score
    * with c_lt ≤ r < c_le; p-quantile interpolates ranks k=⌊p(n−1)⌋ and
    * k+1 with weight g = p(n−1)−k.
    *
    * Cross-engine exactness BY IDENTICAL ARITHMETIC: the oracle runs
    * the SAME decomposition and the SAME (1−g)·lower + g·upper formula,
    * so both engines execute identical IEEE ops on identical doubles —
    * no dependence on percentile-implementation ulp (the a9 hazard);
    * round(…, 4) is belt and braces. Bounds (5 rows) broadcast back;
    * the clip itself is per-row math. */
  def x43Winsorize(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        round(length(col("text")) / size(split(col("text"), " ")), 6)
          .as("score"))
    val perScore = scored.groupBy(col("lang"), col("score"))
      .agg(count(lit(1)).as("n_at"))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perScore.withColumn("c_le", sum(col("n_at")).over(wCum))
      .withColumn("c_lt", col("c_le") - col("n_at"))
    val totals = perScore.groupBy(col("lang")).agg(sum(col("n_at")).as("n"))
    def quantile(p: Double, name: String): DataFrame = {
      val idx = totals.select(col("lang"),
          (lit(p) * (col("n") - 1).cast("double")).as("i"))
        .select(col("lang"), floor(col("i")).cast("long").as("k"),
          (col("i") - floor(col("i"))).as("g"))
      val lower = cum.join(idx, "lang")
        .filter(col("c_lt") <= col("k") && col("c_le") > col("k"))
        .select(col("lang"), col("g"), col("score").as("lo_v"))
      val upper = cum.join(idx, "lang")
        .filter(col("c_lt") <= col("k") + 1 && col("c_le") > col("k") + 1)
        .select(col("lang").as("lang2"), col("score").as("hi_v"))
      // rank k+1 may not exist (single-value group, p=1): upper = lower
      lower.join(upper, col("lang") === col("lang2"), "left")
        .select(col("lang"), round((lit(1.0) - col("g")) * col("lo_v")
          + col("g") * coalesce(col("hi_v"), col("lo_v")), 4).as(name))
    }
    val bounds = quantile(0.05, "lo").join(quantile(0.95, "hi"), "lang")
    scored.join(broadcast(bounds), "lang")
      .select(col("doc_id"), col("lang"), col("score"), col("lo"), col("hi"),
        least(greatest(col("score"), col("lo")), col("hi")).as("clipped"),
        (col("score") < col("lo") || col("score") > col("hi"))
          .as("was_clipped"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x43_winsorize" -> (x43Winsorize _))

  val oracles: Map[String, String] = Map(
    // the SAME decomposed-quantile arithmetic as the Spark side — both
    // engines run identical IEEE ops ((1-g)*lo + g*hi over the same
    // doubles), so no percentile-implementation ulp is in play.
    // CASTs: DuckDB 0.05 is DECIMAL, windowed SUM is HUGEINT.
    "x43_winsorize" ->
      ("WITH s AS (SELECT doc_id, lang, " +
       "round(length(text) / len(string_split(text, ' ')), 6) AS score " +
       "FROM documents), " +
       "ps AS (SELECT lang, score, COUNT(*) AS n_at FROM s GROUP BY lang, score), " +
       "cc AS (SELECT lang, score, " +
       "CAST(SUM(n_at) OVER (PARTITION BY lang ORDER BY score " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c_le, " +
       "CAST(SUM(n_at) OVER (PARTITION BY lang ORDER BY score " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_at AS BIGINT) " +
       "AS c_lt FROM ps), " +
       "t AS (SELECT lang, CAST(SUM(n_at) AS BIGINT) AS n FROM ps GROUP BY lang), " +
       "k05 AS (SELECT lang, CAST(FLOOR(i) AS BIGINT) AS k, i - FLOOR(i) AS g " +
       "FROM (SELECT lang, CAST(0.05 AS DOUBLE) * CAST(n - 1 AS DOUBLE) AS i " +
       "FROM t) z), " +
       "lo05 AS (SELECT cc.lang, g, score AS lo_v FROM cc JOIN k05 USING (lang) " +
       "WHERE c_lt <= k AND c_le > k), " +
       "hi05 AS (SELECT cc.lang AS lang2, score AS hi_v FROM cc " +
       "JOIN k05 USING (lang) WHERE c_lt <= k + 1 AND c_le > k + 1), " +
       "q05 AS (SELECT lang, round((1 - g) * lo_v + g * COALESCE(hi_v, lo_v), 4) " +
       "AS lo FROM lo05 LEFT JOIN hi05 ON lang = lang2), " +
       "k95 AS (SELECT lang, CAST(FLOOR(i) AS BIGINT) AS k, i - FLOOR(i) AS g " +
       "FROM (SELECT lang, CAST(0.95 AS DOUBLE) * CAST(n - 1 AS DOUBLE) AS i " +
       "FROM t) z), " +
       "lo95 AS (SELECT cc.lang, g, score AS lo_v FROM cc JOIN k95 USING (lang) " +
       "WHERE c_lt <= k AND c_le > k), " +
       "hi95 AS (SELECT cc.lang AS lang2, score AS hi_v FROM cc " +
       "JOIN k95 USING (lang) WHERE c_lt <= k + 1 AND c_le > k + 1), " +
       "q95 AS (SELECT lang, round((1 - g) * lo_v + g * COALESCE(hi_v, lo_v), 4) " +
       "AS hi FROM lo95 LEFT JOIN hi95 ON lang = lang2), " +
       "b AS (SELECT q05.lang, lo, hi FROM q05 JOIN q95 USING (lang)) " +
       "SELECT doc_id, s.lang, score, lo, hi, " +
       "LEAST(GREATEST(score, lo), hi) AS clipped, " +
       "(score < lo OR score > hi) AS was_clipped " +
       "FROM s JOIN b ON s.lang = b.lang ORDER BY doc_id"))
}
