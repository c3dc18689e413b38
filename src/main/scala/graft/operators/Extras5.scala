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

  /** The x41/x42 corpus: originals plus the planted clone shard. The
    * test corpus is near-orthogonal (max ambient pair 0.51, see x2), so
    * near-dups are PLANTED the x20/x32 way: every 5th vector re-appears
    * (vec_id + 1,000,000) with dimensions 0 and 32 sign-flipped — the
    * 2-of-64-dimension clone a re-encoded copy produces, cosine =
    * 1 − 2(v₀² + v₃₂²) ≈ 0.94. Sign-flip is exact in IEEE float, so
    * both engines compute identical planted vectors. */
  /** Offset for planted clone ids. [[cloneCorpus]] asserts the real id
    * range stays below it, so clone ids can never silently collide with
    * corpus ids (which would corrupt x41/x42/x46 verdicts). */
  val CloneOffset = 1000000L

  def cloneCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    // id-collision guard, run once per (session, sfDir): one max() agg
    // over the id column (a column-stat-grade job), memoized so repeat
    // corpus constructions in the same session don't re-scan
    graft.Memo(spark, s"x41offset:$sfDir") {
      val mx = emb.agg(max(col("vec_id")).as("mx"))
      require(mx.head.getLong(0) < CloneOffset,
        s"clone ids would collide: max(vec_id) >= $CloneOffset")
      mx.localCheckpoint(true)
    }
    emb.union(emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + CloneOffset).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i % 32 === 0, -x).otherwise(x)).as("embedding")))
  }

  /** Verified near-dup pairs over [[cloneCorpus]] — x41 emits them,
    * x42 consumes them. Staged cross-process since round 10 (VERDICT
    * r9 #3): the banded build runs once per corpus; later processes
    * reload the verified pair table (the x51 PQ-model pattern). */
  private[graft] def clonePairs(spark: SparkSession,
      sfDir: String): DataFrame =
    Tables.stagedFrame(spark, "clone_pairs", sfDir, "embeddings",
        "b8_t08") {
      graft.api.VectorPipeline.bandedCosinePairs(
        cloneCorpus(spark, sfDir), "vec_id", "embedding", 0.8)
    }

  /** X41 — banded embedding near-dedup, the "drop vectors ≥ t cosine to
    * an earlier vector" pipeline op x2 is the quadratic baseline of:
    * candidates from [[graft.api.VectorPipeline.bandedCosinePairs]]
    * (exact sub-vector bands — Manku et al., WWW'07 — hashed once, one
    * band-keyed shuffle, NEVER all-pairs), exact cosine verify ≥ 0.8 on
    * candidates only. Pigeonhole over 8 bands guarantees every planted
    * clone pair ([[cloneCorpus]]) shares ≥ 6 bands, so banded recall vs
    * the exhaustive oracle is exact BY CONSTRUCTION, not by LSH luck;
    * ambient pairs never reach the 0.8 verify bar. */
  def x41EmbedNearDup(spark: SparkSession, sfDir: String): DataFrame =
    clonePairs(spark, sfDir).orderBy(col("id_a"), col("id_b"))

  /** X42 — the dedup MATERIALIZATION x41's pairs feed (VERDICT r4's
    * "the pipeline op a 100 TB curator actually runs"): keep a vector
    * iff it has no near-duplicate among EARLIER vectors (smaller id —
    * "first occurrence wins", x22's rule in embedding space). Pairs are
    * (id_a < id_b), so a vector drops exactly when it appears as some
    * pair's id_b; the verdict is one anti-join-shaped left join against
    * the tiny distinct dropped set. Banded pair volume, never
    * all-pairs; the oracle recomputes the rule from exhaustive pairs
    * with NOT IN. */
  def x42EmbedDedupKeep(spark: SparkSession, sfDir: String): DataFrame = {
    val dropped = clonePairs(spark, sfDir)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("hit", lit(1))
    cloneCorpus(spark, sfDir).select(col("vec_id"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("hit").isNull.as("kept"))
      .orderBy(col("vec_id"))
  }

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
    "x41_embed_neardup" -> (x41EmbedNearDup _),
    "x42_embed_dedup_keep" -> (x42EmbedDedupKeep _),
    "x43_winsorize" -> (x43Winsorize _))

  /** Shared oracle text for the x41/x42 corpus: the UNION base and the
    * exhaustive verified-pairs query (sign-flips applied inside the
    * dot so the planted clones never materialize as lists). */
  private[operators] val CloneBaseSql =
    "SELECT vec_id, embedding, FALSE AS aug FROM embeddings " +
    "UNION ALL SELECT vec_id + 1000000, embedding, TRUE " +
    "FROM embeddings WHERE vec_id % 5 = 0"
  private[operators] def cloneDotTerm(side: String): String =
    s"(CASE WHEN $side.aug AND (i - 1) % 32 = 0 " +
    s"THEN -CAST($side.embedding[i] AS DOUBLE) " +
    s"ELSE CAST($side.embedding[i] AS DOUBLE) END)"
  private val ClonePairsSql =
    "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
    s"round(SUM(${cloneDotTerm("a")} * ${cloneDotTerm("b")}), 6) AS sim " +
    "FROM base a, base b, range(1, 65) r(i) " +
    "WHERE a.vec_id < b.vec_id GROUP BY a.vec_id, b.vec_id " +
    s"HAVING round(SUM(${cloneDotTerm("a")} * ${cloneDotTerm("b")}), 6) " +
    ">= 0.8"

  val oracles: Map[String, String] = Map(
    // EXHAUSTIVE exact pairs over the same constructed corpus (the x2
    // shape with the planted sign-flips applied inside the dot): the
    // banded Spark side must find exactly these — recall is the claim
    "x41_embed_neardup" ->
      (s"WITH base AS ($CloneBaseSql) $ClonePairsSql ORDER BY id_a, id_b"),
    // first-occurrence-wins from the exhaustive pairs: kept iff never
    // some pair's larger id
    "x42_embed_dedup_keep" ->
      (s"WITH base AS ($CloneBaseSql), p AS ($ClonePairsSql) " +
       "SELECT vec_id, vec_id NOT IN (SELECT id_b FROM p) AS kept " +
       "FROM base ORDER BY vec_id"),
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
