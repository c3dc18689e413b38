package graft.operators

import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector}
import org.apache.spark.sql.{DataFrame, GraftArrow, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import graft.{Det, Tables}

/** Round-7 wave: the Arrow-vectorized batch seam (f23), dynamic
  * partition pruning (s22), and two training-data ops — the composed
  * curation funnel (x58) and the leakage-safe cluster split (x60).
  */
object Extras8 {

  /** X58 — composed curation funnel (the end-to-end shape a crawl
    * pipeline runs nightly, with per-stage observability): language
    * gate → length gate → exact dedup, emitted as one funnel table
    * (stage, n_docs, n_chars_total). Stage counts 0–2 are INDEPENDENT
    * conditional aggregates in a single scan (x53's
    * adding-checks-never-adds-scans discipline); only the dedup stage
    * adds a grouped pass, keyed by the text itself (exact equality —
    * x22's min-id keep rule on whole documents). Nothing is
    * re-scanned per stage, so the funnel costs one scan + one
    * vocabulary-sized shuffle at any corpus size. */
  def x58CurationFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val langOk = col("lang") === "en"
    val lenOk = langOk && col("n_chars").between(120, 350)
    val stages = d.agg(
      count(lit(1)).as("n0"),
      sum(col("n_chars")).as("c0"),
      sum(when(langOk, 1L).otherwise(0L)).as("n1"),
      sum(when(langOk, col("n_chars")).otherwise(0L)).as("c1"),
      sum(when(lenOk, 1L).otherwise(0L)).as("n2"),
      sum(when(lenOk, col("n_chars")).otherwise(0L)).as("c2"))
    val kept = d.filter(lenOk)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"),
        min(col("n_chars")).as("nc"))
      .agg(count(lit(1)).as("n3"), sum(col("nc")).as("c3"))
    stages.crossJoin(kept)
      .select(explode(array(
        struct(lit("0_raw").as("stage"), col("n0").as("n_docs"),
          col("c0").as("n_chars_total")),
        struct(lit("1_lang").as("stage"), col("n1").as("n_docs"),
          col("c1").as("n_chars_total")),
        struct(lit("2_length").as("stage"), col("n2").as("n_docs"),
          col("c2").as("n_chars_total")),
        struct(lit("3_dedup").as("stage"), col("n3").as("n_docs"),
          col("c3").as("n_chars_total")))).as("kv"))
      .select(col("kv.stage").as("stage"), col("kv.n_docs").as("n_docs"),
        col("kv.n_chars_total").as("n_chars_total"))
      .orderBy(col("stage"))
  }

  /** X60 — leakage-safe train/val/test split: assignment is by
    * NEAR-DUP CLUSTER, not by document, so two near-duplicate
    * documents can never land in different splits (the
    * train-contaminates-eval failure mode of naive row-hash splits).
    * Clusters come from the memoized verified near-dup pairs
    * (l2/x12's large-star/small-star CC); singleton documents are
    * their own cluster. The split function is rep % 10 (8/1/1) — a
    * pure function of the cluster representative, deterministic and
    * engine-portable (a production deployment substitutes a salted
    * hash; the CONTRACT is cluster-atomicity, which the oracle
    * re-verifies by recomputing clusters recursively from scratch). */
  def x60LeakageSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val cc = Dedup.ccLabelsFrame(spark, sfDir)
    Tables.documents(spark, sfDir).select(col("doc_id"), col("n_chars"))
      .join(cc, Seq("doc_id"), "left_outer")
      .withColumn("rep", coalesce(col("cluster_rep"), col("doc_id")))
      .withColumn("split",
        when(pmod(col("rep"), lit(10L)) < 8, "train")
          .when(pmod(col("rep"), lit(10L)) === 8, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("rep"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** X62 — training-mixture report: the TOP-20 sources' corpus shares
    * with cumulative coverage in size order — the table a data-mixing
    * run reads before choosing sampling temperatures (x35 consumes
    * exactly these proportions). Scale shape: one grouped aggregate
    * (per-source totals), a distributed top-k
    * (TakeOrderedAndProject — never a global sort), and THEN the
    * global cumulative window, which by construction sees only the k
    * retained rows (PlanLint's single-partition-window rule exempts
    * limit-bounded windows for exactly this shape). Shares stay
    * fractions of the FULL corpus total, so truncation is visible as
    * cum_share < 1 rather than silently renormalized — at web scale
    * with millions of domains the tail's share is the honest
    * remainder. */
  def x62MixtureReport(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    val total = s.agg(sum(col("chars")).as("total"))
    val top = s.orderBy(col("chars").desc, col("source")).limit(20)
    val w = Window.orderBy(col("chars").desc, col("source"))
    top.crossJoin(total)
      .select(col("source"), col("n_docs"), col("chars"),
        (col("chars").cast("double") / col("total")).as("share"),
        (sum(col("chars")).over(w).cast("double") / col("total"))
          .as("cum_share"))
      .orderBy(col("chars").desc, col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x58_curation_funnel" -> (x58CurationFunnel _),
    "x60_leakage_split" -> (x60LeakageSplit _),
    "x62_mixture_report" -> (x62MixtureReport _))

  val oracles: Map[String, String] = Map(
    "x58_curation_funnel" ->
      ("WITH base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0, " +
       "CAST(SUM(n_chars) AS BIGINT) AS c0, " +
       "CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n1, " +
       "CAST(SUM(CASE WHEN lang = 'en' THEN n_chars ELSE 0 END) AS BIGINT) AS c1, " +
       "CAST(SUM(CASE WHEN lang = 'en' AND n_chars BETWEEN 120 AND 350 " +
       "THEN 1 ELSE 0 END) AS BIGINT) AS n2, " +
       "CAST(SUM(CASE WHEN lang = 'en' AND n_chars BETWEEN 120 AND 350 " +
       "THEN n_chars ELSE 0 END) AS BIGINT) AS c2 FROM documents), " +
       "ded AS (SELECT CAST(COUNT(*) AS BIGINT) AS n3, " +
       "CAST(SUM(nc) AS BIGINT) AS c3 FROM (" +
       "SELECT text, MIN(doc_id) AS keep_id, MIN(n_chars) AS nc " +
       "FROM documents WHERE lang = 'en' AND n_chars BETWEEN 120 AND 350 " +
       "GROUP BY text) t) " +
       "SELECT stage, n_docs, n_chars_total FROM (" +
       "SELECT '0_raw' AS stage, n0 AS n_docs, c0 AS n_chars_total FROM base " +
       "UNION ALL SELECT '1_lang', n1, c1 FROM base " +
       "UNION ALL SELECT '2_length', n2, c2 FROM base " +
       "UNION ALL SELECT '3_dedup', n3, c3 FROM ded) u ORDER BY stage"),
    // clusters recomputed recursively from scratch (x12's oracle),
    // widened to every document; split restated from rep % 10
    "x60_leakage_split" ->
      (s"WITH RECURSIVE s AS (SELECT DISTINCT doc_id, ngram FROM (${TextOps.ngramSql(3)}) t), " +
       "n AS (SELECT doc_id, COUNT(*) AS n_sh FROM s GROUP BY doc_id), " +
       "i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter " +
       "FROM s a JOIN s b ON a.ngram = b.ngram AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
       "pairs AS (SELECT doc_a, doc_b FROM i " +
       "JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b " +
       "WHERE inter / (na.n_sh + nb.n_sh - inter) > 0.6), " +
       "edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs " +
       "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
       "reach AS (SELECT DISTINCT a AS src, a AS dst FROM edges " +
       "UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a), " +
       "cc AS (SELECT src AS doc_id, MIN(dst) AS cluster_rep FROM reach " +
       "GROUP BY src) " +
       "SELECT d.doc_id, COALESCE(cc.cluster_rep, d.doc_id) AS rep, " +
       "CASE WHEN COALESCE(cc.cluster_rep, d.doc_id) % 10 < 8 THEN 'train' " +
       "WHEN COALESCE(cc.cluster_rep, d.doc_id) % 10 = 8 THEN 'val' " +
       "ELSE 'test' END AS split " +
       "FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id " +
       "ORDER BY d.doc_id"),
    "x62_mixture_report" ->
      ("WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
       "CAST(SUM(n_chars) AS BIGINT) AS chars FROM documents GROUP BY 1), " +
       "t AS (SELECT CAST(SUM(chars) AS BIGINT) AS total FROM s), " +
       "top AS (SELECT * FROM s ORDER BY chars DESC, source LIMIT 20) " +
       "SELECT source, n_docs, chars, " +
       "CAST(chars AS DOUBLE) / total AS share, " +
       "CAST(CAST(SUM(chars) OVER (ORDER BY chars DESC, source) AS BIGINT) " +
       "AS DOUBLE) / total AS cum_share " +
       "FROM top CROSS JOIN t ORDER BY chars DESC, source"))
}
