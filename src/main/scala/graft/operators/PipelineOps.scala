package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data curation operators beyond the core dedup/quality set:
  * benchmark-contamination detection, intra-document repetition filters
  * (the Gopher-style "rep" signals), and stratified deterministic
  * sampling with inverse-propensity weights (the domain-mixing
  * primitive).
  *
  * Scale posture: x17 joins the corpus against a benchmark n-gram set
  * that is tiny and fixed in practice (an eval suite, not a second
  * corpus), so the join broadcasts the benchmark side and the 100 TB
  * corpus is never shuffled — only matched rows reach the aggregate.
  * x18 is pure per-row column work (zero shuffles, SF-invariant). x19 is
  * a pushable filter + per-row hash, the same reproducible-slice shape
  * as x13.
  */
object PipelineOps {

  /** X17 — benchmark-contamination check: flag corpus documents sharing
    * any word 3-gram with the "eval set" (here the deterministic
    * `doc_id % 97 == 0` slice stands in for a benchmark suite). Emits
    * per contaminated doc the count of distinct shared 3-grams and of
    * eval docs hit.
    *
    * The eval gram set is benchmark-sized (thousands of docs at most),
    * so AQE broadcasts it; the corpus side stays un-shuffled until the
    * per-doc aggregate over matches only. Swap the `% 97` slice for a
    * real benchmark table at deployment — the plan shape is unchanged.
    */
  def x17Contamination(spark: SparkSession, sfDir: String): DataFrame = {
    val grams = graft.api.TextPipeline.shingles(
      Tables.documents(spark, sfDir), "doc_id", "text", 3)
    val eval = grams.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"), col("ngram"))
    val corpus = grams.filter(col("doc_id") % 97 =!= 0)
    corpus.join(eval, "ngram")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("ngram")).as("n_shared"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .orderBy(col("doc_id"))
  }

  /** Per-row repetition metrics for [[x18Repetition]] — exposed for the
    * unit layer. Returns (dup_gram_frac, top_word_frac): the fraction of
    * duplicated word 3-grams and the highest single-word share. Pure
    * column expressions: no shuffle, no UDF. */
  def repetitionMetrics(textCol: Column): (Column, Column) = {
    val words = split(textCol, " ")
    val grams = graft.api.TextPipeline.ngramsCol(textCol, 3)
    val dupFrac = round(
      lit(1.0) - size(array_distinct(grams)) / size(grams), 6)
    val topFrac = round(
      array_max(transform(array_distinct(words),
        u => size(filter(words, x => x === u)))) / size(words), 6)
    (dupFrac, topFrac)
  }

  /** X18 — intra-document repetition filter (Gopher-style quality
    * signal): duplicate-3-gram fraction and top-word dominance per doc,
    * plus the keep/drop verdict. Everything is per-row array math, so
    * the plan is a single codegen'd scan at any corpus size. */
  def x18Repetition(spark: SparkSession, sfDir: String): DataFrame = {
    val (dupFrac, topFrac) = repetitionMetrics(col("text"))
    Tables.documents(spark, sfDir)
      // a doc with < 3 words has no 3-gram, like the oracle's WHERE
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), dupFrac.as("dup_gram_frac"),
        topFrac.as("top_word_frac"))
      .withColumn("repetitive",
        col("dup_gram_frac") > 0.02 || col("top_word_frac") > 0.2)
      .orderBy(col("doc_id"))
  }

  /** X19 — stratified deterministic sampling: per-language md5-bucket
    * thresholds down-sample the dominant language (en keeps 16/256,
    * the rest 64/256) and each kept row carries its inverse-propensity
    * weight, so weighted statistics over the sample are unbiased — the
    * domain-mixing primitive of a pretraining pipeline. Like x13 the
    * sample is reproducible across engines, runs, and repartitionings,
    * and the predicate is pushable (hash of one column, no shuffle). */
  def x19StratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val threshold = when(col("lang") === "en", lit("0f")).otherwise(lit("3f"))
    val weight = when(col("lang") === "en", lit(16.0)).otherwise(lit(4.0))
    Tables.documents(spark, sfDir)
      .withColumn("bucket", substring(md5(col("text").cast("binary")), 1, 2))
      .filter(col("bucket") <= threshold)
      .select(col("doc_id"), col("lang"), col("bucket"), weight.as("weight"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x17_contamination" -> (x17Contamination _),
    "x18_repetition" -> (x18Repetition _),
    "x19_stratified_sample" -> (x19StratifiedSample _))

  val oracles: Map[String, String] = Map(
    "x17_contamination" ->
      (s"WITH g AS (SELECT DISTINCT doc_id, ngram FROM (${TextOps.ngramSql(3)}) t), " +
       "ev AS (SELECT doc_id AS eval_id, ngram FROM g WHERE doc_id % 97 = 0) " +
       "SELECT c.doc_id, COUNT(DISTINCT c.ngram) AS n_shared, " +
       "COUNT(DISTINCT ev.eval_id) AS n_eval_docs " +
       "FROM g c JOIN ev ON c.ngram = ev.ngram WHERE c.doc_id % 97 <> 0 " +
       "GROUP BY c.doc_id ORDER BY doc_id"),
    "x18_repetition" ->
      ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents), " +
       "g AS (SELECT doc_id, words, len(words) AS n_words, " +
       "[array_to_string(list_slice(words, i + 1, i + 3), ' ') " +
       "FOR i IN range(0, len(words) - 2)] AS grams " +
       "FROM w WHERE len(words) >= 3), " +
       "r AS (SELECT doc_id, " +
       "round(1.0 - len(list_distinct(grams)) / len(grams), 6) AS dup_gram_frac, " +
       "round(list_max([len(list_filter(words, x -> x = u)) " +
       "FOR u IN list_distinct(words)]) / n_words, 6) AS top_word_frac FROM g) " +
       "SELECT doc_id, dup_gram_frac, top_word_frac, " +
       "(dup_gram_frac > 0.02 OR top_word_frac > 0.2) AS repetitive " +
       "FROM r ORDER BY doc_id"),
    "x19_stratified_sample" ->
      ("SELECT doc_id, lang, substr(md5(text), 1, 2) AS bucket, " +
       "CAST(CASE WHEN lang = 'en' THEN 16.0 ELSE 4.0 END AS DOUBLE) AS weight " +
       "FROM documents " +
       "WHERE substr(md5(text), 1, 2) <= (CASE WHEN lang = 'en' THEN '0f' ELSE '3f' END) " +
       "ORDER BY doc_id"))
}
