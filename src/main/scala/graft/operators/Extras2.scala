package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Second extras batch: hash functions, exact order statistics,
  * partition-pruned sinks, and the SQL-registered custom expression.
  */
object Extras2 {

  /** X13 — deterministic content-hash sampling: keep documents whose
    * md5(text) prefix falls under a threshold (~10%). Unlike RNG-based
    * df.sample, the sample is reproducible across engines, runs, and
    * repartitionings — the only sane way to carve a stable dev slice out
    * of a 100 TB corpus — and portable enough to oracle. */
  def x13HashSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(graft.api.TextPipeline.hashSamplePredicate(col("text"), 26))
      .select(col("doc_id"), col("lang"),
        substring(md5(col("text").cast("binary")), 1, 2).as("bucket"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x13_hash_sample" -> (x13HashSample _))

  val oracles: Map[String, String] = Map(
    "x13_hash_sample" ->
      ("SELECT doc_id, lang, substr(md5(text), 1, 2) AS bucket FROM documents " +
       "WHERE substr(md5(text), 1, 2) <= '19' ORDER BY doc_id"))
}
