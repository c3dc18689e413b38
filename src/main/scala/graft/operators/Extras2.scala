package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Second extras batch: hash functions, exact order statistics,
  * partition-pruned sinks, and the SQL-registered custom expression.
  */
object Extras2 {

  /** S8 — partitioned sink + partition pruning: orders written
    * year-partitioned, read back with a year predicate; the reread scan
    * lists only the matching partition directories (asserted in
    * Extras2Spec) — the file-layout analog of 100 TB data skipping. */
  def s8PartitionPrune(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    // fixed per-(process, sfDir) directory + overwrite: repeated runs
    // rewrite in place instead of leaking a full copy of orders per
    // invocation, and concurrent processes never share the path
    val dir = Tables.scratchDir("s8", sfDir)
    Tables.orders(spark, sfDir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    s.read.parquet(dir)
      .filter(col("o_year") === 1997)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_year").cast("long"))
      .orderBy(col("o_orderkey"))
  }

  /** S14 — dynamic partition overwrite (partitioned-sink maintenance):
    * the full table is laid out partitioned by priority, then ONE
    * partition is re-stated with corrected prices under
    * `partitionOverwriteMode=DYNAMIC` — only partitions present in the
    * incremental frame are replaced, the other four stay untouched.
    * This is the daily-restatement primitive of a partitioned 100 TB
    * warehouse (re-run one day, never rewrite the table). The read-back
    * aggregate proves both halves: the target partition carries the
    * corrected values and the untouched partitions still carry the
    * originals (a static overwrite would have emptied them). */
  def s14DynamicOverwrite(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val dir = Tables.scratchDir("s14_dynover", sfDir)
    // per-write option, NOT session conf: scoping the mode to the writer
    // leaves the session untouched, so concurrent queries on the same
    // SparkSession can never observe a half-set overwrite mode
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.mode("overwrite").option("partitionOverwriteMode", "STATIC")
      .partitionBy("o_orderpriority").parquet(dir)
    Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"),
        (col("o_totalprice") * 1.1).as("o_totalprice"),
        col("o_orderpriority"))
      .write.mode("overwrite").option("partitionOverwriteMode", "DYNAMIC")
      .partitionBy("o_orderpriority").parquet(dir)
    s.read.parquet(dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        graft.Det.dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** SQL3 — the custom codegen expression registered into the session
    * FunctionRegistry and called from a SQL string: vector self-dot
    * (≈1.0 for the unit-normalized corpus). */
  def sql3VectorNorm(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("v_embeddings")
    spark.sql(
      """SELECT vec_id, round(graft_dot(embedding, embedding), 6) AS norm2
        |FROM v_embeddings ORDER BY vec_id""".stripMargin)
  }

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
    "x13_hash_sample" -> (x13HashSample _),
    "s8_partition_prune" -> (s8PartitionPrune _),
    "s14_dynamic_overwrite" -> (s14DynamicOverwrite _),
    "sql3_vector_norm" -> (sql3VectorNorm _))

  val oracles: Map[String, String] = Map(
    "x13_hash_sample" ->
      ("SELECT doc_id, lang, substr(md5(text), 1, 2) AS bucket FROM documents " +
       "WHERE substr(md5(text), 1, 2) <= '19' ORDER BY doc_id"),
    "s8_partition_prune" ->
      ("SELECT o_orderkey, o_totalprice, CAST(year(o_orderdate) AS BIGINT) AS o_year " +
       "FROM orders WHERE year(o_orderdate) = 1997 ORDER BY o_orderkey"),
    "s14_dynamic_overwrite" ->
      ("SELECT o_orderpriority, COUNT(*) AS n, " +
       "CAST(SUM(CAST(CASE WHEN o_orderpriority = '1-URGENT' " +
       "THEN o_totalprice * 1.1 ELSE o_totalprice END AS DECIMAL(18,4))) " +
       "AS DOUBLE) AS revenue " +
       "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "sql3_vector_norm" ->
      ("SELECT vec_id, round(SUM(CAST(embedding[i] AS DOUBLE) * " +
       "CAST(embedding[i] AS DOUBLE)), 6) AS norm2 " +
       "FROM embeddings, range(1, 65) r(i) GROUP BY vec_id ORDER BY vec_id"))
}
