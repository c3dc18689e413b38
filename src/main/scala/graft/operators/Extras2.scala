package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Second extras batch: hash functions, exact order statistics,
  * partition-pruned sinks, and the SQL-registered custom expression.
  */
object Extras2 {

  /** F9 — cryptographic/content hashes (content-addressing and sharding
    * primitives for a data pipeline): md5 + sha256, portable hex. */
  def f9Hash(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        md5(col("p_name").cast("binary")).as("name_md5"),
        sha2(col("p_name").cast("binary"), 256).as("name_sha256"))
      .orderBy(col("p_partkey"))

  /** A9 — order statistics + second moments per group: exact interpolated
    * percentiles (identical formula on both engines given the same sorted
    * multiset); corr/stddev are single-pass co-moments rounded past libm
    * noise. */
  def a9Stats(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("o_totalprice"), lit(0.5)).as("median_total"),
        percentile(col("o_totalprice"), lit(0.9)).as("p90_total"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(stddev_samp(col("l_extendedprice")), 4).as("price_stddev"))
      .orderBy(col("l_returnflag"))
  }

  /** S8 — partitioned sink + partition pruning: orders written
    * year-partitioned, read back with a year predicate; the reread scan
    * lists only the matching partition directories (asserted in
    * Extras2Spec) — the file-layout analog of 100 TB data skipping. */
  def s8PartitionPrune(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    // fixed per-sfDir directory + overwrite: repeated runs rewrite in place
    // instead of leaking a full copy of orders per invocation
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_s8_${(sfDir.hashCode & 0x7fffffff).toHexString}").getAbsolutePath
    Tables.orders(spark, sfDir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    s.read.parquet(dir)
      .filter(col("o_year") === 1997)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_year").cast("long"))
      .orderBy(col("o_orderkey"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f9_hash" -> (f9Hash _),
    "a9_stats" -> (a9Stats _),
    "s8_partition_prune" -> (s8PartitionPrune _),
    "sql3_vector_norm" -> (sql3VectorNorm _))

  val oracles: Map[String, String] = Map(
    "f9_hash" ->
      ("SELECT p_partkey, md5(p_name) AS name_md5, sha256(p_name) AS name_sha256 " +
       "FROM part ORDER BY p_partkey"),
    "a9_stats" ->
      ("SELECT l_returnflag, " +
       "quantile_cont(o_totalprice, 0.5) AS median_total, " +
       "quantile_cont(o_totalprice, 0.9) AS p90_total, " +
       "round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr, " +
       "round(stddev_samp(l_extendedprice), 4) AS price_stddev " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "GROUP BY l_returnflag ORDER BY l_returnflag"),
    "s8_partition_prune" ->
      ("SELECT o_orderkey, o_totalprice, CAST(year(o_orderdate) AS BIGINT) AS o_year " +
       "FROM orders WHERE year(o_orderdate) = 1997 ORDER BY o_orderkey"),
    "sql3_vector_norm" ->
      ("SELECT vec_id, round(SUM(CAST(embedding[i] AS DOUBLE) * " +
       "CAST(embedding[i] AS DOUBLE)), 6) AS norm2 " +
       "FROM embeddings, range(1, 65) r(i) GROUP BY vec_id ORDER BY vec_id"))
}
