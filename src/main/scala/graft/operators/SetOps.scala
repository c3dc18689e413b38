package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Set operations — SURVEY §2.6 (O3–O7). Bag vs set semantics follow
  * ANSI: UNION ALL concatenates partitions (no shuffle), the distinct
  * variants hash-shuffle on the full row, INTERSECT/EXCEPT ALL preserve
  * multiplicities via Spark's native intersectAll/exceptAll.
  */
object SetOps {

  import Det.{sql => d}

  private def urgentKeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"))

  private def bigKeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_custkey"))

  /** O3 — UNION ALL (bag union; overlapping slices stay duplicated). */
  def o3UnionAll(spark: SparkSession, sfDir: String): DataFrame =
    urgentKeys(spark, sfDir).unionByName(bigKeys(spark, sfDir))
      .orderBy(col("o_orderkey"), col("o_custkey"))

  /** O4 — UNION (set union). */
  def o4UnionDistinct(spark: SparkSession, sfDir: String): DataFrame =
    urgentKeys(spark, sfDir).union(bigKeys(spark, sfDir)).distinct()
      .orderBy(col("o_orderkey"), col("o_custkey"))

  private def heavyParts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).filter(col("l_quantity") > 40.0)
      .select(col("l_partkey"))

  private def discountedParts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).filter(col("l_discount") > 0.05)
      .select(col("l_partkey"))

  /** O5 — INTERSECT ALL (multiset intersection: min of multiplicities). */
  def o5IntersectAll(spark: SparkSession, sfDir: String): DataFrame =
    heavyParts(spark, sfDir).intersectAll(discountedParts(spark, sfDir))
      .orderBy(col("l_partkey"))

  /** O6 — EXCEPT ALL (multiset difference). */
  def o6ExceptAll(spark: SparkSession, sfDir: String): DataFrame =
    heavyParts(spark, sfDir).exceptAll(discountedParts(spark, sfDir))
      .orderBy(col("l_partkey"))

  /** O7 — exact dedup tiers: DISTINCT on a projection, and keyed
    * dropDuplicates emitted as keys only (the kept row is arbitrary —
    * SURVEY §7.3#7 — so only the key is part of the contract). */
  def o7Distinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .dropDuplicates(Seq("l_orderkey"))
      .select(col("l_orderkey"))
      .orderBy(col("l_orderkey"))

  /** O8 — pagination: total order + LIMIT/OFFSET via the native
    * Dataset.offset operator (rows 101–150 of customers by balance). */
  def o8Offset(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      .offset(100)
      .limit(50)
  /** O9 — unionByName with missing columns: the schema-drift append
    * (generation 2 added a column, generation 1 lacks it) — missing
    * columns null-fill per side, matched BY NAME not position. The
    * per-side null accounting proves which side filled what. */
  def o9UnionMissingCols(spark: SparkSession, sfDir: String): DataFrame = {
    val gen1 = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    val gen2 = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    gen1.unionByName(gen2, allowMissingColumns = true)
      .groupBy((col("s_suppkey") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"),
        count(col("s_acctbal")).as("n_with_bal"),
        count(col("s_nationkey")).as("n_with_nation"),
        Det.dsum(col("s_acctbal")).as("sum_bal"))
      .orderBy(col("bucket"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o3_union_all" -> (o3UnionAll _),
    "o4_union_distinct" -> (o4UnionDistinct _),
    "o5_intersect_all" -> (o5IntersectAll _),
    "o6_except_all" -> (o6ExceptAll _),
    "o7_distinct" -> (o7Distinct _),
    "o8_offset" -> (o8Offset _),
    "o9_union_missing" -> (o9UnionMissingCols _))

  val oracles: Map[String, String] = Map(
    "o3_union_all" ->
      ("SELECT * FROM (SELECT o_orderkey, o_custkey FROM orders " +
       "WHERE o_orderpriority = '1-URGENT' UNION ALL " +
       "SELECT o_orderkey, o_custkey FROM orders " +
       "WHERE o_totalprice > 400000.0) t ORDER BY o_orderkey, o_custkey"),
    "o4_union_distinct" ->
      ("SELECT * FROM (SELECT o_orderkey, o_custkey FROM orders " +
       "WHERE o_orderpriority = '1-URGENT' UNION " +
       "SELECT o_orderkey, o_custkey FROM orders " +
       "WHERE o_totalprice > 400000.0) t ORDER BY o_orderkey, o_custkey"),
    "o5_intersect_all" ->
      ("SELECT * FROM (SELECT l_partkey FROM lineitem WHERE l_quantity > 40.0 " +
       "INTERSECT ALL SELECT l_partkey FROM lineitem WHERE l_discount > 0.05) t " +
       "ORDER BY l_partkey"),
    "o6_except_all" ->
      ("SELECT * FROM (SELECT l_partkey FROM lineitem WHERE l_quantity > 40.0 " +
       "EXCEPT ALL SELECT l_partkey FROM lineitem WHERE l_discount > 0.05) t " +
       "ORDER BY l_partkey"),
    "o7_distinct" ->
      "SELECT DISTINCT l_orderkey FROM lineitem ORDER BY l_orderkey",
    "o8_offset" ->
      ("SELECT c_custkey, c_name, c_acctbal FROM customer " +
       "ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 50 OFFSET 100"),
    "o9_union_missing" ->
      ("WITH u AS (SELECT s_suppkey, s_acctbal, NULL AS s_nationkey " +
       "FROM supplier " +
       "UNION ALL SELECT s_suppkey, NULL AS s_acctbal, s_nationkey " +
       "FROM supplier) " +
       "SELECT s_suppkey % 10 AS bucket, COUNT(*) AS n, " +
       "COUNT(s_acctbal) AS n_with_bal, " +
       "COUNT(s_nationkey) AS n_with_nation, " +
       s"${d.dsum("s_acctbal")} AS sum_bal " +
       "FROM u GROUP BY 1 ORDER BY bucket"))
}
