package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Det, Tables}

/** Round-9 wave: the SQL-text DML surface (INSERT INTO VALUES / INSERT
  * INTO SELECT / INSERT OVERWRITE, CREATE TABLE AS SELECT) — the
  * reference's insert-oriented core capability (SURVEY §1.1 [PK-high])
  * exercised through actual SQL statements against catalog parquet
  * tables, not only through `createDataFrame` (S6) — plus the round-9
  * analytics additions.
  */
object Extras12 {






  // ---------------------------------------------------------------- x139

  /** X139 — incremental maintenance of a JOIN-aggregate view under a
    * CDC feed (the delta-join rule ΔV = γ(ΔO ⋈ C) merged into V —
    * x113's retraction algebra extended across a join): the per-nation
    * (count, revenue) MV over orders ⋈ customer is maintained under
    * order UPDATES (key % 7 = 0: price restated +50.00, emitted as
    * retraction + insertion) and DELETES (key % 11 = 0: retraction
    * only; delete wins on overlap, x113's rule).
    *
    * The IVM point this row adds over x113: delta rows don't carry
    * their group key — each must be ENRICHED against the dimension to
    * find its nation. The maintenance plan is delta ⋈ broadcast(dim)
    * (delta-sized, the streaming-fact enrichment shape), one grouped
    * signed aggregate, one full-outer merge into the base MV; the
    * base join is NEVER rescanned and groups retracted to zero are
    * dropped. The oracle recomputes the view from the corrected order
    * set, value-checking the whole algebra. */
  def x139JoinIvm(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"),
      col("o_custkey"), col("o_totalprice").cast(Det.Money).as("price"))
    val dim = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
    maintainJoinAggMv(o, dim)
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        col("n"), col("t").cast("double").as("total"))
      .orderBy(col("c_nationkey"))
  }

  /** The delta-join maintenance core over an (o_orderkey, o_custkey,
    * price DECIMAL) fact and a (c_custkey, c_nationkey) dimension;
    * returns the maintained (c_nationkey, n, t) MV. Exposed for
    * spec-level group-drop checks on planted data. */
  def maintainJoinAggMv(o: DataFrame, dim: DataFrame): DataFrame = {
    val base = o.join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("price")).as("total"))
    val touched = o.filter(col("o_orderkey") % 7 === 0 ||
      col("o_orderkey") % 11 === 0)
    val retract = touched.select(col("o_custkey"), lit(-1L).as("m"),
      col("price"))
    val insert = touched.filter(col("o_orderkey") % 11 =!= 0)
      .select(col("o_custkey"), lit(1L).as("m"),
        (col("price") + lit(50.00).cast(Det.Money)).as("price"))
    val delta = retract.unionByName(insert)
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("m")).as("dn"), sum(col("m") * col("price")).as("dt"))
    base.join(delta, Seq("c_nationkey"), "full_outer")
      .select(col("c_nationkey"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n"),
        (coalesce(col("total"), lit(0).cast(Det.Money)) +
          coalesce(col("dt"), lit(0).cast(Det.Money))).as("t"))
      .filter(col("n") > 0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x139_join_ivm" -> (x139JoinIvm _))

  val oracles: Map[String, String] = Map(
    // the corrected order set restated from scratch — the IVM algebra
    // (retraction, delta-join enrichment, group drop) is value-checked
    "x139_join_ivm" ->
      ("WITH corrected AS MATERIALIZED (SELECT o_orderkey, o_custkey, " +
       "CASE WHEN o_orderkey % 7 = 0 " +
       "THEN CAST(o_totalprice AS DECIMAL(18,4)) + 50.00 " +
       "ELSE CAST(o_totalprice AS DECIMAL(18,4)) END AS price " +
       "FROM orders WHERE o_orderkey % 11 <> 0) " +
       "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, " +
       "CAST(COUNT(*) AS BIGINT) AS n, " +
       "CAST(SUM(price) AS DOUBLE) AS total " +
       "FROM corrected JOIN customer ON o_custkey = c_custkey " +
       "GROUP BY c_nationkey ORDER BY c_nationkey"))
}
