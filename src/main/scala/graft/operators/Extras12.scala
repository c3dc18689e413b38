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






  // ---------------------------------------------------------------- x138

  /** X138 — pareto frontier (skyline; Börzsönyi ICDE'01): the customers
    * no other customer dominates on (order count, total spend) — the
    * "best tradeoff" shortlist every multi-objective report wants
    * (catalog picks by price-vs-rating, model picks by cost-vs-quality).
    * Dominance: q beats p when q is ≥ on both axes and > on at least
    * one; equal points are mutually non-dominating, so every customer
    * on a non-dominated point ships.
    *
    * Scale shape: the corpus is NEVER pairwise-compared. Skyline
    * membership for 2-D reduces to per-x structure — a point survives
    * iff its y is its x-group's max AND strictly exceeds every
    * higher-x group's max — so the plan is one grouped aggregate to the
    * distinct-x table (bounded by the x domain, order counts here),
    * a prefix-max over THAT aggregate (spelled as a bounded theta
    * join, not a single-partition window), and one equi-join back.
    * The full-table NOT-EXISTS O(n²) form survives only as the oracle.
    * Both axes are exact (an integer count and a raw stored MAX — were
    * an axis a float SUM, "equal on one axis" would be summation-order
    * dependent; use a DECIMAL total instead). For an unbounded x
    * domain, equi-width bucket x first and refine inside the boundary
    * bucket — same plan, one more level. */
  def x138Pareto(spark: SparkSession, sfDir: String): DataFrame = {
    // axes chosen for a REAL tradeoff: order count vs the customer's
    // single largest order (count-vs-spend degenerates — the most
    // frequent customer nearly always also has the top total, and the
    // frontier collapses to one row at every SF). best_order is a raw
    // MAX of stored values — no arithmetic, so dominance ties compare
    // exactly in both engines with no decimal policy needed.
    val pts = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        max(col("o_totalprice")).as("best_order"))
    paretoFrontier(pts, "n_orders", "best_order")
      .select(col("o_custkey").cast("long").as("o_custkey"),
        col("n_orders"), col("best_order"))
      .orderBy(col("n_orders").desc, col("o_custkey"))
  }

  /** The 2-D maximize-both skyline core; exposed for the spec's brute
    * cross-check. Keeps every input column of the surviving rows. */
  def paretoFrontier(pts: DataFrame, x: String, y: String): DataFrame = {
    val best = pts.groupBy(col(x)).agg(max(col(y)).as("__besty"))
    val hi = best.select(col(x).as("__qx"), col("__besty").as("__qy"))
    // prefix-max over the distinct-x aggregate: for each x, the best y
    // among STRICTLY larger x (null when none) — a theta join of two
    // aggregate-bounded frames, broadcastable by construction
    val runmax = best.join(hi, col("__qx") > col(x), "left")
      .groupBy(col(x), col("__besty"))
      .agg(max(col("__qy")).as("__runmax"))
    pts.join(runmax, Seq(x))
      .filter(col(y) === col("__besty") &&
        (col("__runmax").isNull || col(y) > col("__runmax")))
      .drop("__besty", "__runmax")
  }

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
    "x138_pareto" -> (x138Pareto _),
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
       "GROUP BY c_nationkey ORDER BY c_nationkey"),
    // deliberately the textbook O(n²) NOT-EXISTS dominance predicate —
    // a formulation with nothing in common with the prefix-max plan
    "x138_pareto" ->
      ("WITH p AS MATERIALIZED (SELECT o_custkey, " +
       "CAST(COUNT(*) AS BIGINT) AS n_orders, " +
       "CAST(MAX(o_totalprice) AS DOUBLE) AS best_order " +
       "FROM orders GROUP BY o_custkey) " +
       "SELECT CAST(o_custkey AS BIGINT) AS o_custkey, n_orders, " +
       "best_order FROM p " +
       "WHERE NOT EXISTS (SELECT 1 FROM p q " +
       "WHERE q.n_orders >= p.n_orders AND q.best_order >= p.best_order " +
       "AND (q.n_orders > p.n_orders OR q.best_order > p.best_order)) " +
       "ORDER BY n_orders DESC, o_custkey"))
}
