package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Subquery / CTE surface + gap-filling resample. Correlated subqueries
  * exercise Catalyst's decorrelation rewrites (SURVEY §4.2 —
  * RewriteCorrelatedScalarSubquery, RewritePredicateSubquery): the
  * engine turns them into joins, so they scale like joins.
  */
object Subqueries {

  private def views(spark: SparkSession, sfDir: String): Unit = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("v_customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders")
    Tables.nation(spark, sfDir).createOrReplaceTempView("v_nation")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("v_supplier")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem")
    Tables.part(spark, sfDir).createOrReplaceTempView("v_part")
  }

  /** SQL13 — TPC-H Q7 shape ("volume shipping"): bilateral revenue
    * between two nations by supplier-nation / customer-nation / ship
    * year, through the six-table join with the nation pair disjunction.
    * All money routed through the DECIMAL(18,6) two-factor policy. */
  def sql13VolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year,
        |    l_extendedprice * (1 - l_discount) AS volume
        |  FROM v_lineitem
        |    JOIN v_supplier ON s_suppkey = l_suppkey
        |    JOIN v_orders   ON o_orderkey = l_orderkey
        |    JOIN v_customer ON c_custkey = o_custkey
        |    JOIN v_nation n1 ON s_nationkey = n1.n_nationkey
        |    JOIN v_nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |     OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
  }

  /** SQL14 — TPC-H Q16 shape ("parts/supplier relationship"): distinct
    * supplier counts per (brand, type) with a NOT IN anti-subquery
    * blacklist, fully tie-broken before the LIMIT so the page is
    * deterministic. */
  def sql14PartsSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
        |WHERE p_brand <> 'BRAND_0'
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM v_supplier WHERE s_acctbal < 1000.0)
        |GROUP BY p_brand, p_type
        |ORDER BY supplier_cnt DESC, p_brand, p_type
        |LIMIT 20""".stripMargin)
  }

  /** SQL15 — TPC-H Q15 shape ("top supplier"): revenue per supplier over
    * one ship year, then the supplier(s) achieving the maximum via a
    * scalar subquery over the CTE (ties all emit — no LIMIT truncation
    * ambiguity). */
  def sql15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
        |  FROM v_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name, total_rev
        |FROM v_supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** SQL17 — TPC-H Q18 shape ("large-volume customer"): orders whose
    * total quantity exceeds a threshold, found by an IN-subquery over a
    * grouped HAVING aggregate, then re-joined to customer/lineitem for
    * the order's full row. The IN-subquery plans as a left-semi join on
    * the aggregated orderkey set — one extra shuffle over lineitem, no
    * correlated re-execution. Page fully tie-broken before LIMIT. */
  def sql17LargeVolume(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM v_customer
        |  JOIN v_orders   ON c_custkey = o_custkey
        |  JOIN v_lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM v_lineitem
        |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
        |GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin)
  }

  /** SQL18 — TPC-H Q21 shape ("suppliers who kept orders waiting"),
    * adapted to this schema's columns (no commit/receipt dates): a line
    * item is "late" when it ships more than 90 days after its order
    * date. Per supplier: the count of late line items on multi-supplier
    * orders where THEY were the only late supplier — one correlated
    * EXISTS plus one correlated NOT-EXISTS-with-join, the densest
    * decorrelation exercise in the suite (Catalyst rewrites both into
    * semi/anti joins against lineitem⋈orders). */
  def sql18WaitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT s_name, COUNT(*) AS numwait
        |FROM v_lineitem l1
        |  JOIN v_orders o ON o.o_orderkey = l1.l_orderkey
        |  JOIN v_supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM v_lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM v_lineitem l3
        |      JOIN v_orders o3 ON o3.o_orderkey = l3.l_orderkey
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin)
  }

  /** SQL19 — TPC-H Q22 shape ("global sales opportunity"): customers
    * with above-average balance and no large order, grouped by nation.
    * The scalar average is the exact DECIMAL-sum / count form (a plain
    * double AVG would sum in engine-specific order and could flip a
    * boundary customer between Spark and the oracle); the NOT EXISTS
    * decorrelates to an anti join against the filtered orders side. */
  def sql19NoBigOrder(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
        |FROM v_customer c
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |           / COUNT(*)
        |    FROM v_customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM v_orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin)
  }

  /** SQL20 — TPC-H Q17 shape ("small-quantity-order revenue"): per
    * brand, the revenue from line items whose quantity is below half
    * the part's average quantity. The correlated per-part average is
    * the classic RewriteCorrelatedScalarSubquery case — Catalyst turns
    * it into one grouped aggregate over lineitem joined back on
    * partkey, so lineitem is scanned twice but never re-executed per
    * row. Exact DECIMAL-sum / count average for the same boundary
    * determinism as sql19. */
  def sql20SmallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
        |    AS avg_yearly,
        |  COUNT(*) AS n_items
        |FROM v_lineitem l JOIN v_part ON p_partkey = l_partkey
        |WHERE l_quantity < (
        |  SELECT 0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
        |                AS DOUBLE) / COUNT(*))
        |  FROM v_lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  /** SQL21 — TPC-H Q13 shape ("customer distribution"): orders per
    * customer through a LEFT OUTER join whose JOIN CONDITION carries the
    * filter (o_orderpriority <> '1-URGENT' must sit in the ON clause —
    * in WHERE it would turn the outer join inner and drop the zero-order
    * customers that are the query's point), then the distribution of
    * customers over order counts. Two aggregations: the first shuffles
    * on c_custkey (fact-sized), the second on c_count — a bounded-domain
    * key, safe ONLY because input to it is already one row per customer
    * (aggregate output, not a window funnel). */
  def sql21CustDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM v_customer c LEFT OUTER JOIN v_orders o
        |    ON c.c_custkey = o.o_custkey
        |      AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }

  /** SQL22 — TPC-H Q19 shape ("discounted revenue"): one join under a
    * DISJUNCTION of per-brand conjunct bundles mixing part and lineitem
    * predicates. The planner surface is the point: Catalyst extracts
    * the common equi-join key from under the OR, converts the filter
    * toward CNF, and pushes the brand/size disjuncts down to the part
    * scan while the mixed-side residual evaluates post-join — the
    * predicate shape naive planners turn into a cartesian re-scan per
    * bundle. */
  def sql22DisjunctRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
  }

  /** SQL23 — TPC-H Q10 shape ("returned item reporting"): revenue lost
    * to returns per customer over one quarter — a four-table star join
    * (fact filtered on l_returnflag, time-range filter on orders, nation
    * broadcast onto the grouped output), top 20 by revenue. Both range
    * filters push to the scans; the aggregate shuffles on the composite
    * customer key once. Tie-broken on c_custkey before LIMIT. */
  def sql23ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT c.c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM v_customer c
        |  JOIN v_orders   ON o_custkey = c.c_custkey
        |  JOIN v_lineitem ON l_orderkey = o_orderkey
        |  JOIN v_nation   ON n_nationkey = c.c_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY c.c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin)
  }

  /** SQL24 — TPC-H Q8 shape ("national market share"): NATION_5's share
    * of ASIA-customer revenue per order year. Six-way snowflake join
    * (region→nation filters the customer side; a second nation alias
    * names the supplier side) feeding a conditional-share aggregate.
    * Share = decimal-exact conditional sum / decimal-exact total — the
    * engines then divide the same two doubles, so the ratio is
    * bit-identical without any rounding column. */
  def sql24MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    Tables.region(spark, sfDir).createOrReplaceTempView("v_region")
    spark.sql(
      """SELECT o_year,
        |  CAST(SUM(CAST(CASE WHEN nation = 'NATION_5' THEN volume
        |                     ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
        |  / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE)
        |    AS mkt_share,
        |  COUNT(*) AS n_items
        |FROM (
        |  SELECT year(o_orderdate) AS o_year,
        |    l_extendedprice * (1 - l_discount) AS volume,
        |    n2.n_name AS nation
        |  FROM v_lineitem
        |    JOIN v_supplier  ON s_suppkey = l_suppkey
        |    JOIN v_orders    ON o_orderkey = l_orderkey
        |    JOIN v_customer  ON c_custkey = o_custkey
        |    JOIN v_nation n1 ON n1.n_nationkey = c_nationkey
        |    JOIN v_region    ON r_regionkey = n1.n_regionkey
        |    JOIN v_nation n2 ON n2.n_nationkey = s_nationkey
        |  WHERE r_name = 'ASIA') all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin)
  }

  /** SQL25 — TPC-H Q4 shape ("order priority checking"): orders placed
    * in one quarter having at least one late line item (ships > 60 days
    * after the order date — the schema has no commit/receipt dates, so
    * the lateness predicate is the same adaptation sql18 uses), counted
    * per priority. The EXISTS decorrelates to a LEFT SEMI join on
    * o_orderkey, so lineitem is touched once; the quarter filter pushes
    * to the orders scan BEFORE the semi join probes, keeping the build
    * side a single quarter of orders. */
  def sql25OrderPriority(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM v_orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM v_lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** SQL26 — TPC-H Q12 shape ("shipping mode / priority"): late line
    * items of one ship year split into high- vs low-priority counts per
    * category. The schema has no l_shipmode, so the returnflag plays the
    * mode (same categorical role: low-cardinality lineitem attribute);
    * lateness is the sql18/sql25 ship-lag adaptation. The two CASE sums
    * are integer counts — no float path at all, so the cross-engine
    * compare is exact by construction. One fact-fact join, both range
    * filters pushed to the lineitem scan. */
  def sql26ShipPriority(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT l_returnflag,
        |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS high_line_count,
        |  SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS low_line_count
        |FROM v_orders JOIN v_lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag IN ('A', 'R')
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  /** SQL27 — TPC-H Q9 shape ("product type profit"): per supplier-nation
    * and order year, profit on parts matching a name pattern. The schema
    * has no partsupp, so supply cost is modeled from the part's list
    * price (p_retailprice × quantity × 0.1) — the join tree (lineitem ⋈
    * supplier ⋈ part ⋈ orders ⋈ nation, LIKE filter on part pushed to
    * its scan, broadcast dims around the fact) is the exercise, not the
    * cost constant. Per-row amount is plain double arithmetic (identical
    * expression both engines), summed through DECIMAL(18,6). */
  def sql27ProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT nation, o_year,
        |  CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit,
        |  COUNT(*) AS n_items
        |FROM (
        |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |    l_extendedprice * (1 - l_discount)
        |      - p_retailprice * l_quantity * 0.1 AS amount
        |  FROM v_lineitem
        |    JOIN v_supplier ON s_suppkey = l_suppkey
        |    JOIN v_part     ON p_partkey = l_partkey
        |    JOIN v_orders   ON o_orderkey = l_orderkey
        |    JOIN v_nation   ON n_nationkey = s_nationkey
        |  WHERE p_name LIKE '%bolt%'
        |) profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin)
  }

  /** SQL28 — TPC-H Q11 shape ("important stock"): per-part shipped value
    * from one nation's suppliers, kept only where it exceeds a fraction
    * of that nation's grand total. No partsupp, so lineitem plays the
    * stock table. The signature move is the HAVING against a SCALAR
    * subquery over the same derived table — Catalyst evaluates the
    * one-row global aggregate once and broadcasts it into the HAVING
    * filter (no per-group re-execution), which the plan spec locks in.
    * Both HAVING sides compare as DOUBLE over exact DECIMAL sums so the
    * boundary part set is engine-independent. */
  def sql28ImportantStock(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """WITH supplied AS (
        |  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,4)) AS val
        |  FROM v_lineitem JOIN v_supplier ON s_suppkey = l_suppkey
        |  WHERE s_nationkey = 7
        |)
        |SELECT l_partkey, CAST(SUM(val) AS DOUBLE) AS value
        |FROM supplied
        |GROUP BY l_partkey
        |HAVING CAST(SUM(val) AS DOUBLE) >
        |  (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM supplied)
        |ORDER BY value DESC, l_partkey""".stripMargin)
  }

  /** SQL29 — TPC-H Q20 shape ("potential part promotion"): suppliers in
    * a nation group who dominate the supply of some qualifying part —
    * shipped more than 1.5× their fair share of that part's total
    * quantity. Without partsupp the availability test becomes a
    * dominance test over lineitem (fair-share rather than a fixed
    * fraction, so the qualifying set stays non-empty as the supplier
    * count per part grows with SF): per-(part, supplier) quantity vs
    * per-part total and supplier count. The total is a WINDOW over the
    * pair aggregate, not a re-aggregate-and-join — lineitem is scanned
    * and pair-aggregated exactly ONCE, then one l_partkey exchange
    * feeds the window (a naive two-CTE formulation plans the pair
    * aggregate twice unless AQE's exchange reuse rescues it). The
    * qualifying supplier set then filters supplier through an IN semi
    * join. Nested aggregation feeding a semi join is the Q20 planner
    * exercise. */
  def sql29PartPromotion(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """WITH perpair AS (
        |  SELECT l_partkey, l_suppkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
        |  FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'small%'
        |  GROUP BY l_partkey, l_suppkey
        |), dominance AS (
        |  SELECT l_suppkey, qty,
        |    SUM(qty)  OVER (PARTITION BY l_partkey) AS total,
        |    COUNT(*)  OVER (PARTITION BY l_partkey) AS nsupp
        |  FROM perpair
        |)
        |SELECT s_suppkey, s_name, s_acctbal
        |FROM v_supplier
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM dominance
        |    WHERE CAST(qty AS DOUBLE) >
        |      1.5 * CAST(total AS DOUBLE) / nsupp)
        |  AND s_nationkey <= 5
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** SQL5 — correlated scalar subquery + IN-subquery + EXISTS, all
    * decorrelated by Catalyst into joins. */
  def sql5Subqueries(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT c_custkey, c_acctbal
        |FROM v_customer c
        |WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM v_customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |  AND c_nationkey IN (SELECT n_nationkey FROM v_nation
        |                      WHERE n_regionkey <= 2)
        |  AND EXISTS (SELECT 1 FROM v_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** SQL6 — chained CTEs with a window inside: revenue per customer, then
    * each customer's share of their nation's total. */
  def sql6Cte(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """WITH spend AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |  FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey, c_nationkey
        |), ranked AS (
        |  SELECT c_custkey, c_nationkey, total,
        |    CAST(SUM(CAST(total AS DECIMAL(18,4))) OVER
        |      (PARTITION BY c_nationkey) AS DOUBLE) AS nation_total
        |  FROM spend
        |)
        |SELECT c_custkey, total, round(total / nation_total, 6) AS share
        |FROM ranked ORDER BY c_custkey""".stripMargin)
  }

  /** X11 — gap-filling resample: per-user daily event counts INCLUDING
    * empty days, via a generated per-user day spine (sequence + explode)
    * left-joined to actuals. The spine is generated distributed —
    * sequence() per user row, no driver loop. */
  def x11GapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val days = Tables.eventsUs(spark, sfDir)
      .select(col("user_id"), expr("ts div 86400000000").as("day"))
    val actual = days.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"))
    val spine = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(actual, Seq("user_id", "day"), "left_outer")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy(col("user_id"), col("day"))
  }

  /** SQL7 — lateral correlated subquery: each nation's top-2 suppliers
    * by balance via JOIN LATERAL with ORDER BY + LIMIT inside — the SQL
    * twin of the window top-k (w6), planned by Catalyst's lateral-join
    * decorrelation. */
  def sql7Lateral(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.supplier(spark, sfDir).createOrReplaceTempView("v_supplier")
    Tables.nation(spark, sfDir).createOrReplaceTempView("v_nation")
    spark.sql(
      """SELECT n.n_nationkey, t.s_suppkey, t.s_acctbal
        |FROM v_nation n
        |JOIN LATERAL (
        |  SELECT s_suppkey, s_acctbal FROM v_supplier s
        |  WHERE s.s_nationkey = n.n_nationkey
        |  ORDER BY s_acctbal DESC, s_suppkey ASC
        |  LIMIT 2
        |) t
        |ORDER BY n_nationkey, s_acctbal DESC, s_suppkey""".stripMargin)
  }

  /** SQL9 — recursive CTE (Spark 4 WITH RECURSIVE): transitive closure
    * of a small literal edge DAG — the SQL-native form of the
    * connected-components walk (x12). Spark 4.1 supports only UNION ALL
    * in the recursive step; path uniqueness on this DAG (simple chains)
    * makes that equivalent to UNION. */
  def sql9Recursive(spark: SparkSession, sfDir: String): DataFrame =
    spark.sql(
      """WITH RECURSIVE reach(src, dst) AS (
        |  SELECT src, dst FROM VALUES
        |    (1, 2), (2, 3), (3, 4), (10, 11), (11, 12) AS e(src, dst)
        |  UNION ALL
        |  SELECT r.src, e.dst
        |  FROM reach r
        |  JOIN (SELECT src, dst FROM VALUES
        |    (1, 2), (2, 3), (3, 4), (10, 11), (11, 12) AS e(src, dst)) e
        |  ON r.dst = e.src
        |)
        |SELECT src, dst FROM reach ORDER BY src, dst""".stripMargin)

  /** S10 — generator source: the range() table-valued function, data
    * synthesized with no input table (the spine-builder primitive; x11's
    * gapfill derives its spine from data, this is the pure form). */
  def s10Range(spark: SparkSession, sfDir: String): DataFrame =
    spark.sql(
      "SELECT id, id * id AS sq, id % 7 AS m, " +
      "CAST(id AS DOUBLE) / 999.0 AS frac " +
      "FROM range(0, 1000) ORDER BY id")

  /** SQL10 — named windows (WINDOW clause): one spec shared by a rank
    * and a running decimal sum. */
  def sql10WindowClause(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        |  rank() OVER w AS rnk,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w2 AS DOUBLE)
        |    AS run_total
        |FROM v_orders
        |WINDOW
        |  w AS (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey),
        |  w2 AS (PARTITION BY o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** SQL34 — SQL set-operation surface (the parser forms of o4/o5/o6's
    * DataFrame set ops) composed into one query: customers with open
    * orders INTERSECT customers with urgent orders, EXCEPT the
    * big-spender set; then EXCEPT ALL between two multiplicity-bearing
    * priority projections proves bag semantics (rows survive per excess
    * multiplicity, not per distinct value). Identical text runs in
    * DuckDB. Both operators plan as aggregates/joins over hash
    * partitioning — nothing single-node. */
  def sql34SetOps(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT c, COUNT(*) AS n FROM (
        |  SELECT c FROM (
        |    (SELECT o_custkey AS c FROM v_orders WHERE o_orderstatus = 'O'
        |     INTERSECT
        |     SELECT o_custkey AS c FROM v_orders
        |     WHERE o_orderpriority = '1-URGENT')
        |    EXCEPT
        |    SELECT o_custkey AS c FROM v_orders
        |    WHERE o_totalprice > 300000.0
        |  ) t1
        |  UNION ALL
        |  SELECT c FROM (
        |    SELECT o_custkey AS c FROM v_orders WHERE o_orderstatus = 'O'
        |    EXCEPT ALL
        |    SELECT o_custkey AS c FROM v_orders
        |    WHERE o_orderpriority = '1-URGENT'
        |  ) t2
        |) u GROUP BY c ORDER BY c""".stripMargin)
  }

  /** SQL39 — TPC-H Q6 ("forecasting revenue change"): the one-table
    * filter-aggregate that closes the feasible TPC-H family at 21/22
    * (Q2 needs partsupp, absent from this corpus — SURVEY §2.11). The
    * whole query is a single scan: all three range predicates push to
    * the parquet reader (shipdate year, discount band, quantity cap),
    * the two-factor product runs through the DECIMAL(18,6) policy, and
    * the plan is scan → partial agg → single-row final — no shuffle of
    * data rows at any scale, the cheapest possible TPC-H shape. Year
    * shifted to 1996 (this corpus ships 1995-01..2001-11). */
  def sql39ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir)
    spark.sql(
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * l_discount
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM v_lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql39_forecast_revenue" -> (sql39ForecastRevenue _),
    "s10_range" -> (s10Range _),
    "sql34_set_ops" -> (sql34SetOps _),
    "sql10_window_clause" -> (sql10WindowClause _),
    "sql5_subqueries" -> (sql5Subqueries _),
    "sql6_cte" -> (sql6Cte _),
    "sql7_lateral" -> (sql7Lateral _),
    "sql9_recursive" -> (sql9Recursive _),
    "sql13_volume_shipping" -> (sql13VolumeShipping _),
    "sql14_parts_supplier" -> (sql14PartsSupplier _),
    "sql15_top_supplier" -> (sql15TopSupplier _),
    "sql17_large_volume" -> (sql17LargeVolume _),
    "sql18_waiting_suppliers" -> (sql18WaitingSuppliers _),
    "sql19_no_big_order" -> (sql19NoBigOrder _),
    "sql20_small_qty_revenue" -> (sql20SmallQtyRevenue _),
    "sql21_cust_distribution" -> (sql21CustDistribution _),
    "sql22_disjunct_revenue" -> (sql22DisjunctRevenue _),
    "sql23_returned_items" -> (sql23ReturnedItems _),
    "sql24_market_share" -> (sql24MarketShare _),
    "sql25_order_priority" -> (sql25OrderPriority _),
    "sql26_ship_priority" -> (sql26ShipPriority _),
    "sql27_product_profit" -> (sql27ProductProfit _),
    "sql28_important_stock" -> (sql28ImportantStock _),
    "sql29_part_promotion" -> (sql29PartPromotion _),
    "x11_gapfill" -> (x11GapFill _))

  val oracles: Map[String, String] = Map(
    // same text over the raw table; both engines read the same parquet
    // doubles, so the discount-band compare is bit-identical
    "sql39_forecast_revenue" ->
      ("SELECT CAST(SUM(CAST(l_extendedprice * l_discount " +
       "AS DECIMAL(18,6))) AS DOUBLE) AS revenue, " +
       "COUNT(*) AS n_items FROM lineitem " +
       "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
       "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
       "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),
    // identical text — ANSI set ops parse the same in DuckDB
    "sql34_set_ops" ->
      ("SELECT c, COUNT(*) AS n FROM ( " +
       "SELECT c FROM ( " +
       "(SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'O' " +
       "INTERSECT " +
       "SELECT o_custkey AS c FROM orders " +
       "WHERE o_orderpriority = '1-URGENT') " +
       "EXCEPT " +
       "SELECT o_custkey AS c FROM orders WHERE o_totalprice > 300000.0 " +
       ") t1 " +
       "UNION ALL " +
       "SELECT c FROM ( " +
       "SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'O' " +
       "EXCEPT ALL " +
       "SELECT o_custkey AS c FROM orders " +
       "WHERE o_orderpriority = '1-URGENT' " +
       ") t2 " +
       ") u GROUP BY c ORDER BY c"),
    "sql13_volume_shipping" ->
      ("SELECT supp_nation, cust_nation, l_year, " +
       "CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS revenue, " +
       "COUNT(*) AS n_items FROM (" +
       "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
       "year(l_shipdate) AS l_year, " +
       "l_extendedprice * (1 - l_discount) AS volume " +
       "FROM lineitem " +
       "JOIN supplier ON s_suppkey = l_suppkey " +
       "JOIN orders ON o_orderkey = l_orderkey " +
       "JOIN customer ON c_custkey = o_custkey " +
       "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
       "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
       "WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19') " +
       "OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')) shipping " +
       "GROUP BY supp_nation, cust_nation, l_year " +
       "ORDER BY supp_nation, cust_nation, l_year"),
    "sql14_parts_supplier" ->
      ("SELECT p_brand, p_type, " +
       "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt " +
       "FROM lineitem JOIN part ON p_partkey = l_partkey " +
       "WHERE p_brand <> 'BRAND_0' AND l_suppkey NOT IN " +
       "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0) " +
       "GROUP BY p_brand, p_type " +
       "ORDER BY supplier_cnt DESC, p_brand, p_type LIMIT 20"),
    "sql15_top_supplier" ->
      ("WITH rev AS (SELECT l_suppkey, " +
       "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) " +
       "AS DECIMAL(18,6))) AS DOUBLE) AS total_rev " +
       "FROM lineitem " +
       "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' " +
       "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' " +
       "GROUP BY l_suppkey) " +
       "SELECT s_suppkey, s_name, total_rev " +
       "FROM supplier JOIN rev ON s_suppkey = l_suppkey " +
       "WHERE total_rev = (SELECT MAX(total_rev) FROM rev) " +
       "ORDER BY s_suppkey"),
    "sql17_large_volume" ->
      ("SELECT c_custkey, c_name, o_orderkey, o_totalprice, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty " +
       "FROM customer " +
       "JOIN orders ON c_custkey = o_custkey " +
       "JOIN lineitem ON o_orderkey = l_orderkey " +
       "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem " +
       "GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) " +
       "GROUP BY c_custkey, c_name, o_orderkey, o_totalprice " +
       "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"),
    "sql18_waiting_suppliers" ->
      ("SELECT s_name, COUNT(*) AS numwait " +
       "FROM lineitem l1 " +
       "JOIN orders o ON o.o_orderkey = l1.l_orderkey " +
       "JOIN supplier ON s_suppkey = l1.l_suppkey " +
       "WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY " +
       "AND EXISTS (SELECT 1 FROM lineitem l2 " +
       "WHERE l2.l_orderkey = l1.l_orderkey " +
       "AND l2.l_suppkey <> l1.l_suppkey) " +
       "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
       "JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey " +
       "WHERE l3.l_orderkey = l1.l_orderkey " +
       "AND l3.l_suppkey <> l1.l_suppkey " +
       "AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY) " +
       "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"),
    "sql19_no_big_order" ->
      ("SELECT c_nationkey, COUNT(*) AS n_cust, " +
       "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal " +
       "FROM customer c " +
       "WHERE c_acctbal > (" +
       "SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) " +
       "/ COUNT(*) FROM customer WHERE c_acctbal > 0) " +
       "AND NOT EXISTS (SELECT 1 FROM orders o " +
       "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0) " +
       "GROUP BY c_nationkey ORDER BY c_nationkey"),
    "sql20_small_qty_revenue" ->
      ("SELECT p_brand, " +
       "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 " +
       "AS avg_yearly, COUNT(*) AS n_items " +
       "FROM lineitem l JOIN part ON p_partkey = l_partkey " +
       "WHERE l_quantity < (" +
       "SELECT 0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) " +
       "AS DOUBLE) / COUNT(*)) " +
       "FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey) " +
       "GROUP BY p_brand ORDER BY p_brand"),
    "sql21_cust_distribution" ->
      ("SELECT c_count, COUNT(*) AS custdist FROM (" +
       "SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count " +
       "FROM customer c LEFT OUTER JOIN orders o " +
       "ON c.c_custkey = o.o_custkey " +
       "AND o.o_orderpriority <> '1-URGENT' " +
       "GROUP BY c.c_custkey) c_orders " +
       "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),
    "sql22_disjunct_revenue" ->
      ("SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) " +
       "AS DECIMAL(18,6))) AS DOUBLE) AS revenue, COUNT(*) AS n_items " +
       "FROM lineitem JOIN part ON p_partkey = l_partkey " +
       "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 " +
       "AND l_quantity BETWEEN 1 AND 11) " +
       "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25 " +
       "AND l_quantity BETWEEN 10 AND 20) " +
       "OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35 " +
       "AND l_quantity BETWEEN 20 AND 30)"),
    "sql23_returned_items" ->
      ("SELECT c.c_custkey, c_name, c_acctbal, n_name, " +
       "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) " +
       "AS DECIMAL(18,6))) AS DOUBLE) AS revenue " +
       "FROM customer c " +
       "JOIN orders ON o_custkey = c.c_custkey " +
       "JOIN lineitem ON l_orderkey = o_orderkey " +
       "JOIN nation ON n_nationkey = c.c_nationkey " +
       "WHERE l_returnflag = 'R' " +
       "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
       "AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' " +
       "GROUP BY c.c_custkey, c_name, c_acctbal, n_name " +
       "ORDER BY revenue DESC, c_custkey LIMIT 20"),
    "sql24_market_share" ->
      ("SELECT o_year, " +
       "CAST(SUM(CAST(CASE WHEN nation = 'NATION_5' THEN volume " +
       "ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) " +
       "/ CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) " +
       "AS mkt_share, COUNT(*) AS n_items FROM (" +
       "SELECT year(o_orderdate) AS o_year, " +
       "l_extendedprice * (1 - l_discount) AS volume, " +
       "n2.n_name AS nation FROM lineitem " +
       "JOIN supplier ON s_suppkey = l_suppkey " +
       "JOIN orders ON o_orderkey = l_orderkey " +
       "JOIN customer ON c_custkey = o_custkey " +
       "JOIN nation n1 ON n1.n_nationkey = c_nationkey " +
       "JOIN region ON r_regionkey = n1.n_regionkey " +
       "JOIN nation n2 ON n2.n_nationkey = s_nationkey " +
       "WHERE r_name = 'ASIA') all_nations " +
       "GROUP BY o_year ORDER BY o_year"),
    "sql25_order_priority" ->
      ("SELECT o_orderpriority, COUNT(*) AS order_count " +
       "FROM orders o " +
       "WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00' " +
       "AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00' " +
       "AND EXISTS (SELECT 1 FROM lineitem l " +
       "WHERE l.l_orderkey = o.o_orderkey " +
       "AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) " +
       "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "sql26_ship_priority" ->
      ("SELECT l_returnflag, " +
       "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
       "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
       "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') " +
       "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count " +
       "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
       "WHERE l_returnflag IN ('A', 'R') " +
       "AND l_shipdate > o_orderdate + INTERVAL 30 DAY " +
       "AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
       "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
       "GROUP BY l_returnflag ORDER BY l_returnflag"),
    "sql27_product_profit" ->
      ("SELECT nation, o_year, " +
       "CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit, " +
       "COUNT(*) AS n_items FROM (" +
       "SELECT n_name AS nation, year(o_orderdate) AS o_year, " +
       "l_extendedprice * (1 - l_discount) " +
       "- p_retailprice * l_quantity * 0.1 AS amount " +
       "FROM lineitem " +
       "JOIN supplier ON s_suppkey = l_suppkey " +
       "JOIN part ON p_partkey = l_partkey " +
       "JOIN orders ON o_orderkey = l_orderkey " +
       "JOIN nation ON n_nationkey = s_nationkey " +
       "WHERE p_name LIKE '%bolt%') profit " +
       "GROUP BY nation, o_year ORDER BY nation, o_year DESC"),
    "sql28_important_stock" ->
      ("WITH supplied AS (" +
       "SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,4)) AS val " +
       "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey " +
       "WHERE s_nationkey = 7) " +
       "SELECT l_partkey, CAST(SUM(val) AS DOUBLE) AS value " +
       "FROM supplied GROUP BY l_partkey " +
       "HAVING CAST(SUM(val) AS DOUBLE) > " +
       "(SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM supplied) " +
       "ORDER BY value DESC, l_partkey"),
    "sql29_part_promotion" ->
      ("WITH perpair AS (" +
       "SELECT l_partkey, l_suppkey, " +
       "SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty " +
       "FROM lineitem JOIN part ON p_partkey = l_partkey " +
       "WHERE p_name LIKE 'small%' " +
       "GROUP BY l_partkey, l_suppkey), " +
       "dominance AS (SELECT l_suppkey, qty, " +
       "SUM(qty) OVER (PARTITION BY l_partkey) AS total, " +
       "COUNT(*) OVER (PARTITION BY l_partkey) AS nsupp " +
       "FROM perpair) " +
       "SELECT s_suppkey, s_name, s_acctbal FROM supplier " +
       "WHERE s_suppkey IN (" +
       "SELECT l_suppkey FROM dominance " +
       "WHERE CAST(qty AS DOUBLE) > " +
       "1.5 * CAST(total AS DOUBLE) / nsupp) " +
       "AND s_nationkey <= 5 ORDER BY s_suppkey"),
    "s10_range" ->
      ("SELECT range AS id, range * range AS sq, range % 7 AS m, " +
       "CAST(range AS DOUBLE) / 999.0 AS frac " +
       "FROM range(0, 1000) ORDER BY id"),
    "sql10_window_clause" ->
      ("SELECT o_orderkey, o_custkey, rank() OVER w AS rnk, " +
       "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w2 AS DOUBLE) " +
       "AS run_total FROM orders " +
       "WINDOW w AS (PARTITION BY o_custkey " +
       "ORDER BY o_totalprice DESC, o_orderkey), " +
       "w2 AS (PARTITION BY o_custkey " +
       "ORDER BY o_totalprice DESC, o_orderkey " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
       "ORDER BY o_orderkey"),
    "sql7_lateral" ->
      ("SELECT n.n_nationkey, t.s_suppkey, t.s_acctbal FROM nation n " +
       "JOIN LATERAL (SELECT s_suppkey, s_acctbal FROM supplier s " +
       "WHERE s.s_nationkey = n.n_nationkey " +
       "ORDER BY s_acctbal DESC, s_suppkey ASC LIMIT 2) t ON true " +
       "ORDER BY n_nationkey, s_acctbal DESC, s_suppkey"),
    "sql9_recursive" ->
      ("WITH RECURSIVE reach(src, dst) AS (" +
       "SELECT src, dst FROM (VALUES (1, 2), (2, 3), (3, 4), (10, 11), " +
       "(11, 12)) e(src, dst) " +
       "UNION ALL " +
       "SELECT r.src, e.dst FROM reach r JOIN " +
       "(SELECT src, dst FROM (VALUES (1, 2), (2, 3), (3, 4), (10, 11), " +
       "(11, 12)) e2(src, dst)) e ON r.dst = e.src) " +
       "SELECT src, dst FROM reach ORDER BY src, dst"),
    "sql5_subqueries" ->
      ("SELECT c_custkey, c_acctbal FROM customer c " +
       "WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2 " +
       "WHERE c2.c_nationkey = c.c_nationkey) " +
       "AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2) " +
       "AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
       "AND o.o_totalprice > 400000.0) ORDER BY c_custkey"),
    "sql6_cte" ->
      ("WITH spend AS (SELECT c_custkey, c_nationkey, " +
       "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total " +
       "FROM customer JOIN orders ON c_custkey = o_custkey " +
       "GROUP BY c_custkey, c_nationkey), " +
       "ranked AS (SELECT c_custkey, c_nationkey, total, " +
       "CAST(SUM(CAST(total AS DECIMAL(18,4))) OVER " +
       "(PARTITION BY c_nationkey) AS DOUBLE) AS nation_total FROM spend) " +
       "SELECT c_custkey, total, round(total / nation_total, 6) AS share " +
       "FROM ranked ORDER BY c_custkey"),
    "x11_gapfill" ->
      ("WITH days AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day " +
       "FROM events), actual AS (SELECT user_id, day, COUNT(*) AS n " +
       "FROM days GROUP BY user_id, day), " +
       "bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 " +
       "FROM days GROUP BY user_id), " +
       "spine AS (SELECT user_id, d0 + g AS day FROM bounds, range(0, 40) r(g) " +
       "WHERE d0 + g <= d1) " +
       "SELECT spine.user_id, spine.day, COALESCE(n, 0) AS n_events " +
       "FROM spine LEFT JOIN actual ON spine.user_id = actual.user_id " +
       "AND spine.day = actual.day ORDER BY spine.user_id, spine.day"))
}
