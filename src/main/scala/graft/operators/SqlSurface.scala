package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** SQL-LANGUAGE-SURFACE theme module (round 11 — the ExtrasN
  * naming-debt retirement, VERDICT r10 #7): the rows whose contract is
  * a Spark SQL *language* feature rather than a new computation, moved
  * verbatim from Extras6/7/9/10/11/17/18/20. Each def registers temp
  * views over the driver parquet and runs one SQL text; wherever the
  * construct is dialect-shared the oracle executes the IDENTICAL text,
  * so the row pins "this clause is value-neutral sugar" cross-engine.
  *
  * Rows: sql16 CBO catalog stats, sql30 SQL scalar UDFs, sql31 SQL
  * table function + LATERAL, sql32 GROUP/ORDER BY ALL, sql33 PIVOT/
  * UNPIVOT clauses, sql35 FILTER clause, sql36 keyset pagination,
  * sql37 NOT IN vs NOT EXISTS under NULLs, sql38 join hints, sql40
  * parameterized SQL, sql41 session variables, sql47 UNPIVOT clause,
  * sql48 inline VALUES, sql49 DISTRIBUTE/SORT BY, sql50 TABLESAMPLE.
  */
object SqlSurface {

  /** The sql16 join, one spelling for operator and spec: orders ⋈ the
    * customers of ONE nation, aggregated per market segment. The
    * interesting part is the PLANNING surface it exercises (below), not
    * the shape. */
  private[graft] val CboJoinSql =
    "SELECT c.c_mktsegment AS c_mktsegment, COUNT(*) AS n_orders, " +
    "CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) " +
    "AS sum_price " +
    "FROM graft_cbo_orders o JOIN graft_cbo_customer c " +
    "ON o.o_custkey = c.c_custkey " +
    "WHERE c.c_nationkey = 1 " +
    "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"

  /** Registers the sql16 catalog tables once per (session, sfDir) and
    * ANALYZEs them: table + ALL COLUMNS statistics land in the catalog
    * (rowCount, sizeInBytes, per-column ndv/min/max/avgLen) — the
    * surface every prior row left unexercised because parquet reads
    * carry only file-size estimates. */
  private[operators] def cboSetup(spark: SparkSession, sfDir: String): Unit = {
    val s = Tables.tune(spark)
    graft.Memo(spark, s"cbo_setup:$sfDir") {
      val dir = Tables.scratchDir("cbo_tables", sfDir)
      s.sql("DROP TABLE IF EXISTS graft_cbo_customer")
      s.sql("DROP TABLE IF EXISTS graft_cbo_orders")
      Tables.customer(s, sfDir).write.mode("overwrite")
        .option("path", s"$dir/customer").saveAsTable("graft_cbo_customer")
      Tables.orders(s, sfDir).write.mode("overwrite")
        .option("path", s"$dir/orders").saveAsTable("graft_cbo_orders")
      s.sql("ANALYZE TABLE graft_cbo_customer COMPUTE STATISTICS FOR ALL COLUMNS")
      s.sql("ANALYZE TABLE graft_cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")
      s.range(1).toDF("ok").localCheckpoint(true)
    }
    ()
  }

  /** SQL16 — cost-based-optimizer statistics exercised as a contract
    * row: the query runs against ANALYZEd catalog tables, so join
    * planning is informed by catalog statistics instead of raw file
    * sizes. With CBO enabled and AQE off, the c_nationkey filter's
    * selectivity is estimated from column stats (ndv), shrinking the
    * dimension's size estimate below the broadcast threshold — a
    * stats-informed broadcast that the file-size estimate alone would
    * refuse; the spec layer pins exactly that plan difference at a
    * threshold between the two estimates. At 100 TB this is the
    * difference between a catalog-planned broadcast and a shuffle of
    * the fact table when AQE's runtime stats are not yet available
    * (first stage, no reusable exchange). Values are plan-independent;
    * the oracle recomputes from the source parquet. */
  def sql16CboStats(spark: SparkSession, sfDir: String): DataFrame = {
    cboSetup(spark, sfDir)
    Tables.tune(spark).sql(CboJoinSql)
  }

  /** SQL30 — SQL-defined scalar UDFs (Spark 4 `CREATE FUNCTION ...
    * RETURN <expr>`): the discounted-price and charge formulas declared
    * ONCE as catalog functions and reused by name. Unlike a JVM UDF
    * (f8's opaque-function tier), a SQL UDF is INLINED by the analyzer —
    * the plan contains only the underlying arithmetic expression, so it
    * stays inside whole-stage codegen, pushes/prunes like any
    * expression, and costs nothing at 100 TB. The spec pins the
    * inlining (no ScalaUDF node in the optimized plan); the oracle runs
    * the expanded expression directly. */
  def sql30SqlUdf(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        |RETURNS DOUBLE RETURN p * (1 - d)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION charge(
        |  p DOUBLE, d DOUBLE, t DOUBLE)
        |RETURNS DOUBLE RETURN disc_price(p, d) * (1 + t)""".stripMargin)
    spark.sql(
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(disc_price(l_extendedprice, l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  CAST(SUM(CAST(charge(l_extendedprice, l_discount, l_tax)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS total_charge,
        |  COUNT(*) AS n_items
        |FROM v_lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  /** SQL31 — SQL-defined TABLE function (Spark 4 `CREATE FUNCTION ...
    * RETURNS TABLE ... RETURN SELECT`), invoked LATERALLY with a
    * correlated argument: "the well-funded suppliers of nation X" as a
    * named, reusable catalog object rather than an inline subquery; the
    * outer query counts and maxes them per nation. The analyzer inlines
    * the body and decorrelates the lateral into a plain join + filter —
    * the abstraction costs nothing at scale.
    *
    * DISCOVERED LIMIT-HOISTING HAZARD (locked out of the contract): in
    * Spark 4.1 an ORDER BY ... LIMIT k INSIDE a correlated SQL table
    * function is applied to the base table BEFORE the correlated filter
    * (3 global rows instead of 3 per key), silently wrong vs the
    * hand-written LATERAL (sql7), which plans per-key correctly. So the
    * body stays filter-only; per-key top-k belongs to sql7/w6/w10. */
  def sql31SqlTableFn(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.supplier(spark, sfDir).createOrReplaceTempView("v_supplier")
    Tables.nation(spark, sfDir).createOrReplaceTempView("v_nation")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION nation_rich_suppliers(nk INT)
        |RETURNS TABLE(s_suppkey BIGINT, s_acctbal DOUBLE)
        |RETURN SELECT s_suppkey, s_acctbal FROM v_supplier
        |  WHERE s_nationkey = nk AND s_acctbal > 1000.0""".stripMargin)
    spark.sql(
      """SELECT n_nationkey, COUNT(*) AS n_rich,
        |  MAX(t.s_acctbal) AS top_bal
        |FROM v_nation n, LATERAL nation_rich_suppliers(n.n_nationkey) t
        |GROUP BY n_nationkey
        |ORDER BY n_nationkey""".stripMargin)
  }

  /** SQL32 — GROUP BY ALL / ORDER BY ALL (Spark 4): the analyzer infers
    * the grouping set from the non-aggregate select items and the total
    * output order — the modern analytics shorthand (DuckDB-originated,
    * now cross-engine), so the oracle runs the IDENTICAL text. Plans
    * exactly as the explicit form: one partial+final hash aggregate. */
  def sql32GroupByAll(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total
        |FROM v_orders
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin)
  }

  /** SQL33 — the SQL PIVOT and UNPIVOT clauses (parser surfaces distinct
    * from a10/a12's DataFrame `pivot`/`unpivot`), composed as a
    * round-trip: order counts pivoted into one column per status, then
    * unpivoted straight back to long form. UNPIVOT drops the NULL cells
    * a missing (priority, status) combination produces, so the
    * round-trip output is exactly the grouped counts the oracle
    * recomputes — both clauses must be right for the hash to match. */
  def sql33PivotClause(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders")
    spark.sql(
      """SELECT o_orderpriority, metric, v FROM (
        |  SELECT * FROM (
        |    SELECT o_orderpriority, o_orderstatus FROM v_orders)
        |  PIVOT (COUNT(*) FOR o_orderstatus
        |         IN ('O' AS st_o, 'F' AS st_f, 'P' AS st_p))
        |) UNPIVOT (v FOR metric IN (st_o, st_f, st_p))
        |ORDER BY o_orderpriority, metric""".stripMargin)
  }

  /** SQL35 — aggregate FILTER clause (SQL:2003 T612, supported by both
    * engines since Spark 3.0 / DuckDB 0.x): per-aggregate predicates
    * without CASE-WHEN contortions, ONE SHARED SQL TEXT executed
    * verbatim by Spark and DuckDB. Catalyst compiles each FILTER into
    * the aggregate's own conditional update — still one scan, one
    * shuffle, map-side partials intact. */
  val sql35Text: String =
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
      |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_rev,
      |  CAST(MIN(l_shipdate) FILTER (WHERE l_quantity > 45) AS DATE)
      |    AS first_heavy_ship
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  def sql35FilterClause(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(sql35Text)
  }

  /** SQL36 — keyset pagination (the scale-safe deep-pagination idiom):
    * three successive 5-row pages over orders, each page resuming from
    * the previous page's last key (`WHERE o_orderkey > (SELECT MAX ...
    * prev page)`) instead of OFFSET. One shared SQL text for both
    * engines. The 100 TB story is the whole point: o8's OFFSET form
    * scans-and-discards every earlier row on every page (page N costs
    * O(N·pagesize)), while the keyset predicate PUSHES TO THE SCAN
    * (spec pins `PushedFilters: GreaterThan` on the resumed pages) and
    * each page is a TakeOrderedAndProject over the surviving rows. */
  val sql36Text: String =
    """WITH page1 AS (SELECT o_orderkey, o_totalprice FROM orders
      |    ORDER BY o_orderkey LIMIT 5),
      |  page2 AS (SELECT o_orderkey, o_totalprice FROM orders
      |    WHERE o_orderkey > (SELECT MAX(o_orderkey) FROM page1)
      |    ORDER BY o_orderkey LIMIT 5),
      |  page3 AS (SELECT o_orderkey, o_totalprice FROM orders
      |    WHERE o_orderkey > (SELECT MAX(o_orderkey) FROM page2)
      |    ORDER BY o_orderkey LIMIT 5)
      |SELECT 1 AS page, o_orderkey, o_totalprice FROM page1
      |UNION ALL SELECT 2, o_orderkey, o_totalprice FROM page2
      |UNION ALL SELECT 3, o_orderkey, o_totalprice FROM page3
      |ORDER BY page, o_orderkey""".stripMargin

  def sql36KeysetPagination(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    spark.sql(sql36Text)
  }

  /** SQL37 — NOT IN vs NOT EXISTS under NULLs (three-valued logic's
    * most-shipped production bug): the dim list contains NULL keys, so
    * `NOT IN` is vacuously empty (x NOT IN (..., NULL) is never TRUE)
    * while `NOT EXISTS` returns the real complement — both counts in
    * one shared SQL text, so the contract row IS the semantics
    * demonstration. Catalyst plans the NOT IN as a null-aware anti
    * join (spec pins it); both forms stay join-shaped, no per-row
    * subquery execution. */
  val sql37Text: String =
    """WITH dim AS (SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL
      |    ELSE c_custkey END AS k FROM customer),
      |  not_in AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders
      |    WHERE o_custkey NOT IN (SELECT k FROM dim)),
      |  not_exists AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders o
      |    WHERE NOT EXISTS (SELECT 1 FROM dim WHERE dim.k = o.o_custkey))
      |SELECT (SELECT n FROM not_in) AS n_not_in,
      |  (SELECT n FROM not_exists) AS n_not_exists""".stripMargin

  def sql37NullAwareAnti(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    spark.sql(sql37Text)
  }

  /** SQL38 — join-strategy hints (the planner-control surface an
    * operator reaches for when statistics mislead): the SAME aggregate
    * computed three times over customer ⋈ orders under BROADCAST,
    * MERGE, and SHUFFLE_HASH hints, results proven identical by the
    * shared oracle while the spec pins each hinted physical strategy
    * (BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin). Hints
    * change the EXCHANGE STRUCTURE only — broadcast ships the dim,
    * merge sorts both shuffled sides, shuffle-hash builds a map from
    * the smaller shuffled side without sorting — which is exactly the
    * lever to pull at 100 TB when AQE's estimate is wrong. */
  val sql38Text: String =
    """WITH b AS (SELECT /*+ BROADCAST(customer) */ c_mktsegment,
      |    CAST(COUNT(*) AS BIGINT) AS n FROM orders
      |    JOIN customer ON o_custkey = c_custkey GROUP BY 1),
      |  m AS (SELECT /*+ MERGE(customer) */ c_mktsegment,
      |    CAST(COUNT(*) AS BIGINT) AS n FROM orders
      |    JOIN customer ON o_custkey = c_custkey GROUP BY 1),
      |  sh AS (SELECT /*+ SHUFFLE_HASH(customer) */ c_mktsegment,
      |    CAST(COUNT(*) AS BIGINT) AS n FROM orders
      |    JOIN customer ON o_custkey = c_custkey GROUP BY 1)
      |SELECT b.c_mktsegment, b.n AS n_broadcast, m.n AS n_merge,
      |  sh.n AS n_shuffle_hash
      |FROM b JOIN m ON b.c_mktsegment = m.c_mktsegment
      |  JOIN sh ON b.c_mktsegment = sh.c_mktsegment
      |ORDER BY b.c_mktsegment""".stripMargin

  def sql38JoinHints(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    spark.sql(sql38Text)
  }

  /** SQL40 — parameterized SQL (Spark 4 named-parameter binding, the
    * injection-safe E2 surface every SQL gateway should be using):
    * `spark.sql(text, args)` with `:name` markers — the literals never
    * enter the query text, the analyzer binds them as typed
    * expressions, and the PLAN is identical to the inlined form
    * (constant-folded, filter pushed). The oracle runs the inlined
    * text, so binding-transparency is value-checked. */
  def sql40ParamSql(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("v11_orders")
    spark.sql(
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total
        |FROM v11_orders
        |WHERE o_totalprice > :minp AND o_orderstatus = :st
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      Map("minp" -> 150000.0, "st" -> "O"))
  }

  /** SQL41 — session variables + EXECUTE IMMEDIATE (Spark 4's scripting
    * surface): DECLARE a typed variable, SET it from a QUERY (the
    * data-driven-threshold idiom — here the mean order price), then run
    * the consuming aggregate through EXECUTE IMMEDIATE so the dynamic-
    * SQL path is exercised too. The oracle recomputes the threshold as
    * a scalar subquery — variable indirection must be value-neutral.
    * The threshold is decimal-exact (Det policy), so both engines cut
    * at the identical boundary. */
  def sql41SessionVars(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("v11_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE graft_minp DOUBLE")
    spark.sql(
      """SET VAR graft_minp =
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |     / COUNT(*) FROM v11_orders)""".stripMargin)
    spark.sql(
      """EXECUTE IMMEDIATE
        |'SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_above
        | FROM v11_orders WHERE o_totalprice > graft_minp
        | GROUP BY o_orderstatus ORDER BY o_orderstatus'""".stripMargin)
  }

  // --------------------------------------------------------------- sql47

  /** SQL47 — the SQL-text UNPIVOT clause (Spark 4 `UNPIVOT (val FOR
    * metric IN (...))`): wide per-priority aggregates folded to long
    * form in SQL — a12 already covers the DataFrame `unpivot` API;
    * this row pins the SQL surface. The oracle spells the identical
    * fold as a dialect-free UNION ALL, so the clause must be
    * value-neutral sugar. */
  def sql47UnpivotClause(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("v17_orders")
    spark.sql(
      """SELECT o_orderpriority, metric, val FROM (
        |  SELECT o_orderpriority,
        |    CAST(COUNT(*) AS DOUBLE) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |      AS total,
        |    CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
        |  FROM v17_orders GROUP BY o_orderpriority)
        |UNPIVOT (val FOR metric IN (n_orders, total, max_price))
        |ORDER BY o_orderpriority, metric""".stripMargin)
  }

  // --------------------------------------------------------------- sql48

  /** SQL48 — inline VALUES table in SQL text: a literal tier lookup
    * joined against the nation dimension and aggregated over customers
    * — the ad-hoc enrich-with-a-hand-written-mapping idiom analysts
    * reach for daily. Exercises FROM VALUES ... AS t(cols) parsing,
    * join, and the broadcast of a literal relation. */
  def sql48InlineValues(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("v17_customer")
    Tables.nation(spark, sfDir).createOrReplaceTempView("v17_nation")
    spark.sql(
      """SELECT t.tier, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |    AS balance
        |FROM v17_customer c
        |JOIN v17_nation n ON c.c_nationkey = n.n_nationkey
        |JOIN VALUES (0, 'amer'), (1, 'emea'), (2, 'apac'), (3, 'amer'),
        |            (4, 'emea') AS t(region_code, tier)
        |  ON n.n_regionkey = t.region_code
        |GROUP BY t.tier ORDER BY t.tier""".stripMargin)
  }

  private val UnpivotSql: String =
    "WITH w AS MATERIALIZED (SELECT o_orderpriority, " +
    "CAST(COUNT(*) AS DOUBLE) AS n_orders, " +
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total, " +
    "CAST(MAX(o_totalprice) AS DOUBLE) AS max_price " +
    "FROM orders GROUP BY 1) " +
    "SELECT o_orderpriority, metric, val FROM (" +
    "SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS val FROM w " +
    "UNION ALL SELECT o_orderpriority, 'total', total FROM w " +
    "UNION ALL SELECT o_orderpriority, 'max_price', max_price FROM w) u " +
    "ORDER BY o_orderpriority, metric"

  private val InlineValuesSql: String =
    "SELECT t.tier, CAST(COUNT(*) AS BIGINT) AS n_customers, " +
    "CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS balance " +
    "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey " +
    "JOIN (VALUES (0, 'amer'), (1, 'emea'), (2, 'apac'), (3, 'amer'), " +
    "(4, 'emea')) t(region_code, tier) ON n.n_regionkey = t.region_code " +
    "GROUP BY t.tier ORDER BY t.tier"

  // --------------------------------------------------------------- sql49

  /** SQL49 — DISTRIBUTE BY / SORT BY, Spark's physical-layout SQL
    * surface: per-nation balance aggregates distributed on the
    * nation key and sorted WITHIN partitions, then deterministically
    * re-ordered by the outer query — the clauses must be value-neutral
    * (they steer the shuffle, not the result), which is exactly what
    * the dialect-free oracle checks. */
  def sql49DistributeSort(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("v18_customer")
    spark.sql(
      """SELECT c_nationkey, n_customers, balance FROM (
        |  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |      AS balance
        |  FROM v18_customer GROUP BY c_nationkey
        |  DISTRIBUTE BY c_nationkey SORT BY balance DESC)
        |ORDER BY c_nationkey""".stripMargin)
  }

  private val DistributeSortSql: String =
    "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers, " +
    "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS balance " +
    "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"

  /** SQL50 — `TABLESAMPLE` (both grains: `(n ROWS)` and `(p PERCENT)
    * REPEATABLE (seed)`) as a DERIVED-CLAIM contract row: cross-engine
    * RNG equality is impossible (Spark's Bernoulli sampler and
    * DuckDB's share no seed algebra), so the row emits the claims an
    * engine-independent oracle CAN check exactly —
    *  - `base_n`: the deterministic base count;
    *  - `rows_exact`: the ROWS grain returned exactly min(500, n)
    *    rows (Spark implements it as a LIMIT — exact by contract);
    *  - `pct_in_bounds`: the 10 PERCENT grain landed within
    *    [0.05n, 0.15n] — Bernoulli sampling's count has σ = √(0.09n),
    *    so the window is ≥ 13σ wide at every tested SF (a false
    *    failure is impossible in practice, a broken sampler is not);
    *  - `repeatable_stable`: the same REPEATABLE(42) statement twice
    *    returns the identical key multiset (count + key-sum), the
    *    property that makes PERCENT sampling resumable;
    *  - `subset_ok`: every sampled row exists in the base (anti-join
    *    count 0) — sampling never invents rows.
    * For DETERMINISTIC cross-engine sampling (same rows both
    * engines), the engine's answer is x13's md5-bucket sampling /
    * x19's stratified form — this row documents the nondeterministic
    * SQL surface and pins its contract-level behavior instead.
    *
    * Scale shape: ROWS-grain is a driver-bounded LIMIT (use it for
    * peeks, never for statistics); PERCENT-grain is a per-row
    * Bernoulli filter fused into the scan — no shuffle, no skew
    * hazard, the right 100 TB sampling primitive. */
  def sql50Tablesample(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    Tables.lineitem(s, sfDir).createOrReplaceTempView("li_sample50")
    val baseN = s.table("li_sample50").count()
    val rowsSample = s.sql(
      "SELECT l_orderkey, l_linenumber FROM li_sample50 " +
        "TABLESAMPLE (500 ROWS)")
    val nRows = rowsSample.count()
    def pctKeys(): (Long, Long) = {
      val r = s.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
          "COALESCE(SUM(CAST(l_orderkey AS BIGINT) * 7 + " +
          "l_linenumber), 0) AS ks FROM li_sample50 " +
          "TABLESAMPLE (10 PERCENT) REPEATABLE (42)").head()
      (r.getLong(0), r.getLong(1))
    }
    val (nPct, ksPct) = pctKeys()
    val (nPct2, ksPct2) = pctKeys()
    val subsetViolations = rowsSample
      .join(s.table("li_sample50")
          .select(col("l_orderkey"), col("l_linenumber")),
        Seq("l_orderkey", "l_linenumber"), "left_anti")
      .count()
    import s.implicits._
    Seq((baseN,
        nRows == math.min(500L, baseN),
        nPct >= baseN / 20 && nPct <= (baseN * 3) / 20,
        nPct == nPct2 && ksPct == ksPct2,
        subsetViolations == 0L))
      .toDF("base_n", "rows_exact", "pct_in_bounds",
        "repeatable_stable", "subset_ok")
  }

  // ------------------------------------------------------------ registry

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
    "sql16_cbo_stats" -> (sql16CboStats _),
    "sql30_sql_udf" -> (sql30SqlUdf _),
    "sql31_sql_table_fn" -> (sql31SqlTableFn _),
    "sql32_group_by_all" -> (sql32GroupByAll _),
    "sql33_pivot_clause" -> (sql33PivotClause _),
    "sql35_filter_clause" -> (sql35FilterClause _),
    "sql38_join_hints" -> (sql38JoinHints _),
    "sql37_null_aware_anti" -> (sql37NullAwareAnti _),
    "sql36_keyset_pagination" -> (sql36KeysetPagination _),
    "sql40_param_sql" -> (sql40ParamSql _),
    "sql41_session_vars" -> (sql41SessionVars _),
    "sql47_unpivot_clause" -> (sql47UnpivotClause _),
    "sql48_inline_values" -> (sql48InlineValues _),
    "sql49_distribute_sort" -> (sql49DistributeSort _),
    "sql50_tablesample" -> (sql50Tablesample _),
    "sql3_vector_norm" -> (sql3VectorNorm _))

  val oracles: Map[String, String] = Map(
    // the same join/aggregate straight off the source tables — the
    // catalog-table indirection must not change a value
    "sql16_cbo_stats" ->
      ("SELECT c.c_mktsegment AS c_mktsegment, COUNT(*) AS n_orders, " +
       s"${graft.Det.sql.dsum("o.o_totalprice")} AS sum_price " +
       "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey " +
       "WHERE c.c_nationkey = 1 " +
       "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"),
    // the UDF bodies expanded by hand — what Spark's analyzer inlines
    "sql30_sql_udf" ->
      ("SELECT l_returnflag, " +
       "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) " +
       "AS DECIMAL(18,6))) AS DOUBLE) AS revenue, " +
       "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) " +
       "AS DECIMAL(18,6))) AS DOUBLE) AS total_charge, " +
       "COUNT(*) AS n_items " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    // the function body expanded into the lateral — what the analyzer
    // inlines
    "sql31_sql_table_fn" ->
      ("SELECT n.n_nationkey, COUNT(*) AS n_rich, " +
       "MAX(t.s_acctbal) AS top_bal FROM nation n " +
       "JOIN LATERAL (SELECT s_suppkey, s_acctbal FROM supplier s " +
       "WHERE s.s_nationkey = n.n_nationkey AND s_acctbal > 1000.0) t " +
       "ON true GROUP BY n.n_nationkey ORDER BY n_nationkey"),
    // identical text — GROUP BY ALL is DuckDB-native syntax
    "sql32_group_by_all" ->
      ("SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, " +
       "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total " +
       "FROM orders GROUP BY ALL ORDER BY ALL"),
    "sql33_pivot_clause" ->
      ("SELECT o_orderpriority, 'st_' || lower(o_orderstatus) AS metric, " +
       "COUNT(*) AS v FROM orders " +
       "WHERE o_orderstatus IN ('O', 'F', 'P') " +
       "GROUP BY 1, 2 ORDER BY o_orderpriority, metric"),
    // the SAME text Spark executes (sql35Text), verbatim
    "sql35_filter_clause" -> sql35Text.replace("\n", " "),
    // the SAME text verbatim — DuckDB reads the hint comments as plain
    // block comments and computes the identical aggregates
    "sql38_join_hints" -> sql38Text.replace("\n", " "),
    // the SAME text Spark executes (sql37Text), verbatim
    "sql37_null_aware_anti" -> sql37Text.replace("\n", " "),
    // the SAME text Spark executes (sql36Text), verbatim
    "sql36_keyset_pagination" -> sql36Text.replace("\n", " "),
    // binding transparency: the inlined literals
    "sql40_param_sql" ->
      ("SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, " +
       "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total " +
       "FROM orders WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O' " +
       "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    // the variable re-derived as a scalar subquery
    "sql41_session_vars" ->
      ("SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_above " +
       "FROM orders WHERE o_totalprice > " +
       "(SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) " +
       "/ COUNT(*) FROM orders) " +
       "GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "sql47_unpivot_clause" -> UnpivotSql,
    "sql48_inline_values" -> InlineValuesSql,
    "sql49_distribute_sort" -> DistributeSortSql,
    // the claims are engine-independent by construction; the oracle
    // recomputes the one deterministic scalar and asserts the rest
    "sql50_tablesample" ->
      ("SELECT CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) " +
       "AS base_n, TRUE AS rows_exact, TRUE AS pct_in_bounds, " +
       "TRUE AS repeatable_stable, TRUE AS subset_ok"),
    "sql3_vector_norm" ->
      ("SELECT vec_id, round(SUM(CAST(embedding[i] AS DOUBLE) * " +
       "CAST(embedding[i] AS DOUBLE)), 6) AS norm2 " +
       "FROM embeddings, range(1, 65) r(i) GROUP BY vec_id ORDER BY vec_id"))
}
