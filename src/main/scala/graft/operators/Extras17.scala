package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Round-9 seventh wave — forecasting, market-data downsampling, and
  * two SQL-surface rows: Holt's linear-trend exponential smoothing
  * (the first actual multi-step FORECAST operator — x146/x117/x120
  * diagnose a series, this one extrapolates it), daily OHLC candles
  * (the canonical time-series downsample every market/metrics store
  * serves), the SQL-text UNPIVOT clause (a12 covers the DataFrame
  * API; this is the missing SQL spelling), and inline VALUES tables
  * (the join-against-a-literal-lookup idiom).
  *
  * Float policy: the one iterative float (Holt's level/trend
  * recursion) walks per-step-rounded IEEE chains with IDENTICAL
  * spelling in both engines (the x154 fold discipline, struct-typed);
  * OHLC emits stored values picked by deterministic composite argmin —
  * zero arithmetic.
  */
object Extras17 {

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

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql47_unpivot_clause" -> (sql47UnpivotClause _),
    "sql48_inline_values" -> (sql48InlineValues _))

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

  val oracles: Map[String, String] = Map(
    "sql47_unpivot_clause" -> UnpivotSql,
    "sql48_inline_values" -> InlineValuesSql)
}
