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

  private val HoltAlpha = 0.3
  private val HoltBeta = 0.1
  private val HoltHorizon = 14

  // ---------------------------------------------------------------- x162

  /** X162 — Holt's linear-trend exponential smoothing (Holt 1957) of
    * the daily order-revenue series, with a 14-day-ahead forecast fan:
    * l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1}),
    * b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}, α=0.3, β=0.1, initialized
    * l=y₁, b=y₂−y₁ and folded over the observed days in order. Row
    * h=0 carries the final smoothed level; rows h=1..14 the forecasts
    * l+h·b. The companion to x146 (diagnose) and sql39 (regression
    * fit): an actual recursive forecaster.
    *
    * Scale + determinism: one scan reduces the corpus to the
    * day-domain DECIMAL series; the recursion folds ONE sorted
    * ≤2.4k-element array with every step rounded to WHOLE units —
    * scale 0 on purpose: at fractional scales the engines round via
    * x·10^k whose multiply error (ulp ≈ 1e-4 at 1e12 magnitude)
    * crosses .5 boundaries differently and the trajectories fork
    * (observed at 6 dp on this very series); at scale 0 there is no
    * scaling multiply, so BigDecimal-HALF_UP and double-nearbyint
    * agree bit-for-bit and the (l, b) walk is reproducible. Unit
    * resolution on a ~1e6-magnitude series costs nothing; each
    * forecast is two closing IEEE ops. */
  def x162HoltForecast(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
        .as("day"))
      .agg(sum(col("o_totalprice").cast(Det.Money)).as("v"))
      .select(col("day"), col("v").cast("double").as("y"))
    graft.api.Analytics.holtForecast(daily, "day", "y",
      HoltAlpha, HoltBeta, HoltHorizon)
  }

  // ---------------------------------------------------------------- x163

  /** X163 — daily OHLC downsampling of the event value stream: per
    * day, the first value (open), max (high), min (low), last value
    * (close), tick count, and exact DECIMAL value sum — the candle
    * table every market-data / metrics pipeline materializes as its
    * canonical coarse view.
    *
    * Scale shape: ONE grouped aggregate over the scan — open/close are
    * composite-key min_by/max_by on (ts, event_id) (deterministic
    * under ts ties), never a window over the event stream. Day grain
    * keys the shuffle, so it's the same map-side-combinable pattern at
    * any volume. Zero arithmetic on the picked values. */
  def x163Ohlc(spark: SparkSession, sfDir: String): DataFrame =
    graft.api.Analytics.ohlc(Tables.eventsUs(spark, sfDir),
        expr("ts div 86400000000"), "ts", "event_id", "value")
      .withColumnRenamed("bucket", "day")

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
    "x162_holt_forecast" -> (x162HoltForecast _),
    "x163_ohlc" -> (x163Ohlc _),
    "sql47_unpivot_clause" -> (sql47UnpivotClause _),
    "sql48_inline_values" -> (sql48InlineValues _))

  private val HoltSql: String =
    "WITH daily AS MATERIALIZED (SELECT " +
    "epoch_us(o_orderdate) // 86400000000 AS day, " +
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS y " +
    "FROM orders GROUP BY 1), " +
    "arr AS (SELECT list(y ORDER BY day) AS ys FROM daily), " +
    // the (l, b) accumulator is a 2-element LIST, not a struct:
    // DuckDB 1.0's list_reduce mutates a STRUCT accumulator in place,
    // so the b field's expression would read acc.l ALREADY OVERWRITTEN
    // by the new l (probed directly; list accumulators evaluate all
    // elements against the old acc, matching Spark's aggregate())
    "fit AS (SELECT list_reduce(list_prepend(" +
    "[round(ys[1], 0), round(ys[2] - ys[1], 0)], " +
    "list_transform(ys[2:], yy -> [yy, 0.0])), " +
    s"(acc, e) -> [round($HoltAlpha * e[1] + ${1 - HoltAlpha} * " +
    s"(acc[1] + acc[2]), 0), round($HoltBeta * " +
    s"(round($HoltAlpha * e[1] + ${1 - HoltAlpha} * (acc[1] + acc[2]), 0) " +
    s"- acc[1]) + ${1 - HoltBeta} * acc[2], 0)]) AS f FROM arr) " +
    "SELECT CAST(h AS BIGINT) AS h, " +
    "round(f[1] + CAST(h AS DOUBLE) * f[2], 6) AS forecast, " +
    "f[2] AS trend FROM fit, " +
    s"(SELECT unnest(range(${HoltHorizon + 1})) AS h) hs ORDER BY h"

  private val OhlcSql: String =
    "WITH e AS MATERIALIZED (SELECT epoch_us(ts) // 86400000000 AS day, " +
    "epoch_us(ts) AS tus, event_id, value FROM events), " +
    "o AS (SELECT day, value AS open FROM e QUALIFY " +
    "row_number() OVER (PARTITION BY day ORDER BY tus, event_id) = 1), " +
    "c AS (SELECT day, value AS close FROM e QUALIFY " +
    "row_number() OVER (PARTITION BY day ORDER BY tus DESC, " +
    "event_id DESC) = 1), " +
    "a AS (SELECT day, MAX(value) AS high, MIN(value) AS low, " +
    "CAST(COUNT(*) AS BIGINT) AS n_ticks, " +
    "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS vsum " +
    "FROM e GROUP BY 1) " +
    "SELECT a.day, o.open, a.high, a.low, c.close, a.n_ticks, a.vsum " +
    "FROM a JOIN o ON o.day = a.day JOIN c ON c.day = a.day " +
    "ORDER BY a.day"

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
    "x162_holt_forecast" -> HoltSql,
    "x163_ohlc" -> OhlcSql,
    "sql47_unpivot_clause" -> UnpivotSql,
    "sql48_inline_values" -> InlineValuesSql)
}
