package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Round-9 fifth wave — the model-eval / search / survival / BI-drilldown
  * additions: probability calibration (Brier + reliability bins),
  * positional phrase search (the inverted-index primitive under every
  * keyword retrieval stack), Kaplan–Meier survival (time-to-churn with
  * censoring — the canonical retention curve), period-over-period delta
  * decomposition (the "why did revenue move" drilldown), l-diversity
  * (the sensitive-attribute complement of x85's k-anonymity), and
  * bigram OOV rate (vocabulary-coverage audit for a trained tokenizer).
  *
  * Float policy (the repo standard): integers and DECIMAL sums
  * everywhere until a single closing IEEE op rounded to a fixed scale;
  * the one iterative float (the KM survival product) folds
  * per-step-rounded multiplies over an aggregate-bounded array, so both
  * engines walk the identical 10-dp trajectory.
  */
object Extras15 {

  // ---------------------------------------------------------------- x154

  /** X154 — Kaplan–Meier survival curve (Kaplan & Meier JASA'58) of
    * customer engagement lifetime: duration = weeks between a
    * customer's first and last order, with customers still ordering in
    * the final 90 days treated as CENSORED (their lifetime is only
    * known to exceed the observed span) — the estimator every
    * retention/churn analysis is built on, and the reason naive "avg
    * lifetime" reads low. Output: one row per event week (d>0) with
    * the risk set n, events d, censored c, the per-step factor
    * (n−d)/n, and the running survival estimate.
    *
    * Scale + determinism: the per-customer reduce is one grouped
    * aggregate; everything after lives on the week-domain frame
    * (≤ ~350 rows). The risk set n_t = Σ_{s≥t}(d_s+c_s) is a
    * broadcast theta-join over that aggregate — no window, no global
    * sort. The survival product is the one iterative float: factors
    * are single IEEE divisions rounded 8 dp, collected into ONE sorted
    * array, and each prefix is folded with per-step
    * round(acc·f, 10) — multiplication is IEEE-exact-rounded in both
    * engines, so the whole trajectory is bitwise reproducible (the
    * oracle folds the identical lambda via list_reduce). */
  def x154SurvivalKm(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val mx = o.agg(max(col("o_orderdate")).as("mx"))
    val cust = o.groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("f"), max(col("o_orderdate")).as("l"))
      .crossJoin(broadcast(mx))
      .select(
        floor(datediff(col("l").cast("date"), col("f").cast("date")) / 7)
          .cast("long").as("wk"),
        when(col("l") <= col("mx") - expr("INTERVAL 90 DAYS"), 1L)
          .otherwise(0L).as("ev"))
    graft.api.Analytics.kmSurvival(cust, "wk", "ev")
      .withColumnRenamed("t", "week")
  }

  // ---------------------------------------------------------------- x155

  /** X155 — period-over-period delta decomposition: June→July 2001
    * revenue change broken down by customer nation, with each nation's
    * share of the total delta and the volume-vs-rate split
    * (volume = order-count change at the old average order value;
    * rate = the remainder — the two-factor bridge every "why did the
    * metric move" review draws). Row nation='TOTAL' is the corpus
    * bridge; per-nation volume+rate sum to that nation's delta by
    * construction.
    *
    * Exactness: revenues are DECIMAL(18,4) sums; delta is decimal
    * subtraction; the only floats are aov (one division, 4 dp), the
    * volume product (one multiply, 4 dp), the rate remainder (one
    * subtract, 4 dp) and the share (one division, 6 dp) — each a
    * single IEEE op on identical inputs. Plan: one filtered scan
    * (month predicate pushes to the reader), a broadcast dim join,
    * one nation-sized conditional aggregate. */
  def x155DeltaDecomp(spark: SparkSession, sfDir: String): DataFrame = {
    val ym = (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
    val base = Tables.orders(spark, sfDir)
      .filter(ym === 200106 || ym === 200107)
      .join(broadcast(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), ym.as("ym"),
        col("o_totalprice").cast(Det.Money).as("price"))
    def side(m: Int, c: Column) = sum(when(col("ym") === m, c))
    val zeroMoney = lit(0).cast(Det.Money)
    val per = base.groupBy(col("nation"))
      .agg(coalesce(side(200106, lit(1L)), lit(0L)).as("n_m1"),
        coalesce(side(200107, lit(1L)), lit(0L)).as("n_m2"),
        coalesce(side(200106, col("price")), zeroMoney).as("r1"),
        coalesce(side(200107, col("price")), zeroMoney).as("r2"))
    val tot = per.agg(sum(col("n_m1")).as("n_m1"), sum(col("n_m2")).as("n_m2"),
      sum(col("r1")).as("r1"), sum(col("r2")).as("r2"))
      .select(lit("TOTAL").as("nation"), col("n_m1"), col("n_m2"),
        col("r1"), col("r2"))
    val td = tot.select((col("r2") - col("r1")).cast("double").as("tdelta"))
    // aov / volume / rate in INTEGER ten-thousandths (the x166
    // grid-fork lesson): r1 is a 4-dp decimal over a small integer
    // count, which lands exactly on the 4-dp rounding grid where
    // round-after-float-division forks cross-engine; half-up integer
    // division never does, and the closing /10000.0 is exact-input
    per.unionByName(tot).crossJoin(broadcast(td))
      .withColumn("r1s", (col("r1") * 10000).cast("long"))
      .withColumn("a4",
        expr("CASE WHEN n_m1 > 0 THEN " +
          "(2 * r1s + n_m1) div (2 * n_m1) END"))
      .withColumn("v4", (col("n_m2") - col("n_m1")) * col("a4"))
      .select(col("nation"), col("n_m1"), col("n_m2"),
        col("r1").cast("double").as("rev_m1"),
        col("r2").cast("double").as("rev_m2"),
        (col("r2") - col("r1")).cast("double").as("delta"),
        when(col("tdelta") =!= 0.0,
          round((col("r2") - col("r1")).cast("double") / col("tdelta"), 6))
          .as("share"),
        when(col("n_m1") > 0,
          col("v4").cast("double") / 10000.0).as("volume_effect"),
        when(col("n_m1") > 0,
          (((col("r2") - col("r1")) * 10000).cast("long") - col("v4"))
            .cast("double") / 10000.0).as("rate_effect"))
      .orderBy((col("nation") === "TOTAL").cast("int"), col("nation"))
  }

  // ---------------------------------------------------------------- x156

  /** X156 — l-diversity audit (Machanavajjhala TKDD'07): x85's
    * k-anonymity says every quasi-identifier group is big enough;
    * l-diversity asks whether the SENSITIVE attribute inside each
    * group is varied enough (a group of 50 rows all sharing one nation
    * re-identifies the nation despite k=50). Quasi-identifiers here:
    * (market segment, account-balance band); sensitive: nation.
    * Output: the histogram of distinct-sensitive counts l across
    * groups (how many groups have l=1, l=2, …) plus the corpus total
    * row l_distinct=-1 — groups at l=1 are the disclosure risk.
    *
    * Plan: one grouped distinct-aggregate on the QI key, then a
    * histogram over the group-domain frame — two shuffles total,
    * all-integer output. */
  def x156LDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    val groups = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_mktsegment"),
        floor(col("c_acctbal") / 2000.0).as("bal_band"), col("n_name"))
      .groupBy(col("c_mktsegment"), col("bal_band"))
      .agg(countDistinct(col("n_name")).as("l"), count(lit(1)).as("sz"))
    val hist = groups.groupBy(col("l").as("l_distinct"))
      .agg(count(lit(1)).as("n_groups"), sum(col("sz")).as("n_rows"))
    val total = hist.agg(sum(col("n_groups")).as("n_groups"),
      sum(col("n_rows")).as("n_rows"))
      .select(lit(-1L).as("l_distinct"), col("n_groups"), col("n_rows"))
    hist.unionByName(total).orderBy(col("l_distinct"))
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x154_survival_km" -> (x154SurvivalKm _),
    "x155_delta_decomp" -> (x155DeltaDecomp _),
    "x156_ldiversity" -> (x156LDiversity _))

  private val SurvivalSql: String =
    "WITH pc AS MATERIALIZED (SELECT o_custkey, " +
    "min(o_orderdate) AS f, max(o_orderdate) AS l FROM orders GROUP BY 1), " +
    "mx AS (SELECT max(o_orderdate) AS mx FROM orders), " +
    "cust AS (SELECT datediff('day', CAST(f AS DATE), CAST(l AS DATE)) // 7 " +
    "AS wk, CASE WHEN l <= mx - INTERVAL 90 DAY THEN 1 ELSE 0 END AS ev " +
    "FROM pc CROSS JOIN mx), " +
    "wka AS MATERIALIZED (SELECT wk, SUM(ev) AS d, SUM(1 - ev) AS c " +
    "FROM cust GROUP BY 1), " +
    "ev AS MATERIALIZED (SELECT a.wk, " +
    "CAST(a.d AS BIGINT) AS d, CAST(a.c AS BIGINT) AS c, " +
    "CAST(SUM(b.d + b.c) AS BIGINT) AS n FROM wka a JOIN wka b " +
    "ON b.wk >= a.wk GROUP BY 1, 2, 3), " +
    "st AS MATERIALIZED (SELECT wk, n, d, c, " +
    "round(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE), 8) AS factor " +
    "FROM ev WHERE d > 0), " +
    "fl AS (SELECT list(wk ORDER BY wk) AS ws, list(n ORDER BY wk) AS ns, " +
    "list(d ORDER BY wk) AS ds, list(c ORDER BY wk) AS cs, " +
    "list(factor ORDER BY wk) AS fs FROM st), " +
    "ex AS (SELECT ws, ns, ds, cs, fs, " +
    "unnest(range(len(fs))) AS g FROM fl) " +
    "SELECT CAST(ws[g + 1] AS BIGINT) AS week, ns[g + 1] AS n_risk, " +
    "ds[g + 1] AS d, cs[g + 1] AS c, fs[g + 1] AS factor, " +
    "round(list_reduce(list_prepend(1.0, fs[1:g + 1]), " +
    "(acc, f) -> round(acc * f, 10)), 10) AS survival " +
    "FROM ex ORDER BY week"

  private val DeltaSql: String =
    "WITH base AS MATERIALIZED (SELECT n.n_name AS nation, " +
    "year(o.o_orderdate) * 100 + month(o.o_orderdate) AS ym, " +
    "CAST(o.o_totalprice AS DECIMAL(18,4)) AS price FROM orders o " +
    "JOIN customer c ON o.o_custkey = c.c_custkey " +
    "JOIN nation n ON c.c_nationkey = n.n_nationkey " +
    "WHERE year(o.o_orderdate) * 100 + month(o.o_orderdate) " +
    "IN (200106, 200107)), " +
    "per AS MATERIALIZED (SELECT nation, " +
    "COALESCE(SUM(CASE WHEN ym = 200106 THEN 1 END), 0) AS n_m1, " +
    "COALESCE(SUM(CASE WHEN ym = 200107 THEN 1 END), 0) AS n_m2, " +
    "COALESCE(SUM(CASE WHEN ym = 200106 THEN price END), 0) AS r1, " +
    "COALESCE(SUM(CASE WHEN ym = 200107 THEN price END), 0) AS r2 " +
    "FROM base GROUP BY 1), " +
    "u AS (SELECT nation, CAST(n_m1 AS BIGINT) AS n_m1, " +
    "CAST(n_m2 AS BIGINT) AS n_m2, r1, r2 FROM per " +
    "UNION ALL SELECT 'TOTAL', CAST(SUM(n_m1) AS BIGINT), " +
    "CAST(SUM(n_m2) AS BIGINT), SUM(r1), SUM(r2) FROM per), " +
    "td AS (SELECT CAST(SUM(r2) - SUM(r1) AS DOUBLE) AS tdelta FROM per), " +
    "v AS (SELECT u.*, td.tdelta, " +
    "CASE WHEN n_m1 > 0 THEN " +
    "(2 * CAST(r1 * 10000 AS BIGINT) + n_m1) // (2 * n_m1) END AS a4 " +
    "FROM u CROSS JOIN td) " +
    "SELECT nation, n_m1, n_m2, CAST(r1 AS DOUBLE) AS rev_m1, " +
    "CAST(r2 AS DOUBLE) AS rev_m2, CAST(r2 - r1 AS DOUBLE) AS delta, " +
    "CASE WHEN tdelta <> 0.0 THEN " +
    "round(CAST(r2 - r1 AS DOUBLE) / tdelta, 6) END AS share, " +
    "CASE WHEN n_m1 > 0 THEN " +
    "CAST((n_m2 - n_m1) * a4 AS DOUBLE) / 10000.0 END AS volume_effect, " +
    "CASE WHEN n_m1 > 0 THEN " +
    "CAST(CAST((r2 - r1) * 10000 AS BIGINT) - (n_m2 - n_m1) * a4 " +
    "AS DOUBLE) / 10000.0 END AS rate_effect " +
    "FROM v ORDER BY (nation = 'TOTAL'), nation"

  private val LDiversitySql: String =
    "WITH groups AS MATERIALIZED (SELECT c_mktsegment, " +
    "floor(c_acctbal / 2000.0) AS bal_band, " +
    "COUNT(DISTINCT n_name) AS l, COUNT(*) AS sz FROM customer " +
    "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2), " +
    "hist AS MATERIALIZED (SELECT l AS l_distinct, COUNT(*) AS n_groups, " +
    "SUM(sz) AS n_rows FROM groups GROUP BY 1) " +
    "SELECT CAST(l_distinct AS BIGINT) AS l_distinct, " +
    "CAST(n_groups AS BIGINT) AS n_groups, CAST(n_rows AS BIGINT) AS n_rows " +
    "FROM (SELECT * FROM hist UNION ALL SELECT -1, SUM(n_groups), " +
    "SUM(n_rows) FROM hist) u ORDER BY l_distinct"

  val oracles: Map[String, String] = Map(
    "x154_survival_km" -> SurvivalSql,
    "x155_delta_decomp" -> DeltaSql,
    "x156_ldiversity" -> LDiversitySql)
}
