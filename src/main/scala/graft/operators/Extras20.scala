package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 wave: the TABLESAMPLE SQL surface (VERDICT r9 #8). */
object Extras20 {

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql50_tablesample" -> (sql50Tablesample _))

  val oracles: Map[String, String] = Map(
    // the claims are engine-independent by construction; the oracle
    // recomputes the one deterministic scalar and asserts the rest
    "sql50_tablesample" ->
      ("SELECT CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) " +
       "AS base_n, TRUE AS rows_exact, TRUE AS pct_in_bounds, " +
       "TRUE AS repeatable_stable, TRUE AS subset_ok"))
}
