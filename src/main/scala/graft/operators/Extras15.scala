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
    "x156_ldiversity" -> (x156LDiversity _))

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
    "x156_ldiversity" -> LDiversitySql)
}
