package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** PRIVACY / ANONYMITY theme module (round 11 — the ExtrasN
  * naming-debt retirement, VERDICT r10 #7): the release-gate rows a
  * governed warehouse runs before data leaves it, moved verbatim from
  * Extras10/11/15. All three are grouped aggregates over the
  * quasi-identifier domain — bounded outputs, no per-row state; the
  * DP noise is seeded per-key md5 so both engines draw the same
  * Laplace deviates.
  *
  * Rows: x85 k-anonymity audit, x115 differentially-private counts,
  * x156 l-diversity audit.
  */
object PrivacyOps {

  /** X85 — k-anonymity audit (the data-governance pre-flight before a
    * dataset release): group the release by its quasi-identifier tuple
    * (market segment × nation × account-balance band — the classic
    * re-identification surface) and report how much of the corpus
    * lives in groups smaller than k=5: those rows are re-identifiable
    * and must be suppressed or generalized (Sweeney 2002). One grouped
    * count + one summary aggregate over the group-cardinality frame —
    * the audit costs a scan regardless of corpus size. */
  def x85KAnonymity(spark: SparkSession, sfDir: String): DataFrame = {
    val groups = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_mktsegment"), col("n_name"),
        floor(col("c_acctbal") / 2000.0).as("bal_band"))
      .groupBy(col("c_mktsegment"), col("n_name"), col("bal_band"))
      .agg(count(lit(1)).as("sz"))
    groups.agg(count(lit(1)).as("n_groups"),
      sum(col("sz")).as("n_rows"),
      sum(when(col("sz") < 5, 1L).otherwise(0L)).as("n_groups_below_k"),
      sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("n_rows_at_risk"),
      min(col("sz")).as("min_group"))
  }

  /** X115 — differentially-private count release (Dwork et al. 2006):
    * per-event-type counts with SEEDED Laplace(1/ε) noise via inverse-
    * CDF on a uniform derived from the group key's md5 — the noise is
    * a pure function of the released key, so the release is
    * reproducible (and oracle-checkable) while having exactly the
    * Laplace distribution across keys a DP accountant assumes. ε = 1.
    * The true count rides along as the audit column (this is the
    * release-AUDIT row — a production release would drop it). One
    * grouped count + scalar math: scan-bound at any scale. */
  def x115DpCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val u = (Det.md5Bucket(col("event_type"), 13).cast("double") +
      lit(0.5)) / lit(math.pow(16.0, 13))
    val c = u - lit(0.5)
    val noise = -signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
    Tables.eventsUs(spark, sfDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_true"))
      .select(col("event_type"), col("n_true"),
        round(col("n_true") + round(noise, 6), 6).as("n_released"))
      .orderBy(col("event_type"))
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

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x85_k_anonymity" -> (x85KAnonymity _),
    "x115_dp_counts" -> (x115DpCounts _),
    "x156_ldiversity" -> (x156LDiversity _))

  val oracles: Map[String, String] = Map(
    // identical quasi-identifier banding (floor of the same IEEE
    // division) and the same k=5 threshold
    "x85_k_anonymity" ->
      ("WITH g AS (SELECT c_mktsegment, n_name, " +
       "CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal_band, " +
       "CAST(COUNT(*) AS BIGINT) AS sz FROM customer " +
       "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2, 3) " +
       "SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, " +
       "CAST(SUM(sz) AS BIGINT) AS n_rows, " +
       "CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) " +
       "AS n_groups_below_k, " +
       "CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) " +
       "AS n_rows_at_risk, MIN(sz) AS min_group FROM g"),
    // same seeded inverse-CDF Laplace draw per released key
    "x115_dp_counts" ->
      ("WITH g AS (SELECT event_type, COUNT(*) AS n_true, " +
       "(" + Det.sql.md5Bucket("event_type", 13) +
       " + 0.5) / POWER(16, 13) - 0.5 AS c FROM events GROUP BY 1) " +
       "SELECT event_type, n_true, " +
       "round(n_true + round(-sign(c) * ln(1.0 - 2.0 * abs(c)), 6), 6) " +
       "AS n_released FROM g ORDER BY event_type"),
    "x156_ldiversity" -> LDiversitySql)
}
