package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Det, Tables}
import graft.api.VectorPipeline

/** Round-8 wave: iterative graph analytics (PageRank, triangles) and
  * retraction-based incremental view maintenance — the three operator
  * families a production analytics stack still reaches for that the
  * suite did not yet pin.
  */
object Extras11 {


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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x115_dp_counts" -> (x115DpCounts _))

  val oracles: Map[String, String] = Map(
    // same seeded inverse-CDF Laplace draw per released key
    "x115_dp_counts" ->
      ("WITH g AS (SELECT event_type, COUNT(*) AS n_true, " +
       "(" + Det.sql.md5Bucket("event_type", 13) +
       " + 0.5) / POWER(16, 13) - 0.5 AS c FROM events GROUP BY 1) " +
       "SELECT event_type, n_true, " +
       "round(n_true + round(-sign(c) * ln(1.0 - 2.0 * abs(c)), 6), 6) " +
       "AS n_released FROM g ORDER BY event_type"))
}
