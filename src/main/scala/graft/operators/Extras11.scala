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


  /** X113 — retraction-based incremental view maintenance (the
    * Flink/Materialize changelog algebra as a batch contract row, the
    * CDC-driven sibling of x54's append-only upkeep): the (status ×
    * month) revenue MV is maintained under a correction feed carrying
    * UPDATES (order % 7 = 0, not deleted: price restated +100.00 —
    * emitted as a -1 retraction of the old row plus a +1 insertion of
    * the new) and DELETES (order % 11 = 0: -1 retraction only).
    * Maintenance = one grouped aggregate over the signed delta rows
    * (m and m·price sums), full-outer-merged into the base MV — the
    * delta aggregate is delta-sized, the base is never rescanned, and
    * groups whose count reaches zero are dropped (the part a naive
    * "add the delta" implementation forgets). The oracle recomputes
    * the MV from the corrected order set, so the retraction algebra is
    * value-checked end to end. */
  def x113MvRetraction(spark: SparkSession, sfDir: String): DataFrame =
    maintainMv(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          date_trunc("month", col("o_orderdate")).as("month"),
          col("o_totalprice").cast(Det.Money).as("price")))
      .select(col("o_orderstatus"),
        unix_timestamp(col("month")).as("month_start"),
        col("n"), col("t").cast("double").as("total"))
      .orderBy(col("o_orderstatus"), col("month_start"))

  /** The maintenance core over an (o_orderkey, o_orderstatus, month,
    * price DECIMAL) frame; returns the maintained (status, month, n, t)
    * MV. Exposed for spec-level checks (group-drop on planted data). */
  def maintainMv(o: DataFrame): DataFrame = {
    val base = o.groupBy(col("o_orderstatus"), col("month"))
      .agg(count(lit(1)).as("n"), sum(col("price")).as("total"))
    val touched = o.filter(col("o_orderkey") % 7 === 0 ||
      col("o_orderkey") % 11 === 0)
    // every touched order retracts its old row; non-deleted updates
    // re-insert the restated row
    val retract = touched.select(col("o_orderstatus"), col("month"),
      lit(-1L).as("m"), col("price"))
    val insert = touched.filter(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderstatus"), col("month"), lit(1L).as("m"),
        (col("price") + lit(100.00).cast(Det.Money)).as("price"))
    val delta = retract.unionByName(insert)
      .groupBy(col("o_orderstatus"), col("month"))
      .agg(sum(col("m")).as("dn"),
        sum(col("m") * col("price")).as("dtotal"))
    base.join(delta, Seq("o_orderstatus", "month"), "full_outer")
      .select(col("o_orderstatus"), col("month"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0).cast(Det.Money)) +
          coalesce(col("dtotal"), lit(0).cast(Det.Money))).as("t"))
      .filter(col("n") > 0)
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

  /** X119 — golden-record survivorship (the step AFTER entity
    * resolution that actually ships: x12's near-dup clusters collapsed
    * to one surviving record each by an explicit RULE — longest text
    * wins, lowest id breaks ties — with the member count as audit).
    * One window top-1 over cluster-partitioned members; clusters grow
    * with the corpus (never a single partition), members per cluster
    * are bounded by the dedup density. Single-member "clusters" are
    * excluded: a golden-record table lists only real merges. The
    * oracle re-derives clusters through the shared recursive CTE and
    * applies the identical rule. */
  def x119GoldenRecord(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_rep"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_rep"))
    Dedup.x12DedupClusters(spark, sfDir)
      .join(Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("n_chars")), "doc_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(wAll))
      .filter(col("rn") === 1 && col("n_members") > 1)
      .select(col("cluster_rep"), col("n_members"),
        col("doc_id").as("survivor_id"),
        col("n_chars").as("survivor_chars"))
      .orderBy(col("cluster_rep"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x119_golden_record" -> (x119GoldenRecord _),
    "x113_mv_retraction" -> (x113MvRetraction _),
    "x115_dp_counts" -> (x115DpCounts _))

  val oracles: Map[String, String] = Map(
    // clusters re-derived via the shared recursive CTE, then the same
    // survivorship rule
    "x119_golden_record" ->
      (Dedup.ClusterCteSql +
       ", cl AS (SELECT src AS doc_id, MIN(dst) AS cluster_rep " +
       "FROM reach GROUP BY src), " +
       "m AS (SELECT cl.cluster_rep, cl.doc_id, d.n_chars " +
       "FROM cl JOIN documents d USING (doc_id)), " +
       "ranked AS (SELECT *, row_number() OVER (PARTITION BY cluster_rep " +
       "ORDER BY n_chars DESC, doc_id) AS rn, " +
       "COUNT(*) OVER (PARTITION BY cluster_rep) AS n_members FROM m) " +
       "SELECT cluster_rep, CAST(n_members AS BIGINT) AS n_members, " +
       "doc_id AS survivor_id, n_chars AS survivor_chars " +
       "FROM ranked WHERE rn = 1 AND n_members > 1 ORDER BY cluster_rep"),
    // same seeded inverse-CDF Laplace draw per released key
    "x115_dp_counts" ->
      ("WITH g AS (SELECT event_type, COUNT(*) AS n_true, " +
       "(" + Det.sql.md5Bucket("event_type", 13) +
       " + 0.5) / POWER(16, 13) - 0.5 AS c FROM events GROUP BY 1) " +
       "SELECT event_type, n_true, " +
       "round(n_true + round(-sign(c) * ln(1.0 - 2.0 * abs(c)), 6), 6) " +
       "AS n_released FROM g ORDER BY event_type"),
    // the MV recomputed from the corrected order set — deletes out,
    // updates restated
    "x113_mv_retraction" ->
      ("SELECT o_orderstatus, " +
       "epoch_us(date_trunc('month', o_orderdate)) // 1000000 " +
       "AS month_start, " +
       "CAST(COUNT(*) AS BIGINT) AS n, " +
       "CAST(SUM(CASE WHEN o_orderkey % 7 = 0 " +
       "THEN CAST(o_totalprice AS DECIMAL(18,4)) + 100.00 " +
       "ELSE CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS total " +
       "FROM orders WHERE o_orderkey % 11 <> 0 " +
       "GROUP BY 1, 2 ORDER BY o_orderstatus, month_start"))
}
