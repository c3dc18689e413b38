package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Round-9 ninth wave — revenue-analytics and event-compression rows:
  * cohort LTV curves (the cumulative-revenue-by-signup-cohort view
  * every subscription/commerce business steers by — x92's retention
  * matrix with money on it) and consecutive-run collapse (the
  * sensor/clickstream compression that drops repeated readings while
  * keeping every transition — x143's Markov matrix implicitly assumes
  * it).
  */
object Extras19 {

  private val LtvMaxAge = 11

  // ---------------------------------------------------------------- x166

  /** X166 — cohort LTV curves: customers cohorted by first-order
    * month, revenue accumulated by cohort age (months since first
    * order, 0..11), cumulative LTV per customer = running revenue /
    * cohort size — the "how much is a January customer worth by month
    * 6" table.
    *
    * Scale shape: two grouped passes (per-customer first month, then
    * (cohort, age) revenue) reduce the corpus to the bounded
    * cohort×age domain; the running cumulative is a theta-join over
    * THAT aggregate (the x138/w16 no-global-window discipline).
    * Revenue is DECIMAL-exact; the LTV division is spelled as INTEGER
    * half-up division in ten-thousandths — a 4-dp decimal divided by a
    * small integer lands EXACTLY on the 4-dp half grid, where
    * round-after-float-division forks cross-engine (observed:
    * 532872.90875 → .9087 vs .9088), so no float division happens
    * before the grid; the closing /10000.0 is one exact-input IEEE
    * op. */
  def x166LtvCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val mcol = (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), mcol.as("m"),
        col("o_totalprice").cast(Det.Money).as("price"))
    val first = o.groupBy(col("o_custkey")).agg(min(col("m")).as("m0"))
    val size = first.groupBy(col("m0")).agg(count(lit(1)).as("n_customers"))
    val ra = o.join(first, "o_custkey")
      .select(col("m0"), (col("m") - col("m0")).as("age"), col("price"))
      .filter(col("age") <= LtvMaxAge)
      .groupBy(col("m0"), col("age"))
      .agg(sum(col("price")).as("rev"))
    val r2 = ra.select(col("m0").as("c2"), col("age").as("a2"),
      col("rev").as("rev2"))
    ra.join(broadcast(r2), col("c2") === col("m0") && col("a2") <= col("age"))
      .groupBy(col("m0"), col("age"), col("rev"))
      .agg(sum(col("rev2")).as("cum_rev"))
      .join(broadcast(size), "m0")
      .withColumn("s4", (col("cum_rev") * 10000).cast("long"))
      .select(col("m0").cast("long").as("cohort_m"),
        col("age").cast("long").as("age"), col("n_customers"),
        col("rev").cast("double").as("rev"),
        (expr("(2 * s4 + n_customers) div (2 * n_customers)")
          .cast("double") / 10000.0).as("cum_ltv"))
      .orderBy(col("cohort_m"), col("age"))
  }

  // ---------------------------------------------------------------- x167

  /** X167 — consecutive-run collapse: per user (ordered by ts with
    * event_id tie-break), keep an event only when its type DIFFERS
    * from the user's previous event — repeated readings compress to
    * their first occurrence while every transition survives. Output:
    * per event type, total vs kept vs dropped — the compression audit
    * a clickstream/sensor ingest reports.
    *
    * Scale shape: one USER-partitioned lag window (data-parallel
    * across users) + one type-domain aggregate. All-integer. */
  def x167CollapseRuns(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.eventsUs(spark, sfDir)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .withColumn("kept",
        when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
          .otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"),
        (count(lit(1)) - sum(col("kept"))).as("n_dropped"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- x170

  /** X170 — RFM segmentation: per customer Recency (days since last
    * order), Frequency (order count), Monetary (DECIMAL spend),
    * quintile-scored against exact interpolated 20/40/60/80th
    * percentiles (the a17-proven percentile↔quantile_cont pair),
    * recency inverted (recent = 5); customers grouped into the
    * (r,f,m) score cells with the classic named segments — the
    * marketing segmentation every CRM ships.
    *
    * Scale shape: one grouped pass to the customer frame; the 12
    * cutoffs come from one aggregate and ride a broadcast crossJoin;
    * assignment is pure comparisons (ties at a cutoff go to the lower
    * bucket in BOTH engines since the cut values are identical);
    * output is the ≤125-cell score domain. */
  def x170Rfm(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val mx = o.agg(max(col("o_orderdate").cast("date")).as("mxd"))
    val cust = o.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate").cast("date")).as("last_d"),
        count(lit(1)).as("f"),
        sum(col("o_totalprice").cast(Det.Money)).as("msum"))
      .crossJoin(broadcast(mx))
      .select(datediff(col("mxd"), col("last_d")).cast("long").as("r"),
        col("f"), col("msum").cast("double").as("m"))
    val qs = Seq(0.2, 0.4, 0.6, 0.8)
    val cutCols =
      qs.zipWithIndex.map { case (q, i) =>
        percentile(col("r").cast("double"), lit(q)).as(s"rc$i") } ++
      qs.zipWithIndex.map { case (q, i) =>
        percentile(col("f").cast("double"), lit(q)).as(s"fc$i") } ++
      qs.zipWithIndex.map { case (q, i) =>
        percentile(col("m"), lit(q)).as(s"mc$i") }
    val cuts = cust.agg(cutCols.head, cutCols.tail: _*)
    def bucket(v: Column, pre: String) =
      (0 until 4).map(i => when(v > col(s"$pre$i"), 1L).otherwise(0L))
        .reduce(_ + _) + 1L
    val scored = cust.crossJoin(broadcast(cuts))
      .select((lit(6L) - bucket(col("r").cast("double"), "rc")).as("r_s"),
        bucket(col("f").cast("double"), "fc").as("f_s"),
        bucket(col("m"), "mc").as("m_s"), col("m"))
    scored
      .withColumn("segment",
        when(col("r_s") >= 4 && col("f_s") >= 4 && col("m_s") >= 4,
          "champions")
          .when(col("r_s") >= 4 && col("f_s") <= 2, "new")
          .when(col("r_s") <= 2 && col("f_s") >= 3, "at_risk")
          .when(col("r_s") <= 1 && col("f_s") <= 2, "lost")
          .otherwise("other"))
      .groupBy(col("r_s"), col("f_s"), col("m_s"), col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        Det.dsum(col("m")).as("monetary"))
      .orderBy(col("r_s"), col("f_s"), col("m_s"))
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x166_ltv_cohorts" -> (x166LtvCohorts _),
    "x167_collapse_runs" -> (x167CollapseRuns _),
    "x170_rfm" -> (x170Rfm _))

  private val LtvSql: String =
    "WITH o AS MATERIALIZED (SELECT o_custkey, " +
    "year(o_orderdate) * 12 + month(o_orderdate) AS m, " +
    "CAST(o_totalprice AS DECIMAL(18,4)) AS price FROM orders), " +
    "f AS MATERIALIZED (SELECT o_custkey, MIN(m) AS m0 FROM o " +
    "GROUP BY 1), " +
    "sz AS (SELECT m0, COUNT(*) AS n_customers FROM f GROUP BY 1), " +
    "ra AS MATERIALIZED (SELECT f.m0, o.m - f.m0 AS age, " +
    "SUM(o.price) AS rev FROM o JOIN f ON o.o_custkey = f.o_custkey " +
    s"WHERE o.m - f.m0 <= $LtvMaxAge GROUP BY 1, 2), " +
    "cum AS (SELECT a.m0, a.age, ANY_VALUE(a.rev) AS rev, " +
    "SUM(b.rev) AS cum_rev FROM ra a JOIN ra b " +
    "ON b.m0 = a.m0 AND b.age <= a.age GROUP BY a.m0, a.age) " +
    "SELECT CAST(cum.m0 AS BIGINT) AS cohort_m, " +
    "CAST(cum.age AS BIGINT) AS age, " +
    "CAST(sz.n_customers AS BIGINT) AS n_customers, " +
    "CAST(cum.rev AS DOUBLE) AS rev, " +
    "CAST((2 * CAST(cum.cum_rev * 10000 AS BIGINT) + sz.n_customers) // " +
    "(2 * sz.n_customers) AS DOUBLE) / 10000.0 AS cum_ltv " +
    "FROM cum JOIN sz ON sz.m0 = cum.m0 ORDER BY cohort_m, age"

  private val CollapseSql: String =
    "WITH e AS MATERIALIZED (SELECT user_id, epoch_us(ts) AS tus, " +
    "event_id, event_type FROM events), " +
    "k AS (SELECT event_type, CASE WHEN prev IS NULL OR " +
    "prev <> event_type THEN 1 ELSE 0 END AS kept FROM (" +
    "SELECT event_type, lag(event_type) OVER (PARTITION BY user_id " +
    "ORDER BY tus, event_id) AS prev FROM e) t) " +
    "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total, " +
    "CAST(SUM(kept) AS BIGINT) AS n_kept, " +
    "CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_dropped " +
    "FROM k GROUP BY 1 ORDER BY event_type"

  private val RfmSql: String = {
    val cutsSel = Seq("r", "f", "m").flatMap { p =>
      Seq(0.2, 0.4, 0.6, 0.8).zipWithIndex.map { case (q, i) =>
        val e = if (p == "m") "m" else s"CAST($p AS DOUBLE)"
        s"quantile_cont($e, $q) AS ${p}c$i"
      }
    }.mkString(", ")
    def bucket(e: String, pre: String) =
      (0 until 4).map(i => s"(CASE WHEN $e > ${pre}$i THEN 1 ELSE 0 END)")
        .mkString(" + ") + " + 1"
    "WITH mx AS (SELECT CAST(MAX(o_orderdate) AS DATE) AS mxd " +
    "FROM orders), " +
    "cust AS MATERIALIZED (SELECT " +
    "datediff('day', CAST(MAX(o.o_orderdate) AS DATE), mx.mxd) AS r, " +
    "COUNT(*) AS f, " +
    "CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS m " +
    "FROM orders o CROSS JOIN mx GROUP BY o.o_custkey, mx.mxd), " +
    s"cuts AS (SELECT $cutsSel FROM cust), " +
    "scored AS MATERIALIZED (SELECT " +
    s"CAST(6 - (${bucket("CAST(r AS DOUBLE)", "rc")}) AS BIGINT) AS r_s, " +
    s"CAST(${bucket("CAST(f AS DOUBLE)", "fc")} AS BIGINT) AS f_s, " +
    s"CAST(${bucket("m", "mc")} AS BIGINT) AS m_s, m " +
    "FROM cust CROSS JOIN cuts) " +
    "SELECT r_s, f_s, m_s, " +
    "CASE WHEN r_s >= 4 AND f_s >= 4 AND m_s >= 4 THEN 'champions' " +
    "WHEN r_s >= 4 AND f_s <= 2 THEN 'new' " +
    "WHEN r_s <= 2 AND f_s >= 3 THEN 'at_risk' " +
    "WHEN r_s <= 1 AND f_s <= 2 THEN 'lost' " +
    "ELSE 'other' END AS segment, " +
    "CAST(COUNT(*) AS BIGINT) AS n_customers, " +
    "CAST(SUM(CAST(m AS DECIMAL(18,4))) AS DOUBLE) AS monetary " +
    "FROM scored GROUP BY 1, 2, 3, 4 ORDER BY r_s, f_s, m_s"
  }

  val oracles: Map[String, String] = Map(
    "x166_ltv_cohorts" -> LtvSql,
    "x167_collapse_runs" -> CollapseSql,
    "x170_rfm" -> RfmSql)
}
