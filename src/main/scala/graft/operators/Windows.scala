package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Window functions — SURVEY §2.5 (W1–W7).
  *
  * One shuffle per distinct partitioning; all event windows partition on
  * user_id (150 keys here, millions at scale — well-distributed), and
  * window ORDER BY always ends in a unique tie-break `(ts, event_id)` so
  * frames are deterministic. Running/sliding double sums route through
  * DECIMAL (Spark accumulates sequentially, DuckDB may use a segment
  * tree — only exact arithmetic is association-proof).
  */
object Windows {

  private def wUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  /** W1 — row_number / rank / dense_rank: rn over the unique (ts,event_id)
    * order; rank/dense_rank over event_type (real tie groups). */
  def w1Ranks(spark: SparkSession, sfDir: String): DataFrame = {
    val wTies = Window.partitionBy(col("user_id")).orderBy(col("event_type"))
    Tables.eventsUs(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        row_number().over(wUser).cast("long").as("rn"),
        rank().over(wTies).cast("long").as("rnk"),
        dense_rank().over(wTies).cast("long").as("drnk"))
      .orderBy(col("event_id"))
  }

  /** W2 — ntile / percent_rank / cume_dist over ALL orders by totalprice.
    * An unpartitioned Spark Window would move every row to one partition
    * (the WindowExec warning); instead the global rank is computed
    * scalably: range-partitioned sort + distributed zipWithIndex, then
    * the closed-form definitions. The oracle uses DuckDB's NATIVE
    * ntile/percent_rank/cume_dist — proving this formulation reproduces
    * standard window semantics exactly. Ordering is unique (totalprice,
    * orderkey), so rank = row_number. */
  def w2Ntile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // count() is one job and zipWithIndex runs an internal size pass
    // that re-executes the sort before the real pass — materialize the
    // projection once so the scan doesn't run three times (at cluster
    // scale the same role is played by a persisted intermediate)
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .localCheckpoint(true)
    val n = o.count()
    val ranked = o.orderBy(col("o_totalprice"), col("o_orderkey"))
      .rdd.zipWithIndex() // preserves range-partitioned sort order
      .map { case (r, i) => (r.getLong(0), i + 1) }
      .toDF("o_orderkey", "rn")
    // exact ntile(k) distribution: the first n%k buckets hold ceil(n/k)
    val k = 4L
    val q = n / k
    val m = n % k
    val t = (q + 1) * m // rows in the oversized buckets
    // percent_rank of a single-row partition is 0.0, not 0/0
    val pr = if (n > 1) (col("rn") - 1) / (n - 1).toDouble else lit(0.0)
    ranked.select(col("o_orderkey"),
        when(col("rn") <= t, expr(s"(rn - 1) div ${q + 1} + 1"))
          .otherwise(expr(s"$m + (rn - $t - 1) div $q + 1")).as("quartile"),
        pr.as("pr"),
        (col("rn") / n.toDouble).as("cd"))
      .orderBy(col("o_orderkey"))
  }

  /** W3 — lag / lead: inter-event gaps (µs) per user. */
  def w3LagLead(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsUs(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        (col("ts") - lag(col("ts"), 1).over(wUser)).as("gap_prev_us"),
        (lead(col("ts"), 1).over(wUser) - col("ts")).as("gap_next_us"))
      .orderBy(col("event_id"))

  /** W4 — running aggregate, ROWS frame: cumulative value per user. */
  def w4Running(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsUs(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        sum(col("value").cast(Det.Money))
          .over(wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_value"))
      .orderBy(col("event_id"))

  /** W5 — sliding aggregate, RANGE frame: trailing-1h sum per user on the
    * µs timeline. */
  def w5RangeSliding(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(-3600000000L, 0L)
    Tables.eventsUs(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        sum(col("value").cast(Det.Money)).over(w).cast("double")
          .as("trailing_1h_value"),
        count(lit(1)).over(w).as("trailing_1h_n"))
      .orderBy(col("event_id"))
  }

  /** W6 — top-k per group: 3 priciest orders per customer. */
  def w6TopKPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** W7 — first/last value over a full-partition frame: first and last
    * event type per user-day (emitted once per user-day). */
  def w7FirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.eventsUs(spark, sfDir)
      .withColumn("day", expr("ts div 86400000000"))
      .select(col("user_id"), col("day"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"))
      .distinct()
      .orderBy(col("user_id"), col("day"))
  }

  /** W10 — same top-k-per-group semantics as W6, but through the custom
    * physical operator (graft.plans.GroupTopK: logical node + Strategy +
    * two-phase exec with map-side heap pruning). The oracle is the
    * standard window formulation — proving the custom plan reproduces
    * window semantics while shuffling only ≤ groups×k rows per map
    * partition instead of the whole input. */
  def w10TopKExec(spark: SparkSession, sfDir: String): DataFrame =
    graft.plans.GroupTopK(
        Tables.orders(spark, sfDir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        groupCols = Seq("o_custkey"),
        orderSpec = Seq(("o_totalprice", false), ("o_orderkey", true)),
        k = 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))

  /** W13 — the W6 window idiom REWRITTEN BY THE PLANNER into the custom
    * operator: the user writes the standard `row_number().over(...) <= k`
    * + drop pattern and [[graft.plans.GroupTopKRewrite]] (installed
    * session-wide here, conservative guards) swaps in GroupTopKNode —
    * map-side bounded heaps instead of WindowGroupLimit's map-partition
    * sort, no rank computation on the survivors. Same results as the
    * window formulation (the oracle IS the window formulation); the spec
    * asserts the plan actually went through GroupTopKExec.
    *
    * The install is scoped to a FORKED session (same SparkContext,
    * separate experimental methods): an optimizer rule left on the
    * shared session would silently re-plan every later query matching
    * the idiom (l5's top-word rn=1, x3's profile top-10, ...), making
    * bench timings and plan expectations depend on whether w13 ran
    * earlier. A user opts in per-session via
    * `GroupTopK.installRewrite(spark)`. */
  def w13AutoTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark.newSession())
    graft.plans.GroupTopK.installRewrite(s)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** Decay weights 0.8^i, computed ONCE in Scala and embedded as
    * identical double literals in both the Spark plan and the DuckDB
    * oracle — cross-engine pow() in the last ulp is not a risk worth
    * taking. */
  val EwmaWeights: IndexedSeq[Double] =
    (0 until 10).map(i => math.pow(0.8, i))

  /** W11 — exponential moving average over the trailing 10 events per
    * user (time-series smoothing — the family ROWS/RANGE frames can't
    * express because the weight depends on the offset): spelled as a
    * fixed sum of lag(value, i) × 0.8^i terms normalized by the weights
    * actually present, so the frame start of each partition is handled
    * exactly. One user_id shuffle; 10 lags share one Window operator.
    * Both engines evaluate the identical left-associated expression
    * over identical literals, making the doubles bit-equal before the
    * defensive round. */
  def w11Ewma(spark: SparkSession, sfDir: String): DataFrame = {
    val num = EwmaWeights.zipWithIndex.map { case (wt, i) =>
      coalesce(lag(col("value"), i).over(wUser), lit(0.0)) * lit(wt)
    }.reduce(_ + _)
    val den = EwmaWeights.zipWithIndex.map { case (wt, i) =>
      when(lag(col("value"), i).over(wUser).isNotNull, lit(wt))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    Tables.eventsUs(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("ewma", round(num / den, 6))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w11_ewma" -> (w11Ewma _),
    "w1_ranks" -> (w1Ranks _),
    "w2_ntile" -> (w2Ntile _),
    "w3_lag_lead" -> (w3LagLead _),
    "w4_running" -> (w4Running _),
    "w5_range_sliding" -> (w5RangeSliding _),
    "w6_topk_per_group" -> (w6TopKPerGroup _),
    "w7_first_last" -> (w7FirstLast _),
    "w10_topk_exec" -> (w10TopKExec _),
    "w13_auto_topk" -> (w13AutoTopK _))

  val oracles: Map[String, String] = Map(
    "w11_ewma" -> {
      val num = EwmaWeights.zipWithIndex.map { case (wt, i) =>
        s"COALESCE(lag(value, $i) OVER w, 0.0) * $wt"
      }.mkString(" + ")
      val den = EwmaWeights.zipWithIndex.map { case (wt, i) =>
        s"CASE WHEN lag(value, $i) OVER w IS NOT NULL THEN $wt ELSE 0.0 END"
      }.mkString(" + ")
      "SELECT event_id, epoch_us(ts) AS ts, user_id, value, " +
        s"round(($num) / ($den), 6) AS ewma FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) " +
        "ORDER BY user_id, ts, event_id"
    },
    "w1_ranks" ->
      ("SELECT event_id, user_id, " +
       "CAST(row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rn, " +
       "CAST(rank() OVER (PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS rnk, " +
       "CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS drnk " +
       "FROM events ORDER BY event_id"),
    "w2_ntile" ->
      ("SELECT o_orderkey, " +
       "CAST(ntile(4) OVER w AS BIGINT) AS quartile, " +
       "percent_rank() OVER w AS pr, cume_dist() OVER w AS cd FROM orders " +
       "WINDOW w AS (ORDER BY o_totalprice, o_orderkey) ORDER BY o_orderkey"),
    "w3_lag_lead" ->
      ("SELECT event_id, user_id, " +
       "epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_prev_us, " +
       "lead(epoch_us(ts), 1) OVER w - epoch_us(ts) AS gap_next_us FROM events " +
       "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) " +
       "ORDER BY event_id"),
    "w4_running" ->
      ("SELECT event_id, user_id, " +
       "CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER " +
       "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) " +
       "AS running_value FROM events ORDER BY event_id"),
    "w5_range_sliding" ->
      ("SELECT event_id, user_id, " +
       "CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS trailing_1h_value, " +
       "COUNT(*) OVER w AS trailing_1h_n FROM events " +
       "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) " +
       "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) ORDER BY event_id"),
    "w6_topk_per_group" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM " +
       "(SELECT o_custkey, o_orderkey, o_totalprice, " +
       "CAST(row_number() OVER (PARTITION BY o_custkey " +
       "ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn " +
       "FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "w13_auto_topk" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice FROM " +
       "(SELECT o_custkey, o_orderkey, o_totalprice, " +
       "row_number() OVER (PARTITION BY o_custkey " +
       "ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn " +
       "FROM orders) t WHERE rn <= 3 " +
       "ORDER BY o_custkey, o_totalprice DESC, o_orderkey"),
    "w7_first_last" ->
      ("SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day, " +
       "first_value(event_type) OVER w AS first_type, " +
       "last_value(event_type) OVER w AS last_type FROM events " +
       "WINDOW w AS (PARTITION BY user_id, epoch_us(ts) // 86400000000 " +
       "ORDER BY epoch_us(ts), event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
       "ORDER BY user_id, day"),
    "w10_topk_exec" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice FROM " +
       "(SELECT o_custkey, o_orderkey, o_totalprice, " +
       "row_number() OVER (PARTITION BY o_custkey " +
       "ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn " +
       "FROM orders) t WHERE rn <= 3 " +
       "ORDER BY o_custkey, o_totalprice DESC, o_orderkey"))
}
