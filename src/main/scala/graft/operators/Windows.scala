package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** W8 — distribution window functions: percent_rank, cume_dist, and
    * nth_value over customers ranked by balance within market segment.
    * The ORDER BY carries a unique tie-break so rank positions (and the
    * rank-derived doubles) are identical across engines.
    *
    * Computed via the x31/x39 rank DECOMPOSITION, not a window over the
    * 5-value segment key (which would funnel the table through 5 tasks
    * at scale): the unique ordering makes rank = row position, so
    * pr = (rank−1)/(n−1), cd = rank/n, and nth_value(2) is simply the
    * rank-2 row per segment broadcast back. rank itself = (#rows with
    * larger balance) + (tie position by custkey), from a fine-grained
    * (segment, balance) tie window plus cumulative counts over the
    * aggregate-bounded distinct-balance frame. The oracle stays DuckDB's
    * NATIVE percent_rank/cume_dist/nth_value — proving the decomposition
    * reproduces standard window semantics exactly. */
  def w8Distribution(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"))
      .localCheckpoint(true)
    val perBal = base.groupBy(col("c_mktsegment"), col("c_acctbal"))
      .agg(count(lit(1)).as("n_at"))
    val wCum = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perBal.withColumn("c_le", sum(col("n_at")).over(wCum))
      .select(col("c_mktsegment"), col("c_acctbal"),
        (col("c_le") - col("n_at")).as("c_lt"))
    val totals = perBal.groupBy(col("c_mktsegment"))
      .agg(sum(col("n_at")).as("n_seg"))
    val wTie = Window.partitionBy(col("c_mktsegment"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
    val ranked = base
      .withColumn("tie", row_number().over(wTie).cast("long"))
      .join(cum, Seq("c_mktsegment", "c_acctbal"))
      .withColumn("rnk", col("c_lt") + col("tie"))
      .join(broadcast(totals), "c_mktsegment")
    val runnerUp = ranked.filter(col("rnk") === 2)
      .select(col("c_mktsegment"), col("c_name").as("runner_up"))
    ranked.join(broadcast(runnerUp), Seq("c_mktsegment"), "left")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round(when(col("n_seg") === 1, lit(0.0))
          .otherwise((col("rnk") - 1) / (col("n_seg") - 1)), 6).as("pr"),
        round(col("rnk") / col("n_seg"), 6).as("cd"),
        col("runner_up"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  /** W9 — batch sessionization: the lag + running-sum session-id
    * assignment (gap > 30 min starts a new session), the batch twin of
    * the streaming session_window (ST3) — one shuffle on user_id, two
    * window passes, then a grouped agg. Output matches ST3's exactly
    * (session end = last event + gap). */
  def w9BatchSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val gapUs = 1800000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.eventsUs(spark, sfDir)
      .withColumn("new_sess",
        when(col("ts") - lag(col("ts"), 1).over(w) > gapUs ||
          lag(col("ts"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("sess_start_us"),
        (max(col("ts")) + gapUs).as("sess_end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sess_start_us"), col("sess_end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("sess_start_us"))
  }
  /** W12 — IGNORE NULLS window offsets: last-observation-carried-forward
    * (the sensor/tick gap-fill idiom) plus the previous non-null reading
    * — `last(col, ignoreNulls)` and `lag IGNORE NULLS` over a per-user
    * event-time order. Nulls are planted deterministically (`event_id %
    * 5 = 0`) so every partition mixes present and missing readings. */
  def w12IgnoreNulls(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.eventsUs(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_id") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
      .select(col("user_id"), col("event_id"), col("v"),
        last(col("v"), ignoreNulls = true).over(wRun).as("locf"),
        expr("lag(v) IGNORE NULLS OVER (PARTITION BY user_id " +
          "ORDER BY ts, event_id)").as("prev_reading"))
      .orderBy(col("user_id"), col("event_id"))
  }
  /** W14 — native batch `session_window` (the built-in Spark 4 session
    * assignment in BATCH mode): 30-minute-gap sessions per user straight
    * from the grouping function, proving batch, the w9 lag+cumsum
    * decomposition, and the st3/st13 streaming forms all agree on the
    * same session decomposition (all four share one oracle SQL). The
    * group key (user, session) grows with the data — no funnel. */
  def w14SessionWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsUs(spark, sfDir)
      .select(col("user_id"), timestamp_micros(col("ts")).as("ts_t"))
      .groupBy(col("user_id"), session_window(col("ts_t"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start_us"),
        unix_micros(col("session_window.end")).as("sess_end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("sess_start_us"))
  /** The reusable core of w16 — a GLOBAL cumulative sum with NO
    * single-partition window (the thing PlanLint exists to forbid):
    * classic two-phase distributed prefix sum.
    *
    *  1. range-partition by the order key (each partition owns a
    *     contiguous key range),
    *  2. per-partition running sums via a window PARTITIONED BY the
    *     physical partition id (bounded, parallel),
    *  3. per-partition totals → exclusive prefix offsets (one row per
    *     partition — bounded driver work) broadcast-joined back.
    *
    * The result is independent of where the sampled range boundaries
    * fall, so it is deterministic even though repartitionByRange
    * samples. Input must be one row per key (pre-aggregate first);
    * value must be DecimalType so every sum is exact and
    * order-independent. At 100 TB this replaces the
    * everything-into-one-task global window with one range shuffle +
    * a tiny offsets table. */
  def distributedCumSum(df: DataFrame, key: Column, value: Column,
      nParts: Int): DataFrame = {
    val spark = df.sparkSession
    // pin the partition assignment: the offsets pass and the final pass
    // MUST see identical pids, and the range boundaries come from a
    // sampling pass we don't want to run twice
    val parts = df.select(key.as("k"), value.as("v"))
      .repartitionByRange(nParts, col("k"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    // ONE row per physical partition — control-plane metadata bounded
    // by cluster size (what RangePartitioner itself collects), never by
    // data size; the exclusive prefix over ≤ nParts totals is O(nParts)
    // driver arithmetic in exact BigDecimal
    val totals = parts.groupBy(col("pid"))
      .agg(sum(col("v")).as("ptotal"))
      .collect()
      .map(r => (r.getInt(0), BigDecimal(r.getDecimal(1))))
      .sortBy(_._1)
    var acc = BigDecimal(0)
    val offsets = totals.map { case (pid, t) =>
      val o = acc; acc += t; (pid, o)
    }.toSeq
    import spark.implicits._
    val offDf = offsets.toDF("pid", "offset")
    val w = Window.partitionBy(col("pid")).orderBy(col("k"))
    parts.join(broadcast(offDf), "pid")
      .withColumn("cum", col("offset") + sum(col("v")).over(w))
      .select(col("k"), col("v"), col("cum"))
  }

  /** W16 — global running revenue by day over orders, through
    * [[distributedCumSum]]: per-day DECIMAL totals (one grouped agg),
    * then the two-phase distributed prefix sum. The offsets window runs
    * over ONE ROW PER PARTITION (8 rows) — that bounded frame is the
    * only global ordering anywhere in the plan. */
  def w16DistributedCumSum(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(col("o_totalprice").cast(Det.Money)).as("rev"))
    distributedCumSum(daily, col("day"), col("rev"), 8)
      .select(col("k").as("day"), col("v").cast("double").as("revenue"),
        col("cum").cast("double").as("cum_revenue"))
      .orderBy(col("day"))
  }
  /** W17 — ratio_to_report window family (the BI share-of-total
    * everywhere in dashboards): each order's revenue share within its
    * priority group AND of the grand total, in one pass — the grouped
    * share is a keyed window; the GRAND total deliberately comes from
    * a one-row aggregate cross-joined in (broadcast), NOT an empty-
    * PARTITION-BY window (PlanLint forbids the single-partition form
    * at any scale). DECIMAL sums exact; the two divisions are single
    * IEEE ops. Top-100 by share for a bounded contract row. */
  def w17RatioToReport(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast(Det.Money).as("p"))
    // group totals as a 5-row GROUPED AGGREGATE broadcast back — not a
    // window: PlanLint's low-cardinality-window-key rule (correctly)
    // rejects a window partitioned by a 5-value domain, which funnels
    // the whole stream through 5 tasks at scale; the aggregate keeps
    // map-side partials and the join broadcasts
    val grpTotals = o.groupBy(col("o_orderpriority"))
      .agg(sum(col("p")).as("grp_total"))
    val grand = o.agg(sum(col("p")).as("g"))
    o.join(grpTotals, "o_orderpriority")
      .crossJoin(grand)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("p").cast("double") / col("grp_total").cast("double"), 9)
          .as("share_of_priority"),
        round(col("p").cast("double") / col("g").cast("double"), 9)
          .as("share_of_total"))
      .orderBy(col("share_of_total").desc, col("o_orderkey")).limit(100)
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
    "w13_auto_topk" -> (w13AutoTopK _),
    "w9_batch_sessionize" -> (w9BatchSessionize _),
    "w8_distribution" -> (w8Distribution _),
    "w12_ignore_nulls" -> (w12IgnoreNulls _),
    "w14_session_window" -> (w14SessionWindow _),
    "w16_distributed_cumsum" -> (w16DistributedCumSum _),
    "w17_ratio_to_report" -> (w17RatioToReport _))

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
       "ORDER BY o_custkey, o_totalprice DESC, o_orderkey"),
    // same SQL as the streaming session-window oracle (ST3): batch and
    // stream must agree on the session decomposition
    "w9_batch_sessionize" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events), " +
       "flagged AS (SELECT user_id, t, CASE WHEN t - lag(t) OVER " +
       "(PARTITION BY user_id ORDER BY t) > 1800000000 " +
       "OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL " +
       "THEN 1 ELSE 0 END AS new_sess FROM e), " +
       "sess AS (SELECT user_id, t, SUM(new_sess) OVER " +
       "(PARTITION BY user_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING " +
       "AND CURRENT ROW) AS sid FROM flagged) " +
       "SELECT user_id, MIN(t) AS sess_start_us, " +
       "MAX(t) + 1800000000 AS sess_end_us, COUNT(*) AS n_events " +
       "FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start_us"),
"w8_distribution" ->
      ("SELECT c_custkey, c_mktsegment, c_acctbal, " +
       "round(percent_rank() OVER w, 6) AS pr, " +
       "round(cume_dist() OVER w, 6) AS cd, " +
       "nth_value(c_name, 2) OVER (PARTITION BY c_mktsegment " +
       "ORDER BY c_acctbal DESC, c_custkey ASC " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS runner_up " +
       "FROM customer " +
       "WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) " +
       "ORDER BY c_mktsegment, c_custkey"),
    "w12_ignore_nulls" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, " +
       "CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v " +
       "FROM events) " +
       "SELECT user_id, event_id, v, " +
       "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id " +
       "ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING " +
       "AND CURRENT ROW) AS locf, " +
       "lag(v IGNORE NULLS) OVER (PARTITION BY user_id " +
       "ORDER BY ts_us, event_id) AS prev_reading " +
       "FROM e ORDER BY user_id, event_id"),
    // same SQL as the streaming session-window oracle (ST3/w9): batch
    // session_window, the lag+cumsum form, and the stream must agree
    "w14_session_window" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events), " +
       "flagged AS (SELECT user_id, t, CASE WHEN t - lag(t) OVER " +
       "(PARTITION BY user_id ORDER BY t) > 1800000000 " +
       "OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL " +
       "THEN 1 ELSE 0 END AS new_sess FROM e), " +
       "sess AS (SELECT user_id, t, SUM(new_sess) OVER " +
       "(PARTITION BY user_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING " +
       "AND CURRENT ROW) AS sid FROM flagged) " +
       "SELECT user_id, MIN(t) AS sess_start_us, " +
       "MAX(t) + 1800000000 AS sess_end_us, COUNT(*) AS n_events " +
       "FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start_us"),
    // DECIMAL window sum is exact, so the two-phase Spark plan and the
    // oracle's single window agree bitwise after the final double cast
    "w16_distributed_cumsum" ->
      ("WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, " +
       "SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev " +
       "FROM orders GROUP BY 1) " +
       "SELECT day, CAST(rev AS DOUBLE) AS revenue, " +
       "CAST(SUM(rev) OVER (ORDER BY day) AS DOUBLE) AS cum_revenue " +
       "FROM d ORDER BY day"),
    // keyed window share + broadcast grand total, same rounding
    "w17_ratio_to_report" ->
      ("WITH o AS (SELECT o_orderkey, o_orderpriority, " +
       "CAST(o_totalprice AS DECIMAL(18,4)) AS p FROM orders), " +
       "g AS (SELECT SUM(p) AS g FROM o), " +
       "w AS (SELECT o_orderkey, o_orderpriority, p, " +
       "SUM(p) OVER (PARTITION BY o_orderpriority) AS grp_total FROM o) " +
       "SELECT o_orderkey, o_orderpriority, " +
       "round(CAST(p AS DOUBLE) / CAST(grp_total AS DOUBLE), 9) " +
       "AS share_of_priority, " +
       "round(CAST(p AS DOUBLE) / CAST(g.g AS DOUBLE), 9) " +
       "AS share_of_total FROM w CROSS JOIN g " +
       "ORDER BY share_of_total DESC, o_orderkey LIMIT 100"))
}
