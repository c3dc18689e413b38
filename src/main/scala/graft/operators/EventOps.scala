package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Det, Tables}

/** TIME-SERIES / BEHAVIORAL-ANALYTICS theme module (round 11 — the
  * ExtrasN naming-debt retirement, VERDICT r10 #7): the event-stream
  * and customer-behavior rows, moved verbatim from
  * Extras5/9/10/11/16/17/18/19. Everything runs as keyed windows or
  * decomposed aggregates over the events/orders tables — per-user
  * frames are bounded, exact-decimal money arithmetic throughout.
  *
  * Rows: x45 funnel, x65 peak concurrency, x73 last-touch attribution,
  * x92 retention cohorts, x103 event paths, x105 TWAP, x110
  * time-to-convert, x116 linear multi-touch, x117 seasonal anomaly,
  * x120 CUSUM changepoint, x133 session depth, x159 stickiness,
  * x162 Holt forecast, x163 OHLC bars, x164 gap audit, x165 streaks,
  * x166 LTV cohorts, x167 collapse runs, x170 RFM segmentation.
  */
object EventOps {

  // ---------------------------------------------------------------- x159

  private val UsPerDay = 86400000000L

  private val HoltAlpha = 0.3
  private val HoltBeta = 0.1
  private val HoltHorizon = 14


  /** X73 — last-touch attribution (the marketing-analytics join every
    * event warehouse runs): each purchase attributed to the SAME USER's
    * most recent strictly-preceding click within a 7-day lookback.
    * One window pass per user ((ts, event_id) total order) with an
    * IGNORE-NULLS last_value over the UNBOUNDED..1 PRECEDING frame —
    * no self-join, no per-purchase scan; the 100 TB shape is one
    * shuffle keyed by user. w12 proved the IGNORE NULLS offset
    * semantics engine-identical; the gap arithmetic is integer µs. */
  def x73Attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.eventsUs(spark, sfDir)
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn("click_ts",
        last(when(col("event_type") === "click", col("ts")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("click_id").isNotNull)
      .withColumn("gap_us", col("ts") - col("click_ts"))
      .filter(col("gap_us") <= 604800000000L)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("click_id"), col("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** X92 — retention cohort matrix (the product-analytics table every
    * events warehouse serves): users cohorted by FIRST-EVENT WEEK, and
    * for each (cohort week, week offset) the count of distinct users
    * still active — the diagonal matrix a retention chart reads.
    * Cohorts are one grouped min; the activity join is keyed by user
    * (one shuffle); week arithmetic is integer µs division. At 100 TB
    * the matrix is (weeks × offsets) rows — tiny — while every
    * heavy frame is user- or event-cardinality with map-side
    * partials. */
  def x92RetentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.eventsUs(spark, sfDir)
      .select(col("user_id"), expr("ts div 604800000000").as("week"))
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    ev.join(cohorts, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** X103 — user-journey path mining: the 10 most common 3-step
    * event-type sequences across all users (the "view → click →
    * purchase" table a product team reads). Each user's timeline
    * collapses to ONE ordered path string (array_sort over the unique
    * (ts, event_id) key makes the order total and engine-identical),
    * and the 3-step windows come from the SAME n-gram generator the
    * text pipeline uses ([[graft.api.TextPipeline.ngramRows]] — the
    * library composing over its own parts). One grouped collect per
    * user (bounded by per-user activity), one vocabulary-keyed count,
    * one distributed top-k. */
  def x103EventPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val paths = Tables.eventsUs(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(concat_ws(" ", expr(
        "transform(array_sort(collect_list(struct(ts, event_id, event_type)))," +
          " x -> x.event_type)")).as("path"))
    graft.api.TextPipeline.ngramRows(paths, "user_id", "path", 3)
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n_occur"),
        countDistinct(col("doc_id")).as("n_users"))
      .orderBy(col("n_occur").desc, col("ngram"))
      .limit(10)
      .select(col("ngram").as("path3"), col("n_occur"), col("n_users"))
      .orderBy(col("n_occur").desc, col("path3"))
  }

  /** X105 — time-weighted average (TWAP — the billing/metrics mean
    * that a plain average gets wrong when samples are irregular): per
    * event type, Σ value·Δt / ΣΔt where Δt is the µs gap to the type's
    * next event. Gaps come from `lead` (an OFFSET window function —
    * per-key state is one row, the exempt class in PlanLint's
    * low-cardinality rule); value·Δt is DECIMAL × BIGINT (exact), so
    * only the final division is IEEE and the result is
    * partition-independent. */
  def x105Twap(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.eventsUs(spark, sfDir)
      .select(col("event_type"), col("ts"), col("event_id"),
        col("value").cast(Det.Money).as("v"))
      // whole-second weights: keeps the exact decimal Σ v·Δt under
      // 2^53 ULPs, where the decimal→double conversion is EXACT on
      // both engines (µs weights pushed the sum past 19 significant
      // digits, where the two engines' conversion paths round a
      // different last ulp — found by the oracle, not by review)
      .withColumn("dur",
        expr("(lead(ts, 1) OVER (PARTITION BY event_type " +
          "ORDER BY ts, event_id) - ts) div 1000000"))
      .filter(col("dur").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur")).as("span_s"),
        (sum(col("v") * col("dur")).cast("double") /
          sum(col("dur"))).as("twap"))
      .orderBy(col("event_type"))
  }

  /** X110 — conversion-latency distribution (the funnel-health readout
    * next to x73's attribution): per event-day, how long attributed
    * purchases took from their last click — count, exact interpolated
    * median and p90 in integer µs (midpoint interpolation on values
    * ≪ 2^53 is exact IEEE on both engines — a17's proven surface),
    * plus the decimal-routed mean. One window pass (x73) + one grouped
    * aggregate; day keying keeps the percentile sort-aggs on bounded
    * per-day frames at any scale. */
  def x110TimeToConvert(spark: SparkSession, sfDir: String): DataFrame =
    x73Attribution(spark, sfDir)
      .join(Tables.eventsUs(spark, sfDir)
        .select(col("event_id").as("purchase_id"),
          expr("ts div 86400000000").as("day")), "purchase_id")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_conversions"),
        median(col("gap_us").cast("double")).as("median_gap_us"),
        percentile(col("gap_us").cast("double"), lit(0.9)).as("p90_gap_us"),
        // integer µs sum is EXACT in BIGINT; one int64→double
        // conversion + one division are single IEEE ops on both
        // engines (the DECIMAL route re-hits §7.3 #12 here)
        (sum(col("gap_us")).cast("double") / count(lit(1)))
          .as("mean_gap_us"))
      .orderBy(col("day"))

  /** X116 — LINEAR multi-touch attribution (x73's last-touch widened to
    * the model marketing actually argues about): every click of the
    * same user in the 7 days BEFORE a purchase shares the purchase
    * value equally. One RANGE-frame window pass over the per-user
    * event timeline — count of clicks in [t−7d, t) — no join, no
    * explosion of (purchase × click) rows: the per-touch credit is
    * value/n, emitted per purchase. The frame is keyed by user and
    * bounded by the 7-day range, so window state is bounded at any
    * scale. Exact µs arithmetic; credit division is one IEEE op on
    * identical inputs, rounded to 6 dp. */
  def x116MultiTouch(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(-604800000000L, -1L)
    Tables.eventsUs(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
      .withColumn("n_touches",
        count(when(col("event_type") === "click", 1)).over(w))
      .filter(col("event_type") === "purchase" && col("n_touches") > 0)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("n_touches"),
        round(col("value") / col("n_touches"), 6).as("credit_per_touch"))
      .orderBy(col("purchase_id"))
  }

  /** X117 — seasonal anomaly detection (the ops-dashboard staple):
    * each (event_type, day)'s event count scored against its
    * day-of-week baseline — z = (n − mean_dow) / stddev_dow — so a
    * quiet Sunday isn't flagged for being quieter than Tuesdays.
    * Determinism is a23's sufficient-statistics pattern: counts are
    * integers, (n_days, Σx, Σx²) are exact BIGINT sums, and mean /
    * sample-variance / z run closed-form in doubles spelled identically
    * in both engines. Two grouped aggregates + one broadcast-sized
    * join (the baseline table is 7 × event-types rows at ANY scale). */
  def x117SeasonalAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.eventsUs(spark, sfDir)
      .groupBy(col("event_type"),
        expr("ts div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val base = daily.withColumn("dow", col("day") % 7)
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("nd"), sum(col("n")).as("sx"),
        sum(col("n") * col("n")).as("sx2"))
      .filter(col("nd") > 1)
    val ndD = col("nd").cast("double")
    val sxD = col("sx").cast("double")
    val varS = (ndD * col("sx2").cast("double") - sxD * sxD) /
      (ndD * (ndD - lit(1.0)))
    val z = (col("n").cast("double") - sxD / ndD) / sqrt(col("var_s"))
    daily.withColumn("dow", col("day") % 7)
      .join(base.withColumn("var_s", varS)
        .select(col("event_type"), col("dow"), col("var_s"),
          col("nd"), col("sx")), Seq("event_type", "dow"))
      .filter(col("var_s") > 0)
      .select(col("event_type"), col("day"), col("n"),
        round(z, 6).as("z"),
        (abs(z) > 3.0).as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  /** X120 — change-point detection (CUSUM, Page 1954, the offline
    * max-deviation form): per event type, the day where the cumulative
    * deviation of daily value sums from the series mean peaks —
    * |S_k| = |Σ_{i≤k} x_i − k·x̄| maximized over k. No recursion
    * needed: S_k decomposes into (exact DECIMAL prefix sum) − k·mean,
    * so one keyed window cumsum + one max-by gives the change point
    * with every float op spelled identically cross-engine (prefix sums
    * exact; k·mean and the subtraction are single IEEE ops). Window
    * partitions by event type — keyed, never global. */
  def x120Changepoint(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.eventsUs(spark, sfDir)
      .groupBy(col("event_type"), expr("ts div 86400000000").as("day"))
      .agg(sum(col("value").cast(Det.Money)).as("v"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    val dev = abs(col("prefix").cast("double") -
      col("k").cast("double") *
        (col("total").cast("double") / col("n_days").cast("double")))
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("dev").desc, col("day"))
    daily
      .withColumn("prefix", sum(col("v")).over(wCum))
      .withColumn("k", count(lit(1)).over(wCum))
      .withColumn("total", sum(col("v")).over(wAll))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("dev", round(dev, 6))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        col("dev").as("max_dev"))
      .orderBy(col("event_type"))
  }

  /** X133 — session-depth distribution + bounce rate (the web-
    * analytics summary w9's raw session table feeds): sessions
    * rebuilt by the same 30-minute-gap rule, bucketed by event depth
    * (1 / 2 / 3–5 / 6–10 / 11+), with each bucket's session share and
    * the global bounce rate (depth-1 share) riding every row. Two
    * keyed aggregates + one broadcast total — the sessionization
    * window is user-keyed (w9's shape), never global. Shares are one
    * division of exact counts, rounded 6. */
  def x133SessionDepth(spark: SparkSession, sfDir: String): DataFrame = {
    val gapUs = 1800000000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    val wRun = w.rowsBetween(Long.MinValue, 0)
    val depth = Tables.eventsUs(spark, sfDir)
      .withColumn("new_sess",
        when(col("ts") - lag(col("ts"), 1).over(w) > gapUs ||
          lag(col("ts"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("depth"))
    val bucket = when(col("depth") === 1, "1_bounce")
      .when(col("depth") === 2, "2")
      .when(col("depth") <= 5, "3-5")
      .when(col("depth") <= 10, "6-10")
      .otherwise("11+")
    val byBucket = depth.select(bucket.as("depth_bucket"))
      .groupBy(col("depth_bucket")).agg(count(lit(1)).as("n_sessions"))
    val totals = depth.agg(count(lit(1)).as("total"),
      sum(when(col("depth") === 1, 1L).otherwise(0L)).as("bounces"))
    byBucket.crossJoin(totals)
      .select(col("depth_bucket"), col("n_sessions"),
        round(col("n_sessions").cast("double") /
          col("total").cast("double"), 6).as("share"),
        round(col("bounces").cast("double") /
          col("total").cast("double"), 6).as("bounce_rate"))
      .orderBy(col("depth_bucket"))
  }

  /** X45 — ordered funnel analysis (view → click → purchase): per user,
    * the earliest view, the earliest click AT OR AFTER that view, and
    * the earliest purchase at or after that click — the product-
    * analytics staple where ORDER matters (a purchase before the first
    * view does not convert the funnel).
    *
    * Scale shape: three window expressions over ONE user_id
    * partitioning — the key grows with the data (never a funnel) and
    * Spark plans all three Window operators over a single exchange
    * (later windows reuse the child's hash partitioning). No self-joins:
    * the stage-N timestamp is a conditional min over the same partition
    * referencing the stage-N−1 column. The oracle computes the same
    * stages with grouped aggregates + joins — different plan, identical
    * values. */
  def x45Funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.eventsUs(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") >= col("t_view"),
          col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" &&
          col("ts") >= col("t_click"), col("ts"))).over(w))
      .select(col("user_id"), col("t_view"), col("t_click"),
        col("t_purchase"))
      .distinct()
      .withColumn("stage",
        (when(col("t_view").isNotNull, 1).otherwise(0) +
          when(col("t_click").isNotNull, 1).otherwise(0) +
          when(col("t_purchase").isNotNull, 1).otherwise(0)).cast("int"))
      .orderBy(col("user_id"))
  }

  /** X65 — peak-concurrency interval sweep: per day, the maximum number
    * of simultaneously-open event intervals (start = event ts, duration
    * = a pure-integer function of event_id, end clipped to the day
    * boundary so days are independent). The classic ±1 endpoint sweep:
    * explode each interval to a (+1 at start, −1 at end) pair and take
    * MAX of the running sum — capacity planning's core query.
    *
    * Scale shape: the window partitions BY DAY (thousands of
    * independent partitions at 100 TB — never a global sort), and the
    * default RANGE UNBOUNDED→CURRENT frame makes tie handling
    * deterministic on both engines: peers (equal (t, delta)) all see
    * the whole peer group's sum, and mixed-sign ties are separated by
    * the delta sort key (ends before starts at the same instant —
    * end-exclusive semantics). The peak is therefore
    * permutation-invariant and engine-identical. */
  def x65PeakConcurrency(spark: SparkSession, sfDir: String): DataFrame = {
    val iv = Tables.eventsUs(spark, sfDir)
      .select(col("ts").as("t"),
        ((col("event_id") % 3600 + 1) * 1000000L).as("dur"))
      .withColumn("day", expr("t div 86400000000"))
    val pts = iv.select(col("day"), col("t"), lit(1).as("delta"))
      .unionAll(iv.select(col("day"),
        least(col("t") + col("dur"),
          (col("day") + 1) * 86400000000L).as("t"),
        lit(-1).as("delta")))
    val w = Window.partitionBy(col("day")).orderBy(col("t"), col("delta"))
    pts.withColumn("run", sum(col("delta")).over(w))
      .groupBy(col("day"))
      .agg(sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_events"),
        max(col("run")).as("peak"))
      .orderBy(col("day"))
  }

  /** X159 — engagement stickiness: per day, the distinct active users
    * (DAU), the trailing-7-day actives (WAU), the calendar-month
    * actives (MAU), and the DAU/WAU + DAU/MAU ratios — the growth
    * metric that distinguishes "many users" from "users who return".
    *
    * Scale shape: the corpus reduces to the distinct (day, user)
    * frame in one pass; the trailing-7-day distinct is a range join of
    * the DAY SPINE against that frame (7× day-user rows, never
    * events×events), and month actives are one more grouped distinct.
    * All counts exact; the two ratios are single IEEE divisions. */
  def x159Stickiness(spark: SparkSession, sfDir: String): DataFrame =
    graft.api.Analytics.stickiness(
      Tables.eventsUs(spark, sfDir)
        .select(expr(s"ts div $UsPerDay").as("day"), col("user_id")),
      "day", "user_id",
      d => year(timestamp_micros(d * UsPerDay)) * 100 +
        month(timestamp_micros(d * UsPerDay)))

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

  // ---------------------------------------------------------------- x164

  /** X164 — calendar-gap audit of the order stream: every run of
    * missing days (gap start, gap end, length) plus the TOTAL row
    * (observed days, expected span, missing count) — the completeness
    * check a freshness SLA fires on, where "no data for 3 days" is
    * the incident and a table of gaps is the evidence.
    *
    * Scale shape: the corpus reduces to the observed-day domain in one
    * grouped pass; gaps are found by pairing each observed day with
    * the NEXT observed day — spelled as a min-over-theta-join on the
    * day-domain frame (the x138 prefix discipline; no global window) —
    * and keeping pairs more than one day apart. All-integer output. */
  def x164GapAudit(spark: SparkSession, sfDir: String): DataFrame =
    graft.api.Analytics.gapAudit(
      Tables.orders(spark, sfDir).select(
        expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
          .as("day")),
      "day")

  // ---------------------------------------------------------------- x165

  /** X165 — longest activity streaks: for each user, runs of
    * CONSECUTIVE active days via the gaps-and-islands trick (island
    * id = day − row_number within user), then the top-20 streaks by
    * (length desc, user, start day) — the "7-day streak" engagement
    * mechanic, computed exactly.
    *
    * Scale shape: one pass to the distinct (user, day) frame, one
    * user-partitioned window (keyed on user_id — data-parallel across
    * users, never a global sort), one grouped count over islands.
    * All-integer output. */
  def x165Streaks(spark: SparkSession, sfDir: String): DataFrame =
    graft.api.Analytics.streaks(
      Tables.eventsUs(spark, sfDir)
        .select(expr("ts div 86400000000").as("day"), col("user_id")),
      "user_id", "day")
      .withColumnRenamed("k", "user_id")
      .orderBy(col("streak").desc, col("user_id"), col("start_day"))
      .limit(20)

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x103_event_paths" -> (x103EventPaths _),
    "x105_twap" -> (x105Twap _),
    "x110_time_to_convert" -> (x110TimeToConvert _),
    "x73_attribution" -> (x73Attribution _),
    "x92_retention_cohorts" -> (x92RetentionCohorts _),
    "x116_multitouch" -> (x116MultiTouch _),
    "x117_seasonal_anomaly" -> (x117SeasonalAnomaly _),
    "x120_changepoint" -> (x120Changepoint _),
    "x133_session_depth" -> (x133SessionDepth _),
    "x45_funnel" -> (x45Funnel _),
    "x65_peak_concurrency" -> (x65PeakConcurrency _),
    "x159_stickiness" -> (x159Stickiness _),
    "x162_holt_forecast" -> (x162HoltForecast _),
    "x163_ohlc" -> (x163Ohlc _),
    "x164_gap_audit" -> (x164GapAudit _),
    "x165_streaks" -> (x165Streaks _),
    "x166_ltv_cohorts" -> (x166LtvCohorts _),
    "x167_collapse_runs" -> (x167CollapseRuns _),
    "x170_rfm" -> (x170Rfm _))

  private val StickinessSql: String =
    "WITH du AS MATERIALIZED (SELECT DISTINCT " +
    "epoch_us(ts) // 86400000000 AS day, user_id FROM events), " +
    "dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY 1), " +
    "wau AS (SELECT d.day, COUNT(DISTINCT du.user_id) AS wau " +
    "FROM (SELECT DISTINCT day FROM du) d JOIN du " +
    "ON du.day BETWEEN d.day - 6 AND d.day GROUP BY 1), " +
    "mu AS (SELECT year(make_timestamp(day * 86400000000)) * 100 + " +
    "month(make_timestamp(day * 86400000000)) AS ym, day, user_id " +
    "FROM du), " +
    "mau AS (SELECT ym, COUNT(DISTINCT user_id) AS mau FROM mu " +
    "GROUP BY 1) " +
    "SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau, " +
    "CAST(wau.wau AS BIGINT) AS wau, CAST(mau.mau AS BIGINT) AS mau, " +
    "round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6) " +
    "AS dau_wau, " +
    "round(CAST(dau.dau AS DOUBLE) / CAST(mau.mau AS DOUBLE), 6) " +
    "AS dau_mau FROM dau JOIN wau ON wau.day = dau.day " +
    "JOIN (SELECT DISTINCT ym, day FROM mu) md ON md.day = dau.day " +
    "JOIN mau ON mau.ym = md.ym ORDER BY dau.day"

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

  private val GapSql: String =
    "WITH days AS MATERIALIZED (SELECT " +
    "epoch_us(o_orderdate) // 86400000000 AS day FROM orders GROUP BY 1), " +
    "nxt AS (SELECT a.day, MIN(b.day) AS next_day FROM days a " +
    "LEFT JOIN days b ON b.day > a.day GROUP BY 1), " +
    "gaps AS (SELECT CAST(day + 1 AS BIGINT) AS gap_start, " +
    "CAST(next_day - 1 AS BIGINT) AS gap_end, " +
    "CAST(next_day - day - 1 AS BIGINT) AS gap_len FROM nxt " +
    "WHERE next_day > day + 1), " +
    "st AS (SELECT CAST(-1 AS BIGINT) AS gap_start, " +
    "CAST(-1 AS BIGINT) AS gap_end, " +
    "CAST(MAX(day) - MIN(day) + 1 - COUNT(*) AS BIGINT) AS gap_len " +
    "FROM days) " +
    "SELECT * FROM (SELECT * FROM gaps UNION ALL SELECT * FROM st) u " +
    "ORDER BY gap_start"

  private val StreaksSql: String =
    "WITH du AS MATERIALIZED (SELECT DISTINCT " +
    "epoch_us(ts) // 86400000000 AS day, user_id FROM events), " +
    "isl AS (SELECT user_id, day, " +
    "day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g " +
    "FROM du), " +
    "runs AS (SELECT user_id, MIN(day) AS start_day, " +
    "CAST(COUNT(*) AS BIGINT) AS streak FROM isl GROUP BY user_id, g) " +
    "SELECT user_id, CAST(start_day AS BIGINT) AS start_day, streak " +
    "FROM runs ORDER BY streak DESC, user_id, start_day LIMIT 20"

  private val LtvMaxAge = 11

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
    // path strings rebuilt under the same total (ts, event_id) order,
    // 3-step windows from the shared n-gram spelling
    "x103_event_paths" ->
      (s"WITH paths AS (SELECT user_id AS doc_id, " +
       "array_to_string(list_transform(list_sort(list(" +
       "struct_pack(t := epoch_us(ts), e := event_id, y := event_type))), " +
       "x -> x.y), ' ') AS text FROM events GROUP BY user_id) " +
       s"SELECT ngram AS path3, CAST(COUNT(*) AS BIGINT) AS n_occur, " +
       "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_users " +
       s"FROM (${TextOps.ngramSqlOver("paths", 3)}) t GROUP BY ngram " +
       "ORDER BY n_occur DESC, path3 LIMIT 10"),
    // exact decimal x bigint weights; only the final division is IEEE
    "x105_twap" ->
      ("WITH ev AS (SELECT event_type, epoch_us(ts) AS t, event_id, " +
       "CAST(value AS DECIMAL(18,4)) AS v FROM events), " +
       "g AS (SELECT event_type, v, (lead(t) OVER (PARTITION BY event_type " +
       "ORDER BY t, event_id) - t) // 1000000 AS dur FROM ev) " +
       "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals, " +
       "CAST(SUM(dur) AS BIGINT) AS span_s, " +
       "CAST(SUM(v * dur) AS DOUBLE) / CAST(SUM(dur) AS BIGINT) AS twap " +
       "FROM g WHERE dur IS NOT NULL GROUP BY event_type " +
       "ORDER BY event_type"),
    // x73's attribution restated, then a17's proven median/quantile
    // surface per day
    "x110_time_to_convert" ->
      ("WITH ev AS (SELECT event_id, user_id, event_type, " +
       "epoch_us(ts) AS t FROM events), " +
       "att AS (SELECT event_id, user_id, event_type, t, " +
       "last_value(CASE WHEN event_type = 'click' THEN event_id END " +
       "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id, " +
       "last_value(CASE WHEN event_type = 'click' THEN t END " +
       "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts " +
       "FROM ev), " +
       "conv AS (SELECT t - click_ts AS gap_us, t // 86400000000 AS day " +
       "FROM att WHERE event_type = 'purchase' AND click_id IS NOT NULL " +
       "AND t - click_ts <= 604800000000) " +
       "SELECT day, CAST(COUNT(*) AS BIGINT) AS n_conversions, " +
       "median(CAST(gap_us AS DOUBLE)) AS median_gap_us, " +
       "quantile_cont(CAST(gap_us AS DOUBLE), 0.9) AS p90_gap_us, " +
       "CAST(CAST(SUM(gap_us) AS BIGINT) AS DOUBLE) / COUNT(*) " +
       "AS mean_gap_us FROM conv GROUP BY day ORDER BY day"),
    "x73_attribution" ->
      ("WITH ev AS (SELECT event_id, user_id, event_type, " +
       "epoch_us(ts) AS t FROM events), " +
       "att AS (SELECT event_id, user_id, event_type, t, " +
       "last_value(CASE WHEN event_type = 'click' THEN event_id END " +
       "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id, " +
       "last_value(CASE WHEN event_type = 'click' THEN t END " +
       "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts " +
       "FROM ev) " +
       "SELECT event_id AS purchase_id, user_id, click_id, " +
       "t - click_ts AS gap_us FROM att " +
       "WHERE event_type = 'purchase' AND click_id IS NOT NULL " +
       "AND t - click_ts <= 604800000000 ORDER BY purchase_id"),
    "x92_retention_cohorts" ->
      ("WITH ev AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week " +
       "FROM events), " +
       "c AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1), " +
       "a AS (SELECT DISTINCT ev.user_id, c.cohort_week, " +
       "ev.week - c.cohort_week AS week_offset " +
       "FROM ev JOIN c ON ev.user_id = c.user_id) " +
       "SELECT cohort_week, week_offset, " +
       "CAST(COUNT(*) AS BIGINT) AS n_active_users FROM a " +
       "GROUP BY 1, 2 ORDER BY cohort_week, week_offset"),
    // same RANGE-frame click count per purchase
    "x116_multitouch" ->
      ("WITH ev AS (SELECT event_id, user_id, event_type, " +
       "epoch_us(ts) AS t, value FROM events), " +
       "a AS (SELECT event_id, user_id, event_type, value, " +
       "COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER " +
       "(PARTITION BY user_id ORDER BY t " +
       "RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING) " +
       "AS n_touches FROM ev) " +
       "SELECT event_id AS purchase_id, user_id, n_touches, " +
       "round(value / n_touches, 6) AS credit_per_touch FROM a " +
       "WHERE event_type = 'purchase' AND n_touches > 0 " +
       "ORDER BY purchase_id"),
    // same sufficient statistics, same closed-form double arithmetic
    "x117_seasonal_anomaly" ->
      ("WITH daily AS (SELECT event_type, " +
       "epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n " +
       "FROM events GROUP BY 1, 2), " +
       "b AS (SELECT event_type, day % 7 AS dow, " +
       "CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(n) AS BIGINT) AS sx, " +
       "CAST(SUM(n * n) AS BIGINT) AS sx2 FROM daily GROUP BY 1, 2 " +
       "HAVING COUNT(*) > 1), " +
       "j AS (SELECT d.event_type, d.day, d.n, " +
       "(CAST(nd AS DOUBLE) * CAST(sx2 AS DOUBLE) - " +
       "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / " +
       "(CAST(nd AS DOUBLE) * (CAST(nd AS DOUBLE) - 1.0)) AS var_s, " +
       "CAST(sx AS DOUBLE) AS sxd, CAST(nd AS DOUBLE) AS ndd " +
       "FROM daily d JOIN b ON d.event_type = b.event_type " +
       "AND d.day % 7 = b.dow) " +
       "SELECT event_type, day, n, " +
       "round((CAST(n AS DOUBLE) - sxd / ndd) / sqrt(var_s), 6) AS z, " +
       "abs((CAST(n AS DOUBLE) - sxd / ndd) / sqrt(var_s)) > 3.0 " +
       "AS is_anomaly FROM j WHERE var_s > 0 " +
       "ORDER BY event_type, day"),
    // decimal prefix sums exact; k·mean and the subtraction identical
    "x120_changepoint" ->
      ("WITH daily AS (SELECT event_type, " +
       "epoch_us(ts) // 86400000000 AS day, " +
       "SUM(CAST(value AS DECIMAL(18,4))) AS v FROM events GROUP BY 1, 2), " +
       "w AS (SELECT event_type, day, " +
       "SUM(v) OVER (PARTITION BY event_type ORDER BY day) AS prefix, " +
       "COUNT(*) OVER (PARTITION BY event_type ORDER BY day) AS k, " +
       "SUM(v) OVER (PARTITION BY event_type) AS total, " +
       "COUNT(*) OVER (PARTITION BY event_type) AS n_days FROM daily), " +
       "d AS (SELECT event_type, day, " +
       "round(abs(CAST(prefix AS DOUBLE) - CAST(k AS DOUBLE) * " +
       "(CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE))), 6) AS dev " +
       "FROM w), " +
       "p AS (SELECT *, row_number() OVER (PARTITION BY event_type " +
       "ORDER BY dev DESC, day) AS rn FROM d) " +
       "SELECT event_type, day AS cp_day, dev AS max_dev FROM p " +
       "WHERE rn = 1 ORDER BY event_type"),
    // same gap rule, same buckets, same one-division shares
    "x133_session_depth" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events), " +
       "s AS (SELECT user_id, t, CASE WHEN t - lag(t) OVER " +
       "(PARTITION BY user_id ORDER BY t) > 1800000000 " +
       "OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL " +
       "THEN 1 ELSE 0 END AS new_sess FROM e), " +
       "sid AS (SELECT user_id, SUM(new_sess) OVER " +
       "(PARTITION BY user_id ORDER BY t " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM s), " +
       "d AS (SELECT user_id, sid, COUNT(*) AS depth FROM sid " +
       "GROUP BY 1, 2), " +
       "b AS (SELECT CASE WHEN depth = 1 THEN '1_bounce' " +
       "WHEN depth = 2 THEN '2' WHEN depth <= 5 THEN '3-5' " +
       "WHEN depth <= 10 THEN '6-10' ELSE '11+' END AS depth_bucket " +
       "FROM d), " +
       "g AS (SELECT depth_bucket, CAST(COUNT(*) AS BIGINT) " +
       "AS n_sessions FROM b GROUP BY 1), " +
       "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total, " +
       "CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT) " +
       "AS bounces FROM d) " +
       "SELECT depth_bucket, n_sessions, " +
       "round(CAST(n_sessions AS DOUBLE) / CAST(total AS DOUBLE), 6) " +
       "AS share, " +
       "round(CAST(bounces AS DOUBLE) / CAST(total AS DOUBLE), 6) " +
       "AS bounce_rate FROM g CROSS JOIN t ORDER BY depth_bucket"),
    // same stage values via grouped aggregates + joins (a different but
    // value-identical plan: conditional-min windows vs per-stage aggs)
    "x45_funnel" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type " +
       "FROM events), " +
       "s1 AS (SELECT user_id, MIN(CASE WHEN event_type = 'view' " +
       "THEN ts_us END) AS t_view FROM e GROUP BY user_id), " +
       "s2 AS (SELECT e.user_id, MIN(ts_us) AS t_click FROM e " +
       "JOIN s1 USING (user_id) WHERE event_type = 'click' " +
       "AND ts_us >= t_view GROUP BY e.user_id), " +
       "s3 AS (SELECT e.user_id, MIN(ts_us) AS t_purchase FROM e " +
       "JOIN s2 USING (user_id) WHERE event_type = 'purchase' " +
       "AND ts_us >= t_click GROUP BY e.user_id) " +
       "SELECT s1.user_id, t_view, t_click, t_purchase, " +
       "CAST((CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) + " +
       "(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) + " +
       "(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS INT) " +
       "AS stage " +
       "FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id) " +
       "ORDER BY user_id"),
    "x65_peak_concurrency" ->
      ("WITH iv AS (SELECT epoch_us(ts) AS t, " +
       "(event_id % 3600 + 1) * 1000000 AS dur, " +
       "epoch_us(ts) // 86400000000 AS day FROM events), " +
       "pts AS (SELECT day, t, 1 AS delta FROM iv " +
       "UNION ALL SELECT day, least(t + dur, (day + 1) * 86400000000), " +
       "-1 FROM iv), " +
       "run AS (SELECT day, delta, " +
       "SUM(delta) OVER (PARTITION BY day ORDER BY t, delta) AS run " +
       "FROM pts) " +
       "SELECT day, CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) " +
       "AS BIGINT) AS n_events, CAST(MAX(run) AS BIGINT) AS peak " +
       "FROM run GROUP BY day ORDER BY day"),
    "x159_stickiness" -> StickinessSql,
    "x162_holt_forecast" -> HoltSql,
    "x163_ohlc" -> OhlcSql,
    "x164_gap_audit" -> GapSql,
    "x165_streaks" -> StreaksSql,
    "x166_ltv_cohorts" -> LtvSql,
    "x167_collapse_runs" -> CollapseSql,
    "x170_rfm" -> RfmSql)
}
