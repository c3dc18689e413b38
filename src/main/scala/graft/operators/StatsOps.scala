package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Det, Tables}

/** STATISTICS theme module (round 11 — the ExtrasN naming-debt
  * retirement, VERDICT r10 #7): the hypothesis-test / distribution-
  * diagnostic / experimentation rows, moved verbatim from
  * Extras10/11/14. Every statistic runs as decomposed aggregates or
  * bounded windows (no per-group value buffers), with the repo's
  * exact-decimal float policy so both engines compute bit-identical
  * answers.
  *
  * Rows: x99 Welch t, x121 histogram, x122 correlation matrix,
  * x127 KS test, x129 Mann–Whitney U, x130 Poisson bootstrap,
  * x131 CUPED, x132 delta-method ratio SE, x146 ACF, x147 chi²,
  * x148 Benford, x149 entropy.
  */
object StatsOps {

  /** X99 — two-sample experiment readout (Welch's t): treatment =
    * purchase events, control = view events; mean difference, Welch
    * standard error, t statistic, and the Welch–Satterthwaite degrees
    * of freedom — the A/B-test table an experimentation platform
    * serves. Every moment comes from x94's exact-DECIMAL sufficient
    * statistics, and the closed forms run in identically-spelled IEEE
    * doubles, so the whole readout is bitwise-deterministic under any
    * partitioning — one grouped aggregate over the events scan. */
  def x99WelchTTest(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.eventsUs(spark, sfDir)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), col("value"),
        col("value").cast(Det.Money).as("v"))
    val m = ev.groupBy(col("event_type"))
      .agg(sum(col("v")).cast("double").as("sv"),
        sum(col("v") * col("v")).cast("double").as("svv"),
        count(lit(1)).as("n"))
      .select(col("event_type"), (col("sv") / col("n")).as("mean"),
        ((col("svv") - col("sv") * col("sv") / col("n")) /
          (col("n") - 1)).as("variance"), col("n"))
    val t = m.filter(col("event_type") === "purchase")
      .select(col("mean").as("mean_t"), col("variance").as("var_t"),
        col("n").as("n_t"))
    val c = m.filter(col("event_type") === "view")
      .select(col("mean").as("mean_c"), col("variance").as("var_c"),
        col("n").as("n_c"))
    t.crossJoin(c)
      .withColumn("se2",
        col("var_t") / col("n_t") + col("var_c") / col("n_c"))
      .select(col("n_t"), col("n_c"),
        (col("mean_t") - col("mean_c")).as("mean_diff"),
        sqrt(col("se2")).as("se"),
        ((col("mean_t") - col("mean_c")) / sqrt(col("se2"))).as("t_stat"),
        (col("se2") * col("se2") /
          (col("var_t") / col("n_t") * (col("var_t") / col("n_t")) /
            (col("n_t") - 1) +
           col("var_c") / col("n_c") * (col("var_c") / col("n_c")) /
            (col("n_c") - 1))).as("welch_df"))
  }

  /** X121 — equi-width histogram (`width_bucket`, the warehouse
    * distribution profile): order totals bucketed into 20 fixed-width
    * bins over [0, 500k), count + decimal-routed bin revenue share.
    * One grouped aggregate over a computed key — scan-bound; the bin
    * function is the SQL-standard width_bucket both engines ship. */
  def x121Histogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(width_bucket(col("o_totalprice"), lit(0.0), lit(500000.0),
        lit(20)).as("bucket"), col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(Det.Money)).cast("double").as("total"))
      .orderBy(col("bucket"))

  /** X122 — exact Pearson correlation matrix over the lineitem measures
    * (quantity × price × discount): engine-native `corr()` partial-
    * aggregates IEEE doubles (order-dependent — §7.4's hazard), so
    * each r is computed CLOSED-FORM from exact sufficient statistics
    * instead: integer/decimal Σx, Σx², Σxy per pair, one identically-
    * spelled double expression at the end (a23's pattern widened to
    * the covariance matrix). One scan, one row out. */
  def x122Correlation(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(
      col("l_quantity").cast(Det.Money).as("q"),
      col("l_extendedprice").cast(Det.Money).as("p"),
      col("l_discount").cast(Det.Money6).as("d"))
    val stats = li.agg(
      count(lit(1)).as("n"),
      sum(col("q")).as("sq"), sum(col("p")).as("sp"), sum(col("d")).as("sd"),
      sum(col("q") * col("q")).as("sqq"),
      sum(col("p") * col("p")).as("spp"),
      sum(col("d") * col("d")).as("sdd"),
      sum(col("q") * col("p")).as("sqp"),
      sum(col("q") * col("d")).as("sqd"),
      sum(col("p") * col("d")).as("spd"))
    def r(sx: String, sy: String, sxx: String, syy: String,
        sxy: String): org.apache.spark.sql.Column = {
      val n = col("n").cast("double")
      val cov = n * col(sxy).cast("double") -
        col(sx).cast("double") * col(sy).cast("double")
      val vx = n * col(sxx).cast("double") -
        col(sx).cast("double") * col(sx).cast("double")
      val vy = n * col(syy).cast("double") -
        col(sy).cast("double") * col(sy).cast("double")
      round(cov / sqrt(vx * vy), 6)
    }
    stats.select(col("n"),
      r("sq", "sp", "sqq", "spp", "sqp").as("r_qty_price"),
      r("sq", "sd", "sqq", "sdd", "sqd").as("r_qty_disc"),
      r("sp", "sd", "spp", "sdd", "spd").as("r_price_disc"))
  }

  /** X127 — exact two-sample Kolmogorov–Smirnov statistic (the
    * distribution-level test beside x99's mean-level Welch t): click
    * vs view value distributions, D = max |F̂_a − F̂_b| computed in
    * EXACT INTEGER arithmetic — the max of |cumA·nB − cumB·nA| over
    * the pooled support, divided once at the end — so the statistic
    * is bitwise reproducible (no float CDF accumulation anywhere).
    * The two cumulative counts run through [[graft.operators.Windows.distributedCumSum]]
    * (w16's machinery): value-keyed range partitions, NO global
    * single-partition window in the plan. */
  def x127KsTest(spark: SparkSession, sfDir: String): DataFrame = {
    val g = Tables.eventsUs(spark, sfDir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("a_cnt"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
        .as("b_cnt"))
      .localCheckpoint(true)
    val ca = graft.operators.Windows.distributedCumSum(g, col("value"),
        col("a_cnt").cast(DecimalType(18, 0)), 8)
      .select(col("k"), col("cum").cast("long").as("ca"))
    val cb = graft.operators.Windows.distributedCumSum(g, col("value"),
        col("b_cnt").cast(DecimalType(18, 0)), 8)
      .select(col("k").as("k2"), col("cum").cast("long").as("cb"))
    val totals = g.agg(sum(col("a_cnt")).as("n_a"),
      sum(col("b_cnt")).as("n_b"))
    ca.join(cb, col("k") === col("k2")).crossJoin(totals)
      .select((abs(col("ca") * col("n_b") - col("cb") * col("n_a")))
        .as("dn"), col("n_a"), col("n_b"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("dn")).as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        round(col("d_num").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("d_stat"))
  }


  /** X129 — exact Mann–Whitney U (rank-sum; x127's KS sibling — the
    * nonparametric location test): click vs view values with MIDRANKS
    * kept in EXACT INTEGER arithmetic via doubled ranks (a tie group
    * spanning (prev, prev+t] contributes 2·midrank = 2·prev + t + 1
    * per member — never a .5), so U is bitwise-exact; the normal
    * approximation z applies the standard tie correction Σ(t³−t) in
    * one identically-spelled double expression. The pooled-value
    * cumulative runs through [[graft.operators.Windows.distributedCumSum]] — no
    * global window. */
  def x129MannWhitney(spark: SparkSession, sfDir: String): DataFrame = {
    val g = Tables.eventsUs(spark, sfDir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("a_cnt"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
        .as("b_cnt"))
      .withColumn("tot", col("a_cnt") + col("b_cnt"))
      .localCheckpoint(true)
    val cum = graft.operators.Windows.distributedCumSum(g.select(col("value"), col("tot")),
        col("value"), col("tot").cast(DecimalType(18, 0)), 8)
      .select(col("k").as("value"), col("cum").cast("long").as("cum_tot"))
    val terms = g.join(cum, "value")
      .select(col("a_cnt"), col("tot"),
        (col("a_cnt") *
          (lit(2L) * (col("cum_tot") - col("tot")) + col("tot") + 1L))
          .as("r2_term"),
        (col("tot") * col("tot") * col("tot") - col("tot")).as("tie_term"))
    val s = terms.agg(sum(col("r2_term")).as("r1_2"),
      sum(col("tie_term")).as("ties"))
    val totals = g.agg(sum(col("a_cnt")).as("n_a"),
      sum(col("b_cnt")).as("n_b"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val n = nA + nB
    val u2a = lit(2L) * col("n_a") * col("n_b") +
      col("n_a") * (col("n_a") + 1L) - col("r1_2")
    s.crossJoin(totals)
      .withColumn("u2_a", u2a)
      .select(col("n_a"), col("n_b"), col("u2_a"),
        round((col("u2_a").cast("double") / 2.0 - nA * nB / 2.0) /
          sqrt(nA * nB / 12.0 *
            ((n + 1.0) - col("ties").cast("double") / (n * (n - 1.0)))),
          6).as("z"))
  }

  /** X130 — Poisson-bootstrap confidence interval (Chamandy et al.,
    * Google 2012 — THE distributed bootstrap: per-(row, replicate)
    * Poisson(1) weights approximate multinomial resampling without any
    * global coordination): B = 100 replicates of the mean event value,
    * weights drawn DETERMINISTICALLY by inverse-CDF on the
    * (event_id, replicate) md5 uniform, replicate means from exact
    * decimal weighted sums, the 95% CI as exact interpolated
    * percentiles over the 100 means (a17's proven quantile surface).
    * One explode + one grouped aggregate: rows × 100 map-side, 100
    * groups out — scan-bound at any scale, zero collect. */
  def x130Bootstrap(spark: SparkSession, sfDir: String): DataFrame = {
    val u = (Det.md5Bucket(concat(col("event_id").cast("string"),
      lit(":"), col("b").cast("string")), 13).cast("double") + lit(0.5)) /
      lit(math.pow(16.0, 13))
    // Poisson(1) inverse CDF, cumulative probabilities spelled as the
    // same double literals in both engines
    val w = when(u < 0.3678794411714423, 0L)
      .when(u < 0.7357588823428846, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238462, 3L)
      .when(u < 0.9963401531726563, 4L)
      .when(u < 0.9994058151824183, 5L)
      .when(u < 0.9999167588507119, 6L)
      .otherwise(7L)
    val means = Tables.eventsUs(spark, sfDir)
      .select(col("event_id"), col("value"),
        explode(sequence(lit(0), lit(99))).as("b"))
      .withColumn("w", w)
      .groupBy(col("b"))
      .agg((sum(col("w") * col("value").cast(Det.Money)).cast("double") /
        sum(col("w")).cast("double")).as("m"))
      .select(col("b"), round(col("m"), 6).as("m"))
    means.agg(count(lit(1)).as("n_replicates"),
      round(percentile(col("m"), lit(0.025)), 6).as("lo95"),
      round(percentile(col("m"), lit(0.975)), 6).as("hi95"),
      round((sum(col("m").cast(Det.Money6)).cast("double") /
        count(lit(1))), 6).as("mean_of_means"))
  }

  /** X131 — CUPED variance reduction (Deng et al., WSDM 2013 — the
    * experimentation-platform staple): per-user PRE-period activity
    * (before the data-derived midpoint, x54's deterministic-cut rule)
    * as the covariate for the POST-period metric; θ = cov(x,y)/var(x)
    * and the achieved variance reduction corr² computed CLOSED-FORM
    * from exact DECIMAL sufficient statistics (the a23/x122 policy —
    * engine-native covariance partial-aggregates doubles). The row
    * reports exactly what an experimenter asks: how much variance does
    * the covariate remove. One scan + one user-keyed aggregate. */
  def x131Cuped(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.eventsUs(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value").cast(Det.Money))
    val mm = ev.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      .collect()(0)
    val cut = (mm.getLong(0) + mm.getLong(1)) / 2
    val perUser = ev.groupBy(col("user_id"))
      .agg(sum(when(col("ts") < cut, col("value"))
          .otherwise(lit(0).cast(Det.Money))).as("x"),
        sum(when(col("ts") >= cut, col("value"))
          .otherwise(lit(0).cast(Det.Money))).as("y"))
    val s = perUser.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val covXy = n * d("sxy") - d("sx") * d("sy")
    val varX = n * d("sxx") - d("sx") * d("sx")
    val varY = n * d("syy") - d("sy") * d("sy")
    s.select(col("n").as("n_users"),
      round(covXy / varX, 6).as("theta"),
      round(covXy / sqrt(varX * varY), 6).as("corr_xy"),
      round(covXy * covXy / (varX * varY), 6).as("var_reduction"))
  }

  /** X132 — delta-method standard error for a RATIO metric (Deng et
    * al., KDD 2018 — the correction every experimentation platform
    * applies because revenue-per-event is a ratio of two user-level
    * random sums, not a mean of i.i.d. rows): R = Σy/Σx over per-user
    * (exposure x = events, outcome y = purchase revenue),
    * Var̂(R) = (s_yy − 2R·s_xy + R²·s_xx) / (n·x̄²) — every sufficient
    * statistic an exact DECIMAL/integer sum, the closed form one
    * identically-spelled double chain (the x131/x122 policy). Naively
    * treating the ratio as a row-mean understates the SE; this row IS
    * the correct computation, stated as data. */
  def x132RatioSe(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = Tables.eventsUs(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"),
        sum(when(col("event_type") === "purchase",
          col("value").cast(Det.Money))
          .otherwise(lit(0).cast(Det.Money))).as("y"))
    val s = perUser.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val xb = d("sx") / n
    val r = d("sy") / d("sx")
    // sample (co)variances from exact sums: s_ab = (n·Σab − Σa·Σb)/(n(n−1))
    def sv(sab: String, sa: String, sb: String) =
      (n * d(sab) - d(sa) * d(sb)) / (n * (n - 1.0))
    val varR = (sv("syy", "sy", "sy") -
      lit(2.0) * r * sv("sxy", "sx", "sy") +
      r * r * sv("sxx", "sx", "sx")) / (n * xb * xb)
    s.select(col("n").as("n_users"), round(r, 9).as("ratio"),
      round(sqrt(varR), 9).as("se"))
  }

  /** X146 — autocorrelation function of the daily order-revenue series
    * at lags 1..7: the first diagnostic a forecaster reads (weekly
    * seasonality shows as a lag-7 spike). Series = per-day DECIMAL
    * revenue sums (domain-bounded: one row per distinct day, ~2.4k).
    *
    * Scale: one scan + one grouped aggregate; everything after runs on
    * the day-sized frame (lineage cut once via Checkpoints so the
    * 7-lag self-join re-reads the materialized 2.4k rows, not the
    * fact table). Determinism: x_t and μ are doubles correctly rounded
    * from exact decimals; deviations round 6 dp; deviation PRODUCTS
    * round 4 dp and sum EXACTLY in DECIMAL(38,10); each acf value is
    * one closing IEEE division rounded 6 dp. */
  def x146Acf(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      // o_orderdate is TIMESTAMP_NTZ: route via LTZ (session tz is
      // pinned UTC) to get epoch seconds — same wall-clock day index
      // as the oracle's epoch_us on the naive timestamp
      .groupBy(expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
        .as("day"))
      .agg(sum(col("o_totalprice").cast(Det.Money)).as("v"))
    val stats = daily.agg(count(lit(1)).as("n"), sum(col("v")).as("tot"))
    val mu = round(col("tot").cast("double") / col("n").cast("double"), 6)
    val dev = graft.Checkpoints.cut(
      daily.crossJoin(broadcast(stats))
        .select(col("day"),
          round(col("v").cast("double") - mu, 6).as("dev")))
    def prodSum(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      sum(round(a * b, 4).cast(DecimalType(38, 10)))
    val denom = dev.agg(prodSum(col("dev"), col("dev")).as("denom"))
    val lags = spark.range(1, AcfMaxLag + 1).select(col("id").as("lag"))
    val lagged = dev.select(col("day").as("day_b"), col("dev").as("dev_b"))
    dev.crossJoin(broadcast(lags))
      .join(lagged, col("day_b") === col("day") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        prodSum(col("dev"), col("dev_b")).as("numer"))
      .crossJoin(broadcast(denom))
      .select(col("lag"), col("n_pairs"),
        round(col("numer").cast("double") / col("denom").cast("double"), 6)
          .as("acf"))
      .orderBy(col("lag"))
  }

  // ---------------------------------------------------------------- x147

  /** X147 — chi-squared test of independence between order priority and
    * order status: the contingency-table readout (observed, expected,
    * per-cell contribution) plus the statistic and degrees of freedom —
    * the categorical-association test a warehouse runs before trusting
    * a segmentation.
    *
    * Scale: ONE grouped count over the fact scan; the |pri|×|status|
    * (≤15-row) contingency frame then joins its own margins — no
    * window, so nothing ever funnels through one task. Float policy:
    * obs·N, rt·ct and their difference are exact in doubles (integer
    * values ≪ 2^53 at test SFs; identical spelling both engines), the
    * per-cell term is two IEEE ops rounded 8 dp, and the statistic is
    * the DECIMAL sum of those pre-rounded terms. The summary row rides
    * kind='TOTAL' with expected carrying the dof. */
  def x147Chi2(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = graft.Checkpoints.cut(
      Tables.orders(spark, sfDir)
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("obs")))
    val rt = cells.groupBy(col("pri")).agg(sum(col("obs")).as("rt"))
    val ct = cells.groupBy(col("status")).agg(sum(col("obs")).as("ct"))
    val tot = cells.agg(sum(col("obs")).as("n_total"),
      countDistinct(col("pri")).as("n_pri"),
      countDistinct(col("status")).as("n_status"))
    val diff = col("obs").cast("double") * col("n_total").cast("double") -
      col("rt").cast("double") * col("ct").cast("double")
    val scored = cells.join(rt, "pri").join(ct, "status")
      .crossJoin(broadcast(tot))
      .select(col("pri"), col("status"), col("obs"),
        round(col("rt").cast("double") * col("ct").cast("double") /
          col("n_total").cast("double"), 6).as("expected"),
        round(diff * diff / (col("n_total").cast("double") *
          col("rt").cast("double") * col("ct").cast("double")), 8)
          .as("term"))
    val total = scored.crossJoin(broadcast(tot))
      .groupBy(col("n_pri"), col("n_status"))
      .agg(sum(col("obs")).as("obs"),
        sum(col("term").cast(DecimalType(28, 15))).as("stat"))
      .select(lit("TOTAL").as("pri"), lit("ALL").as("status"), col("obs"),
        ((col("n_pri") - 1) * (col("n_status") - 1)).cast("double")
          .as("expected"),
        round(col("stat").cast("double"), 6).as("term"))
    scored.select(col("pri"), col("status"), col("obs"), col("expected"),
        col("term"))
      .unionByName(total)
      .orderBy(col("pri"), col("status"))
  }

  // ---------------------------------------------------------------- x148

  /** X148 — Benford first-digit audit of order totals: observed share
    * of each leading digit vs Benford's log10(1 + 1/d) expectation,
    * with the signed deviation — the classic fabricated-data forensic
    * (organic financial amounts follow Benford; invented ones don't).
    *
    * One scan, one 9-group aggregate (the digit is a codegen'd string
    * slice of the integer part — no log needed to extract it). Shares
    * are single divisions of exact counts; the expectation is a
    * closed-form IEEE chain on the digit literal — identical in both
    * engines by spelling. */
  def x148Benford(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(substring(floor(col("o_totalprice")).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
    val counts = o.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("n_total"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("n_total").cast("double"), 6)
          .as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("benford"))
      .withColumn("deviation", round(col("share") - col("benford"), 6))
      .orderBy(col("digit"))
  }

  // ---------------------------------------------------------------- x149

  /** X149 — per-market-segment order-priority mix: Shannon entropy and
    * Gini impurity — the two concentration numbers behind "is this
    * segment's demand diversified or single-note". Output is
    * domain-bounded (one row per segment).
    *
    * Plan: fact ⋈ dim on the customer key (AQE broadcasts the dim at
    * test scale; at 100 TB it's a plain shuffle join on the key), one
    * grouped count at (segment, priority) grain, then joins of
    * aggregate-sized frames — no window anywhere. Entropy terms
    * p·log2 p are two IEEE ops on identical doubles rounded 10 dp and
    * DECIMAL-summed; Gini is exact integer algebra (tot² − Σcnt²) with
    * one closing division. */
  def x149Entropy(spark: SparkSession, sfDir: String): DataFrame = {
    val g = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("cnt"))
    val tot = g.groupBy(col("segment"))
      .agg(sum(col("cnt")).as("tot"),
        sum(col("cnt") * col("cnt")).as("sumsq"),
        count(lit(1)).as("n_priorities"))
    val p = col("cnt").cast("double") / col("tot").cast("double")
    g.join(tot, "segment")
      .groupBy(col("segment"))
      .agg(max(col("tot")).as("n_orders"),
        max(col("n_priorities")).as("n_priorities"),
        sum(round(p * log2(p), 10).cast(DecimalType(28, 15)))
          .as("hsum"),
        max(col("sumsq")).as("sumsq"))
      .select(col("segment"), col("n_orders"), col("n_priorities"),
        round(-col("hsum").cast("double"), 6).as("entropy"),
        round((col("n_orders") * col("n_orders") - col("sumsq"))
          .cast("double") /
          (col("n_orders") * col("n_orders")).cast("double"), 6)
          .as("gini"))
      .orderBy(col("segment"))
  }

  // ---------------------------------------------------------------- x146

  private val AcfMaxLag = 7

  private val AcfSql: String =
    "WITH daily AS MATERIALIZED (SELECT " +
    "epoch_us(o_orderdate) // 86400000000 AS day, " +
    "SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS v " +
    "FROM orders GROUP BY 1), " +
    "st AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS tot " +
    "FROM daily), " +
    "dev AS MATERIALIZED (SELECT day, " +
    "round(CAST(v AS DOUBLE) - round(st.tot / st.n, 6), 6) AS dev " +
    "FROM daily CROSS JOIN st), " +
    "den AS (SELECT SUM(CAST(round(dev * dev, 4) AS DECIMAL(38,10))) " +
    "AS denom FROM dev), " +
    s"p AS (SELECT l.lag, COUNT(*) AS n_pairs, " +
    "SUM(CAST(round(a.dev * b.dev, 4) AS DECIMAL(38,10))) AS numer " +
    s"FROM range(1, ${AcfMaxLag + 1}) l(lag) " +
    "CROSS JOIN dev a JOIN dev b ON b.day = a.day + l.lag GROUP BY 1) " +
    "SELECT CAST(p.lag AS BIGINT) AS lag, " +
    "CAST(p.n_pairs AS BIGINT) AS n_pairs, " +
    "round(CAST(p.numer AS DOUBLE) / CAST(den.denom AS DOUBLE), 6) " +
    "AS acf FROM p CROSS JOIN den ORDER BY lag"

  private val Chi2Sql: String =
    "WITH cells AS MATERIALIZED (SELECT o_orderpriority AS pri, " +
    "o_orderstatus AS status, COUNT(*) AS obs FROM orders " +
    "GROUP BY 1, 2), " +
    "rt AS (SELECT pri, SUM(obs) AS rt FROM cells GROUP BY 1), " +
    "ct AS (SELECT status, SUM(obs) AS ct FROM cells GROUP BY 1), " +
    "tot AS (SELECT SUM(obs) AS n_total, " +
    "COUNT(DISTINCT pri) AS n_pri, " +
    "COUNT(DISTINCT status) AS n_status FROM cells), " +
    "scored AS MATERIALIZED (SELECT c.pri, c.status, c.obs, " +
    "round(CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / " +
    "CAST(tot.n_total AS DOUBLE), 6) AS expected, " +
    "round((CAST(c.obs AS DOUBLE) * CAST(tot.n_total AS DOUBLE) - " +
    "CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)) * " +
    "(CAST(c.obs AS DOUBLE) * CAST(tot.n_total AS DOUBLE) - " +
    "CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)) / " +
    "(CAST(tot.n_total AS DOUBLE) * CAST(rt.rt AS DOUBLE) * " +
    "CAST(ct.ct AS DOUBLE)), 8) AS term " +
    "FROM cells c JOIN rt ON rt.pri = c.pri " +
    "JOIN ct ON ct.status = c.status CROSS JOIN tot), " +
    "total AS (SELECT 'TOTAL' AS pri, 'ALL' AS status, " +
    "CAST(SUM(s.obs) AS BIGINT) AS obs, " +
    "CAST((ANY_VALUE(tot.n_pri) - 1) * (ANY_VALUE(tot.n_status) - 1) " +
    "AS DOUBLE) AS expected, " +
    "round(CAST(SUM(CAST(s.term AS DECIMAL(28,15))) AS DOUBLE), 6) " +
    "AS term FROM scored s CROSS JOIN tot) " +
    "SELECT pri, status, CAST(obs AS BIGINT) AS obs, expected, term " +
    "FROM (SELECT pri, status, obs, expected, term FROM scored " +
    "UNION ALL SELECT * FROM total) u ORDER BY pri, status"

  private val BenfordSql: String =
    "WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) " +
    "AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM orders), " +
    "counts AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1), " +
    "tot AS (SELECT SUM(n) AS n_total FROM counts) " +
    "SELECT digit, CAST(n AS BIGINT) AS n, " +
    "round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS share, " +
    "round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford, " +
    "round(round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6) - " +
    "round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6), 6) " +
    "AS deviation FROM counts CROSS JOIN tot ORDER BY digit"

  private val EntropySql: String =
    "WITH g AS MATERIALIZED (SELECT c_mktsegment AS segment, " +
    "o_orderpriority AS pri, COUNT(*) AS cnt FROM orders " +
    "JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2), " +
    "tot AS (SELECT segment, SUM(cnt) AS tot, " +
    "SUM(cnt * cnt) AS sumsq, COUNT(*) AS n_priorities " +
    "FROM g GROUP BY 1) " +
    "SELECT g.segment, CAST(ANY_VALUE(t.tot) AS BIGINT) AS n_orders, " +
    "CAST(ANY_VALUE(t.n_priorities) AS BIGINT) AS n_priorities, " +
    "round(-CAST(SUM(CAST(round(" +
    "(CAST(g.cnt AS DOUBLE) / CAST(t.tot AS DOUBLE)) * " +
    "log2(CAST(g.cnt AS DOUBLE) / CAST(t.tot AS DOUBLE)), 10) " +
    "AS DECIMAL(28,15))) AS DOUBLE), 6) AS entropy, " +
    "round(CAST(ANY_VALUE(t.tot) * ANY_VALUE(t.tot) - " +
    "ANY_VALUE(t.sumsq) AS DOUBLE) / " +
    "CAST(ANY_VALUE(t.tot) * ANY_VALUE(t.tot) AS DOUBLE), 6) AS gini " +
    "FROM g JOIN tot t ON t.segment = g.segment " +
    "GROUP BY g.segment ORDER BY g.segment"

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
  /** X43 — per-language p05/p95 WINSORIZATION of the quality score (the
    * outlier-clipping step before mixing/weighting a training corpus),
    * with the exact interpolated quantiles computed by DECOMPOSITION
    * instead of a per-group value buffer: Spark's exact `percentile`
    * (a17/a9) holds every group's value multiset in its aggregation
    * buffer — fine for bounded groups, a reducer-memory funnel when one
    * language is 100 TB. Here the quantile comes from (lang, score)
    * group counts (one scalable shuffle), a cumulative window over the
    * aggregate-bounded distinct-score frame (the x31 machinery), and a
    * rank→value inverse lookup: value at 0-based rank r is the score
    * with c_lt ≤ r < c_le; p-quantile interpolates ranks k=⌊p(n−1)⌋ and
    * k+1 with weight g = p(n−1)−k.
    *
    * Cross-engine exactness BY IDENTICAL ARITHMETIC: the oracle runs
    * the SAME decomposition and the SAME (1−g)·lower + g·upper formula,
    * so both engines execute identical IEEE ops on identical doubles —
    * no dependence on percentile-implementation ulp (the a9 hazard);
    * round(…, 4) is belt and braces. Bounds (5 rows) broadcast back;
    * the clip itself is per-row math. */
  def x43Winsorize(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        round(length(col("text")) / size(split(col("text"), " ")), 6)
          .as("score"))
    val perScore = scored.groupBy(col("lang"), col("score"))
      .agg(count(lit(1)).as("n_at"))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perScore.withColumn("c_le", sum(col("n_at")).over(wCum))
      .withColumn("c_lt", col("c_le") - col("n_at"))
    val totals = perScore.groupBy(col("lang")).agg(sum(col("n_at")).as("n"))
    def quantile(p: Double, name: String): DataFrame = {
      val idx = totals.select(col("lang"),
          (lit(p) * (col("n") - 1).cast("double")).as("i"))
        .select(col("lang"), floor(col("i")).cast("long").as("k"),
          (col("i") - floor(col("i"))).as("g"))
      val lower = cum.join(idx, "lang")
        .filter(col("c_lt") <= col("k") && col("c_le") > col("k"))
        .select(col("lang"), col("g"), col("score").as("lo_v"))
      val upper = cum.join(idx, "lang")
        .filter(col("c_lt") <= col("k") + 1 && col("c_le") > col("k") + 1)
        .select(col("lang").as("lang2"), col("score").as("hi_v"))
      // rank k+1 may not exist (single-value group, p=1): upper = lower
      lower.join(upper, col("lang") === col("lang2"), "left")
        .select(col("lang"), round((lit(1.0) - col("g")) * col("lo_v")
          + col("g") * coalesce(col("hi_v"), col("lo_v")), 4).as(name))
    }
    val bounds = quantile(0.05, "lo").join(quantile(0.95, "hi"), "lang")
    scored.join(broadcast(bounds), "lang")
      .select(col("doc_id"), col("lang"), col("score"), col("lo"), col("hi"),
        least(greatest(col("score"), col("lo")), col("hi")).as("clipped"),
        (col("score") < col("lo") || col("score") > col("hi"))
          .as("was_clipped"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x99_welch_ttest" -> (x99WelchTTest _),
    "x121_histogram" -> (x121Histogram _),
    "x122_correlation" -> (x122Correlation _),
    "x127_ks_test" -> (x127KsTest _),
    "x129_mannwhitney" -> (x129MannWhitney _),
    "x130_bootstrap" -> (x130Bootstrap _),
    "x131_cuped" -> (x131Cuped _),
    "x132_ratio_se" -> (x132RatioSe _),
    "x146_acf" -> (x146Acf _),
    "x147_chi2" -> (x147Chi2 _),
    "x148_benford" -> (x148Benford _),
    "x149_entropy" -> (x149Entropy _),
    "x154_survival_km" -> (x154SurvivalKm _),
    "x43_winsorize" -> (x43Winsorize _))

  val oracles: Map[String, String] = Map(
    // exact decimal moments; closed forms in identically-associated
    // IEEE arithmetic (see x94)
    "x99_welch_ttest" ->
      ("WITH ev AS (SELECT event_type, value, " +
       "CAST(value AS DECIMAL(18,4)) AS v FROM events " +
       "WHERE event_type IN ('purchase', 'view')), " +
       "m AS (SELECT event_type, CAST(SUM(v) AS DOUBLE) AS sv, " +
       "CAST(SUM(v * v) AS DOUBLE) AS svv, CAST(COUNT(*) AS BIGINT) AS n " +
       "FROM ev GROUP BY 1), " +
       "mm AS (SELECT event_type, sv / n AS mean, " +
       "(svv - sv * sv / n) / (n - 1) AS variance, n FROM m), " +
       "t AS (SELECT mean AS mean_t, variance AS var_t, n AS n_t FROM mm " +
       "WHERE event_type = 'purchase'), " +
       "c AS (SELECT mean AS mean_c, variance AS var_c, n AS n_c FROM mm " +
       "WHERE event_type = 'view'), " +
       "j AS (SELECT *, var_t / n_t + var_c / n_c AS se2 " +
       "FROM t CROSS JOIN c) " +
       "SELECT n_t, n_c, mean_t - mean_c AS mean_diff, sqrt(se2) AS se, " +
       "(mean_t - mean_c) / sqrt(se2) AS t_stat, " +
       "se2 * se2 / (var_t / n_t * (var_t / n_t) / (n_t - 1) + " +
       "var_c / n_c * (var_c / n_c) / (n_c - 1)) AS welch_df FROM j"),
    // DuckDB has no width_bucket: the oracle spells Spark's exact
    // bucket formula floor(n·(x−lo)/(hi−lo))+1 with the over/under
    // clamps (2-dp prices can't sit close enough to a boundary for the
    // one double division to diverge)
    "x121_histogram" ->
      ("SELECT (CASE WHEN o_totalprice < 0.0 THEN 0 " +
       "WHEN o_totalprice >= 500000.0 THEN 21 " +
       "ELSE CAST(FLOOR(20 * (o_totalprice - 0.0) / (500000.0 - 0.0)) " +
       "AS BIGINT) + 1 END) AS bucket, CAST(COUNT(*) AS BIGINT) AS n, " +
       "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total " +
       "FROM orders GROUP BY 1 ORDER BY bucket"),
    // same exact sufficient statistics, same closed-form doubles
    "x122_correlation" ->
      // DECIMAL(28,_) containers: DuckDB backs (18,_) with INT64 and
      // overflows on the square; the wider container changes storage,
      // not values — arithmetic stays exact on both engines
      ("WITH li AS (SELECT CAST(l_quantity AS DECIMAL(28,4)) AS q, " +
       "CAST(l_extendedprice AS DECIMAL(28,4)) AS p, " +
       "CAST(l_discount AS DECIMAL(28,6)) AS d FROM lineitem), " +
       "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
       "SUM(q) AS sq, SUM(p) AS sp, SUM(d) AS sd, " +
       "SUM(q * q) AS sqq, SUM(p * p) AS spp, SUM(d * d) AS sdd, " +
       "SUM(q * p) AS sqp, SUM(q * d) AS sqd, SUM(p * d) AS spd FROM li) " +
       "SELECT n, " +
       "round((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - " +
       "CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)) / " +
       "sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - " +
       "CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) * " +
       "(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - " +
       "CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 6) AS r_qty_price, " +
       "round((CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE) - " +
       "CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE)) / " +
       "sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - " +
       "CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) * " +
       "(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - " +
       "CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6) AS r_qty_disc, " +
       "round((CAST(n AS DOUBLE) * CAST(spd AS DOUBLE) - " +
       "CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE)) / " +
       "sqrt((CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - " +
       "CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)) * " +
       "(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - " +
       "CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6) AS r_price_disc " +
       "FROM s"),
    // exact integer D: max |cumA*nB - cumB*nA| over the pooled support
    "x127_ks_test" ->
      ("WITH g AS (SELECT value, " +
       "SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a_cnt, " +
       "SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS b_cnt " +
       "FROM events WHERE event_type IN ('click', 'view') GROUP BY 1), " +
       "c AS (SELECT value, SUM(a_cnt) OVER (ORDER BY value) AS ca, " +
       "SUM(b_cnt) OVER (ORDER BY value) AS cb FROM g), " +
       "t AS (SELECT CAST(SUM(a_cnt) AS BIGINT) AS n_a, " +
       "CAST(SUM(b_cnt) AS BIGINT) AS n_b FROM g) " +
       "SELECT n_a, n_b, " +
       "CAST(MAX(abs(ca * n_b - cb * n_a)) AS BIGINT) AS d_num, " +
       "round(CAST(MAX(abs(ca * n_b - cb * n_a)) AS DOUBLE) / " +
       "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS d_stat " +
       "FROM c CROSS JOIN t GROUP BY n_a, n_b"),
    // exact doubled-rank arithmetic, same tie-corrected z spelling
    "x129_mannwhitney" ->
      ("WITH g AS (SELECT value, " +
       "SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a_cnt, " +
       "SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS b_cnt " +
       "FROM events WHERE event_type IN ('click', 'view') GROUP BY 1), " +
       "c AS (SELECT value, a_cnt, a_cnt + b_cnt AS tot, " +
       "SUM(a_cnt + b_cnt) OVER (ORDER BY value) AS cum_tot FROM g), " +
       "s AS (SELECT SUM(a_cnt * (2 * (cum_tot - tot) + tot + 1)) " +
       "AS r1_2, SUM(tot * tot * tot - tot) AS ties FROM c), " +
       "t AS (SELECT CAST(SUM(a_cnt) AS BIGINT) AS n_a, " +
       "CAST(SUM(b_cnt) AS BIGINT) AS n_b FROM g) " +
       "SELECT n_a, n_b, " +
       "CAST(2 * n_a * n_b + n_a * (n_a + 1) - r1_2 AS BIGINT) AS u2_a, " +
       "round((CAST(2 * n_a * n_b + n_a * (n_a + 1) - r1_2 AS DOUBLE) " +
       "/ 2.0 - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0) / " +
       "sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * " +
       "((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0) - " +
       "CAST(ties AS DOUBLE) / " +
       "((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) * " +
       "(CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)))), 6) AS z " +
       "FROM s CROSS JOIN t"),
    // same seeded Poisson draws, same decimal means, a17's quantile
    // surface for the CI
    "x130_bootstrap" ->
      ("WITH e AS (SELECT event_id, value, r.b FROM events, " +
       "range(0, 100) r(b)), " +
       "u AS (SELECT b, value, (" +
       Det.sql.md5Bucket(
         "CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)", 13) +
       " + 0.5) / POWER(16, 13) AS u FROM e), " +
       "w AS (SELECT b, value, CASE " +
       "WHEN u < 0.3678794411714423 THEN 0 " +
       "WHEN u < 0.7357588823428846 THEN 1 " +
       "WHEN u < 0.9196986029286058 THEN 2 " +
       "WHEN u < 0.9810118431238462 THEN 3 " +
       "WHEN u < 0.9963401531726563 THEN 4 " +
       "WHEN u < 0.9994058151824183 THEN 5 " +
       "WHEN u < 0.9999167588507119 THEN 6 ELSE 7 END AS w FROM u), " +
       "m AS (SELECT b, round(CAST(SUM(w * CAST(value AS DECIMAL(18,4))) " +
       "AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6) AS m FROM w GROUP BY b) " +
       "SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates, " +
       "round(quantile_cont(m, 0.025), 6) AS lo95, " +
       "round(quantile_cont(m, 0.975), 6) AS hi95, " +
       "round(CAST(SUM(CAST(m AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) " +
       "AS mean_of_means FROM m"),
    // same midpoint cut, same exact moments, same closed form
    "x131_cuped" ->
      ("WITH mm AS (SELECT (CAST(MIN(epoch_us(ts)) AS BIGINT) + " +
       "CAST(MAX(epoch_us(ts)) AS BIGINT)) // 2 AS cut FROM events), " +
       "pu AS (SELECT user_id, " +
       "SUM(CASE WHEN epoch_us(ts) < cut " +
       "THEN CAST(value AS DECIMAL(28,4)) " +
       "ELSE CAST(0 AS DECIMAL(28,4)) END) AS x, " +
       "SUM(CASE WHEN epoch_us(ts) >= cut " +
       "THEN CAST(value AS DECIMAL(28,4)) " +
       "ELSE CAST(0 AS DECIMAL(28,4)) END) AS y " +
       "FROM events CROSS JOIN mm GROUP BY user_id), " +
       "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, " +
       "SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx, " +
       "SUM(y * y) AS syy FROM pu) " +
       "SELECT n AS n_users, " +
       "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
       "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
       "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
       "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS theta, " +
       "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
       "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
       "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
       "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
       "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - " +
       "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_xy, " +
       "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
       "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * " +
       "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
       "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
       "((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
       "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
       "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - " +
       "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) " +
       "AS var_reduction FROM s"),
    // same exact moments, same delta-method chain
    "x132_ratio_se" ->
      ("WITH pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x, " +
       "SUM(CASE WHEN event_type = 'purchase' " +
       "THEN CAST(value AS DECIMAL(28,4)) " +
       "ELSE CAST(0 AS DECIMAL(28,4)) END) AS y " +
       "FROM events GROUP BY user_id), " +
       "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
       "CAST(SUM(x) AS BIGINT) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, " +
       "CAST(SUM(x * x) AS BIGINT) AS sxx, SUM(y * y) AS syy FROM pu) " +
       "SELECT n AS n_users, " +
       "round(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE), 9) AS ratio, " +
       "round(sqrt((" +
       "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - " +
       "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
       "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) - " +
       "2.0 * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) * " +
       "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
       "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
       "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) + " +
       "(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) * " +
       "(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) * " +
       "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
       "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / " +
       "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))" +
       ") / (CAST(n AS DOUBLE) * " +
       "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * " +
       "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))), 9) AS se FROM s"),
    "x146_acf" -> AcfSql,
    "x147_chi2" -> Chi2Sql,
    "x148_benford" -> BenfordSql,
    "x149_entropy" -> EntropySql,
    "x154_survival_km" -> SurvivalSql,
    // the SAME decomposed-quantile arithmetic as the Spark side — both
    // engines run identical IEEE ops ((1-g)*lo + g*hi over the same
    // doubles), so no percentile-implementation ulp is in play.
    // CASTs: DuckDB 0.05 is DECIMAL, windowed SUM is HUGEINT.
    "x43_winsorize" ->
      ("WITH s AS (SELECT doc_id, lang, " +
       "round(length(text) / len(string_split(text, ' ')), 6) AS score " +
       "FROM documents), " +
       "ps AS (SELECT lang, score, COUNT(*) AS n_at FROM s GROUP BY lang, score), " +
       "cc AS (SELECT lang, score, " +
       "CAST(SUM(n_at) OVER (PARTITION BY lang ORDER BY score " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c_le, " +
       "CAST(SUM(n_at) OVER (PARTITION BY lang ORDER BY score " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_at AS BIGINT) " +
       "AS c_lt FROM ps), " +
       "t AS (SELECT lang, CAST(SUM(n_at) AS BIGINT) AS n FROM ps GROUP BY lang), " +
       "k05 AS (SELECT lang, CAST(FLOOR(i) AS BIGINT) AS k, i - FLOOR(i) AS g " +
       "FROM (SELECT lang, CAST(0.05 AS DOUBLE) * CAST(n - 1 AS DOUBLE) AS i " +
       "FROM t) z), " +
       "lo05 AS (SELECT cc.lang, g, score AS lo_v FROM cc JOIN k05 USING (lang) " +
       "WHERE c_lt <= k AND c_le > k), " +
       "hi05 AS (SELECT cc.lang AS lang2, score AS hi_v FROM cc " +
       "JOIN k05 USING (lang) WHERE c_lt <= k + 1 AND c_le > k + 1), " +
       "q05 AS (SELECT lang, round((1 - g) * lo_v + g * COALESCE(hi_v, lo_v), 4) " +
       "AS lo FROM lo05 LEFT JOIN hi05 ON lang = lang2), " +
       "k95 AS (SELECT lang, CAST(FLOOR(i) AS BIGINT) AS k, i - FLOOR(i) AS g " +
       "FROM (SELECT lang, CAST(0.95 AS DOUBLE) * CAST(n - 1 AS DOUBLE) AS i " +
       "FROM t) z), " +
       "lo95 AS (SELECT cc.lang, g, score AS lo_v FROM cc JOIN k95 USING (lang) " +
       "WHERE c_lt <= k AND c_le > k), " +
       "hi95 AS (SELECT cc.lang AS lang2, score AS hi_v FROM cc " +
       "JOIN k95 USING (lang) WHERE c_lt <= k + 1 AND c_le > k + 1), " +
       "q95 AS (SELECT lang, round((1 - g) * lo_v + g * COALESCE(hi_v, lo_v), 4) " +
       "AS hi FROM lo95 LEFT JOIN hi95 ON lang = lang2), " +
       "b AS (SELECT q05.lang, lo, hi FROM q05 JOIN q95 USING (lang)) " +
       "SELECT doc_id, s.lang, score, lo, hi, " +
       "LEAST(GREATEST(score, lo), hi) AS clipped, " +
       "(score < lo OR score > hi) AS was_clipped " +
       "FROM s JOIN b ON s.lang = b.lang ORDER BY doc_id"))
}
