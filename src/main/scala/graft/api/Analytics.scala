package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable analytics kernels — the library face of the round-9
  * statistics / eval / time-series waves. Every method takes caller
  * frames with caller-chosen column names (nothing here touches the
  * test-corpus loaders); the SparkEntry contract rows delegate here
  * with the corpus columns bound.
  *
  * Determinism contracts match the operator rows: integer/DECIMAL
  * arithmetic until single rounded IEEE ops; the two iterative floats
  * (Kaplan–Meier's product, Holt's recursion) fold per-step-rounded
  * chains that reproduce bitwise across engines.
  */
object Analytics {

  /** Kaplan–Meier survival over (duration, event) rows: one row per
    * event time (d>0) with risk set n, events d, censored c, the step
    * factor (n−d)/n (8 dp) and the running survival product (10 dp,
    * per-step-rounded fold). Risk sets via a broadcast theta-join on
    * the duration-domain aggregate — no global window. */
  def kmSurvival(df: DataFrame, durationCol: String, eventCol: String)
      : DataFrame = {
    val wka = df.select(col(durationCol).cast("long").as("wk"),
        col(eventCol).cast("long").as("ev"))
      .groupBy(col("wk"))
      .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c"))
    val r = wka.select(col("wk").as("rwk"), (col("d") + col("c")).as("dc"))
    val ev = wka.join(broadcast(r), col("rwk") >= col("wk"))
      .groupBy(col("wk"), col("d"), col("c"))
      .agg(sum(col("dc")).as("n"))
      .filter(col("d") > 0)
      .withColumn("factor",
        round((col("n") - col("d")).cast("double") /
          col("n").cast("double"), 8))
    val steps = ev.agg(sort_array(collect_list(struct(
      col("wk").as("wk"), col("n").as("n"), col("d").as("d"),
      col("c").as("c"), col("factor").as("factor")))).as("steps"))
    steps.select(posexplode(col("steps")).as(Seq("i", "s")), col("steps"))
      .select(col("s.wk").as("t"), col("s.n").as("n_risk"),
        col("s.d").as("d"), col("s.c").as("c"),
        col("s.factor").as("factor"),
        expr("round(aggregate(slice(transform(steps, x -> x.factor)," +
          " 1, i + 1), CAST(1.0 AS DOUBLE)," +
          " (acc, f) -> round(acc * f, 10)), 10)").as("survival"))
      .orderBy(col("t"))
  }

  /** Holt's linear-trend smoothing over an ordered series, with an
    * h-step forecast fan (row h=0 = final level). The recursion rounds
    * at WHOLE units — see EventOps.x162's scaladoc for why fractional
    * scales fork cross-engine. Series values should be doubles exactly
    * derived from DECIMAL sums. */
  def holtForecast(series: DataFrame, timeCol: String, valueCol: String,
      alpha: Double, beta: Double, horizon: Int): DataFrame = {
    val arr = series.agg(sort_array(collect_list(struct(
      col(timeCol).as("t"), col(valueCol).cast("double").as("y"))))
      .as("s"))
      .select(expr("transform(s, e -> e.y)").as("ys"))
    val fitted = arr.select(expr(
      s"""aggregate(
         |  slice(ys, 2, size(ys) - 1),
         |  struct(round(CAST(element_at(ys, 1) AS DOUBLE), 0) AS l,
         |         round(CAST(element_at(ys, 2) - element_at(ys, 1)
         |           AS DOUBLE), 0) AS b),
         |  (acc, y) -> struct(
         |    round($alpha * y + ${1 - alpha} * (acc.l + acc.b), 0) AS l,
         |    round($beta *
         |      (round($alpha * y + ${1 - alpha} * (acc.l + acc.b),
         |         0) - acc.l) + ${1 - beta} * acc.b, 0) AS b))
         |""".stripMargin.replaceAll("\n", " ")).as("fit"))
    fitted.select(explode(sequence(lit(0), lit(horizon))).as("h"),
        col("fit"))
      .select(col("h").cast("long").as("h"),
        round(col("fit.l") + col("h").cast("double") * col("fit.b"), 6)
          .as("forecast"),
        col("fit.b").as("trend"))
      .orderBy(col("h"))
  }

  /** DAU / trailing-7 WAU / calendar-month MAU stickiness over an
    * activity frame. dayCol is an epoch-day long; monthOf maps a day
    * to its calendar month key. */
  def stickiness(df: DataFrame, dayCol: String, userCol: String,
      monthOf: Column => Column): DataFrame = {
    val du = df.select(col(dayCol).as("day"), col(userCol).as("u"))
      .distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val spine = dau.select(col("day").as("d"))
    val wau = spine.join(du,
        col("day") >= col("d") - 6 && col("day") <= col("d"))
      .groupBy(col("d")).agg(countDistinct(col("u")).as("wau"))
    val mu = du.select(monthOf(col("day")).as("ym"), col("day"), col("u"))
    val mau = mu.groupBy(col("ym")).agg(countDistinct(col("u")).as("mau"))
    dau.join(wau, col("day") === col("d")).drop("d")
      .join(mu.select(col("ym"), col("day")).distinct(), "day")
      .join(broadcast(mau), "ym")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 6)
          .as("dau_wau"),
        round(col("dau").cast("double") / col("mau").cast("double"), 6)
          .as("dau_mau"))
      .orderBy(col("day"))
  }

  /** Exact Shapley values from a coalition-mask histogram: masks is
    * (m, cnt) where m is the bitmask of touched channels per entity
    * and cnt the entity count; channels maps name → bit. v(S) = Σ cnt
    * over masks ⊆ S. Returns (channel, phi_x·k!, phi) with the TOTAL
    * row — all-integer until the display division. The exponential
    * object lives on the channel domain (2^k subsets), never the
    * entity domain. */
  def shapleyFromMasks(masks: DataFrame, channels: Seq[(String, Long)])
      : DataFrame = {
    val spark = masks.sparkSession
    import spark.implicits._
    val k = channels.length
    require(k <= 8, "channel domain must stay broadcast-sized")
    val fact = (0 to k).map(i => (1 to i).product.toLong)
    val ss = spark.range(1L << k).select(col("id").as("s"))
    val v = ss.crossJoin(broadcast(masks.select(col("m"), col("cnt"))))
      .groupBy(col("s"))
      .agg(coalesce(sum(when(col("m").bitwiseAND(col("s")) === col("m"),
        col("cnt"))), lit(0L)).as("v"))
    val ch = channels.toDF("channel", "bit")
    val w = {
      val bc = bit_count(col("s"))
      (1 until k).foldLeft(when(bc === 0, lit(fact(0) * fact(k - 1)))) {
        (acc, i) => acc.when(bc === i, lit(fact(i) * fact(k - 1 - i)))
      }
    }
    val v2 = v.select(col("s").as("s2"), col("v").as("vb"))
    val scaled = s"phi_x${fact(k)}"
    val phi = ch.join(broadcast(v), col("s").bitwiseAND(col("bit")) === 0)
      .join(broadcast(v2), col("s2") === col("s").bitwiseOR(col("bit")))
      .groupBy(col("channel"))
      .agg(sum(w * (col("vb") - col("v"))).as(scaled))
    val total = phi.agg(sum(col(scaled)).as(scaled))
      .select(lit("TOTAL").as("channel"), col(scaled))
    phi.unionByName(total)
      .select(col("channel"), col(scaled),
        round(col(scaled).cast("double") / fact(k).toDouble, 6).as("phi"))
      .orderBy((col("channel") === "TOTAL").cast("int"), col("channel"))
  }

  /** Exact ROC-AUC + Gini from (score, label) rows via score-domain
    * rank counts; scores must live on a bounded integer domain (bucket
    * first otherwise). Ships the exact 2-scaled BIGINT numerator. */
  def aucGini(df: DataFrame, scoreCol: String, labelCol: String)
      : DataFrame = {
    val byScore = df.select(col(scoreCol).cast("long").as("pm"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("pm"))
      .agg(sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
    val below = byScore.select(col("pm").as("bpm"), col("nn").as("bnn"))
    val pref = byScore.join(broadcast(below), col("bpm") < col("pm"), "left")
      .groupBy(col("pm"), col("np"), col("nn"))
      .agg(coalesce(sum(col("bnn")), lit(0L)).as("negBelow"))
    pref.agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("negBelow") + col("nn"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        round(col("u2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 8).as("auc"))
      .withColumn("gini", round(lit(2.0) * col("auc") - 1.0, 8))
  }

  /** Brier + reliability bins from integer milli-unit predictions
    * (pm ∈ [0, 1000)) and 0/1 labels; row bin=-1 is the corpus total
    * whose `brier` is THE Brier score. All-integer until three rounded
    * divisions. */
  def calibration(df: DataFrame, pmCol: String, labelCol: String)
      : DataFrame = {
    val base = df.select(col(pmCol).cast("long").as("pm"),
      col(labelCol).cast("long").as("y"))
    val bins = base
      .groupBy(floor(col("pm") / 100).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pm")).as("sp"),
        sum(col("y")).as("sy"),
        sum((col("pm") - lit(1000L) * col("y")) *
          (col("pm") - lit(1000L) * col("y"))).as("sq"))
    val total = bins.agg(sum(col("n")).as("n"), sum(col("sp")).as("sp"),
      sum(col("sy")).as("sy"), sum(col("sq")).as("sq"))
      .select(lit(-1L).as("bin"), col("n"), col("sp"), col("sy"),
        col("sq"))
    bins.unionByName(total)
      .select(col("bin"), col("n"),
        round(col("sp").cast("double") / (col("n") * lit(1000.0)), 8)
          .as("mean_p"),
        round(col("sy").cast("double") / col("n"), 8).as("frac_pos"),
        round(col("sq").cast("double") / (col("n") * lit(1000000.0)), 8)
          .as("brier"))
      .orderBy(col("bin"))
  }

  /** Runs of missing values in an integer key domain (days, ids):
    * (gap_start, gap_end, gap_len) rows + the TOTAL missing-count row
    * (gap_start = gap_end = −1). Next-observed pairing via a
    * min-over-theta-join on the observed-domain aggregate. */
  def gapAudit(df: DataFrame, dayCol: String): DataFrame = {
    val days = df.select(col(dayCol).cast("long").as("day")).distinct()
    val nxt = days.select(col("day").as("d2"))
    val gaps = days.join(broadcast(nxt), col("d2") > col("day"), "left")
      .groupBy(col("day")).agg(min(col("d2")).as("next_day"))
      .filter(col("next_day") > col("day") + 1)
      .select((col("day") + 1).as("gap_start"),
        (col("next_day") - 1).as("gap_end"),
        (col("next_day") - col("day") - 1).as("gap_len"))
    val stats = days.agg(count(lit(1)).as("n_observed"),
      (max(col("day")) - min(col("day")) + 1).as("span_days"))
      .select(lit(-1L).as("gap_start"), lit(-1L).as("gap_end"),
        (col("span_days") - col("n_observed")).as("gap_len"))
    gaps.unionByName(stats).orderBy(col("gap_start"))
  }

  /** Consecutive-run streaks per key (gaps-and-islands): (key,
    * start_day, streak) for every maximal run of consecutive days,
    * unlimited — callers order/limit. One key-partitioned window
    * (data-parallel across keys), one grouped count. */
  def streaks(df: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val du = df.select(col(keyCol).as("k"), col(dayCol).cast("long")
      .as("day")).distinct()
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    du.withColumn("isl", col("day") - row_number().over(w))
      .groupBy(col("k"), col("isl"))
      .agg(min(col("day")).as("start_day"), count(lit(1)).as("streak"))
      .select(col("k"), col("start_day"), col("streak"))
  }

  /** Bucketed OHLC candles: open/close via composite-key min_by/max_by
    * on (order, id) — deterministic under timestamp ties — plus
    * high/low/count and an exact DECIMAL value sum. One grouped
    * aggregate, map-side combinable. */
  def ohlc(df: DataFrame, bucketCol: Column, orderCol: String,
      idCol: String, valueCol: String): DataFrame =
    df.groupBy(bucketCol.as("bucket"))
      .agg(
        min_by(col(valueCol), struct(col(orderCol), col(idCol)))
          .as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), struct(col(orderCol), col(idCol)))
          .as("close"),
        count(lit(1)).as("n_ticks"),
        sum(col(valueCol).cast(graft.Det.Money)).cast("double").as("vsum"))
      .orderBy(col("bucket"))

  /** Key-skew report over any frame: key cardinality, max and median
    * per-key count, their ratio, and the hottest key — the one-line
    * answer to "will this key explode my shuffle?" before a groupBy or
    * join is paid at scale. Two grouped aggregates (map-side partials);
    * the hottest key resolves deterministically under count ties to
    * the SMALLEST key (min_by over (−cnt, key) — works for any
    * orderable key type, not just numerics). The x77 contract row
    * delegates here. */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("cnt"))
    counts.agg(
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"),
      median(col("cnt")).as("median_cnt"),
      min_by(col("k"), struct((-col("cnt")).as("nc"), col("k")))
        .as("hottest_key"))
      .select(col("n_keys"), col("max_cnt"), col("median_cnt"),
        (col("max_cnt") / col("median_cnt")).as("skew_ratio"),
        col("hottest_key"))
  }

  /** Join-explosion pre-flight: the EXACT output cardinality
    * |A ⋈ B| = Σ_k cntA(k)·cntB(k) computed from the two key-count
    * tables — a key-cardinality-sized join instead of running the real
    * join to find out it explodes. Reports the common-key count, the
    * exact row estimate, and the single worst key (deterministic
    * smallest-key tie-break, any orderable key type). The count tables
    * are grouped aggregates, so the verdict arrives before any
    * fact-fact shuffle is paid. The x87 contract row delegates here. */
  def joinPreflight(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val a = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("cnt_a"))
    val b = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cnt_b"))
    a.join(b, "k")
      .select(col("k"), (col("cnt_a") * col("cnt_b")).as("contrib"))
      .agg(count(lit(1)).as("n_common_keys"),
        sum(col("contrib")).as("est_join_rows"),
        max(col("contrib")).as("max_key_contrib"),
        min_by(col("k"), struct((-col("contrib")).as("nc"), col("k")))
          .as("worst_key"))
  }
}
