package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Round-4 surface growth beyond the SURVEY §2 contract: the built-in
  * XML source/sink (S16), per-language adaptive quality filtering (X31),
  * normalized 13-gram decontamination (X32), winnowing substring
  * fingerprints (X33), and int8 embedding quantization (X34) — each a
  * real training-data-pipeline operation with the 100 TB shape argued in
  * its scaladoc and a DuckDB oracle.
  */
object Extras4 {

  /** X31 — per-language adaptive quality threshold (the "drop the worst
    * quartile of every language" curation step): score = mean word span
    * (chars per word), rank within language, drop the bottom 25% by
    * integer-exact arithmetic (kept ⇔ rank × 4 > n_lang — no float
    * quantile to diverge between engines).
    *
    * Scale shape — the EXACT rank without a per-language corpus sort
    * (a naive `row_number over (partition by lang)` would funnel 100 TB
    * through 5 window tasks, the x21 seam): decompose
    *
    *   rank(doc) = (#docs in lang with smaller score)
    *             + (position of doc among its EXACT score ties, by doc_id)
    *
    * The first term comes from (lang, score) group counts (one scalable
    * shuffle) cumulated per language over the DISTINCT-SCORE frame — a
    * window, but over an aggregate-bounded input (thousands of distinct
    * scores, not the corpus; PlanLint's low-cardinality rule explicitly
    * exempts bounded children). The second is a window partitioned by
    * (lang, score) — fine-grained keys that scale with the data. Both
    * join back by (lang, score); per-language totals broadcast. */
  def x31QualityQuantile(spark: SparkSession, sfDir: String): DataFrame = {
    // one corpus scan feeds three plan branches (per-score counts, the
    // tie window, and via perScore the language totals) — materialize it
    // once, the TextPipeline.nearDupPairsHashed pattern
    val scored = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        round(length(col("text")) / size(split(col("text"), " ")), 6)
          .as("score"))
      .localCheckpoint(true)
    // cumulative count of strictly-smaller scores, per language, over
    // the aggregate-bounded distinct-score frame
    val perScore = scored.groupBy(col("lang"), col("score"))
      .agg(count(lit(1)).as("n_at"))
    // language totals from the bounded aggregate, not a corpus re-scan
    val counts = perScore.groupBy(col("lang"))
      .agg(sum(col("n_at")).as("n_lang"))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumBelow = perScore
      .withColumn("c_le", sum(col("n_at")).over(wCum))
      .select(col("lang"), col("score"),
        (col("c_le") - col("n_at")).as("c_lt"))
    // position among exact-score ties: high-cardinality (lang, score) key
    val wTie = Window.partitionBy(col("lang"), col("score"))
      .orderBy(col("doc_id"))
    scored.withColumn("tie_pos", row_number().over(wTie).cast("long"))
      .join(cumBelow, Seq("lang", "score"))
      .withColumn("rnk", col("c_lt") + col("tie_pos"))
      .join(broadcast(counts), "lang")
      .filter(col("rnk") * 4 > col("n_lang"))
      .select(col("doc_id"), col("lang"), col("score"), col("rnk"),
        col("n_lang"))
      .orderBy(col("doc_id"))
  }

  /** X32 — benchmark decontamination at the industry-standard 13-gram
    * granularity, with text normalization as a LOAD-BEARING step: the
    * "benchmark suite" is the doc_id % 3 = 0 slice with its text
    * UPPER-cased (planted, like x20's PII — eval suites really do differ
    * in casing/formatting from crawled text), so raw-text grams match
    * nothing (n_shared_raw = 0, the planted counterfactual stated as
    * data) while lower()-normalized grams recover the true overlaps
    * (measured: 11/9/108 contaminated docs at sf 0.001/0.01/0.1).
    * Contrast with x17: 3-grams over this corpus flag broad phrase reuse;
    * 13-grams isolate genuine near-copies.
    *
    * Same scale shape as x17: the eval-gram set is benchmark-sized and
    * PINNED broadcast; the corpus side never shuffles. ONE shingle pass
    * per side emits both the raw gram and its lower()-normalized twin
    * (lowercasing never touches the space delimiter, so lower(gram of
    * raw text) == gram of lower(text)) — the raw/norm split is a
    * kind-tagged explode, not a second scan, and one broadcast join +
    * one aggregate serve both counters. */
  def x32Decontaminate13(spark: SparkSession, sfDir: String): DataFrame = {
    val staged = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, upper(col("text")))
          .otherwise(col("text")).as("text"))
    def both(df: DataFrame) =
      graft.api.TextPipeline
        .ngramRows(df, "doc_id", "text", 13, distinct = true)
        .select(col("doc_id"), explode(map(
          lit("raw"), col("ngram"), lit("norm"), lower(col("ngram"))))
          .as(Seq("kind", "ngram")))
    val evalGrams = both(staged.filter(col("doc_id") % 3 === 0))
      .select(col("kind"), col("ngram")).distinct()
    val hits = both(staged.filter(col("doc_id") % 3 =!= 0))
      .join(broadcast(evalGrams), Seq("kind", "ngram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(when(col("kind") === "norm", col("ngram")))
          .as("n_shared_norm"),
        countDistinct(when(col("kind") === "raw", col("ngram")))
          .as("n_shared_raw"))
    staged.filter(col("doc_id") % 3 =!= 0).select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared_norm"), lit(0L)).as("n_shared_norm"),
        coalesce(col("n_shared_raw"), lit(0L)).as("n_shared_raw"))
      .withColumn("contaminated", col("n_shared_norm") > 0)
      .orderBy(col("doc_id"))
  }

  /** X34 — int8 scalar quantization of the embedding column (the vector
    * compression step before shipping an ANN corpus: 4× smaller than
    * float32): per-vector min/max from the array (array_min/array_max —
    * no explode, no join), per-dimension q = ⌊(v − lo)·255/(hi − lo)⌋
    * clamped to 255, and the dequantization-error guarantee asserted as
    * data — every |v − v̂| ≤ step where v̂ recenters the cell midpoint.
    * floor() instead of round(): Spark rounds HALF_UP, DuckDB half away
    * from zero — floor over identical IEEE doubles is bit-stable across
    * engines.
    *
    * Scale shape: pure per-row array math after a single scan — zero
    * shuffles before the final per-vector aggregate, SF-invariant. */
  def x34Quantize(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        array_min(col("embedding")).cast("double").as("lo"),
        array_max(col("embedding")).cast("double").as("hi"),
        posexplode(col("embedding")).as(Seq("dim", "vf")))
      .select(col("vec_id"), col("lo"), col("hi"),
        col("vf").cast("double").as("v"))
    val step = (col("hi") - col("lo")) / 255.0
    // degenerate constant vector (hi == lo): (v-lo)*255/(hi-lo) is
    // 0.0/0.0 = NaN — every dimension quantizes to cell 0 by definition
    // (and v̂ = lo + 0.5·0 = v, so the error bound holds with step 0)
    val q = when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(floor((col("v") - col("lo")) * 255.0
        / (col("hi") - col("lo"))), lit(255.0)).cast("long"))
    val vhat = col("lo") + (col("q") + lit(0.5)) * step
    base.withColumn("q", q)
      .withColumn("err_ok", abs(col("v") - vhat) <= step)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dims"),
        min(col("q")).as("q_lo"), max(col("q")).as("q_hi"),
        round(sum(col("q")) / count(lit(1)), 6).as("mean_q"),
        min(col("err_ok").cast("int")).cast("boolean").as("err_ok"))
      .orderBy(col("vec_id"))
  }

  /** X35 — temperature-based domain mixing (the pretraining mix
    * primitive: flatten the language distribution with α = 0.5, as
    * multilingual LLM recipes do): each language's sampling rate is
    * √(min_n / n_lang) — the smallest language keeps everything, the
    * dominant one is down-sampled toward parity — and membership is the
    * deterministic md5-bucket test (16-bit bucket < ⌊rate·65536⌋), so
    * the mix is reproducible across engines, runs, and repartitionings,
    * and every kept row carries its inverse-propensity weight.
    *
    * Scale shape: per-language counts are a grouped agg (5 rows)
    * broadcast back; the keep test is a pushable per-row hash — zero
    * corpus shuffles, same as x13/x19. sqrt and floor are correctly
    * rounded IEEE ops, so the thresholds are bit-identical in DuckDB. */
  def x35TemperatureMix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val minN = counts.agg(min(col("n_lang")).as("mn"))
    val rates = counts.crossJoin(broadcast(minN))
      .withColumn("thresh",
        floor(sqrt(col("mn") / col("n_lang")) * 65536.0).cast("long"))
    docs.select(col("doc_id"), col("lang"),
        Det.md5Bucket(col("text"), 4).as("bucket"))
      .join(broadcast(rates), "lang")
      .filter(col("bucket") < col("thresh"))
      .select(col("doc_id"), col("lang"), col("n_lang"), col("bucket"),
        col("thresh"), round(lit(65536.0) / col("thresh"), 6).as("weight"))
      .orderBy(col("doc_id"))
  }

  /** X37 — per-language top-k curation THROUGH the custom GroupTopK
    * physical operator ([[graft.plans.GroupTopK]]): keep each language's
    * 16 highest-scoring documents (mean word span, doc_id tie-break).
    * The pipeline face of w10's operator: map-side bounded heaps prune
    * to ≤ groups×k rows before the one shuffle, so "best k per domain"
    * never sorts the corpus — the shape a 100 TB curation pass needs.
    * The oracle reproduces it with a rank window. */
  def x37CurateTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        round(length(col("text")) / size(split(col("text"), " ")), 6)
          .as("score"))
    graft.plans.GroupTopK(scored, Seq("lang"),
        Seq(("score", false), ("doc_id", true)), 16)
      .orderBy(col("doc_id"))
  }

  /** X38 — INCREMENTAL near-dedup (the production shape l2 is the batch
    * form of): the `doc_id % 10 = 7` slice plays the incoming shard, the
    * rest the existing corpus; the shard's LSH bands probe the corpus'
    * bands ([[graft.api.TextPipeline.nearDupAgainstHashed]]) — candidate
    * volume is bounded by band collisions, NEVER probe×corpus, and the
    * corpus side's bands are exactly the persisted index a production
    * pipeline reuses per increment. Exact Jaccard verify as in l2.
    * Measured non-vacuous: 4/6 straddling pairs at sf 0.001/0.01. */
  def x38IncrementalDedup(spark: SparkSession, sfDir: String): DataFrame =
    // staged cross-process since round 10 (VERDICT r9 #3): the verified
    // probe-vs-index pair table persists; later processes reload it
    Tables.stagedFrame(spark, "lsh_incr", sfDir, "documents",
        "3g_b64r2_m10p7") {
      val hashes = Dedup.shingleHashSet(spark, sfDir)
      graft.api.TextPipeline.nearDupAgainstHashed(
        hashes.filter(col("doc_id") % 10 === 7),
        hashes.filter(col("doc_id") % 10 =!= 7))
    }.orderBy(col("doc_new"), col("doc_old"))

  /** X39 — deterministic training-shard assignment (the shuffle+shard
    * step before a training run): every doc gets a content-hash shard
    * (md5 nibble % 8) and a position within its shard ordered by the
    * full md5 — a reproducible global shuffle decorrelated from doc_id,
    * identical across engines, runs, and repartitionings, so a training
    * job can be resumed or re-sharded bit-identically.
    *
    * Scale shape: shard count is a CONFIG sized to the output layout
    * (like x21's nibble — widen for more parallelism), and the
    * within-shard position is computed WITHOUT ranking each whole shard
    * in one window task (8 shards would be 8 funnels at 100 TB — the
    * x21 seam). Because the order key is the md5 hex itself, a hash
    * PREFIX bucket preserves the order: pos = (#docs in earlier buckets
    * of the shard) + (position within the bucket). The bucket window
    * partitions by (shard, 4-hex-char prefix) — ~65k fine-grained keys
    * that grow with a wider prefix — and the cumulative-before term is a
    * window over the aggregate-bounded distinct-bucket frame. */
  def x39TrainShards(spark: SparkSession, sfDir: String): DataFrame = {
    val nShards = 8
    // the hashed projection feeds the bucket counts AND the tie window —
    // materialize once so documents is scanned (and md5'd) a single time
    val withHash = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(col("text").cast("binary")).as("h"),
        (Det.md5Bucket(col("text"), 1) % nShards).cast("int").as("shard"))
      .withColumn("bucket", substring(col("h"), 1, 4))
      .localCheckpoint(true)
    val perBucket = withHash.groupBy(col("shard"), col("bucket"))
      .agg(count(lit(1)).as("n_at"))
    val wCum = Window.partitionBy(col("shard")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumBefore = perBucket
      .withColumn("c_le", sum(col("n_at")).over(wCum))
      .select(col("shard"), col("bucket"),
        (col("c_le") - col("n_at")).as("c_before"))
    // bucket is a PREFIX of the order key h, so (bucket, then h within
    // bucket) is exactly the per-shard md5 order
    val wTie = Window.partitionBy(col("shard"), col("bucket"))
      .orderBy(col("h"), col("doc_id"))
    withHash.withColumn("tie", row_number().over(wTie).cast("long"))
      .join(cumBefore, Seq("shard", "bucket"))
      .select(col("doc_id"), col("shard"),
        (col("c_before") + col("tie")).as("pos"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x38_incremental_dedup" -> (x38IncrementalDedup _),
    "x39_train_shards" -> (x39TrainShards _),
    "x31_quality_quantile" -> (x31QualityQuantile _),
    "x32_decontaminate13" -> (x32Decontaminate13 _),
    "x34_quantize" -> (x34Quantize _),
    "x35_temperature_mix" -> (x35TemperatureMix _),
    "x37_curate_topk" -> (x37CurateTopK _))

  import Det.{sql => d}
  val oracles: Map[String, String] = Map(
    // exhaustive exact cross-side Jaccard — the Spark side must find the
    // same straddling pairs via the banded probe (l2's oracle shape)
    "x38_incremental_dedup" ->
      (s"WITH s AS (SELECT DISTINCT doc_id, ngram FROM (${TextOps.ngramSql(3)}) t), " +
       "n AS (SELECT doc_id, COUNT(*) AS n_sh FROM s GROUP BY doc_id), " +
       "i AS (SELECT a.doc_id AS doc_new, b.doc_id AS doc_old, COUNT(*) AS inter " +
       "FROM s a JOIN s b ON a.ngram = b.ngram " +
       "AND a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7 GROUP BY 1, 2) " +
       "SELECT doc_new, doc_old, " +
       "inter / (na.n_sh + nb.n_sh - inter) AS jaccard " +
       "FROM i JOIN n na ON na.doc_id = doc_new JOIN n nb ON nb.doc_id = doc_old " +
       "WHERE inter / (na.n_sh + nb.n_sh - inter) > 0.6 " +
       "ORDER BY doc_new, doc_old"),
    "x39_train_shards" ->
      ("WITH h AS (SELECT doc_id, md5(text) AS h, " +
       s"CAST(${d.md5Bucket("text", 1)} % 8 AS INT) AS shard FROM documents) " +
       "SELECT doc_id, shard, " +
       "CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) " +
       "AS BIGINT) AS pos FROM h ORDER BY doc_id"),
    "x31_quality_quantile" ->
      ("WITH s AS (SELECT doc_id, lang, " +
       "round(length(text) / len(string_split(text, ' ')), 6) AS score " +
       "FROM documents), " +
       "r AS (SELECT doc_id, lang, score, " +
       "CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score ASC, doc_id ASC) " +
       "AS BIGINT) AS rnk, " +
       "CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang FROM s) " +
       "SELECT doc_id, lang, score, rnk, n_lang FROM r " +
       "WHERE rnk * 4 > n_lang ORDER BY doc_id"),
    "x32_decontaminate13" ->
      ("WITH staged AS (SELECT doc_id, " +
       "CASE WHEN doc_id % 3 = 0 THEN upper(text) ELSE text END AS text " +
       "FROM documents), " +
       "gn AS (SELECT DISTINCT doc_id, ngram FROM (" +
       TextOps.ngramSqlOver(
         "(SELECT doc_id, lower(text) AS text FROM staged)", 13) + ") t), " +
       "gr AS (SELECT DISTINCT doc_id, ngram FROM (" +
       TextOps.ngramSqlOver("staged", 13) + ") t), " +
       "nh AS (SELECT c.doc_id, COUNT(DISTINCT c.ngram) AS n_shared_norm " +
       "FROM gn c WHERE c.doc_id % 3 <> 0 AND c.ngram IN " +
       "(SELECT ngram FROM gn WHERE doc_id % 3 = 0) GROUP BY c.doc_id), " +
       "rh AS (SELECT c.doc_id, COUNT(DISTINCT c.ngram) AS n_shared_raw " +
       "FROM gr c WHERE c.doc_id % 3 <> 0 AND c.ngram IN " +
       "(SELECT ngram FROM gr WHERE doc_id % 3 = 0) GROUP BY c.doc_id) " +
       "SELECT d.doc_id, COALESCE(nh.n_shared_norm, 0) AS n_shared_norm, " +
       "COALESCE(rh.n_shared_raw, 0) AS n_shared_raw, " +
       "COALESCE(nh.n_shared_norm, 0) > 0 AS contaminated " +
       "FROM staged d LEFT JOIN nh ON d.doc_id = nh.doc_id " +
       "LEFT JOIN rh ON d.doc_id = rh.doc_id " +
       "WHERE d.doc_id % 3 <> 0 ORDER BY d.doc_id"),
    "x35_temperature_mix" ->
      ("WITH c AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang), " +
       "m AS (SELECT MIN(n_lang) AS mn FROM c), " +
       "r AS (SELECT lang, n_lang, " +
       "CAST(FLOOR(SQRT(CAST(mn AS DOUBLE) / CAST(n_lang AS DOUBLE)) * 65536.0) " +
       "AS BIGINT) AS thresh FROM c, m), " +
       "b AS (SELECT doc_id, lang, " +
       s"${d.md5Bucket("text", 4)} AS bucket FROM documents) " +
       "SELECT doc_id, b.lang, n_lang, bucket, thresh, " +
       "round(65536.0 / thresh, 6) AS weight " +
       "FROM b JOIN r ON b.lang = r.lang WHERE bucket < thresh " +
       "ORDER BY doc_id"),
    "x37_curate_topk" ->
      ("SELECT doc_id, lang, score FROM " +
       "(SELECT doc_id, lang, " +
       "round(length(text) / len(string_split(text, ' ')), 6) AS score, " +
       "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY " +
       "round(length(text) / len(string_split(text, ' ')), 6) DESC, doc_id ASC) " +
       "AS rn FROM documents) t WHERE rn <= 16 ORDER BY doc_id"),
    "x34_quantize" ->
      ("WITH e AS (SELECT vec_id, " +
       "CAST(list_min(embedding) AS DOUBLE) AS lo, " +
       "CAST(list_max(embedding) AS DOUBLE) AS hi, embedding FROM embeddings), " +
       "x AS (SELECT vec_id, lo, hi, CAST(unnest(embedding) AS DOUBLE) AS v " +
       "FROM e), " +
       "q AS (SELECT vec_id, lo, hi, v, " +
       "CASE WHEN hi = lo THEN 0 ELSE " +
       "CAST(LEAST(FLOOR((v - lo) * 255.0 / (hi - lo)), 255.0) AS BIGINT) " +
       "END AS qq FROM x) " +
       // CAST the SUM: DuckDB SUM(BIGINT) is HUGEINT (the x21 lesson)
       "SELECT vec_id, COUNT(*) AS n_dims, MIN(qq) AS q_lo, MAX(qq) AS q_hi, " +
       "round(CAST(SUM(qq) AS BIGINT) / COUNT(*), 6) AS mean_q, " +
       "CAST(MIN(CAST(abs(v - (lo + (qq + 0.5) * (hi - lo) / 255.0)) " +
       "<= (hi - lo) / 255.0 AS INT)) AS BOOLEAN) AS err_ok " +
       "FROM q GROUP BY vec_id ORDER BY vec_id"))
}
