package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data curation operators beyond the core dedup/quality set:
  * benchmark-contamination detection, intra-document repetition filters
  * (the Gopher-style "rep" signals), and stratified deterministic
  * sampling with inverse-propensity weights (the domain-mixing
  * primitive).
  *
  * Scale posture: x17 joins the corpus against a benchmark n-gram set
  * that is tiny and fixed in practice (an eval suite, not a second
  * corpus), so the join broadcasts the benchmark side and the 100 TB
  * corpus is never shuffled — only matched rows reach the aggregate.
  * x18 is pure per-row column work (zero shuffles, SF-invariant). x19 is
  * a pushable filter + per-row hash, the same reproducible-slice shape
  * as x13.
  */
object PipelineOps {

  /** X17 — benchmark-contamination check: flag corpus documents sharing
    * any word 3-gram with the "eval set" (here the deterministic
    * `doc_id % 97 == 0` slice stands in for a benchmark suite). Emits
    * per contaminated doc the count of distinct shared 3-grams and of
    * eval docs hit.
    *
    * The eval gram set is benchmark-sized (thousands of docs at most),
    * and the broadcast is PINNED with `broadcast()`: at 100 TB the
    * corpus side must never become the build side no matter how the
    * stats drift, and AQE's size estimate of the eval slice (a filter
    * over the same scan) is exactly the kind of stat that drifts. The
    * corpus side stays un-shuffled until the per-doc aggregate over
    * matches only. Swap the `% 97` slice for a real benchmark table at
    * deployment — the plan shape is unchanged.
    */
  def x17Contamination(spark: SparkSession, sfDir: String): DataFrame = {
    val grams = graft.api.TextPipeline.shingles(
      Tables.documents(spark, sfDir), "doc_id", "text", 3)
    val eval = grams.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"), col("ngram"))
    val corpus = grams.filter(col("doc_id") % 97 =!= 0)
    corpus.join(broadcast(eval), "ngram")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("ngram")).as("n_shared"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .orderBy(col("doc_id"))
  }

  /** Per-row repetition metrics for [[x18Repetition]] — exposed for the
    * unit layer. Returns (dup_gram_frac, top_word_frac): the fraction of
    * duplicated word 3-grams and the highest single-word share. Pure
    * column expressions: no shuffle, no UDF. */
  def repetitionMetrics(textCol: Column): (Column, Column) = {
    val words = split(textCol, " ")
    val grams = graft.api.TextPipeline.ngramsCol(textCol, 3)
    val dupFrac = round(
      lit(1.0) - size(array_distinct(grams)) / size(grams), 6)
    val topFrac = round(
      array_max(transform(array_distinct(words),
        u => size(filter(words, x => x === u)))) / size(words), 6)
    (dupFrac, topFrac)
  }

  /** X18 — intra-document repetition filter (Gopher-style quality
    * signal): duplicate-3-gram fraction and top-word dominance per doc,
    * plus the keep/drop verdict. Everything is per-row array math, so
    * the plan is a single codegen'd scan at any corpus size. */
  def x18Repetition(spark: SparkSession, sfDir: String): DataFrame = {
    val (dupFrac, topFrac) = repetitionMetrics(col("text"))
    Tables.documents(spark, sfDir)
      // a doc with < 3 words has no 3-gram, like the oracle's WHERE
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), dupFrac.as("dup_gram_frac"),
        topFrac.as("top_word_frac"))
      .withColumn("repetitive",
        col("dup_gram_frac") > 0.02 || col("top_word_frac") > 0.2)
      .orderBy(col("doc_id"))
  }

  /** X19 — stratified deterministic sampling: per-language md5-bucket
    * thresholds down-sample the dominant language (en keeps 16/256,
    * the rest 64/256) and each kept row carries its inverse-propensity
    * weight, so weighted statistics over the sample are unbiased — the
    * domain-mixing primitive of a pretraining pipeline. Like x13 the
    * sample is reproducible across engines, runs, and repartitionings,
    * and the predicate is pushable (hash of one column, no shuffle). */
  def x19StratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val threshold = when(col("lang") === "en", lit("0f")).otherwise(lit("3f"))
    val weight = when(col("lang") === "en", lit(16.0)).otherwise(lit(4.0))
    Tables.documents(spark, sfDir)
      .withColumn("bucket", substring(md5(col("text").cast("binary")), 1, 2))
      .filter(col("bucket") <= threshold)
      .select(col("doc_id"), col("lang"), col("bucket"), weight.as("weight"))
      .orderBy(col("doc_id"))
  }

  /** PII patterns shared by the Spark side and (verbatim) the DuckDB
    * oracle — keep them in the RE2 ∩ java.util.regex common subset:
    * no backreferences, no lookaround, POSIX classes only. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val IpRe = "([0-9]{1,3}\\.)([0-9]{1,3}\\.)([0-9]{1,3}\\.)[0-9]{1,3}"
  val PhoneRe = "[0-9]{3}-[0-9]{4}"

  /** X20 — PII redaction (scrub-before-training): count and replace
    * email / IPv4 / phone spans per document. The corpus is synthetic
    * word-soup with no natural PII, so a deterministic slice of docs gets
    * PII planted first (`doc_id % {7,11,13}`) — the redactor then has
    * real positives to find and the oracle reproduces both steps.
    * Per-row regex work only: zero shuffles, SF-invariant, stays inside
    * whole-stage codegen. */
  def x20PiiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val planted = Tables.documents(spark, sfDir).select(col("doc_id"), concat(
      col("text"),
      when(col("doc_id") % 7 === 0, lit(" reach me at user42@example.com now"))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0, lit(" call 555-0142 today"))
        .otherwise(lit("")),
      when(col("doc_id") % 13 === 0, lit(" from 192.168.10.77 gateway"))
        .otherwise(lit(""))).as("t"))
    // scrub emails first (they contain digits/dots that the narrower
    // patterns could then safely never see), then IPs, then phones
    planted.select(col("doc_id"),
      size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("t"), lit(IpRe), lit(0))).as("n_ips"),
      size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))).as("n_phones"),
      regexp_replace(regexp_replace(regexp_replace(col("t"),
        EmailRe, "<EMAIL>"), IpRe, "<IP>"), PhoneRe, "<PHONE>").as("clean"))
      .orderBy(col("doc_id"))
  }

  /** X21 — sequence packing (concat-and-chop): lay each (lang, shard)
    * token stream end-to-end in deterministic doc_id order and cut
    * fixed-capacity context windows; emit each doc's shard, window id,
    * offset, and whether it straddles a boundary.
    *
    * Two-level packing key: the window partitions by (lang, SHARD), not
    * lang alone — a 5-language corpus would otherwise serialize the whole
    * token stream through 5 window tasks at 100 TB. The shard is the
    * first md5 hex nibble of the document text (16 buckets), a
    * deterministic CONTENT hash: assignment is stable across runs,
    * engines, and repartitionings (arrival order never leaks in), and
    * parallelism is langs × 16^width — `spark.graft.pack.shardHexChars`
    * (default 1) widens it without touching the code, 1000-executor
    * deployments set 2–3. Each (lang, shard) stream packs into its own
    * bins, which is exactly how a production packer runs shards
    * independently on different executors. (The contract oracle pins
    * width 1; the widened form is spec-checked.) */
  def x21PackSequences(spark: SparkSession, sfDir: String,
      tokenizer: graft.api.Tokenizer = graft.api.WhitespaceTokenizer)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cap = 512
    val width = spark.conf.get("spark.graft.pack.shardHexChars", "1").toInt
    // 16^8 overflows the int shard column into negative ids; and any
    // non-default width diverges from the width-1-pinned contract oracle
    // (fine for library use, fatal if set during a verify run)
    require(width >= 1 && width <= 7,
      s"spark.graft.pack.shardHexChars must be in [1, 7], got $width")
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // token counts come from the pluggable tokenizer seam when a
    // non-default one is supplied (token-space packing); the whitespace
    // default keeps the pure-column codegen plan the oracle pins
    val docs = Tables.documents(spark, sfDir)
    val counted =
      if (tokenizer eq graft.api.WhitespaceTokenizer)
        docs.select(col("doc_id"), col("lang"),
          graft.Det.md5Bucket(col("text"), width).cast("int").as("shard"),
          size(split(col("text"), " ")).as("n_tokens"))
      else
        graft.api.TextPipeline.tokenize(
            docs.select(col("doc_id"), col("lang"), col("text")),
            "text", tokenizer)
          .select(col("doc_id"), col("lang"),
            graft.Det.md5Bucket(col("text"), width).cast("int").as("shard"),
            size(col("tokens")).as("n_tokens"))
    counted
      .withColumn("end_tok", sum(col("n_tokens")).over(w))
      .withColumn("start_tok", col("end_tok") - col("n_tokens"))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
        expr(s"start_tok div $cap").as("bin"),
        (col("start_tok") % cap).as("offset"),
        (expr(s"(end_tok - 1) div $cap") > expr(s"start_tok div $cap"))
          .as("straddles"))
      .orderBy(col("doc_id"))
  }

  /** X22 — segment-level exact dedup: corpus binding of
    * [[graft.api.TextPipeline.segmentDedup]] (16-word segments, global
    * first-occurrence wins; the only shuffle is keyed by segment md5 —
    * see the API scaladoc for the full scale argument). */
  def x22SegmentDedup(spark: SparkSession, sfDir: String): DataFrame =
    graft.api.TextPipeline
      .segmentDedup(Tables.documents(spark, sfDir), "doc_id", "text", 16)
      .orderBy(col("doc_id"))

  /** X23 — overlapping context-window chunking (the RAG / long-context
    * ingestion primitive): corpus binding of
    * [[graft.api.TextPipeline.chunks]] (64-token windows at stride 32;
    * zero shuffle, fingerprints instead of chunk text). */
  def x23Chunk(spark: SparkSession, sfDir: String): DataFrame =
    graft.api.TextPipeline
      .chunks(Tables.documents(spark, sfDir), "doc_id", "text", 64, 32)
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** X27 — vocabulary heavy hitters via a mergeable Misra-Gries sketch
    * ([[graft.functions.HeavyHittersAgg]], k=8 counters): candidate top
    * terms of the corpus in one pass with k counters of state per
    * partition instead of a full word-count shuffle.
    *
    * Contract form is a derived claim (the sketch itself is
    * engine-specific): the exact side recomputes true counts in Spark
    * and checks the two Misra-Gries guarantees — every word with
    * frequency above n/(k+1) appears among the candidates, and every
    * estimate is an undercount by at most n/(k+1). DuckDB reproduces
    * the exact columns and the claims as literal TRUE.
    *
    * The corpus vocabulary is near-uniform (31 words, max share ~3.5%),
    * which would leave the containment claim VACUOUS (no word exceeds
    * the n/9 threshold), so every 7th token is rewritten to a planted
    * `<sep>` separator first — share 1/7 ≈ 14.3% > n/9 ≈ 11.1%. That
    * gives exactly one true heavy hitter the sketch MUST retain, with
    * 32 distinct tokens > k forcing real decrements, and mirrors real
    * corpora, where function/separator tokens dominate. */
  def x27HeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 8
    val words = Tables.documents(spark, sfDir)
      .select(posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .select(when(col("pos") % 7 === 0, lit("<sep>"))
        .otherwise(col("w")).as("word"))
    val sketch = words
      .agg(graft.functions.HeavyHittersAgg.heavyHitters(col("word"), k)
        .as("hh"))
      .select(explode(col("hh")).as("c"))
      .select(col("c.item").as("word"), col("c.est").as("est"))
    val exact = words.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val n = words.agg(count(lit(1)).as("n"))
    val joined = exact.join(sketch, Seq("word"), "left")
      .crossJoin(n)
    joined.agg(
      max(col("n")).as("n_tokens"),
      sum(when(col("cnt") > col("n") / (k + 1), 1L).otherwise(0L))
        .as("n_heavy_true"),
      // MG guarantee 1: true-heavy words are always among the candidates
      min(when(col("cnt") > col("n") / (k + 1), col("est").isNotNull)
        .otherwise(lit(true)).cast("int")).cast("boolean")
        .as("heavy_all_found"),
      // MG guarantee 2: est <= exact and exact - est <= n/(k+1)
      min(when(col("est").isNotNull,
        col("est") <= col("cnt") &&
          (col("cnt") - col("est")) <= col("n") / (k + 1))
        .otherwise(lit(true)).cast("int")).cast("boolean")
        .as("bounds_ok"))
  }

  /** X29 — content-defined chunking statistics: chunk counts and mean
    * chunk length under the rolling-hash boundary rule of
    * [[graft.api.TextPipeline.cdcChunkCount]] (boundary before words
    * whose md5 starts with '0', expected length 16). Zero shuffle,
    * SF-invariant; the complement of x23's fixed-stride chunking —
    * CDC boundaries survive edits, stride boundaries don't. */
  def x29CdcChunk(spark: SparkSession, sfDir: String): DataFrame = {
    val nWords = size(split(col("text"), " "))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), nWords.cast("long").as("n_words"),
        graft.api.TextPipeline.cdcChunkCount(col("text"))
          .cast("long").as("n_chunks"))
      .withColumn("mean_chunk_len",
        round(col("n_words") / col("n_chunks"), 4))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x27_heavy_hitters" -> (x27HeavyHitters _),
    "x29_cdc_chunk" -> (x29CdcChunk _),
    "x17_contamination" -> (x17Contamination _),
    "x18_repetition" -> (x18Repetition _),
    "x19_stratified_sample" -> (x19StratifiedSample _),
    "x20_pii_redact" -> (x20PiiRedact _),
    "x21_pack_sequences" -> ((s, d) => x21PackSequences(s, d)),
    "x22_segment_dedup" -> (x22SegmentDedup _),
    "x23_chunk" -> (x23Chunk _))

  val oracles: Map[String, String] = Map(
    "x17_contamination" ->
      (s"WITH g AS (SELECT DISTINCT doc_id, ngram FROM (${TextOps.ngramSql(3)}) t), " +
       "ev AS (SELECT doc_id AS eval_id, ngram FROM g WHERE doc_id % 97 = 0) " +
       "SELECT c.doc_id, COUNT(DISTINCT c.ngram) AS n_shared, " +
       "COUNT(DISTINCT ev.eval_id) AS n_eval_docs " +
       "FROM g c JOIN ev ON c.ngram = ev.ngram WHERE c.doc_id % 97 <> 0 " +
       "GROUP BY c.doc_id ORDER BY doc_id"),
    "x18_repetition" ->
      ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents), " +
       "g AS (SELECT doc_id, words, len(words) AS n_words, " +
       "[array_to_string(list_slice(words, i + 1, i + 3), ' ') " +
       "FOR i IN range(0, len(words) - 2)] AS grams " +
       "FROM w WHERE len(words) >= 3), " +
       "r AS (SELECT doc_id, " +
       "round(1.0 - len(list_distinct(grams)) / len(grams), 6) AS dup_gram_frac, " +
       "round(list_max([len(list_filter(words, x -> x = u)) " +
       "FOR u IN list_distinct(words)]) / n_words, 6) AS top_word_frac FROM g) " +
       "SELECT doc_id, dup_gram_frac, top_word_frac, " +
       "(dup_gram_frac > 0.02 OR top_word_frac > 0.2) AS repetitive " +
       "FROM r ORDER BY doc_id"),
    "x19_stratified_sample" ->
      ("SELECT doc_id, lang, substr(md5(text), 1, 2) AS bucket, " +
       "CAST(CASE WHEN lang = 'en' THEN 16.0 ELSE 4.0 END AS DOUBLE) AS weight " +
       "FROM documents " +
       "WHERE substr(md5(text), 1, 2) <= (CASE WHEN lang = 'en' THEN '0f' ELSE '3f' END) " +
       "ORDER BY doc_id"),
    "x20_pii_redact" ->
      ("WITH p AS (SELECT doc_id, text " +
       "|| (CASE WHEN doc_id % 7 = 0 THEN ' reach me at user42@example.com now' ELSE '' END) " +
       "|| (CASE WHEN doc_id % 11 = 0 THEN ' call 555-0142 today' ELSE '' END) " +
       "|| (CASE WHEN doc_id % 13 = 0 THEN ' from 192.168.10.77 gateway' ELSE '' END) AS t " +
       "FROM documents) SELECT doc_id, " +
       s"CAST(len(regexp_extract_all(t, '$EmailRe')) AS INT) AS n_emails, " +
       s"CAST(len(regexp_extract_all(t, '$IpRe')) AS INT) AS n_ips, " +
       s"CAST(len(regexp_extract_all(t, '$PhoneRe')) AS INT) AS n_phones, " +
       s"regexp_replace(regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'), " +
       s"'$IpRe', '<IP>', 'g'), '$PhoneRe', '<PHONE>', 'g') AS clean " +
       "FROM p ORDER BY doc_id"),
    // derived-claim oracle: exact token/heavy counts + the Misra-Gries
    // guarantees the Spark side checks against its own exact aggregate
    // word positions come from unnest-zipping each row's own
    // range(len(words)) list — no fixed bound to silently truncate long
    // docs (DuckDB's range TABLE function only takes constants)
    "x27_heavy_hitters" ->
      ("WITH s AS (SELECT string_split(text, ' ') AS words FROM documents), " +
       "w AS (SELECT CASE WHEN g % 7 = 0 THEN '<sep>' ELSE wd END AS word FROM " +
       "(SELECT unnest(words) AS wd, unnest(range(len(words))) AS g FROM s) z), " +
       "t AS (SELECT COUNT(*) AS n FROM w), " +
       "c AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word) " +
       "SELECT (SELECT n FROM t) AS n_tokens, " +
       "CAST((SELECT COUNT(*) FROM c WHERE cnt > (SELECT n FROM t) / 9.0) AS BIGINT) " +
       "AS n_heavy_true, TRUE AS heavy_all_found, TRUE AS bounds_ok"),
    "x29_cdc_chunk" ->
      ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents), " +
       "c AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words, " +
       "CAST(1 + len(list_filter(words[2:], w -> substr(md5(w), 1, 1) = '0')) " +
       "AS BIGINT) AS n_chunks FROM w) " +
       "SELECT doc_id, n_words, n_chunks, " +
       "round(n_words / n_chunks, 4) AS mean_chunk_len " +
       "FROM c ORDER BY doc_id"),
    "x22_segment_dedup" ->
      ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents), " +
       "s AS (SELECT doc_id, CAST(g AS BIGINT) AS seg_idx, " +
       "md5(array_to_string(list_slice(words, g*16+1, g*16+16), ' ')) AS fp FROM " +
       "(SELECT doc_id, words, unnest(range((len(words) - 1) // 16 + 1)) AS g FROM w) z), " +
       "k AS (SELECT doc_id, " +
       "ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, seg_idx) = 1 AS kept " +
       "FROM s) " +
       "SELECT doc_id, COUNT(*) AS n_segments, " +
       "CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept " +
       "FROM k GROUP BY doc_id ORDER BY doc_id"),
    "x23_chunk" ->
      ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents) " +
       "SELECT doc_id, CAST(g AS BIGINT) AS chunk_idx, " +
       "CAST(g * 32 AS BIGINT) AS start_tok, " +
       "CAST(LEAST(64, len(words) - g * 32) AS BIGINT) AS n_tok, " +
       "md5(array_to_string(list_slice(words, g*32+1, g*32+64), ' ')) AS chunk_fp FROM " +
       "(SELECT doc_id, words, unnest(range((len(words) - 1) // 32 + 1)) AS g FROM w) z " +
       "ORDER BY doc_id, chunk_idx"),
    // the CAST(... AS BIGINT) on the window sum matters: DuckDB's
    // windowed SUM(int) is HUGEINT, whose // and % render as float64 in
    // the driver's pandas fetch and hash-mismatch Spark's LONG 0 vs 0.0
    "x21_pack_sequences" ->
      ("WITH d AS (SELECT doc_id, lang, " +
       s"CAST(${graft.Det.sql.md5Bucket("text", 1)} AS INT) AS shard, " +
       "CAST(len(string_split(text, ' ')) AS INT) AS n_tokens FROM documents), " +
       "c AS (SELECT doc_id, lang, shard, n_tokens, CAST(SUM(n_tokens) OVER " +
       "(PARTITION BY lang, shard ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING " +
       "AND CURRENT ROW) AS BIGINT) AS end_tok FROM d) " +
       "SELECT doc_id, lang, shard, n_tokens, (end_tok - n_tokens) // 512 AS bin, " +
       "(end_tok - n_tokens) % 512 AS offset, " +
       "((end_tok - 1) // 512) > ((end_tok - n_tokens) // 512) AS straddles " +
       "FROM c ORDER BY doc_id"))
}
