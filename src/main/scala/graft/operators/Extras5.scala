package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.{TextPipeline, VocabTokenizer}

/** Round-5 surface growth: token-space accounting through the pluggable
  * tokenizer seam (X40) and banded embedding near-dedup (X41) — the two
  * gaps VERDICT r4 ranked highest for a real training-data user.
  */
object Extras5 {

  /** X40 — BPE-token accounting through the [[graft.api.Tokenizer]]
    * seam: per-document token counts and packed-window counts in TOKEN
    * space, not word space (the "x21's tokens silently mean words" gap).
    * The tokenizer is a [[VocabTokenizer]] over a PINNED deterministic
    * vocabulary — the corpus' top-64 words by (frequency desc, word asc)
    * — so a vocab word is one token and any other word falls back to its
    * ≤4-char pieces. Because the vocab is data, DuckDB reproduces the
    * exact counts: 1 per vocab word + ceil(len/4) per non-vocab word.
    *
    * Scale shape: the vocab build is one grouped agg + global top-k
    * (TakeOrdered, k rows of driver metadata — in production a persisted
    * artifact); tokenization is the per-partition iterator seam (vocab
    * set dereferenced once per task), zero shuffles; the counts are
    * per-row array math. SF-invariant end to end. */
  def x40BpeTokens(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val vocab = TextPipeline.topVocab(docs, "text", 64)
    val tok = new VocabTokenizer(
      spark.sparkContext.broadcast(vocab.toSet))
    TextPipeline.tokenize(
        docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          col("text")),
        "text", tok)
      .select(col("doc_id"), col("n_words"),
        size(col("tokens")).cast("long").as("n_tokens"))
      .withColumn("n_chunks",
        ceil(col("n_tokens") / 512.0).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** X41 — banded embedding near-dedup, the "drop vectors ≥ t cosine to
    * an earlier vector" pipeline op x2 is the quadratic baseline of:
    * candidates from [[graft.api.VectorPipeline.bandedCosinePairs]]
    * (exact sub-vector bands — Manku et al., WWW'07 — hashed once, one
    * band-keyed shuffle, NEVER all-pairs), exact cosine verify ≥ 0.8 on
    * candidates only. The corpus is near-orthogonal (max ambient pair
    * 0.51, see x2), so near-dups are PLANTED the x20/x32 way: every 5th
    * vector re-appears (vec_id + 1,000,000) with dimensions 0 and 32
    * sign-flipped — the 2-of-64-dimension clone a re-encoded copy
    * produces, cosine = 1 − 2(v₀² + v₃₂²) ≈ 0.94. Pigeonhole over 8
    * bands guarantees every clone pair shares ≥ 6 bands, so banded
    * recall vs the exhaustive oracle is exact BY CONSTRUCTION, not by
    * LSH luck; ambient pairs never reach the 0.8 verify bar.
    * Sign-flip is exact in IEEE float, so both engines compute identical
    * planted vectors. */
  def x41EmbedNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val aug = emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i % 32 === 0, -x).otherwise(x)).as("embedding"))
    graft.api.VectorPipeline.bandedCosinePairs(
        emb.union(aug), "vec_id", "embedding", 0.8)
      .orderBy(col("id_a"), col("id_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x40_bpe_tokens" -> (x40BpeTokens _),
    "x41_embed_neardup" -> (x41EmbedNearDup _))

  val oracles: Map[String, String] = Map(
    // the pinned vocab is recomputed as data (same deterministic
    // tie-break); SUM over ints is HUGEINT in DuckDB — CAST (x21 lesson)
    "x40_bpe_tokens" ->
      ("WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word " +
       "FROM documents), " +
       "v AS (SELECT word FROM w GROUP BY word " +
       "ORDER BY COUNT(*) DESC, word ASC LIMIT 64), " +
       "t AS (SELECT doc_id, COUNT(*) AS n_words, " +
       "CAST(SUM(CASE WHEN word IN (SELECT word FROM v) THEN 1 " +
       "ELSE CAST(CEIL(length(word) / 4.0) AS BIGINT) END) AS BIGINT) " +
       "AS n_tokens FROM w GROUP BY doc_id) " +
       "SELECT doc_id, n_words, n_tokens, " +
       "CAST(CEIL(n_tokens / 512.0) AS BIGINT) AS n_chunks " +
       "FROM t ORDER BY doc_id"),
    // EXHAUSTIVE exact pairs over the same constructed corpus (the x2
    // shape with the planted sign-flips applied inside the dot): the
    // banded Spark side must find exactly these — recall is the claim
    "x41_embed_neardup" ->
      ("WITH base AS (SELECT vec_id, embedding, FALSE AS aug " +
       "FROM embeddings " +
       "UNION ALL SELECT vec_id + 1000000, embedding, TRUE " +
       "FROM embeddings WHERE vec_id % 5 = 0) " +
       "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
       "round(SUM(" +
       "(CASE WHEN a.aug AND (i - 1) % 32 = 0 " +
       "THEN -CAST(a.embedding[i] AS DOUBLE) " +
       "ELSE CAST(a.embedding[i] AS DOUBLE) END) * " +
       "(CASE WHEN b.aug AND (i - 1) % 32 = 0 " +
       "THEN -CAST(b.embedding[i] AS DOUBLE) " +
       "ELSE CAST(b.embedding[i] AS DOUBLE) END)), 6) AS sim " +
       "FROM base a, base b, range(1, 65) r(i) " +
       "WHERE a.vec_id < b.vec_id GROUP BY a.vec_id, b.vec_id " +
       "HAVING round(SUM(" +
       "(CASE WHEN a.aug AND (i - 1) % 32 = 0 " +
       "THEN -CAST(a.embedding[i] AS DOUBLE) " +
       "ELSE CAST(a.embedding[i] AS DOUBLE) END) * " +
       "(CASE WHEN b.aug AND (i - 1) % 32 = 0 " +
       "THEN -CAST(b.embedding[i] AS DOUBLE) " +
       "ELSE CAST(b.embedding[i] AS DOUBLE) END)), 6) >= 0.8 " +
       "ORDER BY id_a, id_b"))
}
