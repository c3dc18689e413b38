package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.VectorPipeline

/** Round-6 surface growth, closing VERDICT r5's ranked items: the
  * incremental embedding-dedup form (X46 — x38's probe-against-
  * persisted-index shape in vector space) and the exact-duplicate-class
  * guard path of the banded near-dup family exercised as a contract row
  * (X47 — the corpus shape whose unguarded band join was r5's one
  * scale-killer).
  */
object Extras6 {

  /** X46 — INCREMENTAL embedding near-dedup: the planted clone shard
    * ([[Extras5.cloneCorpus]]'s re-encoded copies, ids ≥ CloneOffset)
    * plays the incoming increment; the original embeddings are the
    * existing corpus. The probe's sub-vector bands
    * ([[VectorPipeline.bandedCosinePairsAgainst]]) probe the corpus'
    * band index — hashed ONCE and localCheckpointed (the persisted
    * index table a production pipeline reuses per increment; x38's
    * exact design in vector space) — candidate volume is bounded by
    * band collisions with hot corpus buckets stop-listed, NEVER
    * probe × corpus, and exact cosine verifies survivors. Pigeonhole
    * over 8 bands guarantees every (clone, original) pair shares ≥ 6
    * bands, so recall vs the exhaustive cross-side oracle is exact by
    * construction. */
  def x46EmbedIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = Extras5.cloneCorpus(spark, sfDir)
    VectorPipeline.bandedCosinePairsAgainst(
        corpus.filter(col("vec_id") >= Extras5.CloneOffset),
        corpus.filter(col("vec_id") < Extras5.CloneOffset),
        "vec_id", "embedding", 0.8)
      .orderBy(col("id_new"), col("id_old"))
  }

  /** The x47 corpus: the embeddings table plus one planted EXACT-
    * duplicate class — vector 0's embedding re-appearing verbatim 50
    * times (ids 2,000,000…2,000,049), the failed-encode / re-ingested-
    * asset shape that made the unguarded band join quadratic. Planted
    * via a per-row sequence explode — zero joins. */
  def dupClassCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    emb.union(emb.filter(col("vec_id") === 0L)
      .select(explode(sequence(lit(0L), lit(49L))).as("k"), col("embedding"))
      .select((lit(2000000L) + col("k")).as("vec_id"), col("embedding")))
  }

  /** X47 — banded near-dedup over a corpus CONTAINING an exact-duplicate
    * class (the guard path of
    * [[VectorPipeline.bandedCosinePairsDetail]] exercised end to end):
    * the 51-member class collapses to ONE representative before the
    * band join — class members never inflate a band bucket — and the
    * 51·50/2 intra-class pairs are reconstructed from the membership
    * table with the class' self-similarity computed once, never flowing
    * through a shuffle join. The exhaustive DuckDB oracle recomputes
    * every pair, so both the expansion (intra pairs present, exact sim)
    * and the guard's precision (no pair lost, none invented) are
    * hash-checked. The spec layer additionally plants a 150-member
    * class and asserts the band-join input for its bucket is 1. */
  def x47DupClassPairs(spark: SparkSession, sfDir: String): DataFrame =
    VectorPipeline.bandedCosinePairs(
        dupClassCorpus(spark, sfDir), "vec_id", "embedding", 0.8)
      .orderBy(col("id_a"), col("id_b"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x46_embed_incremental" -> (x46EmbedIncremental _),
    "x47_embed_dup_class" -> (x47DupClassPairs _))

  private val DupBaseSql =
    "SELECT vec_id, embedding FROM embeddings " +
    "UNION ALL SELECT 2000000 + r.range, e.embedding " +
    "FROM embeddings e, range(0, 50) r WHERE e.vec_id = 0"
  private val DupSimSql =
    "round(SUM(CAST(a.embedding[i] AS DOUBLE) * " +
    "CAST(b.embedding[i] AS DOUBLE)), 6)"

  val oracles: Map[String, String] = Map(
    // exhaustive CROSS-side pairs over the shared clone corpus: every
    // (original, clone) pair at or above the bar, nothing else — the
    // incremental probe must find exactly these
    "x46_embed_incremental" ->
      (s"WITH base AS (${Extras5.CloneBaseSql}) " +
       "SELECT b.vec_id AS id_new, a.vec_id AS id_old, " +
       s"round(SUM(${Extras5.cloneDotTerm("a")} * " +
       s"${Extras5.cloneDotTerm("b")}), 6) AS sim " +
       "FROM base a, base b, range(1, 65) r(i) " +
       "WHERE a.vec_id < 1000000 AND b.vec_id >= 1000000 " +
       "GROUP BY a.vec_id, b.vec_id " +
       s"HAVING round(SUM(${Extras5.cloneDotTerm("a")} * " +
       s"${Extras5.cloneDotTerm("b")}), 6) >= 0.8 " +
       "ORDER BY id_new, id_old"),
    // exhaustive pairs over the duplicate-class corpus: the 1275 intra-
    // class pairs (plus any ambient pair reaching the bar — none on
    // this corpus) with exact sims
    "x47_embed_dup_class" ->
      (s"WITH base AS ($DupBaseSql) " +
       s"SELECT a.vec_id AS id_a, b.vec_id AS id_b, $DupSimSql AS sim " +
       "FROM base a, base b, range(1, 65) r(i) " +
       "WHERE a.vec_id < b.vec_id " +
       "GROUP BY a.vec_id, b.vec_id " +
       s"HAVING $DupSimSql >= 0.8 " +
       "ORDER BY id_a, id_b"))
}
