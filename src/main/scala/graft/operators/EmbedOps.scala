package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Det, Tables}
import graft.api.VectorPipeline

/** EMBEDDING-PIPELINE theme module (round 11 — the ExtrasN naming-debt
  * retirement, VERDICT r10 #7): the embedding-column near-dup ladder,
  * its shared synthetic clone corpus, and the representation monitors,
  * moved verbatim from Extras5/6/10/11. Candidate pairs always come
  * from the banded cosine index (VectorPipeline) — the corpus is never
  * self-joined — and the clone corpus (CloneOffset, cloneCorpus,
  * clonePairs) is the one seeded-duplicate fixture every embedding
  * dedup row and its oracle share.
  *
  * Rows: x41 banded near-dup, x42 dedup-keep, x46 incremental embed
  * dedup, x47 dup classing, x81 vector quality gate, x123 matryoshka
  * truncation, x124 binary quantization, x125 token drift, x126
  * embedding drift.
  */
object EmbedOps {

  import Det.{sql => d}

  /** The x41/x42 corpus: originals plus the planted clone shard. The
    * test corpus is near-orthogonal (max ambient pair 0.51, see x2), so
    * near-dups are PLANTED the x20/x32 way: every 5th vector re-appears
    * (vec_id + 1,000,000) with dimensions 0 and 32 sign-flipped — the
    * 2-of-64-dimension clone a re-encoded copy produces, cosine =
    * 1 − 2(v₀² + v₃₂²) ≈ 0.94. Sign-flip is exact in IEEE float, so
    * both engines compute identical planted vectors. */
  /** Offset for planted clone ids. [[cloneCorpus]] asserts the real id
    * range stays below it, so clone ids can never silently collide with
    * corpus ids (which would corrupt x41/x42/x46 verdicts). */
  val CloneOffset = 1000000L

  def cloneCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    // id-collision guard, run once per (session, sfDir): one max() agg
    // over the id column (a column-stat-grade job), memoized so repeat
    // corpus constructions in the same session don't re-scan
    graft.Memo(spark, s"x41offset:$sfDir") {
      val mx = emb.agg(max(col("vec_id")).as("mx"))
      require(mx.head.getLong(0) < CloneOffset,
        s"clone ids would collide: max(vec_id) >= $CloneOffset")
      mx.localCheckpoint(true)
    }
    emb.union(emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + CloneOffset).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i % 32 === 0, -x).otherwise(x)).as("embedding")))
  }

  /** Verified near-dup pairs over [[cloneCorpus]] — x41 emits them,
    * x42 consumes them. Staged cross-process since round 10 (VERDICT
    * r9 #3): the banded build runs once per corpus; later processes
    * reload the verified pair table (the x51 PQ-model pattern). */
  private[graft] def clonePairs(spark: SparkSession,
      sfDir: String): DataFrame =
    Tables.stagedFrame(spark, "clone_pairs", sfDir, "embeddings",
        "b8_t08") {
      graft.api.VectorPipeline.bandedCosinePairs(
        cloneCorpus(spark, sfDir), "vec_id", "embedding", 0.8)
    }

  /** X41 — banded embedding near-dedup, the "drop vectors ≥ t cosine to
    * an earlier vector" pipeline op x2 is the quadratic baseline of:
    * candidates from [[graft.api.VectorPipeline.bandedCosinePairs]]
    * (exact sub-vector bands — Manku et al., WWW'07 — hashed once, one
    * band-keyed shuffle, NEVER all-pairs), exact cosine verify ≥ 0.8 on
    * candidates only. Pigeonhole over 8 bands guarantees every planted
    * clone pair ([[cloneCorpus]]) shares ≥ 6 bands, so banded recall vs
    * the exhaustive oracle is exact BY CONSTRUCTION, not by LSH luck;
    * ambient pairs never reach the 0.8 verify bar. */
  def x41EmbedNearDup(spark: SparkSession, sfDir: String): DataFrame =
    clonePairs(spark, sfDir).orderBy(col("id_a"), col("id_b"))

  /** X42 — the dedup MATERIALIZATION x41's pairs feed (VERDICT r4's
    * "the pipeline op a 100 TB curator actually runs"): keep a vector
    * iff it has no near-duplicate among EARLIER vectors (smaller id —
    * "first occurrence wins", x22's rule in embedding space). Pairs are
    * (id_a < id_b), so a vector drops exactly when it appears as some
    * pair's id_b; the verdict is one anti-join-shaped left join against
    * the tiny distinct dropped set. Banded pair volume, never
    * all-pairs; the oracle recomputes the rule from exhaustive pairs
    * with NOT IN. */
  def x42EmbedDedupKeep(spark: SparkSession, sfDir: String): DataFrame = {
    val dropped = clonePairs(spark, sfDir)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("hit", lit(1))
    cloneCorpus(spark, sfDir).select(col("vec_id"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("hit").isNull.as("kept"))
      .orderBy(col("vec_id"))
  }

  /** Shared oracle text for the x41/x42 corpus: the UNION base and the
    * exhaustive verified-pairs query (sign-flips applied inside the
    * dot so the planted clones never materialize as lists). */
  private[operators] val CloneBaseSql =
    "SELECT vec_id, embedding, FALSE AS aug FROM embeddings " +
    "UNION ALL SELECT vec_id + 1000000, embedding, TRUE " +
    "FROM embeddings WHERE vec_id % 5 = 0"

  private[operators] def cloneDotTerm(side: String): String =
    s"(CASE WHEN $side.aug AND (i - 1) % 32 = 0 " +
    s"THEN -CAST($side.embedding[i] AS DOUBLE) " +
    s"ELSE CAST($side.embedding[i] AS DOUBLE) END)"

  private val ClonePairsSql =
    "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
    s"round(SUM(${cloneDotTerm("a")} * ${cloneDotTerm("b")}), 6) AS sim " +
    "FROM base a, base b, range(1, 65) r(i) " +
    "WHERE a.vec_id < b.vec_id GROUP BY a.vec_id, b.vec_id " +
    s"HAVING round(SUM(${cloneDotTerm("a")} * ${cloneDotTerm("b")}), 6) " +
    ">= 0.8"

  /** X46 — INCREMENTAL embedding near-dedup: the planted clone shard
    * ([[graft.operators.EmbedOps.cloneCorpus]]'s re-encoded copies, ids ≥ CloneOffset)
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
    val corpus = graft.operators.EmbedOps.cloneCorpus(spark, sfDir)
    VectorPipeline.bandedCosinePairsAgainst(
        corpus.filter(col("vec_id") >= graft.operators.EmbedOps.CloneOffset),
        corpus.filter(col("vec_id") < graft.operators.EmbedOps.CloneOffset),
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

  private val DupBaseSql =
    "SELECT vec_id, embedding FROM embeddings " +
    "UNION ALL SELECT 2000000 + r.range, e.embedding " +
    "FROM embeddings e, range(0, 50) r WHERE e.vec_id = 0"

  private val DupSimSql =
    "round(SUM(CAST(a.embedding[i] AS DOUBLE) * " +
    "CAST(b.embedding[i] AS DOUBLE)), 6)"

  /** X81 — embedding quality gate (x53's discipline applied to the
    * vector corpus): dimension check, NaN scan, and unit-norm tolerance
    * as independent aggregate expressions in ONE scan. The norm is an
    * ordered left-fold over the array (`aggregate` HOF) — both engines
    * sum elements in array order, so the IEEE result is identical and
    * the tolerance compare is exact. The gate a vector store runs
    * before accepting a shard: wrong-dim / NaN / badly-scaled vectors
    * counted, not crashed on. */
  def x81VectorQualityGate(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
          .as("norm2"),
        expr("exists(embedding, x -> isnan(x))").as("has_nan"),
        size(col("embedding")).as("dim"))
    e.agg(count(lit(1)).as("n_vecs"),
      sum(when(col("dim") =!= 64, 1L).otherwise(0L)).as("n_wrong_dim"),
      sum(when(col("has_nan"), 1L).otherwise(0L)).as("n_with_nan"),
      sum(when(abs(sqrt(col("norm2")) - 1.0) > 0.001, 1L).otherwise(0L))
        .as("n_non_unit"),
      min(col("norm2")).as("min_norm2"), max(col("norm2")).as("max_norm2"))
  }

  /** X123 — matryoshka truncation quality (Kusupati et al. 2022, the
    * MRL serving trick every modern vector DB offers): retrieval run
    * on the FIRST 16 of 64 dims, renormalized, scored against full-dim
    * retrieval as per-probe top-5 overlap. One number per probe — the
    * go/no-go table for "can we serve at 4× less memory". Both sides'
    * top-5 computed exactly (l3's brute-force shape, fine on a probe
    * set; the production path plugs the truncated metric into the
    * banded/PQ pipelines). Sims rounded 6 dp (the dot6 policy) so
    * rank order is engine-stable. */
  def x123Matryoshka(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val probes = emb.filter(col("vec_id") < 10)
    def topkOn(vec: DataFrame => DataFrame, tag: String): DataFrame = {
      val p = vec(probes).select(col("vec_id").as("probe_id"),
        col("v").as("pv"))
      val c = vec(emb).select(col("vec_id").as("neighbor_id"),
        col("v").as("cv"))
      val scored = p.join(c, col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"),
          SimSearch.dot6(col("pv"), col("cv")).as("sim"))
      graft.plans.GroupTopK(scored, Seq("probe_id"),
          Seq(("sim", false), ("neighbor_id", true)), 5)
        .select(col("probe_id"), col("neighbor_id").as(s"n_$tag"))
    }
    val full = topkOn(df => df.withColumn("v", col("embedding")), "full")
    val norm16 = sqrt(aggregate(slice(col("embedding"), 1, 16),
      lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val trunc = topkOn(df => df.withColumn("v",
      transform(slice(col("embedding"), 1, 16),
        x => (x.cast("double") / norm16).cast("float"))), "trunc")
    full.join(trunc,
        full("probe_id") === trunc("probe_id") &&
          col("n_full") === col("n_trunc"))
      .groupBy(full("probe_id").as("probe_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .unionByName(
        // probes with zero overlap would drop out of the join — keep
        // them as explicit zeros (the honest readout)
        full.select(full("probe_id")).distinct()
          .join(full.join(trunc,
              full("probe_id") === trunc("probe_id") &&
                col("n_full") === col("n_trunc"))
            .select(full("probe_id")).distinct(), Seq("probe_id"),
            "left_anti")
          .withColumn("n_overlap", lit(0L)))
      .orderBy(col("probe_id"))
  }

  /** X124 — binary-quantization retrieval (the 1-bit rung of the
    * quantization ladder float → int8 [x34] → PQ [x51] → binary): sign
    * signatures (2×32 bits), Hamming shortlist of 20 via exact integer
    * popcounts through the bounded-heap GroupTopK, exact cosine rerank
    * to top-5. 8 bytes/vector scan — the memory floor; the oracle
    * recomputes signatures, Hamming cut, and rerank exhaustively, so
    * shortlist recall AND rerank order are hash-checked. */
  def x124BinaryQuant(spark: SparkSession, sfDir: String): DataFrame =
    // memoized per (session, corpus): x128's nDCG eval rides this same
    // retrieval frame, so the signature scan + Hamming shortlist +
    // rerank run once, not once per consumer (ADVICE r8)
    graft.Memo(spark, s"x124retr:$sfDir") {
      val emb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      VectorPipeline.binaryHammingTopK(emb,
          emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, shortlist = 20)
        .localCheckpoint(true)
    }.orderBy(col("probe_id"), col("rank"))

  /** X125 — token-level corpus drift (the data-drift report an ML-ops
    * pipeline publishes on every corpus version bump): add-one-smoothed
    * relative-frequency log-ratios per token between the current corpus
    * and x78's release transform, top-20 by |shift|. Two token counts
    * (one scan each), a vocabulary-sized full-outer merge, four scalar
    * totals broadcast — nothing grows beyond the vocabulary. The whole
    * score expression is one identically-spelled chain of IEEE ops on
    * exact integers, rounded 6 dp. */
  def x125TokenDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    def toks(df: DataFrame): DataFrame = df
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val oldT = toks(d).groupBy(col("tok")).agg(count(lit(1)).as("c_old"))
    val newT = toks(d.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text"))))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_new"))
    val merged = oldT.join(newT, Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
      .localCheckpoint(true)
    val totals = merged.agg(sum(col("c_old")).as("t_old"),
      sum(col("c_new")).as("t_new"), count(lit(1)).as("v"))
    val score = log(
      ((col("c_new") + 1).cast("double") / (col("t_new") + col("v")).cast("double")) /
        ((col("c_old") + 1).cast("double") / (col("t_old") + col("v")).cast("double")))
    merged.crossJoin(totals)
      .select(col("tok"), col("c_old"), col("c_new"),
        round(score, 6).as("log_ratio"))
      .orderBy(abs(col("log_ratio")).desc, col("tok")).limit(20)
  }

  /** X126 — embedding centroid drift (x125's sibling in vector space):
    * per label, the cosine between the centroids of the two corpus
    * halves (vec_id parity — a deterministic stand-in for
    * "yesterday's embeddings vs today's"). Centroids from exact
    * DECIMAL per-dimension sums (order-independent) divided once;
    * the 64-term cosine rounded 6 dp. A healthy re-embed shows ~1.0;
    * an encoder regression shows up as a cosine dip per label — the
    * one-table gate before swapping an embedding index. */
  def x126EmbeddingDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val dims = Tables.embeddings(spark, sfDir)
      .select(col("label"), (col("vec_id") % 2).as("half"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("label"), col("half"), col("d"))
      .agg((sum(col("x").cast("double").cast(DecimalType(28, 10)))
        .cast("double") / count(lit(1))).as("m"),
        count(lit(1)).as("n"))
    val a = dims.filter(col("half") === 0)
      .select(col("label"), col("d"), col("m").as("ma"), col("n").as("na"))
    val b = dims.filter(col("half") === 1)
      .select(col("label"), col("d"), col("m").as("mb"), col("n").as("nb"))
    a.join(b, Seq("label", "d"))
      .groupBy(col("label"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        round(sum(col("ma") * col("mb")) /
          (sqrt(sum(col("ma") * col("ma"))) *
            sqrt(sum(col("mb") * col("mb")))), 6).as("centroid_cos"))
      .orderBy(col("label"))
  }

  /** The x124 oracle's shared CTE chain (signatures → hamming →
    * shortlist → rerank → `retr`), reused verbatim by x128's nDCG. */
  private[operators] val BinaryQuantCte: String =
    "sig AS (SELECT vec_id, " +
    "CAST(SUM(CASE WHEN embedding[i] > 0 THEN POWER(2, i - 1) " +
    "ELSE 0 END) AS BIGINT) AS lo, " +
    "CAST(SUM(CASE WHEN embedding[i + 32] > 0 THEN POWER(2, i - 1) " +
    "ELSE 0 END) AS BIGINT) AS hi " +
    "FROM embeddings, range(1, 33) r(i) GROUP BY 1), " +
    "ham AS (SELECT p.vec_id AS probe_id, c.vec_id AS nid, " +
    "bit_count(xor(p.lo, c.lo)) + bit_count(xor(p.hi, c.hi)) AS h " +
    "FROM sig p JOIN sig c ON c.vec_id <> p.vec_id " +
    "WHERE p.vec_id < 10), " +
    "short AS (SELECT probe_id, nid FROM (SELECT probe_id, nid, " +
    "row_number() OVER (PARTITION BY probe_id ORDER BY h, nid) AS rk " +
    "FROM ham) t WHERE rk <= 20), " +
    "rer AS (SELECT s.probe_id, s.nid AS neighbor_id, " +
    "round(SUM(CAST(a.embedding[i] AS DOUBLE) * " +
    "CAST(b.embedding[i] AS DOUBLE)), 6) AS sim " +
    "FROM short s JOIN embeddings a ON a.vec_id = s.probe_id " +
    "JOIN embeddings b ON b.vec_id = s.nid, range(1, 65) r(i) " +
    "GROUP BY 1, 2), " +
    "retr AS (SELECT probe_id, neighbor_id, sim, rank FROM (SELECT *, " +
    "CAST(row_number() OVER (PARTITION BY probe_id " +
    "ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank FROM rer) t " +
    "WHERE rank <= 5)"

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x41_embed_neardup" -> (x41EmbedNearDup _),
    "x42_embed_dedup_keep" -> (x42EmbedDedupKeep _),
    "x46_embed_incremental" -> (x46EmbedIncremental _),
    "x47_embed_dup_class" -> (x47DupClassPairs _),
    "x81_vector_quality_gate" -> (x81VectorQualityGate _),
    "x125_token_drift" -> (x125TokenDrift _),
    "x126_embedding_drift" -> (x126EmbeddingDrift _),
    "x123_matryoshka" -> (x123Matryoshka _),
    "x124_binary_quant" -> (x124BinaryQuant _))

  val oracles: Map[String, String] = Map(
    // EXHAUSTIVE exact pairs over the same constructed corpus (the x2
    // shape with the planted sign-flips applied inside the dot): the
    // banded Spark side must find exactly these — recall is the claim
    "x41_embed_neardup" ->
      (s"WITH base AS ($CloneBaseSql) $ClonePairsSql ORDER BY id_a, id_b"),
// first-occurrence-wins from the exhaustive pairs: kept iff never
    // some pair's larger id
    "x42_embed_dedup_keep" ->
      (s"WITH base AS ($CloneBaseSql), p AS ($ClonePairsSql) " +
       "SELECT vec_id, vec_id NOT IN (SELECT id_b FROM p) AS kept " +
       "FROM base ORDER BY vec_id"),
    // exhaustive CROSS-side pairs over the shared clone corpus: every
    // (original, clone) pair at or above the bar, nothing else — the
    // incremental probe must find exactly these
    "x46_embed_incremental" ->
      (s"WITH base AS (${graft.operators.EmbedOps.CloneBaseSql}) " +
       "SELECT b.vec_id AS id_new, a.vec_id AS id_old, " +
       s"round(SUM(${graft.operators.EmbedOps.cloneDotTerm("a")} * " +
       s"${graft.operators.EmbedOps.cloneDotTerm("b")}), 6) AS sim " +
       "FROM base a, base b, range(1, 65) r(i) " +
       "WHERE a.vec_id < 1000000 AND b.vec_id >= 1000000 " +
       "GROUP BY a.vec_id, b.vec_id " +
       s"HAVING round(SUM(${graft.operators.EmbedOps.cloneDotTerm("a")} * " +
       s"${graft.operators.EmbedOps.cloneDotTerm("b")}), 6) >= 0.8 " +
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
       "ORDER BY id_a, id_b"),
    // the fold runs in array order on both engines (Spark aggregate HOF
    // with 0.0 init vs DuckDB list_reduce seeded by the first element:
    // 0.0 + x == x exactly), so norms are bitwise-identical
    "x81_vector_quality_gate" ->
      ("WITH e AS (SELECT vec_id, len(embedding) AS dim, " +
       "list_reduce(list_transform(embedding, " +
       "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), " +
       "(acc, x) -> acc + x) AS norm2, " +
       "len(list_filter(embedding, x -> isnan(x))) > 0 AS has_nan " +
       "FROM embeddings) " +
       "SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs, " +
       "CAST(SUM(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT) " +
       "AS n_wrong_dim, " +
       "CAST(SUM(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT) " +
       "AS n_with_nan, " +
       "CAST(SUM(CASE WHEN abs(sqrt(norm2) - 1.0) > 0.001 THEN 1 ELSE 0 END) " +
       "AS BIGINT) AS n_non_unit, " +
       "MIN(norm2) AS min_norm2, MAX(norm2) AS max_norm2 FROM e"),
    // same token split, same smoothing chain, same rounding
    "x125_token_drift" ->
      ("WITH oldt AS (SELECT t.tok, COUNT(*) AS c_old FROM documents d, " +
       "unnest(string_split(lower(d.text), ' ')) AS t(tok) " +
       "WHERE length(t.tok) > 0 GROUP BY 1), " +
       "newt AS (SELECT t.tok, COUNT(*) AS c_new FROM " +
       "(SELECT CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END " +
       "AS text FROM documents WHERE doc_id % 11 <> 0) d, " +
       "unnest(string_split(lower(d.text), ' ')) AS t(tok) " +
       "WHERE length(t.tok) > 0 GROUP BY 1), " +
       "m AS (SELECT COALESCE(o.tok, n.tok) AS tok, " +
       "COALESCE(c_old, 0) AS c_old, COALESCE(c_new, 0) AS c_new " +
       "FROM oldt o FULL OUTER JOIN newt n ON o.tok = n.tok), " +
       "tt AS (SELECT CAST(SUM(c_old) AS BIGINT) AS t_old, " +
       "CAST(SUM(c_new) AS BIGINT) AS t_new, " +
       "CAST(COUNT(*) AS BIGINT) AS v FROM m) " +
       "SELECT tok, CAST(c_old AS BIGINT) AS c_old, " +
       "CAST(c_new AS BIGINT) AS c_new, " +
       "round(ln((CAST(c_new + 1 AS DOUBLE) / CAST(t_new + v AS DOUBLE)) / " +
       "(CAST(c_old + 1 AS DOUBLE) / CAST(t_old + v AS DOUBLE))), 6) " +
       "AS log_ratio FROM m CROSS JOIN tt " +
       "ORDER BY abs(round(ln((CAST(c_new + 1 AS DOUBLE) / " +
       "CAST(t_new + v AS DOUBLE)) / (CAST(c_old + 1 AS DOUBLE) / " +
       "CAST(t_old + v AS DOUBLE))), 6)) DESC, tok LIMIT 20"),
// same decimal per-dimension means, same 64-term cosine
    "x126_embedding_drift" ->
      ("WITH dims AS (SELECT label, vec_id % 2 AS half, i AS d, " +
       "CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,10))) " +
       "AS DOUBLE) / COUNT(*) AS m, COUNT(*) AS n " +
       "FROM embeddings, range(1, 65) r(i) GROUP BY 1, 2, 3) " +
       "SELECT a.label, CAST(MAX(a.n) AS BIGINT) AS n_a, " +
       "CAST(MAX(b.n) AS BIGINT) AS n_b, " +
       "round(SUM(a.m * b.m) / (sqrt(SUM(a.m * a.m)) * " +
       "sqrt(SUM(b.m * b.m))), 6) AS centroid_cos " +
       "FROM dims a JOIN dims b ON a.label = b.label AND a.d = b.d " +
       "AND a.half = 0 AND b.half = 1 " +
       "GROUP BY a.label ORDER BY a.label"),
// both top-5s recomputed exhaustively; truncated sims mirror the
    // float-cast renormalization element by element
    "x123_matryoshka" ->
      ("WITH fullD AS (SELECT a.vec_id AS probe_id, b.vec_id AS nid, " +
       "round(SUM(CAST(a.embedding[i] AS DOUBLE) * " +
       "CAST(b.embedding[i] AS DOUBLE)), 6) AS sim " +
       "FROM embeddings a, embeddings b, range(1, 65) r(i) " +
       "WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id GROUP BY 1, 2), " +
       "fullTop AS (SELECT probe_id, nid FROM (SELECT probe_id, nid, " +
       "row_number() OVER (PARTITION BY probe_id " +
       "ORDER BY sim DESC, nid) AS rk FROM fullD) t WHERE rk <= 5), " +
       "n16 AS (SELECT vec_id, sqrt(SUM(CAST(embedding[i] AS DOUBLE) * " +
       "CAST(embedding[i] AS DOUBLE))) AS nrm " +
       "FROM embeddings, range(1, 17) r(i) GROUP BY 1), " +
       "truncD AS (SELECT a.vec_id AS probe_id, b.vec_id AS nid, " +
       "round(SUM(CAST(CAST(CAST(a.embedding[i] AS DOUBLE) / na.nrm " +
       "AS FLOAT) AS DOUBLE) * CAST(CAST(CAST(b.embedding[i] AS DOUBLE) " +
       "/ nb.nrm AS FLOAT) AS DOUBLE)), 6) AS sim " +
       "FROM embeddings a JOIN n16 na ON na.vec_id = a.vec_id, " +
       "embeddings b JOIN n16 nb ON nb.vec_id = b.vec_id, " +
       "range(1, 17) r(i) " +
       "WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id GROUP BY 1, 2), " +
       "truncTop AS (SELECT probe_id, nid FROM (SELECT probe_id, nid, " +
       "row_number() OVER (PARTITION BY probe_id " +
       "ORDER BY sim DESC, nid) AS rk FROM truncD) t WHERE rk <= 5), " +
       "o AS (SELECT ft.probe_id, COUNT(*) AS c FROM fullTop ft " +
       "JOIN truncTop tt ON tt.probe_id = ft.probe_id " +
       "AND tt.nid = ft.nid GROUP BY 1) " +
       "SELECT pr.probe_id, CAST(COALESCE(o.c, 0) AS BIGINT) AS n_overlap " +
       "FROM (SELECT DISTINCT probe_id FROM fullTop) pr " +
       "LEFT JOIN o USING (probe_id) ORDER BY probe_id"),
// signatures, Hamming cut, and rerank recomputed exhaustively
    "x124_binary_quant" ->
      ("WITH " + BinaryQuantCte +
       " SELECT probe_id, neighbor_id, sim, rank FROM retr " +
       "ORDER BY probe_id, rank"))
}
