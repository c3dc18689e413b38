package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the embeddings table — SURVEY §2.8 L3 plus the
  * scale-path extras (cosine near-dup pairs, IVF-bucketed ANN).
  *
  * Vectors are unit-normalized (FIXTURES.md) so cosine ≡ dot product.
  * Dot products run as a higher-order `aggregate` over `zip_with` — pure
  * codegen'd expressions, no UDF — in double precision, then round to
  * 6 dp so the (order-sensitive, last-ulp) summation agrees with the
  * oracle's arbitrary-order SUM.
  *
  * Scale posture: brute force is the CORRECTNESS baseline (fine at probe
  * × corpus = 10 × 2k); the 100 TB path is [[x8IvfAnn]], which prunes the
  * corpus to the probe's nearest centroid buckets before scoring —
  * candidate count per probe is corpus/k·nprobe instead of corpus.
  */
object SimSearch {

  /** round(Σ aᵢ·bᵢ, 6): native codegen'd dot product (sequential double
    * accumulation — identical result to the HOF chain it replaced, ~4×
    * faster; see graft.functions.DotProduct). */
  def dot6(a: Column, b: Column): Column =
    round(graft.functions.DotProduct.dot(a, b), 6)

  /** L3 — brute-force top-5 cosine neighbors for each probe (vec_id<10),
    * ranked by rounded similarity with vec_id tie-break. */
  def l3TopKCosine(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    probes.crossJoin(emb)
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        dot6(col("pe"), col("embedding")).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("neighbor_id"), col("sim"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** X2 — embedding-cosine near-duplicate pairs (sim ≥ 0.45; the corpus is near-orthogonal, max pairwise 0.51), brute force
    * at oracle scale; the LSH/IVF bucketing above is the scale path. */
  def x2CosineNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val a = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), dot6(col("ea"), col("eb")).as("sim"))
      .filter(col("sim") >= 0.45)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** X8 — IVF-style ANN (rows-only; ScalaTest checks recall vs L3):
    * deterministic centroid seeds (every 50th vector), vectors assigned
    * to their nearest centroid, probes search only the nprobe=3 nearest
    * buckets. All joins are broadcast (centroid set is tiny). */
  def x8IvfAnn(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    // assignment: nearest centroid per vector (broadcast centroids)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id").asc)
    val assigned = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        dot6(col("embedding"), col("ce")).as("csim"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
    // probe routing: top-3 centroid buckets per probe
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val wRoute = Window.partitionBy(col("probe_id"))
      .orderBy(col("psim").desc, col("cent_id").asc)
    val routes = probes.crossJoin(broadcast(cents))
      .select(col("probe_id"), col("pe"), col("cent_id"),
        dot6(col("pe"), col("ce")).as("psim"))
      .withColumn("rrn", row_number().over(wRoute))
      .filter(col("rrn") <= 3)
      .select(col("probe_id"), col("pe"), col("cent_id"))
    // score only vectors in routed buckets
    val wTop = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    routes.join(assigned, "cent_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        dot6(col("pe"), col("embedding")).as("sim"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("neighbor_id"), col("sim"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l3_topk_cosine" -> (l3TopKCosine _),
    "x2_cosine_neardup" -> (x2CosineNearDup _),
    "x8_ivf_ann" -> (x8IvfAnn _))

  val oracles: Map[String, String] = Map(
    "l3_topk_cosine" ->
      ("WITH p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings " +
       "WHERE vec_id < 10), dots AS (SELECT probe_id, e.vec_id AS neighbor_id, " +
       "round(SUM(CAST(pe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), 6) AS sim " +
       "FROM p, embeddings e, range(1, 65) r(i) WHERE e.vec_id <> probe_id " +
       "GROUP BY probe_id, e.vec_id), ranked AS (SELECT probe_id, neighbor_id, sim, " +
       "CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, " +
       "neighbor_id ASC) AS BIGINT) AS rank FROM dots) " +
       "SELECT probe_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5 " +
       "ORDER BY probe_id, rank"),
    "x2_cosine_neardup" ->
      ("SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
       "round(SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 6) AS sim " +
       "FROM embeddings a, embeddings b, range(1, 65) r(i) " +
       "WHERE a.vec_id < b.vec_id GROUP BY a.vec_id, b.vec_id " +
       "HAVING round(SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 6) >= 0.45 " +
       "ORDER BY id_a, id_b"))
}
