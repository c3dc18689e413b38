package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DotProduct

/** Reusable similarity-search operators over embedding frames
  * (id + array<float> vector). Cosine ≡ dot for unit-normalized vectors;
  * similarities are rounded to 6 dp so results are independent of
  * summation order. The codegen'd [[graft.functions.DotProduct]] does the
  * inner loop.
  */
object VectorPipeline {

  /** round(a·b, 6) via the native codegen expression. */
  def sim(a: Column, b: Column): Column = round(DotProduct.dot(a, b), 6)

  /** Brute-force top-k neighbors of each probe (exact; the correctness
    * baseline — use [[ivfTopK]] when corpus × probes is large). */
  def topKCosine(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pe"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("ce"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    p.crossJoin(c)
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"), sim(col("pe"), col("ce")).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF-style approximate top-k: vectors are assigned to their nearest
    * centroid; probes score only the nprobe nearest buckets. Centroids
    * are broadcast (tiny); candidate count per probe is
    * corpus/centroids × nprobe instead of the full corpus. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val cents = centroids.select(col(idCol).as("cent_id"), col(vecCol).as("ce"))
    val wAssign = Window.partitionBy(col("vid"))
      .orderBy(col("csim").desc, col("cent_id").asc)
    val assigned = corpus
      .select(col(idCol).as("vid"), col(vecCol).as("ve"))
      .crossJoin(broadcast(cents))
      .select(col("vid"), col("ve"), col("cent_id"),
        sim(col("ve"), col("ce")).as("csim"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vid"), col("ve"), col("cent_id"))
    val wRoute = Window.partitionBy(col("probe_id"))
      .orderBy(col("psim").desc, col("cent_id").asc)
    val routes = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pe"))
      .crossJoin(broadcast(cents))
      .select(col("probe_id"), col("pe"), col("cent_id"),
        sim(col("pe"), col("ce")).as("psim"))
      .withColumn("rrn", row_number().over(wRoute))
      .filter(col("rrn") <= nprobe)
      .select(col("probe_id"), col("pe"), col("cent_id"))
    val wTop = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    routes.join(assigned, "cent_id")
      .filter(col("vid") =!= col("probe_id"))
      .select(col("probe_id"), col("vid").as("neighbor_id"),
        sim(col("pe"), col("ve")).as("sim"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH top-k (SimHash for embeddings): each vector
    * hashes to a `numPlanes`-bit bucket from the signs of seeded random
    * projections; probes search their own bucket plus every 1-bit-flip
    * neighbor (multi-probe) and exact-rerank only those candidates.
    *
    * Candidates per probe ≈ corpus × (numPlanes+1) / 2^numPlanes instead
    * of the full corpus — the collision probability for a pair at angle θ
    * is (1-θ/π)^numPlanes, so truly-near vectors (θ→0) collide w.h.p.
    * while random directions almost never do. Approximate by design:
    * recall depends on the corpus actually containing near neighbors
    * (ScalaTest checks candidate discipline and rank correctness). */
  def hyperplaneLshTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, numPlanes: Int = 8, dims: Int = 64,
      seed: Long = 7L): DataFrame = {
    require(numPlanes <= 30, "bucket id is an Int")
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Array[Float]] =
      Seq.fill(numPlanes)(Array.fill(dims)(rnd.nextGaussian().toFloat))
    def bucketOf(vec: Column): Column =
      planes.zipWithIndex.map { case (pl, i) =>
        when(DotProduct.dot(vec, typedlit(pl)) > 0d, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("ce"))
      .withColumn("bucket", bucketOf(col("ce")))
    // multi-probe: exact bucket + all 1-bit flips; each corpus vector
    // lives in exactly one bucket, so candidates need no dedup
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pe"))
      .withColumn("b0", bucketOf(col("pe")))
      .withColumn("bucket", explode(array(
        (col("b0") +: (0 until numPlanes).map(i =>
          col("b0").bitwiseXOR(lit(1 << i)))): _*)))
      .select(col("probe_id"), col("pe"), col("bucket"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    p.join(c, "bucket")
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        sim(col("pe"), col("ce")).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Derived-claim summary for an ANN result against the exact top-k:
    * one row of spec-bound checks the caller's oracle can state as
    * constants (the claim pattern for sketch/approximate operators —
    * the raw neighbor lists are not portably SQL-expressible, but
    * "recall ≥ r and mean-sim ratio ≥ s over the 10 probes" is).
    *
    * - `n_probes`/`k` pin the result shape;
    * - `recall_ok`: overall recall@k (matched exact neighbors / exact
    *   rows) meets `recallBound` when given;
    * - `simratio_ok`: mean approx similarity / mean exact similarity
    *   meets `simRatioBound` — the scale-stable quality signal on a
    *   near-orthogonal corpus where set-recall is noisy by nature.
    *
    * All inputs are tiny top-k frames; the three single-row aggregates
    * cross-join on the driver side of the plan for free. */
  def annClaim(exact: DataFrame, approx: DataFrame, k: Int,
      recallBound: Option[Double], simRatioBound: Double): DataFrame = {
    val ap = approx.select(col("probe_id").as("ap"),
      col("neighbor_id").as("an"), col("sim").as("asim"))
    val exAgg = exact.agg(
      countDistinct(col("probe_id")).as("n_probes"),
      count(lit(1)).as("n_exact"),
      avg(col("sim")).as("mean_exact"))
    val apAgg = ap.agg(avg(col("asim")).as("mean_approx"))
    val hitAgg = exact.join(ap,
        col("probe_id") === col("ap") && col("neighbor_id") === col("an"),
        "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    val base = exAgg.crossJoin(apAgg).crossJoin(hitAgg)
    val cols = Seq(
      col("n_probes"), lit(k.toLong).as("k"),
      (col("mean_approx") / col("mean_exact") >= simRatioBound)
        .as("simratio_ok")) ++
      recallBound.map(r =>
        (col("n_hits") / col("n_exact") >= r).as("recall_ok")).toSeq
    base.select(cols: _*)
  }

  /** Banded near-duplicate pairs in embedding space — the l2 shape in
    * vector space: candidates come ONLY from equal (band_idx, band_hash)
    * buckets, never all-pairs, and exact cosine verifies candidates.
    *
    * Bands are EXACT sub-vector hashes (the Manku et al., WWW'07
    * simhash-index treatment, applied to the raw vector): the `dims`
    * dimensions split into `numBands` contiguous blocks and each block
    * hashes whole. A pair differing in at most d dimensions shares at
    * least numBands − d bands by pigeonhole, so for clone-style
    * near-dups — dedup's actual target: re-encoded/perturbed copies
    * touching few dimensions — recall is GUARANTEED when numBands > d.
    * Random-hyperplane bands cover the noisy-everywhere case instead
    * ([[hyperplaneLshTopK]]) but only with probabilistic recall, which
    * cannot back an exact-match oracle.
    *
    * Scale shape: the corpus is hashed ONCE (bands materialized, the l2
    * pattern), candidates are one shuffle keyed by the 8-byte band hash,
    * and the verify joins vectors back to candidate pairs only. Volume
    * is Σ_band (vectors sharing band)² — near-zero for float-exact
    * bands unless vectors genuinely share blocks. */
  def bandedCosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numBands: Int = 8, dims: Int = 64): DataFrame = {
    require(dims % numBands == 0, "dims must split evenly into bands")
    val width = dims / numBands
    val v = vectors.select(col(idCol).as("vid"), col(vecCol).as("ve"))
    // hashed once; the self-join below reads the materialized bands on
    // both sides (localCheckpoint — reliable checkpoint on a cluster)
    val bands = v.select(col("vid"), posexplode(array(
        (0 until numBands).map(b =>
          xxhash64(lit(b), slice(col("ve"), b * width + 1, width))): _*))
        .as(Seq("band_idx", "band_hash")))
      .localCheckpoint(true)
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("id_a"), col("y.vid").as("id_b"))
      .distinct()
    val ea = v.select(col("vid").as("id_a"), col("ve").as("ea"))
    val eb = v.select(col("vid").as("id_b"), col("ve").as("eb"))
    cands.join(ea, "id_a").join(eb, "id_b")
      .select(col("id_a"), col("id_b"), sim(col("ea"), col("eb")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** All pairs with similarity at or above `threshold` (brute force —
    * the exact baseline for near-dup detection in embedding space). */
  def cosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = vectors.select(col(idCol).as("id_a"), col(vecCol).as("ea"))
    val b = vectors.select(col(idCol).as("id_b"), col(vecCol).as("eb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), sim(col("ea"), col("eb")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
