package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** CLUSTERING theme module (round 11 — the ExtrasN naming-debt
  * retirement, VERDICT r10 #7): the deterministic k-means family and
  * its readouts, moved verbatim from Extras12. The Lloyd trainer runs
  * EXACT FIXED-POINT on a LONG lattice (products at 1e12, mean
  * coordinates at 1e10) so the whole trajectory is bitwise
  * reproducible, order-free, and pure codegen; only the k×dims
  * centroid table ever reaches the driver (the bounded all-reduce a
  * 1000-executor run performs per round).
  *
  * Rows: x134 k-means, x174 simplified silhouette. Kernel faces
  * (kmeansAssignments / kmeansAssignTrained / kmeansAssignTop2 /
  * kmeansDistances / kmeansCentroids / assignToCentroids) serve the
  * semantic-curation ladder ([[CurationOps]], [[graft.api.Curation]])
  * and the streaming SemDeDup index.
  */
object Clustering {

  // ---------------------------------------------------------------- x134

  /** The lattice policy (shared by [[graft.functions.LatticeDot]], the
    * driver mirror below, and the oracle SQL): y = x·c·1e12 in plain
    * left-associated IEEE doubles, then HALF-AWAY-FROM-ZERO to the
    * nearest integer — `round(v.x * c.c * 1e12, 0)` in DuckDB, the
    * sign-split floor/ceil formula in JVM code (identical for every
    * double with |y| < 2^52, including exact halves). Because both
    * engines run the SAME IEEE ops on the SAME doubles, the lattice
    * integer is bit-identical by construction — no shortest-repr
    * subtleties — and the 64-term integer sums are exact and
    * order-free (|dot| ≤ 6.4e13 ≪ 2^63). */
  private def latticeHalfUp(y: Double): Long =
    (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong

  /** Nearest-centroid assignment: argmin ‖v−c‖² ≡ argmax 2·v·c − c·c
    * (the −‖v‖² term is constant per point; doubling keeps the score on
    * the exact integer lattice — no division ever happens). All k
    * scores compute in ONE projection per row (k struct entries,
    * `array_max` picks the total-order winner: highest score, then
    * LOWEST code via the negated-code field) — no join, no window, no
    * shuffle. The winning struct carries its (dvc, dcc) so the inertia
    * readout is free. */
  private def kmAssignArr(vec: DataFrame,
      cents: Seq[(Int, Array[Double])]): DataFrame = {
    val entries = cents.sortBy(_._1).map { case (code, cent) =>
      val dcc = cent.map(c => latticeHalfUp(c * c * 1e12)).sum
      val dvc = graft.functions.LatticeDot.dot(col("ve"), cent, 1e12)
      struct(
        (lit(2L) * dvc - lit(dcc)).as("s"),
        lit(-code).as("negcode"), lit(code).as("code"),
        dvc.as("dvc"), lit(dcc).as("dcc"))
    }
    vec.select(col("vid"), col("ve"),
        array_max(array(entries: _*)).as("w"))
      .select(col("vid"), col("ve"), col("w.code").as("code"),
        col("w.dvc").as("dvc"), col("w.dcc").as("dcc"))
  }

  /** X134 — general k-means over the full 64-dim embeddings (VERDICT r8
    * #3: pqTrain's deterministic Lloyd core promoted to a public
    * clustering contract row). k deterministic seeds (the k lowest-id
    * vectors), `iters` Lloyd rounds, then a final assignment against
    * the final centroids; output is the per-cluster readout (members +
    * exact-decimal inertia). Fully distributed per step: the corpus
    * never moves, only the (k × dims) centroid table reaches the
    * driver each round (the standard k-means shape — identical to a
    * 1000-executor run, where this collect is the same bounded
    * all-reduce). All heavy arithmetic runs EXACT FIXED-POINT on a
    * LONG lattice (products at 1e12, mean coordinates at 1e10 —
    * [[kmDotLit]]) with the identical spelling on the oracle side, so
    * the whole trajectory is bitwise reproducible, order-free, and
    * pure codegen; means descale through one IEEE division chain →
    * round 7 dp → FLOAT; empty clusters keep their previous centroid
    * (pqTrain's rule). Oracle unrolls the iterations as CTEs (the
    * x111 pattern). */
  def kmeans(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    // (vid, ve): the corpus stays ARRAYS end to end; reused iters+1
    // times — cut the lineage once
    val vec = graft.Checkpoints.cut(
      corpus.select(col(idCol).as("vid"), col(vecCol).as("ve")))
    val cents = kmTrain(vec, k, iters)
    // final assignment + inertia in ONE narrow pass: dist² = v·v −
    // 2·v·c + c·c with every dot an exact lattice long; v·v is a
    // per-row self-dot, no separate aggregate or join. The lattice sum
    // over members stays within 2^63 (dist² ≤ 4 ⇒ ≤ 4e12 scaled per
    // row); the single long→double conversion before the 1e12
    // descale is the identical spelling on the oracle side.
    // self-dot on the same lattice: y = x·x·1e12, sign-split half-away
    // (floor/ceil — the exact spelling of the oracle's round(y, 0));
    // runs once in the final pass, so the HOF cost is immaterial
    val dvv = aggregate(
      transform(col("ve"), x => {
        val y = x.cast("double") * x.cast("double") * lit(1e12)
        when(y >= 0, floor(y + lit(0.5)))
          .otherwise(ceil(y - lit(0.5))).cast("long")
      }),
      lit(0L), (acc, p) => acc + p)
    kmAssignArr(vec, cents)
      .withColumn("dist2", dvv - lit(2L) * col("dvc") + col("dcc"))
      .groupBy(col("code"))
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("dist2")).cast("double") / lit(1e12), 6)
          .as("inertia"))
      .select(col("code").cast("long").as("cluster"),
        col("n_members"), col("inertia"))
      .orderBy(col("cluster"))
  }

  /** The deterministic Lloyd trainer extracted from [[kmeans]] (round
    * 10, so [[kmeansAssignments]] shares the identical trajectory):
    * seeds = the k lowest-id vectors in id order (code = rank − 1, a
    * k-row bounded collect, like every centroid pull below — collect()
    * of an orderBy().limit() preserves the sort order), then `iters`
    * rounds of lattice assignment + fixed-point mean. */
  private def kmTrain(vec: DataFrame, k: Int,
      iters: Int): Seq[(Int, Array[Double])] = {
    var cents: Seq[(Int, Array[Double])] = vec
      .orderBy(col("vid")).limit(k).collect().toSeq
      .zipWithIndex
      .map { case (r, i) =>
        i -> r.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray
      }
    for (_ <- 1 to iters) {
      val upd = kmAssignArr(vec, cents)
        .select(col("code"), posexplode(col("ve")).as(Seq("d", "x")))
        // mean policy, fixed-point like the dots: coordinates rounded
        // onto the 1e10 LONG lattice (identical double spelling in the
        // oracle), exact integer sum, then the IEEE divisions → round
        // 7 dp → FLOAT (then widened back: every centroid coordinate
        // is exactly a float)
        .groupBy(col("code"), col("d"))
        .agg(round(sum(round(col("x").cast("double") * lit(1e10), 0)
                .cast("long")).cast("double") /
              count(lit(1)) / lit(1e10), 7)
          .cast("float").cast("double").as("c"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (code, rows) =>
          val arr = cents.find(_._1 == code).get._2.clone()
          rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
          code -> arr
        }
      // empty clusters keep their previous centroid (pqTrain's rule)
      cents = cents.map { case (code, old) =>
        code -> upd.getOrElse(code, old)
      }
    }
    cents
  }

  /** Per-vector cluster labels under the SAME deterministic trajectory
    * as [[kmeans]] (same seeds, same lattice arithmetic): (vid,
    * cluster) for every input vector — the assignment face x172's
    * SemDeDup composition consumes. */
  def kmeansAssignments(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val vec = graft.Checkpoints.cut(
      corpus.select(col(idCol).as("vid"), col(vecCol).as("ve")))
    val cents = kmTrain(vec, k, iters)
    kmAssignArr(vec, cents)
      .select(col("vid"), col("code").cast("long").as("cluster"))
  }

  /** (vid, cluster, d2) — per-vector assigned cluster plus the EXACT
    * lattice distance² to its centroid (long, scaled 1e12), same
    * trajectory as [[kmeans]]: the prototypicality signal x175's D4
    * pruning ranks on. */
  private[graft] def kmeansDistances(corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int): DataFrame = {
    val vec = graft.Checkpoints.cut(
      corpus.select(col(idCol).as("vid"), col(vecCol).as("ve")))
    val cents = kmTrain(vec, k, iters)
    val dvv = aggregate(
      transform(col("ve"), x => {
        val y = x.cast("double") * x.cast("double") * lit(1e12)
        when(y >= 0, floor(y + lit(0.5)))
          .otherwise(ceil(y - lit(0.5))).cast("long")
      }),
      lit(0L), (acc, p) => acc + p)
    kmAssignArr(vec, cents)
      .withColumn("d2", dvv - lit(2L) * col("dvc") + col("dcc"))
      .select(col("vid"), col("code").cast("long").as("cluster"),
        col("d2"))
  }

  /** Trained-centroid pull + assignment faces for streaming consumers
    * (st26): the centroids train ONCE at stream start, each
    * micro-batch then assigns against the fixed table — the k×dims
    * driver-side model a 1000-executor streaming job broadcasts. */
  private[graft] def kmeansCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int): Seq[(Int, Array[Double])] = {
    val vec = graft.Checkpoints.cut(
      corpus.select(col(idCol).as("vid"), col(vecCol).as("ve")))
    kmTrain(vec, k, iters)
  }

  private[graft] def assignToCentroids(df: DataFrame, idCol: String,
      vecCol: String, cents: Seq[(Int, Array[Double])]): DataFrame =
    kmAssignArr(df.select(col(idCol).as("vid"), col(vecCol).as("ve")),
        cents)
      .select(col("vid"), col("code").cast("long").as("cluster"))

  /** Train on one frame, assign another — the incremental face (x173):
    * a production index's centroids predate the incoming shard, so the
    * shard assigns against the TRAINED centroids without retraining.
    * Same deterministic trajectory as [[kmeans]] for the train side;
    * the assign side pays one lattice argmax pass. */
  def kmeansAssignTrained(train: DataFrame, assign: DataFrame,
      idCol: String, vecCol: String, k: Int, iters: Int): DataFrame = {
    val trainVec = graft.Checkpoints.cut(
      train.select(col(idCol).as("vid"), col(vecCol).as("ve")))
    val cents = kmTrain(trainVec, k, iters)
    kmAssignArr(assign.select(col(idCol).as("vid"), col(vecCol).as("ve")),
        cents)
      .select(col("vid"), col("code").cast("long").as("cluster"))
  }

  /** Top-2 nearest-centroid assignment against freshly trained
    * centroids: (vid, c1, c2) — winner and runner-up under the exact
    * x134 lattice order (ascending (−score, code) ≡ kmAssignArr's
    * argmax and silhouette's (d², code): identical winners, identical
    * tie rule). The runner-up is the standard IVF multi-probe axis —
    * [[semDedupStraddleGuard]] counts how many straddling near-dup
    * pairs a top-2 probe would recover. */
  def kmeansAssignTop2(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val vec = graft.Checkpoints.cut(
      corpus.select(col(idCol).as("vid"), col(vecCol).as("ve")))
    val cents = kmTrain(vec, k, iters)
    val entries = cents.sortBy(_._1).map { case (code, cent) =>
      val dcc = cent.map(c => latticeHalfUp(c * c * 1e12)).sum
      val dvc = graft.functions.LatticeDot.dot(col("ve"), cent, 1e12)
      struct((lit(dcc) - lit(2L) * dvc).as("negs"), lit(code).as("code"))
    }
    val sorted = array_sort(array(entries: _*))
    vec.select(col("vid"), sorted.as("sorted"))
      .select(col("vid"),
        element_at(col("sorted"), 1).getField("code").cast("long").as("c1"),
        element_at(col("sorted"), 2).getField("code").cast("long").as("c2"))
  }

  /** X134 contract binding: k=8, 3 Lloyd rounds on the embeddings. */
  def x134Kmeans(spark: SparkSession, sfDir: String): DataFrame =
    kmeans(Tables.embeddings(spark, sfDir), "vec_id", "embedding",
      k = 8, iters = 3)

  // ---------------------------------------------------------------- x174

  /** X174 — simplified silhouette (the centroid form of Rousseeuw
    * 1987, the standard large-scale spelling — sklearn's
    * "simplified silhouette"): per vector, a = distance to its own
    * centroid, b = distance to the nearest OTHER centroid,
    * s = (b − a) / max(a, b); reported as the per-cluster mean — the
    * cluster-quality readout every k-means run is judged by (s → 1
    * tight and separated, s → 0 boundary-riding, s < 0 misassigned).
    * The O(n²) full silhouette is inadmissible at corpus scale; the
    * centroid form is one narrow pass over the corpus against the
    * k-row centroid table — no pair work at all.
    *
    * Determinism: every distance² is the exact lattice long
    * dvv − 2·dvc + dcc (the x134 policy); winner/runner-up selection
    * orders by (d², code) — identical to the assignment's argmax tie
    * rule; then sqrt(d²/1e12), the ratio, and the 6-dp round are the
    * IDENTICAL IEEE spelling in both engines, and the per-cluster mean
    * sums the rounded values EXACTLY in DECIMAL(28,15) before one
    * closing division. Oracle: the x134 Lloyd chain + the same
    * winner/runner window + the same arithmetic. */
  def x174Silhouette(spark: SparkSession, sfDir: String): DataFrame =
    silhouette(Tables.embeddings(spark, sfDir), "vec_id", "embedding",
      k = 8, iters = 3)

  /** The public kernel behind [[x174Silhouette]] (the [[kmeans]]
    * pattern: caller frame, caller column names, any k/iters). */
  def silhouette(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val vec = graft.Checkpoints.cut(
      corpus.select(col(idCol).as("vid"), col(vecCol).as("ve")))
    val cents = kmTrain(vec, k, iters)
    val dvv = aggregate(
      transform(col("ve"), x => {
        val y = x.cast("double") * x.cast("double") * lit(1e12)
        when(y >= 0, floor(y + lit(0.5)))
          .otherwise(ceil(y - lit(0.5))).cast("long")
      }),
      lit(0L), (acc, p) => acc + p)
    val entries = cents.sortBy(_._1).map { case (code, cent) =>
      val dcc = cent.map(c => latticeHalfUp(c * c * 1e12)).sum
      val dvc = graft.functions.LatticeDot.dot(col("ve"), cent, 1e12)
      struct((col("dvv") - lit(2L) * dvc + lit(dcc)).as("d2"),
        lit(code).as("code"))
    }
    val sorted = array_sort(array(entries: _*))
    val a = sqrt(col("w.d2").cast("double") / lit(1e12))
    val b = sqrt(col("r.d2").cast("double") / lit(1e12))
    vec.select(col("vid"), col("ve"))
      .withColumn("dvv", dvv)
      .select(col("vid"), sorted.as("sorted"))
      .select(col("vid"), element_at(col("sorted"), 1).as("w"),
        element_at(col("sorted"), 2).as("r"))
      .select(col("vid"), col("w.code").as("cluster"),
        when(greatest(a, b) === 0.0, lit(0.0))
          .otherwise(round((b - a) / greatest(a, b), 6)).as("s"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("s").cast(DecimalType(28, 15))).cast("double") /
          count(lit(1)), 6).as("mean_silhouette"))
      .select(col("cluster").cast("long").as("cluster"),
        col("n_members"), col("mean_silhouette"))
      .orderBy(col("cluster"))
  }

  /** The x174 oracle: [[KmeansSql]]'s Lloyd chain + dvv + the
    * winner/runner-up window over exact lattice d² + the identical
    * sqrt/ratio/round spelling. */
  private val SilhouetteSql: String =
    "WITH v AS MATERIALIZED (SELECT vec_id AS vid, i - 1 AS d, " +
    "CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, " +
    "range(1, 65) r(i)), " +
    "seeds AS (SELECT vec_id AS svid, CAST(row_number() OVER " +
    "(ORDER BY vec_id) - 1 AS INT) AS code FROM embeddings " +
    "ORDER BY vec_id LIMIT 8), " +
    "c0 AS (SELECT s.code, v.d, v.x AS c FROM seeds s " +
    "JOIN v ON v.vid = s.svid), " +
    kmIterSql("c0", 1) + ", " + kmIterSql("c1", 2) + ", " +
    kmIterSql("c2", 3) + ", " +
    "dvc4 AS (SELECT v.vid, c.code, " +
    "SUM(CAST(round(v.x * c.c * 1e12, 0) AS BIGINT)) AS dvc " +
    "FROM v JOIN c3 c ON v.d = c.d GROUP BY v.vid, c.code), " +
    "dcc4 AS (SELECT code, SUM(CAST(round(c * c * 1e12, 0) AS BIGINT)) " +
    "AS dcc FROM c3 GROUP BY code), " +
    "dvv AS (SELECT vid, SUM(CAST(round(x * x * 1e12, 0) AS BIGINT)) " +
    "AS dvv FROM v GROUP BY vid), " +
    "d2 AS (SELECT d.vid, d.code, w.dvv - 2 * d.dvc + s.dcc AS d2 " +
    "FROM dvc4 d JOIN dcc4 s USING (code) JOIN dvv w ON w.vid = d.vid), " +
    "ranked AS MATERIALIZED (SELECT vid, code, d2, row_number() OVER " +
    "(PARTITION BY vid ORDER BY d2, code) AS rn FROM d2), " +
    "sil AS (SELECT w.vid, w.code AS cluster, " +
    "CASE WHEN greatest(sqrt(CAST(w.d2 AS DOUBLE) / 1e12), " +
    "sqrt(CAST(r.d2 AS DOUBLE) / 1e12)) = 0 THEN 0.0 ELSE " +
    "round((sqrt(CAST(r.d2 AS DOUBLE) / 1e12) - " +
    "sqrt(CAST(w.d2 AS DOUBLE) / 1e12)) / " +
    "greatest(sqrt(CAST(w.d2 AS DOUBLE) / 1e12), " +
    "sqrt(CAST(r.d2 AS DOUBLE) / 1e12)), 6) END AS s " +
    "FROM (SELECT * FROM ranked WHERE rn = 1) w " +
    "JOIN (SELECT * FROM ranked WHERE rn = 2) r ON r.vid = w.vid) " +
    "SELECT CAST(cluster AS BIGINT) AS cluster, " +
    "CAST(COUNT(*) AS BIGINT) AS n_members, " +
    "round(CAST(SUM(CAST(s AS DECIMAL(28,15))) AS DOUBLE) / COUNT(*), 6) " +
    "AS mean_silhouette FROM sil GROUP BY cluster ORDER BY cluster"


  /** L8 — per-label embedding centroids: elementwise mean over the
    * vector column via posexplode + grouped agg (shuffle volume =
    * labels × dims, not rows × dims — map-side combine does the heavy
    * lifting; the natural first step of k-means / IVF training). */
  def l8Centroids(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg((sum(col("v").cast("double").cast(DecimalType(18, 8))).cast("double")
          / count(lit(1))).as("mean_v"),
        count(lit(1)).as("n_vecs"))
      .select(col("label"), col("dim").cast("long").as("dim"),
        col("mean_v"), col("n_vecs"))
      .orderBy(col("label"), col("dim"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x134_kmeans" -> (x134Kmeans _),
    "x174_silhouette" -> (x174Silhouette _),
    "l8_centroids" -> (l8Centroids _))

  /** One unrolled Lloyd round of the x134 oracle: assignment CTEs from
    * centroid table `prevC`, then the updated centroid table `c$n` —
    * the identical fixed-point policy as [[kmDotLit]]/[[kmeans]],
    * spelled in DuckDB: products rounded 12 dp then scaled onto the
    * 1e12 BIGINT lattice (coordinates onto the 1e10 lattice for the
    * means), exact integer sums, the same IEEE division chain. */
  private[operators] def kmIterSql(prevC: String, n: Int): String =
    s"dvc$n AS (SELECT v.vid, c.code, " +
    "SUM(CAST(round(v.x * c.c * 1e12, 0) AS BIGINT)) " +
    s"AS dvc FROM v JOIN $prevC c ON v.d = c.d " +
    "GROUP BY v.vid, c.code), " +
    s"dcc$n AS (SELECT code, " +
    "SUM(CAST(round(c * c * 1e12, 0) AS BIGINT)) " +
    s"AS dcc FROM $prevC GROUP BY code), " +
    s"asg$n AS (SELECT vid, code FROM (SELECT d.vid, d.code, " +
    "row_number() OVER (PARTITION BY d.vid " +
    "ORDER BY (2 * d.dvc - s.dcc) DESC, d.code) AS rn " +
    s"FROM dvc$n d JOIN dcc$n s USING (code)) t WHERE rn = 1), " +
    s"upd$n AS (SELECT a.code, v.d, CAST(CAST(round(" +
    "CAST(SUM(CAST(round(v.x * 1e10, 0) AS BIGINT)) AS DOUBLE) " +
    "/ COUNT(*) / 1e10, 7) " +
    s"AS FLOAT) AS DOUBLE) AS c FROM asg$n a JOIN v USING (vid) " +
    "GROUP BY a.code, v.d), " +
    s"c$n AS (SELECT p.code, p.d, CAST(COALESCE(u.c, p.c) AS DOUBLE) " +
    s"AS c FROM $prevC p LEFT JOIN upd$n u " +
    "ON u.code = p.code AND u.d = p.d)"

  private val KmeansSql: String =
    "WITH v AS (SELECT vec_id AS vid, i - 1 AS d, " +
    "CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, range(1, 65) r(i)), " +
    "seeds AS (SELECT vec_id AS svid, CAST(row_number() OVER " +
    "(ORDER BY vec_id) - 1 AS INT) AS code FROM embeddings " +
    "ORDER BY vec_id LIMIT 8), " +
    "c0 AS (SELECT s.code, v.d, v.x AS c FROM seeds s " +
    "JOIN v ON v.vid = s.svid), " +
    kmIterSql("c0", 1) + ", " + kmIterSql("c1", 2) + ", " +
    kmIterSql("c2", 3) + ", " +
    // final assignment + inertia against c3, same lattice spelling
    "dvc4 AS (SELECT v.vid, c.code, " +
    "SUM(CAST(round(v.x * c.c * 1e12, 0) AS BIGINT)) " +
    "AS dvc FROM v JOIN c3 c ON v.d = c.d " +
    "GROUP BY v.vid, c.code), " +
    "dcc4 AS (SELECT code, " +
    "SUM(CAST(round(c * c * 1e12, 0) AS BIGINT)) " +
    "AS dcc FROM c3 GROUP BY code), " +
    "asg4 AS (SELECT vid, code FROM (SELECT d.vid, d.code, " +
    "row_number() OVER (PARTITION BY d.vid " +
    "ORDER BY (2 * d.dvc - s.dcc) DESC, d.code) AS rn " +
    "FROM dvc4 d JOIN dcc4 s USING (code)) t WHERE rn = 1), " +
    "dvv AS (SELECT vid, " +
    "SUM(CAST(round(x * x * 1e12, 0) AS BIGINT)) " +
    "AS dvv FROM v GROUP BY vid) " +
    "SELECT CAST(a.code AS BIGINT) AS cluster, " +
    "CAST(COUNT(*) AS BIGINT) AS n_members, " +
    "round(CAST(SUM(w.dvv - 2 * d.dvc + s.dcc) AS DOUBLE) / 1e12, 6) " +
    "AS inertia " +
    "FROM asg4 a JOIN dvc4 d ON a.vid = d.vid AND a.code = d.code " +
    "JOIN dcc4 s ON s.code = a.code JOIN dvv w ON w.vid = a.vid " +
    "GROUP BY a.code ORDER BY cluster"


  val oracles: Map[String, String] = Map(
    "x134_kmeans" -> KmeansSql,
    "x174_silhouette" -> SilhouetteSql,
    "l8_centroids" ->
      ("SELECT label, d AS dim, " +
       "CAST(SUM(CAST(CAST(embedding[d+1] AS DOUBLE) AS DECIMAL(18,8))) AS DOUBLE)" +
       "/COUNT(*) AS mean_v, COUNT(*) AS n_vecs " +
       "FROM embeddings CROSS JOIN " +
       "(SELECT CAST(range AS BIGINT) AS d FROM range(0, 64)) r " +
       "GROUP BY label, d ORDER BY label, dim"))
}
