package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Det, Tables}

/** Round-9 wave: the SQL-text DML surface (INSERT INTO VALUES / INSERT
  * INTO SELECT / INSERT OVERWRITE, CREATE TABLE AS SELECT) — the
  * reference's insert-oriented core capability (SURVEY §1.1 [PK-high])
  * exercised through actual SQL statements against catalog parquet
  * tables, not only through `createDataFrame` (S6) — plus the round-9
  * analytics additions.
  */
object Extras12 {


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

  /** X172b core: classify verified near-dup pairs against a top-2
    * cluster assignment — the recall guard of the SemDeDup family
    * (VERDICT r10 #1, the x48b/x63b pattern at the semantic tier).
    * `n_straddling` is the loss x172/x173/st26 documentedly accept
    * (pairs whose endpoints land in different clusters never become
    * candidates), now emitted AS DATA instead of scaladoc;
    * `n_recovered_top2` is how many of those a top-2 multi-probe
    * assignment (the standard IVF trick) would bring back in scope.
    * One pair-sized frame joined twice to the corpus-sized assignment
    * — no pair work beyond what x41 already verified. */
  private[operators] def straddleGuardFromPairs(pairs: DataFrame,
      top2: DataFrame): DataFrame = {
    val a = top2.select(col("vid").as("id_a"), col("c1").as("a1"),
      col("c2").as("a2"))
    val b = top2.select(col("vid").as("id_b"), col("c1").as("b1"),
      col("c2").as("b2"))
    val straddle = col("a1") =!= col("b1")
    val recovered = straddle && (col("a1") === col("b2") ||
      col("a2") === col("b1") || col("a2") === col("b2"))
    pairs.join(a, "id_a").join(b, "id_b")
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(when(!straddle, 1L).otherwise(0L)), lit(0L))
          .as("n_within"),
        coalesce(sum(when(straddle, 1L).otherwise(0L)), lit(0L))
          .as("n_straddling"),
        coalesce(sum(when(recovered, 1L).otherwise(0L)), lit(0L))
          .as("n_recovered_top2"))
  }

  /** Public column-parameterized face of the x172b guard: band the
    * corpus (the x41 machinery), train the same k-means x172 trains,
    * and report total / within-cluster / straddling / top-2-recovered
    * pair counts. */
  def semDedupStraddleGuard(corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int, threshold: Double,
      numBands: Int = 8, dims: Int = 64): DataFrame =
    straddleGuardFromPairs(
      graft.api.VectorPipeline.bandedCosinePairs(corpus, idCol, vecCol,
        threshold, numBands, dims),
      kmeansAssignTop2(corpus, idCol, vecCol, k, iters))

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

  // ---------------------------------------------------------------- x172

  /** X172 — SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    * deduplication as the paper's composition — k-means partitions the
    * embedding corpus ([[kmeansAssignments]], the x134 deterministic
    * trainer at k=8/3 rounds), near-duplicate pairs are then found
    * ONLY within clusters
    * ([[graft.api.VectorPipeline.groupedCosinePairs]]), and a vector
    * drops iff it has a same-cluster near-dup with a smaller id
    * (first-occurrence-wins, the x42 rule). Runs on the x41/x42 clone
    * corpus (planted cos ≈ 0.94 clones) so the row is non-vacuous on
    * this near-orthogonal test corpus.
    *
    * This is the missing rung between x41 (corpus-wide banded dedup)
    * and a 100 TB semantic dedup: pair work is bounded per cluster —
    * each cluster dedups independently, so a 1000-executor run
    * processes clusters in parallel and no pair candidate ever
    * crosses a cluster boundary — at the documented cost that
    * CROSS-CLUSTER near-dups are out of scope (the paper's trade;
    * the spec plants a straddling pair and pins the exclusion).
    * Output is staged cross-process like the rest of the artifact
    * tier. Oracle: the x134 Lloyd CTE chain over the clone corpus +
    * an exhaustive within-cluster pair recompute. */
  def x172SemDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.stagedFrame(spark, "semdedup", sfDir, "embeddings",
        "k8i3_t08") {
      // delegates to the public column-parameterized kernel (round 11)
      graft.api.Curation.semDedup(Extras5.cloneCorpus(spark, sfDir),
          "vec_id", "embedding", k = 8, iters = 3, threshold = 0.8)
        .withColumnRenamed("id", "vec_id")
    }.orderBy(col("vec_id"))


  // ---------------------------------------------------------------- x138

  /** X138 — pareto frontier (skyline; Börzsönyi ICDE'01): the customers
    * no other customer dominates on (order count, total spend) — the
    * "best tradeoff" shortlist every multi-objective report wants
    * (catalog picks by price-vs-rating, model picks by cost-vs-quality).
    * Dominance: q beats p when q is ≥ on both axes and > on at least
    * one; equal points are mutually non-dominating, so every customer
    * on a non-dominated point ships.
    *
    * Scale shape: the corpus is NEVER pairwise-compared. Skyline
    * membership for 2-D reduces to per-x structure — a point survives
    * iff its y is its x-group's max AND strictly exceeds every
    * higher-x group's max — so the plan is one grouped aggregate to the
    * distinct-x table (bounded by the x domain, order counts here),
    * a prefix-max over THAT aggregate (spelled as a bounded theta
    * join, not a single-partition window), and one equi-join back.
    * The full-table NOT-EXISTS O(n²) form survives only as the oracle.
    * Both axes are exact (an integer count and a raw stored MAX — were
    * an axis a float SUM, "equal on one axis" would be summation-order
    * dependent; use a DECIMAL total instead). For an unbounded x
    * domain, equi-width bucket x first and refine inside the boundary
    * bucket — same plan, one more level. */
  def x138Pareto(spark: SparkSession, sfDir: String): DataFrame = {
    // axes chosen for a REAL tradeoff: order count vs the customer's
    // single largest order (count-vs-spend degenerates — the most
    // frequent customer nearly always also has the top total, and the
    // frontier collapses to one row at every SF). best_order is a raw
    // MAX of stored values — no arithmetic, so dominance ties compare
    // exactly in both engines with no decimal policy needed.
    val pts = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        max(col("o_totalprice")).as("best_order"))
    paretoFrontier(pts, "n_orders", "best_order")
      .select(col("o_custkey").cast("long").as("o_custkey"),
        col("n_orders"), col("best_order"))
      .orderBy(col("n_orders").desc, col("o_custkey"))
  }

  /** The 2-D maximize-both skyline core; exposed for the spec's brute
    * cross-check. Keeps every input column of the surviving rows. */
  def paretoFrontier(pts: DataFrame, x: String, y: String): DataFrame = {
    val best = pts.groupBy(col(x)).agg(max(col(y)).as("__besty"))
    val hi = best.select(col(x).as("__qx"), col("__besty").as("__qy"))
    // prefix-max over the distinct-x aggregate: for each x, the best y
    // among STRICTLY larger x (null when none) — a theta join of two
    // aggregate-bounded frames, broadcastable by construction
    val runmax = best.join(hi, col("__qx") > col(x), "left")
      .groupBy(col(x), col("__besty"))
      .agg(max(col("__qy")).as("__runmax"))
    pts.join(runmax, Seq(x))
      .filter(col(y) === col("__besty") &&
        (col("__runmax").isNull || col(y) > col("__runmax")))
      .drop("__besty", "__runmax")
  }

  // ---------------------------------------------------------------- x139

  /** X139 — incremental maintenance of a JOIN-aggregate view under a
    * CDC feed (the delta-join rule ΔV = γ(ΔO ⋈ C) merged into V —
    * x113's retraction algebra extended across a join): the per-nation
    * (count, revenue) MV over orders ⋈ customer is maintained under
    * order UPDATES (key % 7 = 0: price restated +50.00, emitted as
    * retraction + insertion) and DELETES (key % 11 = 0: retraction
    * only; delete wins on overlap, x113's rule).
    *
    * The IVM point this row adds over x113: delta rows don't carry
    * their group key — each must be ENRICHED against the dimension to
    * find its nation. The maintenance plan is delta ⋈ broadcast(dim)
    * (delta-sized, the streaming-fact enrichment shape), one grouped
    * signed aggregate, one full-outer merge into the base MV; the
    * base join is NEVER rescanned and groups retracted to zero are
    * dropped. The oracle recomputes the view from the corrected order
    * set, value-checking the whole algebra. */
  def x139JoinIvm(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"),
      col("o_custkey"), col("o_totalprice").cast(Det.Money).as("price"))
    val dim = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
    maintainJoinAggMv(o, dim)
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        col("n"), col("t").cast("double").as("total"))
      .orderBy(col("c_nationkey"))
  }

  /** The delta-join maintenance core over an (o_orderkey, o_custkey,
    * price DECIMAL) fact and a (c_custkey, c_nationkey) dimension;
    * returns the maintained (c_nationkey, n, t) MV. Exposed for
    * spec-level group-drop checks on planted data. */
  def maintainJoinAggMv(o: DataFrame, dim: DataFrame): DataFrame = {
    val base = o.join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("price")).as("total"))
    val touched = o.filter(col("o_orderkey") % 7 === 0 ||
      col("o_orderkey") % 11 === 0)
    val retract = touched.select(col("o_custkey"), lit(-1L).as("m"),
      col("price"))
    val insert = touched.filter(col("o_orderkey") % 11 =!= 0)
      .select(col("o_custkey"), lit(1L).as("m"),
        (col("price") + lit(50.00).cast(Det.Money)).as("price"))
    val delta = retract.unionByName(insert)
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("m")).as("dn"), sum(col("m") * col("price")).as("dt"))
    base.join(delta, Seq("c_nationkey"), "full_outer")
      .select(col("c_nationkey"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n"),
        (coalesce(col("total"), lit(0).cast(Det.Money)) +
          coalesce(col("dt"), lit(0).cast(Det.Money))).as("t"))
      .filter(col("n") > 0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x134_kmeans" -> (x134Kmeans _),
    "x138_pareto" -> (x138Pareto _),
    "x139_join_ivm" -> (x139JoinIvm _),
    "x172_semdedup" -> (x172SemDedup _),
    "x174_silhouette" -> (x174Silhouette _))

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

  /** The x172 oracle: the [[KmeansSql]] Lloyd chain re-rooted on the
    * x41 clone corpus (v applies the sign-flip term per dimension),
    * then an EXHAUSTIVE within-cluster pair recompute at the x41
    * rounding spelling and the first-wins keep rule. Heavy CTEs are
    * MATERIALIZED (the k-core inlining lesson): v and the chain feed
    * many references, and `pr` must not re-expand the whole Lloyd
    * chain per side. */
  private[operators] val SemDedupChainSql: String = {
    val tA = Extras5.cloneDotTerm("a")
    val tB = Extras5.cloneDotTerm("b")
    "base AS MATERIALIZED (" + Extras5.CloneBaseSql + "), " +
    "v AS MATERIALIZED (SELECT b0.vec_id AS vid, i - 1 AS d, " +
    Extras5.cloneDotTerm("b0") + " AS x FROM base b0, range(1, 65) r(i)), " +
    "seeds AS (SELECT vec_id AS svid, CAST(row_number() OVER " +
    "(ORDER BY vec_id) - 1 AS INT) AS code FROM base " +
    "ORDER BY vec_id LIMIT 8), " +
    "c0 AS (SELECT s.code, v.d, v.x AS c FROM seeds s " +
    "JOIN v ON v.vid = s.svid), " +
    kmIterSql("c0", 1) + ", " + kmIterSql("c1", 2) + ", " +
    kmIterSql("c2", 3) + ", " +
    "dvc4 AS (SELECT v.vid, c.code, " +
    "SUM(CAST(round(v.x * c.c * 1e12, 0) AS BIGINT)) " +
    "AS dvc FROM v JOIN c3 c ON v.d = c.d GROUP BY v.vid, c.code), " +
    "dcc4 AS (SELECT code, SUM(CAST(round(c * c * 1e12, 0) AS BIGINT)) " +
    "AS dcc FROM c3 GROUP BY code), " +
    "asg4 AS MATERIALIZED (SELECT vid, code FROM (SELECT d.vid, d.code, " +
    "row_number() OVER (PARTITION BY d.vid " +
    "ORDER BY (2 * d.dvc - s.dcc) DESC, d.code) AS rn " +
    "FROM dvc4 d JOIN dcc4 s USING (code)) t WHERE rn = 1), " +
    "bc AS MATERIALIZED (SELECT b0.vec_id, b0.embedding, b0.aug, g.code " +
    "FROM base b0 JOIN asg4 g ON g.vid = b0.vec_id), " +
    "pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b " +
    "FROM bc a, bc b, range(1, 65) r(i) " +
    "WHERE a.code = b.code AND a.vec_id < b.vec_id " +
    "GROUP BY a.vec_id, b.vec_id " +
    s"HAVING round(SUM($tA * $tB), 6) >= 0.8), " +
    "drp AS (SELECT DISTINCT id_b FROM pr)"
  }

  private val SemDedupSql: String =
    "WITH " + SemDedupChainSql + " " +
    "SELECT g.vid AS vec_id, CAST(g.code AS BIGINT) AS cluster, " +
    "(d.id_b IS NULL) AS kept " +
    "FROM asg4 g LEFT JOIN drp d ON d.id_b = g.vid ORDER BY vec_id"


  val oracles: Map[String, String] = Map(
    "x134_kmeans" -> KmeansSql,
    "x172_semdedup" -> SemDedupSql,
    "x174_silhouette" -> SilhouetteSql,
    // the corrected order set restated from scratch — the IVM algebra
    // (retraction, delta-join enrichment, group drop) is value-checked
    "x139_join_ivm" ->
      ("WITH corrected AS MATERIALIZED (SELECT o_orderkey, o_custkey, " +
       "CASE WHEN o_orderkey % 7 = 0 " +
       "THEN CAST(o_totalprice AS DECIMAL(18,4)) + 50.00 " +
       "ELSE CAST(o_totalprice AS DECIMAL(18,4)) END AS price " +
       "FROM orders WHERE o_orderkey % 11 <> 0) " +
       "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, " +
       "CAST(COUNT(*) AS BIGINT) AS n, " +
       "CAST(SUM(price) AS DOUBLE) AS total " +
       "FROM corrected JOIN customer ON o_custkey = c_custkey " +
       "GROUP BY c_nationkey ORDER BY c_nationkey"),
    // deliberately the textbook O(n²) NOT-EXISTS dominance predicate —
    // a formulation with nothing in common with the prefix-max plan
    "x138_pareto" ->
      ("WITH p AS MATERIALIZED (SELECT o_custkey, " +
       "CAST(COUNT(*) AS BIGINT) AS n_orders, " +
       "CAST(MAX(o_totalprice) AS DOUBLE) AS best_order " +
       "FROM orders GROUP BY o_custkey) " +
       "SELECT CAST(o_custkey AS BIGINT) AS o_custkey, n_orders, " +
       "best_order FROM p " +
       "WHERE NOT EXISTS (SELECT 1 FROM p q " +
       "WHERE q.n_orders >= p.n_orders AND q.best_order >= p.best_order " +
       "AND (q.n_orders > p.n_orders OR q.best_order > p.best_order)) " +
       "ORDER BY n_orders DESC, o_custkey"))
}
