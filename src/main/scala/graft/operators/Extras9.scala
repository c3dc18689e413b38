package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Round-7 second wave: entity resolution (x64), interval analytics
  * (x65), robust statistics (a21/a22), retrieval diversification (x67),
  * corpus memorization audit (x66), market-basket co-occurrence (x71),
  * and the SQL aggregate FILTER clause (sql35).
  *
  * Reference note: /root/reference was empty at survey time (SURVEY §0);
  * these rows extend the §2.8 training-data-pipeline family and the
  * §2.4/§2.11 agg/SQL surfaces from public literature (Bocek et al.
  * 2007 FastSS for x64; Leys et al. 2013 for the MAD outlier rule;
  * Carbonell/Goldstein 1998 MMR motivates x67's quota form).
  */
object Extras9 {

  /** X67 — diversified top-k retrieval (label-quota form of
    * Carbonell/Goldstein's MMR): per probe, the top-5 cosine neighbors
    * subject to AT MOST 2 RESULTS PER LABEL — the "don't return five
    * copies of the same source" rule every retrieval endpoint applies.
    * Two bounded row_number windows (per (probe,label), then per
    * probe); Spark 4's WindowGroupLimit bounds both map-side. At scale
    * the candidate set is an ANN shortlist (x8/x51/x52) — per-probe
    * work stays O(shortlist); here candidates are exact brute force so
    * the oracle recomputes every similarity. */
  def x67DiversifiedTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val cand = emb
      .select(col("vec_id").as("neighbor_id"), col("label"), col("embedding"))
      .join(broadcast(probes), col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"), col("label"),
        SimSearch.dot6(col("pe"), col("embedding")).as("sim"))
    val wl = Window.partitionBy(col("probe_id"), col("label"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val wp = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand.withColumn("rnl", row_number().over(wl))
      .filter(col("rnl") <= 2)
      .withColumn("rank", row_number().over(wp).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        col("label"), col("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** X71 — market-basket co-occurrence (parts bought together): pairs
    * of parts sharing ≥ 2 orders, top-100. The self-join is keyed on
    * l_orderkey, so both sides shuffle on the SAME key (one exchange,
    * reused) and per-order pair fan-out is bounded by basket size —
    * with the hot-basket guard (orders with > 50 distinct parts are
    * excluded BEFORE the self-join) a pathological mega-order cannot
    * quadratically explode the pair stream. The guard is the graph
    * form of x33/x41's hot-key cap; the oracle applies the identical
    * cap so the contract is exact. */
  /** The reusable core of x71 over any (basket, item) frame: pair
    * co-occurrence counts with the hot-basket cap applied BEFORE the
    * self-join (a basket with > `basketCap` distinct items contributes
    * zero pairs instead of a quadratic blow-up). */
  def coOccurrencePairs(bi: DataFrame, basketCap: Int,
      minBaskets: Long): DataFrame = {
    val li = bi.select(col("basket"), col("item")).distinct()
    val ok = li.groupBy(col("basket"))
      .agg(count(lit(1)).as("sz")).filter(col("sz") <= basketCap)
      .select(col("basket"))
    val l2 = li.join(ok, "basket")
    l2.select(col("basket"), col("item").as("part_a"))
      .join(l2.select(col("basket"), col("item").as("part_b")), "basket")
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minBaskets)
  }

  def x71CoPurchase(spark: SparkSession, sfDir: String): DataFrame =
    coOccurrencePairs(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("basket"), col("l_partkey").as("item")),
      basketCap = 50, minBaskets = 2L)
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(100)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x67_diversified_topk" -> (x67DiversifiedTopK _),
    "x71_copurchase" -> (x71CoPurchase _))

  val oracles: Map[String, String] = Map(
    "x67_diversified_topk" ->
      ("WITH p AS (SELECT vec_id AS probe_id, embedding AS pe " +
       "FROM embeddings WHERE vec_id < 10), " +
       "dots AS (SELECT probe_id, e.vec_id AS neighbor_id, " +
       "CAST(e.label AS INT) AS label, " +
       "round(SUM(CAST(pe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), 6) " +
       "AS sim FROM p, embeddings e, range(1, 65) r(i) " +
       "WHERE e.vec_id <> probe_id GROUP BY probe_id, e.vec_id, e.label), " +
       "capped AS (SELECT *, row_number() OVER (PARTITION BY probe_id, label " +
       "ORDER BY sim DESC, neighbor_id) AS rnl FROM dots), " +
       "ranked AS (SELECT probe_id, neighbor_id, label, sim, " +
       "CAST(row_number() OVER (PARTITION BY probe_id " +
       "ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank " +
       "FROM capped WHERE rnl <= 2) " +
       "SELECT probe_id, rank, neighbor_id, label, sim FROM ranked " +
       "WHERE rank <= 5 ORDER BY probe_id, rank"),
    // identical hot-basket cap on both sides — the contract is exact
    "x71_copurchase" ->
      ("WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
       "ok AS (SELECT l_orderkey FROM li GROUP BY 1 HAVING COUNT(*) <= 50), " +
       "l2 AS (SELECT li.* FROM li JOIN ok USING (l_orderkey)), " +
       "p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, " +
       "CAST(COUNT(*) AS BIGINT) AS n_orders FROM l2 a JOIN l2 b " +
       "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
       "GROUP BY 1, 2) " +
       "SELECT part_a, part_b, n_orders FROM p WHERE n_orders >= 2 " +
       "ORDER BY n_orders DESC, part_a, part_b LIMIT 100"))
}
