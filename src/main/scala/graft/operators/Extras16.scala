package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 sixth wave — game-theoretic attribution, engagement
  * stickiness, frequent itemsets beyond pairs, and ranking-quality
  * ground truth: exact Shapley channel credit (the principled answer
  * to x73/x116's heuristic attribution), DAU/WAU/MAU stickiness (the
  * engagement ratio every growth team tracks), Apriori 3-itemsets
  * (candidate-pruned, the scale-safe step past x142's pairs), and
  * exact ROC-AUC/Gini via score-domain rank counts (the threshold-free
  * complement of x152's calibration).
  *
  * Exactness: x158/x160 are all-integer end to end (Shapley weights
  * enter as the factorial integers of the 4!-scaled form); x159/x161
  * close with single IEEE divisions on exact integer counts.
  */
object Extras16 {

  // ---------------------------------------------------------------- x160

  /** X160 — frequent 3-itemsets via the Apriori candidate step
    * (Agrawal VLDB'94): triples of parts co-bought by ≥ 2 capped
    * CUSTOMER baskets (x144's basket grain — order-grain triples thin
    * out as the part keyspace grows with SF), top-20 by support. The
    * step past x142's pairs, and the one where naive enumeration dies
    * at scale: C(64,3) ≈ 42k triples per worst-case basket vs 2k
    * pairs.
    *
    * Scale shape — Apriori pruning PLUS the x33 hot-key split, because
    * candidate generation ((a,b)⋈(a,c)) is a pairwise self-join on the
    * pair table's first element and a hyper-popular item makes that
    * one key quadratic. Items are split by pair-degree: COLD items
    * (deg ≤ 64 — the overwhelming majority; 29 of 19k items are hot
    * at sf0.1) take the candidate path — degree-bounded self-join,
    * closure check against all frequent pairs, then three
    * semi-join-shaped verification probes. HOT items skip candidates
    * entirely: their triples are support-counted basket-locally, where
    * the 64-item basket cap bounds every join key regardless of item
    * popularity. Both branches are exact; the union is the full
    * answer — nothing is dropped, the split only changes WHICH bounded
    * plan counts each triple. The basket table is never globally
    * triple-self-joined (the oracle does exactly that: same answer,
    * cubic-vs-pruned different plan). */
  def x160Apriori3(spark: SparkSession, sfDir: String): DataFrame = {
    val capped = Extras13.custBasketsShared(spark, sfDir)
    val freq = capped.groupBy(col("item")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("item"))
    val fi = capped.join(freq, "item")
      .select(col("basket"), col("item"))
    val pairs = Extras13.custPairs2Shared(spark, sfDir)
      .select(col("part_a"), col("part_b"))
    val hot = pairs.groupBy(col("part_a")).agg(count(lit(1)).as("d"))
      .filter(col("d") > 64).select(col("part_a").as("hi"))
    val cold = pairs.join(broadcast(hot), col("part_a") === col("hi"),
      "left_anti")
    val cand = cold.select(col("part_a").as("i1"), col("part_b").as("i2"))
      .join(cold.select(col("part_a").as("i1"), col("part_b").as("i3")),
        "i1")
      .filter(col("i2") < col("i3"))
      .join(pairs.select(col("part_a").as("i2"), col("part_b").as("i3")),
        Seq("i2", "i3"), "left_semi")
    val coldTri = cand
      .join(fi.select(col("basket"), col("item").as("i1")), "i1")
      .join(fi.select(col("basket"), col("item").as("i2")),
        Seq("basket", "i2"))
      .join(fi.select(col("basket"), col("item").as("i3")),
        Seq("basket", "i3"))
      .groupBy(col("i1"), col("i2"), col("i3"))
      .agg(count(lit(1)).as("support"))
    val hotTri = fi.join(broadcast(hot), col("item") === col("hi"))
      .select(col("basket"), col("item").as("i1"))
      .join(fi.select(col("basket"), col("item").as("i2")), "basket")
      .filter(col("i2") > col("i1"))
      .join(fi.select(col("basket"), col("item").as("i3")), "basket")
      .filter(col("i3") > col("i2"))
      .groupBy(col("i1"), col("i2"), col("i3"))
      .agg(count(lit(1)).as("support"))
    coldTri.unionByName(hotTri)
      .filter(col("support") >= 2)
      .orderBy(col("support").desc, col("i1"), col("i2"), col("i3"))
      .limit(20)
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x160_apriori3" -> (x160Apriori3 _))

  private val Apriori3Sql: String =
    "WITH li AS MATERIALIZED (SELECT DISTINCT o_custkey AS basket, " +
    "l_partkey AS item FROM lineitem " +
    "JOIN orders ON l_orderkey = o_orderkey), " +
    "ok AS (SELECT basket FROM li GROUP BY basket " +
    "HAVING COUNT(*) <= 64), " +
    "c AS MATERIALIZED (SELECT li.basket, li.item FROM li " +
    "JOIN ok USING (basket)) " +
    "SELECT a.item AS i1, b.item AS i2, c2.item AS i3, " +
    "CAST(COUNT(*) AS BIGINT) AS support " +
    "FROM c a JOIN c b ON b.basket = a.basket AND b.item > a.item " +
    "JOIN c c2 ON c2.basket = a.basket AND c2.item > b.item " +
    "GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2 " +
    "ORDER BY support DESC, i1, i2, i3 LIMIT 20"

  val oracles: Map[String, String] = Map(
    "x160_apriori3" -> Apriori3Sql)
}
