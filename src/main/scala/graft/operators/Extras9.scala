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

  /** X64 — fuzzy entity-resolution join with GUARANTEED-RECALL blocking
    * (FastSS deletion neighborhoods, Bocek et al. 2007): a "dirty" feed
    * of customer names (every 10th name with one key-dependent digit
    * deleted — the corruption is itself derived deterministically, so
    * both engines stage identical inputs) matched back to the master
    * list under edit distance ≤ 1.
    *
    * Candidate lemma: lev(a,b) ≤ 1 ⟹ U(a) ∩ U(b) ≠ ∅ where
    * U(x) = {x} ∪ {x minus one char} — equality is trivial, a
    * substitution meets at the both-sides deletion, and a deletion IS
    * an element of the longer side's neighborhood. So the variant
    * equi-join is a complete candidate generator (unlike first-token
    * or soundex blocking, which silently lose recall), and the exact
    * `levenshtein` verify restores precision. Cost: each side explodes
    * to |s|+1 variant rows (19 here) — a bounded, shuffle-friendly
    * blow-up an exhaustive O(n·m) cross join never is. The oracle IS
    * the exhaustive cross join, so recall and precision are both
    * hash-checked. */
  /** The reusable core of x64: all (dirty, clean) pairs within edit
    * distance 1, via the complete 1-deletion-neighborhood candidate
    * generator + exact verify. Input frames carry (key, name) columns
    * named per the arguments. */
  def fuzzyJoinDist1(dirty: DataFrame, clean: DataFrame): DataFrame = {
    def variants(df: DataFrame, nameCol: String): DataFrame =
      df.withColumn("variant", explode(expr(
        s"array_distinct(concat(array($nameCol), " +
          s"transform(sequence(1, length($nameCol)), " +
          s"i -> concat(substr($nameCol, 1, i - 1), substr($nameCol, i + 1)))))")))
    variants(dirty, "dirty_name")
      .join(variants(clean, "clean_name"), "variant")
      .select(col("dirty_key"), col("clean_key"), col("dirty_name"),
        col("clean_name"))
      .distinct()
      // threshold form: the DP abandons a row pair as soon as the
      // distance provably exceeds 1 (returns -1), so verify cost per
      // candidate is O(len) instead of O(len²)
      .withColumn("lev",
        levenshtein(col("dirty_name"), col("clean_name"), 1))
      .filter(col("lev") >= 0)
      .select(col("dirty_key"), col("clean_key"), col("lev"))
  }

  def x64FuzzyJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cust = Tables.customer(s, sfDir)
    val clean = cust.select(col("c_custkey").as("clean_key"),
      col("c_name").as("clean_name"))
    val dirty = cust.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey").as("dirty_key"),
        expr("concat(substr(c_name, 1, 9 + c_custkey % 9), " +
          "substr(c_name, 11 + c_custkey % 9))").as("dirty_name"))
    fuzzyJoinDist1(dirty, clean)
      .orderBy(col("dirty_key"), col("clean_key"))
  }

  /** X66 — repeated-span audit (the memorization-risk report a
    * training-data review reads): the 50 most-shared 8-gram spans
    * across distinct documents, with document and occurrence counts.
    * One vocabulary-keyed aggregate over the shingle stream (identical
    * scale shape to x61's first-seen index — hot spans aggregate, never
    * join-explode), then a distributed top-k (TakeOrderedAndProject)
    * under the total order (n_docs desc, n_occur desc, ngram). */
  def x66RepeatedSpans(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.ngrams(spark, sfDir, 8)
      .groupBy(col("ngram"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occur"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occur").desc, col("ngram"))
      .limit(50)

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
    "x64_fuzzy_join" -> (x64FuzzyJoin _),
    "x66_repeated_spans" -> (x66RepeatedSpans _),
    "x67_diversified_topk" -> (x67DiversifiedTopK _),
    "x71_copurchase" -> (x71CoPurchase _))

  val oracles: Map[String, String] = Map(
    // the exhaustive recompute: every (dirty, clean) pair's true edit
    // distance — recall of the deletion-neighborhood blocking AND
    // precision of the verify are both hash-checked
    "x64_fuzzy_join" ->
      ("WITH dirty AS (SELECT c_custkey AS dirty_key, " +
       "substr(c_name, 1, 9 + c_custkey % 9) || " +
       "substr(c_name, 11 + c_custkey % 9) AS dirty_name " +
       "FROM customer WHERE c_custkey % 10 = 0) " +
       "SELECT d.dirty_key, c.c_custkey AS clean_key, " +
       "CAST(levenshtein(d.dirty_name, c.c_name) AS INT) AS lev " +
       "FROM dirty d CROSS JOIN customer c " +
       "WHERE levenshtein(d.dirty_name, c.c_name) <= 1 " +
       "ORDER BY dirty_key, clean_key"),
    "x66_repeated_spans" ->
      (s"SELECT ngram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, " +
       "CAST(COUNT(*) AS BIGINT) AS n_occur " +
       s"FROM (${TextOps.ngramSql(8)}) t GROUP BY ngram " +
       "HAVING COUNT(DISTINCT doc_id) >= 2 " +
       "ORDER BY n_docs DESC, n_occur DESC, ngram LIMIT 50"),
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
