package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** MARKET-BASKET / SEQUENCE-MINING theme module (round 11 — the
  * ExtrasN naming-debt retirement, VERDICT r10 #7): the co-occurrence
  * miners over order baskets and event streams, moved verbatim from
  * Extras9/13/16. All pair/triple generation flows through the capped
  * shared basket tables (a mega-basket cannot explode the pair
  * stream; the caps are the PlanLint self-join bound) and the staged
  * cross-process pair artifact — never an uncapped self-join.
  *
  * Rows: x71 co-purchase pairs, x142 association rules, x143 Markov
  * transitions, x144 item-item CF, x160 3-itemset Apriori.
  */
object BasketOps {

  import Det.{sql => d}

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
      minBaskets: Long): DataFrame =
    pairsFromCapped(cappedBaskets(bi, basketCap), minBaskets)

  /** The distinct (basket, item) frame with the hot-basket cap applied
    * (round-16 refactor: the capped frame and the pair generation are
    * separable so shared memos can reuse each stage). */
  private[operators] def cappedBaskets(bi: DataFrame,
      basketCap: Int): DataFrame = {
    val li = bi.select(col("basket"), col("item")).distinct()
    val ok = li.groupBy(col("basket"))
      .agg(count(lit(1)).as("sz")).filter(col("sz") <= basketCap)
      .select(col("basket"))
    li.join(ok, "basket")
  }

  private[operators] def pairsFromCapped(l2: DataFrame,
      minBaskets: Long): DataFrame =
    l2.select(col("basket"), col("item").as("part_a"))
      .join(l2.select(col("basket"), col("item").as("part_b")), "basket")
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minBaskets)

  /** The capped (≤50 distinct parts) ORDER-basket frame, built once per
    * (session, corpus) — round-16 optimization: x71 and x142 each
    * rebuilt this distinct + cap + join (x142 twice: once inline for
    * supports, once inside its pair call); one lineage-cut memo now
    * serves every consumer, exactly like the customer-grain
    * [[custBasketsShared]] below. */
  private[graft] def orderBasketsShared(spark: SparkSession,
      sfDir: String): DataFrame =
    graft.Memo(spark, s"order_baskets:$sfDir") {
      graft.Checkpoints.cut(cappedBaskets(
        Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("basket"),
            col("l_partkey").as("item")), basketCap = 50))
    }

  /** Pair supports at the shared ≥2 lower bound over the shared order
    * baskets (round-16): x71 reads it outright, x142 filters to its ≥3
    * operating point — the expensive basket self-join runs once per
    * session instead of twice. */
  private[graft] def orderPairs2Shared(spark: SparkSession,
      sfDir: String): DataFrame =
    graft.Memo(spark, s"order_pairs2:$sfDir") {
      graft.Checkpoints.cut(
        pairsFromCapped(orderBasketsShared(spark, sfDir), minBaskets = 2L))
    }

  def x71CoPurchase(spark: SparkSession, sfDir: String): DataFrame =
    orderPairs2Shared(spark, sfDir)
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(100)

  // ---------------------------------------------------------------- x142

  /** X142 — association rules (Agrawal SIGMOD'93: support, confidence,
    * lift) over order baskets: both directed rules for every part pair
    * co-bought in ≥ 3 qualifying baskets, top-20 by lift — the
    * "customers who bought A also bought B" readout with the
    * statistics that separate real affinity from popularity.
    *
    * Reuses x71's coOccurrencePairs core (basket cap 50 applied BEFORE
    * the self-join, so a mega-order cannot explode the pair stream);
    * item supports come off the SAME capped basket set, so
    * support/confidence/lift are mutually consistent. All three
    * ratios are single IEEE divisions of exact BIGINT products,
    * rounded to 6 dp — no float accumulation anywhere. */
  def x142AssocRules(spark: SparkSession, sfDir: String): DataFrame = {
    // round 16: supports, basket count, and pairs all come off the
    // SHARED capped order-basket memo (x71's frame) — the ≥3 pair set
    // is exactly the shared ≥2 set filtered, and the qualifying-basket
    // count is the capped frame's distinct baskets (identical to the
    // pre-r16 inline ok-count by construction).
    val capped = orderBasketsShared(spark, sfDir)
    val nBaskets = capped.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_total"))
    val itemN = capped.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairs = orderPairs2Shared(spark, sfDir)
      .filter(col("n_orders") >= 3L)
    val rules = pairs.select(col("part_a").as("antecedent"),
        col("part_b").as("consequent"), col("n_orders").as("n_both"))
      .unionByName(pairs.select(col("part_b").as("antecedent"),
        col("part_a").as("consequent"), col("n_orders").as("n_both")))
    rules
      .join(itemN.select(col("item").as("antecedent"),
        col("n_item").as("n_ante")), "antecedent")
      .join(itemN.select(col("item").as("consequent"),
        col("n_item").as("n_cons")), "consequent")
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("n_both"),
        col("n_ante"), col("n_cons"),
        round(col("n_both").cast("double") / col("n_ante"), 6).as("conf"),
        round((col("n_both") * col("n_total")).cast("double") /
          (col("n_ante") * col("n_cons")).cast("double"), 6).as("lift"))
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
      .limit(20)
  }

  // ---------------------------------------------------------------- x143

  /** X143 — the event-type Markov transition matrix: for every ordered
    * (from → to) pair of consecutive events WITHIN a user's stream,
    * the transition count and probability — the first-order behavioral
    * model product analytics fits before anything fancier (and the
    * input to x103's path mining read as a chain).
    *
    * Plan: one lead() window PARTITIONED BY user (per-user sorts,
    * never a global one), one grouped count, and the per-source
    * normalization rides a window over the ≤|type-domain| aggregate —
    * sorting cost is per-user and the output is domain-bounded
    * (|types|² rows), so the operator's scale is the scan, not the
    * matrix. Probabilities are single divisions of exact counts. */
  def x143Markov(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.eventsUs(spark, sfDir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = ev
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    trans
      .withColumn("n_from",
        sum(col("n_trans")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        round(col("n_trans").cast("double") / col("n_from"), 6).as("prob"))
      .orderBy(col("from_type"), col("to_type"))
  }

  // ---------------------------------------------------------------- x144

  /** X144 — item-item collaborative filtering (Sarwar WWW'01): cosine
    * similarity between parts over their DISTINCT-CUSTOMER purchase
    * sets (binary ratings), top-20 pairs — the "similar items" model
    * behind every recommendation shelf. Differs from x142's basket
    * rules in grain (a customer's whole history, not one order) and
    * metric (symmetric cosine, not directed confidence).
    *
    * sim(a,b) = n_ab / √(n_a·n_b) — one integer product, one IEEE
    * sqrt (correctly rounded by the 754 contract in both engines),
    * one division, round 6 dp. Pair generation reuses
    * coOccurrencePairs keyed by customer with a 64-part history cap —
    * sized to the self-join lint bound, so the hottest basket bucket
    * provably fits one task (same visible-guard pattern as x71/x33). */
  /** The capped (≤64 distinct parts) customer-basket frame, built once
    * per (session, corpus): x144's item-item CF and x160's Apriori
    * triples read the SAME basket grain, so the lineitem⋈orders
    * distinct + cap shuffles run once per pass (on a cluster this is
    * the persisted `customer_baskets` staging table both jobs scan). */
  def custBasketsShared(spark: SparkSession, sfDir: String): DataFrame =
    graft.Memo(spark, s"cust_baskets:$sfDir") {
      val cp = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey").as("item"))
        .join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey").as("basket")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("basket"), col("item"))
        .distinct()
      val ok = cp.groupBy(col("basket")).agg(count(lit(1)).as("sz"))
        .filter(col("sz") <= 64).select(col("basket"))
      graft.Checkpoints.cut(cp.join(ok, "basket"))
    }

  /** Co-occurrence pair supports at the SHARED lower bound (≥2) over
    * the shared customer baskets — the expensive basket self-join,
    * materialized once per session AND staged cross-process (the
    * lpalabels pattern): x144 filters it to its ≥3 operating point,
    * x160 generates triple candidates from it directly, and a later
    * process reloads the pair table outright. On a cluster this is
    * the persisted `item_pair_supports` staging table. */
  def custPairs2Shared(spark: SparkSession, sfDir: String): DataFrame =
    graft.Memo(spark, s"cust_pairs2:$sfDir") {
      val s = Tables.tune(spark)
      val fp = Tables.corpusFingerprint(sfDir, "lineitem") + "|" +
        Tables.corpusFingerprint(sfDir, "orders") + "|custpairs2"
      val home = Tables.sharedDir("custpairs2", sfDir, fp)
      if (!home.isDirectory) {
        val pairs = graft.operators.BasketOps.coOccurrencePairs(
          custBasketsShared(spark, sfDir), basketCap = 64,
          minBaskets = 2L)
        val tmp = Tables.sharedBuildDir(home)
        pairs.write.mode("overwrite").parquet(tmp.getAbsolutePath)
        Tables.publishShared(tmp, home)
      }
      s.read.parquet(home.getAbsolutePath)
    }

  def x144ItemCf(spark: SparkSession, sfDir: String): DataFrame = {
    val capped = custBasketsShared(spark, sfDir)
    val itemN = capped.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    custPairs2Shared(spark, sfDir).filter(col("n_orders") >= 3)
      .select(col("part_a"), col("part_b"), col("n_orders").as("n_both"))
      .join(itemN.select(col("item").as("part_a"),
        col("n_item").as("n_a")), "part_a")
      .join(itemN.select(col("item").as("part_b"),
        col("n_item").as("n_b")), "part_b")
      .select(col("part_a"), col("part_b"), col("n_both"), col("n_a"),
        col("n_b"),
        round(col("n_both").cast("double") /
          sqrt((col("n_a") * col("n_b")).cast("double")), 6).as("sim"))
      .orderBy(col("sim").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  private val AssocSql: String =
    "WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS basket, " +
    "l_partkey AS item FROM lineitem), " +
    "ok AS MATERIALIZED (SELECT basket FROM li GROUP BY basket " +
    "HAVING COUNT(*) <= 50), " +
    "capped AS MATERIALIZED (SELECT li.basket, li.item FROM li " +
    "JOIN ok USING (basket)), " +
    "nb AS (SELECT COUNT(*) AS n_total FROM ok), " +
    "itemn AS MATERIALIZED (SELECT item, COUNT(*) AS n_item " +
    "FROM capped GROUP BY item), " +
    "pairs AS MATERIALIZED (SELECT x.item AS part_a, y.item AS part_b, " +
    "COUNT(*) AS n_both FROM capped x JOIN capped y " +
    "ON x.basket = y.basket AND x.item < y.item " +
    "GROUP BY x.item, y.item HAVING COUNT(*) >= 3), " +
    "rules AS (SELECT part_a AS antecedent, part_b AS consequent, " +
    "n_both FROM pairs UNION ALL " +
    "SELECT part_b, part_a, n_both FROM pairs) " +
    "SELECT CAST(r.antecedent AS BIGINT) AS antecedent, " +
    "CAST(r.consequent AS BIGINT) AS consequent, " +
    "CAST(r.n_both AS BIGINT) AS n_both, " +
    "CAST(ia.n_item AS BIGINT) AS n_ante, " +
    "CAST(ic.n_item AS BIGINT) AS n_cons, " +
    "round(CAST(r.n_both AS DOUBLE) / ia.n_item, 6) AS conf, " +
    "round(CAST(r.n_both * nb.n_total AS DOUBLE) / " +
    "CAST(ia.n_item * ic.n_item AS DOUBLE), 6) AS lift " +
    "FROM rules r JOIN itemn ia ON ia.item = r.antecedent " +
    "JOIN itemn ic ON ic.item = r.consequent CROSS JOIN nb " +
    "ORDER BY lift DESC, antecedent, consequent LIMIT 20"

  private val MarkovSql: String =
    "WITH seq AS (SELECT user_id, event_type AS from_type, " +
    "lead(event_type) OVER (PARTITION BY user_id " +
    "ORDER BY epoch_us(ts), event_id) AS to_type FROM events), " +
    "trans AS (SELECT from_type, to_type, COUNT(*) AS n_trans " +
    "FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type) " +
    "SELECT from_type, to_type, CAST(n_trans AS BIGINT) AS n_trans, " +
    "round(CAST(n_trans AS DOUBLE) / " +
    "SUM(n_trans) OVER (PARTITION BY from_type), 6) AS prob " +
    "FROM trans ORDER BY from_type, to_type"

  private val ItemCfSql: String =
    "WITH cp AS MATERIALIZED (SELECT DISTINCT o_custkey AS basket, " +
    "l_partkey AS item FROM lineitem JOIN orders " +
    "ON l_orderkey = o_orderkey), " +
    "ok AS MATERIALIZED (SELECT basket FROM cp GROUP BY basket " +
    "HAVING COUNT(*) <= 64), " +
    "capped AS MATERIALIZED (SELECT cp.basket, cp.item FROM cp " +
    "JOIN ok USING (basket)), " +
    "itemn AS MATERIALIZED (SELECT item, COUNT(*) AS n_item " +
    "FROM capped GROUP BY item), " +
    "pairs AS MATERIALIZED (SELECT x.item AS part_a, y.item AS part_b, " +
    "COUNT(*) AS n_both FROM capped x JOIN capped y " +
    "ON x.basket = y.basket AND x.item < y.item " +
    "GROUP BY x.item, y.item HAVING COUNT(*) >= 3) " +
    "SELECT CAST(p.part_a AS BIGINT) AS part_a, " +
    "CAST(p.part_b AS BIGINT) AS part_b, " +
    "CAST(p.n_both AS BIGINT) AS n_both, " +
    "CAST(na.n_item AS BIGINT) AS n_a, CAST(nbi.n_item AS BIGINT) AS n_b, " +
    "round(CAST(p.n_both AS DOUBLE) / " +
    "sqrt(CAST(na.n_item * nbi.n_item AS DOUBLE)), 6) AS sim " +
    "FROM pairs p JOIN itemn na ON na.item = p.part_a " +
    "JOIN itemn nbi ON nbi.item = p.part_b " +
    "ORDER BY sim DESC, part_a, part_b LIMIT 20"

  /** Fact-proportional shuffle width for eager basket-table cuts: one
    * partition per ~64 MB of fact parquet, min 8 — grows with the
    * corpus, capped by the session width inside withAqeOff. */
  private def factWidth(sfDir: String): Int = {
    val bytes = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$sfDir/lineitem.parquet"))
    math.max(8L, bytes / (64L << 20)).toInt
  }

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
    val capped = graft.operators.BasketOps.custBasketsShared(spark, sfDir)
    val freq = capped.groupBy(col("item")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("item"))
    // round 17 (guide §2.4): `fi` is referenced FIVE times across the
    // cold and hot triple counts (three verification probes + two
    // hot-branch scans), and Catalyst recomputes the capped⋈freq join
    // (with its aggregate exchange) at every reference — cut it once;
    // the five consumers then scan one materialization. Rows identical
    // by definition. Memoized per (session, corpus): x160 is fi's only
    // consumer, but a re-run in one session must not re-materialize.
    val fi = graft.Memo(spark, s"x160fi:$sfDir") {
      graft.Checkpoints.withAqeOff(spark, factWidth(sfDir)) {
        graft.Checkpoints.cut(
          capped.join(freq, "item").select(col("basket"), col("item")))
      }
    }
    val pairs = graft.operators.BasketOps.custPairs2Shared(spark, sfDir)
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

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x71_copurchase" -> (x71CoPurchase _),
    "x142_assoc_rules" -> (x142AssocRules _),
    "x143_markov" -> (x143Markov _),
    "x144_item_cf" -> (x144ItemCf _),
    "x160_apriori3" -> (x160Apriori3 _))

  val oracles: Map[String, String] = Map(
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
       "ORDER BY n_orders DESC, part_a, part_b LIMIT 100"),
    "x142_assoc_rules" -> AssocSql,
"x143_markov" -> MarkovSql,
"x144_item_cf" -> ItemCfSql,
    "x160_apriori3" -> Apriori3Sql)
}
