package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Round-7 third wave: the scalable global running total (w16), marketing
  * attribution (x73), determinism-engineered OLS regression (a23), and
  * corrupt-file-tolerant scans (s25).
  *
  * Reference note: /root/reference was empty at survey time (SURVEY §0);
  * these extend §2.5/§2.8/§2.4/§2.1 from public Spark API surface only.
  */
object Extras10 {

  /** X72 — MMR diversified re-rank
    * ([[graft.api.VectorPipeline.mmrRerank]], λ=0.5, k=5 over the
    * exact top-20 shortlist): the redundancy-penalized re-ranker a
    * retrieval endpoint runs after ANN shortlisting. The greedy
    * trajectory is not SQL-expressible, so the contract row emits the
    * verifiable claims (x8's derived-claim pattern): every probe
    * returns k results drawn FROM its shortlist, the first pick equals
    * the relevance argmax (the MMR theorem), and the selected set's
    * mean pairwise similarity does not exceed the plain top-5's
    * (diversity really improved — measured, not assumed; the pairwise
    * panels are bounded by probes × C(k,2), never corpus size). */
  def x72MmrRerank(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.api.VectorPipeline
    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 10)
    val short = VectorPipeline
      .topKCosine(emb, probes, "vec_id", "embedding", 20)
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("vec")), "neighbor_id")
      .localCheckpoint(true)
    val mmr = VectorPipeline
      .mmrRerank(short.select(col("probe_id"), col("neighbor_id"),
        col("sim"), col("vec")), 0.5, 5)
      .localCheckpoint(true)
    def pairMeanSim(sel: DataFrame): DataFrame = {
      val v = emb.select(col("vec_id"), col("embedding"))
      val a = sel.join(v, sel("neighbor_id") === v("vec_id"))
        .select(col("probe_id"), col("neighbor_id").as("ida"),
          col("embedding").as("va"))
      val b = sel.join(v, sel("neighbor_id") === v("vec_id"))
        .select(col("probe_id").as("pb"), col("neighbor_id").as("idb"),
          col("embedding").as("vb"))
      // deterministic mean (ADVICE r7): the 6-dp sims sum EXACTLY in
      // DECIMAL(18,6) regardless of partial-aggregation order, so the
      // diversity_ok <= compare below can never flip across partitionings
      // the way a bare avg() over IEEE doubles could
      a.join(b, col("probe_id") === col("pb") && col("ida") < col("idb"))
        .agg((sum(SimSearch.dot6(col("va"), col("vb")).cast(Det.Money6))
          .cast("double") / count(lit(1))).as("mean_sim"))
    }
    val mmrMean = pairMeanSim(mmr.select(col("probe_id"), col("neighbor_id")))
      .withColumnRenamed("mean_sim", "mmr_mean")
    val topMean = pairMeanSim(short.filter(col("rank") <= 5)
      .select(col("probe_id"), col("neighbor_id")))
      .withColumnRenamed("mean_sim", "top_mean")
    val top1 = mmr.filter(col("sel_rank") === 1)
      .select(col("probe_id"), col("neighbor_id").as("mmr_top1"))
      .join(short.filter(col("rank") === 1)
        .select(col("probe_id"), col("neighbor_id").as("rel_top1")),
        "probe_id")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("mmr_top1") === col("rel_top1"), 1L).otherwise(0L))
          .as("n_top1_match"))
    val escaped = mmr.join(short,
      Seq("probe_id", "neighbor_id"), "left_anti")
      .agg(count(lit(1)).as("n_escaped"))
    top1.crossJoin(escaped).crossJoin(mmrMean).crossJoin(topMean)
      .select(col("n_probes"), lit(5L).as("k"),
        (col("n_top1_match") === col("n_probes")).as("top1_ok"),
        (col("n_escaped") === 0L).as("subset_ok"),
        (col("mmr_mean") <= col("top_mean")).as("diversity_ok"))
  }

  /** X85 — k-anonymity audit (the data-governance pre-flight before a
    * dataset release): group the release by its quasi-identifier tuple
    * (market segment × nation × account-balance band — the classic
    * re-identification surface) and report how much of the corpus
    * lives in groups smaller than k=5: those rows are re-identifiable
    * and must be suppressed or generalized (Sweeney 2002). One grouped
    * count + one summary aggregate over the group-cardinality frame —
    * the audit costs a scan regardless of corpus size. */
  def x85KAnonymity(spark: SparkSession, sfDir: String): DataFrame = {
    val groups = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_mktsegment"), col("n_name"),
        floor(col("c_acctbal") / 2000.0).as("bal_band"))
      .groupBy(col("c_mktsegment"), col("n_name"), col("bal_band"))
      .agg(count(lit(1)).as("sz"))
    groups.agg(count(lit(1)).as("n_groups"),
      sum(col("sz")).as("n_rows"),
      sum(when(col("sz") < 5, 1L).otherwise(0L)).as("n_groups_below_k"),
      sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("n_rows_at_risk"),
      min(col("sz")).as("min_group"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x85_k_anonymity" -> (x85KAnonymity _),
    "x72_mmr_rerank" -> (x72MmrRerank _))

  val oracles: Map[String, String] = Map(
    // identical quasi-identifier banding (floor of the same IEEE
    // division) and the same k=5 threshold
    "x85_k_anonymity" ->
      ("WITH g AS (SELECT c_mktsegment, n_name, " +
       "CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal_band, " +
       "CAST(COUNT(*) AS BIGINT) AS sz FROM customer " +
       "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2, 3) " +
       "SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, " +
       "CAST(SUM(sz) AS BIGINT) AS n_rows, " +
       "CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) " +
       "AS n_groups_below_k, " +
       "CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) " +
       "AS n_rows_at_risk, MIN(sz) AS min_group FROM g"),
    // derived-claim oracle (x8's pattern): the greedy MMR trajectory is
    // not SQL-expressible; the claims are (see scaladoc)
    "x72_mmr_rerank" ->
      ("SELECT CAST(10 AS BIGINT) AS n_probes, CAST(5 AS BIGINT) AS k, " +
       "TRUE AS top1_ok, TRUE AS subset_ok, TRUE AS diversity_ok"))
}
