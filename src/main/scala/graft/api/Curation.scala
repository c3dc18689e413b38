package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Clustering, CurationOps}

/** Column-parameterized public kernels for the SEMANTIC-CURATION
  * LADDER (VERDICT r10 #5 — the [[Analytics]]/[[Graph]] treatment for
  * the curation family): every method takes the caller's frame and
  * column names and returns a plain DataFrame, so a user curates
  * their own corpus without adopting this repo's table layout. The
  * x172/x173/x175/x176/x177/x178/x172b contract rows delegate here
  * (or to the same private cores), so each kernel is oracle-checked
  * end to end on the test corpus; [[graft.examples.ApiDemo]] drives
  * them on frames with foreign column names.
  *
  * Methods and the public methods they cite:
  *  - [[semDedup]] — SemDeDup, Abbas et al. 2023 (arXiv:2303.09540)
  *  - [[semDedupIncremental]] — its production ingest face
  *  - [[d4Prune]] — D4 prototype pruning, Tirumala et al. 2023
  *    (arXiv:2308.12284)
  *  - [[softDedup]] — down-weighting, He et al. 2024 (arXiv:2407.06654)
  *  - [[dsirWeights]] — DSIR importance resampling, Xie et al. 2023
  *    (arXiv:2302.03169)
  *  - [[perplexityTiers]] — CCNet head/middle/tail, Wenzek et al.
  *    2020 (LREC §4.4)
  *  - [[straddleGuard]] — the family's cross-cluster recall guard
  *
  * Scale contracts match the operator rows: pair work is
  * (cluster, band)-bounded, models are vocabulary-sized broadcast
  * tables, ranks use the decomposed-quantile shape (no per-group
  * corpus windows), and every verdict is bitwise deterministic under
  * the repo's lattice/decimal float policy. */
object Curation {

  /** SemDeDup verdicts: k-means partitions the embedding corpus, pairs
    * form ONLY within (cluster, band) buckets, and a vector drops iff
    * it has a same-cluster near-dup with a smaller id
    * (first-occurrence-wins). Returns (id, cluster, kept). */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double, numBands: Int = 8,
      dims: Int = 64): DataFrame = {
    val c = graft.Checkpoints.cut(
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec")))
    val asg = Clustering.kmeansAssignments(c, "id", "vec", k, iters)
    val withC = c.join(asg.withColumnRenamed("vid", "id"), "id")
    val pairs = VectorPipeline.groupedCosinePairs(withC, "id", "vec",
      "cluster", threshold, numBands, dims)
    val dropped = pairs.select(col("id_b").as("id")).distinct()
      .withColumn("hit", lit(1))
    withC.select(col("id"), col("cluster"))
      .join(dropped, Seq("id"), "left")
      .select(col("id"), col("cluster"), col("hit").isNull.as("kept"))
  }

  /** Incremental SemDeDup: `probe` (a new shard; ids must be disjoint
    * from `corpus`) arrives against a semantic index trained on
    * `corpus` ONLY — no retraining, each probe assigns to its nearest
    * trained centroid and pairs only within that cluster's corpus
    * band index. Per-increment work is probe-sized; the corpus is
    * never self-joined. Returns verified (id_new, id_old, sim). */
  def semDedupIncremental(corpus: DataFrame, probe: DataFrame,
      idCol: String, vecCol: String, k: Int, iters: Int,
      threshold: Double, numBands: Int = 8, dims: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("is_probe", lit(false))
    val p = probe.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("is_probe", lit(true))
    val all = graft.Checkpoints.cut(c.unionByName(p))
    val asg = Clustering.kmeansAssignTrained(
      all.filter(!col("is_probe")), all, "id", "vec", k, iters)
    val withC = all.join(asg.withColumnRenamed("vid", "id"), "id")
    VectorPipeline.groupedCosinePairsAgainst(
      withC.filter(col("is_probe")), withC.filter(!col("is_probe")),
      "id", "vec", "cluster", threshold, numBands, dims)
  }

  /** D4: [[semDedup]] survivors, then drop the `dropFrac` most
    * PROTOTYPICAL vectors per cluster (closest to centroid — least
    * diversity value), keeping the diverse tail. Returns
    * (id, cluster, proto_rank, kept_final) for the survivors. */
  def d4Prune(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double, dropFrac: Double = 0.2,
      numBands: Int = 8, dims: Int = 64): DataFrame = {
    val c = graft.Checkpoints.cut(
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec")))
    val sem = semDedup(c, "id", "vec", k, iters, threshold, numBands,
      dims)
    val d2 = Clustering.kmeansDistances(c, "id", "vec", k, iters)
      .withColumnRenamed("vid", "id")
    d4Rank(d2.join(sem.filter(col("kept")).select(col("id")), "id"),
      dropFrac)
  }

  /** The D4 prototype-rank core over a (id, cluster, d2) frame — the
    * x43/x175 decomposed rank (per-(cluster, d²) counts → cumulative
    * window over the aggregate-bounded distinct-distance frame →
    * bounded tie window), never a per-cluster corpus window. Shared
    * by [[d4Prune]] and the x175 contract row. */
  private[graft] def d4Rank(kd0: DataFrame, dropFrac: Double): DataFrame = {
    val kd = graft.Checkpoints.cut(kd0)
    val perD2 = kd.groupBy(col("cluster"), col("d2"))
      .agg(count(lit(1)).as("n_at"))
    val wCum = Window.partitionBy(col("cluster")).orderBy(col("d2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perD2
      .withColumn("c_le", sum(col("n_at")).over(wCum))
      .select(col("cluster"), col("d2"),
        (col("c_le") - col("n_at")).as("c_lt"))
    val wTie = Window.partitionBy(col("cluster"), col("d2"))
      .orderBy(col("id"))
    val nc = kd.groupBy(col("cluster"))
      .agg(floor(lit(dropFrac) * count(lit(1))).cast("long").as("dropn"))
    kd.join(cum, Seq("cluster", "d2"))
      .withColumn("tie", row_number().over(wTie).cast("long"))
      .withColumn("proto_rank", col("c_lt") + col("tie"))
      .join(broadcast(nc), "cluster")
      .select(col("id"), col("cluster"), col("proto_rank"),
        (col("proto_rank") > col("dropn")).as("kept_final"))
  }

  /** Soft dedup: weight 1/|near-dup cluster| per document from a
    * (member → cluster-representative) label table (e.g. the
    * connected components of a verified near-dup pair graph); ids
    * absent from the label table are singletons at weight 1. Returns
    * (id, cluster_size, weight). One size aggregate + one left join —
    * no pair work, no window. */
  def softDedup(corpus: DataFrame, idCol: String, labels: DataFrame,
      labelIdCol: String, labelRepCol: String): DataFrame = {
    val lab = labels.select(col(labelIdCol).as("id"),
      col(labelRepCol).as("rep"))
    val sizes = lab.groupBy(col("rep")).agg(count(lit(1)).as("sz"))
    val weighted = lab.join(sizes, "rep").select(col("id"), col("sz"))
    corpus.select(col(idCol).as("id"))
      .join(weighted, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("sz"), lit(1L)).as("cluster_size"),
        round(lit(1.0) / coalesce(col("sz"), lit(1L)).cast("double"), 6)
          .as("weight"))
  }

  /** DSIR importance weights: log w(d) = Σ over the doc's hashed
    * bigram occurrences of [ln p_target(bucket) − ln p_raw(bucket)],
    * with add-one smoothing over `buckets` md5 buckets. `target` is
    * the frame of target-domain doc ids (`targetIdCol`), broadcast
    * into a semi-join — the models are two `buckets`-row tables.
    * Returns (id, n_bigrams, log_weight). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetIdCol: String,
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // md5Bucket takes hex chars: 16^h buckets — round the request up
    val hexChars = math.max(1,
      math.ceil(math.log(buckets.toDouble) / math.log(16)).toInt)
    val nBuckets = math.pow(16, hexChars.toDouble).toLong
    val tgtIds = target.select(col(targetIdCol).as("doc_id"))
    val grams = TextPipeline.ngramRows(docs, idCol, textCol, 2)
      .select(col("doc_id"),
        graft.Det.md5Bucket(col("ngram"), hexChars).as("b"))
      .localCheckpoint(true)
    val raw = grams.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = grams.join(broadcast(tgtIds), Seq("doc_id"), "left_semi")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val totals = raw.agg(sum(col("cr")).as("tr"))
      .crossJoin(tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("tt")))
    val model = raw.join(tgt, Seq("b"), "left").na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totals))
      .select(col("b"), round(
        log((col("ct") + 1).cast("double") /
          (col("tt") + nBuckets).cast("double")) -
        log((col("cr") + 1).cast("double") /
          (col("tr") + nBuckets).cast("double")), 10).as("term"))
    val perDoc = grams.join(broadcast(model), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("term").cast(DecimalType(28, 15)))
          .cast("double"), 6).as("log_weight"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id").as("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
  }

  /** CCNet tiers: per `langCol` group, documents split into terciles
    * of their corpus-LM score ([[TextPipeline.lmScore]]; higher lp ⇔
    * lower perplexity ⇔ `head`). Rank is the decomposed form — no
    * per-language corpus window. Returns
    * (id, lang, lp, lp_rank, bucket). */
  def perplexityTiers(docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val scored = graft.Checkpoints.cut(
      TextPipeline.lmScore(docs, idCol, textCol)
        .join(docs.select(col(idCol).as("doc_id"),
          col(langCol).as("lang")), "doc_id")
        .select(col("doc_id").as("id"), col("lang"), col("lp")))
    val perLp = scored.groupBy(col("lang"), col("lp"))
      .agg(count(lit(1)).as("n_at"))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("lp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perLp.withColumn("c_le", sum(col("n_at")).over(wCum))
      .select(col("lang"), col("lp"),
        (col("c_le") - col("n_at")).as("c_lt"))
    val wTie = Window.partitionBy(col("lang"), col("lp"))
      .orderBy(col("id"))
    val nl = scored.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .select(col("lang"),
        floor(col("n") / lit(3.0)).cast("long").as("t1"),
        floor(lit(2.0) * col("n") / lit(3.0)).cast("long").as("t2"))
    scored.join(cum, Seq("lang", "lp"))
      .withColumn("tie", row_number().over(wTie).cast("long"))
      .withColumn("lp_rank", col("c_lt") + col("tie"))
      .join(broadcast(nl), "lang")
      .select(col("id"), col("lang"), col("lp"), col("lp_rank"),
        when(col("lp_rank") > col("t2"), lit("head"))
          .when(col("lp_rank") > col("t1"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** The family's recall guard: classify verified ungrouped near-dup
    * pairs against the same k-means — total / within-cluster /
    * straddling (the SemDeDup trade, AS DATA) / top-2-multi-probe
    * recovered counts. Delegates to
    * [[graft.operators.CurationOps.semDedupStraddleGuard]]. */
  def straddleGuard(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double, numBands: Int = 8,
      dims: Int = 64): DataFrame =
    CurationOps.semDedupStraddleGuard(corpus, idCol, vecCol, k, iters,
      threshold, numBands, dims)
}
