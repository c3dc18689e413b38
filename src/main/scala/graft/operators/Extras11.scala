package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Det, Tables}
import graft.api.VectorPipeline

/** Round-8 wave: iterative graph analytics (PageRank, triangles) and
  * retraction-based incremental view maintenance — the three operator
  * families a production analytics stack still reaches for that the
  * suite did not yet pin.
  */
object Extras11 {


  /** X113 — retraction-based incremental view maintenance (the
    * Flink/Materialize changelog algebra as a batch contract row, the
    * CDC-driven sibling of x54's append-only upkeep): the (status ×
    * month) revenue MV is maintained under a correction feed carrying
    * UPDATES (order % 7 = 0, not deleted: price restated +100.00 —
    * emitted as a -1 retraction of the old row plus a +1 insertion of
    * the new) and DELETES (order % 11 = 0: -1 retraction only).
    * Maintenance = one grouped aggregate over the signed delta rows
    * (m and m·price sums), full-outer-merged into the base MV — the
    * delta aggregate is delta-sized, the base is never rescanned, and
    * groups whose count reaches zero are dropped (the part a naive
    * "add the delta" implementation forgets). The oracle recomputes
    * the MV from the corrected order set, so the retraction algebra is
    * value-checked end to end. */
  def x113MvRetraction(spark: SparkSession, sfDir: String): DataFrame =
    maintainMv(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          date_trunc("month", col("o_orderdate")).as("month"),
          col("o_totalprice").cast(Det.Money).as("price")))
      .select(col("o_orderstatus"),
        unix_timestamp(col("month")).as("month_start"),
        col("n"), col("t").cast("double").as("total"))
      .orderBy(col("o_orderstatus"), col("month_start"))

  /** The maintenance core over an (o_orderkey, o_orderstatus, month,
    * price DECIMAL) frame; returns the maintained (status, month, n, t)
    * MV. Exposed for spec-level checks (group-drop on planted data). */
  def maintainMv(o: DataFrame): DataFrame = {
    val base = o.groupBy(col("o_orderstatus"), col("month"))
      .agg(count(lit(1)).as("n"), sum(col("price")).as("total"))
    val touched = o.filter(col("o_orderkey") % 7 === 0 ||
      col("o_orderkey") % 11 === 0)
    // every touched order retracts its old row; non-deleted updates
    // re-insert the restated row
    val retract = touched.select(col("o_orderstatus"), col("month"),
      lit(-1L).as("m"), col("price"))
    val insert = touched.filter(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderstatus"), col("month"), lit(1L).as("m"),
        (col("price") + lit(100.00).cast(Det.Money)).as("price"))
    val delta = retract.unionByName(insert)
      .groupBy(col("o_orderstatus"), col("month"))
      .agg(sum(col("m")).as("dn"),
        sum(col("m") * col("price")).as("dtotal"))
    base.join(delta, Seq("o_orderstatus", "month"), "full_outer")
      .select(col("o_orderstatus"), col("month"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0).cast(Det.Money)) +
          coalesce(col("dtotal"), lit(0).cast(Det.Money))).as("t"))
      .filter(col("n") > 0)
  }

  /** X114 — weighted reservoir sampling (Efraimidis–Spirakis A-ES,
    * IPL 2006): k documents drawn with probability proportional to
    * length, in ONE distributed pass — the weighted-subsample primitive
    * a mixture builder uses when x13's uniform hash sampling isn't
    * enough. Per item: uniform u from the doc's md5 (deterministic,
    * engine-shared via Det.md5Bucket), score = ln(u)/w (the log form of
    * u^(1/w) — monotone-identical ranking, no pow underflow at large
    * w), top-k by score. The top-k is a TakeOrderedAndProject — map-
    * side partial heaps, only k rows per partition ship, the exact
    * shape a 100 TB reservoir needs. Score rounded to 10 dp so the
    * engines' last-ulp ln() differences cannot flip the boundary rank;
    * doc_id tie-break totalizes the order. */
  def x114WeightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("double").as("w"))
      .filter(col("w") > 0)
    // hash the STRING form: md5-of-utf8 is the engine-shared spelling
    // (long→binary casts differ across engines)
    val u = (Det.md5Bucket(col("doc_id").cast("string"), 13)
      .cast("double") + lit(0.5)) / lit(math.pow(16.0, 13))
    d.select(col("doc_id"), col("w"),
        round(log(u) / col("w"), 10).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(50)
  }

  /** X115 — differentially-private count release (Dwork et al. 2006):
    * per-event-type counts with SEEDED Laplace(1/ε) noise via inverse-
    * CDF on a uniform derived from the group key's md5 — the noise is
    * a pure function of the released key, so the release is
    * reproducible (and oracle-checkable) while having exactly the
    * Laplace distribution across keys a DP accountant assumes. ε = 1.
    * The true count rides along as the audit column (this is the
    * release-AUDIT row — a production release would drop it). One
    * grouped count + scalar math: scan-bound at any scale. */
  def x115DpCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val u = (Det.md5Bucket(col("event_type"), 13).cast("double") +
      lit(0.5)) / lit(math.pow(16.0, 13))
    val c = u - lit(0.5)
    val noise = -signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
    Tables.eventsUs(spark, sfDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_true"))
      .select(col("event_type"), col("n_true"),
        round(col("n_true") + round(noise, 6), 6).as("n_released"))
      .orderBy(col("event_type"))
  }

  /** X118 — referential-integrity audit (the pre-flight a warehouse
    * runs before trusting joins): every declared FK edge of the star
    * schema checked in one pass each — child rows whose key has no
    * parent, counted via LEFT ANTI joins (never materializing the
    * orphans, only their count). Dimension parents broadcast; the one
    * big-big edge (lineitem→orders) shuffles on its key once. The
    * emitted zeros are the CONTRACT: a generator bug or a bad
    * partial-load would flip a row, and the oracle recomputes each
    * count with NOT EXISTS. */
  def x118RiAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val su = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    // fully LAZY per-edge frames unioned into ONE action: the seven
    // audits run as parallel stages of a single job instead of 14
    // sequential driver-side counts (measured 7.7s -> the union form
    // lets the scheduler overlap the scans)
    def edge(name: String, child: DataFrame, fk: String,
        parent: DataFrame, pk: String): DataFrame = {
      val orphans = child.select(col(fk).as("k"))
        .join(parent.select(col(pk).as("k")), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      child.agg(count(lit(1)).as("n_child")).crossJoin(orphans)
        .select(lit(name).as("fk_edge"), col("n_child"),
          col("n_orphans"), (col("n_orphans") === 0L).as("ri_ok"))
    }
    edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
      .unionByName(edge("lineitem->part", li, "l_partkey", p, "p_partkey"))
      .unionByName(edge("lineitem->supplier", li, "l_suppkey", su, "s_suppkey"))
      .unionByName(edge("orders->customer", o, "o_custkey", c, "c_custkey"))
      .unionByName(edge("customer->nation", c, "c_nationkey", n, "n_nationkey"))
      .unionByName(edge("supplier->nation", su, "s_nationkey", n, "n_nationkey"))
      .unionByName(edge("nation->region", n, "n_regionkey", r, "r_regionkey"))
      .orderBy(col("fk_edge"))
  }

  /** X119 — golden-record survivorship (the step AFTER entity
    * resolution that actually ships: x12's near-dup clusters collapsed
    * to one surviving record each by an explicit RULE — longest text
    * wins, lowest id breaks ties — with the member count as audit).
    * One window top-1 over cluster-partitioned members; clusters grow
    * with the corpus (never a single partition), members per cluster
    * are bounded by the dedup density. Single-member "clusters" are
    * excluded: a golden-record table lists only real merges. The
    * oracle re-derives clusters through the shared recursive CTE and
    * applies the identical rule. */
  def x119GoldenRecord(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_rep"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_rep"))
    Dedup.x12DedupClusters(spark, sfDir)
      .join(Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("n_chars")), "doc_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(wAll))
      .filter(col("rn") === 1 && col("n_members") > 1)
      .select(col("cluster_rep"), col("n_members"),
        col("doc_id").as("survivor_id"),
        col("n_chars").as("survivor_chars"))
      .orderBy(col("cluster_rep"))
  }

  /** X123 — matryoshka truncation quality (Kusupati et al. 2022, the
    * MRL serving trick every modern vector DB offers): retrieval run
    * on the FIRST 16 of 64 dims, renormalized, scored against full-dim
    * retrieval as per-probe top-5 overlap. One number per probe — the
    * go/no-go table for "can we serve at 4× less memory". Both sides'
    * top-5 computed exactly (l3's brute-force shape, fine on a probe
    * set; the production path plugs the truncated metric into the
    * banded/PQ pipelines). Sims rounded 6 dp (the dot6 policy) so
    * rank order is engine-stable. */
  def x123Matryoshka(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val probes = emb.filter(col("vec_id") < 10)
    def topkOn(vec: DataFrame => DataFrame, tag: String): DataFrame = {
      val p = vec(probes).select(col("vec_id").as("probe_id"),
        col("v").as("pv"))
      val c = vec(emb).select(col("vec_id").as("neighbor_id"),
        col("v").as("cv"))
      val scored = p.join(c, col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"),
          SimSearch.dot6(col("pv"), col("cv")).as("sim"))
      graft.plans.GroupTopK(scored, Seq("probe_id"),
          Seq(("sim", false), ("neighbor_id", true)), 5)
        .select(col("probe_id"), col("neighbor_id").as(s"n_$tag"))
    }
    val full = topkOn(df => df.withColumn("v", col("embedding")), "full")
    val norm16 = sqrt(aggregate(slice(col("embedding"), 1, 16),
      lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val trunc = topkOn(df => df.withColumn("v",
      transform(slice(col("embedding"), 1, 16),
        x => (x.cast("double") / norm16).cast("float"))), "trunc")
    full.join(trunc,
        full("probe_id") === trunc("probe_id") &&
          col("n_full") === col("n_trunc"))
      .groupBy(full("probe_id").as("probe_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .unionByName(
        // probes with zero overlap would drop out of the join — keep
        // them as explicit zeros (the honest readout)
        full.select(full("probe_id")).distinct()
          .join(full.join(trunc,
              full("probe_id") === trunc("probe_id") &&
                col("n_full") === col("n_trunc"))
            .select(full("probe_id")).distinct(), Seq("probe_id"),
            "left_anti")
          .withColumn("n_overlap", lit(0L)))
      .orderBy(col("probe_id"))
  }

  /** X124 — binary-quantization retrieval (the 1-bit rung of the
    * quantization ladder float → int8 [x34] → PQ [x51] → binary): sign
    * signatures (2×32 bits), Hamming shortlist of 20 via exact integer
    * popcounts through the bounded-heap GroupTopK, exact cosine rerank
    * to top-5. 8 bytes/vector scan — the memory floor; the oracle
    * recomputes signatures, Hamming cut, and rerank exhaustively, so
    * shortlist recall AND rerank order are hash-checked. */
  def x124BinaryQuant(spark: SparkSession, sfDir: String): DataFrame =
    // memoized per (session, corpus): x128's nDCG eval rides this same
    // retrieval frame, so the signature scan + Hamming shortlist +
    // rerank run once, not once per consumer (ADVICE r8)
    graft.Memo(spark, s"x124retr:$sfDir") {
      val emb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      VectorPipeline.binaryHammingTopK(emb,
          emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, shortlist = 20)
        .localCheckpoint(true)
    }.orderBy(col("probe_id"), col("rank"))

  /** X125 — token-level corpus drift (the data-drift report an ML-ops
    * pipeline publishes on every corpus version bump): add-one-smoothed
    * relative-frequency log-ratios per token between the current corpus
    * and x78's release transform, top-20 by |shift|. Two token counts
    * (one scan each), a vocabulary-sized full-outer merge, four scalar
    * totals broadcast — nothing grows beyond the vocabulary. The whole
    * score expression is one identically-spelled chain of IEEE ops on
    * exact integers, rounded 6 dp. */
  def x125TokenDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    def toks(df: DataFrame): DataFrame = df
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val oldT = toks(d).groupBy(col("tok")).agg(count(lit(1)).as("c_old"))
    val newT = toks(d.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text"))))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_new"))
    val merged = oldT.join(newT, Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
      .localCheckpoint(true)
    val totals = merged.agg(sum(col("c_old")).as("t_old"),
      sum(col("c_new")).as("t_new"), count(lit(1)).as("v"))
    val score = log(
      ((col("c_new") + 1).cast("double") / (col("t_new") + col("v")).cast("double")) /
        ((col("c_old") + 1).cast("double") / (col("t_old") + col("v")).cast("double")))
    merged.crossJoin(totals)
      .select(col("tok"), col("c_old"), col("c_new"),
        round(score, 6).as("log_ratio"))
      .orderBy(abs(col("log_ratio")).desc, col("tok")).limit(20)
  }

  /** X126 — embedding centroid drift (x125's sibling in vector space):
    * per label, the cosine between the centroids of the two corpus
    * halves (vec_id parity — a deterministic stand-in for
    * "yesterday's embeddings vs today's"). Centroids from exact
    * DECIMAL per-dimension sums (order-independent) divided once;
    * the 64-term cosine rounded 6 dp. A healthy re-embed shows ~1.0;
    * an encoder regression shows up as a cosine dip per label — the
    * one-table gate before swapping an embedding index. */
  def x126EmbeddingDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val dims = Tables.embeddings(spark, sfDir)
      .select(col("label"), (col("vec_id") % 2).as("half"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("label"), col("half"), col("d"))
      .agg((sum(col("x").cast("double").cast(DecimalType(28, 10)))
        .cast("double") / count(lit(1))).as("m"),
        count(lit(1)).as("n"))
    val a = dims.filter(col("half") === 0)
      .select(col("label"), col("d"), col("m").as("ma"), col("n").as("na"))
    val b = dims.filter(col("half") === 1)
      .select(col("label"), col("d"), col("m").as("mb"), col("n").as("nb"))
    a.join(b, Seq("label", "d"))
      .groupBy(col("label"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        round(sum(col("ma") * col("mb")) /
          (sqrt(sum(col("ma") * col("ma"))) *
            sqrt(sum(col("mb") * col("mb")))), 6).as("centroid_cos"))
      .orderBy(col("label"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x125_token_drift" -> (x125TokenDrift _),
    "x126_embedding_drift" -> (x126EmbeddingDrift _),
    "x123_matryoshka" -> (x123Matryoshka _),
    "x124_binary_quant" -> (x124BinaryQuant _),
    "x119_golden_record" -> (x119GoldenRecord _),
    "x118_ri_audit" -> (x118RiAudit _),
    "x113_mv_retraction" -> (x113MvRetraction _),
    "x114_weighted_sample" -> (x114WeightedSample _),
    "x115_dp_counts" -> (x115DpCounts _))

  /** The x124 oracle's shared CTE chain (signatures → hamming →
    * shortlist → rerank → `retr`), reused verbatim by x128's nDCG. */
  private[operators] val BinaryQuantCte: String =
    "sig AS (SELECT vec_id, " +
    "CAST(SUM(CASE WHEN embedding[i] > 0 THEN POWER(2, i - 1) " +
    "ELSE 0 END) AS BIGINT) AS lo, " +
    "CAST(SUM(CASE WHEN embedding[i + 32] > 0 THEN POWER(2, i - 1) " +
    "ELSE 0 END) AS BIGINT) AS hi " +
    "FROM embeddings, range(1, 33) r(i) GROUP BY 1), " +
    "ham AS (SELECT p.vec_id AS probe_id, c.vec_id AS nid, " +
    "bit_count(xor(p.lo, c.lo)) + bit_count(xor(p.hi, c.hi)) AS h " +
    "FROM sig p JOIN sig c ON c.vec_id <> p.vec_id " +
    "WHERE p.vec_id < 10), " +
    "short AS (SELECT probe_id, nid FROM (SELECT probe_id, nid, " +
    "row_number() OVER (PARTITION BY probe_id ORDER BY h, nid) AS rk " +
    "FROM ham) t WHERE rk <= 20), " +
    "rer AS (SELECT s.probe_id, s.nid AS neighbor_id, " +
    "round(SUM(CAST(a.embedding[i] AS DOUBLE) * " +
    "CAST(b.embedding[i] AS DOUBLE)), 6) AS sim " +
    "FROM short s JOIN embeddings a ON a.vec_id = s.probe_id " +
    "JOIN embeddings b ON b.vec_id = s.nid, range(1, 65) r(i) " +
    "GROUP BY 1, 2), " +
    "retr AS (SELECT probe_id, neighbor_id, sim, rank FROM (SELECT *, " +
    "CAST(row_number() OVER (PARTITION BY probe_id " +
    "ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank FROM rer) t " +
    "WHERE rank <= 5)"

  val oracles: Map[String, String] = Map(
    // same token split, same smoothing chain, same rounding
    "x125_token_drift" ->
      ("WITH oldt AS (SELECT t.tok, COUNT(*) AS c_old FROM documents d, " +
       "unnest(string_split(lower(d.text), ' ')) AS t(tok) " +
       "WHERE length(t.tok) > 0 GROUP BY 1), " +
       "newt AS (SELECT t.tok, COUNT(*) AS c_new FROM " +
       "(SELECT CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END " +
       "AS text FROM documents WHERE doc_id % 11 <> 0) d, " +
       "unnest(string_split(lower(d.text), ' ')) AS t(tok) " +
       "WHERE length(t.tok) > 0 GROUP BY 1), " +
       "m AS (SELECT COALESCE(o.tok, n.tok) AS tok, " +
       "COALESCE(c_old, 0) AS c_old, COALESCE(c_new, 0) AS c_new " +
       "FROM oldt o FULL OUTER JOIN newt n ON o.tok = n.tok), " +
       "tt AS (SELECT CAST(SUM(c_old) AS BIGINT) AS t_old, " +
       "CAST(SUM(c_new) AS BIGINT) AS t_new, " +
       "CAST(COUNT(*) AS BIGINT) AS v FROM m) " +
       "SELECT tok, CAST(c_old AS BIGINT) AS c_old, " +
       "CAST(c_new AS BIGINT) AS c_new, " +
       "round(ln((CAST(c_new + 1 AS DOUBLE) / CAST(t_new + v AS DOUBLE)) / " +
       "(CAST(c_old + 1 AS DOUBLE) / CAST(t_old + v AS DOUBLE))), 6) " +
       "AS log_ratio FROM m CROSS JOIN tt " +
       "ORDER BY abs(round(ln((CAST(c_new + 1 AS DOUBLE) / " +
       "CAST(t_new + v AS DOUBLE)) / (CAST(c_old + 1 AS DOUBLE) / " +
       "CAST(t_old + v AS DOUBLE))), 6)) DESC, tok LIMIT 20"),
    // same decimal per-dimension means, same 64-term cosine
    "x126_embedding_drift" ->
      ("WITH dims AS (SELECT label, vec_id % 2 AS half, i AS d, " +
       "CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,10))) " +
       "AS DOUBLE) / COUNT(*) AS m, COUNT(*) AS n " +
       "FROM embeddings, range(1, 65) r(i) GROUP BY 1, 2, 3) " +
       "SELECT a.label, CAST(MAX(a.n) AS BIGINT) AS n_a, " +
       "CAST(MAX(b.n) AS BIGINT) AS n_b, " +
       "round(SUM(a.m * b.m) / (sqrt(SUM(a.m * a.m)) * " +
       "sqrt(SUM(b.m * b.m))), 6) AS centroid_cos " +
       "FROM dims a JOIN dims b ON a.label = b.label AND a.d = b.d " +
       "AND a.half = 0 AND b.half = 1 " +
       "GROUP BY a.label ORDER BY a.label"),
    // both top-5s recomputed exhaustively; truncated sims mirror the
    // float-cast renormalization element by element
    "x123_matryoshka" ->
      ("WITH fullD AS (SELECT a.vec_id AS probe_id, b.vec_id AS nid, " +
       "round(SUM(CAST(a.embedding[i] AS DOUBLE) * " +
       "CAST(b.embedding[i] AS DOUBLE)), 6) AS sim " +
       "FROM embeddings a, embeddings b, range(1, 65) r(i) " +
       "WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id GROUP BY 1, 2), " +
       "fullTop AS (SELECT probe_id, nid FROM (SELECT probe_id, nid, " +
       "row_number() OVER (PARTITION BY probe_id " +
       "ORDER BY sim DESC, nid) AS rk FROM fullD) t WHERE rk <= 5), " +
       "n16 AS (SELECT vec_id, sqrt(SUM(CAST(embedding[i] AS DOUBLE) * " +
       "CAST(embedding[i] AS DOUBLE))) AS nrm " +
       "FROM embeddings, range(1, 17) r(i) GROUP BY 1), " +
       "truncD AS (SELECT a.vec_id AS probe_id, b.vec_id AS nid, " +
       "round(SUM(CAST(CAST(CAST(a.embedding[i] AS DOUBLE) / na.nrm " +
       "AS FLOAT) AS DOUBLE) * CAST(CAST(CAST(b.embedding[i] AS DOUBLE) " +
       "/ nb.nrm AS FLOAT) AS DOUBLE)), 6) AS sim " +
       "FROM embeddings a JOIN n16 na ON na.vec_id = a.vec_id, " +
       "embeddings b JOIN n16 nb ON nb.vec_id = b.vec_id, " +
       "range(1, 17) r(i) " +
       "WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id GROUP BY 1, 2), " +
       "truncTop AS (SELECT probe_id, nid FROM (SELECT probe_id, nid, " +
       "row_number() OVER (PARTITION BY probe_id " +
       "ORDER BY sim DESC, nid) AS rk FROM truncD) t WHERE rk <= 5), " +
       "o AS (SELECT ft.probe_id, COUNT(*) AS c FROM fullTop ft " +
       "JOIN truncTop tt ON tt.probe_id = ft.probe_id " +
       "AND tt.nid = ft.nid GROUP BY 1) " +
       "SELECT pr.probe_id, CAST(COALESCE(o.c, 0) AS BIGINT) AS n_overlap " +
       "FROM (SELECT DISTINCT probe_id FROM fullTop) pr " +
       "LEFT JOIN o USING (probe_id) ORDER BY probe_id"),
    // signatures, Hamming cut, and rerank recomputed exhaustively
    "x124_binary_quant" ->
      ("WITH " + BinaryQuantCte +
       " SELECT probe_id, neighbor_id, sim, rank FROM retr " +
       "ORDER BY probe_id, rank"),
    // clusters re-derived via the shared recursive CTE, then the same
    // survivorship rule
    "x119_golden_record" ->
      (Dedup.ClusterCteSql +
       ", cl AS (SELECT src AS doc_id, MIN(dst) AS cluster_rep " +
       "FROM reach GROUP BY src), " +
       "m AS (SELECT cl.cluster_rep, cl.doc_id, d.n_chars " +
       "FROM cl JOIN documents d USING (doc_id)), " +
       "ranked AS (SELECT *, row_number() OVER (PARTITION BY cluster_rep " +
       "ORDER BY n_chars DESC, doc_id) AS rn, " +
       "COUNT(*) OVER (PARTITION BY cluster_rep) AS n_members FROM m) " +
       "SELECT cluster_rep, CAST(n_members AS BIGINT) AS n_members, " +
       "doc_id AS survivor_id, n_chars AS survivor_chars " +
       "FROM ranked WHERE rn = 1 AND n_members > 1 ORDER BY cluster_rep"),
    // each FK edge recomputed with NOT EXISTS
    "x118_ri_audit" -> {
      def e(name: String, child: String, fk: String, parent: String,
          pk: String): String =
        s"SELECT '$name' AS fk_edge, " +
        s"CAST((SELECT COUNT(*) FROM $child) AS BIGINT) AS n_child, " +
        s"CAST((SELECT COUNT(*) FROM $child ch WHERE NOT EXISTS " +
        s"(SELECT 1 FROM $parent pa WHERE pa.$pk = ch.$fk)) AS BIGINT) " +
        "AS n_orphans, " +
        s"(SELECT COUNT(*) FROM $child ch WHERE NOT EXISTS " +
        s"(SELECT 1 FROM $parent pa WHERE pa.$pk = ch.$fk)) = 0 AS ri_ok"
      Seq(
        e("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        e("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        e("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        e("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        e("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        e("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        e("nation->region", "nation", "n_regionkey", "region", "r_regionkey"))
        .mkString("SELECT * FROM (", " UNION ALL ", ") t ORDER BY fk_edge")
    },
    // same A-ES score formula, same hash, same rounding
    "x114_weighted_sample" ->
      ("SELECT doc_id, CAST(length(text) AS DOUBLE) AS w, " +
       "round(ln((" + Det.sql.md5Bucket("CAST(doc_id AS VARCHAR)", 13) +
       " + 0.5) / POWER(16, 13)) / CAST(length(text) AS DOUBLE), 10) " +
       "AS score FROM documents WHERE length(text) > 0 " +
       "ORDER BY score DESC, doc_id LIMIT 50"),
    // same seeded inverse-CDF Laplace draw per released key
    "x115_dp_counts" ->
      ("WITH g AS (SELECT event_type, COUNT(*) AS n_true, " +
       "(" + Det.sql.md5Bucket("event_type", 13) +
       " + 0.5) / POWER(16, 13) - 0.5 AS c FROM events GROUP BY 1) " +
       "SELECT event_type, n_true, " +
       "round(n_true + round(-sign(c) * ln(1.0 - 2.0 * abs(c)), 6), 6) " +
       "AS n_released FROM g ORDER BY event_type"),
    // the MV recomputed from the corrected order set — deletes out,
    // updates restated
    "x113_mv_retraction" ->
      ("SELECT o_orderstatus, " +
       "epoch_us(date_trunc('month', o_orderdate)) // 1000000 " +
       "AS month_start, " +
       "CAST(COUNT(*) AS BIGINT) AS n, " +
       "CAST(SUM(CASE WHEN o_orderkey % 7 = 0 " +
       "THEN CAST(o_totalprice AS DECIMAL(18,4)) + 100.00 " +
       "ELSE CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS total " +
       "FROM orders WHERE o_orderkey % 11 <> 0 " +
       "GROUP BY 1, 2 ORDER BY o_orderstatus, month_start"))
}
