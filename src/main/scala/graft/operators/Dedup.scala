package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection — SURVEY §2.8 L2 (MinHash + LSH) and the
  * SimHash extra. Word-set similarity is useless on this corpus (31-word
  * vocabulary saturates sets — FIXTURES.md), so everything works on
  * 3-gram word shingles.
  *
  * Scale design: the pipeline is shuffle-bounded, never O(n²) —
  *   shingle → minhash signature (one grouped agg) → LSH band buckets
  *   (explode 64 bands) → candidate pairs only within equal buckets
  *   (self-join on the band key) → exact Jaccard verify on candidates.
  * With b=64 bands of r=2 rows the detection probability at J=0.6 is
  * 1-(1-0.6²)^64 ≈ 1-3.7e-13 — deterministically catches every planted
  * pair — while J=0.1 pairs almost never bucket together, so the
  * candidate set stays tiny. All hash seeds are fixed (SURVEY §7.3#9).
  */
object Dedup {

  private val Prime = 2147483647L // 2^31 - 1
  private val NumPerms = 128
  private val BandRows = 2 // r=2 → 64 bands

  /** Fixed-seed universal-hash parameters (a odd, b nonzero). */
  private[operators] val perms: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPerms)((rnd.nextInt(Int.MaxValue - 2).toLong * 2 + 1,
      rnd.nextInt(Int.MaxValue - 1).toLong + 1))
  }

  /** Distinct (doc_id, shingle-string) pairs — the exact-verify ground
    * set, identical to what the DuckDB oracle computes. */
  def shingleSet(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.ngrams(spark, sfDir, 3)
      .select(col("doc_id"), col("ngram")).distinct()

  /** MinHash signatures: one row per doc, NumPerms min-hash columns.
    * A single grouped aggregation — signature state is 128 longs per doc
    * regardless of corpus size. */
  def signatures(spark: SparkSession, sfDir: String): DataFrame = {
    // nonnegative 32-bit shingle hash, widened to long for the affine perm
    // (pmod, not (h + Prime) % Prime: the latter yields -1 for Int.MinValue)
    val sh = shingleSet(spark, sfDir)
      .withColumn("h", pmod(hash(col("ngram")).cast("long"), lit(Prime)))
    val mins = perms.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("h") + lit(b)) % Prime).as(s"m$i")
    }
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH band buckets: (doc_id, band_idx, band_hash). */
  def bands(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = signatures(spark, sfDir)
    val bandCols = (0 until NumPerms / BandRows).map { bi =>
      val rows = (0 until BandRows).map(ri => col(s"m${bi * BandRows + ri}"))
      xxhash64((lit(bi) +: rows): _*)
    }
    sig.select(col("doc_id"), posexplode(array(bandCols: _*))
      .as(Seq("band_idx", "band_hash")))
  }

  /** L2 — MinHash-LSH near-dedup: candidate pairs from shared buckets,
    * then exact shingle-Jaccard > 0.6 verification. Output is identical
    * to the oracle's exhaustive exact computation as long as LSH recall
    * at the threshold is 1 (see class doc). */
  def l2MinHashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val b1 = bands(spark, sfDir)
    val b2 = b1.select(col("doc_id").as("doc_b0"),
      col("band_idx").as("bi2"), col("band_hash").as("bh2"))
    val cands = b1.join(b2,
        col("band_idx") === col("bi2") && col("band_hash") === col("bh2") &&
        col("doc_id") < col("doc_b0"))
      .select(col("doc_id").as("doc_a"), col("doc_b0").as("doc_b"))
      .distinct()

    val s = shingleSet(spark, sfDir)
    val sizes = s.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val sa = s.select(col("doc_id").as("da"), col("ngram"))
    val sb = s.select(col("doc_id").as("db"), col("ngram").as("ngram_b"))
    val inter = cands
      .join(sa, col("doc_a") === col("da"))
      .join(sb, col("doc_b") === col("db") && col("ngram") === col("ngram_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") > 0.6)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** X1 — SimHash: 64-bit signed projection of the doc's shingle set;
    * near-dups differ in few bits (verified in ScalaTest against the
    * planted pairs). Bit-majority is computed columnar: explode shingles,
    * sum ±1 per bit, reassemble. Emitted as the raw signature (rows-only
    * check; not portably SQL-expressible). */
  def x1SimHash(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shingleSet(spark, sfDir)
      .withColumn("h", xxhash64(col("ngram")))
    // per (doc, bit): contribution +1 if bit set else -1; then majority
    val bitCols = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1L) === 1L, 1)
        .otherwise(-1)).as(s"s$b")
    }
    val agg = sh.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"s$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), sig.as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** X12 — dedup clustering: connected components over the verified
    * near-dup pair graph, each doc labeled with its cluster representative
    * (minimum doc_id reachable). Iterative min-label propagation: each
    * round is one distributed join+agg, converging in O(log component
    * diameter) rounds; lineage is truncated per round with
    * localCheckpoint so the plan stays constant-size. This is the step a
    * real pipeline runs after pair detection — "keep one doc per cluster". */
  def x12DedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = l2MinHashDedup(spark, sfDir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < 15) {
      val nbrMin = edges.join(labels, edges("b") === labels("id"))
        .groupBy(col("a")).agg(min(col("label")).as("nbr_label"))
      val updated = labels.join(nbrMin, labels("id") === nbrMin("a"), "left_outer")
        .select(labels("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("new_label"))
        .localCheckpoint(true)
      val changed = updated.join(labels, "id")
        .filter(col("new_label") =!= col("label")).count()
      labels = updated.withColumnRenamed("new_label", "label")
      converged = changed == 0
      iter += 1
    }
    if (!converged) {
      // never expected at contract scale (components are near-dup clusters
      // of diameter ≪ 15), but do not let a truncated propagation pass
      // silently as a correct clustering
      System.err.println(
        s"[x12] label propagation hit the $iter-iteration cap before converging")
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_rep"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l2_minhash_dedup" -> (l2MinHashDedup _),
    "x12_dedup_clusters" -> (x12DedupClusters _),
    "x1_simhash" -> (x1SimHash _))

  /** Oracle: exhaustive exact shingle-Jaccard (O(pairs-sharing-a-shingle),
    * fine at oracle scale; the Spark side must find the same pairs via LSH). */
  val oracles: Map[String, String] = Map(
    "l2_minhash_dedup" ->
      (s"WITH s AS (SELECT DISTINCT doc_id, ngram FROM (${TextOps.ngramSql(3)}) t), " +
       "n AS (SELECT doc_id, COUNT(*) AS n_sh FROM s GROUP BY doc_id), " +
       "i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter " +
       "FROM s a JOIN s b ON a.ngram = b.ngram AND a.doc_id < b.doc_id " +
       "GROUP BY 1, 2) " +
       "SELECT doc_a, doc_b, inter / (na.n_sh + nb.n_sh - inter) AS jaccard " +
       "FROM i JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b " +
       "WHERE inter / (na.n_sh + nb.n_sh - inter) > 0.6 ORDER BY doc_a, doc_b"),
    "x12_dedup_clusters" ->
      (s"WITH RECURSIVE s AS (SELECT DISTINCT doc_id, ngram FROM (${TextOps.ngramSql(3)}) t), " +
       "n AS (SELECT doc_id, COUNT(*) AS n_sh FROM s GROUP BY doc_id), " +
       "i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter " +
       "FROM s a JOIN s b ON a.ngram = b.ngram AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
       "pairs AS (SELECT doc_a, doc_b FROM i " +
       "JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b " +
       "WHERE inter / (na.n_sh + nb.n_sh - inter) > 0.6), " +
       "edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs " +
       "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
       "reach AS (SELECT DISTINCT a AS src, a AS dst FROM edges " +
       "UNION SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a) " +
       "SELECT src AS doc_id, MIN(dst) AS cluster_rep FROM reach " +
       "GROUP BY src ORDER BY doc_id"))
}
