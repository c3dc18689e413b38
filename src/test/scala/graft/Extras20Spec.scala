package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, CurationOps, SqlSurface}

class Extras20Spec extends SparkSpec {

  test("sql50: TABLESAMPLE claims all hold, and the PERCENT grain " +
      "genuinely samples (neither empty nor the whole table)") {
    val r = SqlSurface.sql50Tablesample(spark, sf).head()
    val baseN = Tables.lineitem(spark, sf).count()
    assert(r.getAs[Long]("base_n") == baseN)
    assert(r.getAs[Boolean]("rows_exact"))
    assert(r.getAs[Boolean]("pct_in_bounds"))
    assert(r.getAs[Boolean]("repeatable_stable"))
    assert(r.getAs[Boolean]("subset_ok"))
    // the PERCENT grain is a real Bernoulli filter, not a no-op: the
    // sampled count is strictly between 0 and the base count (the
    // in-bounds claim already pins it to [0.05n, 0.15n], but assert
    // the raw behavior independently of the claim plumbing)
    Tables.lineitem(spark, sf).createOrReplaceTempView("li_spec50")
    val n = spark.sql("SELECT * FROM li_spec50 " +
      "TABLESAMPLE (10 PERCENT) REPEATABLE (7)").count()
    assert(n > 0 && n < baseN, s"sampled $n of $baseN")
    // ROWS grain caps at the table size when the table is smaller
    val tiny = spark.sql("SELECT * FROM li_spec50 " +
      s"TABLESAMPLE (${baseN + 1000} ROWS)").count()
    assert(tiny == baseN, "ROWS grain must cap at the table size")
  }

  test("x173: incremental SemDeDup equals the brute trained-assign + " +
      "same-cluster probe-vs-corpus recompute; probes never pair with " +
      "probes, the corpus is never self-paired") {

    val out = CurationOps.x173SemDedupIncr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // shape contract: every pair is (probe, corpus-original)
    out.foreach { case (nw, old) =>
      assert(nw >= graft.operators.EmbedOps.CloneOffset && old < graft.operators.EmbedOps.CloneOffset)
    }
    // brute: centroids trained on originals, all vectors assigned,
    // exhaustive probe x corpus pairs within equal clusters
    val all = graft.operators.EmbedOps.cloneCorpus(spark, sf)
    val vecs = all.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val emb = all.filter(col("vec_id") < graft.operators.EmbedOps.CloneOffset)
    val asg = Clustering.kmeansAssignTrained(emb, all,
        "vec_id", "embedding", 8, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probes = vecs.keySet.filter(_ >= graft.operators.EmbedOps.CloneOffset)
    val corpus = vecs.keySet.filter(_ < graft.operators.EmbedOps.CloneOffset)
    val brute = (for {
      p <- probes; c <- corpus if asg(p) == asg(c)
      dot = vecs(p).zip(vecs(c)).map { case (x, y) => x * y }.sum
      if BigDecimal(dot).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble >= 0.8
    } yield (p, c)).toSet
    assert(out == brute, s"got ${out.size} pairs, brute ${brute.size}")
    assert(brute.nonEmpty, "row must be non-vacuous at this sf")
  }

  test("x174 silhouette kernel: tight planted blobs score near 1, a " +
      "boundary-riding point drags its cluster mean down, output is " +
      "deterministic") {
    import spark.implicits._
    // two tight blobs on orthogonal axes, INTERLEAVED by id parity so
    // the two lowest-id seeds land in different blobs (the x134 spec
    // construction), + later one midway point: blob means near 1, the
    // straddler drags its cluster down
    def v(axis: Int, eps: Float): Seq[Float] = {
      val a = Array.fill(64)(0.0f); a(axis) = 1.0f; a(40) = eps; a.toSeq
    }
    val blobs = (0 until 10).map(i =>
        (i.toLong, v(i % 2, 0.01f * (i / 2))))
      .toDF("row_id", "emb")
    val s1 = graft.operators.Clustering
      .silhouette(blobs, "row_id", "emb", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(s1.size == 2 && s1.values.forall(_._1 == 5L))
    assert(s1.values.forall(_._2 > 0.9), s"blob silhouettes: $s1")
    val mid = Array.fill(64)(0.0f); mid(0) = 0.7f; mid(1) = 0.7f
    val withMid = blobs.unionByName(
      Seq((99L, mid.toSeq)).toDF("row_id", "emb"))
    val s2 = graft.operators.Clustering
      .silhouette(withMid, "row_id", "emb", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    val (withStraddler, clean) =
      (s2.values.map(_._2).min, s2.values.map(_._2).max)
    assert(withStraddler < 0.9 && clean > 0.9,
      s"straddler must drag one cluster's mean: $s2")
    // determinism on the corpus binding
    val a = graft.operators.Clustering.x174Silhouette(spark, sf).collect()
    val b = graft.operators.Clustering.x174Silhouette(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }

  test("x175: D4 pruning operates exactly on x172's kept set, ranks " +
      "are a per-cluster permutation, and the pruned rows are exactly " +
      "ranks 1..floor(0.2n)") {

    val sem = CurationOps.x172SemDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val keptIds = sem.collect { case (id, (_, true)) => id }.toSet
    val out = CurationOps.x175D4Prune(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.map(_._1).toSet == keptIds,
      "D4 must rank exactly the SemDeDup survivors")
    out.foreach { case (id, cl, _, _) =>
      assert(cl == sem(id)._1, s"cluster mismatch for $id")
    }
    out.groupBy(_._2).foreach { case (cl, rows) =>
      val n = rows.length
      val dropn = math.floor(0.2 * n).toLong
      val ranks = rows.map(_._3).sorted
      assert(ranks.sameElements(1L to n),
        s"ranks must be a permutation in cluster $cl")
      val pruned = rows.filter(!_._4).map(_._3).toSet
      assert(pruned == (1L to dropn).toSet,
        s"cluster $cl must prune exactly ranks 1..$dropn, got $pruned")
    }
    // determinism (staged artifact reload included)
    val again = CurationOps.x175D4Prune(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.sameElements(again))
  }

  test("st26: streaming semantic dedup equals the batch x173 " +
      "complement exactly, and the replay really ran multiple " +
      "micro-batches") {

    val kept = graft.streaming.Streams.st26StreamSemDedup(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val matched = CurationOps.x173SemDedupIncr(spark, sf)
      .select(col("id_new")).collect().map(_.getLong(0)).toSet
    val probes = graft.operators.EmbedOps.cloneCorpus(spark, sf)
      .filter(col("vec_id") >= graft.operators.EmbedOps.CloneOffset)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(kept == probes -- matched,
      s"stream survivors (${kept.size}) must equal probes " +
        s"(${probes.size}) minus batch-matched (${matched.size})")
    assert(matched.nonEmpty && kept.nonEmpty,
      "both sides must be non-vacuous at this sf")
    // the replay genuinely split into file-batches
    val perBatch = spark.read
      .parquet(Tables.scratchDir("st26_out", sf))
      .select(col("batch_id")).distinct().count()
    assert(perBatch >= 2, s"expected >= 2 micro-batches, got $perBatch")
  }

  test("x176: soft-dedup weights are 1/cluster-size over the x12 " +
      "components, singletons weigh 1, and each cluster's mass sums " +
      "to ~1") {
    val out = CurationOps.x176SoftDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.size == Tables.documents(spark, sf).count())
    val labels = graft.operators.Dedup.ccLabelsFrame(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = labels.groupBy(_._2).map { case (rep, m) => rep -> m.size }
    out.foreach { case (id, (sz, w)) =>
      val expectSz = labels.get(id).map(sizes(_)).getOrElse(1)
      assert(sz == expectSz, s"cluster size mismatch for $id")
      assert(math.abs(w - BigDecimal(1.0 / expectSz)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    assert(labels.nonEmpty, "must be non-vacuous: clusters exist")
    // per-cluster sampling mass ~ 1 (rounding loss < 1e-5 per member)
    labels.groupBy(_._2).foreach { case (_, members) =>
      val mass = members.keys.toSeq.map(out(_)._2).sum
      assert(math.abs(mass - 1.0) < 1e-4 * members.size)
    }
  }

  test("x177: DSIR weights favor the target slice on average, bigram " +
      "accounting is exact, and the scoring is deterministic") {
    val out = CurationOps.x177DsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == Tables.documents(spark, sf).count())
    // exact bigram accounting: sum over docs == total occurrences
    val totalBigrams = graft.api.TextPipeline
      .ngramRows(Tables.documents(spark, sf), "doc_id", "text", 2)
      .count()
    assert(out.map(_._2).sum == totalBigrams)
    // the signal points the right way: target-slice docs average a
    // HIGHER importance weight than the rest (they define the target
    // model; per-bigram normalization keeps lengths comparable)
    val (tgt, rest) = out.filter(_._2 > 0).partition(_._1 % 97 == 0)
    assert(tgt.nonEmpty && rest.nonEmpty)
    def meanPerBigram(xs: Array[(Long, Long, Double)]): Double =
      xs.map(x => x._3 / x._2).sum / xs.length
    assert(meanPerBigram(tgt) > meanPerBigram(rest),
      s"target mean ${meanPerBigram(tgt)} must exceed " +
        s"rest mean ${meanPerBigram(rest)}")
    val again = CurationOps.x177DsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.sameElements(again))
  }

  test("x178: CCNet buckets are per-language terciles — exact sizes, " +
      "rank a permutation, and head genuinely outscores tail") {
    val out = CurationOps.x178CcnetBuckets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getString(4)))
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val n = rows.length
      val (t1, t2) = (n / 3, 2 * n / 3)
      assert(rows.map(_._4).sorted.sameElements(1L to n),
        s"rank must be a permutation for $lang")
      val sizes = rows.groupBy(_._5).view.mapValues(_.size).toMap
      assert(sizes.getOrElse("tail", 0) == t1 &&
        sizes.getOrElse("middle", 0) == t2 - t1 &&
        sizes.getOrElse("head", 0) == n - t2,
        s"$lang tercile sizes off: $sizes (n=$n)")
      // rank follows lp: min head lp >= max tail lp
      if (sizes.getOrElse("head", 0) > 0 && sizes.getOrElse("tail", 0) > 0) {
        val headMin = rows.filter(_._5 == "head").map(_._3).min
        val tailMax = rows.filter(_._5 == "tail").map(_._3).max
        assert(headMin >= tailMax, s"$lang: head min $headMin < " +
          s"tail max $tailMax")
      }
    }
    assert(out.map(_._5).distinct.sorted.sameElements(
      Array("head", "middle", "tail")), "all three buckets populated")
  }

  test("x172b guard: a planted straddling near-dup pair is COUNTED " +
      "as data (and recovered by the top-2 multi-probe), and the " +
      "corpus guard row equals an independent pair classification") {
    import spark.implicits._

    // two blobs; seeds (the 2 lowest ids) land one per blob; ids 5/6
    // are a near-dup pair (dot 0.9936) riding the blob boundary so
    // k-means splits them — the pair the grouped machinery documentedly
    // drops. Band layout (2 bands over 4 dims): each planted pair
    // shares its trailing band, nothing else collides.
    val rows = Seq(
      (1L, Seq(1.0f, 0.05f, 0.01f, 0.01f)),
      (2L, Seq(0.05f, 1.0f, 0.02f, 0.02f)),
      (3L, Seq(0.9f, 0.1f, 0.01f, 0.01f)),
      (4L, Seq(0.1f, 0.9f, 0.02f, 0.02f)),
      (5L, Seq(0.72f, 0.69f, 0.0f, 0.0f)),
      (6L, Seq(0.69f, 0.72f, 0.0f, 0.0f))).toDF("id", "vec")
    val g = CurationOps.semDedupStraddleGuard(rows, "id", "vec",
      k = 2, iters = 1, threshold = 0.8, numBands = 2, dims = 4).head()
    assert(g.getAs[Long]("n_pairs") == 3L)
    assert(g.getAs[Long]("n_within") == 2L, "the two in-blob pairs")
    assert(g.getAs[Long]("n_straddling") == 1L,
      "the planted straddling pair must be COUNTED, not just documented")
    assert(g.getAs[Long]("n_recovered_top2") == 1L,
      "at k=2 the top-2 probe always recovers a straddler")
    // the same straddling pair is invisible to the grouped (x172)
    // machinery — the loss the guard row quantifies
    val asg = Clustering.kmeansAssignTop2(rows, "id", "vec", 2, 1)
      .select(col("vid"), col("c1").as("cluster"))
    val grouped = graft.api.VectorPipeline.groupedCosinePairs(
      rows.join(asg, rows("id") === asg("vid")), "id", "vec", "cluster",
      0.8, numBands = 2, dims = 4)
    assert(grouped.count() == 2L,
      "grouped machinery sees only the within-cluster pairs")

    // corpus binding: the contract row equals a driver-side
    // classification of the staged x41 pairs under a recomputed
    // top-2 assignment
    val row = CurationOps.x172bStraddleGuard(spark, sf).head()
    val top2 = Clustering.kmeansAssignTop2(
        graft.operators.EmbedOps.cloneCorpus(spark, sf), "vec_id", "embedding", 8, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val pairs = graft.operators.EmbedOps.clonePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nWithin = pairs.count { case (a, b) => top2(a)._1 == top2(b)._1 }
    val straddlers = pairs.filter { case (a, b) =>
      top2(a)._1 != top2(b)._1 }
    val nRec = straddlers.count { case (a, b) =>
      val (a1, a2) = top2(a)
      val (b1, b2) = top2(b)
      a1 == b2 || a2 == b1 || a2 == b2
    }
    assert(row.getAs[Long]("n_pairs") == pairs.length.toLong)
    assert(row.getAs[Long]("n_within") == nWithin.toLong)
    assert(row.getAs[Long]("n_straddling") == straddlers.length.toLong)
    assert(row.getAs[Long]("n_recovered_top2") == nRec.toLong)
    assert(row.getAs[Long]("n_within") +
      row.getAs[Long]("n_straddling") == row.getAs[Long]("n_pairs"))
  }
}
