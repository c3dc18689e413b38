package graft

import graft.operators.{Dedup, Multimodal, SimSearch, TextOps}

class LlmOpsSpec extends SparkSpec {
  test("l2 minhash-lsh finds the planted near-dup pairs (incl. known ones)") {
    val pairs = Dedup.l2MinHashDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // FIXTURES.md: planted pairs at sf0.001 include (0,50), (5,450), (8,120)
    assert(pairs.contains((0L, 50L)), s"missing (0,50) in $pairs")
    assert(pairs.contains((5L, 450L)))
    assert(pairs.contains((8L, 120L)))
    assert(pairs.size >= 25, s"expected ~28 planted pairs, got ${pairs.size}")
  }

  test("l2 jaccard values are in (0.6, 1]") {
    Dedup.l2MinHashDedup(spark, sf).collect().foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.6 && j <= 1.0)
    }
  }

  test("x1 simhash: planted near-dup pairs have small hamming distance") {
    val sig = Dedup.simHashSignatures(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(0L), sig(50L)) <= 12)
    assert(ham(sig(5L), sig(450L)) <= 12)
    // random pair baseline: expect ~32 bits differing
    val rand = ham(sig(1L), sig(301L))
    assert(rand > 12, s"random pair unexpectedly close: $rand")
  }

  test("x12 clusters: both endpoints of every pair share a representative") {
    val reps = Dedup.x12DedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep")).toMap
    val pairs = Dedup.l2MinHashDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    pairs.foreach { case (a, b) =>
      assert(reps(a) == reps(b), s"pair ($a,$b) split across clusters")
    }
    // representative is the minimum member of its cluster
    reps.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.keys.min == rep)
    }
  }

  test("l3 top-k: self excluded, ranks 1..5, sims descending") {
    val rows = SimSearch.l3TopKCosine(spark, sf).collect()
    assert(rows.length == 50)
    rows.groupBy(_.getAs[Long]("probe_id")).values.foreach { g =>
      assert(g.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val sims = g.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      g.foreach(r => assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("probe_id")))
    }
  }

  test("x8 IVF ANN: recall@5 >= 0.5 vs brute force, top-1 usually found") {
    val brute = SimSearch.l3TopKCosine(spark, sf).collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val ivf = SimSearch.x8IvfAnnRaw(spark, sf).collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = brute.keys.toSeq.map { p =>
      val found = ivf.getOrElse(p, Set.empty)
      brute(p).intersect(found).size.toDouble / brute(p).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean; per-probe $recalls")
  }

  test("x3 langid emits one prediction per doc from the known lang set") {
    val rows = Multimodal.x3LangId(spark, sf).collect()
    val langs = Set("en", "fr", "es", "zh", "de")
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    rows.foreach(r => assert(langs.contains(r.getAs[String]("pred_lang"))))
  }

  test("x7 binary decode: deterministic, bounded fake dimensions") {
    val a = Multimodal.x7BinaryDecode(spark, sf).collect()
    val b = Multimodal.x7BinaryDecode(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    a.foreach { r =>
      assert(r.getAs[Long]("width") >= 1L && r.getAs[Long]("width") <= 640L)
      assert(r.getAs[Long]("height") >= 1L && r.getAs[Long]("height") <= 480L)
    }
  }

  test("x6 fingerprint: near-dup docs share or nearly share fingerprints") {
    val fps = TextOps.x6Fingerprint(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    // (8,120) has Jaccard 0.99 — an 8-gram window min-hash should collide
    assert(fps(8L) == fps(120L), "0.99-similar docs should share min-md5 fingerprint")
  }
}
