package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.TextPipeline

class Extras7Spec extends SparkSpec {
  import spark.implicits._

  /** Exhaustive exact Jaccard over a hashed shingle frame — the brute
    * force the prefix filter must reproduce exactly. */
  private def brutePairs(sh: DataFrame, t: Double): Set[(Long, Long, Double)] = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("da"), col("ng_h"))
    val b = sh.select(col("doc_id").as("db"), col("ng_h").as("hb"))
    a.join(b, col("ng_h") === col("hb") && col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .select(col("da"), col("db"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("j"))
      .filter(col("j") > t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def shingleFrame(sets: Seq[(Long, Seq[Long])]): DataFrame =
    sets.flatMap { case (id, hs) => hs.map(id -> _) }.toDF("doc_id", "ng_h")

  test("prefix Jaccard join equals brute force on a corpus with duplicate classes and near-dups") {
    // 3-member exact-duplicate class, one genuine near-pair (J = 0.6),
    // one borderline-below pair (J = 0.5, excluded by the strict >),
    // and ambient disjoint docs.
    val sets = Seq(
      1L -> Seq(10L, 11L, 12L, 13L),          // class rep
      2L -> Seq(10L, 11L, 12L, 13L),          // dup
      3L -> Seq(10L, 11L, 12L, 13L),          // dup
      4L -> Seq(10L, 11L, 12L, 14L),          // J(1,4)=3/5=0.6 > 0.5
      5L -> Seq(10L, 11L, 15L, 16L),          // J(1,5)=2/6=1/3
      6L -> Seq(20L, 21L, 22L, 23L, 24L, 25L), // disjoint
      7L -> Seq(30L, 31L))
    val sh = shingleFrame(sets)
    val detail = TextPipeline.prefixJaccardPairsDetail(sh, 0.5)
    val got = detail.pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brutePairs(sh, 0.5))
    // the duplicate class expands to its 3 intra pairs at exactly 1.0
    // and every member inherits the rep's cross pair with doc 4
    assert(got.filter(_._3 == 1.0).map(p => (p._1, p._2)) ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got.count(p => p._2 == 4L || p._1 == 4L) == 3)
    assert(detail.stopTokens.count() == 0)
    val classes = detail.classes.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(classes(2L) == 1L && classes(3L) == 1L && classes(6L) == 6L)
  }

  test("rare-first prefixes keep frequent tokens out of the candidate join") {
    // 40 docs sharing one frequent token, each with a unique rare one:
    // at t = 0.9 the prefix is ONE token and rare-first ordering makes
    // it the unique token, so there are zero candidate collisions even
    // though every pair shares the hot token.
    val sets = (0 until 40).map(i => (i.toLong, Seq(999L, 1000L + i)))
    val detail = TextPipeline.prefixJaccardPairsDetail(shingleFrame(sets), 0.9)
    assert(detail.pairs.count() == 0)
    assert(detail.stopTokens.count() == 0)
  }

  test("hot prefix tokens are stop-listed, reported, and the cap bounds the join input") {
    // At t = 0.3 the 2-token docs keep BOTH tokens in their prefixes, so
    // the shared token appears in 40 prefixes: above the cap of 16 it is
    // stop-listed (reported, candidates suppressed); with the cap lifted
    // the same corpus yields all 40*39/2 true pairs at J = 1/3.
    val sets = (0 until 40).map(i => (i.toLong, Seq(999L, 1000L + i)))
    val sh = shingleFrame(sets)
    val capped = TextPipeline.prefixJaccardPairsDetail(sh, 0.3,
      hotTokenCap = 16L)
    val stops = capped.stopTokens.collect()
    assert(stops.length == 1 && stops(0).getLong(1) == 40L)
    assert(capped.pairs.count() == 0)
    val uncapped = TextPipeline.prefixJaccardPairsDetail(sh, 0.3,
      hotTokenCap = 1000L)
    assert(uncapped.pairs.count() == 40L * 39 / 2)
    assert(uncapped.pairs.collect().forall(r =>
      math.abs(r.getDouble(2) - 1.0 / 3) < 1e-12))
  }

  test("prefix Jaccard matches the LSH pipeline at its own operating point") {
    // Same corpus, both pipelines at t = 0.6: the exact join must find
    // precisely the pairs the (recall-1-by-construction) LSH verify
    // emits on the contract corpus.
    val dir = "/root/testdata/sf0.001"
    val sh = graft.operators.Dedup.shingleHashSet(spark, dir)
    val exact = TextPipeline.prefixJaccardPairs(sh, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = TextPipeline.nearDupPairsHashed(sh).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact == lsh)
    assert(exact.nonEmpty)
  }

  test("incremental prefix Jaccard equals cross-side brute force, incl. probe-only tokens") {
    // corpus docs 1-4; probes: 11 (near-dup of 1 with one UNSEEN token —
    // ranks rarest under the index order, lemma must still hold), 12
    // (exact copy of 2), 13 (disjoint)
    val corpus = shingleFrame(Seq(
      1L -> Seq(10L, 11L, 12L, 13L),
      2L -> Seq(20L, 21L, 22L, 23L),
      3L -> Seq(10L, 30L, 31L, 32L),
      4L -> Seq(40L, 41L)))
    val probes = shingleFrame(Seq(
      11L -> Seq(10L, 11L, 12L, 999L),   // J(11,1)=3/5=0.6; 999 unseen
      12L -> Seq(20L, 21L, 22L, 23L),    // J(12,2)=1.0
      13L -> Seq(50L, 51L, 52L)))
    val got = TextPipeline.prefixJaccardAgainst(probes, corpus, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((11L, 1L, 0.6), (12L, 2L, 1.0)))
  }

  test("incremental prefix Jaccard: hot corpus prefix tokens are stop-listed") {
    // 40 corpus docs share token 999 in their prefixes (t=0.3 keeps both
    // tokens of a 2-token doc); with cap 16 the probe finds nothing via
    // the hot token, with the cap lifted it pairs with every corpus doc
    val corpus = shingleFrame((0 until 40).map(i => (i.toLong, Seq(999L, 1000L + i))))
    val probe = shingleFrame(Seq(500L -> Seq(999L, 2000L)))
    val capped = TextPipeline.prefixJaccardAgainst(probe, corpus, 0.3,
      hotTokenCap = 16L)
    assert(capped.count() == 0)
    val uncapped = TextPipeline.prefixJaccardAgainst(probe, corpus, 0.3,
      hotTokenCap = 1000L)
    assert(uncapped.count() == 40L)
    assert(uncapped.collect().forall(r =>
      math.abs(r.getDouble(2) - 1.0 / 3) < 1e-12))
  }

  test("LM score ranks corpus-typical text above incoherent text") {
    // 20 near-identical documents build a model where their shared
    // bigrams are frequent; one ransom-note document of the same length
    // from singleton words scores strictly lower.
    val typical = (0 until 20).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val noise = Seq((99L, "zq xv jk wp mn bg ht rd lc fs"))
    val docs = (typical ++ noise).toDF("doc_id", "text")
    val scores = TextPipeline.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(0L) == scores(19L)) // identical docs, identical score
    assert(scores(99L) < scores(0L))
    // 9-word typical docs -> 8 bigrams; the 10-word noise doc -> 9
    val n = TextPipeline.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(0L) == 8L && n(99L) == 9L)
  }

  test("sql30: SQL UDFs are inlined — no UDF node survives into the plans") {
    val df = graft.operators.SqlSurface.sql30SqlUdf(spark, sf)
    // the analyzer expands disc_price/charge to their defining
    // expressions; an opaque function node in either plan would mean the
    // hot path fell out of codegen
    val optimized = df.queryExecution.optimizedPlan.toString
    val physical = df.queryExecution.executedPlan.toString
    for (plan <- Seq(optimized, physical)) {
      assert(!plan.contains("ScalaUDF"), plan.take(500))
      assert(!plan.toLowerCase.contains("disc_price"), plan.take(500))
    }
    // and the inlined arithmetic computes the same revenue as the
    // directly-written expression
    val direct = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"))
        .cast("double").as("revenue"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaUdf = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaUdf == direct)
  }

  test("sql31: correlated SQL table function equals the hand-written lateral") {
    val viaTf = graft.operators.SqlSurface.sql31SqlTableFn(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = Tables.supplier(spark, sf)
      .filter(col("s_acctbal") > 1000.0)
      .join(Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey"))
      .agg(count(lit(1)).as("n_rich"), max(col("s_acctbal")).as("top_bal"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaTf == direct && viaTf.nonEmpty)
  }

  test("f22: observed metrics ride the consuming query and match direct aggregates") {
    val obs = new org.apache.spark.sql.Observation("x7spec_gate")
    val li = Tables.lineitem(spark, sf).observe(obs,
      count(lit(1)).as("n_rows"))
    // CollectMetrics must be in the plan of the consumer
    val consumer = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    assert(consumer.queryExecution.optimizedPlan.toString
      .contains("CollectMetrics"))
    consumer.count()
    val direct = Tables.lineitem(spark, sf).count()
    assert(obs.get("n_rows").asInstanceOf[Long] == direct)
    // and the contract row's single-row frame carries the same values
    val row = graft.operators.Scalars.f22Observe(spark, sf).head
    assert(row.getAs[Long]("n_rows") == direct)
    assert(row.getAs[Long]("n_groups") == 3L)
  }

  test("LM score is exact: hand-computed two-doc model") {
    // doc 1: "a b a b" -> bigrams ab, ba, ab; doc 2: "a c".
    // unigrams: a=3? no: doc1 a,b,a,b + doc2 a,c -> c(a)=3, c(b)=2, c(c)=1, V=3.
    // c2: ab=2, ba=1, ac=1.
    // doc1 lp = (ln(3/6) + ln(2/5) + ln(3/6)) / 3 ; doc2 lp = ln(2/6).
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val scores = TextPipeline.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val lp1 = (math.log(3.0 / 6) + math.log(2.0 / 5) + math.log(3.0 / 6)) / 3
    val lp2 = math.log(2.0 / 6)
    assert(scores(1L)._1 == 3L)
    assert(scores(2L)._1 == 1L)
    assert(math.abs(scores(1L)._2 - lp1) < 1e-6)
    assert(math.abs(scores(2L)._2 - lp2) < 1e-6)
  }
}
