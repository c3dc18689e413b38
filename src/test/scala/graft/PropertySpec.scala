package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property layer (SURVEY §5.2): algebraic laws that must hold
  * for any data, run over generated in-memory tables. */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop): Unit = check(prop, 20)

  private def check(prop: Prop, minTests: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(minTests).withInitialSeed(42L), prop)
    assert(res.passed, res.status.toString)
  }

  private val rowsGen =
    Gen.listOfN(60, Gen.zip(Gen.chooseNum(-50L, 50L), Gen.chooseNum(-5.0, 5.0)))

  test("filter conjunction law: filter(p && q) == filter(p).filter(q)") {
    import spark.implicits._
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v")
      val p = col("k") > 0L
      val q = col("v") < 2.5
      df.filter(p && q).count() == df.filter(p).filter(q).count()
    })
  }

  test("sort is a permutation: orderBy preserves multiset") {
    import spark.implicits._
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v")
      val sorted = df.orderBy(col("k"), col("v")).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      sorted.sorted.sameElements(rows.sorted) &&
        sorted.sameElements(rows.sorted)
    })
  }

  test("decimal-routed sum equals exact BigDecimal fold") {
    import spark.implicits._
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v")
      val got = df.agg(Det.dsum(col("v"))).collect()(0).getDouble(0)
      val expect = rows.map { case (_, v) =>
        BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      got == expect
    })
  }

  test("groupBy count partitions the table") {
    import spark.implicits._
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v")
      val grouped = df.groupBy(pmod(col("k"), lit(7L))).count()
        .agg(sum("count")).collect()(0).getLong(0)
      grouped == rows.length
    })
  }

  test("banded range-join rule: rewritten join equals nested loop, negatives included") {
    import spark.implicits._
    graft.plans.GraftExtensions.install(spark)
    // values cross zero so the pmod floor-division banding path is
    // exercised on negatives the corpus never produces
    val valsGen = Gen.listOfN(40, Gen.chooseNum(-1000L, 1000L))
    check(Prop.forAll(Gen.zip(valsGen, valsGen)) { case (as, bs) =>
      val a = as.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id_a", "ts_a")
      val b = bs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id_b", "ts_b")
      val cond = col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + lit(97L)
      val banded = a.join(b, cond, "inner")
        .select("id_a", "id_b").collect().map(_.toString).sorted.toSeq
      // reference: driver-side nested loop over the same lists
      val expect = (for {
        (av, ai) <- as.zipWithIndex
        (bv, bi) <- bs.zipWithIndex
        if bv >= av && bv <= av + 97L
      } yield s"[$ai,$bi]").sorted
      banded == expect
    })
  }

  test("connected components: path-graph worst case converges in O(log n) rounds") {
    import spark.implicits._
    // a 128-node path is the giant-component pathology: plain min-label
    // propagation needs ~127 rounds; large-star/small-star must land
    // within log2(128)+4 = 11
    val n = 128
    val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      .toDF("doc_a", "doc_b")
    val (labels, rounds) =
      graft.api.TextPipeline.connectedComponentsWithRounds(pairs)
    val got = labels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    assert(got.values.forall(_ == 0L), s"path not one component: $got")
    val bound = (math.log(n) / math.log(2)).toInt + 4
    assert(rounds <= bound, s"took $rounds rounds, bound $bound")
  }

  test("misra-gries guarantees hold for random streams, k, and partitionings") {
    import spark.implicits._
    val streamGen = for {
      k <- Gen.chooseNum(2, 6)
      parts <- Gen.chooseNum(1, 8)
      // skewed alphabet: item i drawn with weight ~ 1/(i+1)
      items <- Gen.listOfN(300, Gen.frequency(
        (0 until 12).map(i => (12 - i, Gen.const(s"it$i"))): _*))
    } yield (k, parts, items)
    check(Prop.forAll(streamGen) { case (k, parts, items) =>
      val df = spark.sparkContext.parallelize(items, parts).toDF("w")
      val sketch = df
        .agg(graft.functions.HeavyHittersAgg.heavyHitters(col("w"), k).as("hh"))
        .select(explode(col("hh")).as("c"))
        .select(col("c.item"), col("c.est")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toDouble
      val bound = n / (k + 1)
      sketch.size <= k &&
        exact.forall { case (item, cnt) =>
          cnt <= bound || sketch.contains(item) } &&
        sketch.forall { case (item, est) =>
          est <= exact(item) && exact(item) - est <= bound }
    })
  }

  test("winnowing guarantee: any shared run of >= 11 words yields a common fingerprint") {
    import spark.implicits._
    // random docs + a shared run of random length 11..20 spliced into two
    // of them at random offsets — winnowing (8-word shingles, window 4)
    // must select at least one identical fingerprint in both docs
    val word = Gen.chooseNum(0, 40).map(i => s"w$i")
    val gen = for {
      runLen <- Gen.chooseNum(11, 20)
      run <- Gen.listOfN(runLen, word)
      pre1 <- Gen.listOfN(8, word); post1 <- Gen.listOfN(8, word)
      pre2 <- Gen.listOfN(5, word); post2 <- Gen.listOfN(12, word)
      noise <- Gen.listOfN(30, word)
    } yield (pre1 ++ run ++ post1, pre2 ++ run ++ post2, noise)
    check(Prop.forAll(gen) { case (d1, d2, noise) =>
      val docs = Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")),
        (3L, noise.mkString(" "))).toDF("doc_id", "text")
      val grams = graft.api.TextPipeline.ngramRows(docs, "doc_id", "text", 8)
        .select(col("doc_id"), col("pos"), md5(col("ngram")).as("h"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos")).rowsBetween(-3, 0)
      val fps = grams.withColumn("fp", min(col("h")).over(w))
        .filter(col("pos") >= 3)
        .select(col("doc_id"), col("fp")).distinct().collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getString(1)).toSet).toMap
      (fps(1L) intersect fps(2L)).nonEmpty
    })
  }

  test("grouped banded pairs == ungrouped pairs restricted to equal " +
      "groups, for any seeded corpus under a vector-derived grouping") {
    import spark.implicits._
    // the x172 ladder's correctness core: adding the group to the band
    // key must change NOTHING except dropping cross-group pairs. Group
    // = hash(vector) % 3 — a function of the vector, as the contract
    // requires (k-means assignments are; arbitrary labels are not,
    // since exact-dup classes must never straddle groups).
    val prop = Prop.forAll(Gen.chooseNum(1L, 1000L)) { seed =>
      val rnd = new scala.util.Random(seed)
      val base = (1L to 24L).map { i =>
        (i, Array.fill(8)((rnd.nextInt(5) - 2).toFloat * 0.5f).toSeq)
      }
      // plant near-dups: clones of every 4th vector with one tweak
      val planted = base ++ base.filter(_._1 % 4 == 0).map { case (i, v) =>
        (i + 100L, v.updated(0, v.head + 0.01f))
      }
      val df = planted.toDF("id", "vec")
        .withColumn("g", abs(xxhash64(col("vec"))) % 3)
        .localCheckpoint(true)
      val grouped = graft.api.VectorPipeline.groupedCosinePairs(
          df, "id", "vec", "g", 0.5, numBands = 4, dims = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2))).toSet
      val groups = planted.map { case (i, _) => i }.toSet
      val gOf = df.select(col("id"), col("g")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val restricted = graft.api.VectorPipeline.bandedCosinePairs(
          df.select(col("id"), col("vec")), "id", "vec", 0.5,
          numBands = 4, dims = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2)))
        .filter { case (a, b, _) => gOf(a) == gOf(b) }.toSet
      require(groups.nonEmpty)
      grouped == restricted
    }
    check(prop)
    // the incremental face obeys the same law against a probe split
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 20L).map(i =>
      (i, Array.fill(8)((rnd.nextInt(5) - 2).toFloat * 0.5f).toSeq))
    val probe = corpus.filter(_._1 % 3 == 0).map { case (i, v) =>
      (i + 100L, v.updated(1, v(1) + 0.01f))
    }
    import spark.implicits._
    def g(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("g", abs(xxhash64(col("vec"))) % 2)
    val pc = g(probe.toDF("id", "vec"))
    val cc = g(corpus.toDF("id", "vec"))
    val groupedA = graft.api.VectorPipeline.groupedCosinePairsAgainst(
        pc, cc, "id", "vec", "g", 0.5, numBands = 4, dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gAll = (pc.collect() ++ cc.collect())
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val plainA = graft.api.VectorPipeline.bandedCosinePairsAgainst(
        probe.toDF("id", "vec"), corpus.toDF("id", "vec"),
        "id", "vec", 0.5, numBands = 4, dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (p, c) => gAll(p) == gAll(c) }.toSet
    assert(groupedA == plainA, s"against-form: $groupedA vs $plainA")
  }

  test("int8 quantization bounds hold for any vector") {
    import spark.implicits._
    // degenerate constant vectors (hi == lo) included: the operator
    // guards the 0/0 cell — every dimension lands in cell 0 with zero
    // dequantization error
    val vecGen = Gen.oneOf(
      Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f)),
      Gen.chooseNum(-10.0f, 10.0f).map(x => List.fill(16)(x)))
    check(Prop.forAll(Gen.listOfN(5, vecGen)) { vecs =>
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val dir = Tables.scratchDir("x34prop", sf)
      df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val rows = graft.operators.CurationOps.x34Quantize(spark, dir).collect()
      rows.forall { r =>
        r.getAs[Boolean]("err_ok") &&
          r.getAs[Long]("q_lo") == 0L && r.getAs[Long]("q_hi") <= 255L
      }
    })
  }

  test("vocab tokenizer: count law holds for any text and vocab") {
    // every word contributes 1 (in vocab) or ceil(len/4) (not) tokens —
    // and the whitespace tokenizer is the vocab tokenizer with an
    // all-covering vocab
    val wordGen = Gen.chooseNum(1, 9).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val gen = for {
      words <- Gen.listOfN(12, wordGen)
      vocab <- Gen.someOf(words)
    } yield (words, vocab.toSet)
    check(Prop.forAll(gen) { case (words, vocab) =>
      val text = words.mkString(" ")
      val f = new graft.api.VocabTokenizer(
        spark.sparkContext.broadcast(vocab)).forPartition()
      val toks = f(text)
      val wantCount = words.map(w =>
        if (vocab(w)) 1 else (w.length + 3) / 4).sum
      val ws = graft.api.WhitespaceTokenizer.forPartition()(text)
      // token count follows the rule, tokens concatenate losslessly,
      // and the whitespace tokenizer returns exactly the words
      toks.length == wantCount &&
        toks.mkString == words.mkString &&
        ws.toSeq == words
    })
  }

  test("decomposed winsorization quantiles equal a sorted-list interpolation for any data") {
    import spark.implicits._
    val gen = Gen.listOfN(40, Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.chooseNum(1, 30).map(_ / 4.0)))
    check(Prop.forAll(gen) { rows =>
      val dir = Tables.scratchDir("x43prop", sf)
      rows.zipWithIndex
        .map { case ((lang, len), i) =>
          // build a text whose chars/words score is deterministic-ish:
          // score only needs to be ANY double; encode via word of length
          (i.toLong, lang, ("x" * math.max(1, (len * 4).toInt)))
        }
        .toDF("doc_id", "lang", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = graft.operators.StatsOps.x43Winsorize(spark, dir).collect()
      // driver-side reference: same (1-g)*lo + g*hi over the sorted
      // list, with Spark's HALF_UP rounding
      val scores = rows.zipWithIndex.map { case ((lang, len), _) =>
        (lang, ("x" * math.max(1, (len * 4).toInt)).length.toDouble)
      }
      def q(vals: Seq[Double], p: Double): Double = {
        val s = vals.sorted
        val i = p * (s.length - 1)
        val k = math.floor(i).toInt
        val g = i - k
        val hi = if (k + 1 < s.length) s(k + 1) else s(k)
        BigDecimal((1.0 - g) * s(k) + g * hi)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val byLang = scores.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      out.forall { r =>
        val vals = byLang(r.getString(1))
        r.getDouble(3) == q(vals, 0.05) && r.getDouble(4) == q(vals, 0.95)
      }
    })
  }

  test("banded near-dup pairs: a clone differing in <= numBands-1 dims is ALWAYS found") {
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1.0f, 1.0f))
    val gen = for {
      vecs <- Gen.listOfN(6, vecGen)
      flipDim <- Gen.chooseNum(0, 15)
      victim <- Gen.chooseNum(0, 5)
    } yield (vecs, flipDim, victim)
    check(Prop.forAll(gen) { case (vecs, flipDim, victim) =>
      // clone one vector with a single flipped dimension: pigeonhole
      // over 8 bands of 2 dims guarantees >= 7 shared bands
      val clone = vecs(victim).zipWithIndex
        .map { case (x, i) => if (i == flipDim) -x else x }
      val df = (vecs :+ clone).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
      val pairs = graft.api.VectorPipeline
        .bandedCosinePairs(df, "id", "vec", threshold = -10.0,
          numBands = 8, dims = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs.contains((victim.toLong, vecs.length.toLong))
    })
  }

  test("GroupTopK window-idiom rewrite equals a driver-side take-k on random tables") {
    import org.apache.spark.sql.expressions.Window
    // forked session: the rewrite must not leak into other suites
    val s = Tables.tune(spark.newSession())
    import s.implicits._
    graft.plans.GroupTopK.installRewrite(s)
    check(Prop.forAll(Gen.zip(rowsGen, Gen.chooseNum(1, 5))) { case (rows, k) =>
      val df = rows.toDF("key", "v")
        .withColumn("g", pmod(col("key"), lit(7L)))
      val w = Window.partitionBy(col("g"))
        .orderBy(col("v").asc, col("key").asc)
      val got = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(r => (r.getLong(2), r.getLong(0), r.getDouble(1)))
        .sorted.toSeq
      // driver-side reference (duplicates make "which copy" ambiguous,
      // but the selected MULTISET is deterministic — compare sorted)
      val want = rows.map { case (key, v) =>
        (math.floorMod(key, 7L), key, v)
      }.groupBy(_._1).toSeq.flatMap { case (_, g) =>
        g.sortBy(t => (t._3, t._2)).take(k)
      }.sorted
      got == want
    })
  }

  test("connected components match a union-find oracle on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L)))
    check(Prop.forAll(edgeGen) { es =>
      val pairs = es.toDF("doc_a", "doc_b")
      val got = graft.api.TextPipeline.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = parent.keys.map(k => k -> find(k)).toMap
      got == expect
    })
  }

  test("prefix-filter Jaccard join equals driver-side brute force for any sets and threshold") {
    import spark.implicits._
    // small token universe forces overlaps, duplicate sets, and subset
    // relations; thresholds sweep the prefix-length boundary cases
    val corpusGen = for {
      n <- Gen.chooseNum(2, 12)
      sets <- Gen.listOfN(n, Gen.nonEmptyListOf(Gen.chooseNum(0L, 15L)))
      t <- Gen.oneOf(0.3, 0.5, 0.7, 0.9)
    } yield (sets.map(_.distinct).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }, t)
    check(Prop.forAll(corpusGen) { case (sets, t) =>
      val sh = sets.flatMap { case (id, hs) => hs.map(id -> _) }
        .toDF("doc_id", "ng_h")
      val got = graft.api.TextPipeline.prefixJaccardPairs(sh, t).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
        .toSet
      val byId = sets.toMap.map { case (k, v) => k -> v.toSet }
      val ids = byId.keys.toSeq.sorted
      val expect = (for {
        a <- ids; b <- ids if a < b
        inter = (byId(a) & byId(b)).size
        j = inter.toDouble / (byId(a).size + byId(b).size - inter)
        if j > t
      } yield (a, b,
        BigDecimal(j).setScale(9, BigDecimal.RoundingMode.HALF_UP))).toSet
      got == expect
    })
  }

  test("fuzzy join candidates are COMPLETE: deletion-neighborhood " +
      "blocking + verify equals the brute-force edit-distance join") {
    import spark.implicits._
    val strGen = org.scalacheck.Gen.listOfN(5,
      org.scalacheck.Gen.oneOf("ab", "ba", "abc", "abcd", "aabb", "abab",
        "xyz", "xy", "x", "abcde"))
    check(Prop.forAll(strGen) { names =>
      val dirty = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("dirty_key", "dirty_name")
      val clean = names.reverse.zipWithIndex
        .map { case (s, i) => ((i + 100).toLong, s + (if (i % 2 == 0) "" else "z")) }
        .toDF("clean_key", "clean_name")
      val got = graft.operators.TextIndexOps.fuzzyJoinDist1(dirty, clean)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val want = (for {
        (ds, di) <- names.zipWithIndex
        (cs0, ci) <- names.reverse.zipWithIndex
        cs = cs0 + (if (ci % 2 == 0) "" else "z")
        if lev(ds, cs) <= 1
      } yield (di.toLong, (ci + 100).toLong)).toSet
      got == want
    })
  }

  test("distributed cumsum equals the sequential prefix for any data " +
      "and partition count") {
    import spark.implicits._
    val gen = org.scalacheck.Gen.zip(
      org.scalacheck.Gen.listOfN(40,
        org.scalacheck.Gen.chooseNum(-1000L, 1000L)),
      org.scalacheck.Gen.chooseNum(1, 12))
    check(Prop.forAll(gen) { case (vals, nParts) =>
      val rows = vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, BigDecimal(v))
      }
      val df = rows.toDF("k", "v")
        .select(col("k"), col("v").cast("decimal(18,4)").as("v"))
      val got = graft.operators.Windows
        .distributedCumSum(df, col("k"), col("v"), nParts)
        .orderBy(col("k")).collect()
        .map(r => BigDecimal(r.getDecimal(2)))
      val want = rows.map(_._2).scanLeft(BigDecimal(0))(_ + _).tail
      got.length == want.length &&
        got.zip(want).forall { case (g, w) => g == w }
    })
  }

  test("co-occurrence pairs equal brute force under the basket cap") {
    import spark.implicits._
    val gen = org.scalacheck.Gen.listOfN(50, org.scalacheck.Gen.zip(
      org.scalacheck.Gen.chooseNum(1, 8), org.scalacheck.Gen.chooseNum(1, 10)))
    check(Prop.forAll(gen) { rows =>
      val df = rows.map { case (b, i) => (s"b$b", s"i$i") }
        .toDF("basket", "item")
      val got = graft.operators.BasketOps
        .coOccurrencePairs(df, basketCap = 4, minBaskets = 1L)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val items = rows.distinct.groupBy(_._1).view
        .mapValues(_.map(t => s"i${t._2}").distinct.sorted).toMap
        .filter(_._2.size <= 4)
      val want = items.values.flatMap { is =>
        for (a <- is; b <- is if a < b) yield (a, b)
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      got == want
    })
  }

  test("blocked all-pairs equals brute cosine pairs for every block count") {
    import spark.implicits._
    // small random float vectors (dim 4), ids dense; every unordered
    // pair above threshold must appear EXACTLY once whatever B is —
    // the x2 coverage argument, property-checked
    val vecGen = Gen.listOfN(14, Gen.listOfN(4,
      Gen.chooseNum(-1.0, 1.0).map(_.toFloat)))
    check(Prop.forAll(vecGen, Gen.oneOf(1, 2, 3, 5, 16)) { (vs, b) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "vec")
      def canon(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val brute = canon(graft.api.VectorPipeline
        .cosinePairs(df, "id", "vec", -10.0).collect())
      val blocked = canon(graft.api.VectorPipeline
        .blockedCosinePairs(df, "id", "vec", -10.0, numBlocks = b)
        .collect())
      blocked == brute && brute.size == 14 * 13 / 2
    })
  }

  test("k-core peel equals the sequential reference on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(25, Gen.zip(
      Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L)))
    check(Prop.forAll(edgeGen, Gen.oneOf(2, 3)) { (raw, k) =>
      val es = raw.collect {
        case (a, b) if a != b => (math.min(a, b), math.max(a, b))
      }.distinct
      if (es.isEmpty) Prop.passed
      else {
        val got = graft.operators.GraphOps
          .kCore(es.toDF("a", "b"), k, rounds = 12).head()
        // reference: iterate set-peel to fixpoint in plain Scala
        var edges = es.toSet
        var stable = false
        while (!stable) {
          val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
            .groupBy(identity).view.mapValues(_.size).toMap
          val keep = deg.filter(_._2 >= k).keySet
          val next = edges.filter(e => keep(e._1) && keep(e._2))
          stable = next == edges
          edges = next
        }
        val nodes = edges.toSeq.flatMap(e => Seq(e._1, e._2)).distinct
        val minDeg =
          if (edges.isEmpty) 0L
          else edges.toSeq.flatMap(e => Seq(e._1, e._2))
            .groupBy(identity).values.map(_.size.toLong).min
        Prop.?=(
          (got.getAs[Long]("n_nodes"), got.getAs[Long]("n_edges"),
            got.getAs[Long]("min_deg"), got.getAs[Boolean]("converged")),
          (nodes.size.toLong, edges.size.toLong, minDeg, true))
      }
    })
  }

  test("group-grain row-level rewrite: random predicates over a random " +
      "multi-file layout — table contents equal whole-table semantics " +
      "and predicate-false files survive byte-identical (round-11, " +
      "VERDICT r10 #8)") {
    import spark.implicits._
    sealed trait P {
      def sqlText: String
      def eval(id: Long, v: Long): Boolean
    }
    case class Cmp(c: String, op: String, k: Long) extends P {
      def sqlText = s"$c $op $k"
      def eval(id: Long, v: Long): Boolean = {
        val x = if (c == "id") id else v
        op match {
          case "<" => x < k; case "<=" => x <= k; case ">" => x > k
          case ">=" => x >= k; case "=" => x == k; case "<>" => x != k
        }
      }
    }
    case class AndP(a: P, b: P) extends P {
      def sqlText = s"(${a.sqlText}) AND (${b.sqlText})"
      def eval(id: Long, v: Long): Boolean = a.eval(id, v) && b.eval(id, v)
    }
    case class OrP(a: P, b: P) extends P {
      def sqlText = s"(${a.sqlText}) OR (${b.sqlText})"
      def eval(id: Long, v: Long): Boolean = a.eval(id, v) || b.eval(id, v)
    }
    case class NotP(a: P) extends P {
      def sqlText = s"NOT (${a.sqlText})"
      def eval(id: Long, v: Long): Boolean = !a.eval(id, v)
    }
    val leafGen = for {
      c <- Gen.oneOf("id", "v")
      op <- Gen.oneOf("<", "<=", ">", ">=", "=", "<>")
      k <- Gen.chooseNum(-5L, 25L)
    } yield Cmp(c, op, k): P
    def pGen(d: Int): Gen[P] =
      if (d == 0) leafGen
      else Gen.frequency(
        3 -> leafGen,
        1 -> Gen.zip(pGen(d - 1), pGen(d - 1)).map(t => AndP(t._1, t._2)),
        1 -> Gen.zip(pGen(d - 1), pGen(d - 1)).map(t => OrP(t._1, t._2)),
        1 -> pGen(d - 1).map(NotP))
    val caseGen = for {
      vs <- Gen.listOfN(24, Gen.chooseNum(-5L, 15L))
      nFiles <- Gen.chooseNum(2, 4)
      pred <- pGen(2)
      del <- Gen.oneOf(true, false)
    } yield (vs, nFiles, pred, del)
    spark.conf.set("spark.sql.catalog.pgrain",
      classOf[graft.sources.GraftCatalog].getName)
    val base = Tables.scratchDir("gcat_pgrain", sf)
    spark.conf.set("spark.sql.catalog.pgrain.base", base)
    var sample = 0
    def files(tbl: String): Map[String, (Long, Long)] =
      Option(new java.io.File(base, tbl).listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    check(Prop.forAll(caseGen) { case (vs, nFiles, pred, del) =>
      sample += 1
      val tbl = s"t$sample"
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      spark.sql(s"DROP TABLE IF EXISTS pgrain.$tbl")
      rows.toDF("id", "v").repartition(nFiles, col("id"))
        .createOrReplaceTempView("pgrain_src")
      spark.sql(s"CREATE TABLE pgrain.$tbl AS SELECT * FROM pgrain_src")
      val fileOf = spark.table(s"pgrain.$tbl")
        .select(col("id"), input_file_name().as("f")).collect()
        .map(r => r.getLong(0) ->
          new java.io.File(new java.net.URI(r.getString(1))).getName)
        .toMap
      val before = files(tbl)
      if (del) spark.sql(s"DELETE FROM pgrain.$tbl WHERE ${pred.sqlText}")
      else spark.sql(
        s"UPDATE pgrain.$tbl SET v = v + 1000 WHERE ${pred.sqlText}")
      val got = spark.table(s"pgrain.$tbl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val expected = (
        if (del) rows.filterNot { case (i, v) => pred.eval(i, v) }
        else rows.map { case (i, v) =>
          if (pred.eval(i, v)) (i, v + 1000L) else (i, v) }).sorted
      // every file NONE of whose rows match the predicate must survive
      // with identical name, size, and mtime — the group-grain claim
      val untouched = before.keySet.filter(f =>
        rows.forall { case (i, v) => fileOf(i) != f || !pred.eval(i, v) })
      val after = files(tbl)
      val survived = untouched.forall(f =>
        after.get(f).contains(before(f)))
      spark.sql(s"DROP TABLE pgrain.$tbl")
      Prop.?=(got, expected) && Prop.?=(survived, true) :| s"pred=${
        pred.sqlText} del=$del untouched=$untouched"
    }, 10)
  }
}
