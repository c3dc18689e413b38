package graft

import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("x17 contamination: flagged docs really share a 3-gram with the eval slice") {
    val frame = PipelineOps.x17Contamination(spark, sf)
    val res = frame.collect()
    assert(res.nonEmpty, "no contaminated docs found at sf0.001")
    // the eval-gram side is the PINNED build side: a broadcast hash join
    // with BuildRight (corpus never the build side, regardless of stats)
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val bhj = flattenPlan(frame.queryExecution.executedPlan)
      .collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "x17 did not plan a broadcast hash join")
    assert(bhj.exists(_.buildSide ==
      org.apache.spark.sql.catalyst.optimizer.BuildRight),
      s"eval grams not the build side: ${bhj.map(_.buildSide)}")
    // no eval doc flags itself, counts are positive
    res.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 97 != 0)
      assert(r.getAs[Long]("n_shared") >= 1L)
      assert(r.getAs[Long]("n_eval_docs") >= 1L)
    }
    // independent recompute: 3-gram sets of flagged vs eval docs intersect
    val grams = graft.api.TextPipeline
      .shingles(Tables.documents(spark, sf), "doc_id", "text", 3)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("ngram")).toSet).toMap
    val evalGrams = grams.collect { case (id, g) if id % 97 == 0 => g }
      .foldLeft(Set.empty[String])(_ ++ _)
    val flagged = res.map(_.getAs[Long]("doc_id")).toSet
    val expected = grams.collect {
      case (id, g) if id % 97 != 0 && g.exists(evalGrams) => id
    }.toSet
    assert(flagged == expected)
  }

  test("x18 repetition metrics: known values on a hand-built doc") {
    val docs = Seq(
      (1L, "a a a a"),             // grams: "a a a"x2 -> dup 0.5; top-word 1.0
      (2L, "a b c d e"),           // all grams distinct, top word 1/5
      (3L, "x y x y x y")          // grams: "x y x","y x y" repeat -> dup 0.5
    ).toDF("doc_id", "text")
    val (dup, top) = PipelineOps.repetitionMetrics(col("text"))
    val m = docs.select(col("doc_id"), dup.as("d"), top.as("t")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m(1L) == ((0.5, 1.0)))
    assert(m(2L) == ((0.0, 0.2)))
    assert(m(3L) == ((0.5, 0.5)))
  }

  test("x18 on the corpus: fractions bounded, verdict consistent") {
    val rows = PipelineOps.x18Repetition(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 3).count())
    rows.foreach { r =>
      val d = r.getAs[Double]("dup_gram_frac")
      val t = r.getAs[Double]("top_word_frac")
      assert(d >= 0.0 && d < 1.0)
      assert(t > 0.0 && t <= 1.0)
      assert(r.getAs[Boolean]("repetitive") == (d > 0.02 || t > 0.2))
    }
  }

  test("x20 pii redaction: planted spans found and scrubbed, clean text has none") {
    val rows = PipelineOps.x20PiiRedact(spark, sf).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_emails") == (if (id % 7 == 0) 1 else 0))
      assert(r.getAs[Int]("n_phones") == (if (id % 11 == 0) 1 else 0))
      assert(r.getAs[Int]("n_ips") == (if (id % 13 == 0) 1 else 0))
      val clean = r.getAs[String]("clean")
      assert(!clean.contains("@") && !clean.contains("555-0142") &&
        !clean.contains("192.168"))
      if (id % 7 == 0) assert(clean.contains("<EMAIL>"))
      if (id % 11 == 0) assert(clean.contains("<PHONE>"))
      if (id % 13 == 0) assert(clean.contains("<IP>"))
    }
  }

  test("x21 packing: contiguous per-(lang,shard) streams, offsets consistent, shard is a content hash") {
    val rows = PipelineOps.x21PackSequences(spark, sf).collect()
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Int]("shard")))
      .foreach { case (_, docs) =>
        val ordered = docs.sortBy(_.getAs[Long]("doc_id"))
        var stream = 0L
        ordered.foreach { r =>
          assert(r.getAs[Long]("bin") == stream / 512)
          assert(r.getAs[Long]("offset") == stream % 512)
          stream += r.getAs[Int]("n_tokens")
          val endBin = (stream - 1) / 512
          assert(r.getAs[Boolean]("straddles") == (endBin > r.getAs[Long]("bin")))
        }
      }
    // docs are 10-99 words << 512 capacity: a doc never spans 3 windows,
    // and every interior window is fully filled by construction
    assert(rows.forall(r => r.getAs[Int]("n_tokens") < 512))
    // the shard is the first md5 hex nibble of the TEXT (content hash,
    // not arrival order): recompute independently with MessageDigest
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(texts(r.getLong(0)).getBytes("UTF-8"))
      val nibble = (h(0) >> 4) & 0xf
      assert(r.getAs[Int]("shard") == nibble, s"doc ${r.getLong(0)}")
    }
    // the packing key fans out: strictly more streams than languages
    val nStreams = rows.map(r => (r.getAs[String]("lang"), r.getAs[Int]("shard"))).distinct.length
    val nLangs = rows.map(_.getAs[String]("lang")).distinct.length
    assert(nStreams > nLangs, s"sharding added no fan-out: $nStreams streams / $nLangs langs")
    // widening the nibble via conf multiplies the fan-out and keeps the
    // per-stream packing invariants (the 100 TB knob, exercised)
    try {
      spark.conf.set("spark.graft.pack.shardHexChars", "2")
      val wide = PipelineOps.x21PackSequences(spark, sf).collect()
      assert(wide.forall(r =>
        r.getAs[Int]("shard") >= 0 && r.getAs[Int]("shard") < 256))
      val wideStreams = wide
        .map(r => (r.getAs[String]("lang"), r.getAs[Int]("shard"))).distinct.length
      assert(wideStreams > nStreams,
        s"width 2 added no fan-out: $wideStreams vs $nStreams")
      wide.groupBy(r => (r.getAs[String]("lang"), r.getAs[Int]("shard")))
        .foreach { case (_, docs) =>
          var stream = 0L
          docs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
            assert(r.getAs[Long]("bin") == stream / 512)
            assert(r.getAs[Long]("offset") == stream % 512)
            stream += r.getAs[Int]("n_tokens")
          }
        }
    } finally spark.conf.unset("spark.graft.pack.shardHexChars")
  }

  test("x22 segment dedup: first occurrence wins, duplicated doc loses its segments") {
    // doc 3 repeats doc 1's text: every segment of 3 is a dup of 1's
    val docs = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb wc wd we wf g0 g1"),
      (2L, "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9 ua ub uc ud ue uf"),
      (3L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb wc wd we wf g0 g1")
    ).toDF("doc_id", "text")
    // rebuild through the public op by pointing at a scratch corpus dir
    val dir = Tables.scratchDir("x22fix", sf)
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = PipelineOps.x22SegmentDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_segments"), r.getAs[Long]("n_kept"))).toMap
    assert(m(1L) == ((2L, 2L)))   // 18 words -> 2 segments, both first
    assert(m(2L) == ((1L, 1L)))
    assert(m(3L) == ((2L, 0L)))   // exact copy: every segment already seen
    // corpus-level conservation: kept <= segments, every doc present
    val corpus = PipelineOps.x22SegmentDedup(spark, sf).collect()
    assert(corpus.length == Tables.documents(spark, sf).count())
    corpus.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_segments"))
      assert(r.getAs[Long]("n_segments") >= 1L)
    }
  }

  test("x23 chunking: offsets stride correctly and cover every token") {
    val rows = PipelineOps.x23Chunk(spark, sf).collect()
    val nWords = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, chunks) =>
      val n = nWords(id)
      val ordered = chunks.sortBy(_.getAs[Long]("chunk_idx"))
      // chunk count is ceil(n/32) exactly
      assert(ordered.length.toLong == (n + 31) / 32)
      ordered.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("chunk_idx") == i.toLong)
        assert(c.getAs[Long]("start_tok") == i * 32L)
        // true length: capped at 64, truncated at the doc end
        assert(c.getAs[Long]("n_tok") == math.min(64L, n - i * 32L))
      }
      // last chunk reaches the end of the doc exactly
      val last = ordered.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_tok") == n)
    }
  }

  test("x27 heavy hitters: MG guarantees hold on a skewed stream across partitions") {
    import graft.functions.HeavyHittersAgg
    // zipf-ish: item i has 2^(10-i) copies, i = 0..9 -> n = 2046
    val data = (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(s"it$i"))
    val df = spark.sparkContext.parallelize(data, 8).toDF("w")
    val k = 4
    val sketch = df.agg(HeavyHittersAgg.heavyHitters(col("w"), k).as("hh"))
      .select(explode(col("hh")).as("c"))
      .select(col("c.item"), col("c.est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= k)
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    exact.foreach { case (item, cnt) =>
      if (cnt > n.toDouble / (k + 1)) assert(sketch.contains(item),
        s"true heavy hitter $item (cnt=$cnt) missing from sketch")
    }
    sketch.foreach { case (item, est) =>
      assert(est <= exact(item))
      assert(exact(item) - est <= n.toDouble / (k + 1))
    }
    // deterministic across identical runs
    val again = df.agg(HeavyHittersAgg.heavyHitters(col("w"), k)).collect()
    val first = df.agg(HeavyHittersAgg.heavyHitters(col("w"), k)).collect()
    assert(again.map(_.toString).toSeq == first.map(_.toString).toSeq)
    // contract query: single row, claims hold at sf0.001 and the
    // containment claim is NON-vacuous (the planted <sep> is heavy)
    val claim = PipelineOps.x27HeavyHitters(spark, sf).collect()
    assert(claim.length == 1)
    assert(claim.head.getAs[Long]("n_heavy_true") >= 1L)
    assert(claim.head.getAs[Boolean]("heavy_all_found"))
    assert(claim.head.getAs[Boolean]("bounds_ok"))
  }

  test("x29 cdc chunking matches a reference MessageDigest recomputation") {
    val rows = PipelineOps.x29CdcChunk(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { r =>
      val words = docs(r.getLong(0)).split(" ")
      val expect = 1L + words.drop(1).count(w => md5hex(w).startsWith("0"))
      assert(r.getAs[Long]("n_chunks") == expect, s"doc ${r.getLong(0)}")
      assert(r.getAs[Long]("n_words") == words.length.toLong)
      assert(r.getAs[Double]("mean_chunk_len") ==
        BigDecimal(words.length.toDouble / expect)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // boundary density ~1/16: corpus-wide mean chunk length sanity band
    val meanLen = rows.map(_.getAs[Long]("n_words")).sum.toDouble /
      rows.map(_.getAs[Long]("n_chunks")).sum
    assert(meanLen > 8.0 && meanLen < 32.0, s"mean chunk len $meanLen")
  }

  test("s12 merge-schema read: union schema with per-generation null accounting") {
    val r = graft.operators.Core.s12MergeSchema(spark, sf).collect().head
    val s = Tables.supplier(spark, sf)
    assert(r.getAs[Long]("n") == s.count())
    assert(r.getAs[Long]("n_gen1") + r.getAs[Long]("n_gen2") == r.getAs[Long]("n"))
    val wantBal = s.filter(col("s_suppkey") % 2 === 0)
      .agg(Det.dsum(col("s_acctbal"))).collect().head.getDouble(0)
    assert(r.getAs[Double]("bal_gen1") == wantBal)
  }

  test("x19 stratified sample: thresholds per stratum, weights match") {
    val rows = PipelineOps.x19StratifiedSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val en = r.getAs[String]("lang") == "en"
      assert(r.getAs[String]("bucket") <= (if (en) "0f" else "3f"))
      assert(r.getAs[Double]("weight") == (if (en) 16.0 else 4.0))
    }
    // the sample is a deterministic subset: re-running yields identical rows
    val again = PipelineOps.x19StratifiedSample(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // en is down-sampled harder than the rest (that's the point)
    val total = Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    val enRate = kept.getOrElse("en", 0).toDouble / total("en")
    val restRate = (rows.length - kept.getOrElse("en", 0)).toDouble /
      (total.values.sum - total("en"))
    assert(enRate < restRate)
  }
}
