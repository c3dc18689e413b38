package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams

class StreamsSpec extends SparkSpec {

  test("st1 tumbling streaming agg equals batch agg (batch equivalence)") {
    val streamed = Streams.st1Tumbling(spark, sf).collect()
    val batch = Tables.eventsUs(spark, sf)
      .groupBy((expr("ts div 600000000") * 600).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Long]("win_start"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("n")).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { r =>
      val k = (r.getAs[Long]("win_start"), r.getAs[String]("event_type"))
      assert(batch(k) == r.getAs[Long]("n"), s"window $k")
    }
  }

  test("st4 watermark: late event beyond watermark is dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val counts = input.toDF().toDF("ts_t", "v")
      .withWatermark("ts_t", "15 minutes")
      .groupBy(window(col("ts_t"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("ws"), col("n"))
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("st4_sink")
      .trigger(Trigger.ProcessingTime(0)).start()

    def t(s: String) = Timestamp.valueOf(s)
    // batch 1: two events in [10:00,10:10), one far later → watermark 11:45
    input.addData((t("2024-01-01 10:00:30"), 1L), (t("2024-01-01 10:05:00"), 2L),
      (t("2024-01-01 12:00:00"), 3L))
    q.processAllAvailable()
    // batch 2: late event for the already-closed 10:00 window → dropped
    input.addData((t("2024-01-01 10:02:00"), 4L))
    q.processAllAvailable()
    // batch 3: advance watermark past 12:10 so that window also closes
    input.addData((t("2024-01-01 13:00:00"), 5L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("st4_sink").collect()
      .map(r => r.getAs[String]("ws") -> r.getAs[Long]("n")).toMap
    assert(rows("2024-01-01 10:00:00") == 2L,
      s"late event must not be counted: $rows")
    assert(rows("2024-01-01 12:00:00") == 1L)
  }

  test("sessionizer: a late event bridging two open runs merges them like batch session_window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[graft.streaming.EvTs]
      val h = 3600L * 1000000L // 1h in µs
      // t0 > 0: an epoch-0 event time collides with the INITIAL watermark
      // (also 0) and is filtered as late before reaching the processor
      val t0 = 10L * h
      def m(min: Long) = t0 + min * 60L * 1000000L
      val sessions = input.toDS()
        .withColumn("ts_t", timestamp_micros(col("ts_us")))
        .withWatermark("ts_t", "15 minutes")
        .as[graft.streaming.EvTs]
        .groupByKey(_.user_id)
        .transformWithState(new graft.streaming.SessionProcessor,
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
      val q = sessions.toDF().writeStream.outputMode("append")
        .format("memory").queryName("bridge_sink")
        .trigger(Trigger.ProcessingTime(0)).start()
      // batch 1: t0 and t0+35min — a 35-min gap (> 30-min session gap),
      // so an eager sessionizer would emit [t0] right here; the
      // watermark (max-15min = t0+20min) does NOT yet prove it closed
      input.addData(graft.streaming.EvTs(1L, m(0), 1L),
        graft.streaming.EvTs(1L, m(35), 2L))
      q.processAllAvailable()
      // batch 2: late event at t0+21min (> watermark = t0+20min, legal)
      // BRIDGES the two runs: gaps become 21min and 14min, both <= 30min
      input.addData(graft.streaming.EvTs(1L, m(21), 3L))
      q.processAllAvailable()
      // batch 3: another user far ahead pushes the watermark past the
      // merged session's horizon -> the timer closes it
      input.addData(graft.streaming.EvTs(2L, t0 + 3L * h, 4L))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("bridge_sink")
        .filter(col("user_id") === 1L).collect()
        .map(r => (r.getAs[Long]("sess_start_us"), r.getAs[Long]("sess_end_us"),
          r.getAs[Long]("n_events")))
      // batch session_window semantics: ONE session of 3 events,
      // [t0, t0+35min+gap)
      assert(got.toSeq == Seq((m(0), m(35 + 30), 3L)),
        s"bridged session diverged from batch semantics: ${got.toSeq}")
      spark.catalog.dropTempView("bridge_sink")
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("st5 dedup: doubled feed collapses to original counts") {
    val dedup = Streams.st5StreamDedup(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    val batch = Tables.eventsUs(spark, sf).groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    assert(dedup == batch)
  }

  test("st12 outer join: null rows emitted for unmatched clicks, equals batch left join") {
    val got = Streams.st12StreamStreamOuter(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val c = Tables.eventsUs(spark, sf).filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("ct"))
    val p = Tables.eventsUs(spark, sf).filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pt"), col("value"))
    val want = c.join(p, col("cu") === col("pu") &&
        col("pt") >= col("ct") && col("pt") <= col("ct") + 3600000000L,
        "left_outer")
      .groupBy(col("cu"))
      .agg(count(col("value")).as("n_pairs"),
        (count(lit(1)) - count(col("value"))).as("n_unmatched"),
        coalesce(sum(col("value").cast(Det.Money)).cast("double"), lit(0.0))
          .as("s"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == want)
    // the outer semantics are actually exercised: some clicks have no
    // purchase within the hour, and the sentinel user never leaks out
    assert(got.values.map(_._2).sum > 0, "expected unmatched clicks")
    assert(!got.contains(-1L))
  }

  test("checkpoint restart: second run processes only new files, exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Paths.get(Tables.scratchDir("restart", sf))
    // fresh dirs: the test IS about checkpoint state, so start clean
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base.toString), true)
    java.nio.file.Files.createDirectories(base.resolve("in"))
    val ev = Tables.events(spark, sf)
    val half1 = ev.filter(col("event_id") % 2 === 0)
    val half2 = ev.filter(col("event_id") % 2 === 1)
    def runOnce(): Unit = {
      val q = Tables.tune(spark).readStream.schema(ev.schema)
        .parquet(s"$base/in")
        .filter(col("event_type") === "purchase")
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/chk")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // stage each half as one FILE (the streaming file source lists leaf
    // files; a nested part-file directory would be invisible to it)
    def stageFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = base.resolve(s"_tmp_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, base.resolve(s"in/$name"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      fs.delete(new org.apache.hadoop.fs.Path(tmp.toString), true)
    }
    stageFile(half1, "f1.parquet")
    runOnce()
    val afterFirst = spark.read.parquet(s"$base/out").count()
    stageFile(half2, "f2.parquet")
    runOnce() // RESTART from the same checkpoint: must skip f1 entirely
    val out = spark.read.parquet(s"$base/out")
    val want = ev.filter(col("event_type") === "purchase")
    // exactly once: no loss, no duplicates across the restart
    assert(out.count() == want.count(),
      s"restart lost or duplicated rows: ${out.count()} vs ${want.count()}")
    assert(out.select(countDistinct(col("event_id"))).collect()(0).getLong(0)
      == want.count(), "duplicate event_ids after restart")
    // and the first run really produced only the first half's purchases
    assert(afterFirst ==
      half1.filter(col("event_type") === "purchase").count())
  }

  test("st14 full outer join: both unmatched sides emitted, equals batch full join") {
    val got = Streams.st14StreamStreamFullOuter(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val c = Tables.eventsUs(spark, sf).filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("ct"))
    val p = Tables.eventsUs(spark, sf).filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pt"), col("value"))
    val want = c.join(p, col("cu") === col("pu") &&
        col("pt") >= col("ct") && col("pt") <= col("ct") + 3600000000L,
        "full_outer")
      .groupBy(coalesce(col("cu"), col("pu")).as("u"))
      .agg(
        sum(when(col("ct").isNotNull && col("pt").isNotNull, 1L).otherwise(0L))
          .as("n_pairs"),
        sum(when(col("pt").isNull, 1L).otherwise(0L)).as("n_unm_clicks"),
        sum(when(col("ct").isNull, 1L).otherwise(0L)).as("n_unm_purchases"),
        coalesce(sum(when(col("ct").isNotNull, col("value").cast(Det.Money)))
          .cast("double"), lit(0.0)).as("s"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == want)
    // BOTH outer sides are genuinely exercised and the sentinel stays out
    assert(got.values.map(_._2).sum > 0, "expected unmatched clicks")
    assert(got.values.map(_._3).sum > 0, "expected unmatched purchases")
    assert(!got.contains(-1L))
  }

  test("st13 timer sessions equal batch sessions, including timer-closed tails") {
    import org.apache.spark.sql.expressions.Window
    val got = Streams.st13TimerSessions(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val want = Tables.eventsUs(spark, sf)
      .select(col("user_id"), col("ts"))
      .withColumn("new_sess",
        when(col("ts") - lag(col("ts"), 1).over(w) > 1800000000L ||
          lag(col("ts"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_sess")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("s"), (max(col("ts")) + 1800000000L).as("e"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    // the LAST session of every user can only close via an event-time
    // timer (no later event exists) — all users' tails must be present
    val lastPerUser = want.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSet
    assert(lastPerUser.subsetOf(got), "timer-closed tail sessions missing")
  }

  test("checkpoint recovery: uncommitted batch replays once, restart drains new files, output equals batch") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val base = Paths.get(Tables.scratchDir("st9recov", sf))
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base.toString), true)
    val srcDir = base.resolve("src"); Files.createDirectories(srcDir)
    val events = Paths.get(s"$sf/events.parquet")
    def addCopy(i: Int): Unit = Files.copy(events,
      srcDir.resolve(s"events_$i.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = Tables.tune(spark).read.parquet(events.toString).schema
    def run(): Unit = {
      // maxFilesPerTrigger=1 → one micro-batch per staged file, so the
      // checkpoint carries real multi-batch offset/commit history
      val q = Tables.tune(spark).readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
        .writeStream.format("parquet")
        .option("path", s"$base/data")
        .option("checkpointLocation", s"$base/chk")
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // phase 1: three source files stream to the sink and stop cleanly
    (0 until 3).foreach(addCopy); run()
    // simulate a crash between offset-write and commit-write: delete the
    // LATEST commit marker. On restart the engine must re-execute that
    // batch — and the file sink's metadata log must NOT double its files
    // (exactly-once is the sink log's job, not the scheduler's)
    val commits = base.resolve("chk/commits")
    val latest = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit))
      .map(_.toLong).max
    Files.delete(commits.resolve(latest.toString))
    // the local FS pairs every file with a .crc sidecar; a stale one
    // would make the re-commit look like a concurrent writer
    Files.deleteIfExists(commits.resolve(s".$latest.crc"))
    // more data lands while the query is down
    (3 until 5).foreach(addCopy)
    // phase 2: restart from the SAME checkpoint
    run()
    // the replayed batch re-committed and the new files were processed
    val afterLatest = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit))
      .map(_.toLong).max
    assert(Files.exists(commits.resolve(latest.toString)),
      "uncommitted batch was not replayed")
    assert(afterLatest >= latest + 2, "new files were not processed")
    // final committed output equals the batch oracle over ALL files:
    // every purchase event exactly 5 times — no loss, no duplication
    val got = Tables.tune(spark).read.parquet(s"$base/data")
      .groupBy(col("event_id")).count()
    val ids = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(ids.keySet == want, "event id set diverged from batch")
    assert(ids.values.forall(_ == 5L),
      s"duplication/loss: counts ${ids.values.toSet}")
  }

  test("st15 stream-stream semi join equals the batch semi join") {
    val got = Streams.st15StreamStreamSemi(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables.eventsUs(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    // batch LEFT SEMI: each click ROW emits once iff a match exists —
    // the exact batch analog of the streaming semi's emission rule
    val want = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + 3600000000L,
        "left_semi")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), min(col("c_ts")).as("first"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("st16 stream-stream anti join equals batch NOT-EXISTS; semi+anti partition the clicks") {
    val got = Streams.st16StreamStreamAnti(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables.eventsUs(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    // batch LEFT ANTI: each click ROW emits once iff NO match exists —
    // the watermark-eviction emission rule's batch analog
    val want = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + 3600000000L,
        "left_anti")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), min(col("c_ts")).as("first"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    assert(got.nonEmpty)
    // semi (st15) and anti (st16) partition the click set: per user,
    // converted + abandoned = total clicks
    val semi = Streams.st15StreamStreamSemi(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = clicks.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    total.foreach { case (u, n) =>
      assert(semi.getOrElse(u, 0L) + got.get(u).map(_._1).getOrElse(0L) == n,
        s"user $u: semi + anti != total clicks") }
  }

  test("st17 chained stateful aggregations equal the batch two-level rollup") {
    val got = Streams.st17ChainedAggs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // batch analog: the same two-level rollup computed statically —
    // every real hour must close (sentinel watermark passes max+2h), so
    // the streaming result is the FULL rollup, not a prefix
    val ten = Tables.eventsUs(spark, sf)
      .select(expr("(ts div 600000000) * 600").as("w10"), col("event_type"))
      .groupBy(col("w10"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val want = ten
      .select(expr("(w10 div 3600) * 3600").as("hour_start"),
        col("event_type"), col("n"))
      .groupBy(col("hour_start"), col("event_type"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_subwindows"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    assert(got.nonEmpty)
    // structural sanity: an hour holds at most six 10-minute windows
    got.values.foreach { case (n, sub) =>
      assert(sub >= 1L && sub <= 6L && n >= sub)
    }
  }

  test("native stream-stream LeftAnti is rejected by the planner (locks in the st16 composition)") {
    // if a future Spark version starts supporting it, this fails and
    // st16 should switch to the native operator
    import org.apache.spark.sql.streaming.OutputMode
    val dir = Tables.scratchDir("st16probe", sf)
    val schema = Tables.events(spark, sf).schema
    def src = Tables.tune(spark).readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
    // stage one batch so the source dir exists
    Tables.events(spark, sf).limit(10).write.mode("overwrite").parquet(dir)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_t").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_t").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val anti = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"),
      "left_anti")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      val q = anti.writeStream.format("noop")
        .outputMode(OutputMode.Append()).start()
      try q.awaitTermination(10000L) finally q.stop()
    }
    assert(e.getMessage.toLowerCase.contains("anti"))
  }

  test("foreachBatch recovery: batch-id partition overwrite makes the replay idempotent") {
    // foreachBatch is AT-LEAST-ONCE: after a crash between offset-write
    // and commit-write the batch re-executes, and a plain append sink
    // would double its rows. The production fix is idempotent writes
    // keyed by batchId — here dynamic partition overwrite into a
    // batch_id partition, so the replay REPLACES its own partition.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val base = Paths.get(Tables.scratchDir("fb_recov", sf))
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base.toString), true)
    val srcDir = base.resolve("src"); Files.createDirectories(srcDir)
    val events = Paths.get(s"$sf/events.parquet")
    (0 until 3).foreach(i => Files.copy(events,
      srcDir.resolve(s"events_$i.parquet"), StandardCopyOption.REPLACE_EXISTING))
    val schema = Tables.tune(spark).read.parquet(events.toString).schema
    val outDir = s"$base/data"
    def run(): Unit = {
      val q = Tables.tune(spark).readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
        .filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          batch.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(outDir)
        }
        .option("checkpointLocation", s"$base/chk")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    // forge the crash: drop the latest commit marker so the last batch
    // re-executes on restart (its foreachBatch body runs AGAIN)
    val commits = base.resolve("chk/commits")
    val latest = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit))
      .map(_.toLong).max
    Files.delete(commits.resolve(latest.toString))
    Files.deleteIfExists(commits.resolve(s".$latest.crc"))
    run()
    // every signup event exactly 3 times (3 source copies) — the
    // replayed batch replaced its partition instead of appending
    val counts = Tables.tune(spark).read.parquet(outDir)
      .groupBy(col("event_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(counts.keySet == want)
    assert(counts.values.forall(_ == 3L),
      s"foreachBatch replay duplicated rows: ${counts.values.toSet}")
  }

  test("st21 upsert: serving table equals batch latest-by-key and the " +
      "duplicated feed proves idempotence") {
    val got = Streams.st21StreamUpsert(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("last_ts_us"), r.getAs[Long]("last_event_id"))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val want = Tables.eventsUs(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("ts"), r.getAs[Long]("event_id"))).toMap
    assert(got == want)
    // one serving row per user — the second (duplicate) batch upserted
    // in place instead of appending
    assert(got.size == want.size)
  }

  test("st22: both dim versions appear in the enriched output — the " +
      "refresh really happened mid-stream") {
    val rows = Streams.st22StreamDimRefresh(spark, sf).collect()
    val versions = rows.map(_.getString(1).split("_v").last).toSet
    assert(versions == Set("1", "2"),
      s"expected labels from both dim versions, got $versions")
    // a frozen snapshot would map each lang to ONE label; here every
    // lang with docs in both batches carries two
    val langsWithBoth = rows.groupBy(_.getString(0))
      .count(_._2.length == 2)
    assert(langsWithBoth > 0)
    assert(rows.map(_.getLong(2)).sum ==
      Tables.documents(spark, sf).filter(col("doc_id") % 10 === 3).count())
  }

  test("st23 checkpoint recovery: restarted query resumes exactly once " +
      "and its state equals the uninterrupted batch aggregate") {
    val got = Streams.st23CheckpointRecovery(spark, sf).collect()
    // recovered_ok carries the resume shape: run 1 read exactly half A,
    // run 2 read exactly half B (no re-read, no loss)
    assert(got.forall(_.getAs[Boolean]("recovered_ok")))
    val batch = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(Det.Money)).cast("double").as("sum_value"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val gotMap = got.map(r => r.getString(0) ->
      (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toMap
    assert(gotMap == batch && gotMap.nonEmpty)
  }

  test("st24 join→agg chain: streaming hourly rollup equals the batch " +
      "join + aggregate") {
    val got = Streams.st24JoinThenAgg(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ev = Tables.eventsUs(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("ct"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pt"), col("value"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("pt") >= col("ct") && col("pt") <= col("ct") + 3600000000L)
      .groupBy((expr("pt div 3600000000") * 3600L).as("hour_start"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(Det.Money)).cast("double").as("rev"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == batch && got.nonEmpty)
  }

  test("st6 stateful: final state equals batch aggregate") {
    val st = Streams.st6Stateful(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("max_value"))).toMap
    val batch = Tables.eventsUs(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n"), max("value").as("mx")).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n"), r.getAs[Double]("mx"))).toMap
    assert(st == batch)
  }
}
