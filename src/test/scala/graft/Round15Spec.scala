package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, GraftCdf, GraftMultiTxn, GraftSinkCommitMessage, GraftSinkEpochs, GraftStreamingWrite, GraftTxn}

/** Round-15 storage-engine hardening (ADVICE r14 + VERDICT r14 asks):
  * the sink's commit-message-strict promote and crash-atomic epoch
  * journal, the multi-txn recover/live-txn race, crash-durable CDC
  * publish, and the release-safety staleness rule. Crash states are
  * CONSTRUCTED deterministically through the same journal APIs the
  * commit paths drive, so every window is pinned without sleeps. */
class Round15Spec extends SparkSpec {

  private def freshCatalog(tag: String): String = {
    val base = new File(sys.props("java.io.tmpdir"),
      s"graft_r15_spec_${tag}_${System.nanoTime()}")
    spark.conf.set(s"spark.sql.catalog.$tag",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.base", base.getAbsolutePath)
    base.getAbsolutePath
  }

  private def msgs(stage: File)
      : Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
    GraftTxn.dataFiles(stage).toArray.map(n =>
      GraftSinkCommitMessage(new File(stage, n).getAbsolutePath))

  test("sink: an orphan task-attempt file not in the commit messages is dropped") {
    val base = freshCatalog("p15a")
    spark.sql("DROP TABLE IF EXISTS p15a.t")
    spark.sql("CREATE TABLE p15a.t (k BIGINT, v BIGINT)")
    val dir = new File(base, "t")
    val w = new GraftStreamingWrite(dir, "q15a", spark.table("p15a.t").schema)
    val stage = GraftSinkEpochs.epochStage(dir, "q15a", 0L)
    GraftCatalog.withPinFieldIds(
      spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v"), dir)
      .coalesce(1).write.mode("append").parquet(stage.getAbsolutePath)
    val committed = msgs(stage)
    // the ORPHAN: a crashed attempt's file — written, never reported
    GraftCatalog.withPinFieldIds(
      spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v"), dir)
      .coalesce(1).write.mode("append").parquet(stage.getAbsolutePath)
    assert(GraftTxn.dataFiles(stage).size > committed.length)
    w.commit(0L, committed)
    assert(spark.table("p15a.t").count() == 10,
      "orphan rows must not commit alongside the reported files")
    spark.sql("DROP TABLE IF EXISTS p15a.t"): Unit
  }

  test("sink: crash between ledger line and version bump rolls FORWARD on replay") {
    val base = freshCatalog("p15b")
    spark.sql("DROP TABLE IF EXISTS p15b.t")
    spark.sql("CREATE TABLE p15b.t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.cdf.enabled'='true')")
    val dir = new File(base, "t")
    val w = new GraftStreamingWrite(dir, "q15b", spark.table("p15b.t").schema)
    def stageEpoch(e: Long): File = {
      val s = GraftSinkEpochs.epochStage(dir, "q15b", e)
      GraftCatalog.withPinFieldIds(
        spark.range(0, 8).selectExpr("id AS k", "id * 2 AS v"), dir)
        .write.mode("append").parquet(s.getAbsolutePath)
      s
    }
    // construct the CRASH STATE by hand through the journal API: the
    // epoch's files promoted, ledger line written (the commit point),
    // CDC build staged in the intent — but NO version bump, NO publish
    val stage = stageEpoch(0L)
    val build = GraftCdf.newBuild(dir)
    GraftCdf.writeInto(build, GraftCdf.readStage(spark, stage,
      GraftCatalog.pinned(dir)), "insert")
    GraftSinkEpochs.writeIntent(dir, "q15b", 0L, 1L, Some(build),
      GraftTxn.dataFiles(stage))
    GraftTxn.promoteStage(stage, dir)
    GraftSinkEpochs.record(dir, "q15b", 0L)
    assert(GraftTxn.version(dir) == 0L, "crash state: bump never ran")
    // REPLAY (Spark re-runs the epoch after recovery): same id, same
    // data — the commit must finish the tail, not duplicate
    w.commit(0L, msgs(stageEpoch(0L)))
    assert(spark.table("p15b.t").count() == 8, "rows exactly once")
    assert(GraftTxn.version(dir) == 1L, "replay finished the bump")
    val feed = GraftCdf.rows(spark, dir)
    assert(feed.filter(col(GraftCdf.VersionCol) === 1).count() == 8,
      "replay finished the CDC publish — one insert image per row")
    spark.sql("DROP TABLE IF EXISTS p15b.t"): Unit
  }

  test("sink: crash mid-promote (no ledger line) rolls BACK, replay commits once") {
    val base = freshCatalog("p15c")
    spark.sql("DROP TABLE IF EXISTS p15c.t")
    spark.sql("CREATE TABLE p15c.t (k BIGINT, v BIGINT)")
    val dir = new File(base, "t")
    val w = new GraftStreamingWrite(dir, "q15c", spark.table("p15c.t").schema)
    def stageEpoch(e: Long): File = {
      val s = GraftSinkEpochs.epochStage(dir, "q15c", e)
      GraftCatalog.withPinFieldIds(
        spark.range(0, 6).selectExpr("id AS k", "id * 2 AS v"), dir)
        .write.mode("append").parquet(s.getAbsolutePath)
      s
    }
    // crash state: intent written, files HALF-promoted, no ledger line
    val stage = stageEpoch(0L)
    val staged = GraftTxn.dataFiles(stage)
    GraftSinkEpochs.writeIntent(dir, "q15c", 0L, 1L, None, staged)
    GraftTxn.promoteStage(stage, dir) // "crash" right after the moves
    assert(GraftTxn.dataFiles(dir).nonEmpty)
    assert(!GraftSinkEpochs.committed(dir, "q15c", 0L))
    // replay: the partial promote is rolled back from the intent, then
    // the fresh stage commits whole — rows land exactly once
    w.commit(0L, msgs(stageEpoch(0L)))
    assert(spark.table("p15c.t").count() == 6, "no duplicates from the " +
      "crashed attempt's promoted files")
    assert(GraftTxn.version(dir) == 1L)
    spark.sql("DROP TABLE IF EXISTS p15c.t"): Unit
  }

  test("multi-txn: recover racing a live transaction must not delete committed files") {
    val base = freshCatalog("p15d")
    spark.sql("DROP TABLE IF EXISTS p15d.a")
    spark.sql("DROP TABLE IF EXISTS p15d.b")
    spark.sql("CREATE TABLE p15d.a (k BIGINT)")
    spark.sql("CREATE TABLE p15d.b (k BIGINT)")
    val da = new File(base, "a")
    val db = new File(base, "b")
    spark.sql("INSERT INTO p15d.a VALUES (1), (2)")
    val live = GraftTxn.dataFiles(da)
    assert(live.nonEmpty)
    // a PENDING manifest naming table a's COMMITTED files as staged —
    // exactly what recover() observes when it reads the manifest while
    // a live txn is mid-flight and about to commit those very files
    val manifest = new File(base, ".graft_mtxn_race15.pending")
    java.nio.file.Files.write(manifest.toPath,
      (Seq(da.getAbsolutePath, "append", "2", live.mkString(","), "", "")
        .mkString("\t") + "\n" +
        Seq(db.getAbsolutePath, "append", "1", "", "", "").mkString("\t"))
        .getBytes("UTF-8"))
    java.nio.file.Files.write(new File(da, "_mtxn_ptr_race15").toPath,
      manifest.getAbsolutePath.getBytes("UTF-8"))
    // the LIVE txn holds a's lock; recover must block, and by the time
    // it gets the lock the manifest is gone (the txn completed) — the
    // post-r15 re-verification turns the rollback into a no-op
    val recoverer = new Thread(() => GraftMultiTxn.recover(da): Unit)
    GraftTxn.withCommitLock(da) {
      recoverer.start()
      Thread.sleep(300) // recover() is now blocked on a's lock
      manifest.delete(): Unit // the live txn commits and cleans up
    }
    recoverer.join(30000)
    assert(!recoverer.isAlive)
    assert(GraftTxn.dataFiles(da) == live,
      "recover must re-verify the manifest under the lock — the " +
        "committed files survive")
    assert(spark.table("p15d.a").count() == 2)
    spark.sql("DROP TABLE IF EXISTS p15d.a")
    spark.sql("DROP TABLE IF EXISTS p15d.b"): Unit
  }

  test("CDF: a crash between version bump and publish is rolled forward, rows exactly once") {
    val base = freshCatalog("p15e")
    spark.sql("DROP TABLE IF EXISTS p15e.t")
    spark.sql("CREATE TABLE p15e.t (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('graft.cdf.enabled'='true')")
    val dir = new File(base, "t")
    spark.sql("INSERT INTO p15e.t VALUES (1, 1.0), (2, 2.0)") // v1, clean
    assert(GraftCdf.rows(spark, dir).count() == 2)
    // CRASH STATE for v2: the commit's change build staged, the intent
    // marker written, the version bumped — publish never ran (the
    // pre-r15 lost-changes window)
    val build = GraftCdf.newBuild(dir)
    import spark.implicits._
    GraftCdf.writeInto(build,
      Seq((3L, 3.0)).toDF("k", "v"), "insert")
    GraftCdf.stagePending(dir, build, GraftTxn.version(dir) + 1)
    GraftTxn.withCommitLock(dir)(GraftTxn.bumpVersion(dir))
    assert(GraftTxn.version(dir) == 2L)
    assert(GraftCdf.changesDir(dir, 2L).isDirectory == false,
      "crash state: v2's changes unpublished")
    // the feed's read face rolls the publish forward
    val feed = GraftCdf.rows(spark, dir)
    assert(feed.filter(col(GraftCdf.VersionCol) === 2).count() == 1,
      "v2's change rows recovered exactly once")
    assert(GraftCdf.changesDir(dir, 2L).isDirectory)
    // idempotent: a second read does not duplicate
    assert(GraftCdf.rows(spark, dir)
      .filter(col(GraftCdf.VersionCol) === 2).count() == 1)
    // and the NEXT commit's recovery sweep finds nothing left
    spark.sql("INSERT INTO p15e.t VALUES (4, 4.0)") // v3
    assert(GraftCdf.rows(spark, dir).count() == 4)
    spark.sql("DROP TABLE IF EXISTS p15e.t"): Unit
  }

  test("file skipping: a range predicate over range-disjoint files opens ≤2 of 8") {
    import graft.sources.GraftStats
    val base = freshCatalog("p15f")
    spark.sql("DROP TABLE IF EXISTS p15f.t")
    spark.range(0, 8000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .createOrReplaceTempView("seed15f")
    spark.sql("CREATE TABLE p15f.t AS SELECT * FROM seed15f")
    val dir = new File(base, "t")
    assert(GraftTxn.dataFiles(dir).size == 8)
    assert(new File(dir, GraftStats.StatsFile).isFile,
      "commit recorded footer stats")
    // the pruned read: values and I/O both pinned
    val n = spark.table("p15f.t")
      .filter(col("k") >= 1000 && col("k") < 2000).count()
    assert(n == 1000)
    val (listed, kept) = GraftStats.lastReport(dir.getAbsolutePath)
    assert(listed == 8, s"listed $listed")
    // repartitionByRange samples its boundaries, so the 1/8 window can
    // straddle up to 3 of the 8 files
    assert(kept <= 3, s"a 1/8 range must not open $kept of $listed files")
    // an unpruned read still sees everything
    assert(spark.table("p15f.t").count() == 8000)
    // stats survive a row-level rewrite: the affected file's entries
    // are replaced by the rewritten file's fresh footer stats
    spark.sql("DELETE FROM p15f.t WHERE k >= 7000")
    assert(spark.table("p15f.t")
      .filter(col("k") >= 1000 && col("k") < 2000).count() == 1000)
    val (l2, k2) = GraftStats.lastReport(dir.getAbsolutePath)
    assert(k2 <= 3, s"pruning survives DELETE: kept $k2 of $l2")
    assert(spark.table("p15f.t").count() == 7000)
    // and OPTIMIZE (clustered) keeps the ledger fresh: repack to ~4
    // new range-disjoint files, the range read still prunes
    val total = GraftTxn.dataFiles(dir).toSeq
      .map(n => new File(dir, n).length()).sum
    spark.sql(s"CALL p15f.optimize('t', ${math.max(1L, total / 4)}, 'k')")
    val n3 = spark.table("p15f.t")
      .filter(col("k") >= 1000 && col("k") < 2000).count()
    assert(n3 == 1000)
    val (l3, k3) = GraftStats.lastReport(dir.getAbsolutePath)
    assert(l3 > 1 && k3 < l3,
      s"stats maintained through OPTIMIZE: kept $k3 of $l3")
    spark.sql("DROP TABLE IF EXISTS p15f.t"): Unit
  }

  test("file skipping: string, null and IN predicates prune soundly") {
    import graft.sources.GraftStats
    val base = freshCatalog("p15g")
    spark.sql("DROP TABLE IF EXISTS p15g.t")
    spark.range(0, 4000).selectExpr("id AS k",
      "CASE WHEN id < 2000 THEN concat('aa_', lpad(CAST(id AS STRING), 6, '0')) " +
        "ELSE concat('zz_', lpad(CAST(id AS STRING), 6, '0')) END AS s",
      "CASE WHEN id % 1000 = 0 THEN CAST(NULL AS LONG) ELSE id END AS nv")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .createOrReplaceTempView("seed15g")
    spark.sql("CREATE TABLE p15g.t AS SELECT * FROM seed15g")
    val dir = new File(base, "t")
    // string range: only the zz_ files qualify
    assert(spark.table("p15g.t").filter(col("s") >= "zz_").count() == 2000)
    val (l1, k1) = GraftStats.lastReport(dir.getAbsolutePath)
    assert(l1 == 4 && k1 <= 2, s"string prune kept $k1 of $l1")
    // IN over two distant keys: at most their two files open
    assert(spark.table("p15g.t")
      .filter(col("k").isin(10L, 3990L)).count() == 2)
    val (_, k2) = GraftStats.lastReport(dir.getAbsolutePath)
    assert(k2 <= 2, s"IN prune kept $k2")
    // equality on a value PROVABLY outside every range: zero files
    assert(spark.table("p15g.t").filter(col("k") === 99999L).count() == 0)
    val (_, k3) = GraftStats.lastReport(dir.getAbsolutePath)
    assert(k3 == 0, s"out-of-range equality kept $k3 files")
    spark.sql("DROP TABLE IF EXISTS p15g.t"): Unit
  }

  test("transform partitions: days(ts) hides the layout, prunes date ranges, keeps values") {
    import graft.sources.GraftStats
    val base = freshCatalog("p15h")
    spark.sql("DROP TABLE IF EXISTS p15h.t")
    spark.sql("CREATE TABLE p15h.t (k BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    val dir = new File(base, "t")
    // 4 days × 25 rows through the normal INSERT path
    spark.range(0, 100).selectExpr("id AS k",
      "timestamp_micros(CAST(1704067200000000 + (id % 4) * 86400000000 " +
        "+ id * 1000000 AS LONG)) AS ts", // 2024-01-01 .. 01-04 UTC
      "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("seed15h")
    spark.sql("INSERT INTO p15h.t SELECT * FROM seed15h")
    // layout: hive dirs on the DERIVED day ordinal, data files carry ts
    val files = GraftTxn.dataFiles(dir)
    assert(files.nonEmpty && files.forall(_.matches("ts_day=\\d+/.*")),
      s"unexpected layout: $files")
    // hidden: the derived column never surfaces in the schema
    assert(!spark.table("p15h.t").columns.contains("ts_day"))
    assert(spark.table("p15h.t").count() == 100)
    // source values intact (they stay in the data files)
    assert(spark.table("p15h.t").selectExpr("COUNT(DISTINCT CAST(ts AS DATE))")
      .head().getLong(0) == 4)
    // the date-range read prunes to 1 of 4 day dirs
    val n = spark.table("p15h.t")
      .filter(col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
      .count()
    assert(n == 25)
    val (listed, kept) = GraftStats.lastReport(dir.getAbsolutePath)
    val dayDirs = files.map(_.split("/")(0)).toSet.size
    assert(dayDirs == 4, s"expected 4 day dirs, got $dayDirs")
    assert(kept < listed && kept <= listed / 4 + 1,
      s"date range must prune day dirs: kept $kept of $listed")
    // UPDATE scoped to one day rewrites only that day's files, and the
    // re-split keeps the layout
    spark.sql("UPDATE p15h.t SET v = v + 1000 WHERE " +
      "ts >= TIMESTAMP'2024-01-04 00:00:00' ")
    assert(GraftTxn.dataFiles(dir).forall(_.matches("ts_day=\\d+/.*")))
    assert(spark.table("p15h.t").filter(col("v") >= 1000).count() == 25)
    assert(spark.table("p15h.t").count() == 100)
    spark.sql("DROP TABLE IF EXISTS p15h.t"): Unit
  }

  test("transform partitions: bucket(4, k) prunes equality and IN to matching buckets") {
    import graft.sources.GraftStats
    val base = freshCatalog("p15i")
    spark.sql("DROP TABLE IF EXISTS p15i.t")
    spark.sql("CREATE TABLE p15i.t (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    val dir = new File(base, "t")
    spark.range(0, 400).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("seed15i")
    spark.sql("INSERT INTO p15i.t SELECT * FROM seed15i")
    val files = GraftTxn.dataFiles(dir)
    assert(files.forall(_.matches("k_bucket=[0-3]/.*")),
      s"unexpected layout: $files")
    assert(spark.table("p15i.t").count() == 400)
    // equality: only the literal's bucket dir opens
    assert(spark.table("p15i.t").filter(col("k") === 123L).count() == 1)
    val (l1, k1) = GraftStats.lastReport(dir.getAbsolutePath)
    val perBucket = files.groupBy(_.split("/")(0)).map(_._2.size).max
    assert(k1 <= perBucket && k1 < l1,
      s"bucket equality must prune: kept $k1 of $l1 (<= $perBucket)")
    // IN over two keys: at most two buckets open
    assert(spark.table("p15i.t")
      .filter(col("k").isin(7L, 250L)).count() == 2)
    val (_, k2) = GraftStats.lastReport(dir.getAbsolutePath)
    assert(k2 <= 2 * perBucket, s"IN must prune buckets: kept $k2")
    spark.sql("DROP TABLE IF EXISTS p15i.t"): Unit
  }

  test("transform partitions: months(d) and truncate(n, s) derive, hide and prune") {
    import graft.sources.GraftStats
    val base = freshCatalog("p15q")
    // months over a DATE column
    spark.sql("DROP TABLE IF EXISTS p15q.m")
    spark.sql("CREATE TABLE p15q.m (k BIGINT, d DATE, v DOUBLE) " +
      "PARTITIONED BY (months(d))")
    spark.range(0, 120).selectExpr("id AS k",
      "date_add(DATE'2024-01-01', CAST(id AS INT)) AS d", // Jan..Apr
      "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("seed15q")
    spark.sql("INSERT INTO p15q.m SELECT * FROM seed15q")
    val dirM = new File(base, "m")
    val filesM = GraftTxn.dataFiles(dirM)
    assert(filesM.forall(_.matches("d_month=\\d+/.*")), s"layout: $filesM")
    assert(!spark.table("p15q.m").columns.contains("d_month"))
    // February only: 29 days of 2024
    val n = spark.table("p15q.m")
      .filter(col("d") >= lit("2024-02-01").cast("date") &&
        col("d") < lit("2024-03-01").cast("date")).count()
    assert(n == 29)
    val (lm, km) = GraftStats.lastReport(dirM.getAbsolutePath)
    val monthDirs = filesM.map(_.split("/")(0)).toSet.size
    assert(monthDirs == 4)
    assert(km < lm && km <= lm / 2, s"month prune kept $km of $lm")
    // truncate(4) over a STRING column: prefix dirs, prefix predicates
    spark.sql("DROP TABLE IF EXISTS p15q.s")
    spark.sql("CREATE TABLE p15q.s (k BIGINT, s STRING) " +
      "PARTITIONED BY (truncate(4, s))")
    spark.range(0, 100).selectExpr("id AS k",
      "concat(CASE WHEN id < 50 THEN 'alph' ELSE 'beta' END, " +
        "'_', CAST(id AS STRING)) AS s")
      .createOrReplaceTempView("seed15q2")
    spark.sql("INSERT INTO p15q.s SELECT * FROM seed15q2")
    val dirS = new File(base, "s")
    assert(GraftTxn.dataFiles(dirS).forall(_.startsWith("s_trunc=")))
    assert(spark.table("p15q.s").filter(col("s") >= "beta").count() == 50)
    val (ls, ks) = GraftStats.lastReport(dirS.getAbsolutePath)
    assert(ks < ls, s"truncate prune kept $ks of $ls")
    // values intact through the hidden layout
    assert(spark.table("p15q.s")
      .filter(col("s") === "alph_7").count() == 1)
    spark.sql("DROP TABLE IF EXISTS p15q.m")
    spark.sql("DROP TABLE IF EXISTS p15q.s"): Unit
  }

  test("transform partitions: writers on DISJOINT days both commit first-try") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val base = freshCatalog("p15j")
    spark.sql("DROP TABLE IF EXISTS p15j.t")
    spark.sql("CREATE TABLE p15j.t (k BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    spark.range(0, 100).selectExpr("id AS k",
      "timestamp_micros(CAST(1704067200000000 + (id % 2) * 86400000000 " +
        "AS LONG)) AS ts", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("seed15j")
    spark.sql("INSERT INTO p15j.t SELECT * FROM seed15j")
    val latch = new CountDownLatch(2)
    GraftTxn.commitHook = () => {
      latch.countDown()
      latch.await(60, TimeUnit.SECONDS): Unit
    }
    val attempts = try {
      val fa = Future(GraftTxn.retryCounted(5) {
        spark.sql("UPDATE p15j.t SET v = v + 100 WHERE " +
          "ts < TIMESTAMP'2024-01-02 00:00:00'").collect(): Unit
      }._2)
      val fb = Future(GraftTxn.retryCounted(5) {
        spark.sql("UPDATE p15j.t SET v = v + 1000 WHERE " +
          "ts >= TIMESTAMP'2024-01-02 00:00:00'").collect(): Unit
      }._2)
      Seq(Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    } finally GraftTxn.commitHook = () => ()
    assert(attempts == Seq(1, 1),
      s"disjoint-day writers must not conflict: $attempts")
    assert(spark.table("p15j.t").filter(col("v") >= 1000).count() == 50)
    assert(spark.table("p15j.t")
      .filter(col("v") >= 100 && col("v") < 1000).count() == 50)
    spark.sql("DROP TABLE IF EXISTS p15j.t"): Unit
  }

  test("reader gate: promoted-but-uncommitted multi-txn files are invisible to scans") {
    val base = freshCatalog("p15k")
    spark.sql("DROP TABLE IF EXISTS p15k.fact")
    spark.sql("DROP TABLE IF EXISTS p15k.audit")
    spark.sql("CREATE TABLE p15k.fact AS SELECT id AS k, " +
      "CAST(id AS LONG) AS v FROM range(0, 10)")
    spark.sql("CREATE TABLE p15k.audit (batch_id BIGINT, n BIGINT)")
    val factDir = new File(base, "fact")
    val auditDir = new File(base, "audit")
    import spark.implicits._
    class SimulatedCrash extends RuntimeException("crash between promotes")
    // crash AFTER the first table's promote: its staged files sit in
    // the live dir under a still-pending manifest
    GraftMultiTxn.promoteHook = i =>
      if (i == 1) throw new SimulatedCrash
    intercept[Exception] {
      try GraftMultiTxn.run(spark, Seq(
        GraftMultiTxn.TableWrite(auditDir,
          Seq((1L, 5L)).toDF("batch_id", "n")),
        GraftMultiTxn.TableWrite(factDir,
          spark.range(100, 110).selectExpr("id AS k", "id AS v"))))
      finally GraftMultiTxn.promoteHook = _ => ()
    }
    // exactly one table promoted (canonical order = audit, fact)
    val promoted = Seq(auditDir, factDir)
      .map(d => GraftMultiTxn.pendingStagedFiles(d).size)
    assert(promoted.exists(_ > 0), "crash state: a pending manifest " +
      "references staged files")
    // the round-15 gate: a READ before recovery must NOT see them —
    // the pre-r15 transient-duplicate window, now closed
    assert(spark.table("p15k.audit").count() == 0,
      "pending-staged rows leaked into a scan")
    assert(spark.table("p15k.fact").count() == 10)
    // recovery rolls back; reads unchanged (the gate saw the truth)
    assert(GraftMultiTxn.recover(factDir) == 1)
    assert(spark.table("p15k.audit").count() == 0)
    assert(spark.table("p15k.fact").count() == 10)
    spark.sql("DROP TABLE IF EXISTS p15k.fact")
    spark.sql("DROP TABLE IF EXISTS p15k.audit"): Unit
  }

  test("SQL txn face: CALL txn commits atomically; crash + CALL recover rolls back") {
    val base = freshCatalog("p15l")
    spark.sql("DROP TABLE IF EXISTS p15l.fact")
    spark.sql("DROP TABLE IF EXISTS p15l.audit")
    spark.sql("CREATE TABLE p15l.fact AS SELECT id AS k, " +
      "CAST(id AS LONG) AS v FROM range(0, 10)")
    spark.sql("CREATE TABLE p15l.audit (batch_id BIGINT, n BIGINT)")
    spark.sql("CREATE OR REPLACE TEMP VIEW v15l_fact AS " +
      "SELECT id AS k, id * 100 AS v FROM range(0, 10)")
    spark.sql("CREATE OR REPLACE TEMP VIEW v15l_audit AS " +
      "SELECT CAST(1 AS BIGINT) AS batch_id, CAST(10 AS BIGINT) AS n")
    // happy path: both tables flip in one CALL
    val out = spark.sql("CALL p15l.txn(" +
      "'fact=overwrite:v15l_fact;audit=append:v15l_audit')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("fact" -> 2L, "audit" -> 1L), s"versions: $out")
    assert(spark.table("p15l.fact").filter(col("v") >= 100).count() == 9)
    assert(spark.table("p15l.audit").count() == 1)
    // crash path THROUGH THE SQL FACE: promote of table 2 dies; CALL
    // recover rolls the whole txn back — neither table moves
    class SimulatedCrash extends RuntimeException("crash")
    GraftMultiTxn.promoteHook = i => if (i == 1) throw new SimulatedCrash
    intercept[Exception] {
      try spark.sql("CALL p15l.txn(" +
        "'fact=overwrite:v15l_fact;audit=append:v15l_audit')").collect()
      finally GraftMultiTxn.promoteHook = _ => ()
    }
    assert(spark.sql("CALL p15l.recover('fact')").head().getLong(0) == 1L)
    assert(spark.table("p15l.fact").count() == 10)
    assert(spark.table("p15l.audit").count() == 1,
      "rolled-back txn must not append a second audit row")
    assert(GraftTxn.version(new File(base, "fact")) == 2L)
    spark.sql("DROP TABLE IF EXISTS p15l.fact")
    spark.sql("DROP TABLE IF EXISTS p15l.audit"): Unit
  }

  test("persistent views: DDL, aliases, OR REPLACE, shadowing, SHOW VIEWS, durability") {
    val base = freshCatalog("p15m")
    spark.sql("DROP TABLE IF EXISTS p15m.t")
    spark.sql("CREATE TABLE p15m.t AS SELECT id AS k, " +
      "CAST(id * 2 AS LONG) AS v FROM range(0, 10)")
    // create with a COLUMN LIST: aliases bind positionally
    spark.sql("CREATE VIEW p15m.doubled (kk, vv) AS " +
      "SELECT k, v FROM p15m.t WHERE k >= 5")
    assert(new File(base, "doubled.graftview").isFile,
      "view persisted beside the table dirs")
    val rows = spark.sql("SELECT kk, vv FROM p15m.doubled ORDER BY kk")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == (5L until 10L).map(k => (k, k * 2)))
    // OR REPLACE swaps the body in place
    spark.sql("CREATE OR REPLACE VIEW p15m.doubled (kk, vv) AS " +
      "SELECT k, v FROM p15m.t WHERE k < 3")
    assert(spark.sql("SELECT COUNT(*) FROM p15m.doubled")
      .head().getLong(0) == 3)
    // SHOW VIEWS lists it; a pattern filters
    assert(spark.sql("SHOW VIEWS IN p15m").collect()
      .map(_.getString(1)).toSet == Set("doubled"))
    assert(spark.sql("SHOW VIEWS IN p15m LIKE 'no*'").count() == 0)
    // a real TABLE shadows a view of the same name (dir beats file)
    spark.sql("CREATE VIEW p15m.shadow AS SELECT 1 AS one")
    spark.sql("CREATE TABLE p15m.shadow AS SELECT id AS z FROM range(0, 4)")
    assert(spark.sql("SELECT * FROM p15m.shadow").columns.toSeq ==
      Seq("z"), "a table directory must shadow the view file")
    spark.sql("DROP TABLE p15m.shadow")
    assert(spark.sql("SELECT * FROM p15m.shadow").columns.toSeq ==
      Seq("one"), "dropping the table un-shadows the view")
    spark.sql("DROP VIEW p15m.shadow")
    // durability: a fresh catalog instance over the same base resolves
    // the view from its file (no session state)
    spark.conf.set("spark.sql.catalog.p15m2",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.p15m2.base", base)
    assert(spark.sql("SELECT COUNT(*) FROM p15m2.doubled")
      .head().getLong(0) == 3)
    // DROP VIEW removes the file; IF EXISTS tolerates absence
    spark.sql("DROP VIEW p15m.doubled")
    assert(!new File(base, "doubled.graftview").isFile)
    spark.sql("DROP VIEW IF EXISTS p15m.doubled")
    intercept[Exception](spark.sql("DROP VIEW p15m.doubled"))
    spark.sql("DROP TABLE IF EXISTS p15m.t"): Unit
  }

  test("deletion vectors: small DELETE writes positions, rewrites nothing, scans skip") {
    import graft.sources.GraftDv
    val base = freshCatalog("p15n")
    spark.sql("DROP TABLE IF EXISTS p15n.t")
    spark.range(0, 4000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .repartition(4).createOrReplaceTempView("seed15n")
    spark.sql("CREATE TABLE p15n.t " +
      "TBLPROPERTIES ('graft.dv.enabled'='true') AS " +
      "SELECT * FROM seed15n")
    val dir = new File(base, "t")
    val files1 = GraftTxn.dataFiles(dir)
    // ~1% of rows match (translatable range → the metadata delete
    // path, where the DV branch lives)
    spark.sql("DELETE FROM p15n.t WHERE k >= 100 AND k < 140")
    assert(GraftTxn.dataFiles(dir) == files1,
      "DV delete must rewrite ZERO files")
    assert(GraftDv.hasDvs(dir))
    assert(spark.table("p15n.t").count() == 3960)
    assert(spark.table("p15n.t")
      .filter(col("k") >= 100 && col("k") < 140).count() == 0)
    // aggregates and filters over the DV'd table agree with the truth
    assert(spark.table("p15n.t").agg(sum(col("k"))).head().getLong(0) ==
      (0L until 4000L).filterNot(k => k >= 100 && k < 140).sum)
    // a SECOND small delete accumulates positions (no resurrection)
    spark.sql("DELETE FROM p15n.t WHERE k >= 200 AND k < 240")
    assert(GraftTxn.dataFiles(dir) == files1)
    assert(spark.table("p15n.t").count() == 3920)
    // time travel: v1 (pre-delete) still shows every row; v2 shows the
    // first deletion state only
    assert(spark.sql("SELECT COUNT(*) FROM p15n.t VERSION AS OF 1")
      .head().getLong(0) == 4000)
    assert(spark.sql("SELECT COUNT(*) FROM p15n.t VERSION AS OF 2")
      .head().getLong(0) == 3960)
    // OPTIMIZE materializes: sidecars fold in, results unchanged
    spark.sql("CALL p15n.optimize('t', 1073741824)")
    assert(!GraftDv.hasDvs(dir), "OPTIMIZE must fold the DVs in")
    assert(GraftTxn.dataFiles(dir) != files1, "materialize rewrites")
    assert(spark.table("p15n.t").count() == 3920)
    assert(spark.table("p15n.t").agg(sum(col("k"))).head().getLong(0) ==
      (0L until 4000L).filterNot(k =>
        (k >= 100 && k < 140) || (k >= 200 && k < 240)).sum)
    spark.sql("DROP TABLE IF EXISTS p15n.t"): Unit
  }

  test("deletion vectors: big deletes fall back to rewrite; UPDATE materializes first") {
    import graft.sources.GraftDv
    val base = freshCatalog("p15o")
    spark.sql("DROP TABLE IF EXISTS p15o.t")
    spark.range(0, 1000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .repartition(2).createOrReplaceTempView("seed15o")
    spark.sql("CREATE TABLE p15o.t " +
      "TBLPROPERTIES ('graft.dv.enabled'='true') AS " +
      "SELECT * FROM seed15o")
    val dir = new File(base, "t")
    // 50% of rows — over the ratio: copy-on-write, no sidecars
    spark.sql("DELETE FROM p15o.t WHERE k < 500")
    assert(!GraftDv.hasDvs(dir), "a big delete must not take the DV path")
    assert(spark.table("p15o.t").count() == 500)
    // DV delete, then an UPDATE: the rewrite must materialize first and
    // never resurrect the DV-deleted rows
    spark.sql("DELETE FROM p15o.t WHERE k = 777")
    assert(GraftDv.hasDvs(dir))
    spark.sql("UPDATE p15o.t SET v = v + 10000 WHERE k >= 900")
    assert(!GraftDv.hasDvs(dir), "UPDATE folds DVs in first")
    assert(spark.table("p15o.t").count() == 499)
    assert(spark.table("p15o.t").filter(col("k") === 777).count() == 0,
      "materialize-then-update must not resurrect DV-deleted rows")
    assert(spark.table("p15o.t").filter(col("v") >= 10000).count() == 100)
    // CDF saw the DV delete as a delete image
    spark.sql("DROP TABLE IF EXISTS p15o.t"): Unit
  }

  test("deletion vectors: CDF delete images and restore round-trip the DV state") {
    import graft.sources.{GraftCdf, GraftDv}
    val base = freshCatalog("p15p")
    spark.sql("DROP TABLE IF EXISTS p15p.t")
    spark.range(0, 1000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("seed15p")
    spark.sql("CREATE TABLE p15p.t " +
      "TBLPROPERTIES ('graft.dv.enabled'='true', " +
      "'graft.cdf.enabled'='true') AS SELECT * FROM seed15p")
    val dir = new File(base, "t")
    spark.sql("DELETE FROM p15p.t WHERE k IN (0, 200, 400, 600, 800)") // v2: DV, 5 rows
    assert(GraftDv.hasDvs(dir))
    val feed = GraftCdf.rows(spark, dir)
    assert(feed.filter(col(GraftCdf.ChangeTypeCol) === "delete" &&
      col(GraftCdf.VersionCol) === 2).count() == 5,
      "DV delete publishes its row images to the change feed")
    // restore to v1: the DV state rolls back with the version
    spark.sql("CALL p15p.restore(`table` => 't', version => 1)")
    assert(!GraftDv.hasDvs(dir), "v1 carried no DVs")
    assert(spark.table("p15p.t").count() == 1000)
    // restore back to v2 (snapshotted at the restore commit): DVs return
    spark.sql("CALL p15p.restore(`table` => 't', version => 2)")
    assert(GraftDv.hasDvs(dir), "v2's DV state restored from its snapshot")
    assert(spark.table("p15p.t").count() == 995)
    spark.sql("DROP TABLE IF EXISTS p15p.t"): Unit
  }

  test("group discovery pre-prune: updates/deletes stay exact at range boundaries") {
    import graft.sources.GraftStats
    val base = freshCatalog("p15r")
    spark.sql("DROP TABLE IF EXISTS p15r.t")
    spark.range(0, 4000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .createOrReplaceTempView("seed15r")
    spark.sql("CREATE TABLE p15r.t AS SELECT * FROM seed15r")
    val dir = new File(base, "t")
    assert(new File(dir, GraftStats.StatsFile).isFile)
    val files1 = GraftTxn.dataFiles(dir)
    // an UPDATE pinned to one file's range: exactly the boundary rows
    // update, and files the stats refute are never replaced
    spark.sql("UPDATE p15r.t SET v = v + 100000 WHERE k >= 998 AND k <= 1002")
    assert(spark.table("p15r.t").filter(col("v") >= 100000).count() == 5,
      "boundary rows must all update (pre-prune may never drop a match)")
    val files2 = GraftTxn.dataFiles(dir)
    val untouched = files1.intersect(files2)
    assert(untouched.size >= 5,
      s"stats-refuted files must survive untouched: kept ${untouched.size} of 8")
    assert(spark.table("p15r.t").count() == 4000)
    // a DELETE the stats refute entirely is a no-op (no version bump)
    val v = GraftTxn.version(dir)
    spark.sql("DELETE FROM p15r.t WHERE k = 999999")
    assert(GraftTxn.version(dir) == v, "refuted delete must not commit")
    assert(spark.table("p15r.t").count() == 4000)
    // a DELETE at the extreme max still lands
    spark.sql("DELETE FROM p15r.t WHERE k = 3999")
    assert(spark.table("p15r.t").count() == 3999)
    spark.sql("DROP TABLE IF EXISTS p15r.t"): Unit
  }

  test("metadata tables: .stats exposes the skipping ledger, .dvs the sidecars") {
    val base = freshCatalog("p15s")
    spark.sql("DROP TABLE IF EXISTS p15s.t")
    spark.range(0, 1000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .createOrReplaceTempView("seed15s")
    spark.sql("CREATE TABLE p15s.t " +
      "TBLPROPERTIES ('graft.dv.enabled'='true') AS SELECT * FROM seed15s")
    val dir = new File(base, "t")
    val live = GraftTxn.dataFiles(dir)
    val stats = spark.sql("SELECT file, `column`, min, max, row_count " +
      "FROM p15s.t.stats").collect()
    assert(stats.nonEmpty)
    assert(stats.map(_.getString(0)).toSet == live,
      "one stats group per live file")
    assert(stats.map(_.getString(1)).toSet == Set("k", "v"))
    // ledger row counts sum to the table's rows, per column
    assert(stats.filter(_.getString(1) == "k").map(_.getLong(4)).sum == 1000)
    // a DV delete shows up in .dvs with its position count
    assert(spark.sql("SELECT COUNT(*) FROM p15s.t.dvs").head().getLong(0) == 0)
    spark.sql("DELETE FROM p15s.t WHERE k >= 10 AND k < 15")
    val dvs = spark.sql("SELECT file, deleted_positions FROM p15s.t.dvs")
      .collect()
    assert(dvs.map(_.getLong(1)).sum == 5, s"dvs: ${dvs.mkString(",")}")
    assert(dvs.forall(r => live.contains(r.getString(0))))
    // OPTIMIZE folds them back out of the relation
    spark.sql("CALL p15s.optimize('t', 1073741824)")
    assert(spark.sql("SELECT COUNT(*) FROM p15s.t.dvs").head().getLong(0) == 0)
    spark.sql("DROP TABLE IF EXISTS p15s.t"): Unit
  }

  test("persistent views: ALTER VIEW AS and SET/UNSET TBLPROPERTIES") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val base = freshCatalog("p15t")
    spark.sql("DROP TABLE IF EXISTS p15t.t")
    spark.sql("CREATE TABLE p15t.t AS SELECT id AS k FROM range(0, 10)")
    spark.sql("CREATE VIEW p15t.v AS SELECT k FROM p15t.t WHERE k < 3")
    assert(spark.sql("SELECT COUNT(*) FROM p15t.v").head().getLong(0) == 3)
    // ALTER VIEW ... AS swaps the body in place
    spark.sql("ALTER VIEW p15t.v AS SELECT k FROM p15t.t WHERE k >= 3")
    assert(spark.sql("SELECT COUNT(*) FROM p15t.v").head().getLong(0) == 7)
    // property evolution through the ViewCatalog face
    spark.sql("ALTER VIEW p15t.v SET TBLPROPERTIES ('team'='graft')")
    val cat = spark.sessionState.catalogManager.catalog("p15t")
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(Array.empty, "v")
    assert(cat.loadView(ident).properties().get("team") == "graft")
    spark.sql("ALTER VIEW p15t.v UNSET TBLPROPERTIES ('team')")
    assert(!cat.loadView(ident).properties().containsKey("team"))
    // still restart-durable after the alter
    spark.conf.set("spark.sql.catalog.p15t2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.p15t2.base", base)
    assert(spark.sql("SELECT COUNT(*) FROM p15t2.v").head().getLong(0) == 7)
    spark.sql("DROP VIEW p15t.v")
    spark.sql("DROP TABLE IF EXISTS p15t.t"): Unit
  }

  test("release safety: a FRESH empty lock is never deleted at release") {
    val home = new File(sys.props("java.io.tmpdir"),
      s"graft_r15_lock_${System.nanoTime()}")
    home.mkdirs()
    val lock = new File(home, "t.commitlock")
    assert(lock.createNewFile()) // a successor's lock, token write failed
    // our release with tokenWritten = false must leave it (fresh):
    // empty-and-fresh is exactly the live-successor ambiguity
    GraftTxn.releaseIfOwned(lock, "not-our-token", tokenWritten = false)
    assert(lock.isFile, "fresh empty lock survives a foreign release")
    // once STALE it is a crashed writer's and may go
    val old = System.currentTimeMillis() - (61 * 60 * 1000L)
    lock.setLastModified(old): Unit
    GraftTxn.releaseIfOwned(lock, "not-our-token", tokenWritten = false)
    assert(!lock.isFile, "stale empty lock is released")
    GraftTxn.rmTree(home): Unit
  }
}
