package graft

import java.io.File
import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, GraftTxn}

/** Round-14 capabilities (VERDICT r13): PARTITIONED graft tables —
  * hive layout under the commit protocol, partition-pruned scans, and
  * partition-grain conflict detection.
  *
  * Determinism: the same commit-barrier pattern as GraftTxnSpec — both
  * statements are held at commit entry until both have planned and
  * executed, so the overlap is forced by construction. */
class Round14Spec extends SparkSpec {

  private def freshCatalog(tag: String): String = {
    val base = new File(sys.props("java.io.tmpdir"),
      s"graft_r14_spec_${tag}_${System.nanoTime()}")
    spark.conf.set(s"spark.sql.catalog.$tag",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.base", base.getAbsolutePath)
    base.getAbsolutePath
  }

  private def withCommitBarrier[T](parties: Int)(body: => T): T = {
    val latch = new CountDownLatch(parties)
    GraftTxn.commitHook = () => {
      latch.countDown()
      latch.await(60, TimeUnit.SECONDS): Unit
    }
    try body finally GraftTxn.commitHook = () => ()
  }

  private def seedPartitioned(cat: String, base: String): File = {
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
    spark.range(0, 100)
      .selectExpr("id AS k", "CAST(id * 3 AS LONG) AS v",
        "CAST(id % 4 AS INT) AS p")
      .repartition(4)
      .createOrReplaceTempView(s"${cat}_seed")
    spark.sql(s"CREATE TABLE $cat.t PARTITIONED BY (p) AS " +
      s"SELECT * FROM ${cat}_seed")
    new File(base, "t")
  }

  test("partitioned table: hive layout, pinned spec, pruned scan reads 1 of 4 dirs") {
    val base = freshCatalog("p14a")
    val dir = seedPartitioned("p14a", base)
    // layout: every data file below a p=N dir, none at the root
    val files = GraftTxn.dataFiles(dir)
    assert(files.nonEmpty && files.forall(_.matches("p=[0-3]/.*")),
      s"unexpected layout: $files")
    assert(GraftCatalog.partitionSpec(dir) == Seq("p"))
    // partition-pruned scan: the physical plan pins a PartitionFilter
    // on p, and the files actually read all live under p=2/ (1 of 4
    // directories — the predicate never pays I/O elsewhere)
    val df = spark.table("p14a.t").filter(col("p") === 2)
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
    val scans = flattenPlan(df.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "no BatchScanExec in the plan")
    val ps = scans.head.scan.asInstanceOf[ParquetScan]
    assert(ps.partitionFilters.exists(_.references.exists(_.name == "p")),
      s"PartitionFilters missing p: ${ps.partitionFilters}")
    val scanned = df.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("p=2/")),
      s"pruned scan read outside p=2: ${scanned.mkString(", ")}")
    assert(df.count() == 25)
    // values: partition column reconstructed from the path, data
    // columns from the files
    assert(spark.table("p14a.t").agg(sum(col("v"))).head().getLong(0) ==
      (0L until 100L).map(_ * 3).sum)
    spark.sql("DROP TABLE IF EXISTS p14a.t"): Unit
  }

  test("disjoint-partition writers both commit; same-partition writers conflict") {
    val base = freshCatalog("p14b")
    seedPartitioned("p14b", base)
    def upd(pv: Int, add: Long) =
      s"UPDATE p14b.t SET v = v + $add WHERE p = $pv"
    // disjoint partitions: each statement's rewrite group is its own
    // p=N file set, so neither invalidates the other — both commit on
    // the FIRST attempt (the lock serializes, nothing conflicts)
    val attempts = withCommitBarrier(2) {
      val fa = Future(GraftTxn.retryCounted(5) {
        spark.sql(upd(0, 100L)).collect(): Unit
      }._2)
      val fb = Future(GraftTxn.retryCounted(5) {
        spark.sql(upd(1, 1000L)).collect(): Unit
      }._2)
      Seq(Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    }
    assert(attempts == Seq(1, 1),
      s"disjoint-partition writers must not conflict: $attempts")
    // same partition: the loser's group was replaced — conflict, retry
    val attempts2 = withCommitBarrier(2) {
      val fa = Future(GraftTxn.retryCounted(5) {
        spark.sql(upd(2, 7L)).collect(): Unit
      }._2)
      val fb = Future(GraftTxn.retryCounted(5) {
        spark.sql(upd(2, 11L)).collect(): Unit
      }._2)
      Seq(Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    }
    assert(attempts2.sorted == Seq(1, 2),
      s"same-partition writers must conflict once: $attempts2")
    // all four effects landed exactly once
    val got = spark.table("p14b.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L until 100L).map { k =>
      k -> (k * 3 + (k % 4 match {
        case 0 => 100L; case 1 => 1000L; case 2 => 18L; case _ => 0L
      }))
    }.toMap
    assert(got == want, "post-race state diverged")
    spark.sql("DROP TABLE IF EXISTS p14b.t"): Unit
  }

  test("partitioned row-level rewrites and inserts keep the layout; time travel works") {
    val base = freshCatalog("p14c")
    val dir = seedPartitioned("p14c", base)
    spark.sql("INSERT INTO p14c.t VALUES " +
      "(CAST(900 AS LONG), CAST(1 AS LONG), 1)") // v2
    spark.sql("UPDATE p14c.t SET v = v + 5 WHERE p = 1") // v3
    // p=3 ⇔ k ≡ 3 (mod 4); k%3=0 on that slice ⇔ k ≡ 3 (mod 12): 9 rows
    spark.sql("DELETE FROM p14c.t WHERE p = 3 AND k % 3 = 0") // v4
    // layout survives every statement kind
    val files = GraftTxn.dataFiles(dir)
    assert(files.nonEmpty && files.forall(_.matches("p=[0-3]/.*")),
      s"layout broken: $files")
    // state: p=1 rows (incl. the inserted one) took +5; half of p=3
    // rows deleted
    assert(spark.table("p14c.t").count() == 100 + 1 - 9)
    assert(spark.table("p14c.t")
      .filter(col("k") === 900).head().getLong(1) == 6L)
    // time travel: the CTAS version still reads, with partition values
    val v1 = spark.sql("SELECT COUNT(*), SUM(p) FROM p14c.t VERSION AS OF 1")
      .head()
    assert(v1.getLong(0) == 100 &&
      v1.getLong(1) == (0 until 100).map(_ % 4).sum)
    // the DELETE's rewrite group was partition-scoped: p=0/p=2 files
    // from the CTAS are still the originals (never rewritten)
    val v1Files = GraftTxn.dataFiles(GraftTxn.snapshotDir(dir, 3))
      .filter(n => n.startsWith("p=0/") || n.startsWith("p=2/"))
    assert(v1Files.subsetOf(files),
      "untouched partitions were rewritten by a p=3-scoped DELETE")
    spark.sql("DROP TABLE IF EXISTS p14c.t"): Unit
  }

  test("versionDiff: ALL-NULL-valued keys classify correctly via presence markers") {
    val base = freshCatalog("p14e")
    assert(base.nonEmpty)
    spark.sql("DROP TABLE IF EXISTS p14e.t")
    // nullable value column with planted nulls: the pre-r14 inference
    // (side membership from value-column null-ness) read an all-null
    // row as ABSENT and misclassified it (VERDICT r13 #5)
    spark.range(0, 10).selectExpr("id AS k",
      "CASE WHEN id % 2 = 0 THEN NULL ELSE CAST(id AS LONG) END AS v")
      .createOrReplaceTempView("p14e_seed")
    spark.sql("CREATE TABLE p14e.t AS SELECT * FROM p14e_seed") // v1
    spark.sql("UPDATE p14e.t SET v = 99 WHERE k = 1") // v2
    spark.sql("DELETE FROM p14e.t WHERE k = 2") // v3 — null-valued key
    val d = graft.operators.Dml
      .versionDiff(spark, "p14e.t", 1L, 3L, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d.size == 10)
    assert(d(0L) == "unchanged", s"null<=>null must be unchanged: $d")
    assert(d(1L) == "changed")
    assert(d(2L) == "deleted",
      s"a deleted all-null-valued key must read deleted, got ${d(2L)}")
    assert(d(3L) == "unchanged")
    spark.sql("DROP TABLE IF EXISTS p14e.t"): Unit
  }

  test("multi-table txn: crash between the two promotes leaves NEITHER visible") {
    import graft.sources.{GraftMultiTxn, GraftMaintenance}
    val base = freshCatalog("p14f")
    spark.sql("DROP TABLE IF EXISTS p14f.fact")
    spark.sql("DROP TABLE IF EXISTS p14f.audit")
    spark.sql("CREATE TABLE p14f.fact AS SELECT id AS k, " +
      "CAST(id AS LONG) AS v FROM range(0, 10)") // v1
    spark.sql("CREATE TABLE p14f.audit (batch_id BIGINT, n BIGINT)")
    val factDir = new File(base, "fact")
    val auditDir = new File(base, "audit")
    import spark.implicits._
    val restated = spark.table("p14f.fact")
      .selectExpr("k", "CAST(v + 100 AS LONG) AS v")
    val auditRow = Seq((1L, 10L)).toDF("batch_id", "n")
    // crash INJECTED between the two promotes (audit sorts before
    // fact, so index 1 = after audit promoted, before fact did)
    final class SimulatedCrash extends RuntimeException("crash")
    GraftMultiTxn.promoteHook = i => if (i == 1) throw new SimulatedCrash
    val thrown = intercept[Exception] {
      try GraftMultiTxn.run(spark, Seq(
        GraftMultiTxn.TableWrite(factDir, restated, overwrite = true),
        GraftMultiTxn.TableWrite(auditDir, auditRow)))
      finally GraftMultiTxn.promoteHook = _ => ()
    }
    assert(thrown.isInstanceOf[SimulatedCrash] ||
      thrown.getCause.isInstanceOf[SimulatedCrash])
    // recovery from EITHER participant rolls the pending txn back
    assert(GraftMultiTxn.recover(auditDir) == 1)
    assert(spark.table("p14f.audit").count() == 0,
      "audit's promoted-but-uncommitted rows must be rolled back")
    assert(spark.table("p14f.fact").filter(col("v") >= 100).count() == 0,
      "fact must not show the restatement")
    assert(spark.table("p14f.fact").count() == 10)
    assert(graft.sources.GraftTxn.version(factDir) == 1L &&
      graft.sources.GraftTxn.version(auditDir) == 0L,
      "no version may bump on a rolled-back txn")
    // recovery is idempotent and cleans its pointers
    assert(GraftMultiTxn.recover(factDir) == 0)
    // a subsequent writer proceeds normally (locks were released, no
    // debris blocks it) and vacuum sweeps the crashed stages
    spark.sql("INSERT INTO p14f.audit VALUES (2, 3)")
    assert(spark.table("p14f.audit").count() == 1)
    GraftMaintenance.gcDebris(factDir, 0L): Unit
    spark.sql("DROP TABLE IF EXISTS p14f.fact")
    spark.sql("DROP TABLE IF EXISTS p14f.audit"): Unit
  }

  test("multi-table txn: a concurrent commit on either table conflicts the whole txn") {
    import graft.sources.GraftMultiTxn
    val base = freshCatalog("p14g")
    spark.sql("DROP TABLE IF EXISTS p14g.fact")
    spark.sql("DROP TABLE IF EXISTS p14g.audit")
    spark.sql("CREATE TABLE p14g.fact AS SELECT id AS k, " +
      "CAST(id AS LONG) AS v FROM range(0, 10)")
    spark.sql("CREATE TABLE p14g.audit (batch_id BIGINT, n BIGINT)")
    val factDir = new File(base, "fact")
    val auditDir = new File(base, "audit")
    import spark.implicits._
    val restated = spark.table("p14g.fact")
      .selectExpr("k", "CAST(v + 100 AS LONG) AS v")
      .localCheckpoint(true) // pin the pre-conflict read (plan re-use
      // would otherwise re-read the winner's state and mask the race)
    // a concurrent UPDATE lands between the txn's staging and its
    // locks: the commitHook seam fires once, after staging
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    GraftTxn.commitHook = () =>
      if (fired.compareAndSet(false, true)) {
        GraftTxn.commitHook = () => ()
        spark.sql("UPDATE p14g.fact SET v = v + 1 WHERE k = 0")
      }
    val e = try intercept[Exception] {
      GraftMultiTxn.run(spark, Seq(
        GraftMultiTxn.TableWrite(factDir, restated, overwrite = true),
        GraftMultiTxn.TableWrite(auditDir,
          Seq((1L, 10L)).toDF("batch_id", "n"))))
    } finally GraftTxn.commitHook = () => ()
    assert(e.isInstanceOf[GraftTxn.CommitConflictException] ||
      e.getCause.isInstanceOf[GraftTxn.CommitConflictException],
      s"expected a commit conflict, got $e")
    // NEITHER table took the losing txn's writes
    assert(spark.table("p14g.audit").count() == 0)
    assert(spark.table("p14g.fact").filter(col("v") >= 100).count() == 0)
    // the concurrent winner's effect is intact
    assert(spark.table("p14g.fact").filter(col("k") === 0)
      .head().getLong(1) == 1L)
    spark.sql("DROP TABLE IF EXISTS p14g.fact")
    spark.sql("DROP TABLE IF EXISTS p14g.audit"): Unit
  }

  test("constraints: a violating append rejects atomically — no bump, no partial files") {
    import graft.sources.{GraftConstraints, GraftTxn}
    val base = freshCatalog("p14h")
    spark.sql("DROP TABLE IF EXISTS p14h.t")
    spark.sql("CREATE TABLE p14h.t (k BIGINT NOT NULL, v DOUBLE) " +
      "TBLPROPERTIES ('graft.check.v_pos'='v > 0')")
    spark.sql("INSERT INTO p14h.t VALUES (1, 1.0), (2, 2.0)") // v1
    val dir = new File(base, "t")
    val v1 = GraftTxn.version(dir)
    val files1 = GraftTxn.dataFiles(dir)
    // CHECK violation: one bad row poisons the whole commit
    val e = intercept[Exception] {
      spark.sql("INSERT INTO p14h.t VALUES (3, 3.0), (4, -4.0)")
    }
    assert(GraftConstraints.isViolation(e), s"not a violation: $e")
    assert(GraftTxn.version(dir) == v1, "no version bump on rejection")
    assert(GraftTxn.dataFiles(dir) == files1, "no partial files")
    assert(spark.table("p14h.t").count() == 2)
    // NULL check passes (ANSI CHECK: only FALSE violates)
    spark.sql("INSERT INTO p14h.t VALUES (5, CAST(NULL AS DOUBLE))")
    assert(spark.table("p14h.t").count() == 3)
    // a violating row-level UPDATE rejects the same way
    val v2 = GraftTxn.version(dir)
    val e2 = intercept[Exception] {
      spark.sql("UPDATE p14h.t SET v = -9.0 WHERE k = 1")
    }
    assert(GraftConstraints.isViolation(e2))
    assert(GraftTxn.version(dir) == v2)
    assert(spark.table("p14h.t").filter(col("v") < 0).count() == 0)
    spark.sql("DROP TABLE IF EXISTS p14h.t"): Unit
  }

  test("streaming sink: a replayed epoch no-ops — exactly-once rows, one commit per epoch") {
    import graft.sources.{GraftCdf, GraftSinkEpochs, GraftStreamingWrite}
    val base = freshCatalog("p14i")
    spark.sql("DROP TABLE IF EXISTS p14i.t")
    spark.sql("CREATE TABLE p14i.t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.cdf.enabled'='true')")
    val dir = new File(base, "t")
    val schema = spark.table("p14i.t").schema
    val w = new GraftStreamingWrite(dir, "qspec", schema)
    // stage epoch 0's rows exactly where the executor writers would,
    // and return the per-task commit messages the real writers emit —
    // since round 15 the commit promotes ONLY message-carried files
    def stageEpoch(epoch: Long, lo: Long,
        hi: Long): Array[org.apache.spark.sql.connector.write.WriterCommitMessage] = {
      val stage = GraftSinkEpochs.epochStage(dir, "qspec", epoch)
      // the real executor writer embeds the pin's field ids — the
      // spec's hand-staging must too, or the id-resolved reads reject
      graft.sources.GraftCatalog.withPinFieldIds(
        spark.range(lo, hi).selectExpr("id AS k", "id * 2 AS v"), dir)
        .write.mode("append").parquet(stage.getAbsolutePath)
      GraftTxn.dataFiles(stage).toArray.map(n =>
        graft.sources.GraftSinkCommitMessage(
          new File(stage, n).getAbsolutePath))
    }
    w.commit(0L, stageEpoch(0L, 0L, 10L))
    assert(spark.table("p14i.t").count() == 10)
    assert(GraftTxn.version(dir) == 1L)
    // the kill/restart REPLAY: same epochId, same data re-staged —
    // the ledger makes it a no-op (no duplicate rows, no version bump,
    // no extra change set)
    w.commit(0L, stageEpoch(0L, 0L, 10L))
    assert(spark.table("p14i.t").count() == 10,
      "a replayed epoch must not re-apply")
    assert(GraftTxn.version(dir) == 1L)
    // a NEW epoch commits normally, and the change feed holds exactly
    // one insert image per row per epoch
    w.commit(1L, stageEpoch(1L, 10L, 15L))
    assert(spark.table("p14i.t").count() == 15)
    assert(GraftTxn.version(dir) == 2L)
    val feed = GraftCdf.rows(spark, dir)
    assert(feed.count() == 15, "one change row per inserted row")
    assert(feed.select(col("_commit_version")).distinct().count() == 2,
      "one commit (change set) per epoch")
    assert(GraftSinkEpochs.epochCount(dir, "qspec") == 2)
    spark.sql("DROP TABLE IF EXISTS p14i.t"): Unit
  }

  test("CDF row feed: checkpointed restart resumes with no re-emission, no gaps") {
    import graft.sources.GraftCdf
    val base = freshCatalog("p14j")
    spark.sql("DROP TABLE IF EXISTS p14j.t")
    spark.range(0, 10).selectExpr("id AS k", "CAST(id AS LONG) AS v")
      .createOrReplaceTempView("p14j_seed")
    spark.sql("CREATE TABLE p14j.t " +
      "TBLPROPERTIES ('graft.cdf.enabled'='true') AS " +
      "SELECT * FROM p14j_seed") // v1: 10 insert images
    val dir = new File(base, "t")
    val out = new File(sys.props("java.io.tmpdir"),
      s"graft_r14_cdfout_${System.nanoTime()}")
    val cp = new File(sys.props("java.io.tmpdir"),
      s"graft_r14_cdfcp_${System.nanoTime()}")
    def drain(): Unit = {
      val q = GraftCdf.rowsStream(spark, dir)
        .writeStream.format("parquet")
        .option("path", out.getAbsolutePath)
        .option("checkpointLocation", cp.getAbsolutePath)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain() // sees v1's images
    assert(spark.read.parquet(out.getAbsolutePath).count() == 10)
    // feed DOWN across two commits
    spark.sql("UPDATE p14j.t SET v = v + 100 WHERE k < 3") // v2: 3+3 images
    spark.sql("DELETE FROM p14j.t WHERE k = 9") // v3: 1 delete image
    drain() // restart from the checkpoint
    val rows = spark.read.parquet(out.getAbsolutePath)
    assert(rows.count() == 10 + 6 + 1,
      "restart must emit exactly the missed images: no re-emission, no gaps")
    assert(rows.groupBy(col("_commit_version")).count().count() == 3)
    spark.sql("DROP TABLE IF EXISTS p14j.t"): Unit
  }

  test("constraint props and the epoch ledger survive the delete path's dir swap") {
    import graft.sources.{GraftConstraints, GraftSinkEpochs}
    val base = freshCatalog("p14k")
    spark.sql("DROP TABLE IF EXISTS p14k.t")
    spark.sql("CREATE TABLE p14k.t (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('graft.check.v_pos'='v > 0')")
    val dir = new File(base, "t")
    spark.sql("INSERT INTO p14k.t VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    GraftSinkEpochs.record(dir, "qswap", 7L)
    // a translatable DELETE takes the whole-directory SWAP path — the
    // metadata riders (schema pin, props, epoch ledger, commit log)
    // must travel into the swapped-in directory
    spark.sql("DELETE FROM p14k.t WHERE k = 2")
    assert(spark.table("p14k.t").count() == 2)
    assert(GraftSinkEpochs.committed(dir, "qswap", 7L),
      "the exactly-once ledger must survive the swap")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO p14k.t VALUES (4, -4.0)")
    }
    assert(GraftConstraints.isViolation(e),
      "declared constraints must survive the swap")
    spark.sql("DROP TABLE IF EXISTS p14k.t"): Unit
  }

  test("CALL optimize routes partitioned tables per-partition; CALL recover resolves txns") {
    val base = freshCatalog("p14l")
    spark.sql("DROP TABLE IF EXISTS p14l.t")
    spark.range(0, 400).selectExpr("id AS k", "CAST(id % 4 AS INT) AS p")
      .repartition(8).createOrReplaceTempView("p14l_seed")
    spark.sql("CREATE TABLE p14l.t PARTITIONED BY (p) AS " +
      "SELECT * FROM p14l_seed")
    val dir = new File(base, "t")
    val before = GraftTxn.dataFiles(dir)
    assert(before.size > 4, s"need multi-file partitions, got $before")
    val r = spark.sql(s"CALL p14l.optimize('t', ${1L << 40})").head()
    assert(r.getLong(0) > r.getLong(1) && r.getLong(1) == 4L,
      s"partitioned OPTIMIZE must pack per partition: $r")
    val after = GraftTxn.dataFiles(dir)
    assert(after.forall(_.matches("p=[0-3]/.*")),
      s"layout must survive SQL OPTIMIZE: $after")
    assert(spark.table("p14l.t").count() == 400)
    // CLUSTERED per-partition OPTIMIZE (the OPTIMIZE ... ZORDER-within-
    // partitions combination): small target → several files per
    // partition, each owning a disjoint k-range WITHIN its partition
    spark.sql("CALL p14l.optimize('t', 2048, 'k')").collect()
    val perPart = spark.table("p14l.t")
      .groupBy(col("p"), input_file_name().as("f"))
      .agg(min(col("k")).as("kmin"), max(col("k")).as("kmax"))
      .collect().groupBy(_.getInt(0))
    val clusteredOk = perPart.values.forall { rs =>
      val ranges = rs.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
      ranges.sliding(2).forall(p =>
        p.length < 2 || p(0)._2 <= p(1)._1)
    }
    assert(clusteredOk, "per-partition file ranges must be disjoint")
    assert(GraftTxn.dataFiles(dir).forall(_.matches("p=[0-3]/.*")))
    assert(spark.table("p14l.t").count() == 400)
    // recover is idempotent SQL: nothing half-done → 0 resolved
    assert(spark.sql("CALL p14l.recover('t')").head().getLong(0) == 0L)
    spark.sql("DROP TABLE IF EXISTS p14l.t"): Unit
  }

  test("multi-level partitioning: two identity columns nest, prune, and time travel") {
    val base = freshCatalog("p14m")
    spark.sql("DROP TABLE IF EXISTS p14m.t")
    spark.range(0, 120)
      .selectExpr("id AS k", "CAST(id % 3 AS INT) AS a",
        "CAST(id % 2 AS INT) AS b")
      .createOrReplaceTempView("p14m_seed")
    spark.sql("CREATE TABLE p14m.t PARTITIONED BY (a, b) AS " +
      "SELECT * FROM p14m_seed")
    val dir = new File(base, "t")
    val files = GraftTxn.dataFiles(dir)
    assert(files.nonEmpty && files.forall(_.matches("a=[0-2]/b=[01]/.*")),
      s"nested hive layout expected: $files")
    // pruning on either level
    val scanned = spark.table("p14m.t")
      .filter(col("a") === 1 && col("b") === 0)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("a=1/b=0/")))
    assert(spark.table("p14m.t").filter(col("a") === 1).count() == 40)
    // a rewrite scoped to one leaf partition keeps the nesting
    spark.sql("UPDATE p14m.t SET k = k + 1000 WHERE a = 2 AND b = 1")
    val after = GraftTxn.dataFiles(dir)
    assert(after.forall(_.matches("a=[0-2]/b=[01]/.*")),
      s"nesting broken by the rewrite: $after")
    assert(spark.table("p14m.t").filter(col("k") >= 1000).count() == 20)
    // time travel reads the nested snapshot
    assert(spark.sql("SELECT COUNT(*) FROM p14m.t VERSION AS OF 1")
      .head().getLong(0) == 120)
    spark.sql("DROP TABLE IF EXISTS p14m.t"): Unit
  }

  test("streaming sink into a PARTITIONED table keeps the hive layout") {
    import graft.sources.{GraftSinkEpochs, GraftStreamingWrite}
    val base = freshCatalog("p14n")
    spark.sql("DROP TABLE IF EXISTS p14n.t")
    spark.sql("CREATE TABLE p14n.t (k BIGINT, p INT) PARTITIONED BY (p)")
    val dir = new File(base, "t")
    val w = new GraftStreamingWrite(dir, "qpart",
      spark.table("p14n.t").schema)
    val stage = GraftSinkEpochs.epochStage(dir, "qpart", 0L)
    graft.sources.GraftCatalog.withPinFieldIds(
      spark.range(0, 40).selectExpr("id AS k", "CAST(id % 4 AS INT) AS p"),
      dir).write.mode("append").parquet(stage.getAbsolutePath)
    w.commit(0L, GraftTxn.dataFiles(stage).toArray.map(n =>
      graft.sources.GraftSinkCommitMessage(
        new File(stage, n).getAbsolutePath)))
    val files = GraftTxn.dataFiles(dir)
    assert(files.nonEmpty && files.forall(_.matches("p=[0-3]/.*")),
      s"epoch commit must split by the spec: $files")
    assert(spark.table("p14n.t").count() == 40)
    val scanned = spark.table("p14n.t").filter(col("p") === 2)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("p=2/")))
    spark.sql("DROP TABLE IF EXISTS p14n.t"): Unit
  }

  test("metadata tables: shadowed by real tables, null partition on flat layout") {
    val base = freshCatalog("p14o")
    assert(base.nonEmpty)
    spark.sql("DROP TABLE IF EXISTS p14o.t")
    spark.sql("CREATE TABLE p14o.t AS SELECT id AS k FROM range(0, 5)")
    spark.sql("INSERT INTO p14o.t VALUES (100)")
    // flat (unpartitioned) table: files rows carry a NULL partition
    val files = spark.sql("SELECT partition, size_bytes FROM p14o.t.files")
      .collect()
    assert(files.nonEmpty && files.forall(r => r.isNullAt(0) &&
      r.getLong(1) > 0))
    assert(spark.sql("SELECT COUNT(*) FROM p14o.t.history")
      .head().getLong(0) == 2L)
    // a REAL table named `history` under the same namespace shadows
    // the metadata relation
    spark.sql("DROP TABLE IF EXISTS p14o.t.history")
    spark.sql("CREATE TABLE p14o.t.history AS " +
      "SELECT id AS marker FROM range(0, 7)")
    assert(spark.sql("SELECT COUNT(*) FROM p14o.t.history")
      .head().getLong(0) == 7L, "a real table must shadow the relation")
    assert(spark.table("p14o.t.history").schema.fieldNames
      .sameElements(Array("marker")))
    spark.sql("DROP TABLE IF EXISTS p14o.t.history")
    spark.sql("DROP TABLE IF EXISTS p14o.t"): Unit
  }

  test("multi-table txn publishes CDC row images for CDF-enabled tables") {
    import graft.sources.{GraftCdf, GraftMultiTxn}
    val base = freshCatalog("p14p")
    spark.sql("DROP TABLE IF EXISTS p14p.fact")
    spark.sql("DROP TABLE IF EXISTS p14p.audit")
    spark.sql("CREATE TABLE p14p.fact " +
      "TBLPROPERTIES ('graft.cdf.enabled'='true') AS " +
      "SELECT id AS k, CAST(id AS LONG) AS v FROM range(0, 10)") // v1
    spark.sql("CREATE TABLE p14p.audit (batch_id BIGINT, n BIGINT)")
    val factDir = new File(base, "fact")
    import spark.implicits._
    GraftMultiTxn.run(spark, Seq(
      GraftMultiTxn.TableWrite(factDir,
        spark.table("p14p.fact").selectExpr("k", "CAST(v * 2 AS LONG) AS v"),
        overwrite = true),
      GraftMultiTxn.TableWrite(new File(base, "audit"),
        Seq((1L, 10L)).toDF("batch_id", "n"))))
    val feed = GraftCdf.rows(spark, factDir)
    val byVer = feed.groupBy(col("_commit_version"), col("_change_type"))
      .count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byVer((1L, "insert")) == 10L, s"CTAS images: $byVer")
    assert(byVer((2L, "insert")) == 10L &&
      byVer((2L, "delete")) == 10L,
      s"the txn's restatement must publish old+new images: $byVer")
    spark.sql("DROP TABLE IF EXISTS p14p.fact")
    spark.sql("DROP TABLE IF EXISTS p14p.audit"): Unit
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES evolves constraints; SHOW surfaces them") {
    import graft.sources.GraftConstraints
    val base = freshCatalog("p14q")
    assert(base.nonEmpty)
    spark.sql("DROP TABLE IF EXISTS p14q.t")
    spark.sql("CREATE TABLE p14q.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO p14q.t VALUES (1, -1.0)") // no constraint yet
    // add a CHECK after create: the NEXT commit enforces it (existing
    // rows are not re-validated — the lazy ADD CONSTRAINT contract)
    spark.sql("ALTER TABLE p14q.t SET TBLPROPERTIES " +
      "('graft.check.v_pos'='v > 0')")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO p14q.t VALUES (2, -2.0)")
    }
    assert(GraftConstraints.isViolation(e))
    assert(spark.table("p14q.t").count() == 1)
    // surfaced through SHOW TBLPROPERTIES
    val props = spark.sql("SHOW TBLPROPERTIES p14q.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.check.v_pos").contains("v > 0"), s"$props")
    // UNSET lifts it
    spark.sql("ALTER TABLE p14q.t UNSET TBLPROPERTIES " +
      "('graft.check.v_pos')")
    spark.sql("INSERT INTO p14q.t VALUES (3, -3.0)")
    assert(spark.table("p14q.t").count() == 2)
    // non-graft keys are not persisted — clean error
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE p14q.t SET TBLPROPERTIES ('foo'='bar')")
    }
    assert(e2.getMessage != null)
    spark.sql("DROP TABLE IF EXISTS p14q.t"): Unit
  }

  test("compactPartitions honors the declared spec and snapshots the pre-state") {
    val base = freshCatalog("p14d")
    val dir = seedPartitioned("p14d", base)
    // a stray k=v directory that is NOT a declared partition must be
    // ignored by maintenance (round 14: real partition metadata)
    val stray = new File(dir, "x=9")
    stray.mkdirs()
    val strayFile = new File(stray, "junk.parquet")
    java.nio.file.Files.write(strayFile.toPath, Array[Byte](1, 2, 3))
    val vPre = GraftTxn.version(dir)
    val res = graft.sources.GraftMaintenance.compactPartitions(
      spark, dir, _ => true, targetBytes = 1L << 40)
    assert(!res.contains("x=9"), s"stray dir compacted: $res")
    assert(strayFile.isFile, "stray file was touched")
    // ADVICE r13 #2: the pre-optimize version is snapshotted — a CDC
    // consumer's versionDiff over the optimize commit has both sides
    assert(GraftTxn.snapshotDir(dir, vPre).isDirectory,
      "pre-optimize state not snapshotted")
    assert(GraftTxn.version(dir) == vPre + 1)
    spark.sql("DROP TABLE IF EXISTS p14d.t"): Unit
  }
}
