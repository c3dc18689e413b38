package graft

import java.io.File
import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, GraftMaintenance, GraftTxn}

/** Round-13 warehouse surface: phantom-insert detection for MERGE,
  * RESTORE-to-version under the commit protocol, vacuum's crashed-
  * writer debris sweep, ALTER TABLE ADD COLUMN schema evolution, and
  * partition-scoped transactional OPTIMIZE. */
class Round13Spec extends SparkSpec {

  private def freshCatalog(tag: String): String = {
    val base = new File(sys.props("java.io.tmpdir"),
      s"graft_r13_${tag}_${System.nanoTime()}")
    spark.conf.set(s"spark.sql.catalog.$tag",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.base", base.getAbsolutePath)
    base.getAbsolutePath
  }

  /** PUBLISHED snapshot dirs only (v<N>); `_build_` temps are debris. */
  private def snapshotNames(dir: File): Set[String] =
    Option(new File(dir, "_snapshots").listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.contains("_build_"))
      .map(_.getName).toSet

  private def rmTree(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(): Unit
  }

  private def withCommitBarrier[T](parties: Int)(body: => T): T = {
    val latch = new CountDownLatch(parties)
    GraftTxn.commitHook = () => {
      latch.countDown()
      latch.await(60, TimeUnit.SECONDS): Unit
    }
    try body finally GraftTxn.commitHook = () => ()
  }

  test("phantom insert: two concurrent upsert-MERGEs of a NEW key land exactly once") {
    freshCatalog("ph")
    spark.sql("DROP TABLE IF EXISTS ph.t")
    spark.sql("CREATE TABLE ph.t AS SELECT CAST(0 AS BIGINT) AS k, " +
      "CAST(0 AS BIGINT) AS v")
    def upsert(add: Long): String =
      s"""MERGE INTO ph.t t USING (SELECT CAST(99 AS BIGINT) AS k) s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = t.v + $add
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, $add)""".stripMargin
    val attempts = withCommitBarrier(2) {
      val fa = Future(GraftTxn.retryCounted(5) {
        spark.sql(upsert(7L)).collect(): Unit
      }._2)
      val fb = Future(GraftTxn.retryCounted(5) {
        spark.sql(upsert(11L)).collect(): Unit
      }._2)
      Seq(Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    }
    // without append-conflict validation both take the NOT MATCHED arm
    // (neither deletes a file the other read) and k=99 lands twice
    assert(attempts.sorted == Seq(1, 2), s"attempts were $attempts")
    val rows = spark.sql("SELECT v FROM ph.t WHERE k = 99").collect()
    assert(rows.length == 1, s"phantom insert: k=99 landed ${rows.length}x")
    assert(rows.head.getLong(0) == 18L,
      s"both effects must land once (7 + 11): ${rows.head.getLong(0)}")
    spark.sql("DROP TABLE IF EXISTS ph.t"): Unit
  }

  test("RESTORE promotes a retained version as a NEW commit; history keeps moving") {
    val base = freshCatalog("rst")
    spark.sql("DROP TABLE IF EXISTS rst.t")
    spark.sql("CREATE TABLE rst.t AS " +
      "SELECT id AS k, id * 10 AS v FROM range(0, 10)") // v1
    val dir = new File(base, "t")
    spark.sql("UPDATE rst.t SET v = v + 1 WHERE k < 3") // v2
    spark.sql("DELETE FROM rst.t WHERE k >= 5") // v3 (whole-dir swap path)
    assert(GraftTxn.version(dir) == 3L)
    assert(spark.table("rst.t").count() == 5L)

    val vNew = GraftMaintenance.restore(dir, 1L)
    assert(vNew == 4L, "restore is a NEW version, not a rewind")
    // restored state == v1 exactly
    val got = spark.table("rst.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 10L).map(k => k -> k * 10).toMap,
      s"restored state diverged: $got")
    // history is continuous: the pre-restore state is still readable
    assert(spark.sql("SELECT COUNT(*) FROM rst.t VERSION AS OF 3")
      .head().getLong(0) == 5L)
    // the restore restored the schema pin too (same schema here) and a
    // no-op restore to the current version does not bump
    assert(GraftMaintenance.restore(dir, 4L) == 4L)
    assert(GraftTxn.version(dir) == 4L)
    spark.sql("DROP TABLE IF EXISTS rst.t"): Unit
  }

  test("RESTORE racing a concurrent commit: one conflicts, nothing interleaves") {
    val base = freshCatalog("rsc")
    spark.sql("DROP TABLE IF EXISTS rsc.t")
    // ONE data file: with split files a racing UPDATE whose group is
    // disjoint from the restored delta may legitimately commit too
    // (serial-equivalent under SI) — the single file forces the
    // overlap this test is about, like the DELETE-pair spec
    spark.range(0, 10).selectExpr("id AS k", "CAST(0 AS LONG) AS v")
      .coalesce(1).createOrReplaceTempView("rsc_seed")
    spark.sql("CREATE TABLE rsc.t AS SELECT * FROM rsc_seed") // v1
    spark.sql("UPDATE rsc.t SET v = 1 WHERE k < 5") // v2
    val dir = new File(base, "t")
    val outcomes = withCommitBarrier(2) {
      val fr = Future(
        try { GraftMaintenance.restore(dir, 1L); None }
        catch { case t: Throwable => Some(t) })
      val fu = Future(
        try { spark.sql("UPDATE rsc.t SET v = 2 WHERE k >= 5").collect(); None }
        catch { case t: Throwable => Some(t) })
      Seq(Await.result(fr, 120.seconds), Await.result(fu, 120.seconds))
    }
    def isConflict(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[GraftTxn.CommitConflictException] ||
        isConflict(t.getCause))
    val failed = outcomes.flatten
    assert(failed.size == 1, s"expected exactly one loser: $outcomes")
    assert(isConflict(failed.head), s"wrong error: ${failed.head}")
    val sumV = spark.table("rsc.t").agg(sum("v")).head().getLong(0)
    // restore won → v1 state (all zeros); update won → v2 + its delta
    assert(sumV == 0L || sumV == 15L, s"interleaved state: sumV=$sumV")
    spark.sql("DROP TABLE IF EXISTS rsc.t"): Unit
  }

  test("vacuum sweeps crashed-writer debris; fresh stages and live data survive") {
    val base = freshCatalog("gc")
    spark.sql("DROP TABLE IF EXISTS gc.t")
    spark.sql("CREATE TABLE gc.t AS SELECT id AS k FROM range(0, 100)")
    spark.sql("UPDATE gc.t SET k = k + 1000 WHERE k = 0") // one snapshot
    val dir = new File(base, "t")
    val old = System.currentTimeMillis() - 100000L
    // crashed writer's stage, a half-built snapshot temp, a sibling
    // rewrite dir — all old; plus one FRESH stage (a live writer)
    val staleStage = new File(dir, "_stage_rewrite_crashed_1")
    staleStage.mkdirs(); staleStage.setLastModified(old)
    val freshStage = new File(dir, "_stage_rewrite_live_2")
    freshStage.mkdirs()
    val snapTemp = new File(new File(dir, "_snapshots"), "v9_build_123")
    snapTemp.mkdirs(); snapTemp.setLastModified(old)
    val sibling = new File(dir.getParentFile, "t.rewrite_999")
    sibling.mkdirs(); sibling.setLastModified(old)
    val dataBefore = GraftTxn.dataFiles(dir)
    val snapsBefore = snapshotNames(dir)

    GraftMaintenance.vacuum(dir, retain = 8, staleDebrisMs = 50000L): Unit

    assert(!staleStage.exists(), "stale stage must be swept")
    assert(!snapTemp.exists(), "half-built snapshot temp must be swept")
    assert(!sibling.exists(), "orphaned sibling rewrite dir must be swept")
    assert(freshStage.exists(), "a fresh (possibly live) stage must survive")
    assert(GraftTxn.dataFiles(dir) == dataBefore, "live data untouched")
    assert(snapshotNames(dir) == snapsBefore,
      "published snapshots untouched")
    assert(spark.table("gc.t").count() == 100L)
    freshStage.delete(): Unit
    spark.sql("DROP TABLE IF EXISTS gc.t"): Unit
  }

  test("ALTER TABLE ADD COLUMN: nulls for old files, old schema via time travel") {
    val base = freshCatalog("alt")
    spark.sql("DROP TABLE IF EXISTS alt.t")
    spark.sql("CREATE TABLE alt.t AS " +
      "SELECT id AS k, id * 2 AS v FROM range(0, 5)") // v1
    val dir = new File(base, "t")
    spark.sql("ALTER TABLE alt.t ADD COLUMN tag STRING") // v2
    assert(GraftTxn.version(dir) == 2L, "ALTER is a commit")
    val afterAlter = spark.table("alt.t")
    assert(afterAlter.schema.fieldNames.toSeq == Seq("k", "v", "tag"))
    assert(afterAlter.filter(col("tag").isNull).count() == 5L,
      "pre-alter files read null for the added column")
    // writes after the alter carry the column (V2 append commit)
    spark.sql("INSERT INTO alt.t VALUES (100, 200, 'new')")
    assert(spark.table("alt.t").filter(col("tag") === "new").count() == 1L)
    // row-level ops across MIXED files (old without the column, new
    // with it) work under the evolved schema
    spark.sql("UPDATE alt.t SET tag = 'backfilled' WHERE tag IS NULL")
    assert(spark.table("alt.t").filter(col("tag").isNull).count() == 0L)
    assert(spark.table("alt.t").count() == 6L)
    // time travel BEFORE the alter reads the old two-column schema
    val v1 = spark.sql("SELECT * FROM alt.t VERSION AS OF 1")
    assert(v1.schema.fieldNames.toSeq == Seq("k", "v"),
      s"pre-alter snapshot must keep its pinned schema: ${v1.schema}")
    assert(v1.count() == 5L)
    // DROP COLUMN is the metadata-only inverse: the column vanishes
    // from reads, old files keep (invisible) bytes, history keeps the
    // wider schema
    val vPreDrop = GraftTxn.version(dir)
    spark.sql("ALTER TABLE alt.t DROP COLUMN v")
    assert(GraftTxn.version(dir) == vPreDrop + 1, "DROP is a commit")
    assert(spark.table("alt.t").schema.fieldNames.toSeq == Seq("k", "tag"))
    assert(spark.table("alt.t").count() == 6L)
    assert(spark.sql(s"SELECT * FROM alt.t VERSION AS OF $vPreDrop")
      .schema.fieldNames.toSeq == Seq("k", "v", "tag"),
      "the pre-drop snapshot must keep the wider schema")
    // RENAME COLUMN (round 14, VERDICT r13 #6): metadata-only pin
    // rewrite — reads resolve parquet columns by STABLE FIELD ID, so
    // pre-rename files keep their values under the new name (the
    // silent-null hazard that kept rename rejected through r13)
    val vPreRename = GraftTxn.version(dir)
    spark.sql("ALTER TABLE alt.t RENAME COLUMN tag TO label")
    assert(GraftTxn.version(dir) == vPreRename + 1, "RENAME is a commit")
    assert(spark.table("alt.t").schema.fieldNames.toSeq == Seq("k", "label"))
    assert(spark.table("alt.t").filter(col("label").isNotNull).count() == 6L,
      "pre-rename files must read their values under the NEW name")
    assert(spark.table("alt.t")
      .filter(col("label") === "backfilled").count() == 5L)
    // time travel across the boundary: the pre-rename snapshot reads
    // under the OLD name
    val preRen = spark.sql(s"SELECT * FROM alt.t VERSION AS OF $vPreRename")
    assert(preRen.schema.fieldNames.toSeq == Seq("k", "tag"))
    assert(preRen.filter(col("tag") === "backfilled").count() == 5L,
      "pre-rename snapshot must read values under the old name")
    // an ID-LESS column (table predating field ids) still rejects
    // cleanly instead of nulling old files: strip the ids from the pin
    // and try
    val pin = new File(dir, "_graft_schema.json")
    val stripped = org.apache.spark.sql.types.StructType(
      spark.table("alt.t").schema.fields.map(f =>
        org.apache.spark.sql.types.StructField(f.name, f.dataType,
          f.nullable)))
    java.nio.file.Files.write(pin.toPath,
      stripped.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE alt.t RENAME COLUMN label TO tag2").collect()
    }
    assert(e.getMessage != null &&
      e.getMessage.contains("field id"),
      s"id-less rename must reject cleanly: ${e.getMessage}")
    spark.sql("DROP TABLE IF EXISTS alt.t"): Unit
  }

  test("SQL INSERT joins the protocol: versioned, time-travelable, overwrite restates") {
    val base = freshCatalog("ins")
    spark.sql("DROP TABLE IF EXISTS ins.t")
    spark.sql("CREATE TABLE ins.t AS SELECT id AS k FROM range(0, 5)") // v1
    val dir = new File(base, "t")
    assert(GraftTxn.version(dir) == 1L)
    spark.sql("INSERT INTO ins.t SELECT id FROM range(100, 103)") // v2
    assert(GraftTxn.version(dir) == 2L,
      "INSERT INTO must be a versioned commit (V2 append path)")
    assert(spark.table("ins.t").count() == 8L)
    // the pre-insert state is a retained version
    assert(spark.sql("SELECT COUNT(*) FROM ins.t VERSION AS OF 1")
      .head().getLong(0) == 5L)
    // concurrent INSERTs: appends never conflict — both land, two bumps
    val fa = Future(spark.sql(
      "INSERT INTO ins.t SELECT id FROM range(200, 203)").collect())
    val fb = Future(spark.sql(
      "INSERT INTO ins.t SELECT id FROM range(300, 303)").collect())
    Await.result(fa, 120.seconds); Await.result(fb, 120.seconds)
    assert(spark.table("ins.t").count() == 14L,
      "concurrent inserts must both land (serialized, never lost)")
    assert(GraftTxn.version(dir) == 4L)
    // INSERT OVERWRITE restates the table as one versioned commit
    spark.sql("INSERT OVERWRITE ins.t SELECT id FROM range(0, 2)") // v5
    assert(spark.table("ins.t").count() == 2L)
    assert(GraftTxn.version(dir) == 5L)
    assert(spark.sql("SELECT COUNT(*) FROM ins.t VERSION AS OF 4")
      .head().getLong(0) == 14L,
      "the pre-overwrite state must survive as a retained version")
    spark.sql("DROP TABLE IF EXISTS ins.t"): Unit
  }

  test("partition-scoped OPTIMIZE: untouched partitions byte-identical, one version bump") {
    val dir = new File(sys.props("java.io.tmpdir"),
      s"graft_r13_pc_${System.nanoTime()}")
    spark.range(0, 2000)
      .selectExpr("id AS k", "CAST(id % 2 AS INT) AS p")
      .repartition(8)
      .write.partitionBy("p").mode("overwrite")
      .parquet(dir.getAbsolutePath)
    val p0 = new File(dir, "p=0"); val p1 = new File(dir, "p=1")
    def fileSig(d: File): Map[String, Long] =
      GraftTxn.dataFiles(d).map(n => n -> new File(d, n).length()).toMap
    val p0Before = fileSig(p0); val p1Before = fileSig(p1)
    assert(p0Before.size == 8 && p1Before.size == 8)
    val sumBefore = spark.read.parquet(dir.getAbsolutePath)
      .agg(sum("k")).head().getLong(0)
    val vBefore = GraftTxn.version(dir)

    val res = GraftMaintenance.compactPartitions(spark, dir,
      where = _ == "p=0", targetBytes = 1L << 30)

    assert(res.keySet == Set("p=0"))
    assert(res("p=0")._1 == 8 && res("p=0")._2 == 1,
      s"p=0 should pack to one file: $res")
    assert(fileSig(p1) == p1Before,
      "untouched partition must be byte-identical (names + sizes)")
    assert(fileSig(p0).size == 1)
    assert(GraftTxn.version(dir) == vBefore + 1, "one bump per statement")
    val sumAfter = spark.read.parquet(dir.getAbsolutePath)
      .agg(sum("k")).head().getLong(0)
    assert(sumAfter == sumBefore, "maintenance must be value-neutral")
    assert(spark.read.parquet(dir.getAbsolutePath).count() == 2000L)
    // a call that qualifies nothing is a no-op: no bump
    val none = GraftMaintenance.compactPartitions(spark, dir,
      where = _ == "p=7")
    assert(none.isEmpty)
    assert(GraftTxn.version(dir) == vBefore + 1)
    rmTree(dir)
  }

  test("partition-scoped OPTIMIZE conflicts when a touched partition changes under it") {
    val dir = new File(sys.props("java.io.tmpdir"),
      s"graft_r13_pcc_${System.nanoTime()}")
    spark.range(0, 1000)
      .selectExpr("id AS k", "CAST(id % 2 AS INT) AS p")
      .repartition(4)
      .write.partitionBy("p").mode("overwrite")
      .parquet(dir.getAbsolutePath)
    val p0 = new File(dir, "p=0")
    val vBefore = GraftTxn.version(dir)
    val filesBefore = GraftTxn.dataFiles(p0)
    // a concurrent commit lands in the TOUCHED partition between the
    // staging read and the lock: the hook fires exactly there
    GraftTxn.commitHook = () => {
      val extra = new File(p0, "part-concurrent-append.parquet")
      java.nio.file.Files.copy(
        new File(p0, filesBefore.head).toPath, extra.toPath): Unit
    }
    try {
      val e = intercept[GraftTxn.CommitConflictException] {
        GraftMaintenance.compactPartitions(spark, dir,
          where = _ == "p=0", targetBytes = 1L << 30)
      }
      assert(e.getMessage.contains("p=0"))
    } finally GraftTxn.commitHook = () => ()
    // the loser aborted cleanly: original files + the concurrent
    // append intact, no stage debris, no version bump
    assert(GraftTxn.dataFiles(p0) ==
      filesBefore + "part-concurrent-append.parquet")
    assert(GraftTxn.version(dir) == vBefore, "a losing commit must not bump")
    val stray = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("_stage_"))
    assert(stray.isEmpty, s"stage debris: ${stray.map(_.getName).toSeq}")
    assert(spark.read.parquet(dir.getAbsolutePath)
      .filter(col("p") === 0).count() > 500L) // original + duplicated file
    rmTree(dir)
  }
}
