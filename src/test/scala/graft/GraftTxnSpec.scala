package graft

import java.io.File
import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.sources.{GraftCatalog, GraftTxn}

/** Optimistic concurrency on graft-table commits (VERDICT r11 #1).
  *
  * Determinism: `GraftTxn.commitHook` is a latch both statements hit
  * at commit entry (after their reads completed, before the lock), so
  * the overlap that production would hit by timing is forced by
  * construction — no sleeps, no flaky races. The lock then serializes:
  * the first committer validates cleanly, the second finds its read
  * snapshot invalidated.
  */
class GraftTxnSpec extends SparkSpec {

  private def freshCatalog(tag: String): String = {
    val base = new File(sys.props("java.io.tmpdir"),
      s"graft_txn_spec_${tag}_${System.nanoTime()}")
    spark.conf.set(s"spark.sql.catalog.$tag",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.base", base.getAbsolutePath)
    base.getAbsolutePath
  }

  /** Install a both-must-arrive barrier as the commit hook; later
    * arrivals (retries) pass through a drained latch instantly. */
  private def withCommitBarrier[T](parties: Int)(body: => T): T = {
    val latch = new CountDownLatch(parties)
    GraftTxn.commitHook = () => {
      latch.countDown()
      latch.await(60, TimeUnit.SECONDS): Unit
    }
    try body finally GraftTxn.commitHook = () => ()
  }

  test("two concurrent MERGEs: both effects land exactly once, loser retries") {
    val base = freshCatalog("txnm")
    spark.sql("DROP TABLE IF EXISTS txnm.t")
    spark.range(1, 11).selectExpr("id AS k", "CAST(0 AS LONG) AS v")
      .repartition(2).createOrReplaceTempView("txnm_seed")
    spark.sql("CREATE TABLE txnm.t AS SELECT * FROM txnm_seed")
    assert(new File(base, "t").isDirectory)

    def merge(lo: Int, hi: Int, add: Long, insertKey: Long): String =
      s"""MERGE INTO txnm.t t USING (
         |  SELECT id AS k FROM range($lo, ${hi + 1})
         |  UNION ALL SELECT $insertKey AS k
         |) s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = t.v + $add
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, $add)""".stripMargin

    val attempts = withCommitBarrier(2) {
      val fa = Future(GraftTxn.retryCounted(5) {
        spark.sql(merge(1, 5, 100L, 101L)).collect(): Unit
      }._2)
      val fb = Future(GraftTxn.retryCounted(5) {
        spark.sql(merge(6, 10, 1000L, 102L)).collect(): Unit
      }._2)
      Seq(Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    }
    // the lock serialized them: one clean commit, one retry that
    // re-ran against the winner's snapshot
    assert(attempts.sorted == Seq(1, 2), s"attempts were $attempts")

    val rows = spark.table("txnm.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected =
      (1L to 5L).map(_ -> 100L).toMap ++
      (6L to 10L).map(_ -> 1000L).toMap +
      (101L -> 100L) + (102L -> 1000L)
    assert(rows == expected, s"final state diverged: $rows")
    assert(GraftTxn.version(new File(base, "t")) >= 3L) // CTAS + 2 merges
    spark.sql("DROP TABLE IF EXISTS txnm.t"): Unit
  }

  test("conflicting DELETE pair: loser aborts cleanly, no stray rewrite dirs") {
    val base = freshCatalog("txnd")
    spark.sql("DROP TABLE IF EXISTS txnd.t")
    // one data file → the two DELETEs' scanned sets must collide
    spark.range(0, 10).selectExpr("id AS k").coalesce(1)
      .createOrReplaceTempView("txnd_seed")
    spark.sql("CREATE TABLE txnd.t AS SELECT * FROM txnd_seed")

    val outcomes = withCommitBarrier(2) {
      def run(key: Int): Future[Option[Throwable]] = Future {
        try { spark.sql(s"DELETE FROM txnd.t WHERE k = $key").collect(); None }
        catch { case t: Throwable => Some(t) }
      }
      val fa = run(1); val fb = run(2)
      Seq(Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    }
    def isConflict(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[GraftTxn.CommitConflictException] ||
        isConflict(t.getCause))
    val failed = outcomes.flatten
    assert(failed.size == 1, s"expected exactly one loser, got $outcomes")
    assert(isConflict(failed.head),
      s"loser failed with the wrong error: ${failed.head}")
    // winner's effect only: 9 rows, and the table still reads cleanly
    assert(spark.table("txnd.t").count() == 9L)
    // the loser removed its rewrite dir and its lock
    val leftovers = Option(new File(base).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(n => n.contains(".rewrite_") ||
        n.contains(".trash_") || n.endsWith(".commitlock"))
    assert(leftovers.isEmpty, s"stray commit artifacts: ${leftovers.toSeq}")
    spark.sql("DROP TABLE IF EXISTS txnd.t"): Unit
  }

  test("disjoint-group UPDATEs both commit (snapshot-isolation semantics)") {
    freshCatalog("txnu")
    spark.sql("DROP TABLE IF EXISTS txnu.t")
    spark.sql("CREATE TABLE txnu.t (k BIGINT, v BIGINT)")
    // two separate appends → two files with disjoint key ranges
    spark.sql("INSERT INTO txnu.t SELECT id, 0 FROM range(1, 6)")
    spark.sql("INSERT INTO txnu.t SELECT id, 0 FROM range(6, 11)")

    val outcomes = withCommitBarrier(2) {
      def run(whereLo: Int, whereHi: Int, add: Int): Future[Option[Throwable]] =
        Future {
          try {
            spark.sql(s"UPDATE txnu.t SET v = v + $add " +
              s"WHERE k >= $whereLo AND k <= $whereHi").collect()
            None
          } catch { case t: Throwable => Some(t) }
        }
      // static group pruning resolves disjoint files → disjoint
      // conflict sets → no conflict, both commit
      val fa = run(1, 5, 100); val fb = run(6, 10, 1000)
      Seq(Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    }
    assert(outcomes.flatten.isEmpty,
      s"disjoint updates should both commit: $outcomes")
    val rows = spark.table("txnu.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (1L to 5L).map(_ -> 100L).toMap ++
      (6L to 10L).map(_ -> 1000L).toMap
    assert(rows == expected, s"final state diverged: $rows")
    spark.sql("DROP TABLE IF EXISTS txnu.t"): Unit
  }

  test("a crashed writer's stale lock is broken after the staleness window") {
    val dir = new File(sys.props("java.io.tmpdir"),
      s"graft_txn_stale_${System.nanoTime()}")
    dir.mkdirs()
    val lock = new File(dir.getParentFile, dir.getName + ".commitlock")
    assert(lock.createNewFile(), "stale lock plant failed")
    // a crashed writer: the lock exists and is older than StaleLockMs
    assert(lock.setLastModified(System.currentTimeMillis() - 120000L))
    val t0 = System.currentTimeMillis()
    val ran = GraftTxn.withCommitLock(dir) { "body-ran" }
    assert(ran == "body-ran")
    assert(System.currentTimeMillis() - t0 < 30000L,
      "stale-break must engage, not wait out the full timeout")
    assert(!lock.exists(), "lock must be released after the body")
    dir.delete(): Unit
  }

  test("stress: N concurrent whole-table MERGE increments each land exactly once") {
    freshCatalog("txns")
    spark.sql("DROP TABLE IF EXISTS txns.t")
    spark.sql("CREATE TABLE txns.t AS " +
      "SELECT id AS k, CAST(0 AS LONG) AS v FROM range(0, 8)")
    // every writer increments EVERY row — all pairs conflict, so the
    // lock + snapshot validation must serialize them and retry must
    // deliver each effect exactly once (the classic lost-update test)
    val n = 4
    val amounts = Seq(1L, 10L, 100L, 1000L)
    val futures = amounts.map { a =>
      Future(GraftTxn.retryCounted(maxAttempts = n + 2) {
        spark.sql("MERGE INTO txns.t t USING " +
          "(SELECT id AS k FROM range(0, 8)) s ON t.k = s.k " +
          s"WHEN MATCHED THEN UPDATE SET v = t.v + $a").collect(): Unit
      }._2)
    }
    val attempts = futures.map(Await.result(_, 300.seconds))
    val rows = spark.table("txns.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (0L until 8L).map(_ -> amounts.sum).toMap
    assert(rows == expected,
      s"lost or doubled update: $rows (attempts $attempts)")
    assert(attempts.sum >= n, s"attempts $attempts")
    spark.sql("DROP TABLE IF EXISTS txns.t"): Unit
  }

  test("version marker: CTAS, UPDATE, DELETE each bump it monotonically") {
    val base = freshCatalog("txnv")
    spark.sql("DROP TABLE IF EXISTS txnv.t")
    spark.sql(
      "CREATE TABLE txnv.t AS SELECT id AS k, 0L AS v FROM range(0, 5)")
    val dir = new File(base, "t")
    val v1 = GraftTxn.version(dir)
    assert(v1 >= 1L, "CTAS append should bump the version")
    // round 13: SQL INSERT INTO now plans as a V2 append (GraftTable
    // is not a FileTable, so FallBackFileSourceV2's V1 rewrite never
    // fires) — data lands AND the insert is a versioned commit inside
    // the protocol, closing the boundary earlier rounds documented
    spark.sql("INSERT INTO txnv.t SELECT id, 0L FROM range(5, 8)")
    assert(spark.table("txnv.t").count() == 8L)
    assert(GraftTxn.version(dir) == v1 + 1,
      "SQL INSERT must commit through the V2 protocol and bump the version")
    spark.sql("UPDATE txnv.t SET v = v + 1 WHERE k >= 6")
    val v2 = GraftTxn.version(dir)
    assert(v2 > v1, "row-level UPDATE should bump the version")
    spark.sql("DELETE FROM txnv.t WHERE k = 0")
    val v3 = GraftTxn.version(dir)
    assert(v3 > v2, "copy-on-write DELETE should carry a bumped version")
    assert(spark.table("txnv.t").count() == 7L)
    spark.sql("DROP TABLE IF EXISTS txnv.t"): Unit
  }
}
