package graft

import java.io.File
import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.sources.{GraftCatalog, GraftMaintenance, GraftTxn}

/** Transactional table maintenance (round 12): OPTIMIZE and VACUUM
  * under the commit protocol. The x181 contract row pins the
  * value-neutrality claims; this spec pins the concurrency and
  * no-op semantics the oracle can't see. */
class GraftMaintenanceSpec extends SparkSpec {

  private def freshCatalog(tag: String): String = {
    val base = new File(sys.props("java.io.tmpdir"),
      s"graft_maint_${tag}_${System.nanoTime()}")
    spark.conf.set(s"spark.sql.catalog.$tag",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.base", base.getAbsolutePath)
    base.getAbsolutePath
  }

  test("compaction losing to a concurrent UPDATE conflicts; neither write is lost") {
    val base = freshCatalog("mtc")
    spark.sql("DROP TABLE IF EXISTS mtc.t")
    spark.range(0, 2000).selectExpr("id AS k", "CAST(0 AS LONG) AS v")
      .repartition(16).createOrReplaceTempView("mtc_seed")
    spark.sql("CREATE TABLE mtc.t AS SELECT * FROM mtc_seed")
    val dir = new File(base, "t")
    assert(GraftTxn.dataFiles(dir).size == 16)
    val latch = new CountDownLatch(2)
    GraftTxn.commitHook = () => {
      latch.countDown(); latch.await(60, TimeUnit.SECONDS): Unit
    }
    try {
      val fc = Future(
        try { GraftMaintenance.compact(spark, dir); None }
        catch { case t: Throwable => Some(t) })
      val fu = Future(
        try {
          spark.sql("UPDATE mtc.t SET v = v + 1 WHERE k % 2 = 0")
            .collect(); None
        } catch { case t: Throwable => Some(t) })
      val (rc, ru) = (Await.result(fc, 120.seconds),
        Await.result(fu, 120.seconds))
      def isConflict(t: Throwable): Boolean =
        t != null && (t.isInstanceOf[GraftTxn.CommitConflictException] ||
          isConflict(t.getCause))
      // exactly one of them lost the race — whichever it was, the
      // table's VALUES reflect exactly the winner's effect plus any
      // completed loser retry... here neither retries, so: if the
      // compaction lost, the UPDATE's effect stands on the original
      // layout; if the UPDATE lost, the table is compacted unchanged
      val failed = Seq(rc, ru).flatten
      assert(failed.size == 1, s"expected exactly one loser: $rc / $ru")
      assert(isConflict(failed.head), s"wrong error: ${failed.head}")
      val sumV = spark.table("mtc.t")
        .agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0)
      if (ru.isEmpty) assert(sumV == 1000L, "UPDATE won: +1 on 1000 keys")
      else assert(sumV == 0L, "compaction won: values untouched")
      assert(spark.table("mtc.t").count() == 2000L)
    } finally GraftTxn.commitHook = () => ()
    spark.sql("DROP TABLE IF EXISTS mtc.t"): Unit
  }

  test("compaction is a no-op (no version bump) when already packed; vacuum reclaims history") {
    val base = freshCatalog("mtn")
    spark.sql("DROP TABLE IF EXISTS mtn.t")
    spark.range(0, 100).selectExpr("id AS k").coalesce(1)
      .createOrReplaceTempView("mtn_seed")
    spark.sql("CREATE TABLE mtn.t AS SELECT * FROM mtn_seed")
    val dir = new File(base, "t")
    val v0 = GraftTxn.version(dir)
    val (b, a) = GraftMaintenance.compact(spark, dir)
    assert(b == a, "single-file table must not recompact")
    assert(GraftTxn.version(dir) == v0,
      "a maintenance no-op must not bump the version")
    // build some history, then vacuum it away
    (1 to 3).foreach(i =>
      spark.sql(s"UPDATE mtn.t SET k = k WHERE k = -$i")) // no-match, cheap
    spark.sql("UPDATE mtn.t SET k = k + 1000 WHERE k = 0") // real commit
    val removed = GraftMaintenance.vacuum(dir, retain = 1)
    assert(removed >= 1, "vacuum should drop older snapshots")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM mtn.t VERSION AS OF $v0").collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("no snapshot")),
      s"vacuumed version must error cleanly: ${chain(e)}")
    spark.sql("DROP TABLE IF EXISTS mtn.t"): Unit
  }
}
