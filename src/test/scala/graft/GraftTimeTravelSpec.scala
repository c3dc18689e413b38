package graft

import java.io.File

import graft.sources.{GraftCatalog, GraftTxn}

/** Time travel over graft tables (round 12): every transactional
  * commit snapshots its pre-state under `_snapshots/v<N>` and
  * `VERSION AS OF n` resolves to it. The sql52 contract row pins the
  * values; this spec pins the mechanics the oracle can't see —
  * retention pruning, error surfaces, and history surviving the
  * DELETE path's whole-directory swap. */
class GraftTimeTravelSpec extends SparkSpec {

  private def freshCatalog(tag: String): String = {
    val base = new File(sys.props("java.io.tmpdir"),
      s"graft_tt_spec_${tag}_${System.nanoTime()}")
    spark.conf.set(s"spark.sql.catalog.$tag",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.base", base.getAbsolutePath)
    base.getAbsolutePath
  }

  test("versions survive the DELETE swap; v0 is the empty pre-CTAS table") {
    val base = freshCatalog("ttm")
    spark.sql("DROP TABLE IF EXISTS ttm.t")
    spark.sql("CREATE TABLE ttm.t AS SELECT id AS k, id * 10 AS v " +
      "FROM range(0, 20)") // v1
    spark.sql("UPDATE ttm.t SET v = v + 1000 WHERE k % 5 = 0") // v2
    spark.sql("DELETE FROM ttm.t WHERE k % 3 = 0") // v3, whole-dir swap
    val dir = new File(base, "t")
    assert(GraftTxn.version(dir) == 3L)
    def sumAt(ver: Int): Long =
      spark.sql(s"SELECT COALESCE(SUM(v), 0) FROM ttm.t VERSION AS OF $ver")
        .head().getLong(0)
    val s1 = (0L until 20L).map(_ * 10).sum
    val s2 = s1 + 4 * 1000 // k in {0,5,10,15}
    val s3 = (0L until 20L).filter(_ % 3 != 0)
      .map(k => k * 10 + (if (k % 5 == 0) 1000 else 0)).sum
    assert(sumAt(0) == 0L, "v0 must be the empty pre-CTAS table")
    assert(sumAt(1) == s1)
    assert(sumAt(2) == s2, "v2 (pre-DELETE) must survive the dir swap")
    assert(sumAt(3) == s3)
    assert(spark.table("ttm.t").agg(org.apache.spark.sql.functions
      .sum("v")).head().getLong(0) == s3, "current == v3")
    spark.sql("DROP TABLE IF EXISTS ttm.t"): Unit
  }

  test("TIMESTAMP AS OF resolves through the commit log to the right version") {
    freshCatalog("tts")
    spark.sql("DROP TABLE IF EXISTS tts.t")
    def utc(ms: Long): String =
      java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ms))
    val t0 = System.currentTimeMillis() - 1000
    spark.sql("CREATE TABLE tts.t AS SELECT id AS k, id AS v " +
      "FROM range(0, 10)") // v1
    Thread.sleep(60)
    val mid = System.currentTimeMillis()
    Thread.sleep(60)
    spark.sql("UPDATE tts.t SET v = v + 100 WHERE k >= 0") // v2
    def sumAt(ts: String): Long =
      spark.sql("SELECT COALESCE(SUM(v), 0) FROM tts.t " +
        s"TIMESTAMP AS OF '$ts'").head().getLong(0)
    val s1 = (0L until 10L).sum
    assert(sumAt(utc(mid)) == s1, "mid-instant must resolve to v1")
    assert(sumAt(utc(System.currentTimeMillis() + 1000)) == s1 + 1000,
      "a future instant must resolve to the current version")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM tts.t TIMESTAMP AS OF '${utc(t0)}'")
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("no commit at or before")),
      s"wrong error: ${chain(e)}")
    spark.sql("DROP TABLE IF EXISTS tts.t"): Unit
  }

  test("retention prunes oldest; a pruned version errors with the retained list") {
    freshCatalog("ttr")
    val prev = spark.conf.getOption("spark.graft.snapshots.retain")
    spark.conf.set("spark.graft.snapshots.retain", "2")
    try {
      spark.sql("DROP TABLE IF EXISTS ttr.t")
      spark.sql("CREATE TABLE ttr.t AS SELECT id AS k, id AS v " +
        "FROM range(0, 10)") // v1
      (1 to 4).foreach { i =>
        spark.sql(s"UPDATE ttr.t SET v = v + $i WHERE k >= 0") // v2..v5
      }
      // current v5; retained snapshots should be at most the last 2
      val ok = spark.sql("SELECT COUNT(*) FROM ttr.t VERSION AS OF 4")
        .head().getLong(0)
      assert(ok == 10L)
      val e = intercept[Exception] {
        spark.sql("SELECT COUNT(*) FROM ttr.t VERSION AS OF 1").collect()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(m => m.contains("no snapshot") &&
        m.contains("retained")), s"wrong error: ${chain(e)}")
      spark.sql("DROP TABLE IF EXISTS ttr.t"): Unit
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.snapshots.retain", v)
      case None => spark.conf.unset("spark.graft.snapshots.retain")
    }
  }

  test("a non-numeric version errors cleanly") {
    freshCatalog("ttx")
    spark.sql("DROP TABLE IF EXISTS ttx.t")
    spark.sql("CREATE TABLE ttx.t AS SELECT id FROM range(0, 3)")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM ttx.t VERSION AS OF 'abc'").collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("commit counters")),
      s"wrong error: ${chain(e)}")
    spark.sql("DROP TABLE IF EXISTS ttx.t"): Unit
  }
}
