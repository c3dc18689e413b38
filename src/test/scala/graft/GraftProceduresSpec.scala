package graft

import java.io.File

import graft.sources.{GraftCatalog, GraftTxn}

/** SQL stored procedures over the maintenance surface (round 13):
  * `CALL cat.restore/optimize/vacuum/history(...)` through Spark 4's
  * DSv2 ProcedureCatalog — the SQL-only user's face over exactly the
  * machinery sql53/x181/x183 drive programmatically. */
class GraftProceduresSpec extends SparkSpec {

  private def freshCatalog(tag: String): String = {
    val base = new File(sys.props("java.io.tmpdir"),
      s"graft_proc_${tag}_${System.nanoTime()}")
    spark.conf.set(s"spark.sql.catalog.$tag",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.base", base.getAbsolutePath)
    base.getAbsolutePath
  }

  test("CALL restore/optimize/vacuum/history drive the full maintenance lifecycle") {
    val base = freshCatalog("pc")
    spark.sql("DROP TABLE IF EXISTS pc.t")
    spark.range(0, 200).selectExpr("id AS k", "CAST(id * 2 AS LONG) AS v")
      .repartition(8).createOrReplaceTempView("pc_seed")
    spark.sql("CREATE TABLE pc.t AS SELECT * FROM pc_seed") // v1
    spark.sql("UPDATE pc.t SET v = v + 1 WHERE k < 50") // v2
    spark.sql("DELETE FROM pc.t WHERE k >= 150") // v3
    val dir = new File(base, "t")

    // history == the commit log, one row per version
    val hist = spark.sql("CALL pc.history('t')").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), s"${hist.toSeq}")

    // restore by NAMED arguments (the Iceberg-style spelling)
    val restored = spark.sql(
      "CALL pc.restore(`table` => 't', version => 1)").head().getLong(0)
    assert(restored == 4L, "restore lands as a NEW version")
    assert(spark.table("pc.t").count() == 200L)
    assert(spark.sql("SELECT SUM(v) FROM pc.t").head().getLong(0) ==
      (0L until 200L).map(_ * 2).sum, "restored state == v1 exactly")

    // clustered optimize via CALL: 8 files -> 1, value-neutral
    val opt = spark.sql(
      "CALL pc.optimize('t', 1073741824, 'k')").head()
    assert(opt.getLong(0) == 8L && opt.getLong(1) == 1L, s"$opt")
    assert(spark.table("pc.t").count() == 200L)
    assert(GraftTxn.version(dir) == 5L)

    // plain (non-clustered) optimize omitting the default arg is a
    // no-op on an already-packed table: no bump
    val opt2 = spark.sql("CALL pc.optimize('t', 1073741824)").head()
    assert(opt2.getLong(0) == opt2.getLong(1))
    assert(GraftTxn.version(dir) == 5L, "maintenance no-op must not bump")

    // vacuum via CALL reclaims history
    val removed = spark.sql("CALL pc.vacuum('t', 1)").head().getLong(0)
    assert(removed >= 1L)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM pc.t VERSION AS OF 1").collect()
    }
    assert(e.getMessage != null)
    assert(spark.table("pc.t").count() == 200L)

    // the system-namespace spelling works; unknown procedures error
    assert(spark.sql("CALL pc.system.history('t')").count() == 5L)
    val bad = intercept[Exception] {
      spark.sql("CALL pc.no_such_proc('t')").collect()
    }
    assert(bad.getMessage != null)
    spark.sql("DROP TABLE IF EXISTS pc.t"): Unit
  }
}
