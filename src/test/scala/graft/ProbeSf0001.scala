package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: debug sql65/sql68 engine booleans at sf0.001. */
object ProbeSf0001 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = Tables.tune(spark)
    val sfDir = "/root/testdata/sf0.001"

    // ---- sql65 components
    {
      val cat = Tables.graftCatalog(s, "p65", sfDir)
      s.sql(s"DROP TABLE IF EXISTS $cat.orders_mor")
      Tables.orders(s, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(8)
        .createOrReplaceTempView("osrc")
      s.sql(s"CREATE TABLE $cat.orders_mor TBLPROPERTIES " +
        "('graft.dv.enabled'='true','graft.dv.maxRatio'='0.9'," +
        "'graft.cdf.enabled'='true') AS SELECT * FROM osrc")
      val dir = new java.io.File(
        s"${Tables.scratchDir("p65_cat", sfDir)}/orders_mor")
      val files1 = graft.sources.GraftTxn.dataFiles(dir)
      val maxKey = Tables.orders(s, sfDir)
        .agg(max(col("o_orderkey"))).head().getLong(0)
      val cut = maxKey / 64
      val cut2 = cut / 2
      println(s"[65] files1=${files1.size} maxKey=$maxKey cut=$cut cut2=$cut2 " +
        s"n_le_cut=${Tables.orders(s, sfDir)
          .filter(col("o_orderkey") <= cut).count()}")
      s.sql(s"UPDATE $cat.orders_mor SET o_totalprice = " +
        s"o_totalprice * 2 WHERE o_orderkey <= $cut")
      println(s"[65] after u1: gone=${(files1 diff
        graft.sources.GraftTxn.dataFiles(dir)).size} dvs=${
        graft.sources.GraftDv.hasDvs(dir)}")
      s.sql(s"UPDATE $cat.orders_mor SET o_totalprice = " +
        s"o_totalprice + 10 WHERE o_orderkey <= $cut2")
      println(s"[65] after u2: gone=${(files1 diff
        graft.sources.GraftTxn.dataFiles(dir)).size} dvs=${
        graft.sources.GraftDv.hasDvs(dir)}")
      Tables.orders(s, sfDir).select(col("o_orderkey").as("mk"))
        .filter(col("mk") % 97 === 0)
        .createOrReplaceTempView("msrc")
      println(s"[65] merge src n=${s.table("msrc").count()}")
      s.sql(s"MERGE INTO $cat.orders_mor t USING msrc src " +
        "ON t.o_orderkey = src.mk WHEN MATCHED THEN UPDATE SET " +
        "o_totalprice = t.o_totalprice + 1")
      val filesNow = graft.sources.GraftTxn.dataFiles(dir)
      println(s"[65] after merge: gone=${(files1 diff filesNow).toSeq.sorted} " +
        s"dvs=${graft.sources.GraftDv.hasDvs(dir)}")
      s.sql(s"DROP TABLE IF EXISTS $cat.orders_mor")
    }

    // ---- sql68 components
    {
      val cat = Tables.graftCatalog(s, "p68", sfDir)
      s.sql(s"DROP TABLE IF EXISTS $cat.fact_tx")
      s.sql(s"DROP TABLE IF EXISTS $cat.audit_tx")
      Tables.orders(s, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .createOrReplaceTempView("osrc68")
      s.sql(s"CREATE TABLE $cat.fact_tx AS SELECT o_orderkey AS k, " +
        "o_totalprice AS p FROM osrc68 WHERE o_orderkey <= 2000")
      s.sql(s"CREATE TABLE $cat.audit_tx " +
        "(batch_id BIGINT, n_upserts BIGINT)")
      val dirF = new java.io.File(
        s"${Tables.scratchDir("p68_cat", sfDir)}/fact_tx")
      val dirA = new java.io.File(
        s"${Tables.scratchDir("p68_cat", sfDir)}/audit_tx")
      s.sql("CREATE OR REPLACE TEMP VIEW v68u AS " +
        "SELECT o_orderkey AS k, o_totalprice * 2 AS p FROM osrc68 " +
        "WHERE o_orderkey > 1000 AND o_orderkey <= 3000")
      println(s"[68] upserts n=${s.table("v68u").count()} " +
        s"gt2000=${s.table("v68u").filter(col("k") > 2000).count()} " +
        s"vF=${graft.sources.GraftTxn.version(dirF)} " +
        s"vA=${graft.sources.GraftTxn.version(dirA)}")
      s.sql("BEGIN")
      s.sql(s"MERGE INTO $cat.fact_tx t USING v68u u ON t.k = u.k " +
        "WHEN MATCHED THEN UPDATE SET p = u.p " +
        "WHEN NOT MATCHED THEN INSERT *")
      val inTxnGt = s.sql(s"SELECT COUNT(*) FROM $cat.fact_tx " +
        "WHERE k > 2000").head().getLong(0)
      println(s"[68] mid-txn gt2000=$inTxnGt " +
        s"vF=${graft.sources.GraftTxn.version(dirF)} " +
        s"vA=${graft.sources.GraftTxn.version(dirA)}")
      s.sql("ROLLBACK")
      s.sql(s"DROP TABLE IF EXISTS $cat.fact_tx")
      s.sql(s"DROP TABLE IF EXISTS $cat.audit_tx")
    }
    spark.stop()
  }
}
