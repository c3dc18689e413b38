package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: drive CREATE MATERIALIZED VIEW + refresh_mv. */
object ProbeMv {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    val base = "/tmp/probe_mv_" + System.nanoTime()
    s.conf.set("spark.sql.catalog.pm", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.pm.base", base)
    s.sql("DROP TABLE IF EXISTS pm.base")
    s.sql("CREATE TABLE pm.base TBLPROPERTIES " +
      "('graft.cdf.enabled'='true') AS " +
      "SELECT id AS k, CAST(id % 5 AS INT) AS g, " +
      "CAST(id AS DECIMAL(12,2)) AS p FROM range(0, 1000)")
    s.sql("CREATE MATERIALIZED VIEW pm.mv AS " +
      "SELECT g, count(*) AS n, sum(p) AS total FROM pm.base " +
      "WHERE k % 2 = 0 GROUP BY g")
    println("[mv] initial: " + s.table("pm.mv").orderBy(col("g"))
      .collect().mkString(" "))
    // DML on the base: update + delete + insert
    s.sql("UPDATE pm.base SET p = p + 100 WHERE k % 7 = 0")
    s.sql("DELETE FROM pm.base WHERE k % 11 = 0")
    s.sql("INSERT INTO pm.base SELECT id, CAST(id % 5 AS INT), " +
      "CAST(id AS DECIMAL(12,2)) FROM range(2000, 2100)")
    val r = s.sql("CALL pm.refresh_mv('mv')").head()
    println(s"[mv] refresh: versions=${r.getLong(0)} delta=${r.getLong(1)}")
    val refreshed = s.table("pm.mv").orderBy(col("g")).collect()
    val recomputed = s.sql("SELECT g, count(*) AS n, sum(p) AS total " +
      "FROM pm.base WHERE k % 2 = 0 GROUP BY g ORDER BY g").collect()
    println("[mv] refreshed:  " + refreshed.mkString(" "))
    println("[mv] recomputed: " + recomputed.mkString(" "))
    println("[mv] equal=" + (refreshed.toSeq == recomputed.toSeq))
    // second refresh no-ops
    val r2 = s.sql("CALL pm.refresh_mv('mv')").head()
    println(s"[mv] second refresh: versions=${r2.getLong(0)} " +
      s"delta=${r2.getLong(1)} (want 0, 0)")
    // group drop: delete EVERYTHING in one group
    s.sql("DELETE FROM pm.base WHERE g = 3")
    s.sql("CALL pm.refresh_mv('mv')")
    println("[mv] groups after g=3 wipe: " +
      s.table("pm.mv").select(col("g")).orderBy(col("g"))
        .collect().map(_.getInt(0)).mkString(","))
    s.sql("DROP MATERIALIZED VIEW pm.mv")
    println("[mv] dropped: mv table exists=" +
      s.catalog.tableExists("pm.mv"))
    spark.stop()
  }
}
