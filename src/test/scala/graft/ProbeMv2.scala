package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: debug sql67 incremental_ok. */
object ProbeMv2 {
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
    val s = Tables.tune(spark)
    val sfDir = "/root/testdata/sf0.001"
    val cat = Tables.graftCatalog(s, "sql67p", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.orders_mvb")
    try s.sql(s"DROP MATERIALIZED VIEW IF EXISTS $cat.omv")
    catch { case e: Exception => println("[mv2] drop: " + e.getMessage) }
    Tables.orders(s, sfDir)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        // decimal from the start: the retraction algebra's sums must
        // be exact or refresh-vs-recompute diverges in the last ulp
        col("o_totalprice").cast(graft.Det.Money).as("p"))
      .createOrReplaceTempView("orders_src67")
    s.sql(s"CREATE TABLE $cat.orders_mvb TBLPROPERTIES " +
      "('graft.cdf.enabled'='true') AS SELECT * FROM orders_src67")
    s.sql(s"CREATE MATERIALIZED VIEW $cat.omv AS " +
      s"SELECT st, count(*) AS n_orders, sum(p) AS total " +
      s"FROM $cat.orders_mvb WHERE k % 2 = 0 GROUP BY st")
    val maxKey = Tables.orders(s, sfDir)
      .agg(max(col("o_orderkey"))).head().getLong(0)
    s.sql(s"UPDATE $cat.orders_mvb SET p = p + 100 WHERE k % 7 = 0")
    s.sql(s"DELETE FROM $cat.orders_mvb WHERE k % 11 = 0")
    s.sql(s"INSERT INTO $cat.orders_mvb " +
      s"SELECT k + $maxKey, st, p FROM orders_src67 WHERE k % 13 = 0")
    val nBase = s.table(s"$cat.orders_mvb").count()
    val r = s.sql(s"CALL $cat.refresh_mv('omv')").head()
    println(s"[mv2] versions=${r.getLong(0)} delta=${r.getLong(1)} " +
      s"nBase=$nBase half=${nBase / 2}")
    val refreshed = s.table(s"$cat.omv").orderBy(col("st")).collect()
    val recomputed = s.sql(s"SELECT st, count(*) AS n_orders, " +
      s"sum(p) AS total FROM $cat.orders_mvb WHERE k % 2 = 0 " +
      "GROUP BY st ORDER BY st").collect()
    println("[mv2] refreshed:  " + refreshed.mkString(" "))
    println("[mv2] recomputed: " + recomputed.mkString(" "))
    spark.stop()
  }
}
