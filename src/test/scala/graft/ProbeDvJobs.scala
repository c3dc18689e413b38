package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Round-16 optimization probe: job count + wall per STATEMENT of the
  * sql65 merge-on-read flow. Usage: runMain graft.ProbeDvJobs <sfDir>.
  */
object ProbeDvJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    })
    val s = Tables.tune(spark)
    SparkEntry.queries("s1_scan")(s, sfDir).count()

    def step(tag: String)(body: => Any): Unit = {
      Thread.sleep(200); jobs.set(0)
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"$tag%-28s ${jobs.get}%3d jobs  $wall%7.3f s")
    }

    (1 to 2).foreach { round =>
      println(s"=== round $round ===")
      val cat = Tables.graftCatalog(s, "probedv", sfDir)
      step("drop-pre") { s.sql(s"DROP TABLE IF EXISTS $cat.orders_mor") }
      Tables.orders(s, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(8)
        .createOrReplaceTempView("orders_srcdv")
      step("ctas(dv,cdf)") {
        s.sql(s"CREATE TABLE $cat.orders_mor " +
          "TBLPROPERTIES ('graft.dv.enabled'='true'," +
          "'graft.dv.maxRatio'='1.0','graft.cdf.enabled'='true') AS " +
          "SELECT * FROM orders_srcdv")
      }
      val dir = new java.io.File(
        s"${Tables.scratchDir("probedv_cat", sfDir)}/orders_mor")
      step("dataFiles+maxKey") {
        graft.sources.GraftTxn.dataFiles(dir)
        Tables.orders(s, sfDir).agg(max(col("o_orderkey"))).head()
      }
      val maxKey = Tables.orders(s, sfDir)
        .agg(max(col("o_orderkey"))).head().getLong(0)
      val cut = maxKey / 64
      step("update1(dv)") {
        s.sql(s"UPDATE $cat.orders_mor SET o_totalprice = " +
          s"o_totalprice * 2 WHERE o_orderkey <= $cut")
      }
      step("update2(dv)") {
        s.sql(s"UPDATE $cat.orders_mor SET o_totalprice = " +
          s"o_totalprice + 10 WHERE o_orderkey <= ${cut / 2}")
      }
      Tables.orders(s, sfDir).select(col("o_orderkey").as("mk"))
        .filter(col("mk") % 97 === 0)
        .createOrReplaceTempView("merge_srcdv")
      step("merge(dv)") {
        s.sql(s"MERGE INTO $cat.orders_mor t USING merge_srcdv src " +
          "ON t.o_orderkey = src.mk " +
          "WHEN MATCHED THEN UPDATE SET o_totalprice = " +
          "t.o_totalprice + 1")
      }
      step("cdf-read") {
        graft.sources.GraftCdf.rows(s, dir)
          .filter(col("_commit_version") === 2L)
          .groupBy(col("_change_type")).count().collect()
      }
      step("agg1") {
        s.table(s"$cat.orders_mor").agg(count(lit(1)),
          sum(col("o_totalprice").cast(graft.Det.Money)),
          sum(col("o_orderkey"))).head()
      }
      step("optimize") {
        s.sql(s"CALL $cat.optimize('orders_mor', ${1L << 40})")
      }
      step("agg2") {
        s.table(s"$cat.orders_mor").agg(count(lit(1)),
          sum(col("o_orderkey"))).head()
      }
      step("drop-post") { s.sql(s"DROP TABLE IF EXISTS $cat.orders_mor") }
    }
    spark.stop()
  }
}
