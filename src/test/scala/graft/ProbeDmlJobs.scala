package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Round-16 optimization probe: job count + wall per STATEMENT of the
  * sql67 materialized-view flow (representative of the DML rows'
  * commit-protocol overhead). Usage: runMain graft.ProbeDmlJobs <sfDir>.
  */
object ProbeDmlJobs {
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
      val cat = Tables.graftCatalog(s, "probej", sfDir)
      step("drop-pre") {
        s.sql(s"DROP TABLE IF EXISTS $cat.orders_mvb")
        try s.sql(s"DROP MATERIALIZED VIEW IF EXISTS $cat.omv")
        catch { case _: Exception => () }
      }
      Tables.orders(s, sfDir)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(graft.Det.Money).as("p"))
        .createOrReplaceTempView("orders_srcpj")
      step("ctas(cdf)") {
        s.sql(s"CREATE TABLE $cat.orders_mvb TBLPROPERTIES " +
          "('graft.cdf.enabled'='true') AS SELECT * FROM orders_srcpj")
      }
      step("create-mv") {
        s.sql(s"CREATE MATERIALIZED VIEW $cat.omv AS " +
          s"SELECT st, count(*) AS n_orders, sum(p) AS total " +
          s"FROM $cat.orders_mvb WHERE k % 2 = 0 GROUP BY st")
      }
      step("update") {
        s.sql(s"UPDATE $cat.orders_mvb SET p = p + 100 WHERE k % 7 = 0")
      }
      step("delete") {
        s.sql(s"DELETE FROM $cat.orders_mvb WHERE k % 11 = 0")
      }
      step("insert") {
        s.sql(s"INSERT INTO $cat.orders_mvb " +
          s"SELECT k + 9999999, st, p FROM orders_srcpj WHERE k % 13 = 0")
      }
      step("count-base") { s.table(s"$cat.orders_mvb").count() }
      step("refresh_mv") { s.sql(s"CALL $cat.refresh_mv('omv')").head() }
      step("refresh_mv-idem") { s.sql(s"CALL $cat.refresh_mv('omv')").head() }
      step("read-mv") { s.table(s"$cat.omv").count() }
      step("drop-post") {
        try s.sql(s"DROP MATERIALIZED VIEW IF EXISTS $cat.omv")
        catch { case _: Exception => () }
        s.sql(s"DROP TABLE IF EXISTS $cat.orders_mvb")
      }
    }
    spark.stop()
  }
}
