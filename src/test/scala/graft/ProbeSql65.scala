package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Round-17 probe: job count + wall per STATEMENT of the sql65 DV
  * update flow. Usage: Test/runMain graft.ProbeSql65 <sfDir>.
  */
object ProbeSql65 {
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
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = Option(j.properties).flatMap(p =>
          Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        lines.add(s"    job ${j.jobId}: $site"): Unit
      }
    })
    val s = Tables.tune(spark)
    SparkEntry.queries("s1_scan")(s, sfDir).count()

    def step(tag: String)(body: => Any): Unit = {
      Thread.sleep(150); jobs.set(0); lines.clear()
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      println(f"$tag%-28s ${jobs.get}%3d jobs  $wall%7.3f s")
      if (sys.env.contains("GRAFT_PROBE_JOBSITES"))
        lines.forEach(l => println(l))
    }

    (1 to 2).foreach { round =>
      println(s"=== round $round ===")
      val cat = Tables.graftCatalog(s, "probe65", sfDir)
      val dir = new java.io.File(
        s"${Tables.scratchDir("probe65_cat", sfDir)}/orders_mor")
      step("drop-pre") { s.sql(s"DROP TABLE IF EXISTS $cat.orders_mor") }
      step("src-view") {
        Tables.orders(s, sfDir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .repartition(8)
          .createOrReplaceTempView("orders_srcp65")
      }
      step("ctas(dv,cdf)") {
        s.sql(s"CREATE TABLE $cat.orders_mor TBLPROPERTIES " +
          "('graft.dv.enabled'='true','graft.dv.maxRatio'='1.0'," +
          "'graft.cdf.enabled'='true') AS SELECT * FROM orders_srcp65")
      }
      val maxKey = Tables.orders(s, sfDir)
        .agg(max(col("o_orderkey"))).head().getLong(0)
      val cut = maxKey / 64
      val cut2 = cut / 2
      step("update-1") {
        s.sql(s"UPDATE $cat.orders_mor SET o_totalprice = " +
          s"o_totalprice * 2 WHERE o_orderkey <= $cut")
      }
      step("update-2") {
        s.sql(s"UPDATE $cat.orders_mor SET o_totalprice = " +
          s"o_totalprice + 10 WHERE o_orderkey <= $cut2")
      }
      step("merge-src-view") {
        Tables.orders(s, sfDir).select(col("o_orderkey").as("mk"))
          .filter(col("mk") % 97 === 0)
          .createOrReplaceTempView("merge_srcp65")
      }
      step("merge") {
        s.sql(s"MERGE INTO $cat.orders_mor t USING merge_srcp65 src " +
          "ON t.o_orderkey = src.mk " +
          "WHEN MATCHED THEN UPDATE SET o_totalprice = t.o_totalprice + 1")
      }
      step("file-audit") {
        graft.sources.GraftTxn.dataFiles(dir)
        graft.sources.GraftDv.hasDvs(dir)
      }
      step("cdf-read") {
        graft.sources.GraftCdf.rows(s, dir)
          .filter(col("_commit_version") === 2L)
          .groupBy(col("_change_type")).count().collect()
      }
      step("agg-1") {
        s.table(s"$cat.orders_mor").agg(count(lit(1)),
          coalesce(sum(col("o_totalprice").cast(graft.Det.Money)),
            lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
          coalesce(sum(col("o_orderkey")), lit(0L))).head()
      }
      step("optimize") {
        s.sql(s"CALL $cat.optimize('orders_mor', ${1L << 40})")
      }
      step("agg-2") {
        s.table(s"$cat.orders_mor").agg(count(lit(1)),
          coalesce(sum(col("o_orderkey")), lit(0L))).head()
      }
      step("drop-post") { s.sql(s"DROP TABLE IF EXISTS $cat.orders_mor") }
    }
    spark.stop()
  }
}
