package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** One-off: drive the snapshot-then-tail streaming source. */
object ProbeSnapFeed {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    val base = "/tmp/probe_sf_" + System.nanoTime()
    s.conf.set("spark.sql.catalog.ps", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.ps.base", base)
    s.sql("DROP TABLE IF EXISTS ps.t")
    s.range(0, 200).selectExpr("id AS k", "id * 10 AS v").repartition(6)
      .createOrReplaceTempView("seed")
    s.sql("CREATE TABLE ps.t TBLPROPERTIES " +
      "('graft.cdf.enabled'='true') AS SELECT * FROM seed") // v1
    s.sql("UPDATE ps.t SET v = v + 1 WHERE k < 10") // v2
    val dir = new java.io.File(base, "t")
    val out = base + "/out"
    val cp = base + "/cp"
    def runOnce(): Int = {
      val q = s.readStream.format("graft-snapshot-cdc")
        .option("tableDir", dir.getAbsolutePath)
        .option("maxFilesPerBatch", "3")
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.count(_.numInputRows > 0)
    }
    val b1 = runOnce()
    val snap = s.read.parquet(out)
    println(s"[sf] run1 batches=$b1 rows=${snap.count()} " +
      s"byType=${snap.groupBy(col("_change_type")).count().collect().toSeq}")
    // more DML, then resume: tail only
    s.sql("DELETE FROM ps.t WHERE k >= 190") // v3
    s.sql("INSERT INTO ps.t SELECT id, id FROM range(500, 520)") // v4
    val b2 = runOnce()
    val feed = s.read.parquet(out)
    println(s"[sf] run2 batches=$b2 total=${feed.count()}")
    // reconstruct: multiset inserts - deletes == current table
    val recon = feed.groupBy(col("k"), col("v"))
      .agg(sum(when(col("_change_type") === "insert", 1)
        .otherwise(-1)).as("m"))
      .filter(col("m") > 0)
    val cnt = recon.agg(sum(col("m"))).head().getLong(0)
    val tbl = s.table("ps.t")
    val diff = recon.select(col("k"), col("v"))
      .exceptAll(tbl.select(col("k"), col("v"))).count() +
      tbl.select(col("k"), col("v"))
        .exceptAll(recon.select(col("k"), col("v"))).count()
    println(s"[sf] recon n=$cnt table n=${tbl.count()} diff=$diff " +
      "(want equal, 0)")
    // third run with no new commits: nothing
    val b3 = runOnce()
    println(s"[sf] run3 batches=$b3 (want 0) rows=${s.read.parquet(out).count()}")
    spark.stop()
  }
}
