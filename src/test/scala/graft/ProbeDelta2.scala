package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: debug delta update on identity-partitioned table. */
object ProbeDelta2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    val base = "/tmp/probe_delta2_" + System.nanoTime()
    s.conf.set("spark.sql.catalog.pd2", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.pd2.base", base)
    s.sql("DROP TABLE IF EXISTS pd2.t")
    s.sql("CREATE TABLE pd2.t (k BIGINT, v BIGINT, p INT) " +
      "PARTITIONED BY (p) TBLPROPERTIES " +
      "('graft.dv.enabled'='true','graft.dv.maxRatio'='0.9')")
    s.sql("INSERT INTO pd2.t SELECT id, id * 10, " +
      "CAST(id % 4 AS INT) FROM range(0, 400)")
    val dir = new java.io.File(base, "t")
    val before = graft.sources.GraftTxn.dataFiles(dir)
    println("[probe2] before: " + before.toSeq.sorted.mkString(", "))
    s.sql("UPDATE pd2.t SET v = v + 1 WHERE p = 2 AND k < 100")
    val after = graft.sources.GraftTxn.dataFiles(dir)
    println("[probe2] gone: " + (before diff after).toSeq.sorted)
    println("[probe2] added: " + (after diff before).toSeq.sorted)
    println("[probe2] dvs: " + graft.sources.GraftDv.dvFiles(dir))
    val r = s.table("pd2.t").filter(col("p") === 2)
      .agg(count(lit(1)), sum(col("v"))).head()
    println(s"[probe2] p2 count=${r.getLong(0)} sum=${r.getLong(1)}")
    spark.stop()
  }
}
